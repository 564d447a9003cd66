"""Web GUI tests: serve a live map over HTTP, probe every endpoint, and
exercise the pause back-channel and the finish shutdown."""

import json
import queue
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from monogs_tpu.gui import GaussianPacket, Packet_vis2main, ParamsGUI
from monogs_tpu.gui.gui_utils import CameraMsg
from monogs_tpu.gui import slam_gui
from monogs_tpu.models import gaussian_map as gm
from monogs_tpu.render import Intrinsics, RenderConfig

PORT = 8991


@pytest.fixture(scope="module")
def gui(tmp_path_factory):
    intr = Intrinsics(fx=60.0, fy=60.0, cx=15.5, cy=11.5, width=32, height=24)
    cfg = RenderConfig(tile=16, macro_tiles=2, k_macro=128, k_fine=64)
    m = gm.new_map(256, sh_degree=0)
    leaves = gm.ParamLeaves(
        xyz=jnp.concatenate(
            [0.5 * jax.random.normal(jax.random.PRNGKey(0), (256, 2)),
             jnp.full((256, 1), 2.0)], axis=-1),
        sh=jax.random.normal(jax.random.PRNGKey(1), (256, 1, 3)) * 0.3,
        log_scale=jnp.full((256, 3), -2.5),
        quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (256, 1)),
        opa_logit=jnp.full((256, 1), 2.0),
    )
    m = gm.insert(m, leaves, jnp.int32(200), kf_id=0)

    q_m2v = queue.Queue()
    q_v2m = queue.Queue()
    save_dir = str(tmp_path_factory.mktemp("gui_shots"))
    params = ParamsGUI(
        q_main2vis=q_m2v, q_vis2main=q_v2m, gaussians=m,
        intr=intr, render_cfg=cfg, port=PORT, save_dir=save_dir,
    )
    t = threading.Thread(target=slam_gui.run, args=(params,), daemon=True)
    t.start()
    # feed a packet with a current frame + gt image
    import numpy as np

    q_m2v.put(GaussianPacket(
        gaussians=m,
        current_frame=CameraMsg(uid=0, T=jnp.eye(4)),
        keyframes=[CameraMsg(uid=0, T=jnp.eye(4))],
        kf_window={0: []},
        gtcolor=np.full((3, 24, 32), 0.5, np.float32),
        trajectory=np.array([[0, 0, 0], [0.05, 0, 0.1], [0.1, 0.02, 0.2]],
                            np.float32),
        trajectory_gt=np.array([[0, 0, 0], [0.04, 0, 0.1], [0.09, 0.02, 0.2]],
                               np.float32),
    ))
    time.sleep(1.0)
    yield q_m2v, q_v2m, t, save_dir
    q_m2v.put(GaussianPacket(finish=True))
    t.join(timeout=15)


def _get(path, timeout=120):
    with urllib.request.urlopen(f"http://localhost:{PORT}{path}", timeout=timeout) as r:
        return r.read()


def test_dashboard_and_stats(gui):
    page = _get("/")
    assert b"monogs-tpu" in page
    stats = json.loads(_get("/stats"))
    assert stats["n_gaussians"] == 200
    assert stats["n_keyframes"] == 1


def test_view_and_input_images(gui):
    view = _get("/view.jpg")
    assert view[:2] == b"\xff\xd8" or view[:2] == b"P6"
    orbit = _get("/view.jpg?yaw=0.3&dx=0.2")
    assert orbit != view  # interactive viewpoint actually moved
    inp = _get("/input.jpg")
    assert len(inp) > 100


def test_pause_unpause_roundtrip(gui):
    q_m2v, q_v2m = gui[0], gui[1]
    req = urllib.request.Request(
        f"http://localhost:{PORT}/pause", method="POST"
    )
    urllib.request.urlopen(req, timeout=10)
    pkt = q_v2m.get(timeout=5)
    assert isinstance(pkt, Packet_vis2main) and pkt.flag_pause
    req = urllib.request.Request(
        f"http://localhost:{PORT}/unpause", method="POST"
    )
    urllib.request.urlopen(req, timeout=10)
    pkt = q_v2m.get(timeout=5)
    assert not pkt.flag_pause


def test_map3d_view(gui):
    """The free-orbit 3D map view (frustums + trajectory overlays): valid
    image bytes, orbit angle actually changes the render, and every render
    mode responds (reference capability: gui/slam_gui.py:256-344,514-671)."""
    base = _get("/map3d.jpg?yaw=0&pitch=0.5&mode=rgb&scale=1")
    assert base[:2] == b"\xff\xd8" or base[:2] == b"P6"
    orbited = _get("/map3d.jpg?yaw=1.2&pitch=0.2&mode=rgb&scale=1")
    assert orbited != base
    for mode in ("depth", "opacity", "ellipsoid"):
        img = _get(f"/map3d.jpg?yaw=0&pitch=0.5&mode={mode}&scale=1")
        assert len(img) > 100, mode
    scaled = _get("/map3d.jpg?yaw=0&pitch=0.5&mode=rgb&scale=0.3")
    assert scaled != base  # scale slider reaches the renderer


def test_follow_camera_mode(gui):
    """follow=1 renders the 3D map from the current tracked camera pose
    (reference follow-camera checkbox, gui/slam_gui.py:204-209,360-380):
    must differ from the default orbit view and stay a valid image."""
    orbit = _get("/map3d.jpg?yaw=1.0&pitch=0.5&mode=rgb&scale=1")
    follow = _get("/map3d.jpg?yaw=1.0&pitch=0.5&mode=rgb&scale=1&follow=1")
    assert follow[:2] == b"\xff\xd8" or follow[:2] == b"P6"
    assert follow != orbit


def test_screenshot_saves_files(gui):
    """POST /screenshot writes the tracked view + map3d renders under
    save_dir/screenshots (reference screenshot button,
    gui/slam_gui.py:132-136,360-380)."""
    import os

    save_dir = gui[3]
    req = urllib.request.Request(
        f"http://localhost:{PORT}/screenshot?yaw=0.3&mode=rgb",
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        res = json.loads(r.read())
    assert "saved" in res, res
    paths = [p.strip() for p in res["saved"].split(",")]
    assert len(paths) == 2
    for p in paths:
        assert os.path.commonpath([p, save_dir]) == save_dir
        assert os.path.getsize(p) > 100
        with open(p, "rb") as fh:
            head = fh.read(2)
        assert head == b"\xff\xd8" or head == b"P6"


def test_404(gui):
    with pytest.raises(urllib.error.HTTPError):
        _get("/nope")
