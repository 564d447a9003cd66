"""Live SLAM viewer: a dependency-free web GUI.

The reference ships an Open3D/OpenGL desktop GUI (gui/slam_gui.py, ~1.5k LoC
with GLSL splat shaders) that re-renders the map from an interactive camera
via the same CUDA rasterizer. A desktop GL stack makes no sense next to a
TPU pod, so this framework's GUI is a small threaded HTTP server:

  - GET /          an auto-refreshing HTML dashboard (rendered view, input
                   frame, depth, map/trajectory stats)
  - GET /view.jpg  the map rendered from the current tracked camera (or an
                   orbit offset via ?dx=&dy=&dz=&yaw=&pitch= — the
                   interactive viewpoint, rasterized by the same jax
                   renderer the SLAM loops use)
  - GET /input.jpg the latest ground-truth frame received from the frontend
  - GET /depth.jpg the rendered depth (turbo-mapped)
  - GET /stats     JSON: gaussian count, keyframes, window, fps
  - POST /pause, /unpause  the Packet_vis2main back-channel

run(params) mirrors the reference entry point (gui/slam_gui.py:696-700):
it drains q_main2vis to the latest GaussianPacket (backpressure-free, like
gui_utils.py:145-156) and serves until a finish packet arrives.
"""

from __future__ import annotations

import json
import queue
import threading
import time

import numpy as np

from ..ops import se3
from ..utils.logging import Log
from .gui_utils import GaussianPacket, Packet_vis2main

_PAGE = """<!DOCTYPE html>
<html><head><title>monogs-tpu</title>
<style>
 body { background:#111; color:#ddd; font-family:monospace; margin:16px; }
 img { image-rendering:pixelated; border:1px solid #333; }
 .row { display:flex; gap:12px; flex-wrap:wrap; }
 button { background:#333; color:#ddd; border:1px solid #555; padding:6px 14px; }
</style></head>
<body>
<h2>monogs-tpu live</h2>
<div class="row">
 <div><h4>rendered view</h4><img id="v" width="480"/></div>
 <div><h4>input frame</h4><img id="i" width="480"/></div>
 <div><h4>depth</h4><img id="d" width="480"/></div>
</div>
<div class="row">
 <div><h4>3D map (drag yaw/pitch, frustums + trajectory)</h4>
  <img id="m" width="640"/><br/>
  yaw <input id="yaw" type="range" min="-3.14" max="3.14" step="0.05" value="0"/>
  pitch <input id="pitch" type="range" min="-1.4" max="1.4" step="0.05" value="0.5"/>
  mode <select id="mode"><option>rgb</option><option>depth</option>
   <option>opacity</option><option>ellipsoid</option></select>
  scale <input id="scale" type="range" min="0.05" max="1.5" step="0.05" value="1"/>
  <label><input id="follow" type="checkbox"/> follow camera</label>
 </div>
</div>
<p>
 <button onclick="fetch('/pause',{method:'POST'})">pause</button>
 <button onclick="fetch('/unpause',{method:'POST'})">unpause</button>
 <button onclick="shot()">screenshot</button> <span id="shotmsg"></span>
</p>
<pre id="s"></pre>
<script>
 async function tick() {
   const t = Date.now();
   document.getElementById('v').src = '/view.jpg?t=' + t;
   document.getElementById('i').src = '/input.jpg?t=' + t;
   document.getElementById('d').src = '/depth.jpg?t=' + t;
   document.getElementById('m').src = '/map3d.jpg?t=' + t
     + '&yaw=' + document.getElementById('yaw').value
     + '&pitch=' + document.getElementById('pitch').value
     + '&mode=' + document.getElementById('mode').value
     + '&scale=' + document.getElementById('scale').value
     + '&follow=' + (document.getElementById('follow').checked ? 1 : 0);
   const s = await (await fetch('/stats')).json();
   document.getElementById('s').textContent = JSON.stringify(s, null, 2);
 }
 async function shot() {
   const qs = '?yaw=' + document.getElementById('yaw').value
     + '&pitch=' + document.getElementById('pitch').value
     + '&mode=' + document.getElementById('mode').value
     + '&scale=' + document.getElementById('scale').value
     + '&follow=' + (document.getElementById('follow').checked ? 1 : 0);
   const r = await (await fetch('/screenshot' + qs, {method:'POST'})).json();
   document.getElementById('shotmsg').textContent = r.saved || r.error;
 }
 setInterval(tick, 1000); tick();
</script>
</body></html>"""


class _State:
    def __init__(self, params):
        self.params = params
        self.latest = GaussianPacket()
        self.gaussians = params.gaussians
        self.current_T = None
        self.n_frames = 0
        self.t0 = time.time()
        self.lock = threading.Lock()
        self.finished = False
        self.n_shots = 0


def _encode_jpg(img_chw):
    """[3,H,W] float in [0,1] -> jpeg bytes (cv2 if available, else PPM)."""
    arr = np.clip(np.asarray(img_chw), 0, 1)
    hwc = (arr.transpose(1, 2, 0) * 255).astype(np.uint8)
    try:
        import cv2

        ok, buf = cv2.imencode(".jpg", hwc[..., ::-1])
        if ok:
            return bytes(buf), "image/jpeg"
    except Exception:
        pass
    h, w = hwc.shape[:2]
    return (
        b"P6\n%d %d\n255\n" % (w, h) + hwc.tobytes(),
        "image/x-portable-pixmap",
    )


def _turbo(depth_hw):
    d = np.asarray(depth_hw)
    lo, hi = np.percentile(d[d > 0], [2, 98]) if (d > 0).any() else (0, 1)
    t = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
    rgb = np.stack([t, 4 * t * (1 - t), 1 - t], axis=0)
    return rgb


def _lookat_w2c(eye, center, up=(0.0, -1.0, 0.0)):
    """World->camera 4x4 for a camera at `eye` looking at `center` (OpenCV
    convention: +z forward, +y down — up defaults to -y world)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(center, np.float64) - eye
    fwd = fwd / max(np.linalg.norm(fwd), 1e-9)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    right = right / max(np.linalg.norm(right), 1e-9)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # rows: camera axes in world
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = -R @ eye
    return T.astype(np.float32)


def _project_pts(pts_w, T_wc, intr):
    """[n,3] world -> ([n,2] pixels, [n] z). No clipping."""
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    pc = pts_w @ R.T + t
    z = pc[:, 2]
    zs = np.where(np.abs(z) < 1e-6, 1e-6, z)
    u = intr.fx * pc[:, 0] / zs + intr.cx
    v = intr.fy * pc[:, 1] / zs + intr.cy
    return np.stack([u, v], axis=-1), z


def _draw_polyline(img_hwc, pts_w, T_view, intr, color, closed=False):
    """Draw a 3D polyline into the uint8 image (segments with both
    endpoints in front of the camera only)."""
    if pts_w is None or len(pts_w) < 2:
        return
    uv, z = _project_pts(np.asarray(pts_w, np.float64), T_view, intr)
    try:
        import cv2

        pairs = zip(range(len(uv) - 1), range(1, len(uv)))
        if closed:
            pairs = list(pairs) + [(len(uv) - 1, 0)]
        for a, b in pairs:
            if z[a] > 0.05 and z[b] > 0.05:
                cv2.line(
                    img_hwc,
                    (int(uv[a, 0]), int(uv[a, 1])),
                    (int(uv[b, 0]), int(uv[b, 1])),
                    color, 1, cv2.LINE_AA,
                )
    except ImportError:
        # crude fallback: plot the vertices as dots
        h, w = img_hwc.shape[:2]
        for (u, v), zz in zip(uv, z):
            if zz > 0.05 and 0 <= int(v) < h and 0 <= int(u) < w:
                img_hwc[int(v), int(u)] = color


def _frustum_pts(T_kf, intr, depth=0.15):
    """5 world points (apex + 4 image corners at `depth`) of a keyframe
    camera frustum (reference draws these as line sets,
    gui/slam_gui.py:256-344)."""
    T = np.asarray(T_kf, np.float64)
    R = T[:3, :3]
    t = T[:3, 3]
    C = -R.T @ t
    corners_px = np.array(
        [[0, 0], [intr.width, 0], [intr.width, intr.height], [0, intr.height]],
        np.float64,
    )
    x = (corners_px[:, 0] - intr.cx) / intr.fx
    y = (corners_px[:, 1] - intr.cy) / intr.fy
    dirs = np.stack([x, y, np.ones(4)], axis=-1) * depth
    world = C[None, :] + dirs @ R  # R^T.T = R applied row-wise: d_w = R^T d_c
    return C, world


def _draw_frustum(img_hwc, T_kf, T_view, intr, color):
    C, corners = _frustum_pts(T_kf, intr)
    _draw_polyline(img_hwc, corners, T_view, intr, color, closed=True)
    for k in range(4):
        _draw_polyline(
            img_hwc, np.stack([C, corners[k]]), T_view, intr, color
        )


_render_jit = None


def _map3d_view(state: _State, yaw, pitch, dist, mode, scale, follow=False):
    """Free-orbit render of the map + frustum graph + trajectory polylines
    (the reference's 3D scene widget, gui/slam_gui.py:256-344, 514-671).

    The orbit camera circles the map centroid; `mode` selects rgb / depth /
    opacity / ellipsoid (opaque splats, the GL ellipsoid mode's analogue),
    `scale` is the reference GUI's scale slider (scale_modifier). `follow`
    locks the view to the current tracked camera pose instead of the orbit
    (the reference's follow-camera checkbox, gui/slam_gui.py:204-209,
    360-380)."""
    import jax
    import jax.numpy as jnp

    global _render_jit
    if _render_jit is None:
        from ..render import render

        # scale_modifier is plain traced arithmetic (primitives.py:47);
        # keeping it traced means dragging the GUI scale slider reuses ONE
        # compiled render instead of recompiling per slider value
        _render_jit = jax.jit(render, static_argnames=("intr", "cfg"))

    p = state.params
    with state.lock:
        gauss = state.gaussians
        pkt = state.latest
    if gauss is None:
        return None
    gv = gauss.render_view()
    xyz = np.asarray(gv.xyz)
    act = np.asarray(gv.active)
    if not act.any():
        return None
    if follow and pkt.current_frame is not None:
        T_view = np.asarray(pkt.current_frame.T)
    else:
        center = xyz[act].mean(axis=0)
        spread = float(np.percentile(
            np.linalg.norm(xyz[act] - center, axis=-1), 90
        ))
        d = dist if dist > 0 else max(2.5 * spread, 0.5)
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        eye = center + d * np.array([sy * cp, -sp, -cy * cp])
        T_view = _lookat_w2c(eye, center)

    if mode == "ellipsoid":
        gv = gv._replace(opa_logit=jnp.full_like(gv.opa_logit, 8.0))
    out = _render_jit(
        gv, jnp.asarray(T_view), p.intr,
        p.render_cfg._replace(with_n_touched=False),
        scale_modifier=jnp.float32(scale),
    )
    if mode == "depth":
        img = _turbo(np.asarray(out.depth[0]))
    elif mode == "opacity":
        img = np.repeat(np.asarray(out.opacity), 3, axis=0)
    else:
        img = np.clip(np.asarray(out.image), 0, 1)
    hwc = np.ascontiguousarray(
        (img.transpose(1, 2, 0) * 255).astype(np.uint8)
    )

    # overlays: keyframe frustums (yellow), current camera (red), estimated
    # trajectory (green), ground truth (blue)
    for kf in pkt.keyframes:
        _draw_frustum(hwc, kf.T, T_view, p.intr, (255, 220, 60))
    if pkt.current_frame is not None:
        _draw_frustum(hwc, pkt.current_frame.T, T_view, p.intr, (255, 60, 60))
    _draw_polyline(hwc, pkt.trajectory, T_view, p.intr, (80, 255, 120))
    _draw_polyline(hwc, pkt.trajectory_gt, T_view, p.intr, (90, 140, 255))
    return hwc


def _render_view(state: _State, offsets):
    import jax
    import jax.numpy as jnp

    from ..render import render

    global _render_jit
    if _render_jit is None:
        # one cached jit for all GUI requests — rebuilding jax.jit per
        # request would recompile every time
        _render_jit = jax.jit(render, static_argnames=("intr", "cfg"))

    p = state.params
    with state.lock:
        gauss = state.gaussians
        T = state.current_T
    if gauss is None or T is None:
        return None, None
    tau = jnp.asarray(offsets, jnp.float32)
    out = _render_jit(
        gauss.render_view(), jnp.asarray(T), p.intr,
        p.render_cfg._replace(with_n_touched=False), tau=tau,
    )
    return np.asarray(jnp.clip(out.image, 0, 1)), np.asarray(out.depth[0])


def run(params):
    """GUI process/thread entry (mirrors slam_gui.run)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    state = _State(params)

    def drain():
        while not state.finished:
            try:
                pkt = params.q_main2vis.get(timeout=0.05)
            except queue.Empty:
                continue
            # drain to the latest packet (gui_utils.py:145-156)
            while True:
                try:
                    pkt = params.q_main2vis.get_nowait()
                except queue.Empty:
                    break
            with state.lock:
                if pkt.finish:
                    state.finished = True
                if pkt.gaussians is not None:
                    state.gaussians = pkt.gaussians
                if pkt.current_frame is not None:
                    state.current_T = pkt.current_frame.T
                state.latest = pkt
                state.n_frames += 1

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, body, ctype="text/html"):
            try:
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionResetError):
                pass  # client gave up (e.g. curl timeout); not an error

        def do_POST(self):
            url = urlparse(self.path)
            if url.path == "/pause":
                params.q_vis2main.put(Packet_vis2main(flag_pause=True))
            elif url.path == "/unpause":
                params.q_vis2main.put(Packet_vis2main(flag_pause=False))
            elif url.path == "/screenshot":
                # save the tracked-camera render + the 3D map view to disk
                # (the reference GUI's screenshot button,
                # gui/slam_gui.py:132-136,360-380). Orbit params come
                # through the query so the saved map3d matches the page.
                import os

                q = parse_qs(url.query)

                def f(k, d="0"):
                    return float(q.get(k, [d])[0])

                root = os.path.join(params.save_dir or ".", "screenshots")
                os.makedirs(root, exist_ok=True)
                with state.lock:
                    state.n_shots += 1
                    n = state.n_shots
                saved = []
                img, _ = _render_view(state, [0.0] * 6)
                if img is not None:
                    body, ct = _encode_jpg(img)
                    ext = "jpg" if ct == "image/jpeg" else "ppm"
                    p = os.path.join(root, f"view_{n:04d}.{ext}")
                    with open(p, "wb") as fh:
                        fh.write(body)
                    saved.append(p)
                m3d = _map3d_view(
                    state, yaw=f("yaw"), pitch=f("pitch", "0.5"),
                    dist=f("dist"), mode=q.get("mode", ["rgb"])[0],
                    scale=f("scale", "1"), follow=f("follow") > 0,
                )
                if m3d is not None:
                    arr = m3d.astype(np.float32).transpose(2, 0, 1) / 255.0
                    body, ct = _encode_jpg(arr)
                    ext = "jpg" if ct == "image/jpeg" else "ppm"
                    p = os.path.join(root, f"map3d_{n:04d}.{ext}")
                    with open(p, "wb") as fh:
                        fh.write(body)
                    saved.append(p)
                msg = {"saved": ", ".join(saved)} if saved else {
                    "error": "nothing to save yet"
                }
                self._send(json.dumps(msg).encode(), "application/json")
                return
            self._send(b"ok", "text/plain")

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(_PAGE.encode())
            elif url.path == "/stats":
                with state.lock:
                    g = state.gaussians
                    pkt = state.latest
                stats = {
                    "n_gaussians": int(g.n_active) if g is not None else 0,
                    "n_keyframes": len(pkt.keyframes),
                    "kf_window": {
                        str(k): v for k, v in (pkt.kf_window or {}).items()
                    },
                    "packets": state.n_frames,
                    "uptime_s": round(time.time() - state.t0, 1),
                }
                self._send(json.dumps(stats).encode(), "application/json")
            elif url.path == "/view.jpg":
                q = parse_qs(url.query)

                def f(k):
                    return float(q.get(k, ["0"])[0])

                offs = [f("dx"), f("dy"), f("dz"), f("pitch"), f("yaw"), f("roll")]
                img, _ = _render_view(state, offs)
                if img is None:
                    self._send(b"", "image/jpeg")
                    return
                body, ctype = _encode_jpg(img)
                self._send(body, ctype)
            elif url.path == "/map3d.jpg":
                q = parse_qs(url.query)

                def f(k, d="0"):
                    return float(q.get(k, [d])[0])

                img = _map3d_view(
                    state,
                    yaw=f("yaw"), pitch=f("pitch", "0.5"),
                    dist=f("dist"),  # 0 = auto from map spread
                    mode=q.get("mode", ["rgb"])[0],
                    scale=f("scale", "1"),
                    follow=f("follow") > 0,
                )
                if img is None:
                    self._send(b"", "image/jpeg")
                    return
                arr = img.astype(np.float32).transpose(2, 0, 1) / 255.0
                body, ctype = _encode_jpg(arr)
                self._send(body, ctype)
            elif url.path == "/depth.jpg":
                _, depth = _render_view(state, [0] * 6)
                if depth is None:
                    self._send(b"", "image/jpeg")
                    return
                body, ctype = _encode_jpg(_turbo(depth))
                self._send(body, ctype)
            elif url.path == "/input.jpg":
                with state.lock:
                    gt = state.latest.gtcolor
                if gt is None:
                    self._send(b"", "image/jpeg")
                    return
                body, ctype = _encode_jpg(np.asarray(gt))
                self._send(body, ctype)
            else:
                self.send_response(404)
                self.end_headers()

    drainer = threading.Thread(target=drain, daemon=True)
    drainer.start()
    server = ThreadingHTTPServer(("0.0.0.0", params.port), Handler)
    # non-daemon handler threads: the process waits for in-flight renders
    # instead of tearing down the jax runtime under them (which aborts)
    server.daemon_threads = False
    server.timeout = 0.5
    Log(f"GUI serving at http://localhost:{params.port}", tag="GUI")
    while not state.finished:
        server.handle_request()
    server.server_close()
    Log("GUI stopped", tag="GUI")
