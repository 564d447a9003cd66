import os

from monogs_tpu.slam.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_inherit_chain_and_defaults():
    cfg = load_config(os.path.join(REPO, "configs/mono/tum/fr3_office.yaml"))
    assert cfg["Dataset"]["Calibration"]["fx"] == 535.4
    assert cfg["Training"]["window_size"] == 8
    # RGN block present (the reference KeyErrors without it)
    assert cfg["Training"]["RGN"]["second_order"]["sketch_dim"] == 64
    assert cfg["Training"]["lr"]["exposure_a"] == 0.02


def test_rgbd_replica_overrides():
    cfg = load_config(
        os.path.join(REPO, "configs/rgbd/replica/office0_sp.yaml")
    )
    assert cfg["Dataset"]["single_thread"] is True
    assert cfg["Dataset"]["Calibration"]["width"] == 1200
    assert cfg["Training"]["window_size"] == 10
    assert cfg["Training"]["kf_overlap"] == 0.95
    # defaults survive through a 3-level inherit chain
    assert cfg["Training"]["RGN"]["use_huber"] is True
    assert cfg["opt_params"]["position_lr_init"] == 0.00016


def test_rgbd_defaults_have_exposure_lr():
    cfg = load_config(os.path.join(REPO, "configs/rgbd/tum/fr3_office.yaml"))
    assert "exposure_a" in cfg["Training"]["lr"]
    assert cfg["Training"]["alpha"] == 0.9


def test_update_recursive_masking():
    from monogs_tpu.slam.config import update_recursive

    d1 = {"a": {"b": 1, "c": 2}, "x": 5}
    d2 = {"a": {"b": 9}}
    update_recursive(d1, d2)
    assert d1["a"]["b"] == 9 and d1["a"]["c"] == 2 and d1["x"] == 5


def test_synthetic_config_loads():
    cfg = load_config(os.path.join(REPO, "configs/synthetic/rgbd.yaml"))
    assert cfg["Dataset"]["type"] == "synthetic"
    assert cfg["Renderer"]["map_capacity"] == 65536


def test_fast_path_knobs_plumbed_from_yaml():
    """The bench-validated fast-path knobs must be reachable from YAML
    (round-1 gap: bench.py hand-built its TrackConfig while slam.py could
    not express so_tile_frac/rebin_so_iters at all)."""
    from monogs_tpu.slam.runtime import (
        render_config_from_config, track_config_from_config,
    )

    cfg = load_config(os.path.join(REPO, "configs/mono/tum/fr3_office.yaml"))
    # SLAM.__init__ derives Training.monocular from the sensor type before
    # building the TrackConfig (runtime.py)
    cfg["Training"]["monocular"] = cfg["Dataset"]["sensor_type"] == "monocular"
    tcfg = track_config_from_config(cfg)
    # plumbing contract: TrackConfig mirrors the YAML values (round-4
    # lesson — never hardcode the tuned constants here, they move with
    # every sweep; the YAML is the single source of truth)
    rgn = cfg["Training"]["RGN"]
    assert tcfg.bin_margin == rgn["bin_margin"]
    assert tcfg.fo_tile_frac == rgn["first_order"]["tile_frac"]
    assert tcfg.so_tile_frac == rgn["second_order"]["tile_frac"]
    assert tcfg.fo_fused and tcfg.final_refine
    from monogs_tpu.render import Intrinsics

    cal = cfg["Dataset"]["Calibration"]
    intr = Intrinsics(fx=cal["fx"], fy=cal["fy"], cx=cal["cx"], cy=cal["cy"],
                      width=cal["width"], height=cal["height"])
    rcfg = render_config_from_config(cfg, intr)
    # on CPU the backend falls back to the XLA blend; the YAML asks for
    # the Pallas fast path either way
    assert cfg["Renderer"]["backend"] == "pallas_lists"
    assert rcfg.k_fine == cfg["Renderer"]["k_fine"]

    # mapping's frozen-list knobs follow the same contract
    from monogs_tpu.slam.runtime import map_config_from_config

    cfg["Renderer"]["mapping_bin_margin"] = 6.0
    cfg["Renderer"]["mapping_rebin_every"] = 10
    mcfg = map_config_from_config(cfg)
    assert mcfg.bin_margin == 6.0 and mcfg.rebin_every == 10


def test_track_render_config_k_fine_passthrough():
    """Tracking-side k_fine: explicit Renderer.track_k_fine wins; otherwise
    the shared k_fine passes through UNCLAMPED — the round-3 K-chunked
    kernels bound scoped VMEM by the chunk size, so mapping-grade k_fine
    (512) compiles on the Pallas path (hardware-validated,
    scripts/validate_tpu_kernels.py; round-2's _TRACK_K_FINE_VMEM_CAP is
    gone)."""
    from monogs_tpu.slam.runtime import track_render_config
    from monogs_tpu.render import RenderConfig

    rcfg = RenderConfig(k_fine=512, backend="pallas_lists")
    # explicit override wins
    out = track_render_config({"Renderer": {"track_k_fine": 128}}, rcfg)
    assert out.k_fine == 128 and rcfg.k_fine == 512
    # no override: pass through on every backend
    for rc in (rcfg, rcfg._replace(backend="xla"),
               rcfg._replace(pallas_interpret=True)):
        out = track_render_config({"Renderer": {}}, rc)
        assert out.k_fine == 512
    # the synthetic config pins it explicitly (a speed/accuracy choice:
    # 128 tracks that scene to the same pose error at a fraction of the
    # per-iteration cost)
    cfg = load_config(os.path.join(REPO, "configs/synthetic/rgbd.yaml"))
    assert cfg["Renderer"]["track_k_fine"] == 128


def test_multichip_config_loads():
    cfg = load_config(
        os.path.join(REPO, "configs/synthetic/rgbd_multichip.yaml")
    )
    assert cfg["Parallel"]["n_devices"] == 4
    # inherits the full synthetic rgbd stack
    assert cfg["Dataset"]["type"] == "synthetic"
    assert cfg["Training"]["RGN"]["use_huber"] is True
