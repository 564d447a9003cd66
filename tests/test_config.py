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
