"""Diagnostics harness tests (the reference's tracking_experiment checks)."""

import jax
import jax.numpy as jnp

from monogs_tpu.data import SyntheticDataset
from monogs_tpu.render import Intrinsics, RenderConfig
from monogs_tpu.slam.experiments import check_grad, check_sketch, lm_sweep
from monogs_tpu.slam.frame import make_frame_data
from monogs_tpu.slam.tracking import TrackConfig

INTR = Intrinsics(fx=80.0, fy=80.0, cx=31.5, cy=31.5, width=64, height=64)
CFG = RenderConfig(tile=16, macro_tiles=2, k_macro=512, k_fine=128)
TCFG = TrackConfig(monocular=True, stack_dim=4, sketch_dim=16)


def test_check_grad():
    ds = SyntheticDataset(INTR, n_frames=1, n_gauss=400, render_cfg=CFG,
                          trans_amp=0.0, rot_amp=0.0)
    img, depth, T = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    diff, SJ = check_grad(ds.scene, frame, T, INTR, CFG, TCFG,
                          jax.random.PRNGKey(0))
    assert diff < 1e-4
    assert SJ.shape == (4 * 16, 8)


def test_check_sketch_stats():
    stats = check_sketch(m=5000, n=8, stack_dim=4, sketch_dim=32, trials=10)
    # sketched singular values concentrate around the originals within the
    # theoretical distortion
    d = stats["distortion_theory"]
    assert abs(stats["sigma_max_ratio_mean"] - 1.0) < 3 * d
    assert abs(stats["sigma_min_ratio_mean"] - 1.0) < 5 * d


def test_lm_sweep_runs():
    ds = SyntheticDataset(INTR, n_frames=1, n_gauss=300, render_cfg=CFG,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    res = lm_sweep(ds.scene, frame, T, INTR, CFG, TCFG, jax.random.PRNGKey(1),
                   lambdas=(1e-3, 1e-1))
    assert len(res) == 2
    for v in res.values():
        assert v["loss"] >= 0 and v["step_norm"] >= 0
