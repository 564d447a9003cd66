"""Tracking tests on a synthetic scene: the fused first-order tracker must
recover a perturbed camera pose; the sketched second-order phase must refine
it further; the count-sketch math must satisfy the distortion bound."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.data import SyntheticDataset
from monogs_tpu.ops import se3
from monogs_tpu.render import Intrinsics, RenderConfig
from monogs_tpu.slam.frame import make_frame_data
from monogs_tpu.slam.tracking import TrackConfig, track_frame

INTR = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5, width=128, height=96)
CFG = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=256)


def setup(sensor_type="monocular"):
    ds = SyntheticDataset(INTR, n_frames=2, n_gauss=1500, seed=0,
                          sensor_type=sensor_type, render_cfg=CFG,
                          trans_amp=0.0, rot_amp=0.0)
    img, depth, T_gt = ds[0]
    frame = make_frame_data(img, depth, 1.1, 0.01, "synthetic")
    return ds, frame, T_gt


def perturbed(T_gt, seed=1, mag=0.01):
    d = mag * jax.random.normal(jax.random.PRNGKey(seed), (6,))
    return se3.se3_exp(d) @ T_gt


def run_track(frame, T0, scene, tcfg):
    return track_frame(
        scene, frame, T0, jnp.float32(1.0), jnp.float32(0.0),
        jax.random.PRNGKey(0), INTR, CFG, tcfg,
    )


def test_first_order_recovers_pose():
    ds, frame, T_gt = setup()
    T0 = perturbed(T_gt, mag=0.01)
    tcfg = TrackConfig(monocular=True, fo_max_iter=60, so_max_iter=0,
                       lr_trans=0.002, lr_rot=0.006)
    res = run_track(frame, T0, ds.scene, tcfg)
    trans, ang = se3.pose_diff(res.T, T_gt)
    trans0, _ = se3.pose_diff(T0, T_gt)
    assert float(trans) < 0.25 * float(trans0), (float(trans), float(trans0))
    assert float(trans) < 3e-3
    assert np.isfinite(float(res.median_depth))


def test_second_order_refines():
    ds, frame, T_gt = setup()
    T0 = perturbed(T_gt, mag=0.008)
    fo_only = TrackConfig(monocular=True, fo_max_iter=25, so_max_iter=0,
                          lr_trans=0.002, lr_rot=0.006)
    hybrid = TrackConfig(monocular=True, fo_max_iter=25, so_max_iter=10,
                         lr_trans=0.002, lr_rot=0.006,
                         stack_dim=8, sketch_dim=64)
    res_fo = run_track(frame, T0, ds.scene, fo_only)
    res_so = run_track(frame, T0, ds.scene, hybrid)
    t_fo, _ = se3.pose_diff(res_fo.T, T_gt)
    t_so, _ = se3.pose_diff(res_so.T, T_gt)
    # second order should at least not hurt, and typically sharpen the pose
    assert float(t_so) <= float(t_fo) * 1.2
    assert float(res_so.last_l1) <= float(res_fo.last_l1) * 1.05


def test_tracking_rgbd():
    ds, frame, T_gt = setup(sensor_type="depth")
    T0 = perturbed(T_gt, mag=0.01)
    tcfg = TrackConfig(monocular=False, fo_max_iter=60, so_max_iter=0,
                       lr_trans=0.002, lr_rot=0.006)
    res = run_track(frame, T0, ds.scene, tcfg)
    trans, ang = se3.pose_diff(res.T, T_gt)
    assert float(trans) < 3e-3


def test_tracking_stable_at_optimum():
    """Starting at the true pose, tracking must not wander away (Adam steps
    are ~lr-sized even at the optimum, so the 1e-4 early-exit rarely fires —
    best-loss caching is what pins the result)."""
    ds, frame, T_gt = setup()
    tcfg = TrackConfig(monocular=True, fo_max_iter=50, so_max_iter=0)
    res = run_track(frame, T_gt, ds.scene, tcfg)
    trans, ang = se3.pose_diff(res.T, T_gt)
    assert float(trans) < 1e-3 and float(ang) < 1e-3


def test_sketch_distortion_bound():
    """Port of the reference property test (tests/sketch_utils.py:60-131):
    the count-sketched damped least-squares solution must lie within the
    theoretical distortion upper bound of the full solution."""
    rng = np.random.default_rng(0)
    m, n = 30000, 8
    lam = 100.0
    # controlled singular spectrum
    A = rng.standard_normal((m, n))
    U, _, Vt = np.linalg.svd(A, full_matrices=False)
    S = rng.uniform(1e-2, 5 / 1.5, n)
    S[0], S[-1] = 5.0, 1e-2
    A = U @ np.diag(S) @ Vt
    x_true = rng.standard_normal(n)
    x_true *= 0.015 / np.linalg.norm(x_true)
    b = A @ x_true + 1e-5 * rng.standard_normal(m)
    A_damp = np.vstack([A, np.sqrt(lam) * np.eye(n)])
    b_damp = np.concatenate([b, np.zeros(n)])
    x_opt = np.linalg.lstsq(A_damp, b_damp, rcond=None)[0]
    res_opt = np.linalg.norm(A_damp @ x_opt - b_damp)
    sigma_min = np.linalg.svd(A_damp, compute_uv=False)[-1]

    # count sketch via the jax implementation
    from monogs_tpu.ops.sketch import apply_sketch, damped_lstsq, make_sketch

    stack_dim, sketch_dim = 8, 64
    d = stack_dim * sketch_dim
    spec = make_sketch(jax.random.PRNGKey(0), m, stack_dim, sketch_dim)
    SA = np.stack(
        [np.asarray(apply_sketch(jnp.asarray(A[:, j]), spec)) for j in range(n)],
        axis=1,
    )
    Sb = np.asarray(apply_sketch(jnp.asarray(b), spec))
    x_sketch = np.asarray(damped_lstsq(jnp.asarray(SA), jnp.asarray(-Sb), lam))
    # damped_lstsq solves min ||SA x + Sb||^2 + lam ||x||^2 given (SJ, Sf);
    # passing -Sb matches A x ~ b
    distortion_hat = np.sqrt(n / d)
    gamma = (1 + distortion_hat) / (1 - distortion_hat)
    upper = res_opt * np.sqrt(gamma**2 - 1) / sigma_min * gamma
    assert np.linalg.norm(x_opt - x_sketch) < max(upper, 1e-6), (
        np.linalg.norm(x_opt - x_sketch),
        upper,
    )


def test_stage_truncation_consistent_with_full():
    """TrackConfig.stage (attribution-only truncation,
    scripts/profile_track_fixed.py) must agree with the full program at
    every cut: the "fo"/"so" stages return the same pose trajectory the
    full run passes through, and "final_nc" differs from full only in
    n_touched."""
    ds, frame, T_gt = setup()
    T0 = perturbed(T_gt, mag=0.01)
    tcfg = TrackConfig(monocular=True, fo_max_iter=10, so_max_iter=4,
                       bin_margin=8.0, fo_tile_frac=0.5, so_tile_frac=0.5)
    cfg_p = CFG._replace(backend="pallas_lists", pallas_interpret=True,
                         with_n_touched=True)

    def run(stage):
        return track_frame(
            ds.scene, frame, T0, jnp.float32(1.0), jnp.float32(0.0),
            jax.random.PRNGKey(0), INTR, cfg_p, tcfg._replace(stage=stage),
        )

    full = run("full")
    r_build = run("build")
    # build stage stops right after the initial margin build
    np.testing.assert_array_equal(np.asarray(r_build.T), np.asarray(T0))
    assert np.isfinite(float(r_build.last_l1))
    r_lists = run("lists")
    # lists stage does no optimization: pose is the seed, live stats finite
    np.testing.assert_array_equal(np.asarray(r_lists.T), np.asarray(T0))
    assert np.isfinite(float(r_lists.last_l1))
    r_fo = run("fo")
    assert int(r_fo.fo_iters) == int(full.fo_iters)
    assert int(r_fo.so_iters) == 0
    r_sp = run("so_prep")
    assert int(r_sp.fo_iters) == int(full.fo_iters)
    assert int(r_sp.so_iters) == 0
    assert np.isfinite(float(r_sp.last_l1))
    r_so = run("so")
    assert int(r_so.so_iters) == int(full.so_iters)
    r_fnc = run("final_nc")
    np.testing.assert_allclose(np.asarray(r_fnc.T), np.asarray(full.T),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(r_fnc.image),
                               np.asarray(full.image), atol=1e-6)
    # the counts kernel is the ONLY difference
    assert int(jnp.sum(full.n_touched)) > 0
    assert int(jnp.sum(r_fnc.n_touched)) == 0
