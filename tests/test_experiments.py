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


def test_step_size_sweep_runs():
    ds = SyntheticDataset(INTR, n_frames=1, n_gauss=300, render_cfg=CFG,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    from monogs_tpu.slam.experiments import step_size_sweep

    res = step_size_sweep(ds.scene, frame, T, INTR, CFG, TCFG,
                          jax.random.PRNGKey(2), step_sizes=(1e-3, 1e-2),
                          n_iters=3)
    assert len(res) == 2
    for v in res.values():
        assert len(v["losses"]) == 3


def test_kfine_truncation_vs_backward_subsampling():
    """Quantifies the COMPONENTS.md claim that the per-tile k_fine cap
    subsumes the reference's num_backward_gaussians: at a 1/8 backward
    fraction on a deliberately over-dense scene, BOTH mechanisms keep the
    pose gradient well aligned with the untruncated one (>0.9 cosine).
    Measured: truncation ~0.95, random subsampling ~0.98 — random
    subsampling noises an exact primal while truncation exactly
    differentiates a slightly different primal; both benign, and only
    truncation gives the static shapes TPU compilation needs. At the
    production regime (k_fine=96, bench density) ~95% of rows stay live,
    so truncation is near-exact there."""
    from monogs_tpu.data.synthetic import make_synthetic_scene
    from monogs_tpu.ops import se3
    from monogs_tpu.render import render
    from monogs_tpu.slam.experiments import kfine_vs_backward_subsample

    # dense scene (~250 overlapping splats per 16px tile) so the
    # k_fine=64 cap truncates hard while k_fine=512 is effectively exact
    scene = make_synthetic_scene(jax.random.PRNGKey(7), n=4000, spread=1.2,
                                 depth_mean=3.0, depth_spread=0.6,
                                 scale_min=0.04, scale_max=0.1)
    cfg = CFG._replace(k_macro=4096, k_fine=512)
    T = jnp.eye(4)
    out = render(scene, T, INTR, cfg._replace(with_n_touched=False))
    frame = make_frame_data(jnp.clip(out.image, 0.0, 1.0), None, 1.1, 0.01,
                            "synthetic")
    # perturbed pose so gradients are informative
    T0 = se3.se3_exp(0.01 * jax.random.normal(jax.random.PRNGKey(3), (6,))
                     ) @ T
    res = kfine_vs_backward_subsample(
        scene, frame, T0, INTR, cfg, TCFG, jax.random.PRNGKey(4),
        k_fine_full=512, k_fine_trunc=64,
    )
    assert res["frac"] == 0.125
    # emulation sanity: the subsampled gradient must actually differ
    assert res["cos_sub_pose"] < 0.999999, res
    # both mechanisms keep the pose gradient well aligned at 1/8 backward
    assert res["cos_trunc_pose"] > 0.9, res
    assert res["cos_sub_pose"] > 0.9, res
    assert 0.1 < res["norm_ratio_trunc"] < 10.0, res


def test_pool_staging_matches_fresh_sampling():
    """The mapping pool-staging approximation (slam/mapping.py:14-19):
    chunk-staged random keyframes must recover a degraded map about as
    well as the reference's fresh-per-iteration sampling at equal total
    iterations."""
    import jax.numpy as jnp

    from monogs_tpu.models import gaussian_map as gm
    from monogs_tpu.slam.experiments import pool_vs_fresh_sampling
    from monogs_tpu.slam.mapping import CamBatch, MapConfig

    ds = SyntheticDataset(INTR, n_frames=6, n_gauss=400, render_cfg=CFG,
                          trans_amp=0.05, rot_amp=0.02)
    n_views = 6
    imgs, Ts = [], []
    for i in range(n_views):
        img, _, T = ds[i]
        imgs.append(img)
        Ts.append(T)
    h, w = INTR.height, INTR.width
    views = CamBatch(
        gt_image=jnp.stack(imgs), gt_depth=jnp.zeros((n_views, 1, h, w)),
        mapping_mask=jnp.ones((n_views, 1, h, w)), T=jnp.stack(Ts),
        ea=jnp.ones((n_views,)), eb=jnp.zeros((n_views,)),
        valid=jnp.ones((n_views,), bool),
        opt_pose=jnp.zeros((n_views,), bool),
        opt_exposure=jnp.zeros((n_views,), bool),
    )
    n = ds.scene.xyz.shape[0]
    cap = 512
    leaves = gm.ParamLeaves(
        xyz=jnp.pad(ds.scene.xyz, ((0, cap - n), (0, 0))),
        sh=jnp.pad(ds.scene.sh, ((0, cap - n), (0, 0), (0, 0))),
        log_scale=jnp.pad(ds.scene.log_scale, ((0, cap - n), (0, 0))),
        quat=jnp.pad(ds.scene.quat, ((0, cap - n), (0, 0))),
        opa_logit=jnp.pad(ds.scene.opa_logit, ((0, cap - n), (0, 0))),
    )
    m = gm.insert(gm.new_map(cap), leaves, jnp.int32(n), kf_id=0)
    # no densify/reset inside the comparison window
    mcfg = MapConfig(monocular=True, window_size=3, pool_size=2,
                     gaussian_update_every=10_000, gaussian_reset=10_000,
                     densify_from_iter=10_000)
    res = pool_vs_fresh_sampling(
        m, views, INTR, CFG, mcfg, gm.MapHyper(), jax.random.PRNGKey(5),
        n_iters=30, window=3, pool=2, chunk=10,
    )
    assert res["staged_l1"] < res["start_l1"], res
    assert res["fresh_l1"] < res["start_l1"], res
    # staged within 25% of fresh (the declared approximation is benign)
    assert res["staged_l1"] < 1.25 * res["fresh_l1"] + 1e-4, res
