"""Gaussian-sharded PRODUCTION mapping loop (parallel/gauss_iters.py):
`gp_sharded_map_iters` over a CPU ("gauss",) mesh — and the 2-D
("view", "gauss") composition — must match single-device
`slam.mapping.map_iters` on the same inputs: same pose/exposure updates,
same map parameters (up to the 1-2 ulp preprocess reassociation the
[N/D]-vs-[N] shapes introduce, amplified through a few Adam steps), same
visibility."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import __graft_entry__ as ge
from monogs_tpu.models import gaussian_map as gm
from monogs_tpu.models.gaussian_map import ParamLeaves
from monogs_tpu.parallel.gauss_iters import (
    gp_sharded_map_iters, make_gauss_mesh2,
)
from monogs_tpu.render import Intrinsics, RenderConfig, render
from monogs_tpu.slam.mapping import CamBatch, MapConfig, map_iters

INTR = Intrinsics(fx=80.0, fy=80.0, cx=31.5, cy=31.5, width=64, height=64)
CFG = RenderConfig(tile=16, macro_tiles=2, k_macro=256, k_fine=128,
                   with_n_touched=True, pallas_interpret=True)
# 4 iterations stay below every densify/reset/rebin trigger, so the
# sharded and single-device loops traverse identical schedules
MCFG = MapConfig(monocular=True, window_size=2, pose_window=2,
                 bin_margin=4.0, fused_grad=True, vis_from_lists=True)
HYPER = gm.MapHyper()


def _setup(b=4):
    scene = ge._tiny_scene(256)
    m0 = gm.new_map(512, sh_degree=0)
    leaves = ParamLeaves(
        xyz=jnp.pad(scene.xyz, ((0, 256), (0, 0))),
        sh=jnp.pad(scene.sh, ((0, 256), (0, 0), (0, 0))),
        log_scale=jnp.pad(scene.log_scale, ((0, 256), (0, 0))),
        quat=jnp.pad(scene.quat, ((0, 256), (0, 0))),
        opa_logit=jnp.pad(scene.opa_logit, ((0, 256), (0, 0))),
    )
    m = gm.insert(m0, leaves, jnp.int32(256), kf_id=0)
    gauss = m.render_view()
    Ts, gts = [], []
    from monogs_tpu.ops import se3

    for i in range(b):
        tau = jnp.array([0.01, -0.005, 0.008, 0.004, -0.006, 0.003]) * i
        T = se3.retract(jnp.eye(4), tau)
        out = render(gauss, T, INTR, CFG._replace(with_n_touched=False))
        Ts.append(T)
        gts.append(jnp.clip(out.image, 0.0, 1.0))
    h, w = INTR.height, INTR.width
    cams = CamBatch(
        gt_image=jnp.stack(gts),
        gt_depth=jnp.zeros((b, 1, h, w)),
        mapping_mask=jnp.ones((b, 1, h, w)),
        T=jnp.stack(Ts),
        ea=jnp.full((b,), 1.05),
        eb=jnp.full((b,), 0.02),
        valid=jnp.array([True] * (b - 1) + [False]),
        opt_pose=jnp.array([False, True, True, False]),
        opt_exposure=jnp.array([False, True, True, True]),
    )
    return m, cams


def _run_ref(m, cams, n=4):
    return map_iters(
        m, cams, jnp.int32(n), jnp.int32(7), jax.random.PRNGKey(3),
        INTR, CFG, MCFG, HYPER,
    )


def _check(ref, out):
    m1, cams1, it1, vis1, ka1 = ref
    m2, cams2, it2, vis2, ka2 = out
    assert int(it1) == int(it2)
    np.testing.assert_allclose(
        np.asarray(cams2.T), np.asarray(cams1.T), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cams2.ea), np.asarray(cams1.ea), rtol=1e-5, atol=1e-7
    )
    for name in ParamLeaves._fields:
        a = np.asarray(getattr(m1.params, name))
        b = np.asarray(getattr(m2.params, name))
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4,
                                   err_msg=name)
    # visibility: the sharded counts use the same frozen selection — the
    # boolean masks must agree everywhere
    np.testing.assert_array_equal(np.asarray(vis2), np.asarray(vis1))


def test_gp_map_iters_matches_single_device():
    m, cams = _setup()
    ref = _run_ref(m, cams)
    mesh = Mesh(jax.devices()[:4], ("gauss",))
    out = gp_sharded_map_iters(
        m, cams, 4, 7, jax.random.PRNGKey(3), mesh,
        INTR, CFG, MCFG, HYPER,
    )
    _check(ref, out)


def test_gp_map_iters_2d_view_gauss_mesh():
    """The ("view", "gauss") composition the gauss.py docstring promises:
    cams sharded over 2 view groups x map sharded over 4 shards."""
    m, cams = _setup()
    ref = _run_ref(m, cams)
    mesh = make_gauss_mesh2(2, 4)
    out = gp_sharded_map_iters(
        m, cams, 4, 7, jax.random.PRNGKey(3), mesh,
        INTR, CFG, MCFG, HYPER,
    )
    _check(ref, out)


def test_slam_e2e_gauss_sharded_mapping():
    """Full SLAM run with the MAP sharded over a 2-device "gauss" mesh
    (config path: Parallel.gauss_devices -> BackEnd._map_iters ->
    gp_sharded_map_iters). Same completion/accuracy contract as the
    view-sharded e2e (tests/test_multichip.py) — exercises keyframe
    staging, shard-local densify/prune, and the kf-Adam carry through the
    all_gather merge inside the real pipeline."""
    import numpy as np
    import pytest

    pytest.importorskip("yaml")
    from test_slam_e2e import tiny_config

    from monogs_tpu.slam.runtime import SLAM

    cfg = tiny_config("depth")
    cfg["Dataset"]["synthetic"]["n_frames"] = 6
    cfg["Results"]["save_results"] = False
    cfg["Parallel"] = {"gauss_devices": 2}
    # the gauss-sharded mapping loop is Pallas-only (fused loss/grad +
    # counts kernels); interpret mode is the CPU execution path
    cfg["Renderer"]["backend"] = "pallas_lists"
    cfg["Renderer"]["pallas_interpret"] = True
    slam = SLAM(cfg, save_dir=None)
    slam.run()

    fe = slam.frontend
    assert len(fe.cameras) == 6
    assert len(fe.kf_indices) >= 2
    assert int(slam.backend.gaussians.n_active) > 500

    from monogs_tpu.eval.ate import evaluate_ate

    gt = [np.linalg.inv(np.asarray(fe.cameras[i].T_gt))
          for i in fe.kf_indices]
    est = [np.linalg.inv(np.asarray(fe.cameras[i].T))
          for i in fe.kf_indices]
    rmse, _ = evaluate_ate(gt, est, monocular=False)
    assert rmse < 0.03, rmse


def test_gp_map_iters_tile_frac_matches_single_device():
    """With MapConfig.tile_frac < 1 the gauss-sharded loop draws the SAME
    per-iteration tile subsets as the single-device loop (identical key
    schedule: split k_dens then k_sub per iteration), so a 1-D gauss mesh
    still matches single-device map_iters bit-for-ulp. (On a 2-D
    ("view","gauss") mesh the per-view-group key derivation differs and
    only property checks apply — the subsets are equally valid draws.)"""
    m, cams = _setup()
    mcfg = MCFG._replace(tile_frac=0.5)
    # the single-device loop honors tile_frac only on its fused pallas
    # path (MapConfig docstring) — pin the backend for the reference
    cfg_p = CFG._replace(backend="pallas_lists")
    ref = map_iters(
        m, cams, jnp.int32(4), jnp.int32(7), jax.random.PRNGKey(3),
        INTR, cfg_p, mcfg, HYPER,
    )
    mesh = Mesh(jax.devices()[:4], ("gauss",))
    out = gp_sharded_map_iters(
        m, cams, 4, 7, jax.random.PRNGKey(3), mesh,
        INTR, cfg_p, mcfg, HYPER,
    )
    _check(ref, out)


def test_gp_map_iters_through_densify_event():
    """Drive the gauss-sharded loop THROUGH densify/prune + opacity-reset
    events (VERDICT r4 #8b — the equality tests above deliberately stay
    below every trigger because per-shard densify is INTENTIONALLY
    different from single-device: clone_cap/split_cap apply per shard,
    module docstring). Property checks instead of equality:
      - every returned leaf is finite,
      - the active set survives and stays within capacity,
      - densify bookkeeping (grad_accum/denom) was consumed (reset to 0
        at the event) and visibility still flows,
      - a second call composes (the map remains a valid input).
    """
    m, cams = _setup()
    # perturb so densification stats are non-trivial
    k = jax.random.PRNGKey(11)
    m = m._replace(params=m.params._replace(
        sh=m.params.sh + 0.2 * jax.random.normal(k, m.params.sh.shape),
    ))
    mcfg = MCFG._replace(
        # trigger densify at itc=2 and 4, opacity reset at itc=3
        gaussian_update_every=2, gaussian_update_offset=0,
        gaussian_reset=3,
        densify_grad_threshold=1e-9,  # force clones/splits to happen
        clone_cap=16, split_cap=8,
    )
    mesh = Mesh(jax.devices()[:4], ("gauss",))
    out = gp_sharded_map_iters(
        m, cams, 5, 0, jax.random.PRNGKey(3), mesh,
        INTR, CFG, mcfg, HYPER,
    )
    m2, cams2, it2, vis2, ka2 = out
    assert int(it2) == 5
    for name in ParamLeaves._fields:
        assert np.isfinite(np.asarray(getattr(m2.params, name))).all(), name
    n_act = int(np.asarray(m2.active).sum())
    assert 0 < n_act <= m2.capacity
    # the run passed through at least one densify event: stats were reset
    # afterwards and re-accumulated for at most (iters since event) steps
    assert np.isfinite(np.asarray(m2.grad_accum)).all()
    assert np.asarray(vis2).any()
    for a in ka2:
        assert np.isfinite(np.asarray(a)).all()
    # composes: the returned (sharded-layout) map drives another call
    out2 = gp_sharded_map_iters(
        m2, cams2, 2, 5, jax.random.PRNGKey(4), mesh,
        INTR, CFG, mcfg, HYPER, kf_adam=ka2,
    )
    assert np.isfinite(np.asarray(out2[0].params.xyz)).all()
    assert int(np.asarray(out2[0].active).sum()) > 0


def test_gp_map_iters_initialization_mode():
    """Init BA (single view, no pose/exposure opt) through the gauss mesh
    matches the single-device loop.

    The map is PERTURBED away from the gt-rendering params first: init mode
    has no exposure term, so an exactly-converged fixture leaves residuals
    at float-noise level where L1's sign(r) flips on the ~1e-7 preprocess
    reassociation between [N/D] and [N] shard shapes — the gradient itself
    becomes sign-noise and no equality bound holds (measured: dd maxdiff
    5.7e-3 converged vs 2.3e-8 with real residuals)."""
    m, cams = _setup(b=1)
    k = jax.random.PRNGKey(9)
    m = m._replace(params=m.params._replace(
        xyz=m.params.xyz + 0.01 * jax.random.normal(k, m.params.xyz.shape),
        log_scale=m.params.log_scale + 0.05,
    ))
    cams = cams._replace(
        valid=jnp.array([True]), opt_pose=jnp.array([False]),
        opt_exposure=jnp.array([False]),
    )
    mesh = Mesh(jax.devices()[:4], ("gauss",))
    ref = map_iters(
        m, cams, jnp.int32(6), jnp.int32(0), jax.random.PRNGKey(1),
        INTR, CFG, MCFG, HYPER, initialization=True,
    )
    out = gp_sharded_map_iters(
        m, cams, 6, 0, jax.random.PRNGKey(1), mesh,
        INTR, CFG, MCFG, HYPER, initialization=True,
    )
    _check(ref, out)
