"""Multi-chip sharding validated on the virtual 8-device CPU mesh."""

import jax
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (3, 128, 160)


def test_sharded_step_matches_single_device():
    """The view-sharded mapping gradient step must match the same step run
    on one device (psum correctness)."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from monogs_tpu.models import gaussian_map as gm
    from monogs_tpu.models.gaussian_map import ParamLeaves
    from monogs_tpu.parallel.mesh import (
        make_mesh, replicate_map, shard_views, sharded_map_step,
    )
    from monogs_tpu.render import Intrinsics, RenderConfig
    from monogs_tpu.slam.mapping import CamBatch, MapConfig

    intr = Intrinsics(fx=80.0, fy=80.0, cx=31.5, cy=31.5, width=64, height=64)
    cfg = RenderConfig(tile=16, macro_tiles=2, k_macro=256, k_fine=128)
    mcfg = MapConfig(monocular=False)
    hyper = gm.MapHyper()

    scene = ge._tiny_scene(256)
    m0 = gm.new_map(512, sh_degree=0)
    leaves = ParamLeaves(
        xyz=jnp.pad(scene.xyz, ((0, 256), (0, 0))),
        sh=jnp.pad(scene.sh, ((0, 256), (0, 0), (0, 0))),
        log_scale=jnp.pad(scene.log_scale, ((0, 256), (0, 0))),
        quat=jnp.pad(scene.quat, ((0, 256), (0, 0))),
        opa_logit=jnp.pad(scene.opa_logit, ((0, 256), (0, 0))),
    )
    m0 = gm.insert(m0, leaves, jnp.int32(256), kf_id=0)

    b = 4
    key = jax.random.PRNGKey(1)
    cams = CamBatch(
        gt_image=jax.random.uniform(key, (b, 3, 64, 64)),
        gt_depth=jnp.full((b, 1, 64, 64), 3.0),
        mapping_mask=jnp.ones((b, 1, 64, 64)),
        T=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ea=jnp.ones((b,)),
        eb=jnp.zeros((b,)),
        valid=jnp.ones((b,), bool),
        opt_pose=jnp.zeros((b,), bool),
        opt_exposure=jnp.zeros((b,), bool),
    )

    mesh4 = make_mesh(4)
    m4, _, loss4 = sharded_map_step(
        replicate_map(m0, mesh4), shard_views(cams, mesh4),
        jnp.int32(1), mesh4, intr, cfg, mcfg, hyper,
    )
    mesh1 = make_mesh(1)
    m1, _, loss1 = sharded_map_step(
        replicate_map(m0, mesh1), shard_views(cams, mesh1),
        jnp.int32(1), mesh1, intr, cfg, mcfg, hyper,
    )
    assert abs(float(loss4) - float(loss1)) < 1e-4
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(m4.params.xyz), np.asarray(m1.params.xyz), atol=1e-5
    )


def test_sharded_map_iters_matches_single_device():
    """The PRODUCTION fused mapping loop (map_iters: frozen lists, kf-pose
    Adam, densify/prune cond, opacity resets) under shard_map on a 4-device
    mesh must match the same loop run unsharded on one device — every
    cross-view reduction (grad psum, densify-stat psum/pmax, visibility)
    must commute with the sharding."""
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from monogs_tpu.models import gaussian_map as gm
    from monogs_tpu.models.gaussian_map import ParamLeaves
    from monogs_tpu.parallel.mesh import (
        make_mesh, replicate_map, shard_views, sharded_map_iters,
    )
    from monogs_tpu.render import Intrinsics, RenderConfig
    from monogs_tpu.slam.mapping import CamBatch, MapConfig, map_iters

    intr = Intrinsics(fx=80.0, fy=80.0, cx=31.5, cy=31.5, width=64, height=64)
    cfg = RenderConfig(tile=16, macro_tiles=2, k_macro=256, k_fine=128)
    # densify fires on iteration 3, opacity reset never; frozen lists on
    mcfg = MapConfig(
        monocular=False, window_size=4,
        gaussian_update_every=3, gaussian_update_offset=0,
        densify_from_iter=0, bin_margin=4.0,
    )
    hyper = gm.MapHyper()

    scene = ge._tiny_scene(256)
    m0 = gm.new_map(512, sh_degree=0)
    leaves = ParamLeaves(
        xyz=jnp.pad(scene.xyz, ((0, 256), (0, 0))),
        sh=jnp.pad(scene.sh, ((0, 256), (0, 0), (0, 0))),
        log_scale=jnp.pad(scene.log_scale, ((0, 256), (0, 0))),
        quat=jnp.pad(scene.quat, ((0, 256), (0, 0))),
        opa_logit=jnp.pad(scene.opa_logit, ((0, 256), (0, 0))),
    )
    m0 = gm.insert(m0, leaves, jnp.int32(256), kf_id=0)

    b = 4
    key = jax.random.PRNGKey(1)
    cams = CamBatch(
        gt_image=jax.random.uniform(key, (b, 3, 64, 64)),
        gt_depth=jnp.full((b, 1, 64, 64), 3.0),
        mapping_mask=jnp.ones((b, 1, 64, 64)),
        T=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ea=jnp.ones((b,)),
        eb=jnp.zeros((b,)),
        valid=jnp.ones((b,), bool),
        opt_pose=jnp.array([False, True, True, False]),
        opt_exposure=jnp.array([False, True, True, True]),
    )
    k_run = jax.random.PRNGKey(7)

    mesh4 = make_mesh(4)
    m4, cams4, it4, vis4, ka4 = sharded_map_iters(
        replicate_map(m0, mesh4), shard_views(cams, mesh4),
        4, jnp.int32(0), k_run, mesh4, intr, cfg, mcfg, hyper,
    )
    m1, cams1, it1, vis1, ka1 = map_iters(
        m0, cams, 4, jnp.int32(0), k_run, intr, cfg, mcfg, hyper,
    )
    assert int(it4) == int(it1) == 4
    np.testing.assert_allclose(
        np.asarray(m4.params.xyz), np.asarray(m1.params.xyz),
        atol=1e-5, err_msg="sharded map diverged from single-device",
    )
    np.testing.assert_allclose(
        np.asarray(m4.params.opa_logit), np.asarray(m1.params.opa_logit),
        atol=1e-5,
    )
    assert int(m4.n_active) == int(m1.n_active)
    np.testing.assert_allclose(
        np.asarray(cams4.T), np.asarray(cams1.T), atol=1e-5,
        err_msg="per-view pose Adam diverged under sharding",
    )
    np.testing.assert_array_equal(np.asarray(vis4), np.asarray(vis1))
    np.testing.assert_allclose(
        np.asarray(ka4[0]), np.asarray(ka1[0]), atol=1e-6,
    )


def test_slam_e2e_sharded_mapping():
    """Full SLAM run with the backend's mapping step sharded over a
    2-device mesh (config path: Parallel.n_devices -> BackEnd._map_iters ->
    sharded_map_iters). Same completion/accuracy contract as the
    single-device rgbd e2e — exercises keyframe staging, densify/prune, and
    the kf-Adam carry under shard_map inside the real pipeline."""
    import numpy as np
    import pytest

    pytest.importorskip("yaml")
    from test_slam_e2e import tiny_config

    from monogs_tpu.slam.runtime import SLAM

    cfg = tiny_config("depth")
    cfg["Dataset"]["synthetic"]["n_frames"] = 8
    cfg["Results"]["save_results"] = False
    cfg["Parallel"] = {"n_devices": 2}
    slam = SLAM(cfg, save_dir=None)
    slam.run()

    fe = slam.frontend
    assert len(fe.cameras) == 8
    assert len(fe.kf_indices) >= 2
    assert int(slam.backend.gaussians.n_active) > 500

    from monogs_tpu.eval.ate import evaluate_ate

    gt = [np.linalg.inv(np.asarray(fe.cameras[i].T_gt)) for i in fe.kf_indices]
    est = [np.linalg.inv(np.asarray(fe.cameras[i].T)) for i in fe.kf_indices]
    rmse, _ = evaluate_ate(gt, est, monocular=False)
    assert rmse < 0.03, rmse
