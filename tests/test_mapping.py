"""Mapping optimizer tests: the fused map_iters program must reduce the
photometric loss and keep the map consistent; color refinement must improve
reconstruction of held-out appearance."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.data.synthetic import make_synthetic_scene
from monogs_tpu.models import gaussian_map as gm
from monogs_tpu.models.gaussian_map import ParamLeaves
from monogs_tpu.render import Intrinsics, RenderConfig, render
from monogs_tpu.slam.mapping import CamBatch, MapConfig, map_iters

INTR = Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)
CFG = RenderConfig(tile=16, macro_tiles=2, k_macro=512, k_fine=128)
MCFG = MapConfig(
    monocular=False, window_size=2, pose_window=2,
    gaussian_update_every=10**9,  # no densify in the loss-descent test
    gaussian_reset=10**9,
)
HYPER = gm.MapHyper()


def scene_and_map(seed=0, n=300, cap=1024):
    scene = make_synthetic_scene(
        jax.random.PRNGKey(seed), n=n, spread=1.2, depth_mean=3.0,
        depth_spread=0.5,
    )
    m = gm.new_map(cap, sh_degree=0)
    pad = cap - n
    leaves = ParamLeaves(
        xyz=jnp.pad(scene.xyz, ((0, pad), (0, 0))),
        sh=jnp.pad(scene.sh, ((0, pad), (0, 0), (0, 0))),
        log_scale=jnp.pad(scene.log_scale, ((0, pad), (0, 0))),
        quat=jnp.pad(scene.quat, ((0, pad), (0, 0))),
        opa_logit=jnp.pad(scene.opa_logit, ((0, pad), (0, 0))),
    )
    m = gm.insert(m, leaves, jnp.int32(n), kf_id=0)
    return scene, m


def target_views(scene, n_views=3):
    from monogs_tpu.data.synthetic import orbit_pose

    views = []
    for i in range(n_views):
        T = orbit_pose(i / 16.0, trans_amp=0.05, rot_amp=0.01)
        out = render(scene, T, INTR, CFG._replace(with_n_touched=False))
        views.append((jnp.clip(out.image, 0, 1), out.depth, T))
    return views


def make_batch(views, b=3):
    h, w = INTR.height, INTR.width
    imgs = jnp.stack([v[0] for v in views])
    depths = jnp.stack([v[1] for v in views])
    Ts = jnp.stack([v[2] for v in views])
    return CamBatch(
        gt_image=imgs, gt_depth=depths,
        mapping_mask=jnp.ones((b, 1, h, w)),
        T=Ts, ea=jnp.ones((b,)), eb=jnp.zeros((b,)),
        valid=jnp.ones((b,), bool),
        opt_pose=jnp.zeros((b,), bool),
        opt_exposure=jnp.zeros((b,), bool),
    )


def photometric_err(m, views):
    errs = []
    for img, _, T in views:
        out = render(m.render_view(), T, INTR, CFG._replace(with_n_touched=False))
        errs.append(float(jnp.mean(jnp.abs(out.image - img))))
    return float(np.mean(errs))


def test_map_iters_reduces_loss():
    scene, m = scene_and_map()
    views = target_views(scene)
    # perturb the map so there is something to optimize
    key = jax.random.PRNGKey(7)
    noisy = m._replace(
        params=m.params._replace(
            sh=m.params.sh + 0.3 * jax.random.normal(key, m.params.sh.shape),
            xyz=m.params.xyz
            + 0.01 * jax.random.normal(key, m.params.xyz.shape),
        )
    )
    cams = make_batch(views)
    before = photometric_err(noisy, views)
    m2, cams2, it, vis, _ = map_iters(
        noisy, cams, 40, jnp.int32(0), jax.random.PRNGKey(0),
        INTR, CFG, MCFG, HYPER,
    )
    after = photometric_err(m2, views)
    assert after < 0.6 * before, (before, after)
    assert int(it) == 40
    # visibility rows populated for valid views
    assert bool(vis[0].any())


def test_map_iters_pose_refinement():
    """Window pose optimization: perturb a window pose; BA must pull it back."""
    from monogs_tpu.ops import se3

    scene, m = scene_and_map()
    views = target_views(scene)
    cams = make_batch(views)
    # perturb view 1's pose but tell BA its gt image came from the true pose
    d = jnp.array([0.004, -0.003, 0.002, 0.002, -0.002, 0.001])
    T_pert = se3.se3_exp(d) @ cams.T[1]
    cams = cams._replace(
        T=cams.T.at[1].set(T_pert),
        opt_pose=jnp.array([False, True, False]),
        opt_exposure=jnp.array([False, True, False]),
    )
    before, _ = se3.pose_diff(T_pert, views[1][2])
    _, cams2, _, _, _ = map_iters(
        m, cams, 60, jnp.int32(0), jax.random.PRNGKey(0),
        INTR, CFG, MCFG, HYPER,
    )
    after, _ = se3.pose_diff(cams2.T[1], views[1][2])
    assert float(after) < 0.5 * float(before), (float(before), float(after))


def test_densify_inside_loop_runs():
    scene, m = scene_and_map(n=200, cap=2048)
    views = target_views(scene)
    cams = make_batch(views)
    mcfg = MCFG._replace(
        gaussian_update_every=5, gaussian_update_offset=0,
        clone_cap=256, split_cap=128,
    )
    m2, _, _, _, _ = map_iters(
        m, cams, 12, jnp.int32(0), jax.random.PRNGKey(0),
        INTR, CFG, mcfg, HYPER,
    )
    assert np.isfinite(np.asarray(m2.params.xyz)).all()
    assert int(m2.n_active) > 0


def test_batch_loss_pallas_matches_xla():
    """The batched multi-view blend (render_batch, ONE kernel call across
    views) must produce the same mapping loss and gradients as the per-view
    lax.map XLA path."""
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.slam.mapping import _batch_loss

    scene, m = scene_and_map()
    views = target_views(scene, 3)
    cams = make_batch(views)
    # bound residuals away from 0: the L1 subgradient sign flips on backend
    # numerical noise wherever |r| ~ 0 (same trick as test_vjp_parity)
    cams = cams._replace(gt_image=cams.gt_image + 0.03,
                         gt_depth=cams.gt_depth + 0.05)
    b = 3
    n = m.capacity
    cfg_x = CFG._replace(with_n_touched=False)
    cfg_p = cfg_x._replace(backend="pallas_lists", pallas_interpret=True)

    lists_b = jax.lax.map(
        lambda T: build_tile_lists(m.render_view(), T, INTR, cfg_x,
                                   margin=4.0),
        cams.T,
    )
    taus = jnp.zeros((b, 6))
    offs = jnp.zeros((b, n, 2))

    mcfg_batch = MCFG._replace(batch_render=True)  # the path under test

    def run(cfg):
        return jax.value_and_grad(
            lambda params, taus, eas, ebs, offs: _batch_loss(
                params, taus, eas, ebs, cams, m.active, offs,
                INTR, cfg, mcfg_batch, False, lists_b,
            ),
            argnums=(0, 1, 2, 3, 4), has_aux=True,
        )(m.params, taus, cams.ea, cams.eb, offs)

    (loss_x, radii_x), g_x = run(cfg_x)
    (loss_p, radii_p), g_p = run(cfg_p)
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(radii_p), np.asarray(radii_x),
                               atol=1e-4)
    for a, b_ in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=5e-5,
            err_msg="gradient mismatch between batched pallas and xla paths",
        )


def test_mapping_fused_grad_parity():
    """render_map_grad (fused mapping loss+gradient kernel) matches
    value_and_grad of render()+mapping_loss through the XLA blend: loss and
    all gradients (params, tau, screen-space offset hook, exposure), mono
    and RGB-D, with and without the initialization flag."""
    from monogs_tpu.ops import losses
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import render_map_grad, tile_images

    scene, m = scene_and_map()
    views = target_views(scene, 2)
    img, dep, T = views[1]
    gt_img = img + 0.03          # bound residuals away from the L1 kink
    gt_dep = dep + 0.05
    mask = jnp.ones((1, INTR.height, INTR.width))
    n = m.capacity
    cfg_x = CFG._replace(with_n_touched=False)
    cfg_p = cfg_x._replace(backend="pallas_lists", pallas_interpret=True)
    gauss = m.render_view()
    lists = build_tile_lists(gauss, T, INTR, cfg_x, margin=4.0)
    gt_t = tile_images(gt_img, INTR, cfg_x)
    mask_t = tile_images(mask, INTR, cfg_x)
    gtd_t = tile_images(gt_dep, INTR, cfg_x)
    ea, eb = jnp.float32(1.08), jnp.float32(0.02)
    tau0, off0 = jnp.zeros(6), jnp.zeros((n, 2))
    alpha = 0.9

    for rgbd in (False, True):
        for init in (False, True):
            def ref_loss(leaves, tau, off, ea_, eb_):
                g = gauss._replace(
                    xyz=leaves[0], sh=leaves[1], log_scale=leaves[2],
                    quat=leaves[3], opa_logit=leaves[4],
                )
                out = render(g, T, INTR, cfg_x, tau=tau,
                             means2d_offset=off, lists=lists)
                if rgbd:
                    return losses.mapping_loss_rgbd(
                        out.image, out.depth, gt_img, gt_dep, mask,
                        ea_, eb_, alpha=alpha, initialization=init,
                    )
                return losses.mapping_loss_rgb(
                    out.image, gt_img, mask, ea_, eb_, initialization=init,
                )

            leaves = (m.params.xyz, m.params.sh, m.params.log_scale,
                      m.params.quat, m.params.opa_logit)
            loss_r, g_r = jax.value_and_grad(
                ref_loss, argnums=(0, 1, 2, 3, 4)
            )(leaves, tau0, off0, ea, eb)
            gl_r, gt_r, go_r, gea_r, geb_r = g_r

            loss_f, gl_f, gt_f, go_f, gea_f, geb_f, radii = render_map_grad(
                gauss, T, INTR, cfg_p, lists, gt_t, mask_t, tau0, off0,
                ea, eb, init, alpha, gtd_t=gtd_t if rgbd else None,
            )
            tag = f"rgbd={rgbd} init={init}"
            np.testing.assert_allclose(float(loss_f), float(loss_r),
                                       rtol=2e-5, err_msg=tag)
            for a, b_ in zip(jax.tree.leaves(gl_r), jax.tree.leaves(gl_f)):
                np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                           atol=5e-5, err_msg=tag)
            np.testing.assert_allclose(gt_f, gt_r, atol=5e-5, err_msg=tag)
            np.testing.assert_allclose(go_f, go_r, atol=5e-5, err_msg=tag)
            # ea/eb gradients are f32 sums over ~300k pixel terms; the fused
            # kernel reduces tile-wise while XLA-AD reduces globally, so the
            # two differ by accumulation order alone (measured rel ~1.7e-5
            # on the eb leg, value ~0.622). sqrt(N)*eps-scale noise on a sum
            # this long makes an absolute 5e-6 bound unsatisfiable in
            # principle — bound relatively with the same headroom as the
            # other legs, keeping atol only for near-zero gradients.
            np.testing.assert_allclose(gea_f, gea_r, rtol=5e-5, atol=5e-6,
                                       err_msg=tag)
            np.testing.assert_allclose(geb_f, geb_r, rtol=5e-5, atol=5e-6,
                                       err_msg=tag)
            assert np.isfinite(np.asarray(radii)).all()


def test_mapping_segsum_scatter_parity():
    """render_map_grad with the frozen-permutation segment-sum pullback
    (sortperm) matches the XLA scatter-add pullback: the same per-row adds
    land in a different order, so every gradient agrees to f32
    reassociation noise."""
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import render_map_grad, tile_images

    scene, m = scene_and_map()
    views = target_views(scene, 2)
    img, dep, T = views[1]
    gt_img = img + 0.03
    gt_dep = dep + 0.05
    mask = jnp.ones((1, INTR.height, INTR.width))
    n = m.capacity
    cfg_p = CFG._replace(with_n_touched=False, backend="pallas_lists",
                         pallas_interpret=True)
    gauss = m.render_view()
    lists = build_tile_lists(gauss, T, INTR, cfg_p, margin=4.0)
    gt_t = tile_images(gt_img, INTR, cfg_p)
    mask_t = tile_images(mask, INTR, cfg_p)
    gtd_t = tile_images(gt_dep, INTR, cfg_p)
    ea, eb = jnp.float32(1.08), jnp.float32(0.02)
    tau0, off0 = jnp.zeros(6), jnp.zeros((n, 2))

    flat = lists.idx.reshape(-1)
    perm = jnp.argsort(flat).astype(jnp.int32)
    sids = flat[perm]

    for rgbd in (False, True):
        ref = render_map_grad(
            gauss, T, INTR, cfg_p, lists, gt_t, mask_t, tau0, off0,
            ea, eb, False, 0.9, gtd_t=gtd_t if rgbd else None,
        )
        out = render_map_grad(
            gauss, T, INTR, cfg_p, lists, gt_t, mask_t, tau0, off0,
            ea, eb, False, 0.9, gtd_t=gtd_t if rgbd else None,
            sortperm=(perm, sids),
        )
        tag = f"rgbd={rgbd}"
        np.testing.assert_allclose(float(out[0]), float(ref[0]),
                                   rtol=1e-6, err_msg=tag)
        for a, b_ in zip(jax.tree.leaves(ref[1]), jax.tree.leaves(out[1])):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=1e-5, err_msg=tag)
        np.testing.assert_allclose(out[2], ref[2], atol=1e-5, err_msg=tag)
        np.testing.assert_allclose(out[3], ref[3], atol=1e-5, err_msg=tag)
        np.testing.assert_allclose(out[4], ref[4], rtol=1e-5, atol=1e-7,
                                   err_msg=tag)
        np.testing.assert_allclose(out[5], ref[5], rtol=1e-5, atol=1e-7,
                                   err_msg=tag)
        np.testing.assert_array_equal(np.asarray(out[6]),
                                      np.asarray(ref[6]), err_msg=tag)


def test_map_iters_io_batch_parity():
    """The batched-IO fused path (MapConfig.io_batch: one view-offset flat
    gather, in-kernel validity mask, one flat scatter) matches the
    per-view fused path through several full map_iters iterations — same
    kernel math, different gather/scatter shapes, so only f32
    reassociation separates them."""
    scene, m = scene_and_map()
    views = target_views(scene)
    cams = make_batch(views)
    cfg_p = CFG._replace(backend="pallas_lists", pallas_interpret=True)
    outs = {}
    for iob in (False, True):
        mcfg = MCFG._replace(io_batch=iob)
        m2, cams2, it, vis, ka = map_iters(
            m, cams, jnp.int32(3), jnp.int32(7), jax.random.PRNGKey(0),
            INTR, cfg_p, mcfg, HYPER,
        )
        outs[iob] = (m2, cams2, vis)
    for name in ("xyz", "sh", "log_scale", "quat", "opa_logit"):
        a = np.asarray(getattr(outs[False][0].params, name))
        b_ = np.asarray(getattr(outs[True][0].params, name))
        np.testing.assert_allclose(b_, a, atol=5e-5, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(outs[True][1].T), np.asarray(outs[False][1].T),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(outs[True][2]), np.asarray(outs[False][2])
    )


def test_map_iters_fused_reduces_loss():
    """Full map_iters with the fused mapping gradient (pallas_lists
    interpret, MapConfig.fused_grad) descends like the autodiff path and
    keeps densify statistics flowing (visibility from stacked radii)."""
    scene, m = scene_and_map()
    views = target_views(scene)
    key = jax.random.PRNGKey(7)
    noisy = m._replace(
        params=m.params._replace(
            sh=m.params.sh + 0.3 * jax.random.normal(key, m.params.sh.shape),
            xyz=m.params.xyz
            + 0.01 * jax.random.normal(key, m.params.xyz.shape),
        )
    )
    cams = make_batch(views)
    cfg_p = CFG._replace(backend="pallas_lists", pallas_interpret=True)
    before = photometric_err(noisy, views)
    m2, _, it, vis, _ = map_iters(
        noisy, cams, 40, jnp.int32(0), jax.random.PRNGKey(0),
        INTR, cfg_p, MCFG, HYPER,
    )
    after = photometric_err(m2, views)
    assert after < 0.6 * before, (before, after)
    assert int(it) == 40
    assert bool(vis[0].any())


def test_map_grad_tile_subset_partition_parity():
    """Tile-subset mapping gradients are EXACTLY unbiased: averaging the
    1/frac-scaled subset calls over a disjoint partition of the fine tiles
    reproduces the full-list loss and every gradient (each tile's
    contribution is linear in the pullback, so the identity is exact up to
    f32 summation order). This is the correctness contract behind
    MapConfig.tile_frac."""
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import (
        TileLists, _tile_origins, render_map_grad, tile_images,
    )

    scene, m = scene_and_map()
    views = target_views(scene, 2)
    img, dep, T = views[1]
    gt_img = img + 0.03
    gt_dep = dep + 0.05
    mask = jnp.ones((1, INTR.height, INTR.width))
    n = m.capacity
    cfg_p = CFG._replace(with_n_touched=False, backend="pallas_lists",
                         pallas_interpret=True)
    gauss = m.render_view()
    lists = build_tile_lists(gauss, T, INTR, cfg_p, margin=4.0)
    gt_t = tile_images(gt_img, INTR, cfg_p)
    mask_t = tile_images(mask, INTR, cfg_p)
    gtd_t = tile_images(gt_dep, INTR, cfg_p)
    ea, eb = jnp.float32(1.08), jnp.float32(0.02)
    tau0, off0 = jnp.zeros(6), jnp.zeros((n, 2))
    tx0f, ty0f = _tile_origins(INTR, cfg_p)
    n_fine = lists.idx.shape[0]
    s = n_fine // 2
    frac = s / n_fine
    # a shuffled disjoint partition (subsets need not be contiguous)
    tperm = jax.random.permutation(jax.random.PRNGKey(3), n_fine)

    for rgbd in (False, True):
        ref = render_map_grad(
            gauss, T, INTR, cfg_p, lists, gt_t, mask_t, tau0, off0,
            ea, eb, False, 0.9, gtd_t=gtd_t if rgbd else None,
        )
        parts = []
        for half in (tperm[:s], tperm[s:]):
            parts.append(render_map_grad(
                gauss, T, INTR, cfg_p,
                TileLists(idx=lists.idx[half], vld=lists.vld[half]),
                gt_t[half], mask_t[half], tau0, off0, ea, eb, False, 0.9,
                gtd_t=gtd_t[half] if rgbd else None,
                txy=(tx0f[half], ty0f[half]), px_frac=frac,
            ))
        avg = jax.tree.map(lambda a, b_: 0.5 * (a + b_), parts[0], parts[1])
        tag = f"rgbd={rgbd}"
        np.testing.assert_allclose(float(avg[0]), float(ref[0]),
                                   rtol=1e-5, err_msg=tag)
        for a, b_ in zip(jax.tree.leaves(ref[1]), jax.tree.leaves(avg[1])):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=2e-5, err_msg=tag)
        np.testing.assert_allclose(avg[2], ref[2], atol=2e-5, err_msg=tag)
        np.testing.assert_allclose(avg[3], ref[3], atol=2e-5, err_msg=tag)
        np.testing.assert_allclose(avg[4], ref[4], rtol=2e-5, atol=2e-7,
                                   err_msg=tag)
        np.testing.assert_allclose(avg[5], ref[5], rtol=2e-5, atol=2e-7,
                                   err_msg=tag)
        # radii come from the full preprocess on every call
        np.testing.assert_array_equal(np.asarray(parts[0][6]),
                                      np.asarray(ref[6]), err_msg=tag)


def test_map_grad_gather_first_parity():
    """gather-first mapping gradients (parameters gathered by list id
    BEFORE preprocess, leaf cotangents scattered back) match the default
    full-N pipeline: preprocess is per-row elementwise so the rows are
    IDENTICAL, and the pullback performs the same adds in a different
    order (f32 reassociation only). Full lists AND a tile subset."""
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import (
        TileLists, _tile_origins, render_map_grad, tile_images,
    )

    scene, m = scene_and_map()
    views = target_views(scene, 2)
    img, dep, T = views[1]
    gt_img = img + 0.03
    gt_dep = dep + 0.05
    mask = jnp.ones((1, INTR.height, INTR.width))
    n = m.capacity
    cfg_p = CFG._replace(with_n_touched=False, backend="pallas_lists",
                         pallas_interpret=True)
    gauss = m.render_view()
    lists = build_tile_lists(gauss, T, INTR, cfg_p, margin=4.0)
    gt_t = tile_images(gt_img, INTR, cfg_p)
    mask_t = tile_images(mask, INTR, cfg_p)
    gtd_t = tile_images(gt_dep, INTR, cfg_p)
    ea, eb = jnp.float32(1.08), jnp.float32(0.02)
    tau0, off0 = jnp.zeros(6), jnp.zeros((n, 2))
    tx0f, ty0f = _tile_origins(INTR, cfg_p)
    n_fine = lists.idx.shape[0]
    ts = jax.random.permutation(jax.random.PRNGKey(3), n_fine)[:n_fine // 2]
    sub = dict(
        lists=TileLists(idx=lists.idx[ts], vld=lists.vld[ts]),
        gt_t=gt_t[ts], mask_t=mask_t[ts], gtd_t=gtd_t[ts],
        txy=(tx0f[ts], ty0f[ts]), px_frac=(n_fine // 2) / n_fine,
    )
    full = dict(lists=lists, gt_t=gt_t, mask_t=mask_t, gtd_t=gtd_t,
                txy=None, px_frac=1.0)

    for name, kw in (("full", full), ("subset", sub)):
        for rgbd in (False, True):
            args = (gauss, T, INTR, cfg_p, kw["lists"], kw["gt_t"],
                    kw["mask_t"], tau0, off0, ea, eb, False, 0.9)
            kws = dict(gtd_t=kw["gtd_t"] if rgbd else None,
                       txy=kw["txy"], px_frac=kw["px_frac"])
            ref = render_map_grad(*args, **kws)
            out = render_map_grad(*args, **kws, gather_first=True)
            tag = f"{name} rgbd={rgbd}"
            np.testing.assert_allclose(float(out[0]), float(ref[0]),
                                       rtol=1e-6, err_msg=tag)
            for a, b_ in zip(jax.tree.leaves(ref[1]),
                             jax.tree.leaves(out[1])):
                np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                           atol=2e-5, err_msg=tag)
            np.testing.assert_allclose(out[2], ref[2], atol=2e-5,
                                       err_msg=tag)
            np.testing.assert_allclose(out[3], ref[3], atol=2e-5,
                                       err_msg=tag)
            np.testing.assert_allclose(out[4], ref[4], rtol=1e-5,
                                       atol=1e-7, err_msg=tag)
            np.testing.assert_allclose(out[5], ref[5], rtol=1e-5,
                                       atol=1e-7, err_msg=tag)
            np.testing.assert_array_equal(np.asarray(out[6]),
                                          np.asarray(ref[6]), err_msg=tag)


def test_map_iters_tile_frac_reduces_loss():
    """Full map_iters with per-iteration tile subsampling
    (MapConfig.tile_frac=0.5) still descends to the fused path's quality:
    BA's many iterations average the subset noise (the reference's
    num_pixels subsampling makes the same trade, slam_frontend.py:250-257)."""
    scene, m = scene_and_map()
    views = target_views(scene)
    key = jax.random.PRNGKey(7)
    noisy = m._replace(
        params=m.params._replace(
            sh=m.params.sh + 0.3 * jax.random.normal(key, m.params.sh.shape),
            xyz=m.params.xyz
            + 0.01 * jax.random.normal(key, m.params.xyz.shape),
        )
    )
    cams = make_batch(views)
    cfg_p = CFG._replace(backend="pallas_lists", pallas_interpret=True)
    before = photometric_err(noisy, views)
    m2, _, it, vis, _ = map_iters(
        noisy, cams, 40, jnp.int32(0), jax.random.PRNGKey(0),
        INTR, cfg_p, MCFG._replace(tile_frac=0.5), HYPER,
    )
    after = photometric_err(m2, views)
    assert after < 0.6 * before, (before, after)
    assert int(it) == 40
    assert bool(vis[0].any())


def test_vis_from_lists_matches_global_render():
    """The lists-based final visibility pass (MapConfig.vis_from_lists) must
    agree with the from-scratch globally-binned render when the lists are
    fresh (n_iters=0): strict-first margin lists are blend-identical at the
    build pose, so the per-view visibility sets should match almost exactly
    (margin-only entries contribute ~nothing at the build pose)."""
    scene, m = scene_and_map()
    views = target_views(scene)
    cams = make_batch(views)

    vises = {}
    for flag in (False, True):
        _, _, _, vis, _ = map_iters(
            m, cams, 0, jnp.int32(0), jax.random.PRNGKey(0),
            INTR, CFG, MCFG._replace(vis_from_lists=flag), HYPER,
        )
        vises[flag] = np.asarray(vis)
    ref, fast = vises[False], vises[True]
    assert ref.any() and fast.any()
    inter = np.logical_and(ref, fast).sum()
    union = np.logical_or(ref, fast).sum()
    assert inter / union > 0.98, (inter, union)
