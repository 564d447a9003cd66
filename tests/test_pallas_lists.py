"""Parity tests for the fused per-list Pallas blend (pallas_lists.py):
forward, hand-derived VJP, and the 8-tangent JVP kernel, against the XLA
blend path (itself golden-tested in test_render.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.render import Intrinsics, RenderConfig, render
from tests.test_render import make_scene

INTR = Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)
XLA = RenderConfig(tile=16, macro_tiles=2, k_macro=256, k_fine=128,
                   with_n_touched=False)
PAL = XLA._replace(backend="pallas_lists", pallas_interpret=True)


def test_forward_parity():
    gauss = make_scene(96)
    T = jnp.eye(4)
    a = render(gauss, T, INTR, XLA)
    b = render(gauss, T, INTR, PAL)
    np.testing.assert_allclose(b.image, a.image, atol=2e-5)
    np.testing.assert_allclose(b.depth, a.depth, atol=2e-4)
    np.testing.assert_allclose(b.opacity, a.opacity, atol=2e-5)


def test_vjp_parity():
    gauss = make_scene(64, seed=5)
    T = jnp.eye(4)
    target = render(gauss, T, INTR, XLA).image + 0.03

    def loss(cfg):
        def f(leaves, tau):
            g = gauss._replace(xyz=leaves[0], sh=leaves[1],
                               log_scale=leaves[2], quat=leaves[3],
                               opa_logit=leaves[4])
            out = render(g, T, INTR, cfg, tau=tau)
            return jnp.mean(jnp.abs(out.image - target))
        return f

    leaves = (gauss.xyz, gauss.sh, gauss.log_scale, gauss.quat,
              gauss.opa_logit)
    tau0 = jnp.zeros(6)
    ga, gta = jax.grad(loss(XLA), argnums=(0, 1))(leaves, tau0)
    gb, gtb = jax.grad(loss(PAL), argnums=(0, 1))(leaves, tau0)
    np.testing.assert_allclose(gtb, gta, rtol=1e-3, atol=1e-6)
    for name, x, y in zip(
        ["xyz", "sh", "log_scale", "quat", "opa"], gb, ga
    ):
        np.testing.assert_allclose(x, y, rtol=1e-3, atol=1e-5, err_msg=name)


def test_jvp8_parity():
    """blend_lists_jvp8's tangents match jax.jvp through the XLA path."""
    gauss = make_scene(48, seed=7)
    T = jnp.eye(4)

    def render_img(cfg, tau):
        return render(gauss, T, INTR, cfg, tau=tau).image

    # reference tangents via jvp through the XLA blend
    tau0 = jnp.zeros(6)
    ref = []
    for k in range(6):
        e = jnp.zeros(6).at[k].set(1.0)
        _, dt = jax.jvp(lambda t: render_img(XLA, t), (tau0,), (e,))
        ref.append(dt)

    # pallas path: build lists + packed rows/tangents explicitly
    from monogs_tpu.render.pallas_lists import blend_lists_jvp8
    from monogs_tpu.render.renderer import (
        _LOGO, _pack, _pixel_basis, _make_lists, _tile_origins,
    )
    from monogs_tpu.render.primitives import preprocess
    from monogs_tpu.ops import se3

    def packed_at(tau):
        T_eff = se3.se3_exp(tau) @ T
        prep = preprocess(gauss.xyz, gauss.log_scale, gauss.quat,
                          gauss.opa_logit, gauss.sh, gauss.active, T_eff,
                          INTR, sh_degree=0, near=XLA.near)
        return _pack(prep), prep

    packed0, prep0 = packed_at(tau0)
    lists, _ = _make_lists(packed0[:, 0], packed0[:, 1], prep0.radius,
                           prep0.valid, prep0.z, INTR, XLA)
    tans = []
    for k in range(6):
        e = jnp.zeros(6).at[k].set(1.0)
        _, dp = jax.jvp(lambda t: packed_at(t)[0], (tau0,), (e,))
        tans.append(dp)
    tan = jnp.stack(tans, axis=0)                       # [6, N, F]

    vld = lists.vld & prep0.valid[lists.idx]
    d = packed0[lists.idx]
    logo = jnp.where(vld, d[..., _LOGO], -1e30)
    d = jnp.concatenate([d[..., :_LOGO], logo[..., None],
                         d[..., _LOGO + 1:]], axis=-1)
    d_tan = jnp.where(vld[:, None, :, None], tan[:, lists.idx].transpose(
        1, 0, 2, 3), 0.0)                               # [Tf, 6, Kf, F]
    tile = XLA.tile
    p = tile * tile
    px = (jnp.arange(p) % tile).astype(jnp.float32)
    py = (jnp.arange(p) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px, py)
    tx0, ty0 = _tile_origins(INTR, XLA)
    outs, touts = blend_lists_jvp8(d, d_tan, tx0, ty0, pmat, tile,
                                   INTR.width, INTR.height, True)

    # assemble tangent images and compare
    n_mx = -(-INTR.width // XLA.macro_px)
    n_my = -(-INTR.height // XLA.macro_px)
    mt = XLA.macro_tiles

    def assemble(x):
        x = x.reshape(n_my, n_mx, mt, mt, tile, tile, 3)
        x = x.transpose(0, 2, 4, 1, 3, 5, 6)
        return x.reshape(n_my * XLA.macro_px, n_mx * XLA.macro_px, 3)[
            :INTR.height, :INTR.width].transpose(2, 0, 1)

    for k in range(6):
        img_t = assemble(touts[:, k, :, :3])
        np.testing.assert_allclose(
            img_t, ref[k], rtol=1e-3, atol=1e-4,
            err_msg=f"tangent dim {k}",
        )


def test_so_fast_step_matches_linearize():
    """The fused forward-mode (Sf, SJ) matches jax.linearize of the same
    tile-space bucketed residual computed through the XLA blend path."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops.sketch import apply_sketch, make_sketch
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import _tile_origins, render_tiles, tile_images
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, _so_fast_step
    from monogs_tpu.ops import losses, se3

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=256,
                       with_n_touched=False)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=800, seed=0,
                          sensor_type="monocular", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T_gt = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    T = se3.se3_exp(0.004 * jax.random.normal(jax.random.PRNGKey(3), (6,))
                    ) @ T_gt
    tcfg = TrackConfig(monocular=True)
    lists = build_tile_lists(ds.scene, T, intr, cfg)
    tx0, ty0 = _tile_origins(intr, cfg)
    gt_t = tile_images(frame.gt_image, intr, cfg)
    mask_t = tile_images(frame.mapping_mask, intr, cfg)
    m_sub = gt_t.shape[0] * gt_t.shape[1]
    sketch = make_sketch(jax.random.PRNGKey(7), m_sub, 8, 32)
    ea, eb = jnp.float32(1.05), jnp.float32(0.02)

    def bucketed(p8):
        col, dep, acc = render_tiles(ds.scene, T, intr, cfg, lists, tx0, ty0,
                                     tau=p8[:6])
        e = jnp.abs(p8[6]) + losses.EXPOSURE_EPS
        r = acc[..., None] * mask_t * ((e * col + p8[7]) - gt_t)
        l1 = jnp.sum(jnp.abs(r))
        r = losses.huber_signed(r, tcfg.huber_delta)
        d_over_m = sketch.d / m_sub
        Sf = apply_sketch(
            (jnp.sum(r, axis=-1) * d_over_m).reshape(-1), sketch
        )
        return Sf, l1

    p = jnp.concatenate([jnp.zeros(6), ea[None], eb[None]])
    (Sf_ref, l1_ref), jvp = jax.linearize(bucketed, p)
    SJ_ref = jnp.stack([jvp(jnp.eye(8)[k])[0] for k in range(8)], axis=1)

    cfg_pl = cfg._replace(backend="pallas_lists", pallas_interpret=True)
    Sf, SJ, l1 = _so_fast_step(ds.scene, gt_t, mask_t, T, ea, eb, sketch,
                               intr, cfg_pl, tcfg, lists, tx0, ty0)
    np.testing.assert_allclose(l1, l1_ref, rtol=1e-4)
    np.testing.assert_allclose(Sf, Sf_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(SJ, SJ_ref, rtol=2e-3, atol=2e-4)


def test_fo_fused_grad_parity():
    """render_fo_grad_tiles (fused Pallas fo loss+gradient kernel) matches
    value_and_grad of the tile first-order objective (_fo_loss_tiles)
    computed through the XLA blend — loss, unbiased L1, and all 8 gradient
    components, over a strict tile subset with margin lists."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops import se3
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import (
        TileLists, _tile_origins, render_fo_grad_tiles, tile_images,
    )
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, _fo_loss_tiles

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=128,
                       with_n_touched=False)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=900, seed=2,
                          sensor_type="monocular", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T_gt = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    T = se3.se3_exp(0.004 * jax.random.normal(jax.random.PRNGKey(4), (6,))
                    ) @ T_gt
    tcfg = TrackConfig(monocular=True)
    lists = build_tile_lists(ds.scene, T, intr, cfg, margin=8.0)
    tx0, ty0 = _tile_origins(intr, cfg)
    n_fine = tx0.shape[0]
    tsel = jax.random.permutation(jax.random.PRNGKey(9), n_fine)[:16]
    lists_sub = TileLists(idx=lists.idx[tsel], vld=lists.vld[tsel])
    txs, tys = tx0[tsel], ty0[tsel]
    gt_t = tile_images(frame.gt_image, intr, cfg)[tsel]
    mask_t = tile_images(frame.mapping_mask, intr, cfg)[tsel]
    scale = n_fine / 16.0
    p = jnp.concatenate(
        [0.001 * jnp.arange(6), jnp.float32(1.07)[None],
         jnp.float32(0.015)[None]]
    )

    (loss_ref, l1_ref), g_ref = jax.value_and_grad(
        lambda q: _fo_loss_tiles(ds.scene, T, q, intr, cfg, tcfg, lists_sub,
                                 txs, tys, gt_t, mask_t, None, scale),
        has_aux=True,
    )(p)

    cfg_pl = cfg._replace(backend="pallas_lists", pallas_interpret=True)
    loss, l1, g = render_fo_grad_tiles(
        ds.scene, T, intr, cfg_pl, lists_sub, txs, tys,
        p[:6], p[6], p[7], gt_t, mask_t, tcfg.use_huber, tcfg.huber_delta,
    )
    np.testing.assert_allclose(loss, loss_ref, rtol=1e-4)
    np.testing.assert_allclose(l1 * scale, l1_ref, rtol=1e-4)
    np.testing.assert_allclose(g, g_ref, rtol=2e-3, atol=2e-6)


def test_fo_fused_grad_parity_rgbd():
    """RGB-D render_fo_grad_tiles (two reverse chains — Huber RGB + masked
    depth — combined by their global normalizers before one pullback)
    matches value_and_grad of the alpha-mixed tile first-order objective
    (_fo_loss_tiles rgbd branch) through the XLA blend: loss, L1, and all 8
    gradient components."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops import se3
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import (
        TileLists, _tile_origins, render_fo_grad_tiles, tile_images,
    )
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, _fo_loss_tiles

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=128,
                       with_n_touched=False)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=900, seed=2,
                          sensor_type="depth", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, dep, T_gt = ds[0]
    frame = make_frame_data(img, dep, 1.1, 0.01, "synthetic")
    T = se3.se3_exp(0.004 * jax.random.normal(jax.random.PRNGKey(4), (6,))
                    ) @ T_gt
    tcfg = TrackConfig(monocular=False)
    lists = build_tile_lists(ds.scene, T, intr, cfg, margin=8.0)
    tx0, ty0 = _tile_origins(intr, cfg)
    n_fine = tx0.shape[0]
    tsel = jax.random.permutation(jax.random.PRNGKey(9), n_fine)[:16]
    lists_sub = TileLists(idx=lists.idx[tsel], vld=lists.vld[tsel])
    txs, tys = tx0[tsel], ty0[tsel]
    gt_t = tile_images(frame.gt_image, intr, cfg)[tsel]
    mask_t = tile_images(frame.mapping_mask, intr, cfg)[tsel]
    gtd_t = tile_images(frame.gt_depth, intr, cfg)[tsel]
    scale = n_fine / 16.0
    p = jnp.concatenate(
        [0.001 * jnp.arange(6), jnp.float32(1.07)[None],
         jnp.float32(0.015)[None]]
    )

    (loss_ref, l1_ref), g_ref = jax.value_and_grad(
        lambda q: _fo_loss_tiles(ds.scene, T, q, intr, cfg, tcfg, lists_sub,
                                 txs, tys, gt_t, mask_t, gtd_t, scale),
        has_aux=True,
    )(p)

    cfg_pl = cfg._replace(backend="pallas_lists", pallas_interpret=True)
    loss, l1, g = render_fo_grad_tiles(
        ds.scene, T, intr, cfg_pl, lists_sub, txs, tys,
        p[:6], p[6], p[7], gt_t, mask_t, tcfg.use_huber, tcfg.huber_delta,
        gtd_t=gtd_t, alpha=tcfg.alpha,
    )
    np.testing.assert_allclose(loss, loss_ref, rtol=1e-4)
    np.testing.assert_allclose(l1 * scale, l1_ref, rtol=1e-4)
    np.testing.assert_allclose(g, g_ref, rtol=2e-3, atol=2e-6)


def test_tracking_fast_path_converges():
    """Full track_frame with backend=pallas_lists (interpret) recovers a
    perturbed pose like the XLA path does."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops import se3
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, track_frame

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=256,
                       backend="pallas_lists", pallas_interpret=True)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=1500, seed=0,
                          sensor_type="monocular", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T_gt = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    T0 = se3.se3_exp(0.008 * jax.random.normal(jax.random.PRNGKey(1), (6,))
                     ) @ T_gt
    tcfg = TrackConfig(monocular=True, fo_max_iter=30, so_max_iter=8,
                       lr_trans=0.002, lr_rot=0.006,
                       stack_dim=8, sketch_dim=64, bin_margin=8.0)
    res = track_frame(ds.scene, frame, T0, jnp.float32(1.0),
                      jnp.float32(0.0), jax.random.PRNGKey(0), intr, cfg,
                      tcfg)
    trans, _ = se3.pose_diff(res.T, T_gt)
    trans0, _ = se3.pose_diff(T0, T_gt)
    assert float(trans) < 0.3 * float(trans0), (float(trans), float(trans0))


def test_tracking_fused_fo_converges():
    """track_frame with fo tile subsampling on the pallas_lists backend —
    the configuration that routes the first-order phase through the fused
    loss+gradient kernel (TrackConfig.fo_fused) — recovers a perturbed pose.
    Numerics of the kernel itself are pinned by test_fo_fused_grad_parity."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops import se3
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, track_frame

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=128,
                       backend="pallas_lists", pallas_interpret=True)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=1200, seed=6,
                          sensor_type="monocular", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T_gt = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    T0 = se3.se3_exp(0.008 * jax.random.normal(jax.random.PRNGKey(2), (6,))
                     ) @ T_gt
    tcfg = TrackConfig(monocular=True, fo_max_iter=30, so_max_iter=6,
                       lr_trans=0.002, lr_rot=0.006,
                       stack_dim=8, sketch_dim=64, bin_margin=8.0,
                       fo_tile_frac=0.5, so_tile_frac=0.5,
                       rebin_so_iters=2)
    res = track_frame(ds.scene, frame, T0, jnp.float32(1.0),
                      jnp.float32(0.0), jax.random.PRNGKey(0), intr, cfg,
                      tcfg)
    trans, _ = se3.pose_diff(res.T, T_gt)
    trans0, _ = se3.pose_diff(T0, T_gt)
    assert float(trans) < 0.3 * float(trans0), (float(trans), float(trans0))


def test_tracking_fast_fixed_path_converges():
    """track_frame with the fixed-cost cuts (so_from_fo_aux: reuse the fo
    margin build's macro aux for the so phase; final_reuse: final n_touched
    render straight from the frozen margin lists) still recovers a perturbed
    pose and still emits a usable n_touched."""
    import numpy as np

    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops import se3
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, track_frame

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=128,
                       backend="pallas_lists", pallas_interpret=True)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=1200, seed=6,
                          sensor_type="monocular", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T_gt = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    T0 = se3.se3_exp(0.008 * jax.random.normal(jax.random.PRNGKey(2), (6,))
                     ) @ T_gt
    tcfg = TrackConfig(monocular=True, fo_max_iter=30, so_max_iter=6,
                       lr_trans=0.002, lr_rot=0.006,
                       stack_dim=8, sketch_dim=64, bin_margin=8.0,
                       fo_tile_frac=0.5, so_tile_frac=0.5,
                       rebin_so_iters=2,
                       so_from_fo_aux=True, final_reuse=True)
    res = track_frame(ds.scene, frame, T0, jnp.float32(1.0),
                      jnp.float32(0.0), jax.random.PRNGKey(0), intr, cfg,
                      tcfg)
    trans, _ = se3.pose_diff(res.T, T_gt)
    trans0, _ = se3.pose_diff(T0, T_gt)
    assert float(trans) < 0.3 * float(trans0), (float(trans), float(trans0))
    assert int(np.sum(np.asarray(res.n_touched) > 0)) > 100


def test_render_tiles_parity():
    """render_tiles on ALL tiles matches the assembled full render."""
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import (
        _tile_origins, render_tiles, tile_images,
    )

    gauss = make_scene(80, seed=3)
    T = jnp.eye(4)
    lists = build_tile_lists(gauss, T, INTR, XLA)
    tx0, ty0 = _tile_origins(INTR, XLA)
    col, dep, acc = render_tiles(gauss, T, INTR, XLA, lists, tx0, ty0)

    full = render(gauss, T, INTR, XLA)
    gt_col = tile_images(full.image, INTR, XLA)          # [Tf, P, 3]
    gt_dep = tile_images(full.depth, INTR, XLA)[..., 0]
    gt_acc = tile_images(full.opacity, INTR, XLA)[..., 0]
    # edge tiles: render_tiles computes out-of-image pixels too (they are
    # cropped by assembly); compare only in-image pixels
    tile = XLA.tile
    p = tile * tile
    px = tx0[:, None] + (jnp.arange(p) % tile)[None, :]
    py = ty0[:, None] + (jnp.arange(p) // tile)[None, :]
    inside = (px <= INTR.width - 1) & (py <= INTR.height - 1)
    m3 = inside[..., None]
    np.testing.assert_allclose(
        jnp.where(m3, col, 0.0), jnp.where(m3, gt_col, 0.0), atol=1e-5
    )
    np.testing.assert_allclose(
        jnp.where(inside, dep, 0.0), jnp.where(inside, gt_dep, 0.0), atol=1e-4
    )
    np.testing.assert_allclose(
        jnp.where(inside, acc, 0.0), jnp.where(inside, gt_acc, 0.0), atol=1e-5
    )


def test_tracking_fo_tile_subsample_converges():
    """fo-only tracking over a half-tile subset still recovers the pose."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops import se3
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, track_frame

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=256)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=1500, seed=0,
                          sensor_type="monocular", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T_gt = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    T0 = se3.se3_exp(0.006 * jax.random.normal(jax.random.PRNGKey(1), (6,))
                     ) @ T_gt
    tcfg = TrackConfig(monocular=True, fo_max_iter=40, so_max_iter=0,
                       lr_trans=0.002, lr_rot=0.006, bin_margin=8.0,
                       fo_tile_frac=0.5)
    res = track_frame(ds.scene, frame, T0, jnp.float32(1.0),
                      jnp.float32(0.0), jax.random.PRNGKey(0), intr, cfg,
                      tcfg)
    trans, _ = se3.pose_diff(res.T, T_gt)
    trans0, _ = se3.pose_diff(T0, T_gt)
    assert float(trans) < 0.4 * float(trans0), (float(trans), float(trans0))


def test_tracking_so_tile_subsample_converges():
    """so-phase tile-subsampled sketch still refines the pose."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops import se3
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, track_frame

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=256,
                       backend="pallas_lists", pallas_interpret=True)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=1500, seed=0,
                          sensor_type="monocular", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, _, T_gt = ds[0]
    frame = make_frame_data(img, None, 1.1, 0.01, "synthetic")
    T0 = se3.se3_exp(0.006 * jax.random.normal(jax.random.PRNGKey(2), (6,))
                     ) @ T_gt
    tcfg = TrackConfig(monocular=True, fo_max_iter=20, so_max_iter=8,
                       lr_trans=0.002, lr_rot=0.006, bin_margin=8.0,
                       stack_dim=8, sketch_dim=64, so_tile_frac=0.5)
    res = track_frame(ds.scene, frame, T0, jnp.float32(1.0),
                      jnp.float32(0.0), jax.random.PRNGKey(0), intr, cfg,
                      tcfg)
    trans, _ = se3.pose_diff(res.T, T_gt)
    trans0, _ = se3.pose_diff(T0, T_gt)
    assert float(trans) < 0.3 * float(trans0), (float(trans), float(trans0))

def test_so_fast_step_rgbd_matches_linearize():
    """RGB-D fused (Sf, SJ) matches jax.linearize of the tile-space
    alpha-mixed bucketed residual."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops.sketch import apply_sketch, make_sketch
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.renderer import _tile_origins, render_tiles, tile_images
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, _so_fast_step
    from monogs_tpu.ops import losses, se3

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=256,
                       with_n_touched=False)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=800, seed=0,
                          sensor_type="depth", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, dep, T_gt = ds[0]
    frame = make_frame_data(img, dep, 1.1, 0.01, "synthetic")
    T = se3.se3_exp(0.004 * jax.random.normal(jax.random.PRNGKey(3), (6,))
                    ) @ T_gt
    tcfg = TrackConfig(monocular=False)
    lists = build_tile_lists(ds.scene, T, intr, cfg)
    tx0, ty0 = _tile_origins(intr, cfg)
    gt_t = tile_images(frame.gt_image, intr, cfg)
    mask_t = tile_images(frame.mapping_mask, intr, cfg)
    gtd_t = tile_images(frame.gt_depth, intr, cfg)
    m_sub = gt_t.shape[0] * gt_t.shape[1]
    sketch = make_sketch(jax.random.PRNGKey(7), m_sub, 8, 32)
    ea, eb = jnp.float32(1.05), jnp.float32(0.02)

    def bucketed(p8):
        col, depr, acc = render_tiles(ds.scene, T, intr, cfg, lists,
                                      tx0, ty0, tau=p8[:6])
        e = jnp.abs(p8[6]) + losses.EXPOSURE_EPS
        r = acc[..., None] * mask_t * ((e * col + p8[7]) - gt_t)
        l1 = jnp.sum(jnp.abs(r))
        hub = losses.huber_signed(r, tcfg.huber_delta)
        dm = (gtd_t > 0.01) & (acc[..., None] > 0.95)
        r_d = jnp.where(dm, depr[..., None] - gtd_t, 0.0)
        hub_d = losses.huber_signed(r_d, tcfg.huber_delta)
        r2 = (tcfg.alpha * jnp.sum(hub, axis=-1)
              + (1 - tcfg.alpha) * hub_d[..., 0])
        Sf = apply_sketch((r2 * sketch.d / m_sub).reshape(-1), sketch)
        return Sf, l1

    p = jnp.concatenate([jnp.zeros(6), ea[None], eb[None]])
    (Sf_ref, l1_ref), jvp = jax.linearize(bucketed, p)
    SJ_ref = jnp.stack([jvp(jnp.eye(8)[k])[0] for k in range(8)], axis=1)

    cfg_pl = cfg._replace(backend="pallas_lists", pallas_interpret=True)
    Sf, SJ, l1 = _so_fast_step(ds.scene, gt_t, mask_t, T, ea, eb, sketch,
                               intr, cfg_pl, tcfg, lists, tx0, ty0,
                               gtd_t=gtd_t)
    np.testing.assert_allclose(l1, l1_ref, rtol=1e-4)
    np.testing.assert_allclose(Sf, Sf_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(SJ, SJ_ref, rtol=2e-3, atol=2e-4)


def test_tracking_fast_path_rgbd_converges():
    """Full RGB-D track_frame on the production fast path — pallas_lists
    backend (interpret), frozen lists with margin, tile subsampling in both
    phases, alpha-mixed photometric+depth residuals through fo AND so —
    recovers a perturbed pose (end-to-end complement of the
    _so_fast_step linearize parity test above)."""
    from monogs_tpu.data import SyntheticDataset
    from monogs_tpu.ops import se3
    from monogs_tpu.slam.frame import make_frame_data
    from monogs_tpu.slam.tracking import TrackConfig, track_frame

    intr = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=256,
                       backend="pallas_lists", pallas_interpret=True)
    ds = SyntheticDataset(intr, n_frames=2, n_gauss=1500, seed=0,
                          sensor_type="depth", render_cfg=cfg,
                          trans_amp=0.0, rot_amp=0.0)
    img, dep, T_gt = ds[0]
    frame = make_frame_data(img, dep, 1.1, 0.01, "synthetic")
    T0 = se3.se3_exp(0.008 * jax.random.normal(jax.random.PRNGKey(1), (6,))
                     ) @ T_gt
    tcfg = TrackConfig(monocular=False, fo_max_iter=30, so_max_iter=8,
                       lr_trans=0.002, lr_rot=0.006,
                       stack_dim=8, sketch_dim=64, bin_margin=8.0,
                       fo_tile_frac=0.5, so_tile_frac=0.5,
                       rebin_so_iters=3)
    res = track_frame(ds.scene, frame, T0, jnp.float32(1.0),
                      jnp.float32(0.0), jax.random.PRNGKey(0), intr, cfg,
                      tcfg)
    trans, _ = se3.pose_diff(res.T, T_gt)
    trans0, _ = se3.pose_diff(T0, T_gt)
    assert float(trans) < 0.3 * float(trans0), (float(trans), float(trans0))


def test_refine_full_render_parity():
    """Final-render fast path (TrackConfig.final_refine): rendering with
    lists refined from a margin macro build at a ~2px-moved pose matches a
    from-scratch render at that pose — image, opacity, and n_touched."""
    from monogs_tpu.ops import se3
    from monogs_tpu.render import build_tile_lists, render
    from monogs_tpu.render.renderer import refine_fine_lists, _tile_origins

    gauss = make_scene(128, seed=11)
    T0 = jnp.eye(4)
    cfg = PAL._replace(with_n_touched=True)
    _, aux = build_tile_lists(gauss, T0, INTR, cfg, margin=8.0,
                              with_aux=True)
    # ~2px of image motion at the scene depth
    T1 = se3.se3_exp(jnp.array([0.01, -0.008, 0.0, 0.002, 0.0, 0.001])) @ T0
    n_fine = _tile_origins(INTR, cfg)[0].shape[0]
    lists_ref = refine_fine_lists(
        gauss, T1, INTR, cfg, aux, jnp.arange(n_fine, dtype=jnp.int32)
    )
    a = render(gauss, T1, INTR, cfg)
    b = render(gauss, T1, INTR, cfg, lists=lists_ref)
    np.testing.assert_allclose(b.image, a.image, atol=1e-4)
    np.testing.assert_allclose(b.opacity, a.opacity, atol=1e-4)
    assert (
        np.abs(np.asarray(b.n_touched) - np.asarray(a.n_touched)).max() <= 2
    )


def test_kchunk_multi_chunk_parity():
    """K-chunked kernels at a capacity far above the chunk size: k_fine=320
    runs every kernel as 4 chunks of 80 (see pallas_lists._chunk_kc), with
    transmittance / suffix / tangent-prefix carries across chunks. Forward,
    counts, VJP, and the 6-tangent JVP must all match the (unchunked) XLA
    blend — this is what removed the k_fine VMEM clamp
    (runtime._TRACK_K_FINE_VMEM_CAP, round-2 VERDICT item 5)."""
    from monogs_tpu.render import build_tile_lists
    from monogs_tpu.render.pallas_lists import _chunk_kc
    from monogs_tpu.render.renderer import (
        _tile_origins, render_pose_jvp_tiles, render_tiles,
    )

    assert _chunk_kc(320) == 80 and _chunk_kc(512) == 128

    gauss = make_scene(128, seed=7)
    T = jnp.eye(4)
    xla = XLA._replace(k_fine=320, with_n_touched=True)
    pal = xla._replace(backend="pallas_lists", pallas_interpret=True)

    # forward + counts
    a = render(gauss, T, INTR, xla)
    b = render(gauss, T, INTR, pal)
    np.testing.assert_allclose(b.image, a.image, atol=2e-5)
    np.testing.assert_allclose(b.depth, a.depth, atol=2e-4)
    np.testing.assert_allclose(b.opacity, a.opacity, atol=2e-5)
    np.testing.assert_array_equal(b.n_touched, a.n_touched)

    # VJP through the blend (map-parameter cotangents cross chunks via the
    # suffix carry)
    target = a.image + 0.05

    def loss(cfg):
        def f(xyz, tau):
            out = render(gauss._replace(xyz=xyz), T, INTR,
                         cfg._replace(with_n_touched=False), tau=tau)
            return jnp.mean(jnp.abs(out.image - target))
        return f

    gx_a, gt_a = jax.grad(loss(xla), argnums=(0, 1))(
        gauss.xyz, jnp.zeros(6))
    gx_b, gt_b = jax.grad(loss(pal), argnums=(0, 1))(
        gauss.xyz, jnp.zeros(6))
    np.testing.assert_allclose(gx_b, gx_a, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(gt_b, gt_a, rtol=2e-3, atol=2e-5)

    # 6-tangent JVP (tangent-prefix carries) vs jax.jvp of the XLA tile
    # render, one pose direction
    cfg_t = pal._replace(with_n_touched=False)
    lists = build_tile_lists(gauss, T, INTR, cfg_t)
    tx0, ty0 = _tile_origins(INTR, cfg_t)
    outs, touts = render_pose_jvp_tiles(gauss, T, INTR, cfg_t, lists,
                                        tx0, ty0)
    cfg_x = xla._replace(with_n_touched=False)
    for k in (0, 4):
        e = jnp.eye(6)[k]
        (col, dep, acc), (col_t, dep_t, acc_t) = jax.jvp(
            lambda tau: render_tiles(gauss, T, INTR, cfg_x, lists, tx0,
                                     ty0, tau=tau),
            (jnp.zeros(6),), (e,),
        )
        np.testing.assert_allclose(outs[..., :3], col, atol=2e-5)
        np.testing.assert_allclose(touts[:, k, :, :3], col_t,
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(touts[:, k, :, 4], acc_t,
                                   rtol=2e-3, atol=2e-4)


def test_final_reuse_n_touched_parity():
    """final_reuse semantics (TrackConfig.final_reuse): rendering with the
    FROZEN full-image margin lists at the build pose matches the
    from-scratch binned render — strict-first priority selection makes
    margin lists blend-identical under truncation there, so image and
    n_touched must agree. Bounds the divergence final_reuse's n_touched
    consumers (keyframing overlap, visibility pruning) inherit at zero
    intra-frame motion; motion-induced divergence is bounded separately by
    the bin_margin precondition (see TrackConfig)."""
    from monogs_tpu.render import build_tile_lists, render

    gauss = make_scene(128, seed=13)
    T0 = jnp.eye(4)
    cfg = PAL._replace(with_n_touched=True)
    lists = build_tile_lists(gauss, T0, INTR, cfg, margin=8.0)
    a = render(gauss, T0, INTR, cfg)                 # exact rebuild
    b = render(gauss, T0, INTR, cfg, lists=lists)    # frozen margin lists
    np.testing.assert_allclose(b.image, a.image, atol=1e-5)
    np.testing.assert_allclose(b.opacity, a.opacity, atol=1e-5)
    nt_a = np.asarray(a.n_touched)
    nt_b = np.asarray(b.n_touched)
    assert np.abs(nt_b - nt_a).max() <= 2, np.abs(nt_b - nt_a).max()
    assert (nt_b > 0).sum() > 0


def test_n_touched_parity():
    """pallas_lists with_n_touched (counts kernel) matches the XLA path and
    the golden model exactly."""
    from monogs_tpu.render import render_golden

    gauss = make_scene(96, seed=11)
    T = jnp.eye(4)
    a = render(gauss, T, INTR, XLA._replace(with_n_touched=True))
    b = render(gauss, T, INTR, PAL._replace(with_n_touched=True))
    g = render_golden(gauss, T, INTR)
    np.testing.assert_array_equal(np.asarray(b.n_touched), np.asarray(a.n_touched))
    np.testing.assert_array_equal(np.asarray(b.n_touched), np.asarray(g.n_touched))
    np.testing.assert_allclose(b.image, a.image, atol=2e-5)
