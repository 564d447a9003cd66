"""PRODUCTION mapping loop with the MAP sharded over a mesh "gauss" axis.

parallel/gauss.py provides the SPMD primitives (local-shard binning, the
one-all_gather survivor merge, per-shard loss/grad); this module lifts them
to the full `slam.mapping.map_iters` contract — dynamic trip count, frozen
per-view lists, Adam carry, densify/prune/opacity resets, window pose +
exposure optimization, final visibility — so `BackEnd` can route bundle
adjustment through a gaussian-sharded map exactly like it routes the
view-sharded path (`Parallel.gauss_devices` in the config; the reference
has no analogue — its rasterizer assumes the whole model on one GPU,
SURVEY.md section 2.2).

Sharding design (all traffic ICI-bound):
  - Map leaves live [N/D] per device (shard_map in_specs P("gauss")).
  - Frozen per-view structure = LOCAL TileLists (idx into the local shard)
    + a frozen merge selection `src_k` [Tf, Kf] into the device-major
    [D*Kf] all_gathered row axis. Freezing the merge matches the
    single-device frozen-list semantics exactly: the blend order is the
    depth order AT BUILD TIME in both designs.
  - Per iteration per view: local preprocess -> local row gather ->
    all_gather("gauss") -> take_along(src_k) -> the SAME fused Pallas
    loss+grad kernel as single-device mapping (render/renderer.py
    map_grad_from_rows). Row cotangents route back through the
    take_along/all_gather transpose (scatter + psum_scatter) to the one
    device that owns each gaussian — no [N] cotangent ever materializes.
  - Because the merged rows (and the loss) are replicated over the gauss
    axis, every per-shard cotangent comes back scaled by D (the
    all_gather transpose SUMS D identical row cotangents); gradients are
    rescaled by 1/D. Pose-tangent gradients are partial per shard (each
    shard only backprops its own rows) and psum over "gauss".
  - Densify/prune/opacity-reset/Adam are elementwise over [N/D]: fully
    local. clone_cap/split_cap apply PER SHARD (global capacity scales
    with D — that is the point of the axis).
  - Composes with view parallelism over a 2-D Mesh(("view", "gauss")):
    cams shard over "view", map over "gauss"; map gradients and densify
    stats psum over "view" exactly as in parallel/mesh.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import gaussian_map as gm
from ..ops import se3
from ..render import RenderConfig, build_tile_lists
from ..render.camera import Intrinsics
from ..render.renderer import (
    _F,
    _LOGO,
    _pack,
    _pixel_basis,
    _tile_origins,
    map_grad_from_rows,
    preprocess,
)
from ..slam.mapping import CamBatch, MapConfig, _gauss_view, new_kf_adam
from .gauss import _merge_rows
from .mesh import pad_cams


def make_gauss_mesh2(n_view: int, n_gauss: int) -> Mesh:
    """2-D ("view", "gauss") mesh over the first n_view*n_gauss devices."""
    import numpy as np

    devs = np.asarray(jax.devices()[: n_view * n_gauss]).reshape(
        n_view, n_gauss
    )
    return Mesh(devs, ("view", "gauss"))


def _local_merged_rows(params, active, T_eff, li, lv, sk, intr, cfg,
                       gauss_axis, off=None):
    """Differentiable: local shard -> merged global blend rows via the
    FROZEN selection (li/lv local lists, sk merge indices)."""
    prep = preprocess(
        params.xyz, params.log_scale, params.quat, params.opa_logit,
        params.sh, active, T_eff, intr, sh_degree=cfg.sh_degree,
        near=cfg.near, means2d_offset=off,
    )
    packed = _pack(prep)
    d0 = packed[li]
    vld_f = lv & prep.valid[li]
    logo = jnp.where(vld_f, d0[..., _LOGO], -1e30)
    d_l = jnp.concatenate(
        [d0[..., :_LOGO], logo[..., None], d0[..., _LOGO + 1:]], axis=-1
    )
    d_all = jax.lax.all_gather(d_l, gauss_axis, axis=0)    # [D, Tf, Kf, F]
    dn, tf, kf, f = d_all.shape
    d_all = jnp.moveaxis(d_all, 0, 1).reshape(tf, dn * kf, f)
    d = jnp.take_along_axis(d_all, sk[..., None], axis=1)  # [Tf, Kf, F]
    return d, prep.radius


def gp_map_iters_impl(
    m: gm.GaussianMap,
    cams: CamBatch,
    n_iters,
    it_count,
    key,
    intr: Intrinsics,
    cfg: RenderConfig,
    mcfg: MapConfig,
    hyper: gm.MapHyper,
    kf_adam=None,
    initialization: bool = False,
    gauss_axis: str = "gauss",
    view_axis: str | None = None,
):
    """SPMD body: `slam.mapping.map_iters_impl` semantics with `m` the
    LOCAL shard ([N/D] leaves) and `cams` the (view-)local batch. Call
    under shard_map (gp_sharded_map_iters); returns the same tuple with
    per-shard map/visibility leaves."""
    b = cams.T.shape[0]
    nl = m.capacity
    cfg_iter = cfg._replace(with_n_touched=False)
    from ..render.renderer import tile_images

    lr8 = jnp.array(
        [mcfg.lr_trans] * 3 + [mcfg.lr_rot] * 3
        + [mcfg.lr_exposure_a, mcfg.lr_exposure_b],
        jnp.float32,
    )
    margin = mcfg.bin_margin if mcfg.bin_margin > 0 else 4.0
    inv_d = 1.0 / jax.lax.psum(1.0, gauss_axis)
    tx0, ty0 = _tile_origins(intr, cfg_iter)
    tile = cfg_iter.tile
    p = tile * tile
    px = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px, py)

    gt_tb = jax.vmap(lambda im: tile_images(im, intr, cfg_iter))(
        cams.gt_image
    )
    mask_tb = jax.vmap(lambda im: tile_images(im, intr, cfg_iter))(
        cams.mapping_mask
    )
    gtd_tb = (
        jax.vmap(lambda im: tile_images(im, intr, cfg_iter))(cams.gt_depth)
        if not mcfg.monocular else None
    )
    # per-iteration tile subsets (MapConfig.tile_frac): same semantics and
    # key schedule as the single-device loop (slam/mapping.py), so a
    # 1-D gauss mesh reproduces its draws exactly. The subset also shrinks
    # the per-view all_gather ([S, D*Kf] instead of [Tf, D*Kf]) — comms
    # scale with the fraction too.
    use_sub = mcfg.tile_frac < 1.0
    if use_sub:
        n_fine = gt_tb.shape[1]
        n_sub = max(8, int(n_fine * mcfg.tile_frac) // 8 * 8)
        sub_frac = n_sub / n_fine

    def build_frozen(mc, cams_c):
        """Per view: local lists + frozen merge selection src_k."""
        gauss = _gauss_view(mc.params, mc.active)

        def one(T_v):
            ll = build_tile_lists(gauss, T_v, intr, cfg_iter, margin=margin)
            prep = preprocess(
                gauss.xyz, gauss.log_scale, gauss.quat, gauss.opa_logit,
                gauss.sh, gauss.active, T_v, intr,
                sh_degree=cfg_iter.sh_degree, near=cfg_iter.near,
            )
            packed = _pack(prep)
            d0 = packed[ll.idx]
            vld_f = ll.vld & prep.valid[ll.idx]
            logo = jnp.where(vld_f, d0[..., _LOGO], -1e30)
            d_l = jnp.concatenate(
                [d0[..., :_LOGO], logo[..., None], d0[..., _LOGO + 1:]],
                axis=-1,
            )
            d_all = jax.lax.all_gather(d_l, gauss_axis, axis=0)
            v_all = jax.lax.all_gather(vld_f, gauss_axis, axis=0)
            dn, tf, kf, f = d_all.shape
            d_all = jnp.moveaxis(d_all, 0, 1).reshape(tf, dn * kf, f)
            v_all = jnp.moveaxis(v_all, 0, 1).reshape(tf, dn * kf)
            _, _, src = _merge_rows(
                d_all, v_all, tx0, ty0, tile, cfg_iter.k_fine, margin
            )
            return ll.idx, ll.vld, src

        return jax.lax.map(one, cams_c.T)

    def body(_, carry):
        (mc, cams_c, kam, kav, kat, itc, key,
         l_idx, l_vld, l_src, since) = carry
        itc = itc + 1
        key, k_dens = jax.random.split(key)

        if use_sub:
            key, k_sub = jax.random.split(key)
            tsel_b = jax.vmap(
                lambda k: jax.random.permutation(k, n_fine)[:n_sub]
            )(jax.random.split(k_sub, b))
        else:
            tsel_b = jnp.zeros((b, 1), jnp.int32)

        def one_view(args):
            (T_v, ea_v, eb_v, valid_v, gt_t, mask_t, gtd_t, li, lv, sk,
             ts) = args
            if use_sub:
                li, lv, sk = li[ts], lv[ts], sk[ts]
                gt_t, mask_t = gt_t[ts], mask_t[ts]
                if not mcfg.monocular:
                    gtd_t = gtd_t[ts]
                txy = (tx0[ts], ty0[ts])
            else:
                txy = None
            tau0 = jnp.zeros((6,))
            off0 = jnp.zeros((nl, 2))

            def rows_fn(xyz, sh, ls, quat, ol, tau_, off_):
                params = mc.params._replace(
                    xyz=xyz, sh=sh, log_scale=ls, quat=quat, opa_logit=ol
                )
                T_eff = se3.retract(T_v, tau_)
                return _local_merged_rows(
                    params, mc.active, T_eff, li, lv, sk, intr, cfg_iter,
                    gauss_axis, off=off_,
                )

            (d, radii), pull = jax.vjp(
                rows_fn, mc.params.xyz, mc.params.sh, mc.params.log_scale,
                mc.params.quat, mc.params.opa_logit, tau0, off0,
            )
            loss_v, dd, g_ea_v, g_eb_v = map_grad_from_rows(
                d, intr, cfg_iter, gt_t, mask_t, ea_v, eb_v,
                initialization, mcfg.alpha,
                gtd_t=gtd_t if not mcfg.monocular else None,
                txy=txy, px_frac=sub_frac if use_sub else 1.0,
            )
            grads = pull((dd, jnp.zeros_like(radii)))
            # the replicated dd is psum_scatter'd over the gauss axis ->
            # every cotangent arrives scaled by D (module docstring)
            g_leaves = jax.tree.map(lambda x: x * inv_d, grads[:5])
            g_tau_v = grads[5] * inv_d
            g_off_v = grads[6] * inv_d
            s = valid_v.astype(jnp.float32)
            g_leaves = jax.tree.map(lambda x: x * s, g_leaves)
            return (loss_v * s, g_leaves, g_tau_v * s, g_off_v * s,
                    g_ea_v * s, g_eb_v * s, radii)

        args = (cams_c.T, cams_c.ea, cams_c.eb, cams_c.valid,
                gt_tb, mask_tb,
                gtd_tb if gtd_tb is not None else jnp.zeros((b, 0, 0, 0)),
                l_idx, l_vld, l_src, tsel_b)
        outs = jax.lax.map(one_view, args)
        per_view, g_leaves_b, g_tau, g_offs, g_ea, g_eb, radii = outs
        g_params = gm.ParamLeaves(
            *jax.tree.map(lambda x: jnp.sum(x, axis=0), g_leaves_b)
        )
        # pose tangents: each shard backprops only its own rows
        g_tau = jax.lax.psum(g_tau, gauss_axis)
        # isotropic regularizer: shard-separable sum; the denominator is
        # the GLOBAL active count so local grads match the global reg
        n_act_g = jax.lax.psum(
            jnp.sum(mc.active.astype(jnp.float32)), gauss_axis
        )
        iso_w = mcfg.isotropic_weight
        if view_axis is not None:
            # added once per view-device, psum'd below: pre-divide
            iso_w = iso_w / jax.lax.psum(1.0, view_axis)

        def iso_local(ls):
            scaling = jnp.exp(ls)
            dev = jnp.abs(scaling - jnp.mean(scaling, axis=1, keepdims=True))
            mmask = mc.active[:, None].astype(scaling.dtype)
            denom = jnp.maximum(n_act_g * scaling.shape[1], 1.0)
            return iso_w * jnp.sum(dev * mmask) / denom

        g_iso = jax.grad(iso_local)(mc.params.log_scale)
        g_params = g_params._replace(log_scale=g_params.log_scale + g_iso)
        if view_axis is not None:
            g_params = jax.lax.psum(g_params, view_axis)

        vis = (radii > 0) & cams_c.valid[:, None]           # [B, N/D]
        norms = jnp.linalg.norm(g_offs, axis=-1)
        accum_d = jnp.sum(jnp.where(vis, norms, 0.0), 0)
        denom_d = jnp.sum(vis, 0).astype(jnp.float32)
        radii_d = jnp.max(jnp.where(vis, radii, 0.0), 0)
        if view_axis is not None:
            accum_d = jax.lax.psum(accum_d, view_axis)
            denom_d = jax.lax.psum(denom_d, view_axis)
            radii_d = jax.lax.pmax(radii_d, view_axis)
        mc = mc._replace(
            grad_accum=mc.grad_accum + accum_d,
            denom=mc.denom + denom_d,
            max_radii2d=jnp.maximum(mc.max_radii2d, radii_d),
        )

        mc = gm.adam_step(mc, g_params, hyper, step=itc - 1)

        if initialization:
            do_dens = (itc % mcfg.init_gaussian_update) == 0
            do_reset = (itc == mcfg.init_gaussian_reset) | (
                itc == mcfg.densify_from_iter
            )
            dens_th, dens_extent, dens_size = (
                mcfg.init_gaussian_th, mcfg.init_gaussian_extent, None,
            )
        else:
            do_dens = (
                itc % mcfg.gaussian_update_every
            ) == mcfg.gaussian_update_offset
            do_reset = ((itc % mcfg.gaussian_reset) == 0) & jnp.logical_not(
                do_dens
            )
            dens_th, dens_extent, dens_size = (
                mcfg.gaussian_th, mcfg.gaussian_extent, mcfg.size_threshold,
            )

        def densify(mm):
            return gm.densify_and_prune(
                mm, k_dens, mcfg.densify_grad_threshold, dens_th,
                dens_extent, dens_size, hyper, clone_cap=mcfg.clone_cap,
                split_cap=mcfg.split_cap,
            )

        mc = jax.lax.cond(do_dens, densify, lambda mm: mm, mc)

        if initialization:
            mc = jax.lax.cond(do_reset, gm.reset_opacity, lambda mm: mm, mc)
        else:
            visible_any = jnp.any(vis, axis=0)
            if view_axis is not None:
                visible_any = (
                    jax.lax.psum(visible_any.astype(jnp.int32), view_axis)
                    > 0
                )
            mc = jax.lax.cond(
                do_reset,
                lambda mm: gm.reset_opacity_nonvisible(mm, visible_any),
                lambda mm: mm,
                mc,
            )

        if not initialization:
            g8 = jnp.concatenate(
                [g_tau, g_ea[:, None], g_eb[:, None]], axis=-1
            )
            opt_mask = jnp.concatenate(
                [jnp.tile(cams_c.opt_pose[:, None], (1, 6)),
                 jnp.tile(cams_c.opt_exposure[:, None], (1, 2))], axis=-1
            )
            g8 = jnp.where(opt_mask, g8, 0.0)
            kat2 = kat + 1
            kam2 = 0.9 * kam + 0.1 * g8
            kav2 = 0.999 * kav + 0.001 * g8 * g8
            d8 = -lr8 * (kam2 / (1 - 0.9**kat2)) / (
                jnp.sqrt(kav2 / (1 - 0.999**kat2)) + 1e-8
            )
            d8 = jnp.where(opt_mask, d8, 0.0)
            newT = jax.vmap(lambda T, dlt: se3.retract(T, dlt))(
                cams_c.T, d8[:, :6]
            )
            cams_c = cams_c._replace(
                T=newT, ea=cams_c.ea + d8[:, 6], eb=cams_c.eb + d8[:, 7]
            )
            kam, kav, kat = kam2, kav2, kat2

        since = since + 1
        need = (since >= mcfg.rebin_every) | do_dens
        fresh = jax.lax.cond(
            need,
            lambda: build_frozen(mc, cams_c),
            lambda: (l_idx, l_vld, l_src),
        )
        l_idx, l_vld, l_src = fresh
        since = jnp.where(need, 0, since)

        return (mc, cams_c, kam, kav, kat, itc, key,
                l_idx, l_vld, l_src, since)

    if kf_adam is None:
        kf_adam = new_kf_adam(b)
    l_idx0, l_vld0, l_src0 = build_frozen(m, cams)
    carry = (m, cams, kf_adam[0], kf_adam[1], kf_adam[2],
             it_count, key, l_idx0, l_vld0, l_src0, jnp.int32(0))
    carry = jax.lax.fori_loop(0, n_iters, body, carry)
    (mc, cams_c, kam, kav, kat, itc, _,
     l_idx, l_vld, l_src, _) = carry

    # final visibility (n_touched > 0) per view over the LOCAL shard:
    # counts on the merged rows, then provenance-filtered scatter (merged
    # row j came from device sk//Kf, local list row sk%Kf)
    from ..render.pallas_lists import blend_lists_pallas_counts

    my_dev = jax.lax.axis_index(gauss_axis)
    kf_n = cfg_iter.k_fine

    def vis_one(args):
        T_v, valid_v, li, lv, sk = args
        d, _ = _local_merged_rows(
            mc.params, mc.active, T_v, li, lv, sk, intr, cfg_iter,
            gauss_axis,
        )
        _, cnts = blend_lists_pallas_counts(
            d, tx0, ty0, pmat, tile, intr.width, intr.height,
            cfg.pallas_interpret,
        )
        owner = sk // kf_n
        krow = sk % kf_n
        gi = jnp.take_along_axis(li, krow, axis=1)          # [Tf, Kf]
        tgt = jnp.where(owner == my_dev, gi, nl)
        nt = jnp.zeros((nl + 1,), jnp.int32).at[tgt.reshape(-1)].add(
            cnts.astype(jnp.int32).reshape(-1)
        )[:nl]
        return (nt > 0) & valid_v

    visibility = jax.lax.map(
        vis_one, (cams_c.T, cams_c.valid, l_idx, l_vld, l_src)
    )
    return mc, cams_c, itc, visibility, (kam, kav, kat)


def gp_sharded_map_iters(
    m: gm.GaussianMap,
    cams: CamBatch,
    n_iters,
    it_count,
    key,
    mesh: Mesh,
    intr: Intrinsics,
    cfg: RenderConfig,
    mcfg: MapConfig,
    hyper: gm.MapHyper,
    kf_adam=None,
    initialization: bool = False,
):
    """Drop-in `map_iters` with the map sharded over the mesh's "gauss"
    axis (and the view batch over an optional "view" axis). Takes and
    returns the FULL map — shard_map's in/out specs do the scatter/gather,
    so `BackEnd` needs no knowledge of the layout."""
    has_view = "view" in mesh.axis_names
    n_gauss = mesh.shape["gauss"]
    assert m.capacity % n_gauss == 0, (m.capacity, n_gauss)
    b0 = cams.T.shape[0]
    if has_view:
        cams = pad_cams(cams, mesh.shape["view"])
    b = cams.T.shape[0]
    if kf_adam is None:
        kf_adam = new_kf_adam(b)
    elif kf_adam[0].shape[0] != b:
        pad = b - kf_adam[0].shape[0]
        kf_adam = (
            jnp.pad(kf_adam[0], ((0, pad), (0, 0))),
            jnp.pad(kf_adam[1], ((0, pad), (0, 0))),
            kf_adam[2],
        )
    fn = _gp_fn(mesh, has_view, intr, cfg, mcfg, hyper, initialization)
    m2, cams2, itc2, vis, ka2 = fn(
        m, cams, jnp.int32(n_iters), jnp.int32(it_count), key, kf_adam
    )
    sl = lambda x: x[:b0]
    return (
        m2,
        jax.tree.map(sl, cams2),
        itc2,
        vis[:b0],
        ka2 if b == b0 else (ka2[0][:b0], ka2[1][:b0], ka2[2]),
    )


@functools.lru_cache(maxsize=32)
def _gp_fn(mesh, has_view, intr, cfg, mcfg, hyper, initialization):
    view_axis = "view" if has_view else None
    body = functools.partial(
        gp_map_iters_impl,
        intr=intr, cfg=cfg, mcfg=mcfg, hyper=hyper,
        initialization=initialization, gauss_axis="gauss",
        view_axis=view_axis,
    )
    g = P("gauss")
    map_spec = gm.GaussianMap(
        params=gm.ParamLeaves(g, g, g, g, g),
        adam_m=gm.ParamLeaves(g, g, g, g, g),
        adam_v=gm.ParamLeaves(g, g, g, g, g),
        adam_t=P(),
        active=g, kf_id=g, n_obs=g, max_radii2d=g,
        grad_accum=g, denom=g,
    )
    vsp = P("view") if has_view else P()
    cam_spec = jax.tree.map(lambda _: vsp, CamBatch(*CamBatch._fields))
    vis_spec = (
        P("view", "gauss") if has_view else P(None, "gauss")
    )
    ka_spec = (vsp, vsp, P())
    fn = jax.shard_map(
        lambda m_, cams_, ni, itc, k, ka: body(
            m_, cams_, ni, itc, k, kf_adam=ka
        ),
        mesh=mesh,
        in_specs=(map_spec, cam_spec, P(), P(), P(), ka_spec),
        out_specs=(map_spec, cam_spec, P(), vis_spec, ka_spec),
        check_vma=False,  # the pose/exposure update is identical across
                          # gauss devices (g_tau psum'd, ea/eb sums
                          # replicated) but the checker can't see through
                          # the densify lax.cond
    )
    return jax.jit(fn)
