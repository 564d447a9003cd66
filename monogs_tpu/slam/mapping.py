"""Mapping backend optimization: fused keyframe-window bundle adjustment.

Reimplements BackEnd.initialize_map / map / color_refinement
(/root/reference/utils/slam_backend.py:91-368) as jitted device programs. A
whole `map(window, iters=N)` call — N iterations of (render every window
keyframe + 2 random past keyframes, photometric+depth loss, isotropic
regularizer, Adam on map parameters and window poses/exposures with SE(3)
retraction, densify/prune and opacity resets at their scheduled iterations)
— is ONE device program driven by lax.fori_loop with a *dynamic* trip count,
so the 10/150/300/1050-iteration variants share a single compilation.

Differences from the reference dictated by TPU-native design, all documented:
  - fixed-capacity map (models/gaussian_map.py) replaces optimizer surgery;
  - random past keyframes are drawn per-iteration from a per-call staged
    pool (the host stages `pool` views; the reference samples 2 fresh ones
    from all of host RAM each iteration);
  - densification stats accumulate per-view screen-space gradients through a
    zero-valued [B, N, 2] hook (the torch screenspace_points trick);
  - per-keyframe visibility (n_touched > 0) is computed once after the loop
    rather than every iteration — its only consumers (covisibility pruning,
    frontend sync) run after the call.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import gaussian_map as gm
from ..ops import losses, se3
from ..render import RenderConfig, render
from ..render.camera import Intrinsics
from .frame import FrameData


class MapConfig(NamedTuple):
    """Static mapping hyperparameters (Training section + opt_params)."""

    monocular: bool = True
    alpha: float = 0.95
    window_size: int = 8
    pose_window: int = 3
    pool_size: int = 2            # staged random past keyframes per call
    lr_trans: float = 0.0005      # cam_trans_delta * 0.5 (slam_backend.py:461)
    lr_rot: float = 0.0015        # cam_rot_delta * 0.5
    lr_exposure_a: float = 0.01
    lr_exposure_b: float = 0.01
    densify_grad_threshold: float = 0.0002
    gaussian_th: float = 0.7
    gaussian_extent: float = 6.0  # cameras_extent * Training.gaussian_extent
    gaussian_update_every: int = 150
    gaussian_update_offset: int = 50
    gaussian_reset: int = 2001
    size_threshold: int = 20
    init_gaussian_update: int = 100
    init_gaussian_reset: int = 500
    init_gaussian_th: float = 0.005
    init_gaussian_extent: float = 180.0  # cameras_extent * init_gaussian_extent
    densify_from_iter: int = 500
    isotropic_weight: float = 10.0
    lambda_dssim: float = 0.2
    # NOTE: under Parallel.gauss_devices=D the caps apply PER SHARD, so
    # the global per-densify growth budget is D x these values — D=1 and
    # D>1 runs with the same MapConfig grow the map at different rates
    # (intentional; see parallel/gauss_iters.py module docstring).
    clone_cap: int = 8192
    split_cap: int = 4096
    # Frozen per-view tile lists (see render/renderer.py TileLists): built
    # with a strict-priority margin and reused across mapping iterations —
    # map params and window poses move very little per Adam step, so the
    # binning (≈10 ms/view) re-runs only every rebin_every iterations and
    # immediately after densify/prune/reset (new gaussians are invisible
    # until they enter the lists). 0 disables (bin every render).
    bin_margin: float = 4.0
    rebin_every: int = 25
    # Blend all B window views as one stacked-tile kernel invocation
    # (render_batch) instead of lax.map-ing B per-view renders. A/B knob;
    # measured on v5e at the bench workload (640x480, B=10, k_fine=96,
    # scripts/ab_mapping.py): sequential 6.68 vs batched 4.90 BA iters/s —
    # the stacked kernel's [B*Tf, Kf, F] gathers and intermediates are
    # HBM-bound and lose to per-view grids, so the default is False.
    batch_render: bool = False
    # Fused mapping loss+gradient kernel (render_map_grad): on the
    # pallas_lists path with frozen lists, each view's blend + masked-L1
    # chain + reverse blend run as ONE kernel pass (mapping's mean
    # normalizers are constants, so the whole cotangent is computable
    # in-kernel) — no image assembly, no separate fwd+bwd kernel pair.
    # Numerics match autodiff (test_mapping_fused_grad_parity).
    fused_grad: bool = True
    # Route the fused path's row-cotangent scatter (the transpose of the
    # packed[lists.idx] gather — 46 of 144 ms/iter at bench shapes,
    # scripts/profile_mapping.py) through a FROZEN sorted permutation +
    # segment_sum instead of XLA's random scatter-add: the lists are
    # frozen for rebin_every iterations, so argsort-ing them is paid once
    # per rebuild and each iteration does a contiguous perm-gather + a
    # sorted segment reduction. Same adds, different order (f32
    # reassociation only). Requires fused_grad + bin_margin > 0.
    # MEASURED NO WIN on v5e (scripts/ab_scatter.py: 138.5 -> 137.7
    # ms/iter, within noise; scripts/bench_gather.py isolated: at-add
    # 19.5 vs perm+segsum 19.5 ms — the perm-gather costs what the
    # random scatter saves), so default OFF: the flag also costs a
    # [B, Tf*Kf] x2 loop carry and a sort per rebuild. Kept as an A/B
    # knob; superseded by io_batch below.
    scatter_segsum: bool = False
    # Batch the fused path's index traffic across the whole view window:
    # ONE view-offset flat gather from the stacked [B, N, F] packed rows,
    # the validity mask applied IN-KERNEL (madd column) instead of as a
    # masked-concat row copy + its transpose, and ONE flat scatter-add
    # for all views' row cotangents. Kernel passes stay per-view (the
    # stacked-grid variant lost on hardware — see batch_render above);
    # only the gather/mask/scatter legs batch. MEASURED WORSE on v5e
    # (scripts/ab_scatter.py: 138.0 per-view vs 169.7 ms/iter batched):
    # the [B, N, F] stacked packed-rows materialization and the vmapped
    # stage1 vjp's batched residuals cost more than the per-view gathers
    # save (isolated: 10 gathers 4.4 ms vs one flat 2.2 ms,
    # scripts/bench_gather.py) — the per-view vjp recomputes preprocess
    # inside a smaller live set that XLA fuses better. Default OFF; kept
    # as an A/B knob with ulp-level parity (test_map_iters_io_batch_parity).
    io_batch: bool = False
    # Per-iteration random fine-tile subset for the fused BA gradient
    # (tile-wise analogue of the reference's Training.RGN num_pixels
    # subsampling, slam_frontend.py:250-257 — tracking ships the same
    # machinery as TrackConfig.fo/so_tile_frac). Each iteration draws a
    # FRESH per-view subset of max(8, frac*Tf rounded to a multiple of 8)
    # tiles from the frozen lists, renders/differentiates only those rows,
    # and scales the mean normalizers by 1/frac (unbiased estimate; BA's
    # hundreds of Adam iterations average the noise exactly like the
    # reference's pixel subsampling). The attribution
    # (docs/mapping_r4_attribution.md) shows the iteration is ~95%
    # per-view x per-row, so cost scales ~ with the fraction. Applies to
    # the fused pallas path only (io_batch/scatter_segsum/XLA fall back
    # to full tiles); lists upkeep, densify, and the final visibility
    # pass stay full-view.
    tile_frac: float = 1.0
    # Gather the listed rows' PARAMETERS before preprocess so the
    # differentiated per-view pipeline runs over S*Kf rows instead of
    # capacity N (render_map_grad gather_first — tracking's subset design
    # applied to mapping). Pays off when S*Kf << N, i.e. with tile_frac;
    # exact up to f32 scatter order (test_map_grad_gather_first_parity).
    gather_first: bool = False
    # Compute the final visibility pass (n_touched per view) from the loop's
    # frozen tile lists instead of B from-scratch globally-binned renders —
    # the binning (preprocess over capacity + global instance sort + fine
    # select, per view) dominated the pass. The lists are at most
    # rebin_every-1 iterations stale (and always fresh right after
    # densify/prune, whose new gaussians would otherwise read n_touched=0
    # and be covisibility-pruned on sight); strict-first margin lists are
    # blend-identical at the build pose, so staleness only reflects the
    # tiny intra-rebin pose/param drift. Ignored when bin_margin == 0.
    vis_from_lists: bool = True


class CamBatch(NamedTuple):
    """Stacked per-view tensors for the window (+ random pool)."""

    gt_image: jax.Array      # [B, 3, H, W]
    gt_depth: jax.Array      # [B, 1, H, W]
    mapping_mask: jax.Array  # [B, 1, H, W]
    T: jax.Array             # [B, 4, 4]
    ea: jax.Array            # [B]
    eb: jax.Array            # [B]
    valid: jax.Array         # [B] slot in use
    opt_pose: jax.Array      # [B] optimize pose (window rank < pose_window, uid != 0)
    opt_exposure: jax.Array  # [B] optimize exposure (uid != 0)


def empty_cam_batch(b: int, h: int, w: int) -> CamBatch:
    z = jnp.zeros
    return CamBatch(
        gt_image=z((b, 3, h, w)), gt_depth=z((b, 1, h, w)),
        mapping_mask=z((b, 1, h, w)),
        T=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ea=jnp.ones((b,)), eb=z((b,)),
        valid=z((b,), bool), opt_pose=z((b,), bool), opt_exposure=z((b,), bool),
    )


def _mapping_loss_one(gauss, cam, tau, intr, cfg, mcfg: MapConfig,
                      means2d_offset, initialization: bool, lists=None):
    """Render one view and compute its mapping loss (slam_utils.py:224-253)."""
    out = render(gauss, cam.T, intr, cfg, tau=tau,
                 means2d_offset=means2d_offset, lists=lists)
    if mcfg.monocular:
        loss = losses.mapping_loss_rgb(
            out.image, cam.gt_image, cam.mapping_mask, cam.ea, cam.eb,
            initialization=initialization,
        )
    else:
        loss = losses.mapping_loss_rgbd(
            out.image, out.depth, cam.gt_image, cam.gt_depth, cam.mapping_mask,
            cam.ea, cam.eb, alpha=mcfg.alpha, initialization=initialization,
        )
    return loss, out.radii


def _batch_loss(params: gm.ParamLeaves, taus, eas, ebs, cams: CamBatch,
                active, means2d_offsets, intr, cfg, mcfg, initialization,
                lists_b=None):
    """Total mapping loss over the batch + isotropic regularizer.

    taus/eas/ebs override the pose tangent and exposure of each view so that
    gradients flow to them. On the pallas_lists backend with frozen lists the
    B views blend as ONE fused kernel invocation (render_batch) — B
    sequential per-view kernels underfill the chip; otherwise renders run
    sequentially (lax.map) to bound memory at B renders' worth of tile
    intermediates. lists_b optionally carries frozen per-view TileLists
    (stacked on axis 0).
    """
    gauss = _gauss_view(params, active)

    if (cfg.backend == "pallas_lists" and lists_b is not None
            and mcfg.batch_render):
        from ..render.renderer import render_batch

        image_b, depth_b, _, radii = render_batch(
            gauss, cams.T, intr, cfg, lists_b, taus=taus,
            means2d_offsets=means2d_offsets,
        )
        if mcfg.monocular:
            per_view = jax.vmap(
                lambda img, gt, msk, ea, eb: losses.mapping_loss_rgb(
                    img, gt, msk, ea, eb, initialization=initialization
                )
            )(image_b, cams.gt_image, cams.mapping_mask, eas, ebs)
        else:
            per_view = jax.vmap(
                lambda img, dep, gt, gtd, msk, ea, eb:
                losses.mapping_loss_rgbd(
                    img, dep, gt, gtd, msk, ea, eb, alpha=mcfg.alpha,
                    initialization=initialization,
                )
            )(image_b, depth_b, cams.gt_image, cams.gt_depth,
              cams.mapping_mask, eas, ebs)
        per_view = jnp.where(cams.valid, per_view, 0.0)
    else:
        def one(args):
            cam, tau, ea, eb, off, lst = args
            cam = cam._replace(ea=ea, eb=eb)
            loss, radii = _mapping_loss_one(
                gauss, cam, tau, intr, cfg, mcfg, off, initialization,
                lists=lst,
            )
            return jnp.where(cam.valid, loss, 0.0), radii

        per_view, radii = jax.lax.map(
            one, (cams, taus, eas, ebs, means2d_offsets, lists_b)
        )
    total = jnp.sum(per_view)
    scaling = jnp.exp(params.log_scale)
    total = total + mcfg.isotropic_weight * losses.isotropic_reg(scaling, active)
    return total, radii


def _gauss_view(params: gm.ParamLeaves, active):
    from ..render.renderer import GaussianArrays

    return GaussianArrays(
        xyz=params.xyz, sh=params.sh, log_scale=params.log_scale,
        quat=params.quat, opa_logit=params.opa_logit, active=active,
    )


class MapStepCarry(NamedTuple):
    m: gm.GaussianMap
    cams: CamBatch          # window + pool stacked; poses/exposures updated
    kf_adam_m: jax.Array    # [B, 8]
    kf_adam_v: jax.Array    # [B, 8]
    kf_adam_t: jax.Array
    it_count: jax.Array     # global backend iteration counter
    key: jax.Array
    lists_idx: jax.Array    # [B, Tf, Kf] frozen per-view tile lists
    lists_vld: jax.Array
    since_rebin: jax.Array  # iterations since the lists were rebuilt
    sort_perm: jax.Array    # [B, Tf*Kf] frozen argsort of lists_idx flat
    sort_sid: jax.Array     # [B, Tf*Kf] lists_idx flat in sorted order


def new_kf_adam(b: int):
    """Fresh keyframe-optimizer Adam state for a window of b slots
    (torch recreates keyframe_optimizers per keyframe, slam_backend.py:489)."""
    return (jnp.zeros((b, 8)), jnp.zeros((b, 8)), jnp.float32(0))


def map_iters_impl(
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
    axis_name: str | None = None,
):
    """Run `n_iters` (dynamic) mapping iterations; returns (map, cams,
    it_count, visibility [B, N] bool from a final n_touched pass, kf_adam).

    Equivalent of BackEnd.map(window, iters=n) (slam_backend.py:157-333) and
    BackEnd.initialize_map (:91-155) when initialization=True (single view,
    init densify thresholds, no pose/exposure optimization, opacity reset at
    init_gaussian_reset and densify_from_iter).

    kf_adam carries the window pose/exposure Adam moments ACROSS map_iters
    calls between keyframes — the reference's keyframe_optimizers object
    persists through the idle-mapping loop (slam_backend.py:397-401) and is
    only recreated on a new keyframe.

    With `axis_name` the SAME body runs under shard_map with the view batch
    sharded over that mesh axis (parallel/mesh.py sharded_map_iters): map
    gradients, densification statistics, and visibility reduce over ICI
    (psum / pmax), pose/exposure Adam stays local to the owning device, and
    the replicated map update is bit-identical across devices because every
    cross-view reduction happens before it. Callers must pre-scale
    mcfg.isotropic_weight by 1/n_devices (the regularizer is added once per
    device and its gradient gets psum'd).
    """
    b = cams.T.shape[0]
    n = m.capacity
    cfg_iter = cfg._replace(with_n_touched=False)
    lr8 = jnp.array(
        [mcfg.lr_trans] * 3 + [mcfg.lr_rot] * 3
        + [mcfg.lr_exposure_a, mcfg.lr_exposure_b],
        jnp.float32,
    )
    use_lists = mcfg.bin_margin > 0
    fused = (
        use_lists
        and mcfg.fused_grad
        and cfg_iter.backend == "pallas_lists"
    )
    use_segsum = fused and mcfg.scatter_segsum
    # per-iteration tile subsets (MapConfig.tile_frac) ride the plain
    # fused path only: segsum's frozen permutation and io_batch's flat
    # gather both index the FULL lists
    use_sub = (
        fused and mcfg.tile_frac < 1.0
        and not use_segsum and not mcfg.io_batch
    )

    def sort_lists(l_idx):
        """Frozen scatter order: per view, argsort of the flat list ids
        (paid once per rebuild, consumed every iteration by the
        segment-sum pullback in render_map_grad)."""
        flat = l_idx.reshape(b, -1)
        perm = jnp.argsort(flat, axis=1).astype(jnp.int32)
        sid = jnp.take_along_axis(flat, perm, axis=1)
        return perm, sid

    if fused:
        # ground-truth images never change inside the loop: tile them once
        # per call (the fused kernel consumes tile space directly)
        from ..render.renderer import tile_images

        gt_tb = jax.vmap(lambda im: tile_images(im, intr, cfg_iter))(
            cams.gt_image
        )
        mask_tb = jax.vmap(lambda im: tile_images(im, intr, cfg_iter))(
            cams.mapping_mask
        )
        gtd_tb = (
            jax.vmap(lambda im: tile_images(im, intr, cfg_iter))(
                cams.gt_depth
            )
            if not mcfg.monocular else None
        )
        if use_sub:
            from ..render.renderer import _tile_origins

            tx0f, ty0f = _tile_origins(intr, cfg_iter)
            n_fine = gt_tb.shape[1]
            # multiple of 8 keeps the kernel's tile-batch (bt) wide —
            # odd subset sizes force the bt=1 Mosaic-relayout fallback
            n_sub = max(8, int(n_fine * mcfg.tile_frac) // 8 * 8)
            sub_frac = n_sub / n_fine

    def build_lists(mc, cams_c):
        from ..render import build_tile_lists

        gauss = _gauss_view(mc.params, mc.active)
        return jax.lax.map(
            lambda T: build_tile_lists(
                gauss, T, intr, cfg_iter, margin=mcfg.bin_margin
            ),
            cams_c.T,
        )

    def body(_, carry: MapStepCarry):
        (mc, cams_c, kam, kav, kat, itc, key,
         l_idx, l_vld, since, s_perm, s_sid) = carry
        itc = itc + 1
        key, k_dens = jax.random.split(key)

        taus0 = jnp.zeros((b, 6))
        offs0 = jnp.zeros((b, n, 2))
        from ..render.renderer import TileLists

        lists_b = TileLists(idx=l_idx, vld=l_vld) if use_lists else None

        if fused and mcfg.io_batch:
            from ..render.renderer import (
                _F, _pack, map_grad_from_rows, preprocess,
            )

            tf_, kf_ = l_idx.shape[1], l_idx.shape[2]

            def stage1_all(xyz, sh, ls, quat, ol, taus, offs):
                def one(T_v, tau_v, off_v):
                    T_eff = se3.retract(T_v, tau_v)
                    prep = preprocess(
                        xyz, ls, quat, ol, sh, mc.active, T_eff, intr,
                        sh_degree=cfg_iter.sh_degree, near=cfg_iter.near,
                        means2d_offset=off_v,
                    )
                    return _pack(prep), prep.valid, prep.radius

                packed_b, valid_b, radii_b = jax.vmap(one)(
                    cams_c.T, taus, offs
                )
                return packed_b, (valid_b, radii_b)

            packed_b, pull1, (valid_b, radii) = jax.vjp(
                stage1_all, mc.params.xyz, mc.params.sh,
                mc.params.log_scale, mc.params.quat, mc.params.opa_logit,
                taus0, offs0, has_aux=True,
            )
            gidx = (
                l_idx.reshape(b, -1)
                + (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
            ).reshape(-1)
            d0 = packed_b.reshape(b * n, _F)[gidx].reshape(b, tf_, kf_, _F)
            vld_b = l_vld & valid_b.reshape(b * n)[gidx].reshape(
                b, tf_, kf_
            )
            madd_b = jnp.where(vld_b, 0.0, -1e30).astype(jnp.float32)

            def one_kernel(args):
                d_v, madd_v, gt_t, mask_t, gtd_t, ea_v, eb_v = args
                return map_grad_from_rows(
                    d_v, intr, cfg_iter, gt_t, mask_t, ea_v, eb_v,
                    initialization, mcfg.alpha, gtd_t=gtd_t, madd=madd_v,
                )

            kargs = (d0, madd_b, gt_tb, mask_tb,
                     gtd_tb if gtd_tb is not None
                     else jnp.zeros((b, 0, 0, 0)),
                     cams_c.ea, cams_c.eb)
            if gtd_tb is None:
                def one_kernel_mono(a):
                    a = a[:4] + (None,) + a[5:]
                    return one_kernel(a)
                per_view, dd_b, g_ea, g_eb = jax.lax.map(
                    one_kernel_mono, kargs
                )
            else:
                per_view, dd_b, g_ea, g_eb = jax.lax.map(one_kernel, kargs)

            s_b = cams_c.valid.astype(jnp.float32)
            per_view = per_view * s_b
            g_ea = g_ea * s_b
            g_eb = g_eb * s_b
            dd_b = dd_b * s_b[:, None, None, None]
            loss = jnp.sum(per_view)
            dpacked = (
                jnp.zeros((b * n, _F))
                .at[gidx].add(dd_b.reshape(-1, _F))
                .reshape(b, n, _F)
            )
            grads = pull1(dpacked)
            g_params = gm.ParamLeaves(*grads[:5])
            g_tau = grads[5] * s_b[:, None]
            g_offs = grads[6] * s_b[:, None, None]
            g_iso = jax.grad(
                lambda ls: mcfg.isotropic_weight * losses.isotropic_reg(
                    jnp.exp(ls), mc.active
                )
            )(mc.params.log_scale)
            g_params = g_params._replace(
                log_scale=g_params.log_scale + g_iso
            )
        elif fused:
            from ..render.renderer import render_map_grad

            gauss_it = _gauss_view(mc.params, mc.active)

            if use_sub:
                key, k_sub = jax.random.split(key)
                tsel_b = jax.vmap(
                    lambda k: jax.random.permutation(k, n_fine)[:n_sub]
                )(jax.random.split(k_sub, b))          # [B, S] fresh/iter
            else:
                tsel_b = jnp.zeros((b, 1), jnp.int32)  # unused placeholder

            def one_fused(args):
                (T_v, ea_v, eb_v, valid_v, gt_t, mask_t, gtd_t, li, lv,
                 tau_v, off_v, pv, sv, ts) = args
                if use_sub:
                    li, lv = li[ts], lv[ts]
                    gt_t, mask_t = gt_t[ts], mask_t[ts]
                    if gtd_t is not None:
                        gtd_t = gtd_t[ts]
                    txy = (tx0f[ts], ty0f[ts])
                else:
                    txy = None
                loss_v, g_leaves, g_tau_v, g_off_v, g_ea_v, g_eb_v, radii_v = (
                    render_map_grad(
                        gauss_it, T_v, intr, cfg_iter,
                        TileLists(idx=li, vld=lv), gt_t, mask_t,
                        tau_v, off_v, ea_v, eb_v, initialization,
                        mcfg.alpha, gtd_t=gtd_t,
                        sortperm=(pv, sv) if use_segsum else None,
                        txy=txy, px_frac=sub_frac if use_sub else 1.0,
                        gather_first=mcfg.gather_first and not use_segsum,
                    )
                )
                s = valid_v.astype(jnp.float32)
                g_leaves = jax.tree.map(lambda x: x * s, g_leaves)
                return (loss_v * s, g_leaves, g_tau_v * s, g_off_v * s,
                        g_ea_v * s, g_eb_v * s, radii_v)

            args = (cams_c.T, cams_c.ea, cams_c.eb, cams_c.valid,
                    gt_tb, mask_tb,
                    gtd_tb if gtd_tb is not None
                    else jnp.zeros((b, 0, 0, 0)),
                    l_idx, l_vld, taus0, offs0, s_perm, s_sid, tsel_b)
            if gtd_tb is None:
                def one_fused_mono(a):
                    a = a[:6] + (None,) + a[7:]
                    return one_fused(a)
                outs = jax.lax.map(one_fused_mono, args)
            else:
                outs = jax.lax.map(one_fused, args)
            per_view, g_leaves_b, g_tau, g_offs, g_ea, g_eb, radii = outs
            loss = jnp.sum(per_view)
            g_params_tuple = jax.tree.map(
                lambda x: jnp.sum(x, axis=0), g_leaves_b
            )
            g_params = gm.ParamLeaves(*g_params_tuple)
            # isotropic regularizer gradient (params-only, cheap in XLA)
            g_iso = jax.grad(
                lambda ls: mcfg.isotropic_weight * losses.isotropic_reg(
                    jnp.exp(ls), mc.active
                )
            )(mc.params.log_scale)
            g_params = g_params._replace(
                log_scale=g_params.log_scale + g_iso
            )
        else:
            (loss, radii), grads = jax.value_and_grad(
                lambda params, taus, eas, ebs, offs: _batch_loss(
                    params, taus, eas, ebs, cams_c, mc.active, offs,
                    intr, cfg_iter, mcfg, initialization, lists_b,
                ),
                argnums=(0, 1, 2, 3, 4),
                has_aux=True,
            )(mc.params, taus0, cams_c.ea, cams_c.eb, offs0)
            g_params, g_tau, g_ea, g_eb, g_offs = grads
        if axis_name is not None:
            # map-parameter gradients reduce over the view mesh axis (ICI)
            g_params = jax.lax.psum(g_params, axis_name)

        # densification stats: per-view screen-space grad norms for visible
        # gaussians (visibility_filter = radii > 0), summed over views
        # (add_densification_stats per view, slam_backend.py:292-299)
        vis = (radii > 0) & cams_c.valid[:, None]          # [B, N]
        norms = jnp.linalg.norm(g_offs, axis=-1)           # [B, N]
        accum_d = jnp.sum(jnp.where(vis, norms, 0.0), 0)
        denom_d = jnp.sum(vis, 0).astype(jnp.float32)
        radii_d = jnp.max(jnp.where(vis, radii, 0.0), 0)
        if axis_name is not None:
            accum_d = jax.lax.psum(accum_d, axis_name)
            denom_d = jax.lax.psum(denom_d, axis_name)
            radii_d = jax.lax.pmax(radii_d, axis_name)
        mc = mc._replace(
            grad_accum=mc.grad_accum + accum_d,
            denom=mc.denom + denom_d,
            max_radii2d=jnp.maximum(mc.max_radii2d, radii_d),
        )

        # map Adam step (the reference steps after densify bookkeeping; the
        # xyz lr follows the previous iteration's schedule value)
        mc = gm.adam_step(mc, g_params, hyper, step=itc - 1)

        # densify / prune / opacity reset at scheduled iterations
        if initialization:
            do_dens = (itc % mcfg.init_gaussian_update) == 0
            do_reset = (itc == mcfg.init_gaussian_reset) | (
                itc == mcfg.densify_from_iter
            )
            dens_th, dens_extent, dens_size = (
                mcfg.init_gaussian_th, mcfg.init_gaussian_extent, None,
            )
        else:
            do_dens = (itc % mcfg.gaussian_update_every) == mcfg.gaussian_update_offset
            do_reset = ((itc % mcfg.gaussian_reset) == 0) & jnp.logical_not(do_dens)
            dens_th, dens_extent, dens_size = (
                mcfg.gaussian_th, mcfg.gaussian_extent, mcfg.size_threshold,
            )

        def densify(mm):
            return gm.densify_and_prune(
                mm, k_dens, mcfg.densify_grad_threshold, dens_th, dens_extent,
                dens_size, hyper, clone_cap=mcfg.clone_cap,
                split_cap=mcfg.split_cap,
            )

        mc = jax.lax.cond(do_dens, densify, lambda mm: mm, mc)

        if initialization:
            mc = jax.lax.cond(do_reset, gm.reset_opacity, lambda mm: mm, mc)
        else:
            visible_any = jnp.any(vis, axis=0)
            if axis_name is not None:
                visible_any = (
                    jax.lax.psum(visible_any.astype(jnp.int32), axis_name) > 0
                )
            mc = jax.lax.cond(
                do_reset,
                lambda mm: gm.reset_opacity_nonvisible(mm, visible_any),
                lambda mm: mm,
                mc,
            )

        if not initialization:
            # keyframe pose/exposure Adam + retraction (slam_backend.py:322-332)
            g8 = jnp.concatenate([g_tau, g_ea[:, None], g_eb[:, None]], axis=-1)
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
            newT = jax.vmap(lambda T, d: se3.retract(T, d))(cams_c.T, d8[:, :6])
            cams_c = cams_c._replace(
                T=newT, ea=cams_c.ea + d8[:, 6], eb=cams_c.eb + d8[:, 7]
            )
            kam, kav, kat = kam2, kav2, kat2

        if use_lists:
            # rebuild lists when stale or when the gaussian SET changed
            # (densify/prune inserts slots no stale list references)
            since = since + 1
            need = (since >= mcfg.rebin_every) | do_dens

            def rebuild():
                ln = build_lists(mc, cams_c)
                pn, sn = (
                    sort_lists(ln.idx) if use_segsum else (s_perm, s_sid)
                )
                return ln.idx, ln.vld, pn, sn

            l_idx, l_vld, s_perm, s_sid = jax.lax.cond(
                need,
                rebuild,
                lambda: (l_idx, l_vld, s_perm, s_sid),
            )
            since = jnp.where(need, 0, since)

        return MapStepCarry(mc, cams_c, kam, kav, kat, itc, key,
                            l_idx, l_vld, since, s_perm, s_sid)

    if kf_adam is None:
        kf_adam = new_kf_adam(b)
    from ..render.renderer import TileLists  # noqa: F811

    if use_lists:
        lists0 = build_lists(m, cams)
    else:
        z = jnp.zeros((b, 1, 1))
        lists0 = TileLists(idx=z.astype(jnp.int32), vld=z.astype(bool))
    if use_segsum:
        perm0, sid0 = sort_lists(lists0.idx)
    else:
        zi = jnp.zeros((b, 1), jnp.int32)
        perm0, sid0 = zi, zi
    carry = MapStepCarry(
        m=m, cams=cams,
        kf_adam_m=kf_adam[0], kf_adam_v=kf_adam[1],
        kf_adam_t=kf_adam[2], it_count=it_count, key=key,
        lists_idx=lists0.idx, lists_vld=lists0.vld,
        since_rebin=jnp.int32(0),
        sort_perm=perm0, sort_sid=sid0,
    )
    carry = jax.lax.fori_loop(0, n_iters, body, carry)

    # final visibility pass with n_touched (consumed by covisibility pruning
    # and the frontend sync; the reference recomputes it every iteration but
    # only ever reads the latest value)
    gauss = _gauss_view(carry.m.params, carry.m.active)

    if use_lists and mcfg.vis_from_lists:
        def vis_one_l(args):
            T_v, valid_v, li, lv = args
            out = render(gauss, T_v, intr, cfg,
                         lists=TileLists(idx=li, vld=lv))
            return (out.n_touched > 0) & valid_v

        visibility = jax.lax.map(
            vis_one_l,
            (carry.cams.T, carry.cams.valid,
             carry.lists_idx, carry.lists_vld),
        )
    else:
        def vis_one(cam):
            out = render(gauss, cam.T, intr, cfg)
            return (out.n_touched > 0) & cam.valid

        visibility = jax.lax.map(vis_one, carry.cams)
    return carry.m, carry.cams, carry.it_count, visibility, (
        carry.kf_adam_m, carry.kf_adam_v, carry.kf_adam_t,
    )


map_iters = functools.partial(
    jax.jit,
    static_argnames=("intr", "cfg", "mcfg", "hyper", "initialization",
                     "axis_name"),
)(map_iters_impl)


@functools.partial(
    jax.jit, static_argnames=("mcfg", "prune_mode", "prune_coviz")
)
def covisibility_prune(
    m: gm.GaussianMap,
    visibility,       # [B, N] bool for the current window
    window_kf_ids,    # [B] int32 (-1 for unused slots)
    initialized,      # [] bool
    mcfg: MapConfig,
    prune_mode: str = "slam",
    prune_coviz: int = 3,
):
    """Occlusion-aware pruning (slam_backend.py:259-290). Only ever applied
    in monocular mode, matching the reference's `if ... and self.monocular`.
    Returns (map, n_obs)."""
    n_obs = jnp.sum(visibility, axis=0).astype(jnp.int32)
    if prune_mode == "odometry":
        to_prune = n_obs < 3
    else:  # slam
        sorted_ids = jnp.sort(window_kf_ids)[::-1]
        cutoff_id = sorted_ids[2]  # 3rd most recent keyframe
        mask = jnp.where(initialized, m.kf_id >= cutoff_id, m.kf_id >= 0)
        to_prune = (n_obs <= prune_coviz) & mask
    to_prune = to_prune & m.active
    m = m._replace(n_obs=jnp.where(m.active, n_obs, 0))
    if mcfg.monocular:
        m = gm.prune(m, to_prune)
    return m, n_obs


@functools.partial(jax.jit, static_argnames=("intr", "cfg", "mcfg", "hyper"))
def color_refinement_iters(
    m: gm.GaussianMap,
    cams: CamBatch,     # staged pool of keyframes
    n_iters,
    key,
    intr: Intrinsics,
    cfg: RenderConfig,
    mcfg: MapConfig,
    hyper: gm.MapHyper,
):
    """Photometric-only refinement (slam_backend.py:335-368): per iteration
    pick one random staged keyframe, loss = (1-λ)L1 + λ(1-SSIM) against the
    raw gt (no exposure, no masks), Adam on map params with the xyz schedule
    driven by the local refinement iteration.

    Uses the same frozen per-view tile lists as map_iters (margin +
    strict-priority), rebuilt for all staged views every rebin_every
    iterations — at 26000 iterations the per-call binning would otherwise
    dominate the refinement wall-clock."""
    from ..ops.image import ssim as ssim_fn
    from ..render import build_tile_lists
    from ..render.renderer import TileLists

    b = cams.T.shape[0]
    n_valid = jnp.maximum(jnp.sum(cams.valid.astype(jnp.int32)), 1)
    cfg_iter = cfg._replace(with_n_touched=False)
    use_lists = mcfg.bin_margin > 0

    def build_lists(mc):
        gauss = _gauss_view(mc.params, mc.active)
        return jax.lax.map(
            lambda T: build_tile_lists(
                gauss, T, intr, cfg_iter, margin=mcfg.bin_margin
            ),
            cams.T,
        )

    def body(i, carry):
        mc, key, l_idx, l_vld = carry
        key, k1 = jax.random.split(key)
        vi = jax.random.randint(k1, (), 0, n_valid)
        cam = jax.tree.map(lambda x: x[vi], cams)

        if use_lists:
            lists_new = jax.lax.cond(
                (i % mcfg.rebin_every) == 0,
                lambda: build_lists(mc),
                lambda: TileLists(idx=l_idx, vld=l_vld),
            )
            l_idx, l_vld = lists_new.idx, lists_new.vld
            lists_v = TileLists(idx=l_idx[vi], vld=l_vld[vi])
        else:
            lists_v = None

        def loss_fn(params):
            gauss = _gauss_view(params, mc.active)
            out = render(gauss, cam.T, intr, cfg_iter, lists=lists_v)
            l1 = jnp.mean(jnp.abs(out.image - cam.gt_image))
            s = ssim_fn(out.image, cam.gt_image)
            return (1.0 - mcfg.lambda_dssim) * l1 + mcfg.lambda_dssim * (1.0 - s)

        g = jax.grad(loss_fn)(mc.params)
        mc = gm.adam_step(mc, g, hyper, step=i + 1)
        return mc, key, l_idx, l_vld

    if use_lists:
        lists0 = build_lists(m)
    else:
        z = jnp.zeros((b, 1, 1))
        lists0 = TileLists(idx=z.astype(jnp.int32), vld=z.astype(bool))
    m, _, _, _ = jax.lax.fori_loop(
        0, n_iters, body, (m, key, lists0.idx, lists0.vld)
    )
    return m
