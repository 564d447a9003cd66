"""Camera tracking: fused first-order Adam + count-sketched Gauss-Newton/LM.

Reimplements FrontEnd.tracking (/root/reference/utils/slam_frontend.py:
340-902) as ONE jitted device program per frame: both optimization loops are
lax.while_loops with on-device convergence tests, so there are zero
host<->device round trips inside the tracking hot path (the reference pays a
CUDA sync + python step per iteration).

Phase 1 (first order, :455-630): Adam over the 8-dim state
[cam_trans_delta(3), cam_rot_delta(3), exposure_a, exposure_b] of the
signed-sqrt-Huber photometric norm, with SE(3) retraction T <- Exp(d) @ T
each iteration and convergence when ||d_tau|| < 1e-4. Adam moments persist
across iterations while the tangent resets to zero, exactly like the torch
optimizer over delta parameters.

Phase 2 (sketched second order, :461-734): per iteration draw a fresh
count-sketch over the m pixels, compute the sketched residual Sf and sketched
Jacobian SJ = S@J via jax.linearize (8 input dims -> 8 cheap linear evals,
replacing the CUDA kernel's scattered backward), solve the damped 8-dim
least squares, apply the step, and adapt the LM lambda by comparing L1
losses. Monocular uses the fork's per-pixel residual; RGB-D stacks the
alpha-weighted RGB and (1-alpha)-weighted depth residuals (the fork left
RGB-D per-pixel unimplemented, slam_utils.py:220).

Best-loss caching (TempCamera, :28-53, :523-528) is a carried
(loss, T, exposure) tuple; with use_best_loss the best iterate is returned.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import losses, se3
from ..ops.sketch import SketchSpec, apply_sketch, damped_lstsq, make_sketch
from ..render import RenderConfig, build_tile_lists, render
from ..render.camera import Intrinsics
from ..render.renderer import GaussianArrays
from .frame import FrameData


class TrackConfig(NamedTuple):
    """Static tracking hyperparameters (Training.lr + Training.RGN)."""

    monocular: bool = True
    alpha: float = 0.95            # rgbd mix
    use_huber: bool = True
    huber_delta: float = 0.01
    pnorm: float = 1.0
    fo_max_iter: int = 40
    so_max_iter: int = 10
    lr_trans: float = 0.001
    lr_rot: float = 0.003
    lr_exposure_a: float = 0.01
    lr_exposure_b: float = 0.01
    fo_converged: float = 1e-4
    stack_dim: int = 16
    sketch_dim: int = 64
    initial_lambda: float = 0.001
    max_lambda: float = 1e7
    min_lambda: float = 1e-6
    increase_factor: float = 5.0
    decrease_factor: float = 5.0
    so_converged: float = 1e-5
    use_first_order_best: bool = True
    use_best_loss: bool = True
    # Frozen-tile-list fast path: bin once per phase with a pixel margin and
    # reuse the lists for every iteration (binning sorts cost several ms in
    # XLA; the camera moves only a few pixels within a frame). 0 disables —
    # the default, because frozen fo lists silently degrade if the pose moves
    # more than ~margin pixels within the fo phase; configs whose motion
    # regime fits (and the bench) opt in explicitly.
    bin_margin: float = 0.0
    rebin_before_so: bool = True
    rebin_so: bool = True     # rebuild exact lists inside the so loop
    # >0 (with rebin_so): only the first rebin_so_iters iterations
    # rebin; the rest reuse lists refined once at the post-jump pose (the
    # LM's big step happens in the first 1-3 iterations, after which the
    # pose moves far less than a pixel per iteration). 0 = rebin every iter;
    # measured 270 -> 248 ms/frame at equal pose error with 3.
    rebin_so_iters: int = 3
    # First-order tile subsampling (the reference's
    # Training.RGN.first_order.num_pixels knob, slam_frontend.py:250-257,
    # re-expressed tile-wise so the blend stays dense): optimize the photo-
    # metric loss over a fixed random subset of this fraction of the fine
    # tiles. The subset is drawn once per frame so the fo objective is
    # static (best-loss caching stays meaningful). 1.0 disables. Requires
    # bin_margin > 0. so_tile_frac subsamples the second-order sketched
    # system the same way (fast_so path only).
    fo_tile_frac: float = 1.0
    so_tile_frac: float = 1.0
    # Use the fused Pallas fo loss+gradient kernel when eligible (mono +
    # Huber + pallas_lists + fo tile subsampling): one kernel pass instead
    # of fwd kernel + XLA residual AD + bwd kernel. Numerics match the AD
    # path (test_fo_fused_grad_parity); escape hatch only.
    fo_fused: bool = True
    # Reuse the second-order phase's margin macro lists for the final
    # n_touched render (fine-stage refine at the final pose instead of a
    # full from-scratch rebinning). Exact per-tile selection; only the
    # macro membership is frozen at the so phase-start pose, which the
    # bin_margin already covers (test_refine_full_render_parity).
    final_refine: bool = True
    # Reuse the FIRST-ORDER margin build's macro lists for the second-order
    # phase instead of re-running the global binning at the post-fo pose
    # (build_tile_lists is a full preprocess of all N + global sort). The
    # fine stage still re-selects with current-pose geometry each refine
    # iteration; only macro-cell membership is frozen at the frame's seed
    # pose, which bin_margin covers for intra-frame motion (a few px).
    so_from_fo_aux: bool = False
    # Final n_touched render straight from the frozen full-image margin
    # lists (no per-tile fine refine at the final pose). Strict-first
    # priority selection makes margin lists blend-identical to exact lists
    # under truncation at the build pose; within-frame motion only perturbs
    # near-boundary rows, which n_touched/median-depth consumers
    # (keyframing heuristics) tolerate. Implies skipping final_refine.
    # PRECONDITION: only sound when the seed pose is within ~bin_margin px
    # of the final pose (constant-velocity or previous-frame seeding with
    # small per-frame motion — the bench regime); ignored (exact rebuild)
    # when so_max_iter == 0, where lists would be frozen at T_init across
    # the whole fo phase with no refine.
    final_reuse: bool = False
    # Plateau early-exit (0 disables): stop a phase once the best L1 has not
    # improved by a relative plateau_rtol for `patience` consecutive
    # iterations. The reference's update-norm criteria (fo_converged /
    # so_converged) essentially never fire — an Adam step is ~lr in
    # magnitude whenever gradients are alive, so every frame burns the full
    # iteration caps. best-loss caching makes the plateau exit safe: the
    # returned iterate is the best seen, not the last.
    fo_plateau_patience: int = 0
    fo_plateau_rtol: float = 1e-3
    fo_min_iter: int = 0
    so_plateau_patience: int = 0
    so_plateau_rtol: float = 1e-4
    # ATTRIBUTION-ONLY truncation of the frame program (scripts/
    # profile_track_fixed.py): "full" (default product behavior), or stop
    # after "build" (just the initial margin build: preprocess all N +
    # global sort), "lists" (build + subset gathers + gt tiling), "fo"
    # (first-order loop), "so" (second-order loop), or run everything but
    # the final render's counts kernel ("final_nc"). Early stages return a
    # TrackResult with zeroed images; each stage's outputs are forced live
    # so XLA cannot dead-code the truncated work. In-context prefix deltas
    # between consecutive stages decompose the frame's fixed cost the way
    # docs/mapping_r4_attribution.md decomposed the mapping iteration.
    stage: str = "full"


class TrackState(NamedTuple):
    i: jax.Array
    T: jax.Array           # [4,4] current pose (render pose)
    ea: jax.Array
    eb: jax.Array
    adam_m: jax.Array      # [8]
    adam_v: jax.Array      # [8]
    adam_t: jax.Array
    lam: jax.Array         # LM lambda (second order)
    prev_l1: jax.Array     # previous iteration's L1 scalar
    best_l1: jax.Array
    best_T: jax.Array
    best_ea: jax.Array
    best_eb: jax.Array
    converged: jax.Array
    key: jax.Array
    # per-iteration L1 history (phase-local; NaN beyond the iterations
    # actually run) — feeds the wall-clock-vs-error analysis plots
    # (processing/plot_wall_clock_time_vs_error.py; reference logs `losses`
    # per frame, slam_frontend.py:882-898)
    hist: jax.Array
    # iterations since best_l1 last improved significantly (plateau exit)
    since_best: jax.Array


class TrackResult(NamedTuple):
    T: jax.Array
    ea: jax.Array
    eb: jax.Array
    image: jax.Array
    depth: jax.Array
    opacity: jax.Array
    n_touched: jax.Array
    median_depth: jax.Array
    last_l1: jax.Array
    fo_iters: jax.Array
    so_iters: jax.Array
    fo_losses: jax.Array   # [fo_max_iter] per-iter L1 (NaN past fo_iters)
    so_losses: jax.Array   # [so_max_iter] per-iter L1 (NaN past so_iters)


def _residual(gauss, frame: FrameData, T, p8, intr, cfg, tcfg: TrackConfig,
              lists=None):
    """Per-pixel residual image(s) + raw L1 scalar at pose Exp(p8[:6]) @ T.

    Mono: r = opacity * mask * (exposure(image) - gt)  [3,H,W]
    RGBD: additionally the masked depth residual        [1,H,W]
    """
    out = render(gauss, T, intr, cfg, tau=p8[:6], lists=lists)
    r_rgb = losses.tracking_residual_rgb(
        out.image, frame.gt_image, out.opacity, frame.mapping_mask, p8[6], p8[7]
    )
    if tcfg.monocular:
        return r_rgb, None, out
    depth_mask = (frame.gt_depth > 0.01) & (out.opacity > 0.95)
    r_depth = jnp.where(depth_mask, out.depth - frame.gt_depth, 0.0)
    return r_rgb, r_depth, out


def _fo_loss(gauss, frame, T, p8, intr, cfg, tcfg: TrackConfig, lists=None):
    """First-order tracking objective (slam_frontend.py:596-600)."""
    r_rgb, r_depth, out = _residual(gauss, frame, T, p8, intr, cfg, tcfg, lists)
    if tcfg.use_huber:
        r_rgb = losses.huber_signed(r_rgb, tcfg.huber_delta)
        loss = jnp.sqrt(jnp.sum(r_rgb * r_rgb) + 1e-20)
    else:
        loss = jnp.sum(jnp.abs(r_rgb) ** tcfg.pnorm) ** (1.0 / tcfg.pnorm)
    if not tcfg.monocular:
        # alpha-weighted rgbd mix as in the scalar loss (slam_utils.py:103-113)
        m = r_rgb.size
        loss = tcfg.alpha * loss + (1 - tcfg.alpha) * jnp.sqrt(
            jnp.sum(r_depth * r_depth) * (m / r_depth.size) + 1e-20
        )
    l1 = jnp.sum(jnp.abs(r_rgb))
    return loss, (l1, out)


def _sketched_Sf(gauss, frame, T, p8, sketch: SketchSpec, intr, cfg, tcfg,
                 lists=None):
    """Bucketed residual sums Sf(p8) (slam_frontend.py:637-649), plus the
    raw L1 scalar (shares the render with Sf so each second-order iteration
    pays one primal render, not two)."""
    r_rgb, r_depth, _ = _residual(gauss, frame, T, p8, intr, cfg, tcfg, lists)
    l1 = jnp.sum(jnp.abs(r_rgb))
    if tcfg.use_huber:
        r_rgb = losses.huber_signed(r_rgb, tcfg.huber_delta)
        if r_depth is not None:
            r_depth = losses.huber_signed(r_depth, tcfg.huber_delta)
    r2 = jnp.sum(r_rgb, axis=0)  # channel sum (:640)
    if r_depth is not None:
        r2 = tcfg.alpha * r2 + (1 - tcfg.alpha) * r_depth[0]
    m = r2.size
    d = sketch.d
    r2 = r2 * (d / m)            # scale by d/m (:640)
    return apply_sketch(r2.reshape(-1), sketch), l1


def _fo_loss_tiles(gauss, T, p8, intr, cfg, tcfg: TrackConfig,
                   lists_sub, tx0s, ty0s, gt_t, mask_t, gtd_t, scale):
    """First-order objective over a tile subset (see TrackConfig.fo_tile_frac).

    gt_t/mask_t: [S,P,3]/[S,P,1] tiled ground truth; gtd_t: [S,P,1] or None.
    Semantics match _fo_loss with bg=0: r = acc * M * (exposure(color) - gt).
    `scale` (n_fine/n_sub) makes the returned l1 an unbiased estimate of the
    full-image L1 so best-loss caching stays comparable with the so phase.
    """
    from ..render.renderer import render_tiles

    col, dep, acc = render_tiles(
        gauss, T, intr, cfg, lists_sub, tx0s, ty0s, tau=p8[:6]
    )
    e = jnp.abs(p8[6]) + losses.EXPOSURE_EPS
    r = acc[..., None] * mask_t * ((e * col + p8[7]) - gt_t)    # [S,P,3]
    l1 = jnp.sum(jnp.abs(r)) * scale
    if tcfg.use_huber:
        r = losses.huber_signed(r, tcfg.huber_delta)
        loss = jnp.sqrt(jnp.sum(r * r) + 1e-20)
    else:
        loss = jnp.sum(jnp.abs(r) ** tcfg.pnorm) ** (1.0 / tcfg.pnorm)
    if not tcfg.monocular:
        depth_mask = (gtd_t > 0.01) & (acc[..., None] > 0.95)
        r_d = jnp.where(depth_mask, dep[..., None] - gtd_t, 0.0)
        m = r.size
        loss = tcfg.alpha * loss + (1 - tcfg.alpha) * jnp.sqrt(
            jnp.sum(r_d * r_d) * (m / r_d.size) + 1e-20
        )
    return loss, l1


def _huber_chain(r, delta):
    """(hub, slope): signed sqrt-Huber value and its elementwise d/dr."""
    ax = jnp.abs(r)
    safe = jnp.sqrt(jnp.maximum(2.0 * delta * ax - delta * delta, 1e-20))
    hub = jnp.where(ax < delta, r, jnp.sign(r) * safe)
    slope = jnp.where(ax < delta, 1.0, delta / safe)
    return hub, slope


def _so_fast_step(gauss, gt_t, mask_t, T, ea, eb, sketch, intr, cfg, tcfg,
                  lists_sub, txs, tys, scale=1.0, gtd_t=None):
    """(Sf, SJ, l1) via the fused forward-mode pallas kernel.

    Replaces jax.linearize + 8 re-linearized evaluations with ONE pass that
    renders the primal and all 6 pose tangents together
    (render_pose_jvp_tiles); the exposure columns are chained analytically
    (r = opa*M*((|ea|+eps)*img + eb - gt), so dr/dea = opa*M*img*sign(ea),
    dr/deb = opa*M — slam_utils.py:115-185 semantics).

    Everything stays in TILE SPACE: gt_t/mask_t are the (subset) tiled
    ground truth [S,P,3]/[S,P,1] and the sketch is drawn over the S*P subset
    pixels — no full-image assembly, scatter-back, or m-sized gathers. With
    tile subsampling (TrackConfig.so_tile_frac) the d/m_sub bucket scaling
    equals the reference's d/m times the 1/frac unbiasing factor, so the LM
    lambda semantics are unchanged; l1 is scaled by 1/frac for cross-phase
    best-loss comparability.

    RGB-D (gtd_t [S,P,1]): the bucketed residual mixes the channel-summed
    Huber RGB rows with the masked Huber depth rows by tcfg.alpha —
    _sketched_Sf semantics (the reference fork left the RGB-D per-pixel
    path NotImplementedError, slam_utils.py:220); depth tangents come from
    the same kernel pass (touts depth column), and the depth mask's
    opacity gate is a constant w.r.t. the tangents, matching autodiff
    through jnp.where."""
    from ..render.renderer import render_pose_jvp_tiles

    outs, touts = render_pose_jvp_tiles(gauss, T, intr, cfg, lists_sub,
                                        txs, tys)
    img = outs[..., :3]                                  # [S, P, 3] (bg=0)
    opa = outs[..., 4:5]                                 # [S, P, 1]
    e = jnp.abs(ea) + losses.EXPOSURE_EPS
    diff = (e * img + eb) - gt_t
    r = opa * mask_t * diff
    l1 = jnp.sum(jnp.abs(r)) * scale
    if tcfg.use_huber:
        hub, slope = _huber_chain(r, tcfg.huber_delta)
    else:
        hub = r
        slope = jnp.ones_like(r)
    d_over_m = sketch.d / (sketch.d * sketch.chunk)      # = d / m_sub

    img_t = touts[..., :3]                               # [S, 6, P, 3]
    opa_t = touts[..., 4:5]                              # [S, 6, P, 1]
    cols = [
        mask_t * (_ax6(opa_t, k) * diff + opa * e * _ax6(img_t, k))
        for k in range(6)
    ] + [
        opa * mask_t * img * jnp.sign(ea),
        jnp.broadcast_to(opa * mask_t, r.shape),
    ]

    r2 = jnp.sum(hub, axis=-1)                           # [S, P] channel sum
    col_sums = [jnp.sum(slope * c, axis=-1) for c in cols]

    if gtd_t is not None:
        dep = outs[..., 3:4]                             # [S, P, 1]
        dep_t = touts[..., 3:4]                          # [S, 6, P, 1]
        depth_mask = (gtd_t > 0.01) & (opa > 0.95)
        r_d = jnp.where(depth_mask, dep - gtd_t, 0.0)
        if tcfg.use_huber:
            hub_d, slope_d = _huber_chain(r_d, tcfg.huber_delta)
        else:
            hub_d, slope_d = r_d, jnp.ones_like(r_d)
        a = tcfg.alpha
        r2 = a * r2 + (1 - a) * hub_d[..., 0]
        dmask_slope = jnp.where(depth_mask, slope_d, 0.0)
        col_sums = [
            a * cs + (1 - a) * (dmask_slope * _ax6(dep_t, k))[..., 0]
            for k, cs in enumerate(col_sums[:6])
        ] + [a * cs for cs in col_sums[6:]]              # depth: no exposure

    Sf = apply_sketch((r2 * d_over_m).reshape(-1), sketch)
    SJ = jnp.stack(
        [apply_sketch((cs * d_over_m).reshape(-1), sketch)
         for cs in col_sums],
        axis=1,
    )
    return Sf, SJ, l1


def _ax6(x, k):
    """x[:, k] for the tangent axis of [S, 6, P, C]."""
    return x[:, k]


@functools.partial(jax.jit, static_argnames=("intr", "cfg", "tcfg"))
def track_frame(
    gauss: GaussianArrays,
    frame: FrameData,
    T_init,
    ea_init,
    eb_init,
    key,
    intr: Intrinsics,
    cfg: RenderConfig,
    tcfg: TrackConfig,
) -> TrackResult:
    lr8 = jnp.array(
        [tcfg.lr_trans] * 3
        + [tcfg.lr_rot] * 3
        + [tcfg.lr_exposure_a, tcfg.lr_exposure_b],
        jnp.float32,
    )
    big = jnp.float32(jnp.inf)
    cfg_track = cfg._replace(with_n_touched=False)

    def _trunc(live, T_, ea_, eb_, fo_it, so_it, fo_h, so_h):
        """Zeroed TrackResult for the attribution-only truncated stages
        (TrackConfig.stage); `live` keeps the truncated work un-DCE-able."""
        n = gauss.xyz.shape[0]
        z1 = jnp.zeros((1, intr.height, intr.width))
        return TrackResult(
            T=T_, ea=ea_, eb=eb_,
            image=jnp.zeros((3, intr.height, intr.width)),
            depth=z1, opacity=z1,
            n_touched=jnp.zeros((n,), jnp.int32),
            median_depth=jnp.float32(live),
            last_l1=jnp.float32(live), fo_iters=fo_it, so_iters=so_it,
            fo_losses=fo_h, so_losses=so_h,
        )

    def p0(ea, eb):
        return jnp.concatenate([jnp.zeros(6), ea[None], eb[None]])

    use_lists = tcfg.bin_margin > 0
    fo_aux = None
    if use_lists and tcfg.so_from_fo_aux:
        lists_fo, fo_aux = build_tile_lists(
            gauss, T_init, intr, cfg_track, margin=tcfg.bin_margin,
            with_aux=True,
        )
    elif use_lists:
        lists_fo = build_tile_lists(
            gauss, T_init, intr, cfg_track, margin=tcfg.bin_margin
        )
    else:
        lists_fo = None

    if tcfg.stage == "build":
        live = (jnp.sum(lists_fo.idx).astype(jnp.float32)
                if use_lists else jnp.float32(0.0))
        if fo_aux is not None:
            live = live + jnp.sum(fo_aux.sel_m).astype(jnp.float32)
        return _trunc(
            live, T_init, ea_init, eb_init, jnp.int32(0), jnp.int32(0),
            jnp.full((tcfg.fo_max_iter,), jnp.nan, jnp.float32),
            jnp.zeros((0,), jnp.float32),
        )

    fo_sub = use_lists and tcfg.fo_tile_frac < 1.0 and tcfg.fo_max_iter > 0
    if fo_sub:
        from ..render.renderer import TileLists, _tile_origins, tile_images

        tx0f, ty0f = _tile_origins(intr, cfg_track)
        n_fine = tx0f.shape[0]
        n_sub = max(8, int(n_fine * tcfg.fo_tile_frac) // 8 * 8)
        key, ksub = jax.random.split(key)
        tsel = jax.random.permutation(ksub, n_fine)[:n_sub]
        lists_sub = TileLists(idx=lists_fo.idx[tsel], vld=lists_fo.vld[tsel])
        tx0s, ty0s = tx0f[tsel], ty0f[tsel]
        gt_t = tile_images(frame.gt_image, intr, cfg_track)[tsel]
        mask_t = tile_images(frame.mapping_mask, intr, cfg_track)[tsel]
        gtd_t = (
            tile_images(frame.gt_depth, intr, cfg_track)[tsel]
            if not tcfg.monocular else None
        )
        sub_scale = n_fine / n_sub

    # fused loss+gradient kernel: eligible for the Huber objective on the
    # pallas_lists subset path, mono AND RGB-D (the RGB-D variant carries
    # both globally-normalized reverse chains in one kernel pass —
    # render_fo_grad_tiles)
    fo_fused = (
        fo_sub
        and tcfg.fo_fused
        and tcfg.use_huber
        and cfg_track.backend == "pallas_lists"
    )

    if tcfg.stage == "lists":
        live = (jnp.sum(lists_fo.idx).astype(jnp.float32)
                if use_lists else jnp.float32(0.0))
        if fo_sub:
            live = live + jnp.sum(gt_t) + jnp.sum(
                lists_sub.idx
            ).astype(jnp.float32) + jnp.sum(tx0s)
        return _trunc(
            live, T_init, ea_init, eb_init, jnp.int32(0), jnp.int32(0),
            jnp.full((tcfg.fo_max_iter,), jnp.nan, jnp.float32),
            jnp.zeros((0,), jnp.float32),
        )

    # ---------------- phase 1: first-order Adam ----------------
    def fo_cond(s: TrackState):
        return (s.i < tcfg.fo_max_iter) & jnp.logical_not(s.converged)

    def fo_body(s: TrackState):
        if fo_fused:
            from ..render.renderer import render_fo_grad_tiles

            p = p0(s.ea, s.eb)
            loss, l1, g = render_fo_grad_tiles(
                gauss, s.T, intr, cfg_track, lists_sub, tx0s, ty0s,
                p[:6], p[6], p[7], gt_t, mask_t,
                tcfg.use_huber, tcfg.huber_delta,
                gtd_t=gtd_t if not tcfg.monocular else None,
                alpha=tcfg.alpha,
            )
            l1 = l1 * sub_scale
        elif fo_sub:
            (loss, l1), g = jax.value_and_grad(
                lambda p: _fo_loss_tiles(
                    gauss, s.T, p, intr, cfg_track, tcfg, lists_sub,
                    tx0s, ty0s, gt_t, mask_t, gtd_t, sub_scale,
                ),
                has_aux=True,
            )(p0(s.ea, s.eb))
        else:
            (loss, (l1, _)), g = jax.value_and_grad(
                lambda p: _fo_loss(
                    gauss, frame, s.T, p, intr, cfg_track, tcfg, lists_fo
                ),
                has_aux=True,
            )(p0(s.ea, s.eb))
        better = l1 < s.best_l1
        best_l1 = jnp.where(better, l1, s.best_l1)
        best_T = jnp.where(better, s.T, s.best_T)
        best_ea = jnp.where(better, s.ea, s.best_ea)
        best_eb = jnp.where(better, s.eb, s.best_eb)
        t = s.adam_t + 1
        m = 0.9 * s.adam_m + 0.1 * g
        v = 0.999 * s.adam_v + 0.001 * g * g
        mh = m / (1 - 0.9 ** t)
        vh = v / (1 - 0.999 ** t)
        d = -lr8 * mh / (jnp.sqrt(vh) + 1e-8)
        T = se3.retract(s.T, d[:6])
        converged = jnp.sum(d[:6] * d[:6]) < tcfg.fo_converged**2
        since_best = s.since_best
        if tcfg.fo_plateau_patience > 0:
            sig = l1 < s.best_l1 * (1.0 - tcfg.fo_plateau_rtol)
            since_best = jnp.where(sig, 0, s.since_best + 1)
            converged = converged | (
                (since_best >= tcfg.fo_plateau_patience)
                & (s.i + 1 >= tcfg.fo_min_iter)
            )
        return s._replace(
            i=s.i + 1, T=T, ea=s.ea + d[6], eb=s.eb + d[7],
            adam_m=m, adam_v=v, adam_t=t,
            prev_l1=l1, best_l1=best_l1, best_T=best_T,
            best_ea=best_ea, best_eb=best_eb, converged=converged,
            hist=s.hist.at[s.i].set(l1),
            since_best=since_best,
        )

    s = TrackState(
        i=jnp.int32(0), T=T_init, ea=ea_init, eb=eb_init,
        adam_m=jnp.zeros(8), adam_v=jnp.zeros(8), adam_t=jnp.float32(0),
        lam=jnp.float32(tcfg.initial_lambda), prev_l1=big,
        best_l1=big, best_T=T_init, best_ea=ea_init, best_eb=eb_init,
        converged=jnp.asarray(False), key=key,
        hist=jnp.full((tcfg.fo_max_iter,), jnp.nan, jnp.float32),
        since_best=jnp.int32(0),
    )
    if tcfg.fo_max_iter > 0:
        s = jax.lax.while_loop(fo_cond, fo_body, s)
    fo_iters = s.i
    fo_losses = s.hist

    if tcfg.stage == "fo":
        return _trunc(
            s.best_l1 + jnp.sum(s.T), s.T, s.ea, s.eb, fo_iters,
            jnp.int32(0), fo_losses, jnp.zeros((0,), jnp.float32),
        )

    # ---------------- phase 2: sketched Gauss-Newton / LM ----------------
    if tcfg.so_max_iter > 0:
        if tcfg.use_first_order_best:
            # adopt the first-order best before second order (:465-470)
            s = s._replace(T=s.best_T, ea=s.best_ea, eb=s.best_eb)
        m_pix = frame.gt_image.shape[1] * frame.gt_image.shape[2]
        so_aux = None
        if use_lists and tcfg.so_from_fo_aux and fo_aux is not None:
            # macro lists frozen at the seed pose; the refine loop below
            # re-selects the fine stage at the current pose each iteration
            lists_so, so_aux = lists_fo, fo_aux
        elif use_lists and tcfg.rebin_before_so:
            lists_so, so_aux = build_tile_lists(
                gauss, s.T, intr, cfg_track, margin=tcfg.bin_margin,
                with_aux=True,
            )
        else:
            lists_so = lists_fo

        if tcfg.stage == "so_prep":
            # truncate after the so-phase list rebuild (attribution only)
            live = jnp.sum(lists_so.idx).astype(jnp.float32)
            if so_aux is not None:
                live = live + jnp.sum(so_aux.sel_m).astype(jnp.float32)
            return _trunc(
                live + s.best_l1, s.T, s.ea, s.eb, fo_iters, jnp.int32(0),
                fo_losses, jnp.zeros((0,), jnp.float32),
            )

        def so_cond(s: TrackState):
            return (s.i < tcfg.so_max_iter) & jnp.logical_not(s.converged)

        # fused forward-mode path: pallas JVP kernel shares one primal
        # across all pose tangents (mono + RGB-D)
        fast_so = (
            cfg_track.backend == "pallas_lists"
            and use_lists
        )
        so_tsel, so_scale = None, 1.0
        if fast_so:
            from ..render.renderer import (
                TileLists, _tile_origins, tile_images,
            )

            tx0f, ty0f = _tile_origins(intr, cfg_track)
            n_fine_so = tx0f.shape[0]
            if tcfg.so_tile_frac < 1.0:
                n_sub_so = max(8, int(n_fine_so * tcfg.so_tile_frac) // 8 * 8)
                kso = jax.random.fold_in(key, 1)
                so_tsel = jax.random.permutation(kso, n_fine_so)[:n_sub_so]
                so_scale = n_fine_so / n_sub_so
                so_txs, so_tys = tx0f[so_tsel], ty0f[so_tsel]
            else:
                n_sub_so = n_fine_so
                so_txs, so_tys = tx0f, ty0f
            # tile-space ground truth for the subset; the sketch is drawn
            # over the subset's pixels (see _so_fast_step)
            gt_t_so = tile_images(frame.gt_image, intr, cfg_track)
            mask_t_so = tile_images(frame.mapping_mask, intr, cfg_track)
            gtd_t_so = (
                tile_images(frame.gt_depth, intr, cfg_track)
                if not tcfg.monocular else None
            )
            if so_tsel is not None:
                gt_t_so = gt_t_so[so_tsel]
                mask_t_so = mask_t_so[so_tsel]
                if gtd_t_so is not None:
                    gtd_t_so = gtd_t_so[so_tsel]
            p_pix = cfg_track.tile * cfg_track.tile
            m_sketch = n_sub_so * p_pix
        else:
            m_sketch = m_pix

        if fast_so:
            from ..render.renderer import refine_fine_lists

            tsel_it = (
                so_tsel if so_tsel is not None
                else jnp.arange(n_fine_so, dtype=jnp.int32)
            )
            can_refine = use_lists and tcfg.rebin_so and (
                so_aux is not None
            )

            def refine_at(T):
                # FINE-stage rebinning at the given pose against the
                # phase-start margin macro lists: exact per-tile selection
                # (removes the stale-lists bias the LM would otherwise
                # converge to, 5.5 -> ~3.7 mm) while reusing the expensive
                # macro sort
                return refine_fine_lists(
                    gauss, T, intr, cfg_track, so_aux, tsel_it
                )

            if so_tsel is not None:
                lists_frozen0 = TileLists(idx=lists_so.idx[so_tsel],
                                          vld=lists_so.vld[so_tsel])
            else:
                lists_frozen0 = lists_so

        def make_so_body(lists_provider):
            return lambda s: so_step(s, lists_provider)

        def so_step(s: TrackState, lists_provider):
            key, k1 = jax.random.split(s.key)
            sketch = make_sketch(k1, m_sketch, tcfg.stack_dim, tcfg.sketch_dim)

            if fast_so:
                lists_it = lists_provider(s)
                Sf, SJ, l1 = _so_fast_step(
                    gauss, gt_t_so, mask_t_so, s.T, s.ea, s.eb, sketch, intr,
                    cfg_track, tcfg, lists_it, so_txs, so_tys,
                    scale=so_scale, gtd_t=gtd_t_so,
                )
            else:
                del lists_provider
                if use_lists and tcfg.rebin_so:
                    lists_it = build_tile_lists(gauss, s.T, intr, cfg_track)
                else:
                    lists_it = lists_so
                p = p0(s.ea, s.eb)
                # one primal render yields both Sf and the raw L1 (for
                # lambda adaptation + best cache)
                (Sf, l1), jvp = jax.linearize(
                    lambda q: _sketched_Sf(
                        gauss, frame, s.T, q, sketch, intr, cfg_track, tcfg,
                        lists_it,
                    ),
                    p,
                )
                # evaluate the 8 tangent directions in pairs of 4 (a fully
                # vmapped JVP multiplies the blend's transient memory by 8,
                # which OOMs at full resolution)
                SJ = jax.lax.map(
                    lambda e: jvp(e)[0], jnp.eye(8), batch_size=4
                ).T  # [d, 8]
            lam = jnp.where(
                l1 < s.prev_l1,
                jnp.maximum(s.lam / tcfg.decrease_factor, tcfg.min_lambda),
                jnp.minimum(s.lam * tcfg.increase_factor, tcfg.max_lambda),
            )
            better = l1 < s.best_l1
            best_l1 = jnp.where(better, l1, s.best_l1)
            best_T = jnp.where(better, s.T, s.best_T)
            best_ea = jnp.where(better, s.ea, s.best_ea)
            best_eb = jnp.where(better, s.eb, s.best_eb)
            x = damped_lstsq(SJ, Sf, lam)

            T = se3.retract(s.T, x[:6])
            converged = jnp.linalg.norm(x) < tcfg.so_converged
            since_best = s.since_best
            if tcfg.so_plateau_patience > 0:
                sig = l1 < s.best_l1 * (1.0 - tcfg.so_plateau_rtol)
                since_best = jnp.where(sig, 0, s.since_best + 1)
                converged = converged | (
                    since_best >= tcfg.so_plateau_patience
                )
            return s._replace(
                i=s.i + 1, T=T, ea=s.ea + x[6], eb=s.eb + x[7],
                lam=lam, prev_l1=l1, best_l1=best_l1, best_T=best_T,
                best_ea=best_ea, best_eb=best_eb, converged=converged,
                key=key,
                hist=s.hist.at[s.i].set(l1),
                since_best=since_best,
            )

        s = s._replace(
            i=jnp.int32(0), prev_l1=big, converged=jnp.asarray(False),
            hist=jnp.full((tcfg.so_max_iter,), jnp.nan, jnp.float32),
            since_best=jnp.int32(0),
        )
        if fast_so and can_refine and tcfg.rebin_so_iters > 0:
            k_rebin = min(tcfg.rebin_so_iters, tcfg.so_max_iter)

            def condA(s):
                return (s.i < k_rebin) & jnp.logical_not(s.converged)

            s = jax.lax.while_loop(
                condA, make_so_body(lambda s: refine_at(s.T)), s
            )
            lists_fixed = refine_at(s.T)
            s = jax.lax.while_loop(
                so_cond, make_so_body(lambda _: lists_fixed), s
            )
        elif fast_so and can_refine:
            s = jax.lax.while_loop(
                so_cond, make_so_body(lambda s: refine_at(s.T)), s
            )
        elif fast_so:
            s = jax.lax.while_loop(
                so_cond, make_so_body(lambda _: lists_frozen0), s
            )
        else:
            s = jax.lax.while_loop(so_cond, make_so_body(None), s)
    so_iters = s.i if tcfg.so_max_iter > 0 else jnp.int32(0)
    so_losses = (
        s.hist if tcfg.so_max_iter > 0
        else jnp.zeros((0,), jnp.float32)
    )

    if tcfg.stage == "so":
        return _trunc(
            s.best_l1 + jnp.sum(s.T), s.T, s.ea, s.eb, fo_iters, so_iters,
            fo_losses, so_losses,
        )

    if tcfg.use_best_loss:
        T, ea, eb = s.best_T, s.best_ea, s.best_eb
        last_l1 = s.best_l1
    else:
        T, ea, eb = s.T, s.ea, s.eb
        last_l1 = s.prev_l1

    # final render with n_touched for keyframing / visibility (:1918) and
    # median depth (:900); with the fast path active, skip its from-scratch
    # global binning by refining the so phase's frozen margin macro lists
    # at the final pose (see TrackConfig.final_refine)
    final_lists = None
    if tcfg.final_reuse and use_lists and tcfg.so_max_iter > 0:
        # frozen full-image margin lists straight through (see
        # TrackConfig.final_reuse); render() re-masks against current-pose
        # validity (vld_f = lists.vld & prep.valid[lists.idx]). fo-only
        # configs (so_max_iter == 0) fall through to the exact rebuild:
        # lists_fo would be frozen at T_init with up to fo_max_iter
        # first-order iterations of motion and no refine at all — the
        # weakest combination of the flag, so it is unsupported.
        final_lists = lists_so
    elif (
        tcfg.final_refine
        and tcfg.so_max_iter > 0
        and fast_so
        and so_aux is not None
    ):
        from ..render.renderer import refine_fine_lists as _refine

        final_lists = _refine(
            gauss, T, intr, cfg_track, so_aux,
            jnp.arange(n_fine_so, dtype=jnp.int32),
        )
    cfg_final = (
        cfg._replace(with_n_touched=False) if tcfg.stage == "final_nc"
        else cfg
    )
    out = render(gauss, T, intr, cfg_final, lists=final_lists)
    median_depth = losses.get_median_depth(out.depth, out.opacity)
    return TrackResult(
        T=T, ea=ea, eb=eb,
        image=out.image, depth=out.depth, opacity=out.opacity,
        n_touched=out.n_touched, median_depth=median_depth,
        last_l1=last_l1, fo_iters=fo_iters, so_iters=so_iters,
        fo_losses=fo_losses, so_losses=so_losses,
    )
