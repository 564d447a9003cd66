"""The differentiable Gaussian-splat renderer, TPU-first.

Replaces the reference's CUDA `diff-gaussian-rasterization-w-pose` extension
(called from /root/reference/gaussian_splatting/gaussian_renderer/__init__.py:
25-180). Outputs match that kernel: rendered RGB [3,H,W], expected depth
[1,H,W], accumulated opacity [1,H,W], per-Gaussian screen radii, and
per-Gaussian touched-pixel counts (n_touched) — and, through JAX autodiff,
gradients w.r.t. every Gaussian parameter, the screen-space means (for
densification stats) and the 6-dim SE(3) camera tangent + exposure (the
"-w-pose" extension comes for free from differentiating through
T = Exp(tau) @ T_base).

Pipeline (all static shapes, one jit):
  1. preprocess        — dense [N] projection/EWA math on the VPU
  2. global depth sort — jax.lax argsort once; per-tile order is then
                         automatically front-to-back
  3. macro binning     — per macro tile (macro_tiles x tile pixels),
                         gather-only compaction of overlapping Gaussians via
                         one lax.sort of masked indices (compact_sort)
  4. fine blend        — per 16px tile, compaction again, then a dense
                         [K, P] alpha matrix via an MXU matmul, exclusive
                         blocked-cumprod transmittance, and the weighted
                         color/depth/alpha reduction as one [P,K]x[K,5]
                         matmul
The alpha-compositing recurrence is reformulated as an associative scan
(cumprod), which is the key to TPU-native rasterization: no sequential
per-pixel loops, no scatters, no dynamic shapes.

Blend semantics are bit-faithful to the CUDA kernel: alpha clamp at 0.99,
skip below 1/255, termination when transmittance would drop below 1e-4
(monotonicity of T makes the dense masked formulation exactly equivalent to
the sequential early-exit — see blend() notes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import se3
from ..ops.scan import blocked_cumprod_excl
from .camera import Intrinsics
from .primitives import preprocess
from .tiling import compact_sort, macro_instance_bin

_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4

# packed feature column layout (padded to 16 columns for layout-friendly
# row gathers; _LOGO = log opacity precomputed for the factorized blend)
_U, _V, _CA, _CB, _CC, _OPA, _R0, _G0, _B0, _Z, _RAD, _LOGO = range(12)
_F = 16


class GaussianArrays(NamedTuple):
    """Render-facing SoA view of the map (fixed capacity N)."""

    xyz: jax.Array        # [N, 3]
    sh: jax.Array         # [N, K, 3] SH coefficients, K = (deg+1)^2
    log_scale: jax.Array  # [N, 3]
    quat: jax.Array       # [N, 4] (w, x, y, z), unnormalized
    opa_logit: jax.Array  # [N, 1]
    active: jax.Array     # [N] bool


class RenderConfig(NamedTuple):
    tile: int = 16          # fine tile side in pixels
    macro_tiles: int = 8    # fine tiles per macro tile side (macro = 128 px)
    k_macro: int = 4096     # per-macro-tile Gaussian capacity
    k_fine: int = 512       # per-fine-tile Gaussian capacity
    sh_degree: int = 0
    near: float = 0.2
    macro_chunk: int = 0    # >0: process macro tiles in chunks of this size
    with_n_touched: bool = True
    fine_mode: str = "sort"  # legacy knob, ignored (kept for config compat)
    backend: str = "xla"    # "xla" | "pallas" | "pallas_compact"
    pallas_interpret: bool = False  # interpreter mode (CPU tests)
    span_cap: int = 16      # macro-rect instances per Gaussian (see tiling)
    k_big: int = 128        # exact sidecar capacity for span>span_cap splats

    @property
    def macro_px(self) -> int:
        return self.tile * self.macro_tiles


class RenderResult(NamedTuple):
    image: jax.Array       # [3, H, W]
    depth: jax.Array       # [1, H, W]
    opacity: jax.Array     # [1, H, W] accumulated alpha
    radii: jax.Array       # [N] float (0 = culled)
    n_touched: jax.Array   # [N] int32 (zeros if with_n_touched=False)

    @property
    def visibility_filter(self):
        return self.radii > 0


def _pack(prep):
    cols = [
        prep.mean2d[:, 0],
        prep.mean2d[:, 1],
        prep.conic[:, 0],
        prep.conic[:, 1],
        prep.conic[:, 2],
        prep.opacity,
        prep.rgb[:, 0],
        prep.rgb[:, 1],
        prep.rgb[:, 2],
        prep.z,
        prep.radius,
        jnp.log(jnp.maximum(prep.opacity, 1e-12)),
    ]
    cols += [jnp.zeros_like(prep.z)] * (_F - len(cols))
    return jnp.stack(cols, axis=-1)


def _pixel_basis(px_local, py_local):
    """[6, P] per-tile pixel polynomial basis for the factorized log-alpha
    matmul (shared by every tile since it uses tile-local coordinates)."""
    return jnp.stack(
        [
            px_local * px_local,
            px_local * py_local,
            py_local * py_local,
            px_local,
            py_local,
            jnp.ones_like(px_local),
        ],
        axis=0,
    )


def _blend(data, vld, tx0, ty0, pmat, bg, pix_ok):
    """Dense front-to-back composite of a depth-ordered Gaussian list.

    data: [K, F] packed features (depth-ascending), vld: [K] bool,
    tx0/ty0: tile origin (pixels), pmat: [6, P] pixel basis, bg: [3].
    Returns color [P,3], depth [P], acc_alpha [P], contrib [K,P] bool.

    TPU-first formulation: the per-pixel log-alpha s = -0.5*q + log(opacity)
    is a bilinear form in per-Gaussian coefficients and the pixel polynomial
    basis, i.e. ONE [K,6]x[6,P] MXU matmul per tile instead of K*P scalar
    quadratic evaluations. Tile-local coordinates keep the expansion well
    conditioned in float32. The transmittance recurrence is an associative
    scan (blocked exclusive cumprod), and the color/depth/alpha reduction is
    a single [P,K]x[K,5] matmul.

    Equivalence to the sequential CUDA loop: our running transmittance
    includes every alpha that passed the 1/255 test, so once
    T_excl*(1-alpha) falls below 1e-4 it stays below for all later entries —
    exactly the sticky `done` flag of the CUDA kernel, with identical weights
    for every gaussian composited before termination.
    """
    ul = data[:, _U] - tx0
    vl = data[:, _V] - ty0
    a = data[:, _CA]
    b = data[:, _CB]
    c = data[:, _CC]
    log_opa = data[:, _LOGO]
    G = jnp.stack(
        [
            -0.5 * a,
            -b,
            -0.5 * c,
            a * ul + b * vl,
            b * ul + c * vl,
            -0.5 * (a * ul * ul + 2.0 * b * ul * vl + c * vl * vl) + log_opa,
        ],
        axis=-1,
    )  # [K, 6]
    # full f32 matmul: the TPU default bf16 passes would quantize log-alpha
    # by ~1e-2 (visible banding + wrong gradients)
    s = jnp.dot(
        G, pmat, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [K, P]
    alpha = jnp.minimum(0.99, jnp.exp(jnp.minimum(s, 2.0)))
    # s <= log_opa  <=>  power <= 0 (the CUDA degenerate-conic guard); the
    # 1e-4 slack absorbs factorized-matmul rounding at the gaussian center
    ok = (
        vld[:, None]
        & pix_ok[None, :]
        & (s <= log_opa[:, None] + 1e-4)
        & (alpha >= _ALPHA_MIN)
    )
    alpha = jnp.where(ok, alpha, 0.0)
    one_minus = 1.0 - alpha
    import math as _math

    blk = _math.gcd(one_minus.shape[0], 16)
    t_excl, t_incl = blocked_cumprod_excl(one_minus, axis=0, block=blk)
    contrib = ok & (t_excl * one_minus >= _T_EPS)
    w = jnp.where(contrib, alpha * t_excl, 0.0)  # [K, P]
    feats = jnp.stack(
        [
            data[:, _R0],
            data[:, _G0],
            data[:, _B0],
            data[:, _Z],
            jnp.ones_like(ul),
        ],
        axis=-1,
    )  # [K, 5]
    outs = jnp.einsum(
        "kp,kf->pf", w, feats,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # one [P,K]x[K,5] matmul
    color = outs[:, :3]
    depth = outs[:, 3]
    acc_alpha = outs[:, 4]
    color = color + (1.0 - acc_alpha)[:, None] * bg[None, :]
    return color, depth, acc_alpha, contrib


class TileLists(NamedTuple):
    """Frozen per-fine-tile Gaussian lists (the binning result).

    idx: [n_fine_tiles, k_fine] int32 ORIGINAL Gaussian indices, front-to-back
    (depth order at the pose the lists were built at); vld: same-shape bool.
    Build once per frame with `build_tile_lists(margin=...)` and reuse across
    tracking iterations — the TPU-native replacement for the CUDA kernel's
    per-call tile binning, whose sort is cheap on a GPU but costs several ms
    per call in XLA. A pixel `margin` inflates the overlap test so the lists
    stay conservative while the camera moves < margin pixels.
    """

    idx: jax.Array
    vld: jax.Array


class _BinAux(NamedTuple):
    order: jax.Array    # [N] depth-ascending permutation
    sel_m: jax.Array    # [Tm, Km] rank-space macro lists
    vld_m: jax.Array
    x0m: jax.Array      # [Tm] macro origins (pixels)
    y0m: jax.Array
    # splats whose strict macro span overflowed span_cap after the k_big
    # sidecar filled (coverage possibly lost; see tiling.macro_instance_bin)
    n_overflow: jax.Array


def _make_lists(u, v, rad, valid, z, intr: Intrinsics, cfg: RenderConfig,
                margin: float = 0.0, tsel=None):
    """Index-space binning pipeline (non-differentiable; caller passes
    stop_gradient'ed geometry). u/v/rad/valid/z: UNSORTED [N].

    With `tsel` ([S] fine-tile indices) the fine stage runs only for those
    tiles (the macro stage is global regardless) and the returned lists have
    S rows in tsel order."""
    n = u.shape[0]
    tile = cfg.tile
    mpx = cfg.macro_px
    W, H = intr.width, intr.height
    n_mx = -(-W // mpx)
    n_my = -(-H // mpx)
    n_macro = n_mx * n_my
    ft = cfg.macro_tiles * cfg.macro_tiles
    n_fine = n_macro * ft

    order = jnp.argsort(jnp.where(valid, z, jnp.inf))
    u_s, v_s, valid_s = u[order], v[order], valid[order]
    rad_strict = rad[order]
    if margin:
        rad_s = jnp.where(valid_s, rad_strict + margin, rad_strict)
    else:
        rad_s = rad_strict

    r_pow2 = 1 << max(1, (n - 1).bit_length())
    assert n_macro * 2 * r_pow2 < 2**31, (
        "macro instance keys overflow int32; lower capacity or image size"
    )
    mx = jnp.arange(n_macro, dtype=jnp.int32) % n_mx
    my = jnp.arange(n_macro, dtype=jnp.int32) // n_mx
    x0m = (mx * mpx).astype(jnp.float32)
    y0m = (my * mpx).astype(jnp.float32)
    sel_m, vld_m, n_overflow = macro_instance_bin(
        u_s, v_s, rad_s, valid_s, n_mx, n_my, mpx,
        cfg.k_macro, cfg.span_cap, cfg.k_big,
        radius_strict=rad_strict if margin else None,
    )                                                 # [Tm, Km] rank indices

    # fine stage: per fine tile, select the macro list's overlapping entries
    # STRICT-FIRST (see macro_instance_bin) and restore depth order
    if tsel is None:
        fx_off = (jnp.arange(ft, dtype=jnp.int32) % cfg.macro_tiles) * tile
        fy_off = (jnp.arange(ft, dtype=jnp.int32) // cfg.macro_tiles) * tile
        u_m, v_m = u_s[sel_m], v_s[sel_m]                     # [Tm, Km]
        txp = (x0m[:, None] + fx_off[None, :].astype(jnp.float32))[
            :, :, None
        ]                                                     # [Tm, ft, 1]
        typ = (y0m[:, None] + fy_off[None, :].astype(jnp.float32))[
            :, :, None
        ]
        um, vm = u_m[:, None, :], v_m[:, None, :]             # [Tm, 1, Km]
        ranks_sel = sel_m[:, None, :]
        bshape = (n_macro, ft, cfg.k_macro)
        vldm_b = vld_m[:, None, :]
        n_rows = n_fine
    else:
        # macro-row gathers only: [Tm, Km] element gathers once, then [S]
        # row lookups (element gathers shaped [S, Km] measured ~5 ms slower)
        mi = tsel // ft                                       # [S] macro ids
        um, vm = u_s[sel_m][mi], v_s[sel_m][mi]               # [S, Km]
        tx0f, ty0f = _tile_origins(intr, cfg)
        txp = tx0f[tsel][:, None]
        typ = ty0f[tsel][:, None]
        ranks_sel = sel_m[mi]
        bshape = (tsel.shape[0], cfg.k_macro)
        vldm_b = vld_m[mi]
        n_rows = tsel.shape[0]

    def overlap(rad_all):
        rm = rad_all[sel_m] if tsel is None else rad_all[sel_m][mi]
        if tsel is None:
            rm = rm[:, None, :]
        return (
            vldm_b
            & (um + rm >= txp) & (um - rm <= txp + tile - 1)
            & (vm + rm >= typ) & (vm - rm <= typ + tile - 1)
        )

    fm = overlap(rad_s).reshape(n_rows, cfg.k_macro)
    ranks = jnp.broadcast_to(ranks_sel, bshape).reshape(n_rows, cfg.k_macro)
    if margin:
        fs = overlap(rad_strict).reshape(n_rows, cfg.k_macro)
        keys = jnp.where(
            fm, ranks + jnp.where(fs, 0, r_pow2), 2 * r_pow2
        )
        # strict-first truncation, then re-sort survivors to depth order
        picked = jax.lax.sort(keys, dimension=1, is_stable=False)[
            :, :cfg.k_fine
        ]
        rank_g = jnp.where(picked < 2 * r_pow2,
                           picked & (r_pow2 - 1), r_pow2)
        rank_g = jax.lax.sort(rank_g, dimension=1, is_stable=False)
    else:
        keys = jnp.where(fm, ranks, r_pow2)
        rank_g = jax.lax.sort(keys, dimension=1, is_stable=False)[
            :, :cfg.k_fine
        ]
    vld_f = rank_g < r_pow2
    idx = jnp.where(vld_f, order[jnp.where(vld_f, rank_g, 0)], 0)
    lists = TileLists(idx=idx, vld=vld_f)
    return lists, _BinAux(order=order, sel_m=sel_m, vld_m=vld_m,
                          x0m=x0m, y0m=y0m, n_overflow=n_overflow)


def _tile_origins(intr: Intrinsics, cfg: RenderConfig):
    """[Tf] fine-tile pixel origins in macro-major order."""
    mpx = cfg.macro_px
    tile = cfg.tile
    n_mx = -(-intr.width // mpx)
    n_my = -(-intr.height // mpx)
    n_macro = n_mx * n_my
    ft = cfg.macro_tiles * cfg.macro_tiles
    fx_off = (jnp.arange(ft, dtype=jnp.int32) % cfg.macro_tiles) * tile
    fy_off = (jnp.arange(ft, dtype=jnp.int32) // cfg.macro_tiles) * tile
    x0m = (jnp.arange(n_macro, dtype=jnp.int32) % n_mx * mpx)
    y0m = (jnp.arange(n_macro, dtype=jnp.int32) // n_mx * mpx)
    tx0 = (x0m[:, None] + fx_off[None, :]).astype(jnp.float32).reshape(-1)
    ty0 = (y0m[:, None] + fy_off[None, :]).astype(jnp.float32).reshape(-1)
    return tx0, ty0


def build_tile_lists(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    margin: float = 0.0,
    tau=None,
    scale_modifier: float = 1.0,
    tsel=None,
    with_aux: bool = False,
):
    """Bin the scene into per-fine-tile lists at the given pose (see
    TileLists). Entirely non-differentiable. With `tsel` only those fine
    tiles' lists are built (S-row result, tsel order). with_aux=True also
    returns the macro-stage _BinAux for refine_fine_lists."""
    T_eff = se3.retract(T_cw, tau) if tau is not None else T_cw
    prep = preprocess(
        gauss.xyz, gauss.log_scale, gauss.quat, gauss.opa_logit, gauss.sh,
        gauss.active, jax.lax.stop_gradient(T_eff), intr,
        sh_degree=0,  # rgb unused for binning
        near=cfg.near, scale_modifier=scale_modifier,
    )
    lists, aux = _make_lists(
        prep.mean2d[:, 0], prep.mean2d[:, 1], prep.radius, prep.valid,
        prep.z, intr, cfg, margin, tsel=tsel,
    )
    return (lists, aux) if with_aux else lists


def refine_fine_lists(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    aux: "_BinAux",
    tsel,
) -> TileLists:
    """Re-run ONLY the fine binning stage at a fresh pose against frozen
    macro lists (from a margin-built build_tile_lists(..., with_aux=True)).

    The macro stage — preprocess of all N, depth argsort, and the global
    instance sort, ~6 of the ~8 ms of a full rebuild — is reused; the
    overlap test AND the depth selection/order run entirely with
    CURRENT-pose geometry: candidates are sorted by their fresh
    preprocess z (not the macro build pose's depth rank), so both the
    k_fine truncation and the blend's front-to-back order match a full
    rebuild at this pose exactly — the only staleness left is macro
    MEMBERSHIP, which the build margin covers. (Keying by the stale
    build-pose rank instead was measured to cost ~2.2 mm when the build
    pose is the frame seed (so_from_fo_aux), margin-independent across
    8-24 px — the penalty was order staleness, not coverage.)
    Non-differentiable."""
    n = gauss.xyz.shape[0]
    tile = cfg.tile
    ft = cfg.macro_tiles * cfg.macro_tiles
    r_pow2 = 1 << max(1, (n - 1).bit_length())
    order = aux.order

    # gather-first: preprocess ONLY the macro-listed gaussians (Tm*Km rows
    # vs all N) at the fresh pose
    orig_m = order[aux.sel_m]                             # [Tm, Km] orig ids
    fi = orig_m.reshape(-1)
    prep = preprocess(
        gauss.xyz[fi], gauss.log_scale[fi], gauss.quat[fi],
        gauss.opa_logit[fi], gauss.sh[fi], gauss.active[fi],
        jax.lax.stop_gradient(T_cw), intr, sh_degree=0, near=cfg.near,
    )
    km = aux.sel_m.shape
    u_m = prep.mean2d[:, 0].reshape(km)
    v_m = prep.mean2d[:, 1].reshape(km)
    rad_m = prep.radius.reshape(km)
    valid_m = prep.valid.reshape(km)

    mi = tsel // ft
    sel_rows = aux.sel_m[mi]                              # [S, Km] stale ranks
    um, vm = u_m[mi], v_m[mi]                             # fresh geometry
    rm = rad_m[mi]
    okm = (valid_m & aux.vld_m)[mi]
    tx0f, ty0f = _tile_origins(intr, cfg)
    txp = tx0f[tsel][:, None]
    typ = ty0f[tsel][:, None]
    fm = (
        okm
        & (um + rm >= txp) & (um - rm <= txp + tile - 1)
        & (vm + rm >= typ) & (vm - rm <= typ + tile - 1)
    )                                                     # [S, Km]
    del sel_rows, r_pow2
    z_m = prep.z.reshape(km)[mi]                          # fresh depth
    ids = orig_m[mi]                                      # [S, Km] orig ids
    zkey = jnp.where(fm, z_m, jnp.inf)
    zs, ids_s = jax.lax.sort((zkey, ids), dimension=1, num_keys=1)
    zs = zs[:, :cfg.k_fine]
    vld_f = jnp.isfinite(zs)
    idx = jnp.where(vld_f, ids_s[:, :cfg.k_fine], 0)
    return TileLists(idx=idx, vld=vld_f)


def render(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    tau=None,
    means2d_offset=None,
    bg=None,
    scale_modifier: float = 1.0,
    lists: Optional[TileLists] = None,
) -> RenderResult:
    """Tiled TPU render. All shapes static; jit over (intr, cfg).

    With `lists` (from build_tile_lists) the per-call binning is skipped and
    the frozen lists drive the blend — the fast path for iterative tracking.
    """
    n = gauss.xyz.shape[0]
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    T_eff = se3.retract(T_cw, tau) if tau is not None else T_cw

    prep = preprocess(
        gauss.xyz,
        gauss.log_scale,
        gauss.quat,
        gauss.opa_logit,
        gauss.sh,
        gauss.active,
        T_eff,
        intr,
        sh_degree=cfg.sh_degree,
        near=cfg.near,
        scale_modifier=scale_modifier,
        means2d_offset=means2d_offset,
    )
    packed = _pack(prep)                  # [N, F] original order

    tile = cfg.tile
    mpx = cfg.macro_px
    W, H = intr.width, intr.height
    n_mx = -(-W // mpx)
    n_my = -(-H // mpx)
    n_macro = n_mx * n_my
    ft = cfg.macro_tiles * cfg.macro_tiles
    p = tile * tile

    aux = None
    if lists is None:
        lists, aux = _make_lists(
            jax.lax.stop_gradient(packed[:, _U]),
            jax.lax.stop_gradient(packed[:, _V]),
            jax.lax.stop_gradient(packed[:, _RAD]),
            prep.valid, jax.lax.stop_gradient(prep.z), intr, cfg,
        )

    if (
        cfg.backend in ("pallas", "pallas_compact")
        and not cfg.with_n_touched
        and aux is not None
    ):
        sel_m, vld_m, x0m, y0m = aux.sel_m, aux.vld_m, aux.x0m, aux.y0m
        data_m = packed[aux.order][sel_m]             # [Tm, Km, F]
        # fused Pallas fine-stage kernels: "pallas" = masked walk with early
        # termination (no k_fine cap, pallas_blend.py); "pallas_compact" =
        # in-kernel one-hot MXU compaction (k_fine-capped like the XLA path,
        # pallas_compact.py). Both use hand-derived backward kernels.
        p_loc = (jnp.arange(tile * tile, dtype=jnp.int32) % tile).astype(
            jnp.float32
        )
        q_loc = (jnp.arange(tile * tile, dtype=jnp.int32) // tile).astype(
            jnp.float32
        )
        pmat = _pixel_basis(p_loc, q_loc)
        xy0 = jnp.stack([x0m, y0m], axis=-1)
        counts = jnp.sum(vld_m, axis=1).astype(jnp.float32)
        if cfg.backend == "pallas_compact":
            from .pallas_compact import blend_macros_compact

            outs = blend_macros_compact(
                data_m, xy0, counts, pmat,
                tile, cfg.macro_tiles, cfg.k_fine, W, H, cfg.pallas_interpret,
            )  # [Tm, ft, P, 8]
        else:
            from .pallas_blend import blend_macros_pallas

            outs = blend_macros_pallas(
                data_m, xy0, counts, pmat,
                tile, cfg.macro_tiles, W, H, cfg.pallas_interpret,
            )  # [Tm, ft, P, 8]
        accs = outs[..., 4]
        colors = outs[..., :3] + (1.0 - accs)[..., None] * bg[None, None, None, :]
        depths = outs[..., 3]

        def assemble_p(x, c):
            x = x.reshape(n_my, n_mx, cfg.macro_tiles, cfg.macro_tiles,
                          tile, tile, c)
            x = x.transpose(0, 2, 4, 1, 3, 5, 6)
            return x.reshape(n_my * mpx, n_mx * mpx, c)[:H, :W]

        return RenderResult(
            image=assemble_p(colors, 3).transpose(2, 0, 1),
            depth=assemble_p(depths[..., None], 1).transpose(2, 0, 1),
            opacity=assemble_p(accs[..., None], 1).transpose(2, 0, 1),
            radii=prep.radius,
            n_touched=jnp.zeros((n,), jnp.int32),
        )

    # ---- blend (the only differentiable stage): flat over fine tiles,
    # chunked; checkpointed so backward rematerializes the per-tile alpha
    # matrices instead of storing them, and never re-runs any binning sort
    px_local = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py_local = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px_local, py_local)
    n_fine = n_macro * ft
    tx0, ty0 = _tile_origins(intr, cfg)

    # entries culled at the CURRENT pose must not blend even if the (possibly
    # stale) lists still carry them
    vld_f = lists.vld & prep.valid[lists.idx]

    if cfg.backend == "pallas_lists":
        # fused per-list Pallas blend (pallas_lists.py): one VMEM-resident
        # kernel instead of HBM-materialized [Tf, Kf, P] intermediates.
        # with_n_touched uses the counts variant (non-differentiable — its
        # consumers, visibility and keyframing, never take gradients).
        assert cfg.k_fine % 16 == 0, "pallas_lists needs k_fine % 16 == 0"
        from .pallas_lists import blend_lists_pallas, blend_lists_pallas_counts

        d = packed[lists.idx]                               # [Tf, Kf, F]
        logo = jnp.where(vld_f, d[..., _LOGO], -1e30)
        d = jnp.concatenate(
            [d[..., :_LOGO], logo[..., None], d[..., _LOGO + 1:]], axis=-1
        )
        if cfg.with_n_touched:
            outs, cnts = blend_lists_pallas_counts(
                d, tx0, ty0, pmat, tile, W, H, cfg.pallas_interpret
            )
            orig = jnp.where(vld_f, lists.idx, n)
            n_touched_l = jnp.zeros((n + 1,), jnp.int32).at[
                orig.reshape(-1)
            ].add(cnts.astype(jnp.int32).reshape(-1))[:n]
        else:
            outs = blend_lists_pallas(
                d, tx0, ty0, pmat, tile, W, H, cfg.pallas_interpret
            )                                               # [Tf, P, 8]
            n_touched_l = jnp.zeros((n,), jnp.int32)
        accs = outs[..., 4]
        colors = outs[..., :3] + (1.0 - accs)[..., None] * bg[None, None, :]
        depths = outs[..., 3]

        def assemble_l(x, c):
            x = x.reshape(n_my, n_mx, cfg.macro_tiles, cfg.macro_tiles,
                          tile, tile, c)
            x = x.transpose(0, 2, 4, 1, 3, 5, 6)
            return x.reshape(n_my * mpx, n_mx * mpx, c)[:H, :W]

        return RenderResult(
            image=assemble_l(colors.reshape(n_fine, p, 3), 3).transpose(2, 0, 1),
            depth=assemble_l(depths.reshape(n_fine, p)[..., None], 1)
            .transpose(2, 0, 1),
            opacity=assemble_l(accs.reshape(n_fine, p)[..., None], 1)
            .transpose(2, 0, 1),
            radii=prep.radius,
            n_touched=n_touched_l,
        )

    def blend_tile(args):
        idx, vf, x0, y0 = args
        d = packed[idx]                                     # [Kf, F]
        px = x0 + px_local
        py = y0 + py_local
        pix_ok = (px <= W - 1) & (py <= H - 1)
        color, depth, acc, contrib = _blend(d, vf, x0, y0, pmat, bg, pix_ok)
        cnt = (
            jnp.sum(contrib, axis=1).astype(jnp.int32)
            if cfg.with_n_touched else jnp.zeros((cfg.k_fine,), jnp.int32)
        )
        return color, depth, acc, cnt

    chunk = cfg.macro_chunk * ft if cfg.macro_chunk else n_fine
    xs = (lists.idx, vld_f, tx0, ty0)
    if chunk < n_fine:
        colors, depths, accs, cnts = jax.lax.map(
            jax.checkpoint(blend_tile), xs, batch_size=chunk
        )
    else:
        colors, depths, accs, cnts = jax.vmap(
            lambda i, v, x, y: jax.checkpoint(blend_tile)((i, v, x, y))
        )(*xs)

    def assemble(x, c):
        x = x.reshape(n_my, n_mx, cfg.macro_tiles, cfg.macro_tiles, tile, tile, c)
        x = x.transpose(0, 2, 4, 1, 3, 5, 6)
        x = x.reshape(n_my * mpx, n_mx * mpx, c)
        return x[:H, :W]

    image = assemble(colors.reshape(n_fine, p, 3), 3).transpose(2, 0, 1)
    depth = assemble(depths.reshape(n_fine, p)[..., None], 1).transpose(2, 0, 1)
    opacity = assemble(accs.reshape(n_fine, p)[..., None], 1).transpose(2, 0, 1)

    if cfg.with_n_touched:
        orig = jnp.where(vld_f, lists.idx, n)               # [Tf, Kf]
        n_touched = jnp.zeros((n + 1,), jnp.int32)
        n_touched = n_touched.at[orig.reshape(-1)].add(cnts.reshape(-1))[:n]
    else:
        n_touched = jnp.zeros((n,), jnp.int32)

    return RenderResult(
        image=image,
        depth=depth,
        opacity=opacity,
        radii=prep.radius,
        n_touched=n_touched,
    )


def render_batch(
    gauss: GaussianArrays,
    Ts,                      # [B, 4, 4]
    intr: Intrinsics,
    cfg: RenderConfig,
    lists_b: TileLists,      # idx/vld [B, Tf, Kf] frozen per-view lists
    taus=None,               # [B, 6] pose tangents (or None)
    means2d_offsets=None,    # [B, N, 2] densify-stat hooks (or None)
    bg=None,
):
    """Batched multi-view render over frozen per-view lists — the mapping
    fast path. Instead of lax.map-ing B sequential single-view renders
    (B kernel launches whose grids underfill the chip), the per-view tile
    lists are stacked into ONE [B*Tf]-tile blend kernel invocation;
    preprocess is vmapped over views. Differentiable in gauss, taus,
    means2d_offsets. Returns (image [B,3,H,W], depth [B,1,H,W],
    opacity [B,1,H,W], radii [B,N]).

    Requires cfg.backend == "pallas_lists" (callers fall back to per-view
    render() otherwise). Reference semantics: BackEnd.map's per-view render
    loop, /root/reference/utils/slam_backend.py:203-244.
    """
    assert cfg.k_fine % 16 == 0
    from .pallas_lists import blend_lists_pallas

    b = Ts.shape[0]
    n = gauss.xyz.shape[0]
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    if taus is None:
        taus = jnp.zeros((b, 6))
    if means2d_offsets is None:
        means2d_offsets = jnp.zeros((b, n, 2))

    def pp(T, tau, off):
        T_eff = se3.retract(T, tau)
        prep = preprocess(
            gauss.xyz, gauss.log_scale, gauss.quat, gauss.opa_logit,
            gauss.sh, gauss.active, T_eff, intr, sh_degree=cfg.sh_degree,
            near=cfg.near, means2d_offset=off,
        )
        return _pack(prep), prep.valid, prep.radius

    packed_b, valid_b, radii_b = jax.vmap(pp)(Ts, taus, means2d_offsets)

    tile = cfg.tile
    p = tile * tile
    W, H = intr.width, intr.height
    mpx = cfg.macro_px
    n_mx = -(-W // mpx)
    n_my = -(-H // mpx)
    n_fine = n_mx * n_my * cfg.macro_tiles * cfg.macro_tiles
    px_local = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py_local = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px_local, py_local)
    tx0, ty0 = _tile_origins(intr, cfg)

    vld_f = lists_b.vld & jax.vmap(lambda v, i: v[i])(valid_b, lists_b.idx)
    d = jax.vmap(lambda pk, i: pk[i])(packed_b, lists_b.idx)  # [B,Tf,Kf,F]
    logo = jnp.where(vld_f, d[..., _LOGO], -1e30)
    d = jnp.concatenate(
        [d[..., :_LOGO], logo[..., None], d[..., _LOGO + 1:]], axis=-1
    )
    outs = blend_lists_pallas(
        d.reshape(b * n_fine, cfg.k_fine, _F),
        jnp.tile(tx0, (b,)), jnp.tile(ty0, (b,)), pmat,
        tile, W, H, cfg.pallas_interpret,
    ).reshape(b, n_fine, p, 8)

    accs = outs[..., 4]
    colors = outs[..., :3] + (1.0 - accs)[..., None] * bg[None, None, None, :]
    depths = outs[..., 3]

    def assemble(x, c):
        x = x.reshape(n_my, n_mx, cfg.macro_tiles, cfg.macro_tiles,
                      tile, tile, c)
        x = x.transpose(0, 2, 4, 1, 3, 5, 6)
        return x.reshape(n_my * mpx, n_mx * mpx, c)[:H, :W].transpose(2, 0, 1)

    image = jax.vmap(lambda x: assemble(x, 3))(colors)
    depth = jax.vmap(lambda x: assemble(x[..., None], 1))(depths)
    opacity = jax.vmap(lambda x: assemble(x[..., None], 1))(accs)
    return image, depth, opacity, radii_b


def render_pose_jvp_tiles(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    lists_sub: TileLists,
    txs,
    tys,
):
    """Raw tile-space primal + 6 pose tangents (no image assembly).

    The second-order tracker's preferred form: outs [S,P,8] with columns
    (r,g,b,depth,acc,pad3) and touts [S,6,P,8] their pose-tangent
    pushforwards, over the S tiles of lists_sub (origins txs/tys).
    Gather-first: preprocess and its tangents run on the subset's S*Kf
    rows, not all N.
    """
    assert cfg.k_fine % 16 == 0
    from .pallas_lists import blend_lists_jvp8

    tile = cfg.tile
    p = tile * tile
    px_local = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py_local = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px_local, py_local)
    idx_s, vld_s = lists_sub.idx, lists_sub.vld
    s_tiles, kf = idx_s.shape
    fi = idx_s.reshape(-1)

    def pp(tau):
        T_eff = se3.retract(T_cw, tau)
        prep = preprocess(
            gauss.xyz[fi], gauss.log_scale[fi], gauss.quat[fi],
            gauss.opa_logit[fi], gauss.sh[fi], gauss.active[fi], T_eff, intr,
            sh_degree=cfg.sh_degree, near=cfg.near,
        )
        return _pack(prep), prep.valid

    (rows, valid), jvp_fn = jax.linearize(pp, jnp.zeros(6))
    # one batched pushforward instead of 6 sequential linearized chains:
    # the tracking frame is latency-bound (docs/roofline_r5.md), so 6x
    # fewer ops on 6x-wider arrays is the right trade at S*Kf ~ 14k rows
    row_tans = jax.vmap(lambda e: jvp_fn(e)[0])(jnp.eye(6))  # [6, S*Kf, F]

    vld = vld_s & valid.reshape(s_tiles, kf)
    d = rows.reshape(s_tiles, kf, _F)
    logo = jnp.where(vld, d[..., _LOGO], -1e30)
    d = jnp.concatenate(
        [d[..., :_LOGO], logo[..., None], d[..., _LOGO + 1:]], axis=-1
    )
    d_tan = row_tans.reshape(6, s_tiles, kf, _F).transpose(1, 0, 2, 3)

    return blend_lists_jvp8(
        d, d_tan, txs, tys, pmat, tile, intr.width, intr.height,
        cfg.pallas_interpret,
    )                                                   # [S,P,8],[S,6,P,8]


def tile_rows(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    lists_sub: TileLists,
    tau=None,
):
    """Packed per-tile blend rows d [S, Kf, F] for a tile subset.

    Gather-first preprocess + validity folded into the log-opacity column
    (invalid rows get LOGO = -1e30, so they can never pass the alpha test) —
    the front half of render_tiles's pallas_lists branch, factored out so
    callers can jax.vjp over it directly: the fused first-order gradient
    kernel consumes d and returns its cotangent (render_fo_grad_tiles)."""
    T_eff = se3.retract(T_cw, tau) if tau is not None else T_cw
    s_tiles, kf = lists_sub.idx.shape
    fi = lists_sub.idx.reshape(-1)
    prep = preprocess(
        gauss.xyz[fi], gauss.log_scale[fi], gauss.quat[fi],
        gauss.opa_logit[fi], gauss.sh[fi], gauss.active[fi], T_eff, intr,
        sh_degree=cfg.sh_degree, near=cfg.near,
    )
    packed = _pack(prep)                                    # [S*Kf, F]
    vld = lists_sub.vld & prep.valid.reshape(s_tiles, kf)
    d = packed.reshape(s_tiles, kf, _F)                     # [S, Kf, F]
    logo = jnp.where(vld, d[..., _LOGO], -1e30)
    return jnp.concatenate(
        [d[..., :_LOGO], logo[..., None], d[..., _LOGO + 1:]], axis=-1
    )


def render_tiles(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    lists_sub: TileLists,
    tx0s,
    ty0s,
    tau=None,
):
    """Blend ONLY the given tile subset; no image assembly.

    lists_sub: TileLists restricted to S tiles (rows of a full build's lists
    gathered by the caller); tx0s/ty0s: [S] their pixel origins. Returns
    (color [S,P,3], depth [S,P], acc [S,P]) with zero background.
    Differentiable in gauss/tau. The TPU-native equivalent of the reference's
    first-order pixel subsampling (Training.RGN.first_order.num_pixels,
    slam_frontend.py:250-257): SGD over a tile subset instead of a pixel
    subset, so the blend stays dense.

    Gather-first: the subset's gaussian parameters are gathered BEFORE
    preprocess, so per-call geometry work scales with S*Kf rows (with
    duplicates) instead of N — and the pose-gradient VJP needs no scatter
    back into an [N]-shaped buffer at all.
    """
    tile = cfg.tile
    p = tile * tile
    px_local = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py_local = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px_local, py_local)
    W, H = intr.width, intr.height

    if cfg.backend == "pallas_lists":
        assert cfg.k_fine % 16 == 0
        from .pallas_lists import blend_lists_pallas

        d = tile_rows(gauss, T_cw, intr, cfg, lists_sub, tau)
        outs = blend_lists_pallas(
            d, tx0s, ty0s, pmat, tile, W, H, cfg.pallas_interpret
        )                                                   # [S, P, 8]
        return outs[..., :3], outs[..., 3], outs[..., 4]

    T_eff = se3.retract(T_cw, tau) if tau is not None else T_cw
    s_tiles, kf = lists_sub.idx.shape
    fi = lists_sub.idx.reshape(-1)
    prep = preprocess(
        gauss.xyz[fi], gauss.log_scale[fi], gauss.quat[fi],
        gauss.opa_logit[fi], gauss.sh[fi], gauss.active[fi], T_eff, intr,
        sh_degree=cfg.sh_degree, near=cfg.near,
    )
    packed = _pack(prep)                                    # [S*Kf, F]
    vld = lists_sub.vld & prep.valid.reshape(s_tiles, kf)
    bg0 = jnp.zeros((3,), jnp.float32)
    d_all = packed.reshape(s_tiles, kf, _F)

    def blend_tile(args):
        d, vf, x0, y0 = args
        px = x0 + px_local
        py = y0 + py_local
        pix_ok = (px <= W - 1) & (py <= H - 1)
        color, depth, acc, _ = _blend(d, vf, x0, y0, pmat, bg0, pix_ok)
        return color, depth, acc

    colors, depths, accs = jax.vmap(
        lambda d, v, x, y: jax.checkpoint(blend_tile)((d, v, x, y))
    )(d_all, vld, tx0s, ty0s)
    return colors, depths, accs


def render_fo_grad_tiles(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    lists_sub: TileLists,
    tx0s,
    ty0s,
    tau,
    ea,
    eb,
    gt_t,
    mask_t,
    use_huber: bool,
    delta: float,
    gtd_t=None,
    alpha: float = 0.95,
):
    """Fused first-order objective + full 8-dim gradient (mono and RGB-D).

    ONE Pallas pass computes the blend, the masked/exposed Huber residual,
    the analytic output cotangents, and the reverse blend (fo_grad_lists_
    pallas); the pose part of the gradient is then pulled back through the
    XLA preprocess via jax.vjp over tile_rows. Semantics are exactly
    value_and_grad of the tile first-order objective (slam/tracking.py
    _fo_loss_tiles; tested in test_pallas_lists).

    With gtd_t ([S, P, 1] tiled gt depth) the RGB-D alpha-mix applies: the
    kernel emits a second row-cotangent for the depth term's (globally
    normalized) chain and the two are combined by their global scales
    before ONE pullback — both normalizers multiply linear functions of
    the blend outputs, so this is exact AD, not an approximation
    (slam_utils.py:103-113).

    Returns (loss, l1, g8) with l1 UNSCALED (caller applies the subset
    unbiasing factor) and g8 = d(loss)/d[tau(6), ea, eb].
    """
    from .pallas_lists import fo_grad_lists_pallas
    from ..ops.losses import EXPOSURE_EPS

    tile = cfg.tile
    p = tile * tile
    px_local = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py_local = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px_local, py_local)

    d, pull = jax.vjp(
        lambda t: tile_rows(gauss, T_cw, intr, cfg, lists_sub, t), tau
    )
    dd, dd_dep, sums = fo_grad_lists_pallas(
        d, tx0s, ty0s, pmat, gt_t, mask_t, ea, eb, tile,
        intr.width, intr.height, cfg.pallas_interpret, use_huber, delta,
        EXPOSURE_EPS, gtd_t=gtd_t,
    )
    sumsq = jnp.sum(sums[:, 0])
    l1 = jnp.sum(sums[:, 1])
    if gtd_t is None:
        loss = jnp.sqrt(sumsq + 1e-20)
        c = 0.5 / loss                              # d loss / d sumsq
        dd_total = dd * c
        c_rgb = c
    else:
        # m/m_d = 3 exactly: the rgb residual has 3 channels per pixel, the
        # depth residual 1, over the same tile subset (_fo_loss_tiles)
        loss_rgb = jnp.sqrt(sumsq + 1e-20)
        sd = jnp.sum(sums[:, 4])
        loss_dep = jnp.sqrt(sd * 3.0 + 1e-20)
        loss = alpha * loss_rgb + (1.0 - alpha) * loss_dep
        c_rgb = alpha * 0.5 / loss_rgb
        c_dep = (1.0 - alpha) * 3.0 * 0.5 / loss_dep
        dd_total = dd * c_rgb + dd_dep * c_dep
    g_tau = pull(dd_total)[0]
    g_ea = c_rgb * jnp.sum(sums[:, 2]) * jnp.sign(ea)
    g_eb = c_rgb * jnp.sum(sums[:, 3])
    g8 = jnp.concatenate([g_tau, g_ea[None], g_eb[None]])
    return loss, l1, g8


def render_map_grad(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    lists: TileLists,
    gt_t,
    mask_t,
    tau,
    off,
    ea,
    eb,
    initialization: bool,
    alpha: float,
    gtd_t=None,
    sortperm=None,
    txy=None,
    px_frac: float = 1.0,
    gather_first: bool = False,
):
    """Fused mapping loss + full gradient for ONE view over frozen lists.

    ONE Pallas pass computes the blend, the masked-L1 residual chain
    (ops/losses.mapping_loss_rgb[d] semantics, slam_utils.py:224-253 — with
    exposure unless `initialization`), and the reverse blend; the parameter
    / pose / screen-space-offset gradients are pulled back through the
    full-N preprocess via one jax.vjp (which also yields `radii` for the
    densify visibility filter — the means2d `off` hook is the torch
    screenspace_points trick). Replaces value_and_grad over
    render()+mapping_loss: no image assembly, no assembly transpose, no
    separate forward+backward kernel pair.

    `sortperm=(perm, sids)` ([Tf*Kf] int32 each, the frozen argsort of
    lists.idx.reshape(-1) and the ids in that order) switches the row
    cotangent's route back to gaussians from XLA's scatter-add (the
    transpose of the d0 = packed[idx] gather — measured 46 ms of the
    144 ms mapping iteration at the bench shapes, scripts/
    profile_mapping.py) to gather-by-frozen-permutation + sorted
    segment_sum: the lists are frozen for rebin_every iterations, so
    their sort is free at iteration time, and a sorted segment reduction
    replaces the random scatter. Same adds, different order (f32
    reassociation only — test_mapping.py parity).

    `txy`/`px_frac`: tile-subset call — `lists` holds S < Tf gathered rows,
    `gt_t`/`mask_t`/`gtd_t` the matching gathered tiles, `txy` their pixel
    origins, and `px_frac = S/Tf` unbiases the mean normalizers
    (MapConfig.tile_frac; the gather pullback scatters only S*Kf rows, so
    every per-row leg of the iteration scales with the fraction).

    `gather_first`: gather the LISTED rows' parameters BEFORE preprocess
    (the design tracking's subset path uses, render_tiles) so the
    differentiated pipeline runs over S*Kf rows instead of capacity N —
    the r5 subset profile put the full-N pullback at +23 ms/iter vs
    +4.5 gather and +8.7 kernel (scripts/profile_mapping.py). The
    pullback then scatters per-leaf cotangents by list ids (same adds as
    the gather transpose, different order — f32 reassociation only), and
    `radii` comes from a forward-only full-N preprocess (densify
    visibility needs every gaussian; it carried zero cotangent in the
    default path anyway). Mathematically identical; parity-tested
    (test_mapping.py::test_map_grad_gather_first_parity).

    Returns (loss, g_leaves, g_tau, g_off, g_ea, g_eb, radii); g_leaves is
    a ParamLeaves-ordered tuple (xyz, sh, log_scale, quat, opa_logit).
    """
    if gather_first and sortperm is None:
        s_tiles, kf = lists.idx.shape
        ids = lists.idx.reshape(-1)                       # [S*Kf]
        xyz_g = gauss.xyz[ids]
        sh_g = gauss.sh[ids]
        ls_g = gauss.log_scale[ids]
        quat_g = gauss.quat[ids]
        ol_g = gauss.opa_logit[ids]
        act_g = gauss.active[ids]
        off_g = off[ids]

        def rows_fn_g(xyz_, sh_, ls_, quat_, ol_, tau_, offg_):
            T_eff = se3.retract(T_cw, tau_)
            prep = preprocess(
                xyz_, ls_, quat_, ol_, sh_, act_g, T_eff, intr,
                sh_degree=cfg.sh_degree, near=cfg.near,
                means2d_offset=offg_,
            )
            d0 = _pack(prep).reshape(s_tiles, kf, _F)
            vld_f = lists.vld & prep.valid.reshape(s_tiles, kf)
            logo = jnp.where(vld_f, d0[..., _LOGO], -1e30)
            return jnp.concatenate(
                [d0[..., :_LOGO], logo[..., None], d0[..., _LOGO + 1:]],
                axis=-1,
            )

        d, pull = jax.vjp(
            rows_fn_g, xyz_g, sh_g, ls_g, quat_g, ol_g, tau, off_g,
        )
        loss, dd, g_ea, g_eb = map_grad_from_rows(
            d, intr, cfg, gt_t, mask_t, ea, eb, initialization, alpha,
            gtd_t=gtd_t, txy=txy, px_frac=px_frac,
        )
        gg = pull(dd)
        # scatter the gathered-row cotangents back by list id — the same
        # adds as the default path's gather transpose, in a different
        # order (f32 reassociation only)
        g_leaves = tuple(
            jnp.zeros_like(full).at[ids].add(g)
            for full, g in zip(
                (gauss.xyz, gauss.sh, gauss.log_scale, gauss.quat,
                 gauss.opa_logit), gg[:5],
            )
        )
        g_tau = gg[5]
        g_off = jnp.zeros_like(off).at[ids].add(gg[6])
        # densify visibility needs every gaussian's radius: one
        # forward-only full-N preprocess (it carried zero cotangent in
        # the default path)
        prep_full = preprocess(
            gauss.xyz, gauss.log_scale, gauss.quat, gauss.opa_logit,
            gauss.sh, gauss.active, se3.retract(T_cw, tau), intr,
            sh_degree=cfg.sh_degree, near=cfg.near,
        )
        return loss, g_leaves, g_tau, g_off, g_ea, g_eb, prep_full.radius

    if sortperm is None:
        def rows_fn(xyz, sh, log_scale, quat, opa_logit, tau_, off_):
            T_eff = se3.retract(T_cw, tau_)
            prep = preprocess(
                xyz, log_scale, quat, opa_logit, sh, gauss.active, T_eff,
                intr, sh_degree=cfg.sh_degree, near=cfg.near,
                means2d_offset=off_,
            )
            packed = _pack(prep)
            d0 = packed[lists.idx]
            vld_f = lists.vld & prep.valid[lists.idx]
            logo = jnp.where(vld_f, d0[..., _LOGO], -1e30)
            d = jnp.concatenate(
                [d0[..., :_LOGO], logo[..., None], d0[..., _LOGO + 1:]],
                axis=-1,
            )
            return d, prep.radius

        (d, radii), pull = jax.vjp(
            rows_fn, gauss.xyz, gauss.sh, gauss.log_scale, gauss.quat,
            gauss.opa_logit, tau, off, has_aux=False,
        )
        loss, dd, g_ea, g_eb = map_grad_from_rows(
            d, intr, cfg, gt_t, mask_t, ea, eb, initialization, alpha,
            gtd_t=gtd_t, txy=txy, px_frac=px_frac,
        )
        grads = pull((dd, jnp.zeros_like(radii)))
        g_leaves, g_tau, g_off = grads[:5], grads[5], grads[6]
        return loss, g_leaves, g_tau, g_off, g_ea, g_eb, radii

    # --- frozen-permutation segment-sum pullback ---
    # split the row pipeline at the gather: stage1 (preprocess+pack,
    # differentiated by jax.vjp — elementwise transpose, cheap) | the
    # gather+mask (transposed BY HAND as perm-gather + sorted segsum)
    assert txy is None and px_frac == 1.0, (
        "sortperm (frozen scatter order) is incompatible with per-iteration "
        "tile subsets — the permutation is of the FULL lists"
    )
    perm, sids = sortperm
    n = gauss.xyz.shape[0]

    def stage1(xyz, sh, log_scale, quat, opa_logit, tau_, off_):
        T_eff = se3.retract(T_cw, tau_)
        prep = preprocess(
            xyz, log_scale, quat, opa_logit, sh, gauss.active, T_eff, intr,
            sh_degree=cfg.sh_degree, near=cfg.near, means2d_offset=off_,
        )
        return _pack(prep), (prep.valid, prep.radius)

    packed, pull1, (valid, radii) = jax.vjp(
        stage1, gauss.xyz, gauss.sh, gauss.log_scale, gauss.quat,
        gauss.opa_logit, tau, off, has_aux=True,
    )
    d0 = packed[lists.idx]
    vld_f = lists.vld & valid[lists.idx]
    logo = jnp.where(vld_f, d0[..., _LOGO], -1e30)
    d = jnp.concatenate(
        [d0[..., :_LOGO], logo[..., None], d0[..., _LOGO + 1:]], axis=-1
    )
    loss, dd, g_ea, g_eb = map_grad_from_rows(
        d, intr, cfg, gt_t, mask_t, ea, eb, initialization, alpha,
        gtd_t=gtd_t,
    )
    # transpose of the where/concat: the logo column's cotangent is
    # gated by the mask (the -1e30 branch is constant)
    dd_logo = jnp.where(vld_f, dd[..., _LOGO], 0.0)
    ddm = jnp.concatenate(
        [dd[..., :_LOGO], dd_logo[..., None], dd[..., _LOGO + 1:]],
        axis=-1,
    )
    ddf = ddm.reshape(-1, _F)[perm]
    dpacked = jax.ops.segment_sum(
        ddf, sids, num_segments=n, indices_are_sorted=True
    )
    grads = pull1(dpacked)
    g_leaves, g_tau, g_off = grads[:5], grads[5], grads[6]
    return loss, g_leaves, g_tau, g_off, g_ea, g_eb, radii


def map_grad_from_rows(
    d,
    intr: Intrinsics,
    cfg: RenderConfig,
    gt_t,
    mask_t,
    ea,
    eb,
    initialization: bool,
    alpha: float,
    gtd_t=None,
    madd=None,
    txy=None,
    px_frac: float = 1.0,
):
    """The kernel/loss half of render_map_grad: one fused Pallas pass over
    pre-gathered blend rows `d` [Tf, Kf, F] -> (loss, dL/dd, g_ea, g_eb).

    Factored out so row providers other than the single-device frozen-list
    gather can reuse the mapping-loss semantics — the gaussian-parallel
    SPMD path (parallel/gauss_iters.py) feeds all_gather-merged rows and
    routes dL/dd back through its own pullback.

    `madd` [Tf, Kf] (0 valid / -1e30 invalid) applies the validity mask to
    the logo column in-kernel: pass RAW gathered rows and skip the
    masked-concat row copy (and its transpose).

    `txy=(tx0s, ty0s)` overrides the tile origins for a TILE-SUBSET call
    (d/gt_t/mask_t restricted to S tiles); `px_frac` = S/Tf then scales the
    mean normalizers so loss and dd are unbiased estimates of the
    full-image objective (mapping's tile-wise analogue of the reference's
    num_pixels subsampling, slam_frontend.py:250-257 — see
    MapConfig.tile_frac)."""
    from .pallas_lists import map_grad_lists_pallas
    from ..ops.losses import EXPOSURE_EPS

    tile = cfg.tile
    p = tile * tile
    px_local = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py_local = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px_local, py_local)
    tx0, ty0 = txy if txy is not None else _tile_origins(intr, cfg)
    use_exposure = not initialization
    dd, sums = map_grad_lists_pallas(
        d, tx0, ty0, pmat, gt_t, mask_t, ea, eb, tile,
        intr.width, intr.height, cfg.pallas_interpret, use_exposure,
        alpha if gtd_t is not None else 1.0, EXPOSURE_EPS, gtd_t=gtd_t,
        madd=madd, px_frac=px_frac,
    )
    m_rgb = 3.0 * intr.width * intr.height * px_frac
    m_dep = float(intr.width * intr.height) * px_frac
    l_rgb = jnp.sum(sums[:, 0]) / m_rgb
    if gtd_t is not None:
        loss = alpha * l_rgb + (1.0 - alpha) * jnp.sum(sums[:, 1]) / m_dep
        w_rgb = alpha / m_rgb
    else:
        loss = l_rgb
        w_rgb = 1.0 / m_rgb
    if use_exposure:
        g_ea = w_rgb * jnp.sum(sums[:, 2]) * jnp.sign(ea)
        g_eb = w_rgb * jnp.sum(sums[:, 3])
    else:
        g_ea = jnp.zeros_like(ea)
        g_eb = jnp.zeros_like(eb)
    return loss, dd, g_ea, g_eb


def tile_images(img, intr: Intrinsics, cfg: RenderConfig):
    """[C,H,W] -> [n_fine, P, C] per-fine-tile pixels (zero-padded at the
    image edges), tiles in the same macro-major order as _tile_origins."""
    c, H, W = img.shape
    mpx = cfg.macro_px
    tile = cfg.tile
    n_mx = -(-W // mpx)
    n_my = -(-H // mpx)
    x = jnp.pad(img, ((0, 0), (0, n_my * mpx - H), (0, n_mx * mpx - W)))
    x = x.reshape(c, n_my, cfg.macro_tiles, tile, n_mx, cfg.macro_tiles, tile)
    x = x.transpose(1, 4, 2, 5, 3, 6, 0)   # [my, mx, fy, fx, ty, tx, c]
    return x.reshape(n_mx * n_my * cfg.macro_tiles ** 2, tile * tile, c)


def render_pose_jvp(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    lists: TileLists,
    bg=None,
    tsel=None,
):
    """Render + all 6 SE(3) pose-tangent pushforwards in ONE fused pass.

    The sketched second-order tracker needs d(image)/d(tau) for the 6 pose
    tangents every iteration (slam_frontend.py:654-666 harvests them from the
    CUDA kernel's scattered backward). Reverse mode gives one direction per
    backward pass; forward mode through the fused pallas_lists JVP kernel
    shares the primal blend across all 6 tangents. Exposure tangents don't
    touch the renderer (exposure applies to the rendered image) and are
    chained analytically by the caller.

    Returns (image [3,H,W], depth [1,H,W], opacity [1,H,W],
             image_t [6,3,H,W], depth_t [6,1,H,W], opacity_t [6,1,H,W]).

    With `tsel` ([S] int32 fine-tile indices) the blend and tangents run only
    over that tile subset; all other tiles come out ZERO in the returned
    images (the second-order tracker's tile-subsampled sketch estimator).
    """
    assert cfg.k_fine % 16 == 0
    from .pallas_lists import blend_lists_jvp8

    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    n = gauss.xyz.shape[0]

    tile = cfg.tile
    p = tile * tile
    px_local = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py_local = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px_local, py_local)
    tx0, ty0 = _tile_origins(intr, cfg)
    W, H = intr.width, intr.height
    mpx = cfg.macro_px
    n_mx = -(-W // mpx)
    n_my = -(-H // mpx)
    n_fine = n_mx * n_my * cfg.macro_tiles * cfg.macro_tiles

    if tsel is not None:
        lists_sub = TileLists(idx=lists.idx[tsel], vld=lists.vld[tsel])
        txs, tys = tx0[tsel], ty0[tsel]
    else:
        lists_sub, txs, tys = lists, tx0, ty0
    outs, touts = render_pose_jvp_tiles(
        gauss, T_cw, intr, cfg, lists_sub, txs, tys
    )
    if tsel is not None:
        outs = jnp.zeros((n_fine,) + outs.shape[1:]).at[tsel].set(outs)
        touts = jnp.zeros((n_fine,) + touts.shape[1:]).at[tsel].set(touts)

    def assemble(x, c):
        x = x.reshape(n_my, n_mx, cfg.macro_tiles, cfg.macro_tiles,
                      tile, tile, c)
        x = x.transpose(0, 2, 4, 1, 3, 5, 6)
        return x.reshape(n_my * mpx, n_mx * mpx, c)[:H, :W].transpose(2, 0, 1)

    acc = outs[..., 4]
    image = assemble(
        (outs[..., :3] + (1.0 - acc)[..., None] * bg[None, None, :])
        .reshape(n_fine, p, 3), 3)
    depth = assemble(outs[..., 3].reshape(n_fine, p)[..., None], 1)
    opacity = assemble(acc.reshape(n_fine, p)[..., None], 1)

    acc_t = touts[..., 4]                               # [Tf, 6, P]
    img_t_tiles = (
        touts[..., :3] - acc_t[..., None] * bg[None, None, None, :]
    )

    def assemble_t(x, c):
        return jax.vmap(lambda y: assemble(y, c), in_axes=1)(x)

    image_t = assemble_t(img_t_tiles.reshape(n_fine, 6, p, 3), 3)
    depth_t = assemble_t(touts[..., 3].reshape(n_fine, 6, p)[..., None], 1)
    opacity_t = assemble_t(acc_t.reshape(n_fine, 6, p)[..., None], 1)
    return image, depth, opacity, image_t, depth_t, opacity_t


def render_golden(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    sh_degree: int = 0,
    near: float = 0.2,
    tau=None,
    bg=None,
    tile: int = 16,
) -> RenderResult:
    """Slow sequential reference renderer (golden model for tests).

    Independently implements the CUDA kernel's per-pixel front-to-back loop
    with the sticky `done` termination flag, scanning Gaussians one at a time.
    Tile-level binning is part of the CUDA semantics (a Gaussian contributes
    to every pixel of every 16px tile its 3-sigma box overlaps, and to no
    pixel of any other tile), so the per-pixel loop applies the same
    tile-rect overlap test. O(N * H * W); use only on tiny scenes.
    """
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    T_eff = se3.retract(T_cw, tau) if tau is not None else T_cw
    prep = preprocess(
        gauss.xyz, gauss.log_scale, gauss.quat, gauss.opa_logit, gauss.sh,
        gauss.active, T_eff, intr, sh_degree=sh_degree, near=near,
    )
    n = gauss.xyz.shape[0]
    order = jnp.argsort(jnp.where(prep.valid, prep.z, jnp.inf))
    packed = _pack(prep)[order]
    valid_s = prep.valid[order]

    H, W = intr.height, intr.width
    px = (jnp.arange(H * W) % W).astype(jnp.float32)
    py = (jnp.arange(H * W) // W).astype(jnp.float32)
    tile_x0 = jnp.floor(px / tile) * tile
    tile_y0 = jnp.floor(py / tile) * tile

    def body(carry, inp):
        C, D, A, T, done = carry
        g, v = inp
        dx = g[_U] - px
        dy = g[_V] - py
        power = -0.5 * (g[_CA] * dx * dx + g[_CC] * dy * dy) - g[_CB] * dx * dy
        alpha = jnp.minimum(0.99, g[_OPA] * jnp.exp(power))
        in_tile = (
            (g[_U] + g[_RAD] >= tile_x0)
            & (g[_U] - g[_RAD] <= tile_x0 + tile - 1)
            & (g[_V] + g[_RAD] >= tile_y0)
            & (g[_V] - g[_RAD] <= tile_y0 + tile - 1)
        )
        ok = v & in_tile & (power <= 0.0) & (alpha >= _ALPHA_MIN)
        alpha = jnp.where(ok, alpha, 0.0)
        test = T * (1.0 - alpha)
        fail = ok & (test < _T_EPS)
        contrib = ok & jnp.logical_not(done) & jnp.logical_not(fail)
        w = jnp.where(contrib, alpha * T, 0.0)
        C = C + w[:, None] * g[_R0:_B0 + 1][None, :]
        D = D + w * g[_Z]
        A = A + w
        T = jnp.where(contrib, test, T)
        done = done | fail
        return (C, D, A, T, done), jnp.sum(contrib).astype(jnp.int32)

    init = (
        jnp.zeros((H * W, 3)),
        jnp.zeros((H * W,)),
        jnp.zeros((H * W,)),
        jnp.ones((H * W,)),
        jnp.zeros((H * W,), bool),
    )
    (C, D, A, T, _), nt_sorted = jax.lax.scan(body, init, (packed, valid_s))
    C = C + T[:, None] * bg[None, :]
    n_touched = jnp.zeros((n,), jnp.int32).at[order].set(nt_sorted)
    return RenderResult(
        image=C.reshape(H, W, 3).transpose(2, 0, 1),
        depth=D.reshape(1, H, W),
        opacity=A.reshape(1, H, W),
        radii=prep.radius,
        n_touched=n_touched,
    )


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def render_jit(gauss, T_cw, intr, cfg, tau=None, means2d_offset=None, bg=None):
    return render(gauss, T_cw, intr, cfg, tau=tau, means2d_offset=means2d_offset, bg=bg)
