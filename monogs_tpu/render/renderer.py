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
from ..ops.scan import blocked_cumprod_excl, blocked_cumsum
from .camera import Intrinsics
from .primitives import preprocess
from .tiling import compact_sort, tile_overlap_mask

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
    fine_mode: str = "sort"  # "sort" | "onehot" (MXU compaction)
    backend: str = "xla"    # "xla" | "pallas" | "pallas_compact"
    pallas_interpret: bool = False  # interpreter mode (CPU tests)

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


def render(
    gauss: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    tau=None,
    means2d_offset=None,
    bg=None,
    scale_modifier: float = 1.0,
) -> RenderResult:
    """Tiled TPU render. All shapes static; jit over (intr, cfg)."""
    n = gauss.xyz.shape[0]
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    T_eff = se3.se3_exp(tau) @ T_cw if tau is not None else T_cw

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

    depth_key = jnp.where(prep.valid, prep.z, jnp.inf)
    order = jnp.argsort(depth_key)
    packed = _pack(prep)[order]           # [N, F]
    valid_s = prep.valid[order]

    tile = cfg.tile
    mpx = cfg.macro_px
    W, H = intr.width, intr.height
    n_mx = -(-W // mpx)
    n_my = -(-H // mpx)
    n_macro = n_mx * n_my
    ft = cfg.macro_tiles * cfg.macro_tiles
    p = tile * tile

    # ---- macro binning (vectorized over macro tiles) ----
    mx = jnp.arange(n_macro, dtype=jnp.int32) % n_mx
    my = jnp.arange(n_macro, dtype=jnp.int32) // n_mx
    x0m = (mx * mpx).astype(jnp.float32)
    y0m = (my * mpx).astype(jnp.float32)

    def macro_bin(x0, y0):
        m = tile_overlap_mask(
            packed[:, :2], packed[:, _RAD], valid_s, x0, y0, x0 + mpx, y0 + mpx
        )
        return compact_sort(m, cfg.k_macro)

    sel_m, vld_m = jax.vmap(macro_bin)(x0m, y0m)      # [Tm, Km]
    data_m = packed[sel_m]                            # [Tm, Km, F]

    if cfg.backend in ("pallas", "pallas_compact") and not cfg.with_n_touched:
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

    fx_off = (jnp.arange(ft, dtype=jnp.int32) % cfg.macro_tiles) * tile
    fy_off = (jnp.arange(ft, dtype=jnp.int32) // cfg.macro_tiles) * tile
    px_local = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py_local = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px_local, py_local)

    @jax.checkpoint
    def do_macro(data, vld, x0, y0):
        """One macro tile -> fine binning + blend over its ft fine tiles."""

        def do_fine(tx0, ty0):
            fm = tile_overlap_mask(
                data[:, :2], data[:, _RAD], vld, tx0, ty0, tx0 + tile, ty0 + tile
            )
            if cfg.fine_mode == "onehot":
                # compaction as an MXU matmul: cs assigns each selected entry
                # its slot; the one-hot [Kf, Km] row-selector gathers data
                # without any sort or dynamic indexing
                cs = blocked_cumsum(fm.astype(jnp.float32))
                slot = jnp.where(fm, cs, 0.0)
                onehot = (
                    slot[None, :]
                    == jnp.arange(1, cfg.k_fine + 1, dtype=jnp.float32)[:, None]
                ).astype(jnp.float32)
                d = jnp.dot(
                    onehot, data, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                count = cs[-1]
                vld_f = jnp.arange(cfg.k_fine) < jnp.minimum(count, cfg.k_fine)
                sel_f = (
                    jnp.dot(
                        onehot,
                        jnp.arange(data.shape[0], dtype=jnp.float32)[:, None],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )[:, 0]
                ).astype(jnp.int32)
            else:
                sel_f, vld_f = compact_sort(fm, cfg.k_fine)
                d = data[sel_f]
            px = tx0 + px_local
            py = ty0 + py_local
            pix_ok = (px <= W - 1) & (py <= H - 1)
            color, depth, acc, contrib = _blend(
                d, vld_f, tx0, ty0, pmat, bg, pix_ok
            )
            if cfg.with_n_touched:
                cnt = jnp.sum(contrib, axis=1).astype(jnp.int32)  # [Kf]
                return color, depth, acc, sel_f, cnt
            return color, depth, acc, sel_f, jnp.zeros_like(sel_f)

        colors, depths, accs, sels, cnts = jax.vmap(do_fine)(
            x0 + fx_off.astype(jnp.float32),
            y0 + fy_off.astype(jnp.float32),
        )
        if cfg.with_n_touched:
            nt = jnp.zeros((cfg.k_macro,), jnp.int32)
            nt = nt.at[sels.reshape(-1)].add(cnts.reshape(-1))
        else:
            nt = jnp.zeros((cfg.k_macro,), jnp.int32)
        return colors, depths, accs, nt

    def run_macro(i):
        return do_macro(data_m[i], vld_m[i], x0m[i], y0m[i])

    idxs = jnp.arange(n_macro)
    if cfg.macro_chunk and cfg.macro_chunk < n_macro:
        colors, depths, accs, nt_m = jax.lax.map(
            run_macro, idxs, batch_size=cfg.macro_chunk
        )
    else:
        colors, depths, accs, nt_m = jax.vmap(run_macro)(idxs)

    return _finish_render(
        colors, depths, accs, nt_m, prep, order, sel_m, vld_m,
        n, n_mx, n_my, mpx, tile, cfg, H, W,
    )


def _finish_render(colors, depths, accs, nt_m, prep, order, sel_m, vld_m,
                   n, n_mx, n_my, mpx, tile, cfg, H, W):
    """Assemble [Tm, ft, P, c] tile outputs into images + global n_touched."""

    def assemble(x, c):
        x = x.reshape(n_my, n_mx, cfg.macro_tiles, cfg.macro_tiles, tile, tile, c)
        x = x.transpose(0, 2, 4, 1, 3, 5, 6)
        x = x.reshape(n_my * mpx, n_mx * mpx, c)
        return x[:H, :W]

    image = assemble(colors, 3).transpose(2, 0, 1)
    depth = assemble(depths[..., None], 1).transpose(2, 0, 1)
    opacity = assemble(accs[..., None], 1).transpose(2, 0, 1)

    if cfg.with_n_touched:
        orig = order[sel_m]                                 # [Tm, Km]
        orig = jnp.where(vld_m, orig, n)                    # drop invalid
        n_touched = jnp.zeros((n + 1,), jnp.int32)
        n_touched = n_touched.at[orig.reshape(-1)].add(nt_m.reshape(-1))[:n]
    else:
        n_touched = jnp.zeros((n,), jnp.int32)

    return RenderResult(
        image=image,
        depth=depth,
        opacity=opacity,
        radii=prep.radius,
        n_touched=n_touched,
    )


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
    T_eff = se3.se3_exp(tau) @ T_cw if tau is not None else T_cw
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
