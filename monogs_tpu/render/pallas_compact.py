"""Compacting Pallas blend kernel: in-kernel binning via one-hot MXU matmuls.

Second-generation fused fine-stage kernel (see pallas_blend.py for the
masked-walk first generation and its limitation: without compaction every
fine tile touches the whole macro list). Here each (macro, fine) grid cell
does the per-tile binning *inside* the kernel:

  1. tile-overlap mask over the VMEM-resident macro list      (VPU)
  2. prefix-sum of the mask via blocked triangular matmuls    (MXU)
  3. one-hot row-selector [k_fine, Km] from slot equality     (VPU)
  4. compaction as onehot @ data                              (MXU)
  5. the standard factorized blend over the compacted list
     (single pass — k_fine fits one chunk, so no transmittance
     checkpoints are needed)

The backward kernel recomputes 1-5 and pushes gradients back through the
compaction with the transposed one-hot matmul (a scatter-add expressed as
an MXU contraction), accumulating d(data) across the macro's fine tiles via
output-block revisiting.

Semantics match the XLA "sort" fine stage exactly (same k_fine truncation:
the depth-nearest k_fine overlapping Gaussians win). Select with
RenderConfig(backend="pallas_compact").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_blend import (
    _chunk_cumprod_excl,
    _col,
    _feats,
    _g_and_alpha,
    _rev_cumsum_excl,
    _row,
)
from .renderer import (_ALPHA_MIN, _T_EPS, _F, _RAD, _U, _V,
                       _CA, _CB, _CC, _LOGO, _R0, _Z)


def _cumprod_excl_ax1(x, blk: int = 16):
    """Exclusive/inclusive cumprod along axis 1 of [T, K, P], unrolled."""
    t, k, pdim = x.shape
    nb = k // blk
    xb = x.reshape(t, nb, blk, pdim)
    parts = [_row(xb, 0, axis=2)]
    for i in range(1, blk):
        parts.append(parts[-1] * _row(xb, i, axis=2))
    within = jnp.stack(parts, axis=2)            # [T, nb, blk, P]
    totals = _row(within, blk - 1, axis=2)       # [T, nb, P]
    offs = [jnp.ones_like(_row(totals, 0, axis=1))]
    for i in range(1, nb):
        offs.append(offs[-1] * _row(totals, i - 1, axis=1))
    offsets = jnp.stack(offs, axis=1)            # [T, nb, P]
    incl = (within * offsets[:, :, None]).reshape(t, k, pdim)
    excl = jnp.concatenate(
        [jnp.ones_like(jax.lax.slice_in_dim(incl, 0, 1, axis=1)),
         jax.lax.slice_in_dim(incl, 0, k - 1, axis=1)], axis=1)
    return excl, incl


def _rev_cumsum_excl_ax1(x, blk: int = 16):
    """sum_{j>i} along axis 1 of [T, K, P], unrolled blocks."""
    t, k, pdim = x.shape
    nb = k // blk
    xb = x.reshape(t, nb, blk, pdim)
    rev_parts = [jnp.zeros_like(_row(xb, 0, axis=2))]
    acc = rev_parts[0]
    for i in range(blk - 1, 0, -1):
        acc = acc + _row(xb, i, axis=2)
        rev_parts.append(acc)
    within = jnp.stack(rev_parts[::-1], axis=2)
    totals = _row(within, 0, axis=2) + _row(xb, 0, axis=2)  # [T, nb, P]
    coffs = [jnp.zeros_like(_row(totals, 0, axis=1))]
    cacc = coffs[0]
    for i in range(nb - 1, 0, -1):
        cacc = cacc + _row(totals, i, axis=1)
        coffs.append(cacc)
    cross = jnp.stack(coffs[::-1], axis=1)       # [T, nb, P]
    return (within + cross[:, :, None]).reshape(t, k, pdim)


def _mask_cumsum(fm, block: int = 128):
    """Inclusive prefix sum of a [Km] 0/1 float vector via per-block
    triangular MXU matmuls + an unrolled cross-block scan (Mosaic-safe)."""
    km = fm.shape[0]
    nb = km // block
    x2 = fm.reshape(nb, block)
    # build the triangular matrix from iotas in-kernel (Pallas rejects
    # captured array constants)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    tri_t = (rows <= cols).astype(jnp.float32)  # upper: tril(ones).T
    within = jnp.dot(
        x2, tri_t, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [nb, block] inclusive within-block
    totals = _col(within, block - 1)  # [nb]
    offs = [jnp.zeros_like(_row(totals, 0))]
    acc = offs[0]
    for i in range(1, nb):
        acc = acc + _row(totals, i - 1)
        offs.append(acc)
    offsets = jnp.stack(offs, axis=0)  # [nb]
    return (within + offsets[:, None]).reshape(km)


def _batched_compact(data, count_f, x0f, y0f, tile: int, k_fine: int):
    """Compact the macro list for ALL fine tiles at once.

    data: [Km, F]; x0f/y0f: [ft] tile origins. Returns
    (d_all [ft, Kf, F], vld [ft, Kf], onehot [ft, Kf, Km])."""
    km = data.shape[0]
    ft = x0f.shape[0]
    u = _col(data, _U)
    v = _col(data, _V)
    rad = _col(data, _RAD)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (km, 1), 0)[:, 0].astype(
        jnp.float32
    )
    fm = (
        (row_idx < count_f)[None, :]
        & ((u + rad)[None, :] >= x0f[:, None])
        & ((u - rad)[None, :] <= (x0f + tile - 1)[:, None])
        & ((v + rad)[None, :] >= y0f[:, None])
        & ((v - rad)[None, :] <= (y0f + tile - 1)[:, None])
    )  # [ft, Km]

    # batched prefix sum along Km: per-128 blocks as one MXU matmul
    block = 128
    nb = km // block
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    tri_t = (rows <= cols).astype(jnp.float32)
    x2 = fm.astype(jnp.float32).reshape(ft * nb, block)
    within = jnp.dot(
        x2, tri_t, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(ft, nb, block)
    totals = _col(within, block - 1)                      # [ft, nb]
    offs = [jnp.zeros_like(_row(totals, 0, axis=1))]
    acc = offs[0]
    for i in range(1, nb):
        acc = acc + _row(totals, i - 1, axis=1)
        offs.append(acc)
    offsets = jnp.stack(offs, axis=1)                     # [ft, nb]
    cs = (within + offsets[:, :, None]).reshape(ft, km)

    slot = jnp.where(fm, cs, 0.0)
    kr = jax.lax.broadcasted_iota(jnp.int32, (k_fine, 1), 0)[:, 0].astype(
        jnp.float32
    ) + 1.0
    onehot = (slot[:, None, :] == kr[None, :, None]).astype(jnp.float32)
    d_all = jnp.dot(
        onehot.reshape(ft * k_fine, km), data,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(ft, k_fine, _F)
    total = _col(cs, km - 1)                              # [ft]
    vld = kr[None, :] <= jnp.minimum(total, float(k_fine))[:, None]
    return d_all, vld, onehot


def _batched_blend(d_all, vld, x0f, y0f, pmat, pix_ok, tile: int):
    """Factorized blend for all fine tiles of a macro.

    d_all: [ft, Kf, F]; vld/pix_ok per tile. Returns outs [ft, P, 8] and the
    residual tuple for the backward."""
    ft, kf, _ = d_all.shape
    p = pmat.shape[1]

    def c(i):
        return _col(d_all.reshape(ft * kf, _F), i).reshape(ft, kf)

    u = c(_U)
    v = c(_V)
    rad = c(_RAD)
    a = c(_CA)
    b = c(_CB)
    cc = c(_CC)
    log_opa = c(_LOGO)
    in_tile = (
        (u + rad >= x0f[:, None])
        & (u - rad <= (x0f + tile - 1)[:, None])
        & (v + rad >= y0f[:, None])
        & (v - rad <= (y0f + tile - 1)[:, None])
    )
    ul = u - x0f[:, None]
    vl = v - y0f[:, None]
    G = jnp.stack(
        [
            -0.5 * a,
            -b,
            -0.5 * cc,
            a * ul + b * vl,
            b * ul + cc * vl,
            -0.5 * (a * ul * ul + 2.0 * b * ul * vl + cc * vl * vl) + log_opa,
        ],
        axis=-1,
    )  # [ft, Kf, 6]
    sflat = jnp.dot(
        G.reshape(ft * kf, 6), pmat, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    s3 = sflat.reshape(ft, kf, p)
    alpha = jnp.minimum(0.99, jnp.exp(jnp.minimum(s3, 2.0)))
    ok = (
        (vld & in_tile)[:, :, None]
        & pix_ok[:, None, :]
        & (s3 <= log_opa[:, :, None] + 1e-4)
        & (alpha >= _ALPHA_MIN)
    )
    alpha = jnp.where(ok, alpha, 0.0)
    one_minus = 1.0 - alpha
    t_excl, _ = _cumprod_excl_ax1(one_minus)
    contrib = ok & (t_excl * one_minus >= _T_EPS)
    w = jnp.where(contrib, alpha * t_excl, 0.0)           # [ft, Kf, P]
    z = c(_Z)
    feats = jnp.stack(
        [c(_R0), c(_R0 + 1), c(_R0 + 2), z, jnp.ones_like(z),
         jnp.zeros_like(z), jnp.zeros_like(z), jnp.zeros_like(z)],
        axis=-1,
    )  # [ft, Kf, 8]
    outs = []
    for t in range(ft):  # 16 small MXU dots; Mosaic has no batched dot
        outs.append(
            jnp.dot(
                _row(w, t).T, _row(feats, t),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        )
    outs = jnp.stack(outs, axis=0)  # [ft, P, 8]
    res = (alpha, ok, one_minus, t_excl, contrib, w, ul, vl, a, b, cc, feats)
    return outs, res


def _fwd_kernel(xy0_ref, count_ref, data_ref, pmat_ref, outs_ref, *,
                ft_side: int, tile: int, k_fine: int, width: int, height: int):
    m = pl.program_id(0)
    data = data_ref[0]
    pmat = pmat_ref[:]
    ft = ft_side * ft_side
    fidx = jax.lax.broadcasted_iota(jnp.int32, (ft, 1), 0)[:, 0]
    x0f = xy0_ref[m, 0] + (fidx % ft_side).astype(jnp.float32) * tile
    y0f = xy0_ref[m, 1] + (fidx // ft_side).astype(jnp.float32) * tile
    pix_ok = (
        (x0f[:, None] + _row(pmat, 3)[None, :] <= width - 1)
        & (y0f[:, None] + _row(pmat, 4)[None, :] <= height - 1)
    )  # [ft, P]
    d_all, vld, _ = _batched_compact(data, count_ref[m], x0f, y0f, tile, k_fine)
    outs, _ = _batched_blend(d_all, vld, x0f, y0f, pmat, pix_ok, tile)
    outs_ref[0] = outs


def _bwd_kernel(xy0_ref, count_ref, data_ref, pmat_ref, gout_ref, ddata_ref,
                *, ft_side: int, tile: int, k_fine: int, width: int,
                height: int, km: int):
    m = pl.program_id(0)
    data = data_ref[0]
    pmat = pmat_ref[:]
    ft = ft_side * ft_side
    kf = k_fine
    p = pmat.shape[1]
    fidx = jax.lax.broadcasted_iota(jnp.int32, (ft, 1), 0)[:, 0]
    x0f = xy0_ref[m, 0] + (fidx % ft_side).astype(jnp.float32) * tile
    y0f = xy0_ref[m, 1] + (fidx // ft_side).astype(jnp.float32) * tile
    pix_ok = (
        (x0f[:, None] + _row(pmat, 3)[None, :] <= width - 1)
        & (y0f[:, None] + _row(pmat, 4)[None, :] <= height - 1)
    )
    g_outs = gout_ref[0]  # [ft, P, 8]

    d_all, vld, onehot = _batched_compact(
        data, count_ref[m], x0f, y0f, tile, k_fine
    )
    _, res = _batched_blend(d_all, vld, x0f, y0f, pmat, pix_ok, tile)
    alpha, ok, one_minus, t_excl, contrib, w, ul, vl, a, b, cc, feats = res

    wbars, fbars = [], []
    for t in range(ft):  # batched via unrolled MXU dots
        wbars.append(
            jnp.dot(_row(feats, t), _row(g_outs, t).T,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        )
        fbars.append(
            jnp.dot(_row(w, t), _row(g_outs, t),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        )
    wbar = jnp.stack(wbars, axis=0)   # [ft, Kf, P]
    fbar = jnp.stack(fbars, axis=0)   # [ft, Kf, 8]

    ww = wbar * w
    s_within = _rev_cumsum_excl_ax1(ww)
    obar = s_within / one_minus
    abar = jnp.where(contrib, t_excl * wbar, 0.0) - obar
    live_a = ok & (alpha < 0.99)
    sbar = jnp.where(live_a, alpha * abar, 0.0)           # [ft, Kf, P]
    Gbar = jnp.dot(
        sbar.reshape(ft * kf, p), pmat.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(ft, kf, 6)

    def gcol(i):
        return _col(Gbar.reshape(ft * kf, 6), i).reshape(ft, kf)

    g0, g1, g2 = gcol(0), gcol(1), gcol(2)
    g3, g4, g5 = gcol(3), gcol(4), gcol(5)

    def fcol(i):
        return _col(fbar.reshape(ft * kf, 8), i).reshape(ft, kf)

    zeros = jnp.zeros((ft, kf), jnp.float32)
    cols = [zeros] * _F
    cols[_U] = a * g3 + b * g4 - (a * ul + b * vl) * g5
    cols[_V] = b * g3 + cc * g4 - (b * ul + cc * vl) * g5
    cols[_CA] = -0.5 * g0 + ul * g3 - 0.5 * ul * ul * g5
    cols[_CB] = -g1 + vl * g3 + ul * g4 - ul * vl * g5
    cols[_CC] = -0.5 * g2 + vl * g4 - 0.5 * vl * vl * g5
    cols[_LOGO] = g5
    cols[_R0] = fcol(0)
    cols[_R0 + 1] = fcol(1)
    cols[_R0 + 2] = fcol(2)
    cols[_Z] = fcol(3)
    d_d = jnp.stack(cols, axis=-1).reshape(ft * kf, _F)

    # compaction transpose for ALL tiles in one MXU contraction
    ddata_ref[0] = jnp.dot(
        onehot.reshape(ft * kf, km).T, d_d,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _make_calls(n_macro, ft, km, p, tile, ft_side, k_fine, width, height,
                interpret):
    grid = (n_macro,)
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, ft_side=ft_side, tile=tile,
                          k_fine=k_fine, width=width, height=height),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, km, _F), lambda m: (m, 0, 0)),
            pl.BlockSpec((6, p), lambda m: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, ft, p, 8), lambda m: (m, 0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_macro, ft, p, 8), jnp.float32)],
        interpret=interpret,
    )
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, ft_side=ft_side, tile=tile,
                          k_fine=k_fine, width=width, height=height, km=km),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, km, _F), lambda m: (m, 0, 0)),
            pl.BlockSpec((6, p), lambda m: (0, 0)),
            pl.BlockSpec((1, ft, p, 8), lambda m: (m, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, km, _F), lambda m: (m, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_macro, km, _F), jnp.float32)],
        interpret=interpret,
    )
    return fwd, bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def blend_macros_compact(data_m, xy0, counts, pmat, tile: int, ft_side: int,
                         k_fine: int, width: int, height: int,
                         interpret: bool):
    """Blend all (macro, fine) tiles with in-kernel compaction.

    data_m: [Tm, Km, F] depth-sorted macro lists; xy0 [Tm, 2] f32; counts
    [Tm] f32; pmat [6, P]. Returns outs [Tm, ft, P, 8]. Differentiable in
    data_m.
    """
    return _fwd(data_m, xy0, counts, pmat, tile, ft_side, k_fine, width,
                height, interpret)


def _fwd(data_m, xy0, counts, pmat, tile, ft_side, k_fine, width, height,
         interpret):
    n_macro, km, _ = data_m.shape
    ft = ft_side * ft_side
    p = pmat.shape[1]
    fwd, _ = _make_calls(n_macro, ft, km, p, tile, ft_side, k_fine, width,
                         height, interpret)
    (outs,) = fwd(xy0, counts, data_m, pmat)
    return outs


def _vjp_fwd(data_m, xy0, counts, pmat, tile, ft_side, k_fine, width, height,
             interpret):
    outs = _fwd(data_m, xy0, counts, pmat, tile, ft_side, k_fine, width,
                height, interpret)
    return outs, (data_m, xy0, counts, pmat)


def _vjp_bwd(tile, ft_side, k_fine, width, height, interpret, res, g_outs):
    data_m, xy0, counts, pmat = res
    n_macro, km, _ = data_m.shape
    ft = ft_side * ft_side
    p = pmat.shape[1]
    _, bwd = _make_calls(n_macro, ft, km, p, tile, ft_side, k_fine, width,
                         height, interpret)
    (ddata,) = bwd(xy0, counts, data_m, pmat, g_outs)
    return (
        ddata,
        jnp.zeros_like(xy0),
        jnp.zeros_like(counts),
        jnp.zeros_like(pmat),
    )


blend_macros_compact.defvjp(_vjp_fwd, _vjp_bwd)
