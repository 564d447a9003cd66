"""Fused Pallas TPU kernel for the per-tile alpha blend (forward + VJP).

This replaces the XLA fine-binning + gather + blend stages of the renderer
(see renderer.py) with one kernel per (macro tile, fine tile) grid cell:

  - the macro tile's depth-sorted Gaussian list ([Km, F] ~ 256KB) is DMA'd to
    VMEM once and reused by all fine tiles of that macro (Pallas skips the
    DMA when the block index repeats);
  - each fine tile walks the list in chunks with a carried transmittance
    vector, masking rows by the tile-overlap test directly (no compaction,
    no sort, no gather — the mask IS the binning);
  - per-chunk compute is the same MXU-factorized math as the XLA blend
    (log-alpha as [C,6]x[6,P] matmul, blocked cumprod, [P,C]x[C,8] feature
    reduction), but with *early termination*: once the carried transmittance
    saturates below 1e-4 everywhere, remaining chunks are skipped — the
    dominant saving on opaque scenes, mirroring the CUDA kernel's `done`
    flag;
  - the backward pass is a hand-derived reverse-chunk kernel (the standard
    back-to-front rasterizer gradient: S_k = sum_{i>k} w_i * wbar_i yields
    the transmittance-product gradient) that recomputes per-chunk
    activations from the forward's per-chunk transmittance checkpoints
    ([n_chunks, P] floats per tile), and accumulates d(data) into the shared
    macro block across the fine-tile grid steps via output-block revisiting.

Numerical semantics are identical to renderer._blend (golden-tested in
tests/test_pallas.py), except that the kernel has no per-fine-tile capacity:
it composites every macro-list entry that overlaps the tile, so on dense
scenes it is *more* accurate than the XLA path's k_fine truncation.

STATUS (round 1): correct on TPU (forward + hand-derived VJP) but not yet
faster than the XLA path on dense scenes — without per-tile compaction the
masked walk touches the whole macro list per tile, because depth-sorted
candidates spread uniformly over chunks (chunk-skip only helps sparse
tiles). The planned round-2 design is the CUDA-style duplicated
(tile_id | depth)-sorted bin list built with one lax.sort, giving each fine
tile a contiguous range to stream. Select with RenderConfig(backend=
"pallas"); default remains "xla".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .renderer import (
    _ALPHA_MIN,
    _T_EPS,
    _CA,
    _CB,
    _CC,
    _LOGO,
    _RAD,
    _R0,
    _U,
    _V,
    _Z,
    _F,
)

def _pick_chunk(km: int) -> int:
    """Inner chunk size: 256 when possible, else the whole list."""
    c = min(256, km)
    assert km % c == 0 and c % 16 == 0, (km, c)
    return c



def _col(x, i):
    """Static column extract via lax.slice (Mosaic-safe; jnp integer
    indexing lowers to dynamic_slice, which Mosaic rejects inside cond)."""
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(x, i, i + 1, axis=-1), dimensions=(x.ndim - 1,)
    )


def _cols(x, i, j):
    return jax.lax.slice_in_dim(x, i, j, axis=-1)


def _row(x, i, axis=0):
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(x, i, i + 1, axis=axis), dimensions=(axis,)
    )

def _g_and_alpha(rows, row_ok, tx0, ty0, pmat, pix_ok, tile):
    """Shared forward math for one chunk.

    rows: [C, F]; pmat: [6, P]; pix_ok: [P] bool; tx0/ty0 scalar pixels.
    Returns (alpha, ok, one_minus, ul, vl).
    """
    u = _col(rows, _U)
    v = _col(rows, _V)
    rad = _col(rows, _RAD)
    a = _col(rows, _CA)
    b = _col(rows, _CB)
    c = _col(rows, _CC)
    log_opa = _col(rows, _LOGO)
    in_tile = (
        (u + rad >= tx0)
        & (u - rad <= tx0 + tile - 1)
        & (v + rad >= ty0)
        & (v - rad <= ty0 + tile - 1)
    )
    ul = u - tx0
    vl = v - ty0
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
    )
    s = jnp.dot(
        G, pmat, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    alpha = jnp.minimum(0.99, jnp.exp(jnp.minimum(s, 2.0)))
    ok = (
        (row_ok & in_tile)[:, None]
        & pix_ok[None, :]
        & (s <= log_opa[:, None] + 1e-4)
        & (alpha >= _ALPHA_MIN)
    )
    alpha = jnp.where(ok, alpha, 0.0)
    return alpha, ok, 1.0 - alpha, ul, vl


def _chunk_cumprod_excl(one_minus):
    """Exclusive/inclusive cumprod along axis 0 of [C, P], unrolled blocks."""
    c = one_minus.shape[0]
    blk = 16
    nb = c // blk
    xb = one_minus.reshape(nb, blk, -1)
    parts = [_row(xb, 0, axis=1)]
    for i in range(1, blk):
        parts.append(parts[-1] * _row(xb, i, axis=1))
    within = jnp.stack(parts, axis=1)
    totals = _row(within, blk - 1, axis=1)          # [nb, ...]
    offs = [jnp.ones_like(_row(totals, 0, axis=0))]
    for i in range(1, nb):
        offs.append(offs[-1] * _row(totals, i - 1, axis=0))
    offsets = jnp.stack(offs, axis=0)
    incl = (within * offsets[:, None]).reshape(c, -1)
    excl = jnp.concatenate(
        [jnp.ones_like(jax.lax.slice_in_dim(incl, 0, 1, axis=0)),
         jax.lax.slice_in_dim(incl, 0, c - 1, axis=0)],
        axis=0,
    )
    return excl, incl


def _rev_cumsum_excl(x):
    """out_i = sum_{k>i} x_k along axis 0, via unrolled two-level blocks
    (Mosaic-safe: no cumsum/rev primitives)."""
    c = x.shape[0]
    blk = 16
    nb = c // blk
    xb = x.reshape(nb, blk, -1)
    # within-block reverse-exclusive sums
    rev_parts = [jnp.zeros_like(_row(xb, 0, axis=1))]  # row blk-1
    acc = rev_parts[0]
    for i in range(blk - 1, 0, -1):
        acc = acc + _row(xb, i, axis=1)
        rev_parts.append(acc)                           # for row i-1
    within = jnp.stack(rev_parts[::-1], axis=1)         # [nb, blk, P]
    totals = _row(within, 0, axis=1) + _row(xb, 0, axis=1)  # block sums
    # cross-block reverse-exclusive sums
    coffs = [jnp.zeros_like(_row(totals, 0, axis=0))]   # block nb-1
    cacc = coffs[0]
    for i in range(nb - 1, 0, -1):
        cacc = cacc + _row(totals, i, axis=0)
        coffs.append(cacc)
    cross = jnp.stack(coffs[::-1], axis=0)              # [nb, P]
    return (within + cross[:, None]).reshape(c, -1)


def _feats(rows):
    return jnp.concatenate(
        [
            _cols(rows, _R0, _R0 + 3),
            _cols(rows, _Z, _Z + 1),
            jnp.ones((rows.shape[0], 1), jnp.float32),
            jnp.zeros((rows.shape[0], 3), jnp.float32),
        ],
        axis=-1,
    )


def _fwd_kernel(
    xy0_ref,      # SMEM [Tm, 2] f32 macro origins
    count_ref,    # SMEM [Tm] f32 valid counts
    cand_ref,     # SMEM [Tm, ft, NCHK] f32: chunk has in-tile candidates
    data_ref,     # VMEM [1, Km, F]
    pmat_ref,     # VMEM [6, P]
    outs_ref,     # VMEM out [1, 1, P, 8]: color(3), depth, acc, pad(3)
    tchk_ref,     # VMEM out [1, 1, NCHK, P]: per-chunk entry transmittance
    *,
    km: int,
    ft_side: int,
    tile: int,
    width: int,
    height: int,
    chunk: int,
):
    m = pl.program_id(0)
    f = pl.program_id(1)
    x0 = xy0_ref[m, 0] + (f % ft_side).astype(jnp.float32) * tile
    y0 = xy0_ref[m, 1] + (f // ft_side).astype(jnp.float32) * tile
    count = count_ref[m]
    pmat = pmat_ref[:]
    # pmat rows 3/4 are the tile-local pixel coordinates
    pix_ok = (x0 + _row(pmat, 3) <= width - 1) & (y0 + _row(pmat, 4) <= height - 1)
    p = pmat.shape[1]
    n_chunks = km // chunk

    def body(c, carry):
        T, outs = carry
        tchk_ref[0, 0, pl.ds(c, 1), :] = T[None, :]

        def live(_):
            rows = data_ref[0, pl.ds(c * chunk, chunk), :]
            row_idx = (
                c * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
            )
            row_ok = row_idx.astype(jnp.float32) < count
            alpha, ok, one_minus, _, _ = _g_and_alpha(
                rows, row_ok, x0, y0, pmat, pix_ok, tile
            )
            t_excl, t_incl = _chunk_cumprod_excl(one_minus)
            t_excl = t_excl * T[None, :]
            contrib = ok & (t_excl * one_minus >= _T_EPS)
            w = jnp.where(contrib, alpha * t_excl, 0.0)
            new_outs = outs + jnp.dot(
                w.T, _feats(rows), precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return T * _row(t_incl, t_incl.shape[0] - 1, axis=0), new_outs

        # skip chunks with no in-tile candidates, and terminate early once
        # the transmittance saturates everywhere
        do = (cand_ref[m, f, c] > 0.0) & (jnp.max(T) >= _T_EPS)
        return jax.lax.cond(do, live, lambda _: (T, outs), 0)

    T0 = jnp.ones((p,), jnp.float32)
    outs0 = jnp.zeros((p, 8), jnp.float32)
    _, outs = jax.lax.fori_loop(0, n_chunks, body, (T0, outs0))
    outs_ref[0, 0, :, :] = outs


def _bwd_kernel(
    xy0_ref,
    count_ref,
    cand_ref,     # SMEM [Tm, ft, NCHK]
    data_ref,     # VMEM [1, Km, F]
    pmat_ref,
    gout_ref,     # VMEM [1, 1, P, 8] cotangent of outs
    tchk_ref,     # VMEM [1, 1, NCHK, P]
    ddata_ref,    # VMEM out [1, Km, F], accumulated across fine tiles
    *,
    km: int,
    ft_side: int,
    tile: int,
    width: int,
    height: int,
    chunk: int,
):
    m = pl.program_id(0)
    f = pl.program_id(1)
    x0 = xy0_ref[m, 0] + (f % ft_side).astype(jnp.float32) * tile
    y0 = xy0_ref[m, 1] + (f // ft_side).astype(jnp.float32) * tile
    count = count_ref[m]
    pmat = pmat_ref[:]
    pix_ok = (x0 + _row(pmat, 3) <= width - 1) & (y0 + _row(pmat, 4) <= height - 1)
    g_outs = gout_ref[0, 0, :, :]  # [P, 8]
    p = pmat.shape[1]
    n_chunks = km // chunk

    @pl.when(f == 0)
    def _():
        ddata_ref[0, :, :] = jnp.zeros((km, _F), jnp.float32)

    def body(ci, s_carry):
        c = n_chunks - 1 - ci
        T_in = _row(tchk_ref[0, 0, pl.ds(c, 1), :], 0, axis=0)

        def live(s_carry):
            rows = data_ref[0, pl.ds(c * chunk, chunk), :]
            row_idx = (
                c * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
            )
            row_ok = row_idx.astype(jnp.float32) < count
            alpha, ok, one_minus, ul, vl = _g_and_alpha(
                rows, row_ok, x0, y0, pmat, pix_ok, tile
            )
            t_excl, t_incl = _chunk_cumprod_excl(one_minus)
            t_excl = t_excl * T_in[None, :]
            contrib = ok & (t_excl * one_minus >= _T_EPS)
            w = jnp.where(contrib, alpha * t_excl, 0.0)
            feats = _feats(rows)

            wbar = jnp.dot(
                feats, g_outs.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [C, P]
            fbar = jnp.dot(
                w, g_outs, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [C, 8]

            ww = wbar * w                                    # [C, P]
            s_within = _rev_cumsum_excl(ww)
            obar = (s_within + s_carry[None, :]) / one_minus
            abar = jnp.where(contrib, t_excl * wbar, 0.0) - obar
            live_a = ok & (alpha < 0.99)
            sbar = jnp.where(live_a, alpha * abar, 0.0)

            Gbar = jnp.dot(
                sbar, pmat.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [C, 6]

            a = _col(rows, _CA)
            b = _col(rows, _CB)
            cc = _col(rows, _CC)
            g0, g1, g2 = _col(Gbar, 0), _col(Gbar, 1), _col(Gbar, 2)
            g3, g4, g5 = _col(Gbar, 3), _col(Gbar, 4), _col(Gbar, 5)
            abar_c = -0.5 * g0 + ul * g3 - 0.5 * ul * ul * g5
            bbar_c = -g1 + vl * g3 + ul * g4 - ul * vl * g5
            cbar_c = -0.5 * g2 + vl * g4 - 0.5 * vl * vl * g5
            ulbar = a * g3 + b * g4 - (a * ul + b * vl) * g5
            vlbar = b * g3 + cc * g4 - (b * ul + cc * vl) * g5

            cols = [jnp.zeros((chunk,), jnp.float32)] * _F
            cols[_U] = ulbar
            cols[_V] = vlbar
            cols[_CA] = abar_c
            cols[_CB] = bbar_c
            cols[_CC] = cbar_c
            cols[_LOGO] = g5
            cols[_R0] = _col(fbar, 0)
            cols[_R0 + 1] = _col(fbar, 1)
            cols[_R0 + 2] = _col(fbar, 2)
            cols[_Z] = _col(fbar, 3)
            dcols = jnp.stack(cols, axis=-1)

            ddata_ref[0, pl.ds(c * chunk, chunk), :] = (
                ddata_ref[0, pl.ds(c * chunk, chunk), :] + dcols
            )
            return s_carry + jnp.sum(ww, axis=0)

        do = (cand_ref[m, f, c] > 0.0) & (jnp.max(T_in) >= _T_EPS)
        return jax.lax.cond(do, live, lambda sc: sc, s_carry)

    jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((p,), jnp.float32))


def _make_call(n_macro, ft, km, p, tile, ft_side, width, height, interpret):
    chunk = _pick_chunk(km)
    nchk = km // chunk
    grid = (n_macro, ft)
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, km=km, ft_side=ft_side, tile=tile,
                          width=width, height=height, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, km, _F), lambda m, f: (m, 0, 0)),
            pl.BlockSpec((6, p), lambda m, f: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p, 8), lambda m, f: (m, f, 0, 0)),
            pl.BlockSpec((1, 1, nchk, p), lambda m, f: (m, f, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_macro, ft, p, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_macro, ft, nchk, p), jnp.float32),
        ],
        interpret=interpret,
    )
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, km=km, ft_side=ft_side, tile=tile,
                          width=width, height=height, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, km, _F), lambda m, f: (m, 0, 0)),
            pl.BlockSpec((6, p), lambda m, f: (0, 0)),
            pl.BlockSpec((1, 1, p, 8), lambda m, f: (m, f, 0, 0)),
            pl.BlockSpec((1, 1, nchk, p), lambda m, f: (m, f, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, km, _F), lambda m, f: (m, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_macro, km, _F), jnp.float32)],
        interpret=interpret,
    )
    return fwd, bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def blend_macros_pallas(data_m, xy0, counts, pmat,
                        tile: int, ft_side: int, width: int, height: int,
                        interpret: bool):
    """Blend all (macro, fine) tiles.

    data_m: [Tm, Km, F] depth-sorted per-macro lists (F = 16, see renderer
    column layout); xy0: [Tm, 2] f32 macro pixel origins; counts: [Tm] f32
    valid-row counts; pmat: [6, P] pixel basis. Returns outs
    [Tm, ft, P, 8] with columns (r, g, b, depth, acc, pad3).
    Differentiable in data_m (aux-array cotangents are zero).
    """
    outs, _, _ = _fwd_impl(data_m, xy0, counts, pmat, tile, ft_side, width,
                           height, interpret)
    return outs


def _candidate_map(data_m, xy0, counts, tile, ft_side, chunk):
    """[Tm, ft, nchk] f32: 1 where a chunk holds any gaussian whose bbox
    overlaps the fine tile (cheap XLA precompute feeding the kernel's
    chunk-skip predicate)."""
    n_macro, km, _ = data_m.shape
    nchk = km // chunk
    u = data_m[..., _U]
    v = data_m[..., _V]
    rad = data_m[..., _RAD]
    row_ok = (
        jnp.arange(km, dtype=jnp.float32)[None, :] < counts[:, None]
    )
    fx = (jnp.arange(ft_side * ft_side, dtype=jnp.float32) % ft_side) * tile
    fy = (
        jnp.arange(ft_side * ft_side, dtype=jnp.float32) // ft_side
    ).astype(jnp.float32) * tile
    tx0 = xy0[:, None, 0:1] + fx[None, :, None]   # [Tm, ft, 1]
    ty0 = xy0[:, None, 1:2] + fy[None, :, None]
    uu = u[:, None, :]
    vv = v[:, None, :]
    rr = rad[:, None, :]
    hit = (
        row_ok[:, None, :]
        & (uu + rr >= tx0)
        & (uu - rr <= tx0 + tile - 1)
        & (vv + rr >= ty0)
        & (vv - rr <= ty0 + tile - 1)
    )  # [Tm, ft, Km]
    hit = hit.reshape(n_macro, ft_side * ft_side, nchk, chunk)
    return jnp.any(hit, axis=-1).astype(jnp.float32)


def _fwd_impl(data_m, xy0, counts, pmat, tile, ft_side, width, height,
              interpret):
    n_macro, km, _ = data_m.shape
    ft = ft_side * ft_side
    p = pmat.shape[1]
    chunk = _pick_chunk(km)
    cand = _candidate_map(data_m, xy0, counts, tile, ft_side, chunk)
    fwd, _ = _make_call(n_macro, ft, km, p, tile, ft_side, width, height,
                        interpret)
    outs, tchk = fwd(xy0, counts, cand, data_m, pmat)
    return outs, tchk, cand


def _vjp_fwd(data_m, xy0, counts, pmat, tile, ft_side, width, height,
             interpret):
    outs, tchk, cand = _fwd_impl(
        data_m, xy0, counts, pmat, tile, ft_side, width, height, interpret
    )
    return outs, (data_m, xy0, counts, pmat, tchk, cand)


def _vjp_bwd(tile, ft_side, width, height, interpret, res, g_outs):
    data_m, xy0, counts, pmat, tchk, cand = res
    n_macro, km, _ = data_m.shape
    ft = ft_side * ft_side
    p = pmat.shape[1]
    _, bwd = _make_call(n_macro, ft, km, p, tile, ft_side, width, height,
                        interpret)
    (ddata,) = bwd(xy0, counts, cand, data_m, pmat, g_outs, tchk)
    return (
        ddata,
        jnp.zeros_like(xy0),
        jnp.zeros_like(counts),
        jnp.zeros_like(pmat),
    )


blend_macros_pallas.defvjp(_vjp_fwd, _vjp_bwd)
