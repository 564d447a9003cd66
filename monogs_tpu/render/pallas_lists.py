"""Fused Pallas TPU blend over frozen per-fine-tile lists (fwd + VJP + JVP).

The fast path of the renderer (see renderer.py / TileLists): binning produced
`d = packed[lists.idx]` — [Tf, Kf, F] depth-ordered per-tile Gaussian rows —
and the only remaining work per render is the alpha blend. The XLA blend
materializes several [Tf, Kf, P] f32 intermediates in HBM (alpha,
transmittance, weights: ~126 MB each at the benchmark config), which makes it
HBM-bound at ~2 ms forward / ~5 ms backward. This kernel fuses the whole
per-tile chain (log-alpha matmul -> exp -> exclusive cumprod -> weighted
feature reduction) in VMEM: HBM traffic drops to the [Tf, Kf, F] input and
[Tf, P, 8] output.

Each grid step owns `bt` tiles and BATCHES all elementwise/cumprod math
across them ([bt*Kf, P]-shaped ops keep the VPU full; per-tile [Kf, P] ops
are latency-bound) while the small feature reductions run as per-tile MXU
matmuls.

Row validity is folded into the data: invalid rows carry log-opacity -1e30,
so alpha == 0 and they can never pass the >= 1/255 test. No per-tile box
test is applied — the lists ARE the binning (matching renderer._blend, which
relies on the fine lists' overlap test; for margin-built lists the extra
rows blend like the CUDA kernel would if it binned them).

Entry points:
  blend_lists_pallas — custom_vjp primal; backward is a hand-derived
                       reverse-blend kernel (back-to-front rasterizer
                       gradient) that recomputes activations from d — no
                       forward residual checkpoints at all.
  blend_lists_jvp8   — primal + n_tan simultaneous tangent pushforwards
                       (the second-order tracker's sketched Jacobian needs
                       d(outs)/d(pose8); sharing the primal across all 8
                       tangents beats 8 re-renders).

Numerics are identical to renderer._blend (tested in
tests/test_pallas_lists.py). Reference: the CUDA rasterizer's per-tile
forward/backward (diff-gaussian-rasterization, SURVEY.md section 2.2.1).
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
    _R0,
    _U,
    _V,
    _Z,
    _F,
)


def _pick_bt_kc(n_tiles: int, kf: int = 96, want: int = 8):
    """Tile-batch (block) size + matched K-chunk for the list kernels.

    Every kernel's scoped-VMEM footprint scales ~ bt*kc (the [bt*Kc, P]
    per-chunk blend intermediates dominate; kernels scan K in chunks with
    a transmittance carry, so capacity beyond the chunk size costs no
    VMEM). The per-kernel `want` values are calibrated at Kc=96 (measured
    fits on v5e, 16M scoped limit).

    bt and kc are chosen JOINTLY: when the VMEM budget at the natural
    chunk _chunk_kc(kf) would force bt=1, the chunk is halved instead —
    smaller chunks cost only more scan trips, while bt=1 blocks trip a
    Mosaic relayout bug ("Invalid relayout ... vector<1x256xf32>",
    observed on v5e at the RGB-D fused-fo kernel with k_fine=128,
    want=2 -> kc=128, cap=1; scripts/repro_mosaic_tf.py).

    If n_tiles has no even divisor (odd tile counts at unusual
    resolutions), no amount of kc-halving can buy bt>1 — bail out with
    the natural chunk rather than degrading kc to 16 for nothing."""
    kc = _chunk_kc(kf)
    if n_tiles % 2 != 0:
        return 1, kc
    while True:
        cap = max(1, (want * 96) // max(kc, 1))
        for bt in (8, 4, 2):
            if bt <= min(want, cap) and n_tiles % bt == 0:
                return bt, kc
        if kc > 16:
            kc = _chunk_kc(kf, cap=kc - 16)
            continue
        return 1, kc


def _pick_bt(n_tiles: int, kf: int = 96, want: int = 8) -> int:
    return _pick_bt_kc(n_tiles, kf, want)[0]


def _ax(x, i, axis):
    """Static index along `axis` (squeezed), via lax.slice (Mosaic-safe)."""
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(x, i, i + 1, axis=axis), dimensions=(axis,)
    )


def _col(x, i):
    return _ax(x, i, x.ndim - 1)


def _cols(x, i, j):
    return jax.lax.slice_in_dim(x, i, j, axis=x.ndim - 1)


def _cumprod_excl_b(x):
    """Exclusive/inclusive cumprod along axis 1 of [B, K, P], two-level
    unrolled blocks; every step is a [B, nb|1, P]-wide vector op."""
    bsz, k, p = x.shape
    blk = 16
    nb = k // blk
    xb = x.reshape(bsz, nb, blk, p)
    parts = [_ax(xb, 0, 2)]
    for i in range(1, blk):
        parts.append(parts[-1] * _ax(xb, i, 2))
    within = jnp.stack(parts, axis=2)                   # [B, nb, blk, P]
    totals = parts[-1]                                  # [B, nb, P]
    offs = [jnp.ones_like(_ax(totals, 0, 1))]
    for i in range(1, nb):
        offs.append(offs[-1] * _ax(totals, i - 1, 1))
    offsets = jnp.stack(offs, axis=1)                   # [B, nb, P]
    incl = (within * offsets[:, :, None]).reshape(bsz, k, p)
    excl = jnp.concatenate(
        [jnp.ones_like(jax.lax.slice_in_dim(incl, 0, 1, axis=1)),
         jax.lax.slice_in_dim(incl, 0, k - 1, axis=1)],
        axis=1,
    )
    return excl, incl


def _cumsum_b(x, reverse: bool):
    """Exclusive cumsum along axis 1 of [B, K, P] (forward or reverse),
    two-level unrolled blocks."""
    bsz, k, p = x.shape
    blk = 16
    nb = k // blk
    xb = x.reshape(bsz, nb, blk, p)
    idx = range(blk - 1, 0, -1) if reverse else range(0, blk - 1)
    parts = [jnp.zeros_like(_ax(xb, 0, 2))]
    acc = parts[0]
    for i in idx:
        acc = acc + _ax(xb, i, 2)
        parts.append(acc)
    if reverse:
        parts = parts[::-1]
    within = jnp.stack(parts, axis=2)                   # [B, nb, blk, P]
    edge = blk - 1 if not reverse else 0
    totals = _ax(within, edge, 2) + _ax(xb, edge, 2)    # block sums
    cidx = range(nb - 1, 0, -1) if reverse else range(0, nb - 1)
    coffs = [jnp.zeros_like(_ax(totals, 0, 1))]
    cacc = coffs[0]
    for i in cidx:
        cacc = cacc + _ax(totals, i, 1)
        coffs.append(cacc)
    if reverse:
        coffs = coffs[::-1]
    cross = jnp.stack(coffs, axis=1)                    # [B, nb, P]
    return (within + cross[:, :, None]).reshape(bsz, k, p)


def _chunk_kc(kf: int, cap: int = 128) -> int:
    """K-chunk size: the largest divisor of kf that is a multiple of 16 and
    <= cap. The blend is an ordered scan over K, so kernels process K in
    chunks of kc with a transmittance carry — [B, kc, P] intermediates
    instead of [B, Kf, P] bound scoped VMEM regardless of list capacity
    (mapping-grade k_fine 512 compiles; no more track_k_fine clamp)."""
    kc = min(kf, cap)
    while kf % kc or kc % 16:
        kc -= 16 if kc % 16 == 0 else kc % 16
    return max(kc, 16)


def _batch_forward(rows, x0, y0, pmat, width, height, t_in=None):
    """Shared primal math for a batch of tiles (one K-chunk).

    rows: [B, Kc, F]; x0/y0: [B]; pmat: [6, P] (rows 3/4 are the tile-local
    pixel coordinates); t_in: [B, 1, P] transmittance entering this chunk
    (None = 1, i.e. the first chunk). Returns activation dict; all
    [B, Kc, P] tensors, plus 't_out' [B, 1, P] for the next chunk's carry.

    The log-alpha quadratic is evaluated DIRECTLY on the VPU (exact f32,
    bit-matching the golden renderer) — inside the kernel the factorized
    [.,6]x[6,P] matmul of the XLA path would be an MXU-latency-bound K=6
    matmul at 6-pass f32 precision, slower than a dozen fused vector ops.
    """
    bsz, kf, _ = rows.shape
    pxl = _ax(pmat, 3, 0)                               # [P]
    pyl = _ax(pmat, 4, 0)
    u = _col(rows, _U)
    v = _col(rows, _V)
    a = _col(rows, _CA)
    b = _col(rows, _CB)
    c = _col(rows, _CC)
    log_opa = _col(rows, _LOGO)                         # [B, Kf]
    ul = u - x0[:, None]
    vl = v - y0[:, None]
    dx = ul[:, :, None] - pxl[None, None, :]            # [B, Kf, P]
    dy = vl[:, :, None] - pyl[None, None, :]
    s = (
        -0.5 * (a[:, :, None] * dx * dx + c[:, :, None] * dy * dy)
        - b[:, :, None] * dx * dy
        + log_opa[:, :, None]
    )
    pix_ok = (
        (x0[:, None] + pxl[None, :] <= width - 1)
        & (y0[:, None] + pyl[None, :] <= height - 1)
    )                                                   # [B, P]
    alpha = jnp.minimum(0.99, jnp.exp(jnp.minimum(s, 2.0)))
    ok = (
        pix_ok[:, None, :]
        & (s <= log_opa[:, :, None] + 1e-4)
        & (alpha >= _ALPHA_MIN)
    )
    alpha = jnp.where(ok, alpha, 0.0)
    one_minus = 1.0 - alpha
    t_excl, t_incl = _cumprod_excl_b(one_minus)
    if t_in is not None:
        t_excl = t_excl * t_in
        t_out = t_in * jax.lax.slice_in_dim(t_incl, kf - 1, kf, axis=1)
    else:
        t_out = jax.lax.slice_in_dim(t_incl, kf - 1, kf, axis=1)
    contrib = ok & (t_excl * one_minus >= _T_EPS)
    w = jnp.where(contrib, alpha * t_excl, 0.0)
    feats = jnp.concatenate(
        [
            _cols(rows, _R0, _R0 + 3),
            _cols(rows, _Z, _Z + 1),
            jnp.ones((bsz, kf, 1), jnp.float32),
            jnp.zeros((bsz, kf, 3), jnp.float32),
        ],
        axis=-1,
    )                                                   # [B, Kf, 8]
    return dict(ul=ul, vl=vl, a=a, b=b, c=c, alpha=alpha, ok=ok,
                one_minus=one_minus, t_excl=t_excl, contrib=contrib,
                w=w, feats=feats, t_out=t_out)


def _dot3(a, b):
    """~f32-accurate matmul from 3 bf16 MXU passes (Mosaic supports only
    DEFAULT/HIGHEST dot precision in-kernel; HIGHEST is 6 passes). Error
    ~2^-16 relative — well inside the renderer's 2e-5 parity tolerance."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _blockdiag(feats):
    """[B, K, nf] -> block-diagonal [B*K, B*nf] (rows of tile b live in
    column block b). Built with lane-repeat + iota masks — Mosaic forbids
    reshapes that merge/split the minor (lane) dimension."""
    bsz, k, nf = feats.shape
    ff = feats.reshape(bsz * k, nf)                     # leading-dim merge ok
    tiled = pltpu.repeat(ff, bsz, axis=1)               # [B*K, B*nf]
    rb = jax.lax.broadcasted_iota(jnp.int32, (bsz * k, bsz * nf), 0) // k
    cb = jax.lax.broadcasted_iota(jnp.int32, (bsz * k, bsz * nf), 1) // nf
    return jnp.where(rb == cb, tiled, 0.0)


def _unstack_lanes(o, bsz, nf):
    """[P, B*nf] -> [B, P, nf] via static lane slices."""
    return jnp.stack(
        [jax.lax.slice_in_dim(o, b * nf, (b + 1) * nf, axis=1)
         for b in range(bsz)],
        axis=0,
    )


def _outs_from(w, feats, bt):
    """[B, P, 8] = per-tile w^T @ feats, batched as ONE MXU matmul against a
    block-diagonal feature matrix (per-tile matmuls are latency-bound)."""
    bsz, k, p = w.shape
    nf = feats.shape[-1]
    o = _dot3(w.reshape(bsz * k, p).T, _blockdiag(feats))   # [P, B*nf]
    return _unstack_lanes(o, bsz, nf)


def _kchunk(rows, j, kc):
    """rows[:, j*kc:(j+1)*kc, :] (static slice)."""
    return jax.lax.slice_in_dim(rows, j * kc, (j + 1) * kc, axis=1)


def _forward_chunks(rows, x0, y0, pmat, width, height, kc):
    """Forward sweep over K-chunks: yields (j, f_j) with the transmittance
    carried across chunks (see _batch_forward). The chunk loop is a Python
    unroll — n_chunks is static and small (<= kf/16)."""
    kf = rows.shape[1]
    t_in = None
    for j in range(kf // kc):
        f = _batch_forward(_kchunk(rows, j, kc), x0, y0, pmat, width,
                           height, t_in)
        yield j, f
        t_in = f["t_out"]


def _fwd_kernel(tx0_ref, ty0_ref, dat_ref, pmat_ref, outs_ref, *,
                width: int, height: int, bt: int, kc: int):
    g = pl.program_id(0)
    x0 = jnp.stack([tx0_ref[g * bt + i] for i in range(bt)])
    y0 = jnp.stack([ty0_ref[g * bt + i] for i in range(bt)])
    acc = None
    for _, f in _forward_chunks(dat_ref[:], x0, y0, pmat_ref[:], width,
                                height, kc):
        o = _outs_from(f["w"], f["feats"], bt)
        acc = o if acc is None else acc + o
    outs_ref[:] = acc


def _fwd_counts_kernel(tx0_ref, ty0_ref, dat_ref, pmat_ref, outs_ref,
                       cnt_ref, *, width: int, height: int, bt: int,
                       kc: int):
    g = pl.program_id(0)
    x0 = jnp.stack([tx0_ref[g * bt + i] for i in range(bt)])
    y0 = jnp.stack([ty0_ref[g * bt + i] for i in range(bt)])
    acc, cnts = None, []
    for _, f in _forward_chunks(dat_ref[:], x0, y0, pmat_ref[:], width,
                                height, kc):
        o = _outs_from(f["w"], f["feats"], bt)
        acc = o if acc is None else acc + o
        # contributing-pixel count per row (the CUDA kernel's n_touched);
        # exact in f32 (sums of <= P ones)
        cnts.append(jnp.sum(f["contrib"].astype(jnp.float32), axis=2))
    outs_ref[:] = acc
    # Emitted [bt, 1, kf]: a 2-D [bt, kf] block is only Mosaic-legal when
    # bt % 8 == 0, but large-kf configs need small bt for VMEM (see
    # _pick_bt); with the unit middle dim the block's last two dims equal
    # the array's and any bt is legal.
    cnt_ref[:] = jnp.expand_dims(jnp.concatenate(cnts, axis=1), 1)


def blend_lists_pallas_counts(d, tx0, ty0, pmat, tile: int, width: int,
                              height: int, interpret: bool):
    """blend_lists_pallas + per-row contributing-pixel counts [Tf, Kf]
    (n_touched support for the fast path). NOT differentiable — used by the
    final tracking render and visibility passes, which are never
    differentiated."""
    n_tiles, kf, _ = d.shape
    p = pmat.shape[1]
    bt, kc = _pick_bt_kc(n_tiles, kf)
    outs, cnts = pl.pallas_call(
        functools.partial(_fwd_counts_kernel, width=width, height=height,
                          bt=bt, kc=kc),
        grid=(n_tiles // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
            pl.BlockSpec((6, p), lambda g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, p, 8), lambda g: (g, 0, 0)),
            pl.BlockSpec((bt, 1, kf), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, kf), jnp.float32),
        ],
        interpret=interpret,
    )(tx0, ty0, d, pmat)
    return outs, cnts.reshape(n_tiles, kf)


def _dd_from_gouts(f, pmat, g_outs, bsz, kf, suffix=None):
    """Reverse-blend: output cotangents [B, P, 8] -> row cotangents
    [B, Kc, F] for one K-chunk. Shared by the plain VJP kernel and the
    fused loss-and-gradient kernel.

    `suffix` [B, 1, P] carries sum_{k in later chunks} wbar_k * w_k — the
    part of the reverse-scan that lives beyond this chunk (chunks are
    processed back-to-front; None = last chunk). Returns (dd, ww_total)
    where ww_total [B, 1, P] is this chunk's contribution to the carry."""
    # go_p: [P, B*8] by lane-concat of per-tile cotangents
    go_p = jnp.concatenate([_ax(g_outs, b, 0) for b in range(bsz)], axis=1)
    wbar = _dot3(_blockdiag(f["feats"]), go_p.T).reshape(
        bsz, kf, go_p.shape[0]
    )
    fbar_full = _dot3(f["w"].reshape(bsz * kf, -1), go_p)   # [B*Kf, B*8]
    fbar = jnp.stack(
        [jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(fbar_full, b * kf, (b + 1) * kf, axis=0),
            b * 8, (b + 1) * 8, axis=1)
         for b in range(bsz)],
        axis=0,
    )                                                       # [B, Kf, 8]

    ww = wbar * f["w"]
    obar = _cumsum_b(ww, reverse=True)
    if suffix is not None:
        obar = obar + suffix
    ww_total = jnp.sum(ww, axis=1, keepdims=True) + (
        suffix if suffix is not None else 0.0
    )
    obar = obar / f["one_minus"]
    abar = jnp.where(f["contrib"], f["t_excl"] * wbar, 0.0) - obar
    live_a = f["ok"] & (f["alpha"] < 0.99)
    sbar = jnp.where(live_a, f["alpha"] * abar, 0.0)

    Gbar = _dot3(sbar.reshape(bsz * kf, -1), pmat.T).reshape(bsz, kf, 6)
    a, bq, cc = f["a"], f["b"], f["c"]
    ul, vl = f["ul"], f["vl"]
    g0, g1, g2 = _col(Gbar, 0), _col(Gbar, 1), _col(Gbar, 2)
    g3, g4, g5 = _col(Gbar, 3), _col(Gbar, 4), _col(Gbar, 5)
    z = jnp.zeros((bsz, kf), jnp.float32)
    cols = [z] * _F
    cols[_U] = a * g3 + bq * g4 - (a * ul + bq * vl) * g5
    cols[_V] = bq * g3 + cc * g4 - (bq * ul + cc * vl) * g5
    cols[_CA] = -0.5 * g0 + ul * g3 - 0.5 * ul * ul * g5
    cols[_CB] = -g1 + vl * g3 + ul * g4 - ul * vl * g5
    cols[_CC] = -0.5 * g2 + vl * g4 - 0.5 * vl * vl * g5
    cols[_LOGO] = g5
    cols[_R0] = _col(fbar, 0)
    cols[_R0 + 1] = _col(fbar, 1)
    cols[_R0 + 2] = _col(fbar, 2)
    cols[_Z] = _col(fbar, 3)
    return jnp.stack(cols, axis=-1), ww_total


def _reverse_chunks(rows, x0, y0, pmat, width, height, kc):
    """Reverse sweep over K-chunks for the reverse-blend: a forward prefix
    pass stores each chunk's entry transmittance (a [B, 1, P] carry per
    chunk — cheap), then yields (j, f_j) back-to-front so callers can carry
    the suffix term of the reverse scan (see _dd_from_gouts)."""
    kf = rows.shape[1]
    n_ch = kf // kc
    t_ins = [None]
    for j in range(n_ch - 1):
        # prefix pass: only t_out survives (the rest of the forward is
        # dead code the compiler eliminates)
        f = _batch_forward(_kchunk(rows, j, kc), x0, y0, pmat, width,
                           height, t_ins[-1])
        t_ins.append(f["t_out"])
    for j in range(n_ch - 1, -1, -1):
        yield j, _batch_forward(_kchunk(rows, j, kc), x0, y0, pmat,
                                width, height, t_ins[j])


def _bwd_kernel(tx0_ref, ty0_ref, dat_ref, pmat_ref, gout_ref, dd_ref, *,
                width: int, height: int, bt: int, kc: int):
    g = pl.program_id(0)
    x0 = jnp.stack([tx0_ref[g * bt + i] for i in range(bt)])
    y0 = jnp.stack([ty0_ref[g * bt + i] for i in range(bt)])
    rows = dat_ref[:]
    pmat = pmat_ref[:]
    bsz, _, _ = rows.shape
    g_outs = gout_ref[:]
    suffix = None
    for j, f in _reverse_chunks(rows, x0, y0, pmat, width, height, kc):
        dd_j, suffix = _dd_from_gouts(f, pmat, g_outs, bsz, kc, suffix)
        dd_ref[:, j * kc:(j + 1) * kc, :] = dd_j


def _fo_grad_kernel(tx0_ref, ty0_ref, sc_ref, dat_ref, pmat_ref, gt_ref,
                    mask_ref, *refs, width: int, height: int,
                    bt: int, kc: int, use_huber: bool, delta: float,
                    eps: float, rgbd: bool):
    """Fused first-order step: primal blend + residual/Huber chain +
    analytic output cotangents + reverse blend, in ONE pass.

    Replaces (fwd kernel -> XLA residual AD -> bwd kernel), which paid two
    full _batch_forward recomputes plus an HBM round trip of outs/g_outs per
    first-order iteration. The loss's global normalizer sqrt(sum hub^2) is
    applied OUTSIDE (dd here is d(sum hub^2)/d(rows); the caller scales by
    0.5/loss), so per-tile work needs no cross-tile reduction.

    RGB-D (rgbd=True, extra gtd input): the depth term's normalizer
    sqrt(sum r_d^2 * m/m_d) is ALSO global, but both normalizers multiply
    LINEAR functions of the blend outputs — so the kernel emits a SECOND
    row-cotangent dd_dep = d(sum r_d^2)/d(rows) from the same forward
    recompute (the expensive part), and the caller combines
    c_rgb*dd + c_dep*dd_dep before one pullback. Exactly value_and_grad of
    the alpha-mixed objective (slam_utils.py:103-113 tracking loss;
    _fo_loss_tiles rgbd branch). Depth residual carries no Huber and its
    opacity/validity mask is a constant w.r.t. the tangents, matching
    autodiff through jnp.where.

    sums_ref [B, 8] per-tile partials: (sum hub^2, sum |r|, d(sumsq)/d|ea|,
    d(sumsq)/d(eb), sum r_d^2, 0...). Residual semantics = ops/losses
    tracking_residual_rgb + huber_signed (slam_utils.py:58-75,188-205)."""
    if rgbd:
        gtd_ref, dd_ref, dd_dep_ref, sums_ref = refs
    else:
        (dd_ref, sums_ref), gtd_ref, dd_dep_ref = refs, None, None
    g = pl.program_id(0)
    x0 = jnp.stack([tx0_ref[g * bt + i] for i in range(bt)])
    y0 = jnp.stack([ty0_ref[g * bt + i] for i in range(bt)])
    rows = dat_ref[:]
    pmat = pmat_ref[:]
    bsz, kf, _ = rows.shape
    outs = None
    for _, f in _forward_chunks(rows, x0, y0, pmat, width, height, kc):
        o = _outs_from(f["w"], f["feats"], bt)
        outs = o if outs is None else outs + o              # [B, P, 8]

    col = _cols(outs, 0, 3)                                 # [B, P, 3]
    acc = _cols(outs, 4, 5)                                 # [B, P, 1]
    gt = gt_ref[:]                                          # [B, P, 3]
    mk = mask_ref[:]                                        # [B, P, 1]
    e = jnp.abs(sc_ref[0]) + eps
    diff = e * col + sc_ref[1] - gt
    am = acc * mk
    r = am * diff
    if use_huber:
        ax = jnp.abs(r)
        safe = jnp.sqrt(jnp.maximum(2.0 * delta * ax - delta * delta, 1e-20))
        hub = jnp.where(ax < delta, r, jnp.sign(r) * safe)
        slope = jnp.where(ax < delta, 1.0, delta / safe)
    else:
        hub, slope = r, jnp.ones_like(r)
    rbar = 2.0 * hub * slope                                # d(sumsq)/dr

    g_col = rbar * am * e                                   # [B, P, 3]
    g_acc = jnp.sum(rbar * mk * diff, axis=-1, keepdims=True)
    zero1 = jnp.zeros_like(g_acc)
    g_outs = jnp.concatenate(
        [g_col, zero1, g_acc, zero1, zero1, zero1], axis=-1
    )                                                       # [B, P, 8]

    def tile_sum(x):                                        # [B,P,C] -> [B,1]
        return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

    sumsq = tile_sum(hub * hub)
    l1 = tile_sum(jnp.abs(r))
    gea = tile_sum(rbar * am * col)                         # x sign(ea) outside
    geb = tile_sum(rbar * am)
    z = jnp.zeros_like(sumsq)
    if rgbd:
        dep = _cols(outs, 3, 4)                             # [B, P, 1]
        gtd = gtd_ref[:]                                    # [B, P, 1]
        depth_mask = (gtd > 0.01) & (acc > 0.95)
        r_d = jnp.where(depth_mask, dep - gtd, 0.0)
        zero3 = jnp.zeros_like(g_col)
        g_outs_dep = jnp.concatenate(
            [zero3, 2.0 * r_d, zero1, zero1, zero1, zero1], axis=-1
        )                                                   # [B, P, 8]
        sd = tile_sum(r_d * r_d)
    else:
        sd = z

    # reverse sweep: both dd chains per chunk from ONE shared forward
    # recompute, each carrying its own suffix term
    suffix = suffix_dep = None
    for j, f in _reverse_chunks(rows, x0, y0, pmat, width, height, kc):
        dd_j, suffix = _dd_from_gouts(f, pmat, g_outs, bsz, kc, suffix)
        dd_ref[:, j * kc:(j + 1) * kc, :] = dd_j
        if rgbd:
            ddd_j, suffix_dep = _dd_from_gouts(
                f, pmat, g_outs_dep, bsz, kc, suffix_dep
            )
            dd_dep_ref[:, j * kc:(j + 1) * kc, :] = ddd_j
    # sums is emitted [1, bt, 8] (3-D) so its block's last two dims equal the
    # full array dims — a [bt, 8] 2-D block with bt<8 violates Mosaic's
    # sublane divisibility rule
    sums_ref[:] = jnp.concatenate(
        [sumsq, l1, gea, geb, sd, z, z, z], axis=1
    )[None]


def fo_grad_lists_pallas(d, tx0, ty0, pmat, gt_t, mask_t, ea, eb, tile: int,
                         width: int, height: int, interpret: bool,
                         use_huber: bool, delta: float, eps: float,
                         gtd_t=None):
    """Fused first-order loss + gradient over frozen lists.

    d: [Tf, Kf, F]; gt_t/mask_t: [Tf, P, 3]/[Tf, P, 1] tiled ground truth;
    ea/eb: exposure scalars. Returns (dd [Tf, Kf, F] = d(sum hub^2)/d(d),
    dd_dep [Tf, Kf, F] = d(sum r_d^2)/d(d) or None,
    sums [Tf, 8] per-tile partials — see _fo_grad_kernel). With gtd_t
    ([Tf, P, 1] tiled gt depth) the RGB-D variant runs (second reverse
    chain for the depth term). NOT itself differentiable;
    render_fo_grad_tiles assembles the full 8-dim gradient."""
    n_tiles, kf, _ = d.shape
    p = pmat.shape[1]
    rgbd = gtd_t is not None
    # bt=8 OOMs the 16M scoped-VMEM limit at Kf=96 (17.67M, measured on v5e:
    # this kernel holds the forward chain AND the reverse-blend temporaries
    # alive together); bt=4 halves the [bt*Kf, P] intermediates and fits.
    # The RGB-D variant keeps a SECOND reverse chain's temporaries alive too
    # — bt=2 keeps it safely inside the scoped limit.
    bt, kc = _pick_bt_kc(n_tiles, kf, want=2 if rgbd else 4)
    sc = jnp.stack([ea, eb]).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
        pl.BlockSpec((6, p), lambda g: (0, 0)),
        pl.BlockSpec((bt, p, 3), lambda g: (g, 0, 0)),
        pl.BlockSpec((bt, p, 1), lambda g: (g, 0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
        pl.BlockSpec((1, bt, 8), lambda g: (g, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, kf, _F), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles // bt, bt, 8), jnp.float32),
    ]
    args = [tx0, ty0, sc, d, pmat, gt_t, mask_t]
    if rgbd:
        in_specs.append(pl.BlockSpec((bt, p, 1), lambda g: (g, 0, 0)))
        out_specs.insert(1, pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)))
        out_shape.insert(1, jax.ShapeDtypeStruct((n_tiles, kf, _F),
                                                 jnp.float32))
        args.append(gtd_t)
    outs = pl.pallas_call(
        functools.partial(_fo_grad_kernel, width=width, height=height,
                          bt=bt, kc=kc, use_huber=use_huber,
                          delta=delta, eps=eps, rgbd=rgbd),
        grid=(n_tiles // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if rgbd:
        dd, dd_dep, sums = outs
    else:
        (dd, sums), dd_dep = outs, None
    return dd, dd_dep, sums.reshape(n_tiles, 8)


def _map_grad_kernel(tx0_ref, ty0_ref, sc_ref, dat_ref, pmat_ref, gt_ref,
                     mask_ref, *refs, width: int, height: int, bt: int,
                     kc: int, use_exposure: bool, alpha: float,
                     m_rgb: float, m_dep: float, eps: float, rgbd: bool,
                     with_madd: bool = False):
    """Fused mapping loss + gradient: primal blend + masked-L1 chain +
    reverse blend in ONE pass.

    Mapping's objective (ops/losses.mapping_loss_rgb[d],
    slam_utils.py:224-253) has only CONSTANT normalizers (means), so unlike
    the tracking fo loss the full output cotangent is computable per-pixel
    in-kernel and a SINGLE reverse chain suffices even for RGB-D (the depth
    term folds into the depth column of g_outs). Replaces the fwd kernel +
    image assembly + XLA elementwise-L1 AD + assembly transpose + bwd
    kernel of the mapping iteration, and never leaves tile space.

    sums [B, 8] per-tile partials: (sum |r_rgb|, sum |r_d|, d/d|ea| raw,
    d/d(eb) raw, 0...). dd is d(loss)/d(rows) with the mean normalizers and
    the alpha mix already applied."""
    madd_ref = None
    if with_madd:
        madd_ref, refs = refs[0], refs[1:]
    if rgbd:
        gtd_ref, dd_ref, sums_ref = refs
    else:
        (dd_ref, sums_ref), gtd_ref = refs, None
    g = pl.program_id(0)
    x0 = jnp.stack([tx0_ref[g * bt + i] for i in range(bt)])
    y0 = jnp.stack([ty0_ref[g * bt + i] for i in range(bt)])
    rows = dat_ref[:]
    if with_madd:
        # in-kernel validity mask: the caller passes raw gathered rows and
        # an additive logo column (0 valid / -1e30 invalid) instead of
        # materializing the masked-concat copy of the whole row array in
        # HBM (74 MB/view-batch at bench shapes, twice per iteration with
        # its transpose). d(logo+madd)/d(logo) = 1, and masked rows blend
        # with w = 0, so dd is exactly the masked pullback.
        rows = jnp.concatenate(
            [rows[:, :, :_LOGO],
             rows[:, :, _LOGO:_LOGO + 1] + madd_ref[:],
             rows[:, :, _LOGO + 1:]], axis=-1,
        )
    pmat = pmat_ref[:]
    bsz, kf, _ = rows.shape
    outs = None
    for _, f in _forward_chunks(rows, x0, y0, pmat, width, height, kc):
        o = _outs_from(f["w"], f["feats"], bt)
        outs = o if outs is None else outs + o              # [B, P, 8]

    col = _cols(outs, 0, 3)                                 # [B, P, 3]
    gt = gt_ref[:]                                          # [B, P, 3]
    mk = mask_ref[:]                                        # [B, P, 1]
    if use_exposure:
        e = jnp.abs(sc_ref[0]) + eps
        image_ab = e * col + sc_ref[1]
    else:
        e = 1.0
        image_ab = col
    r = (image_ab - gt) * mk                                # [B, P, 3]
    sgn = jnp.sign(r)
    w_rgb = (alpha if rgbd else 1.0) / m_rgb
    g_col = (w_rgb * e) * sgn * mk

    def tile_sum(x):                                        # [B,P,C] -> [B,1]
        return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

    l_rgb = tile_sum(jnp.abs(r))
    gea = tile_sum(sgn * mk * col)                          # x w_rgb sign(ea) outside
    geb = tile_sum(sgn * mk)
    z = jnp.zeros_like(l_rgb)
    zero1 = jnp.zeros_like(_cols(outs, 4, 5))
    if rgbd:
        dep = _cols(outs, 3, 4)                             # [B, P, 1]
        gtd = gtd_ref[:]
        dm = (gtd > 0.01).astype(jnp.float32)
        r_d = (dep - gtd) * dm
        g_dep = ((1.0 - alpha) / m_dep) * jnp.sign(r_d) * dm
        l_dep = tile_sum(jnp.abs(r_d))
    else:
        g_dep = zero1
        l_dep = z
    g_outs = jnp.concatenate(
        [g_col, g_dep, zero1, zero1, zero1, zero1], axis=-1
    )                                                       # [B, P, 8]
    suffix = None
    for j, f in _reverse_chunks(rows, x0, y0, pmat, width, height, kc):
        dd_j, suffix = _dd_from_gouts(f, pmat, g_outs, bsz, kc, suffix)
        dd_ref[:, j * kc:(j + 1) * kc, :] = dd_j
    sums_ref[:] = jnp.concatenate(
        [l_rgb, l_dep, gea, geb, z, z, z, z], axis=1
    )[None]


def map_grad_lists_pallas(d, tx0, ty0, pmat, gt_t, mask_t, ea, eb,
                          tile: int, width: int, height: int,
                          interpret: bool, use_exposure: bool, alpha: float,
                          eps: float, gtd_t=None, madd=None,
                          px_frac: float = 1.0):
    """Fused mapping loss + gradient over frozen lists (see
    _map_grad_kernel). d: [Tf, Kf, F]; gt_t/mask_t (and gtd_t for RGB-D):
    tiled full-image ground truth. Returns (dd [Tf, Kf, F] with normalizers
    applied, sums [Tf, 8]). NOT itself differentiable;
    renderer.render_map_grad assembles the parameter/pose/exposure grads.

    `madd` [Tf, Kf] f32 (0 valid / -1e30 invalid): apply the per-row
    validity mask to the logo column IN-KERNEL — `d` is then the raw
    gathered rows and the caller skips the masked-concat copy.

    `px_frac` scales the mean normalizers for a tile-subset call (see
    renderer.map_grad_from_rows): with S of Tf tiles the expected residual
    sum is px_frac x the full sum, so dividing the means by px_frac keeps
    dd an unbiased full-image gradient estimate."""
    n_tiles, kf, _ = d.shape
    p = pmat.shape[1]
    rgbd = gtd_t is not None
    bt, kc = _pick_bt_kc(n_tiles, kf, want=4)
    sc = jnp.stack([ea, eb]).astype(jnp.float32)
    m_rgb = 3.0 * width * height * px_frac
    m_dep = float(width * height) * px_frac
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
        pl.BlockSpec((6, p), lambda g: (0, 0)),
        pl.BlockSpec((bt, p, 3), lambda g: (g, 0, 0)),
        pl.BlockSpec((bt, p, 1), lambda g: (g, 0, 0)),
    ]
    args = [tx0, ty0, sc, d, pmat, gt_t, mask_t]
    if madd is not None:
        # [Tf, Kf, 1] so both trailing block dims equal the array dims
        # (Mosaic rejects a (bt, kf) block: bt is neither a multiple of 8
        # nor the full Tf)
        in_specs.append(pl.BlockSpec((bt, kf, 1), lambda g: (g, 0, 0)))
        args.append(madd[:, :, None])
    if rgbd:
        in_specs.append(pl.BlockSpec((bt, p, 1), lambda g: (g, 0, 0)))
        args.append(gtd_t)
    dd, sums = pl.pallas_call(
        functools.partial(_map_grad_kernel, width=width, height=height,
                          bt=bt, kc=kc, use_exposure=use_exposure,
                          alpha=alpha, m_rgb=m_rgb, m_dep=m_dep, eps=eps,
                          rgbd=rgbd, with_madd=madd is not None),
        grid=(n_tiles // bt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, bt, 8), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, kf, _F), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles // bt, bt, 8), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return dd, sums.reshape(n_tiles, 8)


def _jvp8_kernel(tx0_ref, ty0_ref, dat_ref, tan_ref, pmat_ref,
                 outs_ref, touts_ref, *,
                 width: int, height: int, bt: int, n_tan: int, kc: int):
    g = pl.program_id(0)
    x0 = jnp.stack([tx0_ref[g * bt + i] for i in range(bt)])
    y0 = jnp.stack([ty0_ref[g * bt + i] for i in range(bt)])
    rows = dat_ref[:]
    tans = tan_ref[:]
    pmat = pmat_ref[:]
    bsz, kf, _ = rows.shape
    p = pmat.shape[1]
    pxl = _ax(pmat, 3, 0)
    pyl = _ax(pmat, 4, 0)

    outs = None
    touts = [None] * bt
    # per-tangent carry: global prefix sum of -alpha_t/one_minus up to the
    # chunk entry (the tangent of log-transmittance)
    S_t = [None] * n_tan
    for j, f in _forward_chunks(rows, x0, y0, pmat, width, height, kc):
        o = _outs_from(f["w"], f["feats"], bt)
        outs = o if outs is None else outs + o

        live_a = f["ok"] & (f["alpha"] < 0.99)
        inv_om = 1.0 / f["one_minus"]
        a, bq, cc = f["a"], f["b"], f["c"]
        ul, vl = f["ul"], f["vl"]
        dx = ul[:, :, None] - pxl[None, None, :]
        dy = vl[:, :, None] - pyl[None, None, :]
        # tangent-independent [B, Kc, P] factors, hoisted out of the
        # 6-tangent loop (the quadratic monomials and the conic gradient
        # are shared by every tangent; recomputing them per tangent
        # sextuples the dominant VPU work of this kernel)
        xx = -0.5 * (dx * dx)
        yy = -0.5 * (dy * dy)
        xy = dx * dy
        gx = a[:, :, None] * dx + bq[:, :, None] * dy
        gy = bq[:, :, None] * dx + cc[:, :, None] * dy
        w_ts, feats_ts = [], []
        for k in range(n_tan):
            drows = _kchunk(_ax(tans, k, 1), j, kc)     # [B, Kc, F]
            u_t = _col(drows, _U)[:, :, None]
            v_t = _col(drows, _V)[:, :, None]
            a_t = _col(drows, _CA)[:, :, None]
            b_t = _col(drows, _CB)[:, :, None]
            c_t = _col(drows, _CC)[:, :, None]
            logo_t = _col(drows, _LOGO)[:, :, None]
            # tangent of s = -0.5(a dx^2 + c dy^2) - b dx dy + logo, with
            # d(dx) = u_t, d(dy) = v_t (pixel coords are constants)
            s_t = (
                a_t * xx + c_t * yy
                - b_t * xy
                - gx * u_t
                - gy * v_t
                + logo_t
            )
            alpha_t = jnp.where(live_a, f["alpha"] * s_t, 0.0)
            c_sum = -alpha_t * inv_om
            prefix = _cumsum_b(c_sum, reverse=False)
            if S_t[k] is not None:
                prefix = prefix + S_t[k]
                S_t[k] = S_t[k] + jnp.sum(c_sum, axis=1, keepdims=True)
            else:
                S_t[k] = jnp.sum(c_sum, axis=1, keepdims=True)
            texcl_t = f["t_excl"] * prefix
            w_ts.append(jnp.where(
                f["contrib"],
                alpha_t * f["t_excl"] + f["alpha"] * texcl_t,
                0.0,
            ))
            feats_ts.append(jnp.concatenate(
                [
                    _cols(drows, _R0, _R0 + 3),
                    _cols(drows, _Z, _Z + 1),
                    jnp.zeros((bsz, kc, 4), jnp.float32),
                ],
                axis=-1,
            ))
        w_t = jnp.stack(w_ts, axis=1)                   # [B, T, Kc, P]
        feats_t = jnp.stack(feats_ts, axis=1)           # [B, T, Kc, 8]
        for b in range(bt):
            # term 1: per-tile shared feats, all tangents as one
            # [T*P, Kc] matmul
            lhs = _ax(w_t, b, 0).transpose(0, 2, 1).reshape(n_tan * p, kc)
            t1 = _dot3(lhs, _ax(f["feats"], b, 0)).reshape(n_tan, p, 8)
            # term 2: shared w, tangent feats stacked along columns (lane
            # concat — reshapes may not merge the minor dim)
            ftb = _ax(feats_t, b, 0)                        # [T, Kc, 8]
            rhs = jnp.concatenate(
                [_ax(ftb, t, 0) for t in range(n_tan)], axis=1
            )                                               # [Kc, T*8]
            t2 = _unstack_lanes(_dot3(_ax(f["w"], b, 0).T, rhs), n_tan, 8)
            tb = t1 + t2
            touts[b] = tb if touts[b] is None else touts[b] + tb
    outs_ref[:] = outs
    for b in range(bt):
        touts_ref[b] = touts[b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_lists_pallas(d, tx0, ty0, pmat, tile: int, width: int, height: int,
                       interpret: bool):
    """Blend frozen per-tile lists. d: [Tf, Kf, F] (invalid rows: LOGO =
    -1e30); tx0/ty0: [Tf] f32 tile origins; pmat: [6, P]. Returns
    [Tf, P, 8] with columns (r, g, b, depth, acc, pad3). Differentiable in d.
    """
    return _fwd(d, tx0, ty0, pmat, tile, width, height, interpret)


def _fwd(d, tx0, ty0, pmat, tile, width, height, interpret):
    n_tiles, kf, _ = d.shape
    p = pmat.shape[1]
    bt, kc = _pick_bt_kc(n_tiles, kf)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, width=width, height=height, bt=bt,
                          kc=kc),
        grid=(n_tiles // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
            pl.BlockSpec((6, p), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, p, 8), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, p, 8), jnp.float32),
        interpret=interpret,
    )(tx0, ty0, d, pmat)


def _vjp_fwd(d, tx0, ty0, pmat, tile, width, height, interpret):
    outs = _fwd(d, tx0, ty0, pmat, tile, width, height, interpret)
    return outs, (d, tx0, ty0, pmat)


def _vjp_bwd(tile, width, height, interpret, res, g_outs):
    d, tx0, ty0, pmat = res
    n_tiles, kf, _ = d.shape
    p = pmat.shape[1]
    bt, kc = _pick_bt_kc(n_tiles, kf)
    dd = pl.pallas_call(
        functools.partial(_bwd_kernel, width=width, height=height, bt=bt,
                          kc=kc),
        grid=(n_tiles // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
            pl.BlockSpec((6, p), lambda g: (0, 0)),
            pl.BlockSpec((bt, p, 8), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, kf, _F), jnp.float32),
        interpret=interpret,
    )(tx0, ty0, d, pmat, g_outs)
    return dd, jnp.zeros_like(tx0), jnp.zeros_like(ty0), jnp.zeros_like(pmat)


blend_lists_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def blend_lists_jvp8(d, d_tan, tx0, ty0, pmat, tile: int, width: int,
                     height: int, interpret: bool):
    """Primal blend + n_tan simultaneous tangent pushforwards.

    d: [Tf, Kf, F]; d_tan: [Tf, n_tan, Kf, F] row tangents. Returns
    (outs [Tf, P, 8], touts [Tf, n_tan, P, 8]). NOT differentiable — this is
    the explicit forward-mode path for the sketched second-order tracker.
    """
    n_tiles, kf, _ = d.shape
    n_tan = d_tan.shape[1]
    p = pmat.shape[1]
    # n_tan tangent pushforwards multiply the kernel's live VMEM by ~n_tan;
    # bt=2 at Kf=96/P=256 measured 11M scoped (bt=4 OOMed the 16M limit)
    bt, kc = _pick_bt_kc(n_tiles, kf, want=2)
    return pl.pallas_call(
        functools.partial(_jvp8_kernel, width=width, height=height,
                          bt=bt, n_tan=n_tan, kc=kc),
        grid=(n_tiles // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, kf, _F), lambda g: (g, 0, 0)),
            pl.BlockSpec((bt, n_tan, kf, _F), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((6, p), lambda g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, p, 8), lambda g: (g, 0, 0)),
            pl.BlockSpec((bt, n_tan, p, 8), lambda g: (g, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, n_tan, p, 8), jnp.float32),
        ],
        interpret=interpret,
    )(tx0, ty0, d, d_tan, pmat)
