"""Gather-only tile binning: cumsum + searchsorted compaction.

The CUDA rasterizer bins Gaussians to 16x16 tiles by duplicating instances and
radix-sorting (tile | depth) keys — a scatter-heavy pattern that maps poorly
to TPUs. Instead we depth-sort the Gaussians once globally (order within any
tile is then automatically front-to-back) and, per tile, *compact* the indices
of overlapping Gaussians into a fixed-capacity list using a prefix sum and a
vectorized binary search. Both primitives are gather-only and vectorize over
tiles with vmap; no scatters appear anywhere in the forward pass.

If more than `capacity` Gaussians overlap a tile, the farthest ones are
dropped — they are the most-occluded and contribute (near-)zero weight after
transmittance saturation, matching the CUDA early-termination behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_sort(mask, capacity: int):
    """Indices of the first `capacity` set bits of `mask`, in order — via a
    single jax.lax.sort of masked indices (unset bits sort to the sentinel M).

    Equivalent to compact_indices but one fused sort instead of a lane-axis
    cumsum + binary search; dramatically faster on TPU. Returns
    (idx [capacity] int32, valid [capacity] bool).
    """
    m = mask.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    keys = jnp.where(mask, iota, jnp.int32(m))
    if m < capacity:
        keys = jnp.pad(keys, (0, capacity - m), constant_values=m)
    skeys = jax.lax.sort(keys, is_stable=False)[:capacity]
    valid = skeys < m
    return jnp.where(valid, skeys, 0), valid


def compact_indices(mask, capacity: int):
    """Indices of the first `capacity` set bits of `mask`, in order.

    mask: [M] bool. Returns (idx [capacity] int32, valid [capacity] bool,
    total int32). Entries beyond the population count point at 0 and are
    flagged invalid.
    """
    cs = jnp.cumsum(mask.astype(jnp.int32))
    total = cs[-1]
    targets = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(cs, targets, side="left").astype(jnp.int32)
    valid = targets <= jnp.minimum(total, capacity)
    idx = jnp.where(valid, idx, 0)
    return idx, valid, total


def tile_overlap_mask(mean2d, radius, valid, x0, y0, x1, y1):
    """Which Gaussians' 3-sigma boxes intersect the pixel rect [x0,x1)x[y0,y1).

    mean2d: [M, 2], radius: [M]; rect bounds are scalars (pixel units, the
    rect spans pixel centers x0..x1-1).
    """
    u = mean2d[:, 0]
    v = mean2d[:, 1]
    return (
        valid
        & (u + radius >= x0)
        & (u - radius <= x1 - 1)
        & (v + radius >= y0)
        & (v - radius <= y1 - 1)
    )
