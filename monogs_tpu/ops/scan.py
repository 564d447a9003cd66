"""TPU-friendly cumulative ops.

XLA's native cumsum/cumprod lower to lane-axis shifts which run at a tiny
fraction of VPU throughput for the shapes the renderer needs. These variants
restructure the scan:

  - blocked_cumsum: within-block prefix sums as a triangular-matrix matmul
    (MXU) + a tiny cross-block exclusive scan,
  - blocked_cumprod: two-level unrolled product scan (a handful of full-width
    vector multiplies instead of a length-K sequential chain).

Both are plain jnp (differentiable, vmappable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _tri_np(block: int):
    # lower-triangular (inclusive) [block, block] as numpy — cached host-side
    # only (caching a jnp array would leak tracers out of jit scopes)
    import numpy as np

    return np.tril(np.ones((block, block), np.float32))


def _tri_cached(block: int):
    return jnp.asarray(_tri_np(block))


def blocked_cumsum(x, block: int = 256):
    """Inclusive cumsum along the last axis via per-block triangular matmuls.

    x: [..., M] float or int; M is padded up to a multiple of `block`.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    m = xf.shape[-1]
    pad = (-m) % block
    if pad:
        xf = jnp.pad(xf, [(0, 0)] * (xf.ndim - 1) + [(0, pad)])
    nb = xf.shape[-1] // block
    xb = xf.reshape(xf.shape[:-1] + (nb, block))
    tri = _tri_cached(block)
    # within-block inclusive cumsum: [.., nb, block] @ [block, block]^T.
    # HIGHEST precision: counts must stay exact integers in f32 (the MXU's
    # default bf16 passes round above 256).
    within = jnp.einsum(
        "...nb,cb->...nc", xb, tri,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # block totals -> exclusive scan across nb (nb is small; use jnp.cumsum,
    # which is fine at this size, minus the block itself)
    totals = within[..., -1]
    offsets = jnp.cumsum(totals, axis=-1) - totals
    out = within + offsets[..., None]
    out = out.reshape(xf.shape[:-1] + (nb * block,))[..., :m]
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.round(out).astype(orig_dtype)
    return out


def blocked_cumprod_excl(x, axis: int = 0, block: int = 16):
    """Exclusive cumprod along `axis` (prepends 1, drops the last element)
    via a two-level unrolled scan. x: positive values (e.g. 1 - alpha).

    Used by the blend for the transmittance T_excl; the axis length must be
    a multiple of `block`.
    """
    x = jnp.moveaxis(x, axis, 0)
    k = x.shape[0]
    assert k % block == 0, (k, block)
    nb = k // block
    xb = x.reshape((nb, block) + x.shape[1:])

    # within-block inclusive cumprod, unrolled (block is small)
    parts = [xb[:, 0]]
    for i in range(1, block):
        parts.append(parts[-1] * xb[:, i])
    within = jnp.stack(parts, axis=1)  # [nb, block, ...]

    # cross-block exclusive products (nb small; unrolled too)
    totals = within[:, -1]  # [nb, ...]
    offs = [jnp.ones_like(totals[0])]
    for i in range(1, nb):
        offs.append(offs[-1] * totals[i - 1])
    offsets = jnp.stack(offs, axis=0)  # [nb, ...]

    incl = within * offsets[:, None]
    incl = incl.reshape((k,) + x.shape[1:])
    excl = jnp.concatenate([jnp.ones_like(incl[:1]), incl[:-1]], axis=0)
    return jnp.moveaxis(excl, 0, axis), jnp.moveaxis(incl, 0, axis)
