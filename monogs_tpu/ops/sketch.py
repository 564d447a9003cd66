"""Count-sketch utilities for the second-order (sketched Gauss-Newton) tracker.

The reference builds a count-sketch over the m = H*W per-pixel residuals by
drawing a random permutation of the pixels, slicing it into
stack_dim*sketch_dim contiguous chunks, and assigning each pixel of chunk i to
bucket i with a Rademacher (+-1) weight (/root/reference/utils/
slam_frontend.py:269-338, tests/sketch_utils.py:23-35). The sketched residual
Sf and sketched Jacobian SJ = S @ J then feed a damped 8-dim least-squares
solve (slam_frontend.py:637-698).

On TPU we realize S @ v as a gather + reshape + row-sum: v[perm] reshaped to
[d, chunk] and summed over chunk — no scatter needed. SJ comes from
jax.linearize of the bucketed-residual function (8 input dims => 8 cheap
linear evaluations), replacing the CUDA kernel's scattered backward pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SketchSpec(NamedTuple):
    """One draw of the count sketch.

    perm:    [d * chunk] int32 — pixel index for each (bucket, slot) pair,
             laid out bucket-major (first `chunk` entries are bucket 0, ...).
    signs:   [m] float32 — Rademacher weights per pixel.
    d:       number of buckets (stack_dim * sketch_dim).
    chunk:   pixels per bucket (m // d).
    """

    perm: jax.Array
    signs: jax.Array
    d: int
    chunk: int


def make_sketch(key, m: int, stack_dim: int, sketch_dim: int) -> SketchSpec:
    # NOTE: deliberately not jitted on its own — jit would trace the static
    # d/chunk fields into arrays; callers jit the enclosing computation.
    d = stack_dim * sketch_dim
    chunk = m // d
    k1, k2 = jax.random.split(key)
    perm = jax.random.permutation(k1, m)[: d * chunk].astype(jnp.int32)
    signs = (
        jax.random.randint(k2, (m,), 0, 2).astype(jnp.float32) * 2.0 - 1.0
    )
    return SketchSpec(perm=perm, signs=signs, d=d, chunk=chunk)


def apply_sketch(residual_flat, spec: SketchSpec):
    """S @ r for a flat per-pixel residual [m] -> [d].

    Matches the reference's bucketed sum of Rademacher-weighted residuals
    (slam_frontend.py:646-649).
    """
    weighted = residual_flat * spec.signs
    gathered = weighted[spec.perm]  # [d * chunk]
    return gathered.reshape(spec.d, spec.chunk).sum(axis=-1)


def damped_lstsq(SJ, Sf, lam):
    """Solve min_x ||[SJ; sqrt(lam) I] x + [Sf; 0]||_2 (slam_frontend.py:672-679).

    n is tiny (8) so we solve the normal equations directly; the damping makes
    them well conditioned.
    """
    n = SJ.shape[1]
    H = SJ.T @ SJ + lam * jnp.eye(n, dtype=SJ.dtype)
    g = SJ.T @ Sf
    return -jnp.linalg.solve(H, g)
