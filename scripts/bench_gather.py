#!/usr/bin/env python
"""Microbench the mapping iteration's index-traffic legs on TPU hardware.

scripts/profile_mapping.py attributed the 144 ms mapping iteration:
preprocess 0.2 / row gather 17 / fused blend kernel 44 / VJP pullback
(scatter-add) 46 / other 37 ms. The gather+scatter legs move ~74 MB of
64-byte rows per direction per iteration at only ~4 GB/s effective —
row-setup-bound, not bandwidth-bound. This measures the alternatives the
frozen-list structure allows (indices are FROZEN for rebin_every=25
iterations, so any sort/permutation of them is free at iteration time):

  gather/map10      current: lax.map over 10 views of packed[idx]
  gather/flat       ONE flattened [10*Tf*Kf]-row gather
  gather/sorted     flat gather with ASCENDING indices (sortedness bound)
  scatter/at-add    current VJP: 10x zeros.at[idx].add(dd), summed
  scatter/segsum    frozen-perm: dd_flat[perm] gather + sorted segment_sum
  segsum-only       the segment_sum alone (lower bound of that leg)
  adam+stats        the 'other 37 ms': adam_step + densify stats + iso
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=False)  # outer `timeout` guards the run; the roundtrip probe adds a flaky 2x240s coin flip (relay dispatch varies 7-185s)
monogs_tpu.enable_compilation_cache()

N = 1 << 17
TF = 1200
KF = 96
B = 10
F = 16

key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (N, F), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (B, TF, KF), 0, N)
dd = jax.random.normal(jax.random.PRNGKey(2), (B, TF, KF, F), jnp.float32)

flat_idx = idx.reshape(B, TF * KF)
all_idx = idx.reshape(-1)
perm = jnp.argsort(all_idx)
sorted_ids = all_idx[perm]
dd_flat = dd.reshape(-1, F)


def g_map10(p):
    return jnp.sum(jax.lax.map(lambda ix: p[ix], flat_idx))


def g_flat(p):
    return jnp.sum(p[all_idx])


def g_sorted(p):
    return jnp.sum(p[sorted_ids])


def s_at_add(d):
    def one(ix_d):
        ix, dv = ix_d
        return jnp.zeros((N, F)).at[ix].add(dv)

    return jnp.sum(
        jnp.sum(jax.lax.map(one, (flat_idx, d.reshape(B, TF * KF, F))), 0)
    )


def s_at_add_single(d):
    return jnp.sum(jnp.zeros((N, F)).at[all_idx].add(d.reshape(-1, F)))


def s_segsum(d):
    ds = d.reshape(-1, F)[perm]
    g = jax.ops.segment_sum(ds, sorted_ids, num_segments=N,
                            indices_are_sorted=True)
    return jnp.sum(g)


def segsum_only(d):
    g = jax.ops.segment_sum(d.reshape(-1, F), sorted_ids, num_segments=N,
                            indices_are_sorted=True)
    return jnp.sum(g)


from monogs_tpu.models import gaussian_map as gm  # noqa: E402

m0 = gm.new_map(N, sh_degree=0)
m0 = m0._replace(active=jnp.ones((N,), bool))
hyper = gm.MapHyper()
g_offs = jax.random.normal(jax.random.PRNGKey(3), (B, N, 2))
radii = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (B, N)))


def adam_stats(p):
    grads = gm.ParamLeaves(
        xyz=p[:, :3], sh=p[:, 3:6].reshape(N, 1, 3), log_scale=p[:, 6:9],
        quat=p[:, 9:13], opa_logit=p[:, 13:14],
    )
    vis = radii > 0.5
    norms = jnp.linalg.norm(g_offs, axis=-1)
    accum = jnp.sum(jnp.where(vis, norms, 0.0), 0)
    denom = jnp.sum(vis, 0).astype(jnp.float32)
    rad = jnp.max(jnp.where(vis, radii, 0.0), 0)
    mc = m0._replace(
        grad_accum=m0.grad_accum + accum, denom=m0.denom + denom,
        max_radii2d=jnp.maximum(m0.max_radii2d, rad),
    )
    mc = gm.adam_step(mc, grads, hyper, step=10)
    return jnp.sum(mc.params.xyz) + jnp.sum(mc.grad_accum)


def timed(fn, arg, label, reps=(1, 9)):
    """Deltas through one jitted scan; `arg` is a REAL jit argument (a
    closure capture would embed it as a multi-MB HLO literal that ships
    through the axon relay on every compile)."""
    outs = {}
    for r in reps:
        @jax.jit
        def prog(a, r=r):
            def body(c, _):
                return c + fn(a + c * 1e-30), None

            return jax.lax.scan(body, jnp.float32(0.0), None, length=r)[0]

        jax.block_until_ready(prog(arg))
        t0 = time.time()
        jax.block_until_ready(prog(arg))
        outs[r] = time.time() - t0
    r0, r1 = reps
    per = (outs[r1] - outs[r0]) / (r1 - r0) * 1000
    print(f"[gather-bench] {label:<22} {per:8.2f} ms/iter", flush=True)


timed(g_map10, packed, "gather/map10 (current)")
timed(g_flat, packed, "gather/flat")
timed(g_sorted, packed, "gather/sorted")
timed(s_at_add, dd, "scatter/at-add x10 (cur)")
timed(s_at_add_single, dd, "scatter/at-add single")
timed(s_segsum, dd, "scatter/perm+segsum")
timed(segsum_only, dd, "segsum only")
timed(adam_stats, packed, "adam+densify stats")
