#!/usr/bin/env python
"""Scaling probe for the mapping iteration: which axis carries the cost?

ab_scatter.py showed the 138 ms/iter is insensitive to scatter strategy
(segsum ~0, io_batch WORSE by 32 ms) while bench_gather.py's isolated ops
sum to only ~68 ms (gather 4.4 + scatter 19.5 + kernel 44 + adam ~0).
This varies one axis at a time around the bench point (B=10 views,
k_fine=96, 131k capacity, 640x480) to locate the remaining ~70 ms:

  B=10 / B=5 / B=2      per-view scaling (kernel, gather, scatter legs)
  k_fine 96 -> 64       per-row scaling at fixed views
  rebin_every huge      the frozen-list rebuild cond amortization
  initialization=True   the window pose/exposure Adam + stats legs
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=False)
monogs_tpu.enable_compilation_cache()

from monogs_tpu.data.synthetic import make_synthetic_scene, orbit_pose  # noqa: E402
from monogs_tpu.models import gaussian_map as gm  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.slam.mapping import CamBatch, MapConfig, map_iters  # noqa: E402

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                  width=640, height=480)
cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96,
                   macro_chunk=16, backend="pallas_lists",
                   with_n_touched=False)
scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
rj = jax.jit(lambda T: render(scene, T, intr, cfg))
frames, poses = [], []
for i in range(10):
    T = orbit_pose(i / 400.0, trans_amp=0.8, rot_amp=0.15)
    frames.append(jnp.clip(rj(T).image, 0, 1))
    poses.append(T)
jax.block_until_ready(frames[-1])

n = scene.xyz.shape[0]
cap = 1 << 17
pad = cap - n
leaves = gm.ParamLeaves(
    xyz=jnp.pad(scene.xyz, ((0, pad), (0, 0))),
    sh=jnp.pad(scene.sh, ((0, pad), (0, 0), (0, 0))),
    log_scale=jnp.pad(scene.log_scale, ((0, pad), (0, 0))),
    quat=jnp.pad(scene.quat, ((0, pad), (0, 0))),
    opa_logit=jnp.pad(scene.opa_logit, ((0, pad), (0, 0))),
)
m = gm.insert(gm.new_map(cap), leaves, jnp.int32(n), kf_id=0)
h, w = intr.height, intr.width


def make_cams(b):
    return CamBatch(
        gt_image=jnp.stack(frames[:b]),
        gt_depth=jnp.zeros((b, 1, h, w)),
        mapping_mask=jnp.ones((b, 1, h, w)),
        T=jnp.stack(poses[:b]),
        ea=jnp.ones((b,)),
        eb=jnp.zeros((b,)),
        valid=jnp.ones((b,), bool),
        opt_pose=jnp.array([False] + [True] * (b - 1)),
        opt_exposure=jnp.array([False] + [True] * (b - 1)),
    )


hyper = gm.MapHyper()


def time_iters(cams, mcfg, cfg_, label, init=False,
               iters_lo=5, iters_hi=45):
    def run(iters):
        out = map_iters(
            m, cams, iters, jnp.int32(100), jax.random.PRNGKey(0),
            intr, cfg_, mcfg, hyper, initialization=init,
        )
        jax.block_until_ready(out[0].params.xyz)

    run(jnp.int32(iters_lo))
    best = None
    for _ in range(3):
        t0 = time.time()
        run(jnp.int32(iters_lo))
        t1 = time.time()
        run(jnp.int32(iters_hi))
        t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo) * 1000
        best = per if best is None else min(best, per)
    print(f"[map-scaling] {label:<30} {best:8.2f} ms/iter", flush=True)


base = MapConfig(monocular=True, window_size=8, pose_window=5)
time_iters(make_cams(10), base, cfg, "B=10 (bench point)")
time_iters(make_cams(5), base, cfg, "B=5")
time_iters(make_cams(2), base, cfg, "B=2")
time_iters(make_cams(10), base, cfg._replace(k_fine=64), "k_fine=64")
time_iters(make_cams(10), base._replace(rebin_every=1 << 20), cfg,
           "rebin_every=inf")
time_iters(make_cams(10), base, cfg, "initialization=True", init=True)
