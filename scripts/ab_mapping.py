#!/usr/bin/env python
"""A/B the batched mapping render (MapConfig.batch_render) on the TPU.

BENCH_r02 showed mapping at 4.91 BA iters/s with batch_render=True vs the
round-1 sequential lax.map path's 6.65 — this measures both flavors (and
with/without frozen lists) at the bench workload so the default can be set
from data rather than expectation.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=True)
monogs_tpu.enable_compilation_cache()

from monogs_tpu.data.synthetic import make_synthetic_scene, orbit_pose  # noqa: E402
from monogs_tpu.models import gaussian_map as gm  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.slam.mapping import CamBatch, MapConfig, map_iters  # noqa: E402

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                  width=640, height=480)
cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96,
                   macro_chunk=16, backend="pallas_lists")
scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
rj = jax.jit(lambda T: render(scene, T, intr,
                              cfg._replace(with_n_touched=False)))
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
m0 = gm.insert(gm.new_map(cap), leaves, jnp.int32(n), kf_id=0)
b = 10
h, w = intr.height, intr.width
cams = CamBatch(
    gt_image=jnp.stack(frames),
    gt_depth=jnp.zeros((b, 1, h, w)),
    mapping_mask=jnp.ones((b, 1, h, w)),
    T=jnp.stack(poses),
    ea=jnp.ones((b,)), eb=jnp.zeros((b,)),
    valid=jnp.ones((b,), bool),
    opt_pose=jnp.array([False] + [True] * 4 + [False] * 5),
    opt_exposure=jnp.array([False] + [True] * (b - 1)),
)
hyper = gm.MapHyper()
N_ITERS = 30

for name, kw in [
    ("batch_render=True             ", dict(batch_render=True,
                                            fused_grad=False)),
    ("batch_render=False            ", dict(batch_render=False,
                                            fused_grad=False)),
    ("fused_grad=True (round 3)     ", dict(batch_render=False,
                                            fused_grad=True)),
]:
    mcfg = MapConfig(monocular=True, window_size=8, pose_window=5, **kw)

    def run(iters):
        out = map_iters(m0, cams, iters, jnp.int32(100),
                        jax.random.PRNGKey(0), intr, cfg, mcfg, hyper)
        jax.block_until_ready(out[0].params.xyz)
        return out

    run(1)
    t0 = time.time()
    run(N_ITERS)
    dt = time.time() - t0
    print(f"[ab-mapping] {name}: {N_ITERS/dt:6.2f} BA iters/s "
          f"({dt/N_ITERS*1000:.1f} ms/iter)", flush=True)
