#!/usr/bin/env python
"""A/B mapping tile subsampling (MapConfig.tile_frac) on TPU at bench shapes.

The round-4 attribution (docs/mapping_r4_attribution.md) showed the 138 ms
BA iteration is ~95% per-view x per-row with no separable hot op — the
design-change answer (VERDICT r4 #1a) is to shrink the ROWS: each iteration
renders a fresh random subset of fine tiles per view and scales the loss by
1/frac (the reference's num_pixels subsampling, tile-wise). Cost should
scale ~linearly with frac; this measures real map_iters deltas (the only
attribution that survives the axon relay's sync floor — CLAUDE.md).

Also reports a DESCENT check per frac: 60 iterations from a perturbed map,
final whole-image photometric error vs the full-tile run (subset noise must
average out, not stall the optimization).

Usage: python scripts/ab_tile_frac.py [reps]
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
# perturbed copy for the descent check
kp = jax.random.PRNGKey(7)
m_noisy = m._replace(params=m.params._replace(
    sh=m.params.sh + 0.2 * jax.random.normal(kp, m.params.sh.shape),
))
b = 10
h, w = intr.height, intr.width
cams = CamBatch(
    gt_image=jnp.stack(frames),
    gt_depth=jnp.zeros((b, 1, h, w)),
    mapping_mask=jnp.ones((b, 1, h, w)),
    T=jnp.stack(poses),
    ea=jnp.ones((b,)),
    eb=jnp.zeros((b,)),
    valid=jnp.ones((b,), bool),
    opt_pose=jnp.array([False] + [True] * 4 + [False] * 5),
    opt_exposure=jnp.array([False] + [True] * (b - 1)),
)
hyper = gm.MapHyper()
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3


@jax.jit
def _err_one(gauss, T, frame):
    out = render(gauss, T, intr, cfg)
    return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - frame))


def photometric_err(mm):
    gauss = mm.render_view()
    errs = [_err_one(gauss, poses[i], frames[i]) for i in range(b)]
    return float(jnp.mean(jnp.stack(errs)))


def time_iters(mcfg, label, iters_lo=5, iters_hi=45):
    def run(mm, iters):
        out = map_iters(
            mm, cams, iters, jnp.int32(100), jax.random.PRNGKey(0),
            intr, cfg, mcfg, hyper,
        )
        jax.block_until_ready(out[0].params.xyz)
        return out

    run(m, jnp.int32(iters_lo))  # compile (dynamic trip count: one program)
    best = None
    for _ in range(reps):
        t0 = time.time()
        run(m, jnp.int32(iters_lo))
        t1 = time.time()
        run(m, jnp.int32(iters_hi))
        t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo) * 1000
        best = per if best is None else min(best, per)
    out = run(m_noisy, jnp.int32(60))
    err = photometric_err(out[0])
    print(f"[ab-tile-frac] {label:<18} {best:8.2f} ms/iter "
          f"({1000.0 / best:6.2f} BA iters/s)  descent60 err {err:.4f}",
          flush=True)
    return best


base = MapConfig(monocular=True, window_size=8, pose_window=5)
for frac in (1.0, 0.5, 0.25, 0.125):
    time_iters(base._replace(tile_frac=frac), f"tile_frac={frac}")
