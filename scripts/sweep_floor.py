#!/usr/bin/env python
"""Decompose the tracker's CONVERGED noise floor on TPU.

Round-2 bench finding: in a chained run with constant-velocity seeding, the
tracker's per-frame converged error (~4-5 mm at the bench config) is fed
back through the CV extrapolation (seed error ~= 2*err_prev + err_prev2 +
jitter), so the floor sets the whole chain's drift. This isolates the floor:
every frame is seeded at gt pose composed with a FIXED 15 mm / 0.3 deg
offset, so the measured tracked error is pure converged bias/noise, and
sweeps the suspected contributors:

  - sketch_dim   (count-sketch compression noise in the LM solve)
  - so_tile_frac (fixed-subset tile subsampling bias, second order)
  - rebin_so_iters (frozen fine-list staleness inside the so loop)
  - k_fine       (per-tile capacity truncation bias)
  - so_max_iter  (is the LM loop even iteration-bound?)

Usage: python scripts/sweep_floor.py [quick|full]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=True)
monogs_tpu.enable_compilation_cache()
from monogs_tpu.data.synthetic import make_synthetic_scene, orbit_pose  # noqa: E402
from monogs_tpu.ops import se3  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.slam.frame import make_frame_data  # noqa: E402
from monogs_tpu.slam.tracking import TrackConfig, track_frame  # noqa: E402

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                  width=640, height=480)
BASE_CFG = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96,
                        macro_chunk=16, backend="pallas_lists")
scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)

N_FRAMES = 6
rj = jax.jit(lambda T: render(scene, T, intr,
                              BASE_CFG._replace(with_n_touched=False)))
frames, poses = [], []
for i in range(N_FRAMES):
    T = orbit_pose((i * 3) / 400.0, trans_amp=0.8, rot_amp=0.15)
    out = rj(T)
    frames.append(make_frame_data(jnp.clip(out.image, 0, 1), None,
                                  1.1, 0.01, "tum"))
    poses.append(T)
jax.block_until_ready(frames[-1].gt_image)

# fixed seed offset: ~15 mm translation + ~0.3 deg rotation (a mid-chain CV
# seed error magnitude)
OFF = se3.se3_exp(jnp.array([0.009, -0.009, 0.006, 0.003, -0.003, 0.002]))


def run_variant(name, **kw):
    tkw = dict(
        monocular=True, fo_max_iter=40, so_max_iter=10,
        stack_dim=16, sketch_dim=64, bin_margin=8.0,
        fo_tile_frac=0.25, so_tile_frac=0.25, rebin_so_iters=3,
    )
    k_fine = kw.pop("k_fine", 96)
    tkw.update(kw)
    cfg = BASE_CFG._replace(k_fine=k_fine)
    tcfg = TrackConfig(**tkw)
    errs, rots, ts = [], [], []
    for i in range(N_FRAMES):
        seed = OFF @ poses[i]
        t0 = time.time()
        r = track_frame(scene, frames[i], seed, jnp.float32(1.0),
                        jnp.float32(0.0), jax.random.PRNGKey(100 + i),
                        intr, cfg, tcfg)
        jax.block_until_ready(r.T)
        ts.append(time.time() - t0)
        te, re = se3.pose_diff(jnp.asarray(r.T, jnp.float64),
                               jnp.asarray(poses[i], jnp.float64))
        errs.append(float(te) * 1000)
        rots.append(float(re) * 180 / np.pi)
    print(f"{name:44s} err {np.mean(errs):5.2f}mm (max {np.max(errs):5.2f}) "
          f"rot {np.mean(rots):.3f}deg  {np.median(ts[1:])*1000:6.1f} ms",
          flush=True)
    return np.mean(errs), np.median(ts[1:]) * 1000


mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
run_variant("base (sketch64 frac.25/.25 rebin3 k96)")
run_variant("sketch_dim=128", sketch_dim=128)
run_variant("sketch_dim=256", sketch_dim=256)
run_variant("so_tile_frac=0.5", so_tile_frac=0.5)
run_variant("so_tile_frac=1.0", so_tile_frac=1.0)
run_variant("rebin_so_iters=10", rebin_so_iters=10)
run_variant("so_max_iter=20", so_max_iter=20)
if mode == "full":
    run_variant("k_fine=128", k_fine=128)
    run_variant("sketch128 + so_frac0.5", sketch_dim=128, so_tile_frac=0.5)
    run_variant("sketch256 + so_frac0.5", sketch_dim=256, so_tile_frac=0.5)
    run_variant("sketch256 + so_frac1.0", sketch_dim=256, so_tile_frac=1.0)
    run_variant("sketch256 + rebin10", sketch_dim=256, rebin_so_iters=10)
    run_variant("fo_tile_frac=0.5 too", fo_tile_frac=0.5)
    run_variant("stack_dim=32", stack_dim=32)
