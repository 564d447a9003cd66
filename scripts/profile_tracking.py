#!/usr/bin/env python
"""Marginal per-iteration cost of the fused tracking program on the TPU."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402

monogs_tpu.enable_compilation_cache()
from monogs_tpu.data.synthetic import make_synthetic_scene, orbit_pose  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.slam.frame import make_frame_data  # noqa: E402
from monogs_tpu.slam.tracking import TrackConfig, track_frame  # noqa: E402

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96,
                   macro_chunk=16, backend="pallas_lists")

scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
T0 = orbit_pose(0.0, trans_amp=0.8, rot_amp=0.15)
T1 = orbit_pose(1 / 400.0, trans_amp=0.8, rot_amp=0.15)
img = jnp.clip(render(scene, T1, intr, cfg._replace(with_n_touched=False)).image, 0, 1)
frame = make_frame_data(img, None, 1.1, 0.01, "tum")


def run(fo, so, iters=5):
    tcfg = TrackConfig(monocular=True, fo_max_iter=fo, so_max_iter=so,
                       stack_dim=16, sketch_dim=64, bin_margin=8.0,
                       fo_tile_frac=0.25, so_tile_frac=0.25,
                       fo_converged=0.0, so_converged=0.0)
    f = lambda: track_frame(scene, frame, T0, jnp.float32(1.0),
                            jnp.float32(0.0), jax.random.PRNGKey(0),
                            intr, cfg, tcfg)
    jax.block_until_ready(f().T)
    t0 = time.time()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out.T)
    dt = (time.time() - t0) / iters * 1000
    print(f"fo={fo:3d} so={so:2d}: {dt:9.2f} ms", flush=True)
    return dt


a = run(1, 0)
b = run(11, 0)
print(f"  -> marginal fo iter: {(b - a) / 10:.2f} ms", flush=True)
c = run(0, 1)
d = run(0, 6)
print(f"  -> marginal so iter: {(d - c) / 5:.2f} ms", flush=True)
e = run(40, 10)
print(f"  -> full frame (40+10): {e:.1f} ms = {1000 / e:.2f} fps", flush=True)
