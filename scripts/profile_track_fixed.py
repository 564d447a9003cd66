#!/usr/bin/env python
"""Attribute the tracking frame's FIXED cost on TPU (VERDICT r4 #5).

The round-3/4 sweep cost model says iterations are cheap (fo ~1.5 ms, so
~3.3 ms at sf12) and ~45% of the 95.6 ms frame is fixed: final n_touched
render path, per-phase list builds, pipeline sync residue. This decomposes
it the way docs/mapping_r4_attribution.md decomposed the mapping
iteration: TRUNCATED variants of the SAME frame program
(TrackConfig.stage: lists -> fo -> so -> final_nc -> full), each timed
with the bench's depth-2 dispatch pipeline; consecutive deltas attribute
each block in context. Iteration counts are PINNED (plateau/convergence
exits disabled) so every variant runs identical loop work.

Usage: python scripts/profile_track_fixed.py [n_frames]
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
from monogs_tpu.ops import se3  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.slam.frame import make_frame_data  # noqa: E402
from monogs_tpu.slam.tracking import TrackConfig, track_frame  # noqa: E402

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                  width=640, height=480)
cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96,
                   macro_chunk=16, backend="pallas_lists")
# bench budgets with every data-dependent exit DISABLED: fixed 27 fo +
# 10 so iterations (the bench's measured means), so stage deltas compare
# identical loop work
tcfg0 = TrackConfig(
    monocular=True, fo_max_iter=27, so_max_iter=10,
    stack_dim=16, sketch_dim=64, bin_margin=8.0,
    fo_tile_frac=0.12, so_tile_frac=0.12, rebin_so_iters=3,
    fo_plateau_patience=0, so_plateau_patience=0,
    fo_converged=0.0, so_converged=0.0,
)

scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
rj = jax.jit(
    lambda T: render(scene, T, intr, cfg._replace(with_n_touched=False))
)
jit_keys = jax.random.split(jax.random.PRNGKey(42), n_frames + 2)
jit_amp = jnp.array([0.004] * 3 + [0.002] * 3)
datas, poses = [], []
for i in range(n_frames + 2):
    T = orbit_pose(i / 400.0, trans_amp=0.8, rot_amp=0.15)
    T = se3.se3_exp(jax.random.normal(jit_keys[i], (6,)) * jit_amp) @ T
    datas.append(make_frame_data(
        jnp.clip(rj(T).image, 0.0, 1.0), None, 1.1, 0.01, "tum"
    ))
    poses.append(T)
jax.block_until_ready(datas[-1].gt_image)


def time_stage(stage):
    tcfg = tcfg0._replace(stage=stage)

    def one(i, seed_T):
        return track_frame(
            scene, datas[i + 1], seed_T, jnp.float32(1.0),
            jnp.float32(0.0), jax.random.PRNGKey(i), intr, cfg, tcfg,
        )

    r = one(0, poses[0])
    jax.block_until_ready(r.T)  # compile

    def chain():
        Tm1 = poses[1]
        outs = []
        t0 = time.time()
        for i in range(1, n_frames + 1):
            r = one(i, Tm1)
            Tm1 = r.T
            outs.append(r)
            if len(outs) >= 3:
                jax.block_until_ready(outs[-3].T)
        jax.block_until_ready(outs[-1].T)
        return time.time() - t0

    el = min(chain(), chain(), chain())
    return el / n_frames * 1000


stages = ["build", "lists", "fo", "so_prep", "so", "final_nc", "full"]
ms = {}
prev = 0.0
print(f"[track-fixed] 640x480, 100k gauss, fo 27 / so 10 pinned, "
      f"{n_frames}-frame depth-2 pipeline, best of 3 chains", flush=True)
for st in stages:
    ms[st] = time_stage(st)
    print(f"[track-fixed] {st:<9} {ms[st]:7.1f} ms/frame   "
          f"delta {ms[st] - prev:+7.1f} ms", flush=True)
    prev = ms[st]
print(f"[track-fixed] decomposition: build {ms['build']:.1f} | "
      f"subset prep {ms['lists'] - ms['build']:.1f} | "
      f"fo loop {ms['fo'] - ms['lists']:.1f} | "
      f"so rebuild {ms['so_prep'] - ms['fo']:.1f} | "
      f"so loop {ms['so'] - ms['so_prep']:.1f} | "
      f"final refine+render {ms['final_nc'] - ms['so']:.1f} | "
      f"counts kernel {ms['full'] - ms['final_nc']:.1f}", flush=True)
