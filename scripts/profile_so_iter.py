#!/usr/bin/env python
"""Decompose the second-order iteration's 5.1 ms (VERDICT r4 #5 follow-on).

profile_track_fixed.py found the so LOOP is 50.6 ms of the 96 ms frame
(10 pinned iters) — not the fixed cost. This times the same truncated
"so"-stage program under knob variants to attribute the per-iteration
cost: fine-refine (rebin_so_iters), sketch width (stack/sketch dims),
tile fraction, and iteration count (slope check).

Usage: python scripts/profile_so_iter.py
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
BASE = TrackConfig(
    monocular=True, fo_max_iter=27, so_max_iter=10,
    stack_dim=16, sketch_dim=64, bin_margin=8.0,
    fo_tile_frac=0.12, so_tile_frac=0.12, rebin_so_iters=3,
    fo_plateau_patience=0, so_plateau_patience=0,
    fo_converged=0.0, so_converged=0.0, stage="so",
)

scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
n_frames = 20
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


def time_cfg(label, tcfg):
    def one(i, seed_T):
        return track_frame(
            scene, datas[i + 1], seed_T, jnp.float32(1.0),
            jnp.float32(0.0), jax.random.PRNGKey(i), intr, cfg, tcfg,
        )

    r = one(0, poses[0])
    jax.block_until_ready(r.T)

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
    ms = el / n_frames * 1000
    print(f"[so-iter] {label:<26} {ms:7.1f} ms/frame", flush=True)
    return ms


b = time_cfg("base (so10, refine3)", BASE)
time_cfg("so5 (slope)", BASE._replace(so_max_iter=5))
time_cfg("refine0 (all frozen)", BASE._replace(rebin_so_iters=0))
time_cfg("refine10 (all refine)", BASE._replace(rebin_so_iters=10))
time_cfg("sketch16", BASE._replace(sketch_dim=16))
time_cfg("stack4", BASE._replace(stack_dim=4))
time_cfg("sf25", BASE._replace(so_tile_frac=0.25))
time_cfg("sf06", BASE._replace(so_tile_frac=0.06))
