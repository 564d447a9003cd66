#!/usr/bin/env python
"""RGB-D tracking 3-seed adjudication (VERDICT r4 #7).

Mono got a 3-seed spread analysis before its budget shipped
(docs/sweep_r3_tracking.md batch h); RGB-D never did. This reproduces
bench.py's bench_rgbd_tracking chain (alpha-mixed photometric+depth
residual, previous-TRACKED-pose seeding, per-frame jitter, depth-2
pipeline) across jitter seeds and prints fps + mean/max pose error per
seed, so the recorded RGB-D bars have the same evidence as mono's.

Usage: python scripts/sweep_rgbd_seeds.py [seed ...]   (default 43 7 123)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
tcfg = TrackConfig(
    monocular=False, fo_max_iter=40, so_max_iter=8,
    stack_dim=16, sketch_dim=64, bin_margin=8.0,
    fo_tile_frac=0.12, so_tile_frac=0.12, rebin_so_iters=3,
    fo_plateau_patience=5, fo_min_iter=3, so_plateau_patience=4,
)
scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
N = 16
rj = jax.jit(
    lambda T: render(scene, T, intr, cfg._replace(with_n_touched=False))
)
jit_amp = jnp.array([0.004] * 3 + [0.002] * 3)


def run_seed(seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), N + 2)
    datas, poses = [], []
    for i in range(N + 2):
        T = orbit_pose(i / 400.0, trans_amp=0.8, rot_amp=0.15)
        T = se3.se3_exp(jax.random.normal(keys[i], (6,)) * jit_amp) @ T
        out = rj(T)
        datas.append(make_frame_data(
            jnp.clip(out.image, 0.0, 1.0), out.depth[0], 1.1, 0.01, "tum"
        ))
        poses.append(T)
    jax.block_until_ready(datas[-1].gt_image)

    def one(i, seed_T):
        return track_frame(
            scene, datas[i + 1], seed_T, jnp.float32(1.0), jnp.float32(0.0),
            jax.random.PRNGKey(i), intr, cfg, tcfg,
        )

    r = one(0, poses[0])
    jax.block_until_ready(r.T)

    def chain():
        Tm1 = poses[1]
        outs = []
        t0 = time.time()
        for i in range(1, N + 1):
            r = one(i, Tm1)
            Tm1 = r.T
            outs.append(r)
            if len(outs) >= 3:
                jax.block_until_ready(outs[-3].T)
        jax.block_until_ready(outs[-1].T)
        return time.time() - t0, outs

    el, outs = chain()
    el2, outs2 = chain()
    if el2 < el:
        el, outs = el2, outs2
    errs = [float(se3.pose_diff(outs[j].T, poses[j + 2])[0]) * 1000
            for j in range(N)]
    ms = el / N * 1000
    print(f"[rgbd-seeds] seed {seed:>4}: {1000/ms:5.2f} fps "
          f"({ms:5.1f} ms/frame)  err mean {np.mean(errs):5.2f} "
          f"max {np.max(errs):6.2f} mm", flush=True)


for s in ([int(a) for a in sys.argv[1:]] or [43, 7, 123]):
    run_seed(s)
