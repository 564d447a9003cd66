#!/usr/bin/env python
"""Sweep tracking iteration budgets / capacities against pose error (TPU).

VERDICT r1 item 2d: the 40+10 fo/so split was inherited from the reference
(configs/mono/tum/base_config.yaml) and never optimized on TPU. This sweeps
(fo_max_iter, so_max_iter, fo_tile_frac, k_fine) on the bench workload
(640x480, 100k gaussians, orbit motion) and reports ms/frame + mean/max pose
error over the tracked frames, so the bench config can be re-provisioned on
measurements instead of inheritance.

Usage: python scripts/sweep_budget.py [quick|full]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402

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

N_FRAMES = 12
rj = jax.jit(lambda T: render(scene, T, intr,
                              BASE_CFG._replace(with_n_touched=False)))
frames, poses = [], []
for i in range(N_FRAMES + 1):
    T = orbit_pose(i / 400.0, trans_amp=0.8, rot_amp=0.15)
    out = rj(T)
    frames.append(make_frame_data(jnp.clip(out.image, 0, 1), None,
                                  1.1, 0.01, "tum"))
    poses.append(T)
jax.block_until_ready(frames[-1].gt_image)


def run_combo(fo, so, frac, k_fine, so_frac=None, rebin_iters=3,
              fo_fused=True, final_refine=True):
    cfg = BASE_CFG._replace(k_fine=k_fine)
    tcfg = TrackConfig(
        monocular=True, fo_max_iter=fo, so_max_iter=so,
        stack_dim=16, sketch_dim=64, bin_margin=8.0,
        fo_tile_frac=frac, so_tile_frac=so_frac if so_frac else frac,
        rebin_so_iters=rebin_iters, fo_fused=fo_fused,
        final_refine=final_refine,
    )

    def one(i):
        return track_frame(scene, frames[i + 1], poses[i], jnp.float32(1.0),
                           jnp.float32(0.0), jax.random.PRNGKey(i), intr,
                           cfg, tcfg)

    r = one(0)
    jax.block_until_ready(r.T)  # compile
    errs, ts = [], []
    for i in range(N_FRAMES):
        t0 = time.time()
        r = one(i)
        jax.block_until_ready(r.T)
        ts.append(time.time() - t0)
        errs.append(float(se3.pose_diff(r.T, poses[i + 1])[0]) * 1000)
    ms = float(np.median(ts)) * 1000
    tag = ("" if fo_fused else " nofuse") + ("" if final_refine else " norefine")
    print(f"fo={fo:3d} so={so:2d} frac={frac:.3f} so_frac="
          f"{so_frac if so_frac else frac:.3f} kf={k_fine:3d} "
          f"rebin={rebin_iters} | {ms:7.1f} ms/frame ({1000/ms:5.2f} fps) | "
          f"err mean {np.mean(errs):5.2f} max {np.max(errs):5.2f} mm{tag}",
        flush=True)
    return ms, float(np.mean(errs)), float(np.max(errs))


mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
print(f"[sweep:{mode}] {N_FRAMES} frames, 640x480, 100k gaussians",
      flush=True)

if mode == "ab":
    # fused-fo-kernel / final-refine A/B at the bench config (r2)
    combos = [
        (40, 10, 0.25, 96, None, 3, True, True),
        (40, 10, 0.25, 96, None, 3, False, True),
        (40, 10, 0.25, 96, None, 3, True, False),
        (40, 10, 0.25, 96, None, 3, False, False),
    ]
elif mode == "quick":
    combos = [
        (40, 10, 0.25, 96, None, 3),   # bench r1 baseline
        (30, 8, 0.25, 96, None, 3),
        (20, 8, 0.25, 96, None, 3),
        (20, 6, 0.25, 96, None, 3),
        (15, 6, 0.25, 96, None, 3),
        (10, 6, 0.25, 96, None, 3),
        (20, 6, 0.125, 96, 0.25, 3),
        (20, 6, 0.25, 64, None, 3),
        (20, 6, 0.25, 96, None, 1),
        (10, 8, 0.125, 96, 0.25, 2),
    ]
else:
    combos = [
        (fo, so, frac, kf, None, 3)
        for fo in (40, 25, 15)
        for so in (10, 6, 4)
        for frac in (0.25, 0.125)
        for kf in (96, 64)
    ]

for c in combos:
    try:
        run_combo(*c)
    except Exception as e:
        print(f"combo {c} failed: {type(e).__name__}: {e}", flush=True)
