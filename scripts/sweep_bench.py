#!/usr/bin/env python
"""Sweep tracking budgets/plateau exits under the EXACT bench dynamics.

scripts/sweep_budget.py seeds each frame from the ground-truth previous
pose with no jitter — convergence behaves very differently there than in
bench.py, which chains each frame's seed from the PREVIOUS TRACKED pose and
adds 4 mm / 0.1 deg rms per-frame jitter. This sweep reproduces bench.py's
chain (same scene, same jitter keys, same depth-2 dispatch pipeline) so a
combo's ms/frame + pose error transfer to the headline number directly.

Usage: python scripts/sweep_bench.py [combo ...]
  combo = fo,so[,fopp,sopp]   e.g. 40,10  20,10  10,10,5,2
  (no args = the default grid)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

# TCP-only probe: session scripts run under an outer `timeout`, and the
# full dispatch round-trip probe costs its own interpreter + trace CPU on
# this 1-core box (CLAUDE.md round-4)
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

N_FRAMES = 16
scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
rj = jax.jit(lambda T: render(scene, T, intr,
                              cfg._replace(with_n_touched=False)))
_SEED = int(os.environ.get("SWEEP_SEED", "42"))  # jitter realization
jit_keys = jax.random.split(jax.random.PRNGKey(_SEED), N_FRAMES + 2)
jit_amp = jnp.array([0.004] * 3 + [0.002] * 3)


def gt_pose(i):
    T = orbit_pose(i / 400.0, trans_amp=0.8, rot_amp=0.15)
    return se3.se3_exp(jax.random.normal(jit_keys[i], (6,)) * jit_amp) @ T


datas, poses = [], []
for i in range(N_FRAMES + 2):
    T = gt_pose(i)
    out = rj(T)
    datas.append(make_frame_data(jnp.clip(out.image, 0, 1), None,
                                 1.1, 0.01, "tum"))
    poses.append(T)
jax.block_until_ready(datas[-1].gt_image)


def run_combo(fo, so, fopp=0, sopp=0, lrx=10, fofrac=25, sofrac=25,
              rebin=3, stack=16, fast_fixed=0, sketch=64, margin=8):
    """lrx = fo learning-rate multiplier x10 (10 = stock).
    fofrac/sofrac = tile fractions x100 (25 = stock).
    rebin = rebin_so_iters. fast_fixed: 0 = off, 1 = so_from_fo_aux +
    final_reuse (skip the post-fo global rebuild AND the final all-tile
    fine refine), 2 = final_reuse ONLY (the final render is pose-neutral,
    so this keeps fx0 pose error while dropping the ~40 ms final rebuild),
    3 = so_from_fo_aux ONLY. margin = bin_margin px (capacity-based
    binning makes this shape-constant in cost; fx3's staleness penalty
    should shrink as margin grows)."""
    tcfg = TrackConfig(
        monocular=True, fo_max_iter=fo, so_max_iter=so,
        stack_dim=stack, sketch_dim=sketch, bin_margin=float(margin),
        fo_tile_frac=fofrac / 100.0, so_tile_frac=sofrac / 100.0,
        rebin_so_iters=min(rebin, so),
        fo_plateau_patience=fopp, so_plateau_patience=sopp,
        fo_min_iter=3 if fopp else 0,
        lr_trans=0.001 * lrx / 10.0, lr_rot=0.003 * lrx / 10.0,
        so_from_fo_aux=fast_fixed in (1, 3),
        final_reuse=fast_fixed in (1, 2),
    )

    def one(i, seed_T):
        return track_frame(scene, datas[i + 1], seed_T, jnp.float32(1.0),
                           jnp.float32(0.0), jax.random.PRNGKey(i), intr,
                           cfg, tcfg)

    r = one(0, poses[0])
    jax.block_until_ready(r.T)  # compile

    depth = int(os.environ.get("SWEEP_DEPTH", "2"))

    def chain():
        Tm1 = poses[1]
        outs = []
        t0 = time.time()
        for i in range(1, N_FRAMES + 1):
            r = one(i, Tm1)
            Tm1 = r.T
            outs.append(r)
            if len(outs) > depth:
                jax.block_until_ready(outs[-1 - depth].T)
        jax.block_until_ready(outs[-1].T)
        return time.time() - t0, outs

    el, outs = chain()
    el2, outs2 = chain()
    if el2 < el:
        el, outs = el2, outs2
    errs = [float(se3.pose_diff(outs[j].T, poses[j + 2])[0]) * 1000
            for j in range(N_FRAMES)]
    fo_it = float(np.mean([int(o.fo_iters) for o in outs]))
    so_it = float(np.mean([int(o.so_iters) for o in outs]))
    ms = el / N_FRAMES * 1000
    print(f"[sweep] fo{fo:>3} so{so:>3} fopp{fopp} sopp{sopp} "
          f"lrx{lrx} ff{fofrac} sf{sofrac} rb{rebin} st{stack} fx{fast_fixed} "
          f"sd{sketch} mg{margin} seed{_SEED}: "
          f"{ms:7.1f} ms/frame ({1000/ms:5.2f} fps)  "
          f"err mean {np.mean(errs):5.2f} max {np.max(errs):5.2f} mm  "
          f"iters fo {fo_it:4.1f} so {so_it:4.1f}", flush=True)


if len(sys.argv) > 1:
    grid = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
else:
    grid = [
        (40, 10), (40, 10, 5, 3), (20, 10), (10, 10),
        (10, 10, 5, 3), (5, 10), (0, 10), (0, 14), (10, 6),
    ]
for combo in grid:
    run_combo(*combo)
