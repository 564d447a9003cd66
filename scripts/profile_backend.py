#!/usr/bin/env python
"""Decompose the SLAM backend's per-keyframe cost on TPU.

The full-system profile (scripts/profile_slam.py) showed insert ~11 s and
map_kf ~20 s per keyframe at 320x240 — two orders of magnitude over budget
for a >=1 fps system. This script runs a short REAL SLAM drive to populate a
mid-run backend state (map near steady-state occupancy, full keyframe
window), then times each constituent device program individually:

  - keyframe_to_gaussians (16k-point kNN + unprojection)
  - gm.insert (scatter into the 65536-capacity map)
  - map_iters at n_iters = 0 / 10 / 30  -> fixed cost + per-iteration cost
  - build_tile_lists for the B staged views (the lists0 stage)
  - the final visibility pass (B from-scratch n_touched renders)
  - mean_knn_sq_dist A/B: k-pass min/argmin vs lax.top_k at [16384, 3]

Usage: python scripts/profile_backend.py [n_frames]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=True)
monogs_tpu.enable_compilation_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(label, fn, n=3):
    """Median-of-n wall time of fn() with a device sync, after one warmup."""
    fn()  # warmup (compile)
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"[prof-be] {label:42s} {med * 1000:9.1f} ms", flush=True)
    return med


def main():
    from monogs_tpu.models import gaussian_map as gm
    from monogs_tpu.models.insertion import keyframe_to_gaussians
    from monogs_tpu.render import build_tile_lists, render
    from monogs_tpu.render.renderer import GaussianArrays
    from monogs_tpu.slam.config import load_config
    from monogs_tpu.slam.mapping import map_iters
    from monogs_tpu.slam.runtime import SLAM

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    cfg = load_config("configs/synthetic/rgbd.yaml")
    cfg["Results"]["save_results"] = False
    cfg["Results"]["eval_rendering"] = False
    cfg["Results"]["use_gui"] = False
    cfg["Results"]["use_wandb"] = False
    stock = cfg["Dataset"]["synthetic"]["n_frames"]
    cfg["Dataset"]["synthetic"]["trans_amp"] *= n_frames / stock
    cfg["Dataset"]["synthetic"]["rot_amp"] *= n_frames / stock
    cfg["Dataset"]["synthetic"]["n_frames"] = n_frames
    cfg["Training"]["init_itr_num"] = 60  # keep the drive short

    t0 = time.time()
    slam = SLAM(cfg, save_dir=None)
    slam.run()
    be = slam.backend
    print(f"[prof-be] drive: {time.time() - t0:.1f}s, "
          f"{len(be.viewpoints)} keyframes, window {be.current_window}, "
          f"n_active {int(be.gaussians.n_active)}", flush=True)

    window = be.current_window
    kf = be.viewpoints[window[0]]
    depth = jnp.asarray(kf.data.gt_depth[0], jnp.float32)
    key = jax.random.PRNGKey(7)

    # --- insert decomposition -------------------------------------------
    k2g = functools.partial(
        keyframe_to_gaussians,
        key, kf.data.gt_image, depth, kf.T, kf.ea, kf.eb,
        intr=be.intr, cap=be.insert_cap,
        sh_k=be.gaussians.params.sh.shape[1],
        downsample_factor=be.pcd_downsample,
        point_size=be.point_size,
        adaptive_pointsize=be.adaptive_pointsize,
    )
    timeit("keyframe_to_gaussians (kNN+unproject)", k2g)
    leaves, count = k2g()
    timeit("gm.insert (scatter)",
           lambda: gm.insert(be.gaussians, leaves, count, 99))

    # kNN A/B at the insert shape
    from monogs_tpu.ops.knn import mean_knn_sq_dist

    pts = jax.block_until_ready(leaves.xyz)
    ok = jnp.arange(pts.shape[0]) < count
    timeit("  mean_knn_sq_dist (k-pass min/argmin)",
           lambda: mean_knn_sq_dist(pts, ok, k=3))

    @functools.partial(jax.jit, static_argnames=("k", "chunk"))
    def knn_topk(points, valid_mask, k=3, chunk=2048):
        n = points.shape[0]
        sq = jnp.sum(points * points, axis=-1)
        big = jnp.float32(1e12)

        def row_chunk(carry, inputs):
            p_c, sq_c, base = inputs
            d = sq_c[:, None] - 2.0 * (p_c @ points.T) + sq[None, :]
            col = jnp.arange(n)[None, :]
            row = base + jnp.arange(chunk)[:, None]
            d = jnp.where(valid_mask[None, :] & (col != row), d, big)
            neg_top, _ = jax.lax.top_k(-d, k)
            return carry, jnp.mean(jnp.maximum(-neg_top, 0.0), axis=-1)

        n_chunks = n // chunk
        _, out = jax.lax.scan(
            row_chunk, None,
            (points.reshape(n_chunks, chunk, 3),
             sq.reshape(n_chunks, chunk),
             jnp.arange(n_chunks) * chunk),
        )
        return jnp.where(valid_mask, out.reshape(-1), 0.0)

    timeit("  mean_knn_sq_dist (lax.top_k)",
           lambda: knn_topk(pts, ok))

    # --- mapping decomposition ------------------------------------------
    cams = be._stage_batch(window, [], be.pose_window)
    jax.block_until_ready(cams.T)
    m = be.gaussians
    it0 = jnp.int32(be.iteration_count)

    def mi(n_it):
        return map_iters(
            m, cams, n_it, it0, key,
            be.intr, be.render_cfg, be.mcfg, be.hyper,
        )

    t_0 = timeit("map_iters n=0 (lists0 + vis pass)", lambda: mi(0))
    t10 = timeit("map_iters n=10", lambda: mi(10))
    t30 = timeit("map_iters n=30", lambda: mi(30))
    print(f"[prof-be] per-iteration: {(t30 - t10) / 20 * 1000:.1f} ms "
          f"(from n=30 vs n=10); fixed {t_0 * 1000:.0f} ms", flush=True)

    # lists0 and the vis pass separately
    gauss = GaussianArrays(
        xyz=m.params.xyz, sh=m.params.sh, log_scale=m.params.log_scale,
        quat=m.params.quat, opa_logit=m.params.opa_logit, active=m.active,
    )
    cfg_r = be.render_cfg
    bl = jax.jit(lambda Ts: jax.lax.map(
        lambda T: build_tile_lists(gauss, T, be.intr, cfg_r,
                                   margin=be.mcfg.bin_margin), Ts))
    timeit(f"build_tile_lists x{cams.T.shape[0]} views",
           lambda: bl(cams.T))

    vis = jax.jit(lambda Ts: jax.lax.map(
        lambda T: render(gauss, T, be.intr, cfg_r).n_touched, Ts))
    timeit(f"vis pass: from-scratch render x{cams.T.shape[0]}",
           lambda: vis(cams.T))

    lists_b = jax.block_until_ready(bl(cams.T))
    from monogs_tpu.render.renderer import TileLists

    def vis_lists(Ts):
        def one(args):
            T, li, lv = args
            return render(gauss, T, be.intr, cfg_r,
                          lists=TileLists(idx=li, vld=lv)).n_touched
        return jax.lax.map(one, (Ts, lists_b.idx, lists_b.vld))

    vis_l = jax.jit(vis_lists)
    timeit(f"vis pass: frozen-lists render x{cams.T.shape[0]}",
           lambda: vis_l(cams.T))

    # single-view render cost at mapping shapes (k_fine=512)
    T1 = cams.T[0]
    timeit("single render (global bin, n_touched)",
           lambda: jax.jit(lambda T: render(gauss, T, be.intr, cfg_r).image)(T1))


if __name__ == "__main__":
    main()
