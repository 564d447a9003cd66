#!/usr/bin/env python
"""Full-system SLAM sweep on TPU hardware: fps + ATE per config variant.

The round-4 bench recorded slam_system_fps 0.32 with the backend stage
breakdown dominated by map_kf (71.6 s / 10 keyframes) and tracking at
~250 ms/frame — 2.6x the 640x480 tracking bench's 95 ms because the
synthetic SLAM config tracks at tile_frac 1.0 (300 tiles vs 144) with
track_k_fine 128 (vs 96), and maps at k_fine 512 (vs 96 at the mapping
bench point; mapping cost is near-linear in rows, bench_map_scaling.py).
This sweeps those levers and prints fps + ATE + stage breakdown per
variant so accuracy pays for nothing silently.

Usage: python scripts/sweep_slam.py [variant ...]   (default: all)
"""

import copy
import sys
import time

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=False)
monogs_tpu.enable_compilation_cache()

from monogs_tpu.eval.ate import eval_ate  # noqa: E402
from monogs_tpu.slam.config import load_config  # noqa: E402
from monogs_tpu.slam.runtime import SLAM  # noqa: E402

N_FRAMES = 32
WARMUP_FRAMES = 10


def base_cfg(n_frames):
    cfg = load_config("/root/repo/configs/synthetic/rgbd.yaml")
    cfg["Results"]["save_results"] = False
    cfg["Results"]["eval_rendering"] = False
    cfg["Results"]["use_gui"] = False
    cfg["Results"]["use_wandb"] = False
    stock = cfg["Dataset"]["synthetic"]["n_frames"]
    cfg["Dataset"]["synthetic"]["trans_amp"] *= n_frames / stock
    cfg["Dataset"]["synthetic"]["rot_amp"] *= n_frames / stock
    cfg["Dataset"]["synthetic"]["n_frames"] = n_frames
    return cfg


VARIANTS = {
    "stock": {},
    "kf256": {("Renderer", "k_fine"): 256},
    "kf192": {("Renderer", "k_fine"): 192},
    "kf128": {("Renderer", "k_fine"): 128},
    # NOTE tile_frac < 1.0 at 320x240 currently hits a Mosaic relayout
    # compile bug in a tracking kernel ("Invalid relayout ... vector
    # <1x256xf32>"); tf50/combo parked until the kernel shape is fixed.
    "tf50": {("Training", "RGN", "first_order", "tile_frac"): 0.5,
             ("Training", "RGN", "second_order", "tile_frac"): 0.5},
    "combo": {("Renderer", "k_fine"): 256,
              ("Renderer", "track_k_fine"): 96,
              ("Training", "RGN", "first_order", "tile_frac"): 0.5,
              ("Training", "RGN", "second_order", "tile_frac"): 0.5},
    "kf256_tk96": {("Renderer", "k_fine"): 256,
                   ("Renderer", "track_k_fine"): 96},
    "kf256_mt": {("Renderer", "k_fine"): 256,
                 ("Dataset", "single_thread"): False},
    # threaded with the stricter-than-reference keyframe gate: tracking
    # holds while keyframe BA is in flight (accuracy), non-keyframe
    # tracking overlaps idle mapping (speed)
    "mt_gate": {("Dataset", "single_thread"): False,
                ("Training", "block_on_keyframe"): True},
    "kf256_it40": {("Renderer", "k_fine"): 256,
                   ("Training", "mapping_itr_num"): 40},
    "kf256_it30": {("Renderer", "k_fine"): 256,
                   ("Training", "mapping_itr_num"): 30,
                   ("Training", "init_itr_num"): 200},
    # round-5: mapping-side tile subsampling (MapConfig.tile_frac) — the
    # stock config already carries the round-4 winners (k_fine 256,
    # tracking tile_frac 0.5); these stack the BA subset on top
    # (ab_tile_frac.py at the 640x480 bench point: 0.25 -> 13.5 BA
    # iters/s from 7.24, descent quality unchanged)
    "mtf50": {("Renderer", "mapping_tile_frac"): 0.5},
    "mtf25": {("Renderer", "mapping_tile_frac"): 0.25},
    "mtf25_mt": {("Renderer", "mapping_tile_frac"): 0.25,
                 ("Dataset", "single_thread"): False},
    # reinvest the subset savings in MORE SGD steps: measured mtf50 costs
    # 1.97 mm ATE at stock iters (2.30 -> 3.97 mm) while map_kf drops
    # 44.8 -> 29.6 s; scaling iters back up spends the same wall clock on
    # 1.5-2.5x the steps
    "mtf50_it90": {("Renderer", "mapping_tile_frac"): 0.5,
                   ("Training", "mapping_itr_num"): 90,
                   ("Training", "init_itr_num"): 450},
    "mtf25_it150": {("Renderer", "mapping_tile_frac"): 0.25,
                    ("Training", "mapping_itr_num"): 150,
                    ("Training", "init_itr_num"): 700},
    "mtf25_it100": {("Renderer", "mapping_tile_frac"): 0.25,
                    ("Training", "mapping_itr_num"): 100,
                    ("Training", "init_itr_num"): 500},
    "mtf25_it150_mt": {("Renderer", "mapping_tile_frac"): 0.25,
                       ("Training", "mapping_itr_num"): 150,
                       ("Training", "init_itr_num"): 700,
                       ("Dataset", "single_thread"): False},
    "mtf25_it150_mtg": {("Renderer", "mapping_tile_frac"): 0.25,
                        ("Training", "mapping_itr_num"): 150,
                        ("Training", "init_itr_num"): 700,
                        ("Dataset", "single_thread"): False,
                        ("Training", "block_on_keyframe"): True},
    # TUM-like per-frame motion (VERDICT r4 #2): the 32-frame orbit moves
    # ~4x faster than any real handheld sequence and sits at a stability
    # cliff (mtf25_it100 read 28.8 mm where it150 read 2.21); these
    # measure the same levers at fr3/office motion statistics
    "tum_stock": {("Dataset", "synthetic", "motion"): "tum_like"},
    "tum_mtf25": {("Dataset", "synthetic", "motion"): "tum_like",
                  ("Renderer", "mapping_tile_frac"): 0.25},
    "tum_stock_mt": {("Dataset", "synthetic", "motion"): "tum_like",
                     ("Dataset", "single_thread"): False},
    "tum_mtf25_mt": {("Dataset", "synthetic", "motion"): "tum_like",
                     ("Renderer", "mapping_tile_frac"): 0.25,
                     ("Dataset", "single_thread"): False},
}


def apply(cfg, overrides):
    for path, val in overrides.items():
        d = cfg
        for k in path[:-1]:
            d = d[k]
        d[path[-1]] = val


def run_variant(name, overrides):
    cfg = base_cfg(N_FRAMES)
    apply(cfg, overrides)

    wcfg = copy.deepcopy(cfg)
    wcfg["Dataset"]["synthetic"]["trans_amp"] *= WARMUP_FRAMES / N_FRAMES
    wcfg["Dataset"]["synthetic"]["rot_amp"] *= WARMUP_FRAMES / N_FRAMES
    wcfg["Dataset"]["synthetic"]["n_frames"] = WARMUP_FRAMES
    wcfg["Training"]["init_itr_num"] = 20
    wcfg["Training"]["mapping_itr_num"] = 10
    wcfg["Training"]["kf_interval"] = 1
    t0 = time.time()
    SLAM(wcfg, save_dir=None).run()
    warm_s = time.time() - t0

    slam = SLAM(cfg, save_dir=None)
    res = slam.run()
    be = slam.backend.stage_summary()
    total_be = sum(t for t, _ in be.values())
    parts = ", ".join(f"{k} {t:.1f}s/{n}x" for k, (t, n) in be.items())
    ate = eval_ate(
        slam.frontend.cameras, slam.frontend.kf_indices, None, 0,
        final=True, monocular=False,
    )
    print(f"[sweep-slam] {name:<8} fps={res['fps']:.3f} "
          f"ate={float(ate) * 1000:.2f}mm warmup={warm_s:.0f}s "
          f"backend({total_be:.1f}s): {parts}", flush=True)


names = sys.argv[1:] or list(VARIANTS)
for nm in names:
    try:
        run_variant(nm, VARIANTS[nm])
    except Exception as e:  # noqa: BLE001 - one bad variant must not kill the sweep
        print(f"[sweep-slam] {nm:<8} FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
