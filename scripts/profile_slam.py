#!/usr/bin/env python
"""Profile the full-system SLAM bench (bench.bench_slam_fps) on TPU:
wall-clock, ATE, backend stage breakdown, frontend tracking time, and the
number of distinct XLA compilations (VERDICT r2 items 2 and 7).

Usage: python scripts/profile_slam.py [n_frames] [key=value ...]
  key=value pairs are applied to the loaded config via dotted paths, e.g.
    Dataset.single_thread=False Renderer.k_fine=256 Training.init_itr_num=150
"""

import logging
import sys
import time

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=True)
monogs_tpu.enable_compilation_cache()

import jax  # noqa: E402

# count every XLA compile (cache misses only — persistent-cache hits do
# not log) via the jax logger
jax.config.update("jax_log_compiles", True)
_compiles = []


class _CompileCounter(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compil" in msg.lower():
            _compiles.append(msg.split("\n")[0][:120])


logging.getLogger("jax._src.dispatch").addHandler(_CompileCounter())
logging.getLogger("jax._src.interpreters.pxla").addHandler(_CompileCounter())


def set_dotted(cfg, path, val):
    keys = path.split(".")
    d = cfg
    for k in keys[:-1]:
        d = d[k]
    old = d.get(keys[-1])
    for cast in (int, float):
        try:
            val2 = cast(val)
            if str(val2) == val or isinstance(old, cast):
                val = val2
                break
        except ValueError:
            pass
    if val in ("True", "False"):
        val = val == "True"
    d[keys[-1]] = val
    print(f"[prof-slam] {path}: {old} -> {val}", flush=True)


def main():
    from monogs_tpu.eval.ate import eval_ate
    from monogs_tpu.slam.config import load_config
    from monogs_tpu.slam.runtime import SLAM

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = load_config("configs/synthetic/rgbd.yaml")
    cfg["Results"]["save_results"] = False
    cfg["Results"]["eval_rendering"] = False
    cfg["Results"]["use_gui"] = False
    cfg["Results"]["use_wandb"] = False
    stock = cfg["Dataset"]["synthetic"]["n_frames"]
    cfg["Dataset"]["synthetic"]["trans_amp"] *= n_frames / stock
    cfg["Dataset"]["synthetic"]["rot_amp"] *= n_frames / stock
    cfg["Dataset"]["synthetic"]["n_frames"] = n_frames
    for kv in sys.argv[2:]:
        path, val = kv.split("=", 1)
        set_dotted(cfg, path, val)

    t0 = time.time()
    slam = SLAM(cfg, save_dir=None)
    res = slam.run()
    total = time.time() - t0

    be = slam.backend.stage_summary()
    total_be = sum(t for t, _ in be.values())
    print(f"[prof-slam] total wall {total:.1f}s for {n_frames} frames "
          f"-> {res['fps']:.3f} fps", flush=True)
    print(f"[prof-slam] backend stages ({total_be:.1f}s):", flush=True)
    for k, (t, cnt) in sorted(be.items(), key=lambda x: -x[1][0]):
        print(f"[prof-slam]   {k:<16} {t:8.1f}s / {cnt}x "
              f"({t/max(cnt,1)*1000:8.1f} ms ea)", flush=True)
    ate = eval_ate(slam.frontend.cameras, slam.frontend.kf_indices, None, 0,
                   final=True, monocular=False)
    print(f"[prof-slam] ATE {float(ate)*1000:.2f} mm", flush=True)
    print(f"[prof-slam] XLA compiles: {len(_compiles)}", flush=True)
    from collections import Counter
    for msg, cnt in Counter(_compiles).most_common(30):
        print(f"[prof-slam]   {cnt}x {msg}", flush=True)


if __name__ == "__main__":
    main()
