"""Trimmed e2e verify drive: full SLAM pipeline on CPU in a few minutes.

Same code path as `slam.py --config configs/synthetic/rgbd.yaml --eval`,
with the synthetic sequence and refinement budgets trimmed so a cold-cache
CPU run finishes in minutes (the full 64-frame / 26k-refinement eval run
takes ~2h on this 1-core machine).
"""
import sys
sys.path.insert(0, "/root/repo")
import monogs_tpu
monogs_tpu.enable_compilation_cache()
from monogs_tpu.slam.config import load_config
from monogs_tpu.slam.runtime import SLAM
from monogs_tpu.utils.logging import Log

cfg = load_config("/root/repo/configs/synthetic/rgbd.yaml")
cfg["Results"]["save_results"] = True
cfg["Results"]["save_trj"] = True
cfg["Results"]["eval_rendering"] = True
cfg["Results"]["use_gui"] = False
cfg["Dataset"]["synthetic"]["n_frames"] = 16
# orbit_pose(i/n_frames) traverses the FULL orbit whatever n_frames is:
# trimming 64 -> 16 frames quadruples per-frame motion unless the
# amplitudes shrink with it (tests/test_slam_e2e.py does the same).
cfg["Dataset"]["synthetic"]["trans_amp"] = 0.0625
cfg["Dataset"]["synthetic"]["rot_amp"] = 0.015
cfg["Training"]["init_itr_num"] = 120
cfg["Training"]["mapping_itr_num"] = 30
cfg["Training"]["refinement_itr"] = 200
# CPU-affordable tracking + render budgets: at the stock synthetic config
# (k_fine=512, 40 fo + 10 so iters, rebin_so every iter) ONE tracked frame
# costs ~10 min of 1-core CPU — the stock budgets are TPU budgets. These
# trims keep every code path (fo, sketched so, rebinning, mapping, eval)
# while making the drive minutes-scale.
cfg["Training"]["RGN"]["first_order"]["max_iter"] = 20
cfg["Training"]["RGN"]["second_order"]["max_iter"] = 3
cfg["Training"]["RGN"]["second_order"]["stack_dim"] = 4
cfg["Renderer"]["k_fine"] = 128
cfg["Renderer"]["k_macro"] = 2048
import tempfile, os
save_dir = tempfile.mkdtemp(prefix="e2e_trim_")
slam = SLAM(cfg, save_dir=save_dir)
results = slam.run()
print("RESULTS:", {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in results.items() if not isinstance(v, dict)})
print("ATE:", results.get("ate"), "PSNR after:",
      results.get("after", {}).get("mean_psnr"))
assert results["n_frames"] == 16
assert results["ate"] is not None and results["ate"] < 0.05, results["ate"]
print("E2E_TRIM_OK")
