"""The Pallas tracking path THROUGH slam.py, on CPU (interpret mode).

Round-2 gap (VERDICT item 6): on CPU `runtime.render_config_from_config`
silently falls back pallas_lists -> xla, so no CI test ran the fused
tracking kernels (jvp8, fused fo, counts) through the product SLAM loop —
a kernel wiring regression would surface first as a dead bench tier on
hardware. This drives a tiny SLAM run with `Renderer.backend: pallas_lists`
+ `pallas_interpret: True`, which runs the very same pallas_call bodies
through the interpreter.

Shapes are minimal (128x96, k_fine 64) because interpret mode executes the
kernel grid as traced per-step jnp ops on one CPU core.
"""

import copy
import os

import numpy as np
import pytest

from monogs_tpu.slam.config import load_config
from monogs_tpu.slam.runtime import SLAM

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_slam_pallas_interpret_e2e():
    cfg = load_config(os.path.join(REPO, "configs/synthetic/rgbd.yaml"))
    cfg = copy.deepcopy(cfg)
    cfg["Dataset"]["sensor_type"] = "depth"
    cfg["Dataset"]["Calibration"].update(
        {"width": 128, "height": 96, "fx": 128.0, "fy": 128.0,
         "cx": 63.5, "cy": 47.5}
    )
    cfg["Dataset"]["synthetic"] = {
        "n_frames": 6, "n_gauss": 2000, "seed": 0,
        "trans_amp": 0.008, "rot_amp": 0.003,
        "pan": [0.07, 0.0, 0.015, 0.0, 0.08, 0.0],
    }
    cfg["Dataset"]["pcd_downsample"] = 8
    cfg["Dataset"]["pcd_downsample_init"] = 4
    cfg["Dataset"]["single_thread"] = True
    cfg["Training"]["kf_translation"] = 0.01
    cfg["Training"]["kf_min_translation"] = 0.005
    cfg["Training"]["kf_interval"] = 2
    cfg["Training"]["init_itr_num"] = 60
    cfg["Training"]["mapping_itr_num"] = 15
    cfg["Training"]["window_size"] = 4
    cfg["Training"]["pose_window"] = 2
    rgn = cfg["Training"]["RGN"]
    rgn["first_order"]["max_iter"] = 6
    rgn["second_order"]["max_iter"] = 2
    rgn["second_order"]["stack_dim"] = 4
    # exercise the SUBSET fo path (fused-kernel eligible) and the frozen
    # lists; 0.5 of 24 fine tiles -> 8-row subset (the /8*8 floor)
    rgn["bin_margin"] = 8
    rgn["first_order"]["tile_frac"] = 0.5
    rgn["second_order"]["tile_frac"] = 0.5
    rgn["rebin_so_iters"] = 1
    cfg["Renderer"] = {
        "map_capacity": 8192, "insert_cap": 2048,
        "macro_tiles": 4, "k_macro": 512, "k_fine": 64,
        # THE point of this test: the product Pallas path, interpreted on CPU
        "backend": "pallas_lists", "pallas_interpret": True,
    }
    cfg["Results"]["save_results"] = False

    slam = SLAM(cfg, save_dir=None)
    # the CPU fallback must NOT have fired: interpret mode keeps the backend
    assert slam.track_render_cfg.backend == "pallas_lists"
    assert slam.track_render_cfg.pallas_interpret
    slam.run()

    fe = slam.frontend
    assert len(fe.cameras) == 6
    assert len(fe.kf_indices) >= 2
    assert int(slam.backend.gaussians.n_active) > 200
    for i in range(6):
        assert np.all(np.isfinite(np.asarray(fe.cameras[i].T)))

    from monogs_tpu.eval.ate import evaluate_ate

    gt = [np.linalg.inv(np.asarray(fe.cameras[i].T_gt)) for i in fe.kf_indices]
    est = [np.linalg.inv(np.asarray(fe.cameras[i].T)) for i in fe.kf_indices]
    rmse, _ = evaluate_ate(gt, est, monocular=False)
    # wiring coverage, not accuracy: demand sane tracking, not convergence
    assert np.isfinite(rmse) and rmse < 0.05, rmse
