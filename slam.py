#!/usr/bin/env python
"""SLAM CLI: python slam.py --config <yaml> [--eval]

Preserves the reference's command-line surface (/root/reference/slam.py:
208-265): --eval overrides save_results / use_gui / eval_rendering, results
land in save_dir/<scene>/<datetime>/ with the resolved config dumped
alongside, and the run prints total FPS plus (in eval mode) ATE and
PSNR/SSIM/LPIPS before and after color refinement.
"""

import argparse
import json
import os
import sys
from datetime import datetime

import yaml

import monogs_tpu
from monogs_tpu.slam.config import load_config
from monogs_tpu.slam.runtime import SLAM
from monogs_tpu.utils.logging import Log
from monogs_tpu.utils.relay import ensure_live_backend

# a dead TPU relay makes the first jax.devices() hang forever; degrade to
# CPU loudly instead (must run before any backend init)
ensure_live_backend(fallback="cpu", roundtrip=True)
monogs_tpu.enable_compilation_cache()


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU Gaussian-splatting SLAM")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval", action="store_true")
    args = parser.parse_args(argv)

    config = load_config(args.config)

    if args.eval:
        Log("Running MonoGS-TPU in Evaluation Mode")
        Log("Following config will be overriden")
        Log("\tsave_results=True")
        config["Results"]["save_results"] = True
        Log("\tuse_gui=False")
        config["Results"]["use_gui"] = False
        Log("\teval_rendering=True")
        config["Results"]["eval_rendering"] = True

    save_dir = None
    if config["Results"]["save_results"]:
        current_datetime = datetime.now().strftime("%Y%m%d_%H%M%S")
        path = config["Dataset"].get("dataset_path", "synthetic/scene").split("/")
        tag = (path[-3] + "_" + path[-2]) if len(path) >= 3 else path[-1]
        save_dir = os.path.join(
            config["Results"]["save_dir"], tag, current_datetime
        )
        os.makedirs(save_dir, exist_ok=True)
        config["Results"]["save_dir"] = save_dir
        with open(os.path.join(save_dir, "config.yml"), "w") as f:
            yaml.dump(config, f)
        Log("saving results in " + save_dir)

    slam = SLAM(config, save_dir=save_dir)
    results = slam.run()
    if save_dir is not None:
        with open(os.path.join(save_dir, "results.json"), "w") as f:
            json.dump(results, f, indent=2, default=float)
    Log("Done.")
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
