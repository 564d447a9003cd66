"""Load per-frame profile logs written by monogs_tpu.utils.profiling.

Equivalent of the reference's processing/utils.py:5-36 (which loaded
run-frame*.pt torch pickles); here the artifacts are run-frame*.npz.
Returns {frame_idx: record-dict}.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def load_data(logdir: str) -> dict:
    data = {}
    for path in sorted(glob.glob(os.path.join(logdir, "run-frame*.npz"))):
        with np.load(path, allow_pickle=True) as z:
            n = len(z["frame"])
            for i in range(n):
                rec = {k: z[k][i] for k in z.files}
                data[int(rec["frame"])] = rec
    return data


def load_results(run_dirs):
    """Collect results.json files from saved runs (the slam.py CLI writes
    one per run; equivalent of grepping run.log in the reference's
    plot_ate.py:37-42)."""
    import json

    out = []
    for d in run_dirs:
        p = os.path.join(d, "results.json")
        if os.path.exists(p):
            with open(p) as f:
                r = json.load(f)
            r["run_dir"] = d
            out.append(r)
    return out
