"""Load per-frame profile logs written by monogs_tpu.utils.profiling.

Equivalent of the reference's processing/utils.py:5-36 (which loaded
run-frame*.pt torch pickles); here the artifacts are run-frame*.npz.
Returns {frame_idx: record-dict}.
"""

from __future__ import annotations

import os


def load_data(logdir: str) -> dict:
    """Delegates to the package's canonical loader so the npz layout has
    exactly one consumer-side implementation (the override/replay modes use
    the same one)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from monogs_tpu.utils.profiling import load_profile_logs

    return load_profile_logs(logdir)


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
