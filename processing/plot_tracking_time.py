#!/usr/bin/env python
"""Per-frame tracking-time statistics across experiment families.

Equivalent of the reference's processing/plot_tracking_time.py (:1-52),
which greps "Average tracking time ms:" out of saved_runs/*/run.log for a
list of (glob pattern, label) experiment families and prints each family's
mean. Here the per-frame tracking times live in the run-frame*.npz profile
logs (`tracking_ms` field, written by the frontend when
Training.RGN.log_output is on), so instead of grepping text this loads
every matching run directory, prints each family's mean +/- std, and draws
a per-family scatter/box figure.

Usage:
  python processing/plot_tracking_time.py \\
      --runs 'outputs/*f20s5d32*:2nd Order, d=32' \\
             'outputs/*f20s5d64*:2nd Order, d=64' \\
      [--output tracking_time.png]

Each --runs entry is  GLOB:LABEL  where GLOB matches run directories
containing run-frame*.npz logs (several directories per family are pooled,
matching the reference's multi-run grep).
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utils import load_data  # noqa: E402


def family_times(pattern: str) -> np.ndarray:
    """All per-frame tracking_ms values across run dirs matching pattern."""
    times = []
    for d in sorted(glob.glob(pattern)):
        if not os.path.isdir(d):
            continue
        for rec in load_data(d).values():
            t = rec.get("tracking_ms")
            if t is not None and np.isfinite(float(t)):
                times.append(float(t))
    return np.asarray(times, np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--runs", nargs="+", required=True, metavar="GLOB:LABEL",
        help="experiment families: glob over run dirs + display label",
    )
    ap.add_argument("--output", default="tracking_time.png")
    args = ap.parse_args()

    fams = []
    for spec in args.runs:
        pattern, _, label = spec.partition(":")
        label = label or pattern
        t = family_times(pattern)
        if t.size == 0:
            print(f"[plot_tracking_time] {label}: no run-frame*.npz under "
                  f"{pattern}", file=sys.stderr)
            continue
        print(f"Average tracking time for {label}: {np.mean(t):.2f} ms "
              f"(std {np.std(t):.2f}, n {t.size})")
        fams.append((label, t))
    if not fams:
        sys.exit(1)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(2 + 2 * len(fams), 5))
    ax.boxplot([t for _, t in fams], labels=[l for l, _ in fams],
               showmeans=True)
    for i, (_, t) in enumerate(fams, start=1):
        x = np.random.default_rng(0).normal(i, 0.04, size=t.size)
        ax.plot(x, t, ".", alpha=0.35, markersize=4)
    ax.set_ylabel("Tracking time per frame (ms)")
    ax.set_title("Per-frame tracking time by experiment family")
    fig.tight_layout()
    fig.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
