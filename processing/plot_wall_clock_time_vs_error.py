#!/usr/bin/env python
"""Loss-vs-iteration and loss-vs-wall-clock comparison of two logged runs.

Equivalent of the reference's processing/plot_wall_clock_time_vs_error.py
(:1-80): pick one frame, plot its per-iteration tracking-loss trajectory
against a reference run's (e.g. a pure-Adam run vs a second-order run), both
per iteration and per wall-clock second.

Our tracker runs fully fused on-device, so per-iteration wall-clock stamps
do not exist; iteration times are reconstructed from the frame's measured
`tracking_ms`, split between the two phases by the measured per-iteration
cost ratio (fo:so defaults to 1:2.5, scripts/profile_tracking.py; override
with --so-cost-ratio).

Usage:
  python processing/plot_wall_clock_time_vs_error.py --logdir A \\
      --logdir_ref B [--frame N] [--output out.png] [--so-cost-ratio 2.5]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utils import load_data  # noqa: E402


def trajectory(rec, so_cost_ratio):
    """(losses [n], times [n] seconds) for one frame record."""
    fo = np.asarray(rec.get("fo_losses", []), np.float64).reshape(-1)
    so = np.asarray(rec.get("so_losses", []), np.float64).reshape(-1)
    fo = fo[np.isfinite(fo)]
    so = so[np.isfinite(so)]
    losses = np.concatenate([fo, so])
    total_ms = float(rec.get("tracking_ms", np.nan))
    # unit costs: fo iter = 1, so iter = so_cost_ratio
    units = np.concatenate(
        [np.ones(len(fo)), np.full(len(so), so_cost_ratio)]
    )
    t = np.cumsum(units)
    t = t / t[-1] * total_ms / 1000.0 if len(t) else t
    return losses, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--logdir_ref", required=True)
    ap.add_argument("--frame", type=int, default=-1)
    ap.add_argument("--output", default="wall_clock_vs_error.png")
    ap.add_argument("--so-cost-ratio", type=float, default=2.5)
    ap.add_argument("--labels", nargs=2, default=["run", "reference run"])
    args = ap.parse_args()

    data = load_data(args.logdir)
    ref = load_data(args.logdir_ref)
    if not data or not ref:
        print("missing run-frame*.npz logs", file=sys.stderr)
        sys.exit(1)
    common = sorted(set(data) & set(ref))
    if not common:
        print("no common frames between the two runs", file=sys.stderr)
        sys.exit(1)
    frame = args.frame if args.frame >= 0 else int(
        np.random.choice(common)
    )
    if frame not in data or frame not in ref:
        print(f"frame {frame} not in both logs; common: {common[:20]}...",
              file=sys.stderr)
        sys.exit(1)

    la, ta = trajectory(data[frame], args.so_cost_ratio)
    lb, tb = trajectory(ref[frame], args.so_cost_ratio)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 7))
    ax1.plot(range(len(la)), la, "o-", label=args.labels[0])
    ax1.plot(range(len(lb)), lb, "o-", label=args.labels[1])
    ax1.set_xlabel("Iteration")
    ax1.set_ylabel("Tracking loss (L1)")
    ax1.legend()
    ax1.set_title(f"frame {frame}")

    ax2.plot(ta, la, "o-", label=args.labels[0])
    ax2.plot(tb, lb, "o-", label=args.labels[1])
    ax2.set_xlabel("Time (s, reconstructed)")
    ax2.set_ylabel("Tracking loss (L1)")
    ax2.legend()
    fig.tight_layout()
    fig.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
