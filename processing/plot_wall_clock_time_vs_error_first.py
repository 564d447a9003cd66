#!/usr/bin/env python
"""First-order-focused variant of plot_wall_clock_time_vs_error.

Equivalent of the reference's
processing/plot_wall_clock_time_vs_error_first.py (:1-100), which is the
same two-panel loss-vs-iteration / loss-vs-wall-clock figure plus printed
per-iteration timing diagnostics (iteration times, render time, first-order
backward time) and "Adam" / "Randomized Adam" labels — the figure used to
compare a pure first-order run against the sketched second-order tracker.

Our per-frame records carry fo_losses/so_losses plus whatever stage timers
the frontend logged (tracking_ms always; fo_ms/so_ms when the profiler ran);
iteration wall-clock stamps are reconstructed the same way as the base
plotter.

Usage:
  python processing/plot_wall_clock_time_vs_error_first.py --logdir A \\
      --logdir_ref B [--frame N] [--output out.png] [--so-cost-ratio 2.5]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from plot_wall_clock_time_vs_error import trajectory  # noqa: E402
from utils import load_data  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--logdir_ref", required=True)
    ap.add_argument("--frame", type=int, default=-1)
    ap.add_argument("--output", default="wall_clock_vs_error_first.png")
    ap.add_argument("--so-cost-ratio", type=float, default=2.5)
    ap.add_argument("--labels", nargs=2,
                    default=["Randomized Adam", "Adam"])
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
    frame = args.frame if args.frame >= 0 else int(np.random.choice(common))
    if frame not in data or frame not in ref:
        print(f"frame {frame} not in both logs; common: {common[:20]}...",
              file=sys.stderr)
        sys.exit(1)

    la, ta = trajectory(data[frame], args.so_cost_ratio)
    lb, tb = trajectory(ref[frame], args.so_cost_ratio)

    # per-iteration timing diagnostics (the _first variant's extra prints,
    # reference :50-60): reconstructed iteration times + any logged stage
    # timers present in the record
    rec = data[frame]
    iter_time_ms = np.diff(ta, prepend=0.0) * 1000.0
    print(f"Frame {frame}")
    print(f"iter_time_ms: {np.round(iter_time_ms, 2).tolist()}")
    for k in ("tracking_ms", "fo_ms", "so_ms", "render_ms"):
        if k in rec:
            print(f"{k}: {float(np.asarray(rec[k]).reshape(-1)[0]):.2f}")
    print(f"Losses: {np.round(la, 5).tolist()}")
    print(f"Ref losses: {np.round(lb, 5).tolist()}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 7))
    # _first plots the REFERENCE trace first so it sits under the run trace
    ax1.plot(range(len(lb)), lb, "o-", label=args.labels[1])
    ax1.plot(range(len(la)), la, "o-", label=args.labels[0])
    ax1.set_xlabel("Iteration")
    ax1.set_ylabel("Tracking loss (L1)")
    ax1.legend()
    ax1.set_title(f"frame {frame}")

    ax2.plot(tb, lb, "o-", label=args.labels[1])
    ax2.plot(ta, la, "o-", label=args.labels[0])
    ax2.set_xlabel("Time (s, reconstructed)")
    ax2.set_ylabel("Tracking loss (L1)")
    ax2.legend()
    fig.tight_layout()
    fig.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
