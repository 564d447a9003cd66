#!/usr/bin/env python
"""Per-frame tracking-loss curves from profile logs.

Equivalent of the reference's processing/plot_losses.py over run-frame*.pt;
reads the npz records written by monogs_tpu.utils.profiling.ProfileLogger.

Usage: python processing/plot_losses.py <logdir> [out.png]
"""

import sys

from utils import load_data


def main():
    logdir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "losses.png"
    data = load_data(logdir)
    if not data:
        print(f"no run-frame*.npz under {logdir}")
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    frames = sorted(data)
    losses = [float(data[f].get("last_l1", float("nan"))) for f in frames]
    times = [float(data[f].get("tracking_ms", float("nan"))) for f in frames]

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    ax1.plot(frames, losses)
    ax1.set_ylabel("tracking L1")
    ax2.plot(frames, times)
    ax2.set_ylabel("tracking ms")
    ax2.set_xlabel("frame")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
