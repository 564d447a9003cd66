#!/usr/bin/env python
"""ATE / FPS scatter across experiment families.

Equivalent of the reference's processing/plot_ate.py: aggregates saved runs
(results.json written by slam.py --eval) grouped by experiment family and
plots ATE vs FPS.

Usage: python processing/plot_ate.py <saved_runs_dir> [out.png]
"""

import json
import os
import sys
from collections import defaultdict


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "saved_runs"
    out = sys.argv[2] if len(sys.argv) > 2 else "ate_fps.png"
    families = defaultdict(list)
    for root, _, files in os.walk(base):
        if "results.json" in files:
            with open(os.path.join(root, "results.json")) as f:
                r = json.load(f)
            fam = os.path.relpath(root, base).split(os.sep)[0]
            if "ate" in r and "fps" in r:
                families[fam].append((r["ate"], r["fps"]))

    if not families:
        print(f"no results.json under {base}")
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for fam, pts in sorted(families.items()):
        ates = [a * 100 for a, _ in pts]  # cm
        fpss = [f for _, f in pts]
        ax.scatter(fpss, ates, label=f"{fam} (n={len(pts)})")
    ax.set_xlabel("FPS")
    ax.set_ylabel("ATE RMSE [cm]")
    ax.legend()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    for fam, pts in sorted(families.items()):
        import numpy as np

        ates = np.array([a for a, _ in pts])
        fpss = np.array([f for _, f in pts])
        print(
            f"{fam}: ate {ates.mean()*100:.2f}±{ates.std()*100:.2f} cm, "
            f"fps {fpss.mean():.2f}±{fpss.std():.2f}"
        )


if __name__ == "__main__":
    main()
