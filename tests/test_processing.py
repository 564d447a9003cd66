"""Offline-analysis plotters over synthetic profile logs.

Covers processing/plot_tracking_time.py and the two wall-clock-vs-error
plotters end-to-end (log fixture -> figure on disk), mirroring how the
reference's processing/ scripts consume saved_runs artifacts
(/root/reference/processing/plot_tracking_time.py:1-52,
plot_wall_clock_time_vs_error{,_first}.py).
"""

import os
import subprocess
import sys

import numpy as np

from monogs_tpu.utils.profiling import ProfileLogger

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_run(logdir, n_frames=6, seed=0):
    rng = np.random.default_rng(seed)
    pl = ProfileLogger(logdir, save_period=4)
    for i in range(n_frames):
        fo = np.concatenate([rng.uniform(1e4, 2e4, 5),
                             np.full(3, np.nan)])
        so = np.concatenate([rng.uniform(5e3, 1e4, 4),
                             np.full(2, np.nan)])
        pl.log_frame(i, tracking_ms=80.0 + rng.uniform(0, 40),
                     fo_losses=fo, so_losses=so)
    pl.close()


def _run(script, args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "processing", script)] + args,
        capture_output=True, text=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu", "MPLBACKEND": "Agg"},
    )


def test_plot_tracking_time(tmp_path):
    for name, seed in [("expA_run1", 0), ("expA_run2", 1), ("expB_run1", 2)]:
        _write_run(str(tmp_path / name), seed=seed)
    out = str(tmp_path / "tt.png")
    r = _run("plot_tracking_time.py", [
        "--runs", f"{tmp_path}/expA_*:family A", f"{tmp_path}/expB_*:family B",
        "--output", out,
    ])
    assert r.returncode == 0, r.stderr
    assert "Average tracking time for family A" in r.stdout
    assert os.path.exists(out)


def test_plot_wall_clock_first(tmp_path):
    _write_run(str(tmp_path / "a"), seed=0)
    _write_run(str(tmp_path / "b"), seed=1)
    out = str(tmp_path / "first.png")
    r = _run("plot_wall_clock_time_vs_error_first.py", [
        "--logdir", str(tmp_path / "a"), "--logdir_ref", str(tmp_path / "b"),
        "--frame", "2", "--output", out,
    ])
    assert r.returncode == 0, r.stderr
    assert "iter_time_ms" in r.stdout
    assert os.path.exists(out)


def test_plot_wall_clock_base(tmp_path):
    _write_run(str(tmp_path / "a"), seed=0)
    _write_run(str(tmp_path / "b"), seed=1)
    out = str(tmp_path / "wc.png")
    r = _run("plot_wall_clock_time_vs_error.py", [
        "--logdir", str(tmp_path / "a"), "--logdir_ref", str(tmp_path / "b"),
        "--frame", "1", "--output", out,
    ])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
