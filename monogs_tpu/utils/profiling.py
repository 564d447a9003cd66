"""Profiling: stage timers, per-frame profile logs, device traces.

Equivalent of the reference's three mechanisms (SURVEY.md section 5):
  1. wall-clock stage timers printed every 10 frames
     (slam_frontend.py:131-146, 827-880) — StageTimers below;
  2. structured per-frame profile dicts saved as run-frame%06d.npz
     (slam_frontend.py:450, 882-898 saved .pt files; consumed by
     processing/) — ProfileLogger below;
  3. device-level traces — jax.profiler wrapped in `trace()` (replaces
     torch.cuda.Event/synchronize timing; XLA programs are profiled as a
     whole, which is the meaningful unit on TPU).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import numpy as np

from .logging import Log


class StageTimers:
    """Accumulate wall-clock per stage; print averages every `period` frames."""

    def __init__(self, period: int = 10, tag: str = "Prof"):
        self.period = period
        self.tag = tag
        self.sums = defaultdict(float)
        self.counts = defaultdict(int)
        self.frames = 0

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.sums[name] += time.time() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float):
        self.sums[name] += seconds
        self.counts[name] += 1

    def frame_done(self):
        self.frames += 1
        if self.frames % self.period == 0:
            for name in sorted(self.sums):
                avg = self.sums[name] / max(self.counts[name], 1)
                Log(f"avg {name}: {avg * 1000:.2f} ms", tag=self.tag)
            self.sums.clear()
            self.counts.clear()


class ProfileLogger:
    """Per-frame profile records -> run-frame%06d.npz every save_period
    frames (reference saved torch .pt files; npz is the torch-free
    equivalent, consumed by processing/utils.load_data)."""

    def __init__(self, logdir: str, save_period: int = 10):
        self.logdir = logdir
        self.save_period = save_period
        self.records: list[dict] = []
        os.makedirs(logdir, exist_ok=True)

    def log_frame(self, frame_idx: int, **fields):
        rec = {"frame": frame_idx, "timestamp": time.time()}
        rec.update(fields)
        self.records.append(rec)
        self._last_frame = frame_idx
        if (frame_idx + 1) % self.save_period == 0:
            self.flush(frame_idx)

    def close(self):
        """Flush any trailing records (runs shorter than save_period, or
        frames after the last period boundary)."""
        if self.records:
            self.flush(getattr(self, "_last_frame", 0))

    def flush(self, frame_idx: int):
        if not self.records:
            return
        fname = os.path.join(self.logdir, f"run-frame{frame_idx:06d}.npz")
        keys = sorted({k for r in self.records for k in r})
        arrays = {}
        for k in keys:
            vals = [r.get(k, np.nan) for r in self.records]
            try:
                arrays[k] = np.asarray(vals)
            except Exception:
                arrays[k] = np.asarray([str(v) for v in vals])
        np.savez(fname, **arrays)
        self.records = []


def load_profile_logs(logdir: str) -> dict:
    """Load every run-frame*.npz under `logdir` into {frame_idx: record}.

    The consumer side of ProfileLogger (the reference's processing/utils.py
    load_data over run-frame*.pt); records carry whatever fields were logged
    (pose [4,4], exposure_a/b, last_l1, tracking_ms, ...). Used by the
    tracking override/replay modes (slam_frontend.py:106-110, 756-813) and
    the offline analysis plots (processing/utils.py delegates here — keep
    this the single loader for the run-frame npz layout). allow_pickle
    because ProfileLogger.flush can fall back to object arrays for fields
    that don't stack; the logs are this run's own local artifacts."""
    import glob

    out: dict[int, dict] = {}
    names = sorted(
        glob.glob(os.path.join(logdir, "run-frame*.npz"))
        # ProfileLogger writes under log_basedir/<timestamp>/ — accept the
        # base dir too (one level down), so override.first_logdir can point
        # at either
        or glob.glob(os.path.join(logdir, "*", "run-frame*.npz"))
    )
    for fname in names:
        with np.load(fname, allow_pickle=True) as z:
            keys = list(z.keys())
            frames = z["frame"]
            for i, fi in enumerate(np.asarray(frames, np.int64)):
                out[int(fi)] = {k: z[k][i] for k in keys}
    return out


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
