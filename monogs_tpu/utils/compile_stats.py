"""Count XLA compilations and persistent-cache hits (VERDICT r4 #6).

Warm-start latency is governed by how many distinct programs a run
compiles and whether the persistent cache answers them. jax logs both
events ('Compiling <name> ...' from pxla at jax_log_compiles, and
"Persistent compilation cache hit" from jax._src.compiler at DEBUG);
this module attaches a counting handler so bench.py can print compiled
program counts and the cache hit-rate in its tail.

Usage:
    stats = CompileStats.install()
    ... run ...
    print(stats.summary())
"""

from __future__ import annotations

import logging


class CompileStats(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.compiled: list[str] = []
        self.cache_hits: list[str] = []

    def emit(self, record: logging.LogRecord):
        try:
            msg = record.getMessage()
        except Exception:
            return
        if msg.startswith("Compiling "):
            # "Compiling <name> (...) for %d devices ..." (pxla)
            self.compiled.append(msg.split(" ", 2)[1])
        elif "compilation cache hit" in msg.lower():
            self.cache_hits.append(msg)

    @classmethod
    def install(cls) -> "CompileStats":
        # NO jax_log_compiles: that flag also raises jax._src.dispatch's
        # per-trace messages to WARNING and floods stderr (measured: it
        # drowned a bench run's log). The 'Compiling <name>' record in
        # pxla and the cache-hit record in jax._src.compiler are emitted
        # at DEBUG regardless — capturing them only needs logger levels.
        h = cls()
        for name in ("jax._src.interpreters.pxla", "jax._src.compiler"):
            lg = logging.getLogger(name)
            lg.addHandler(h)
            if lg.level > logging.DEBUG or lg.level == logging.NOTSET:
                lg.setLevel(logging.DEBUG)
            lg.propagate = False  # keep the DEBUG stream out of stderr
        return h

    @property
    def n_compiled(self) -> int:
        return len(self.compiled)

    @property
    def n_cache_hits(self) -> int:
        return len(self.cache_hits)

    def hit_rate(self) -> float:
        tot = self.n_compiled
        return (self.n_cache_hits / tot) if tot else 0.0

    def summary(self, top: int = 8) -> str:
        from collections import Counter

        names = Counter(self.compiled)
        head = ", ".join(f"{n} x{c}" for n, c in names.most_common(top))
        return (f"{self.n_compiled} programs compiled, "
                f"{self.n_cache_hits} persistent-cache hits "
                f"({100 * self.hit_rate():.0f}%); top: {head}")
