"""Dead-TPU-relay guard.

On this image every Python process is wired to a remote TPU through a local
relay (sitecustomize registers the `axon` PJRT plugin when
PALLAS_AXON_POOL_IPS is set, and JAX_PLATFORMS=axon forces jax onto it).
The plugin dials the relay lazily at first backend use and, when the relay
process is dead, BLOCKS FOREVER instead of erroring — `jax.devices()` hangs
and so does any entry point that touches jax.

`ensure_live_backend()` probes the relay's localhost ports with a short
socket timeout before jax initializes a backend. If the env requests the
relay but nothing is listening, it either redirects this process to the CPU
backend (`fallback="cpu"`, via `jax.config.update("jax_platforms", "cpu")`,
which wins over the env var as long as no backend has been initialized yet)
or raises (`fallback="error"`) so callers can fail fast with a diagnostic
instead of hanging a driver.
"""

from __future__ import annotations

import os
import socket

# the relay serves the axon pool service on localhost; when it dies every
# port in this range is closed (observed live: 8082 open healthy, all
# closed dead)
_RELAY_PORTS = tuple(range(8080, 8091))


class RelayDeadError(RuntimeError):
    pass


def relay_requested() -> bool:
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and (
        os.environ.get("JAX_PLATFORMS", "axon").strip() in ("", "axon")
    )


def relay_alive(timeout: float = 2.0) -> bool:
    host = os.environ.get("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    for port in _RELAY_PORTS:
        try:
            with socket.create_connection((host, port), timeout=timeout):
                return True
        except OSError:
            continue
    return False


def relay_roundtrip_ok(timeout: float = 240.0) -> bool:
    """True iff a REAL dispatch+readback round-trip through the relay works.

    `timeout` is the TOTAL budget, split across the two attempts
    (timeout/2 per try) so callers under their own outer `timeout` can
    treat it as a hard bound.

    `relay_alive()` only proves the in-VM relay process is listening; a
    second observed failure mode (round 3) is the relay accepting TCP while
    the orchestrator behind its stdio pump never answers — compiles and
    `block_until_ready` on cached trivial programs still return (the relay
    answers those locally, see CLAUDE.md), and the first device->host
    transfer then blocks FOREVER inside PJRT where no Python timeout can
    interrupt it. The only safe probe is a SUBPROCESS that compiles a novel
    program (time-seeded constant, so no compile cache can answer it) and
    reads the result back, killed from outside on timeout.

    Healthy cost: one interpreter start + one tiny compile (~15-45 s).

    Retries once on timeout: the probe subprocess needs real CPU time
    (interpreter start + trace + compile) BEFORE it ever reaches the
    relay, and this VM has ONE core — a concurrent heavy CPU job can
    starve the probe past the deadline and fake a "wedged" verdict
    (observed round 4: a healthy relay failed two probes launched next
    to CPU pytest runs, then answered a quiet-machine probe instantly).
    """
    import subprocess
    import sys
    import time

    per_try = max(1.0, timeout / 2.0)
    for attempt in (0, 1):
        seed = (int(time.time()) + attempt * 7919) % 100003
        probe = (
            "import jax, jax.numpy as jnp, numpy as np\n"
            f"x = jax.jit(lambda a: jnp.sin(a * (1 + {seed})).sum())"
            "(jnp.ones((64, 64)))\n"
            "print(float(np.asarray(x)))\n"
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=per_try,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            return r.returncode == 0
        except subprocess.TimeoutExpired:
            continue
        except OSError:
            return False
    return False


def ensure_live_backend(fallback: str = "cpu", roundtrip: bool = False) -> str:
    """Returns "axon" | "cpu". Must run BEFORE any jax backend init.

    roundtrip=True additionally verifies a full dispatch+readback through
    the relay in a killable subprocess (see relay_roundtrip_ok) — use it in
    every entry point that would otherwise hang un-interruptibly mid-run
    (bench.py, sweeps, profilers)."""
    if not relay_requested():
        return "cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else "axon"
    if relay_alive():
        if not roundtrip or relay_roundtrip_ok():
            return "axon"
        how = (
            "accepts TCP yet never answers a dispatch+readback round-trip "
            "(orchestrator behind the relay's stdio pump is wedged)"
        )
    else:
        how = (
            f"has no listener on localhost ports {_RELAY_PORTS[0]}-"
            f"{_RELAY_PORTS[-1]}"
        )
    if fallback == "error":
        raise RelayDeadError(
            f"TPU relay requested (PALLAS_AXON_POOL_IPS set) but the relay "
            f"{how} — jax device calls would hang forever. Restore the "
            "relay or run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu."
        )
    import sys

    import jax

    print(
        f"[monogs_tpu] TPU relay is DOWN ({how}); forcing the CPU backend "
        "for this process.",
        file=sys.stderr,
        flush=True,
    )
    jax.config.update("jax_platforms", "cpu")
    return "cpu"
