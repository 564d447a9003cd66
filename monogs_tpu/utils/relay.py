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


def ensure_live_backend(fallback: str = "cpu") -> str:
    """Returns "axon" | "cpu". Must run BEFORE any jax backend init."""
    if not relay_requested():
        return "cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else "axon"
    if relay_alive():
        return "axon"
    if fallback == "error":
        raise RelayDeadError(
            "TPU relay requested (PALLAS_AXON_POOL_IPS set) but nothing is "
            f"listening on localhost ports {_RELAY_PORTS[0]}-"
            f"{_RELAY_PORTS[-1]} — jax.devices() would hang forever. "
            "Restore the relay or run with PALLAS_AXON_POOL_IPS= "
            "JAX_PLATFORMS=cpu."
        )
    import sys

    import jax

    print(
        "[monogs_tpu] TPU relay is DOWN (no listener on localhost "
        f"{_RELAY_PORTS[0]}-{_RELAY_PORTS[-1]}); forcing the CPU backend "
        "for this process.",
        file=sys.stderr,
        flush=True,
    )
    jax.config.update("jax_platforms", "cpu")
    return "cpu"
