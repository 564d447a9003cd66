"""Unit tests of the dead-TPU-relay guard (utils/relay.py): the probe must
detect a live localhost listener, and a requested-but-dead relay must raise
(fallback="error") instead of letting jax hang."""

import socket
import threading

import pytest

from monogs_tpu.utils import relay


def test_relay_requested_env(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert not relay.relay_requested()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert relay.relay_requested()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not relay.relay_requested()


def test_relay_alive_detects_listener(monkeypatch):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    monkeypatch.setattr(relay, "_RELAY_PORTS", (port,))
    monkeypatch.delenv("AXON_POOL_SVC_OVERRIDE", raising=False)
    t = threading.Thread(target=lambda: srv.accept(), daemon=True)
    t.start()
    try:
        assert relay.relay_alive(timeout=2.0)
    finally:
        srv.close()
    # port now closed
    assert not relay.relay_alive(timeout=0.5)


def test_dead_relay_raises_on_error_fallback(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    # a port nothing listens on
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    monkeypatch.setattr(relay, "_RELAY_PORTS", (port,))
    with pytest.raises(relay.RelayDeadError):
        relay.ensure_live_backend(fallback="error")


def test_no_relay_requested_is_noop(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert relay.ensure_live_backend(fallback="error") == "cpu"


def test_roundtrip_probe_timeout_returns_false(monkeypatch):
    """A wedged data path (relay accepts TCP, orchestrator never answers)
    must be detected by the subprocess round-trip probe, not hang."""
    import subprocess

    real_run = subprocess.run

    def fake_run(cmd, timeout=None, **kw):
        # stand-in for a probe whose readback blocks forever
        return real_run(["sleep", "999"], timeout=timeout, **kw)

    monkeypatch.setattr(relay.subprocess if hasattr(relay, "subprocess")
                        else subprocess, "run", fake_run)
    assert not relay.relay_roundtrip_ok(timeout=0.5)


def test_roundtrip_gates_error_fallback(monkeypatch):
    """Ports open but no round-trip -> RelayDeadError with the data-path
    diagnostic (not the no-listener one)."""
    import socket as _socket
    import threading as _threading

    srv = _socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    t = _threading.Thread(target=lambda: srv.accept(), daemon=True)
    t.start()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(relay, "_RELAY_PORTS", (port,))
    monkeypatch.delenv("AXON_POOL_SVC_OVERRIDE", raising=False)
    monkeypatch.setattr(relay, "relay_roundtrip_ok", lambda **kw: False)
    try:
        with pytest.raises(relay.RelayDeadError, match="round-trip"):
            relay.ensure_live_backend(fallback="error", roundtrip=True)
    finally:
        srv.close()
