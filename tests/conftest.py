"""Test configuration: force the host CPU platform with 8 virtual devices.

This image boots every Python process through a sitecustomize hook that dials
the remote TPU relay (PALLAS_AXON_POOL_IPS) and eagerly initializes the
'axon' PJRT backend — before pytest or this conftest ever run. Unit tests
must run on CPU (fast, exact transcendentals, 8 virtual devices for sharding
tests), so if the axon hook already fired we re-exec pytest once with a
sanitized environment. bench.py and the CLI keep the TPU backend.
"""

import os
import sys

_SANITIZED_FLAG = "MONOGS_TPU_TEST_SANITIZED"

if os.environ.get(_SANITIZED_FLAG) != "1" and (
    os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get("JAX_PLATFORMS") == "axon"
):
    env = dict(os.environ)
    env[_SANITIZED_FLAG] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"  # progress dots reach pipes immediately
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
