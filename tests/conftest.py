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

# The full suite compiles hundreds of XLA:CPU executables in one process;
# each holds several JIT code mappings, and the kernel's default
# vm.max_map_count (65530) runs out near the end of the run — LLVM then
# fails mmap with "Cannot allocate memory" and the process SEGFAULTS
# (observed round 5, exit 139 with 120 GB of free RAM). Raise the limit
# when we can (this image runs tests as root); warn loudly when we can't.
try:
    with open("/proc/sys/vm/max_map_count") as f:
        _maps = int(f.read().strip())
    if _maps < 262144:
        try:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write("1048576\n")
        except OSError:
            sys.stderr.write(
                f"[conftest] WARNING: vm.max_map_count={_maps} is too low "
                "for the full suite in one process and could not be "
                "raised; expect an LLVM mmap segfault near the end — "
                "run `sysctl -w vm.max_map_count=1048576` or use "
                "scripts/run_suite.sh\n"
            )
except OSError:
    pass
