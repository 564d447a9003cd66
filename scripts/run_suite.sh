#!/bin/bash
# Full test suite, split into two pytest processes — a FALLBACK for hosts
# where vm.max_map_count cannot be raised.
#
# Root cause (round 5): one pytest process over tests/ compiles hundreds
# of XLA:CPU executables; each holds several JIT code mappings and the
# kernel's default vm.max_map_count (65530) runs out near the end —
# LLVM's mmap fails ("Cannot allocate memory" with 120 GB of free RAM)
# and the process segfaults, at whatever test happens to compile next.
# tests/conftest.py now raises the limit automatically when running as
# root; on hosts where that fails, splitting the run across processes
# keeps each under the mapping budget.
#
# Usage: bash scripts/run_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
rc=0

echo "=== part 1/2: everything except the threaded-e2e files ==="
python -m pytest tests/ -q --ignore=tests/test_multichip.py "$@" || rc=1

echo "=== part 2/2: tests/test_multichip.py (own process) ==="
python -m pytest tests/test_multichip.py -q "$@" || rc=1

if [ "$rc" -eq 0 ]; then
    echo "SUITE GREEN (both parts)"
else
    echo "SUITE RED"
fi
exit $rc
