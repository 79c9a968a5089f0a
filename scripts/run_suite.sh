#!/bin/bash
# Full test suite, sharded ~8 files per pytest process.
#
# Why sharded: on some 1-core XLA:CPU hosts, a single pytest process
# that accumulates hundreds of program compilations can SIGSEGV inside
# XLA's backend_compile_and_load (jax 0.9.0) — see docs/STATUS.md
# "Known infra flake (r5)". Every test file is green in bounded-size
# processes; this runner makes that the default way to run the suite.
#
# Usage: scripts/run_suite.sh [shard_size]   (default 8)
set -u
cd "$(dirname "$0")/.."
export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"
export JAX_PLATFORMS=cpu
SIZE="${1:-8}"
mapfile -t FILES < <(ls tests/test_*.py)
total_rc=0
for ((i = 0; i < ${#FILES[@]}; i += SIZE)); do
  group=("${FILES[@]:i:SIZE}")
  echo "=== shard: ${group[*]}"
  python -m pytest "${group[@]}" -q --tb=short
  rc=$?
  if [ $rc -ne 0 ]; then
    total_rc=$rc
    echo "=== shard FAILED rc=$rc"
  fi
done
exit $total_rc
