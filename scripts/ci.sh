#!/usr/bin/env bash
# CI gate (reference scripts/buildbot.sh analog): build native, run the
# suite, the 27-app oracle sweep, the multichip dryrun, and (opt) a
# bench smoke.  Exit nonzero on any failure.
#
# Usage: scripts/ci.sh [--with-bench]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make -C native -s

echo "== unit + integration suite =="
python -m pytest tests/ -q -x

echo "== 27-app execute + oracle sweep =="
python scripts/app_sweep.py > /tmp/ci_sweep.log || {
  tail -40 /tmp/ci_sweep.log; exit 1; }
grep "EXEC OK: 27/27" /tmp/ci_sweep.log

echo "== multichip dryrun (8 virtual devices) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python __graft_entry__.py 8

if [[ "${1:-}" == "--with-bench" ]]; then
  echo "== bench smoke (real chip) =="
  BENCH_SMOKE=1 python bench.py
fi
echo "CI PASS"
