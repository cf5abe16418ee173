#!/usr/bin/env bash
# Line-coverage report (reference Makefile lcov target analog).  The
# image ships no coverage.py/pytest-cov, so this uses stdlib `trace`
# over the fast frontend suites, filtered to the package; full-suite
# coverage needs pip access.
set -euo pipefail
cd "$(dirname "$0")/.."
timeout 900 python -m trace --count --summary --coverdir=/tmp/gm_cover \
  "$(command -v pytest)" tests/test_lang.py tests/test_lang_semantics.py \
  -q 2>/dev/null | grep "green_marl_tpu" || true
echo "per-file .cover annotations in /tmp/gm_cover"
