"""Run the output-parity harness inside the suite when the reference
binaries are built (scripts/build_reference.sh -> .refbuild/)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = os.path.join(REPO, ".refbuild", "apps", "output_cpp", "bin")


def test_parity_all_apps():
    if not os.path.exists(os.path.join(REFBIN, "pagerank")):
        pytest.skip("reference binaries not built "
                    "(scripts/build_reference.sh)")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity.py")],
        capture_output=True, text=True, cwd=REPO, timeout=850)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-1000:]
    assert "ALL PARITY CHECKS PASSED" in res.stdout
