"""gm_comp driver CLI analog (cli/gmc.py): stage stops, reproduce,
RW report, never-crash error protocol (test/errors, test/rw_check)."""

import contextlib
import glob
import io

import pytest

from green_marl_tpu.cli.gmc import main

REF = "/root/reference"


def _run(args):
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        rc = main(args)
    return rc, out.getvalue(), err.getvalue()


def test_full_compile_ok():
    rc, out, _ = _run([f"{REF}/apps/src/pagerank.gm"])
    assert rc == 0 and "ok (pagerank)" in out


def test_stage_stop_reproduce():
    rc, out, _ = _run([f"{REF}/apps/src/hop_dist.gm", "-DS=2", "-Dr"])
    assert rc == 0 and "Procedure hop_dist" in out


def test_rw_report():
    rc, out, _ = _run([f"{REF}/test/rw_check/rw1.gm", "-DS=2", "-Dw"])
    assert rc == 0
    assert "LINEAR" in out and "SUM=" in out


@pytest.mark.parametrize("f", sorted(
    glob.glob(f"{REF}/test/errors/*.gm"))[:20])
def test_error_files_never_crash(f):
    rc, _, _ = _run([f, "-DS=2"])
    assert rc in (0, 1)
