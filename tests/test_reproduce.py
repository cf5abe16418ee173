"""Reproducer (pretty-printer) round-trip tests.

Mirrors the reference golden-test mechanism: ``test/parse`` etc. compile
with ``-Dr`` (reproduce) and diff the output (``test/parse/Makefile:1-15``).
Here the oracle is the fixpoint property — ``emit(parse(emit(ast)))`` must
equal ``emit(ast)`` — over every Green-Marl corpus in the reference tree,
plus re-typechecking of the reproduced source for the app corpus.
"""

import glob
import os

import pytest

from green_marl_tpu.lang import parser, reproduce, typecheck

REF = "/root/reference"
CORPORA = ["apps/src", "test/parse", "test/sugars", "test/opt",
           "test/rw_check", "test/cpp_be", "test/gps"]


def _files(sub):
    return sorted(glob.glob(os.path.join(REF, sub, "*.gm")))


@pytest.mark.parametrize("sub", CORPORA)
def test_roundtrip_fixpoint(sub):
    files = _files(sub)
    if not files:
        pytest.skip(f"no corpus at {sub}")
    checked = 0
    for f in files:
        with open(f) as fh:
            text = fh.read()
        try:
            ast1 = parser.parse(text, f)
        except Exception:
            continue  # negative-suite files may not parse
        s1 = reproduce.reproduce(ast1)
        ast2 = parser.parse(s1, f + "<reproduced>")
        s2 = reproduce.reproduce(ast2)
        assert s1 == s2, f"reproduce not a fixpoint for {f}"
        checked += 1
    assert checked > 0


def test_reproduced_apps_retypecheck():
    for f in _files("apps/src"):
        with open(f) as fh:
            ast1 = parser.parse(fh.read(), f)
        s1 = reproduce.reproduce(ast1)
        procs = parser.parse(s1, f + "<reproduced>")
        typecheck.typecheck(procs)  # must not raise


def test_reproduce_operator_precedence():
    src = """
Procedure t(G: Graph, a: Int, b: Int, c: Int) : Int
{
    Int x = (a + b) * c;
    Int y = a + b * c;
    Int z = (a < b) ? a : b;
    Return x + y + z;
}
"""
    ast1 = parser.parse(src)
    s1 = reproduce.reproduce(ast1)
    assert "(a + b) * c" in s1
    assert "a + (b * c)" in s1 or "a + b * c" in s1
    ast2 = parser.parse(s1)
    assert reproduce.reproduce(ast2) == s1
