"""Typechecker + RW-analysis tests (reference frontend parity)."""

import glob

import pytest

from green_marl_tpu.lang.parser import parse, parse_file
from green_marl_tpu.lang.rw_analysis import analyze
from green_marl_tpu.lang.typecheck import GMTypeError, typecheck

REF = "/root/reference"

POSITIVE = ["apps/src", "test/parse", "test/sugars", "test/opt",
            "test/cpp_be", "test/rw_check", "test/gps"]


@pytest.mark.parametrize("subdir", POSITIVE)
def test_positive_suites_typecheck(subdir):
    for f in sorted(glob.glob(f"{REF}/{subdir}/*.gm")):
        typecheck(parse_file(f), f)   # must not raise


def test_error_suite_never_crashes_and_rejects_many():
    rejected = 0
    files = sorted(glob.glob(f"{REF}/test/errors/*.gm"))
    for f in files:
        try:
            typecheck(parse_file(f), f)
        except GMTypeError:
            rejected += 1
    # the reference rejects all 72; our front-end currently catches the
    # symbol/type/binding classes — keep a floor so regressions surface
    assert rejected >= 25, rejected


@pytest.mark.parametrize("snippet,frag", [
    ("Procedure foo(G: Graph) { X = 1; }", "undefined symbol 'X'"),
    ("Procedure foo(G: Graph) { Node(G) y; y.X = 1; }",
     "'X' is not a property"),
    ("Procedure foo(G: Graph) { Int x; { Int x; } }",
     "duplicate declaration"),
    ("Procedure foo(G: Graph) { Node(G) y;\n"
     "  Foreach(t: G.Nodes) { t = y; } }", "cannot assign to iterator"),
    ("Procedure foo() { Graph G; N_P<Int>(G) X; Int x; x.X = 0; }",
     "cannot drive a property access"),
    ("Procedure foo(G: Graph) { Int x; x = True; }", "cannot assign"),
])
def test_specific_errors(snippet, frag):
    with pytest.raises(GMTypeError) as ei:
        typecheck(parse(snippet))
    assert any(frag in e for e in ei.value.errors), ei.value.errors


def test_typecheck_annotations():
    procs = parse(
        "Proc f(G: Graph, A: N_P<Double>) : Double {\n"
        "  Double s = Sum(n: G.Nodes){ n.A };\n"
        "  Return s;\n"
        "}")
    typecheck(procs)
    decl = procs[0].body.stmts[0]
    assert decl.init.stype.kind == "DOUBLE"


class TestRW:
    def test_conflict_detected_random_write(self):
        rw = analyze(parse(
            "Proc f(G: Graph, A: N_P<Int>) {\n"
            "  Foreach(t: G.Nodes) {\n"
            "    Foreach(u: t.Nbrs) { u.A = 3; }\n"
            "    t.A = 4;\n"
            "  }\n"
            "}"))
        assert any("write-write" in w for w in rw.warnings)

    def test_scalar_write_in_parallel_loop(self):
        # WW conflict on a scalar: a *warning* like every WW in the
        # reference's check2 (compilation proceeds, last-store-wins; the
        # lowering picks the lowest-active-slot winner)
        rw = analyze(parse(
            "Proc f(G: Graph) {\n"
            "  Int y;\n"
            "  Foreach(t: G.Nodes) { y = 3; }\n"
            "}"))
        assert any("scalar 'y'" in w for w in rw.warnings)

    def test_reduction_is_clean(self):
        rw = analyze(parse(
            "Proc f(G: Graph, A: N_P<Int>) {\n"
            "  Int y = 0;\n"
            "  Foreach(t: G.Nodes) { y += t.A @ t; }\n"
            "}"))
        assert not rw.errors and not rw.warnings

    def test_mixed_reductions_rejected(self):
        rw = analyze(parse(
            "Proc f(G: Graph, A: N_P<Int>) {\n"
            "  Int y = 0;\n"
            "  Foreach(t: G.Nodes) { y += t.A @ t; y max= t.A @ t; }\n"
            "}"))
        assert any("mixed reduction" in e for e in rw.errors)

    def test_linear_per_iterator_writes_private(self):
        rw = analyze(parse(
            "Proc f(G: Graph, A, B: N_P<Int>) {\n"
            "  Foreach(t: G.Nodes) { t.A = t.B + 1; }\n"
            "}"))
        assert not rw.warnings and not rw.errors

    def test_defer_does_not_conflict(self):
        # hop_dist-style: defer writes via neighbors are race-free
        rw = analyze(parse_file(f"{REF}/apps/src/pagerank.gm"))
        assert not rw.errors

    def test_all_reference_files_analyze(self):
        for d in POSITIVE:
            for f in sorted(glob.glob(f"{REF}/{d}/*.gm")):
                analyze(parse_file(f), f)
