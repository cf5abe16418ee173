"""DSL frontend tests: lexer + parser over the reference corpus."""

import glob
import os

import pytest

from green_marl_tpu.lang import gm_ast as A
from green_marl_tpu.lang.lexer import tokenize
from green_marl_tpu.lang.parser import parse, parse_file

REF = "/root/reference"


def test_lexer_operators():
    kinds = [t.kind for t in tokenize("a += b; c min= d; e <= f @ g;")]
    assert "PLUSEQ" in kinds and "MINEQ" in kinds and "LE" in kinds \
        and "AT" in kinds


def test_lexer_inf_and_bool():
    toks = tokenize("x = (y == 0) ? +INF : -INF; b = True;")
    kinds = [t.kind for t in toks]
    assert "P_INF" in kinds and "M_INF" in kinds and "BOOL_VAL" in kinds


def test_parse_pagerank_structure():
    procs = parse_file(f"{REF}/apps/src/pagerank.gm")
    assert len(procs) == 1
    p = procs[0]
    assert p.name == "pagerank"
    assert [a.names for a in p.args] == [["G"], ["e", "d"], ["max"]]
    assert p.out_args[0].names == ["pg_rank"]
    assert p.out_args[0].type.kind == "NODEPROP"
    # body: vardecls, group assign, Do-While
    dowhile = [s for s in p.body.stmts if isinstance(s, A.While)]
    assert len(dowhile) == 1 and dowhile[0].do_while
    fe = [s for s in dowhile[0].body.stmts if isinstance(s, A.Foreach)]
    assert fe[0].iterator.iter_type == "NODES"
    # deferred write inside the foreach
    inner = fe[0].body
    defers = [s for s in inner.stmts if isinstance(s, A.DeferAssign)]
    assert len(defers) == 1 and defers[0].bind == "t"


def test_parse_bfs_construct():
    procs = parse_file(f"{REF}/apps/src/bc.gm")
    p = procs[0]
    seqs = [a for a in p.args if a.type.kind == "NSEQ"]
    assert seqs
    # find the InBFS statement with reverse body
    def find_bfs(st):
        if isinstance(st, A.BFS):
            return st
        for c in getattr(st, "stmts", []) or []:
            r = find_bfs(c)
            if r:
                return r
        if getattr(st, "body", None) is not None:
            return find_bfs(st.body)
        return None
    b = find_bfs(p.body)
    assert b is not None and b.is_bfs and b.body_bw is not None


def test_parse_argminmax():
    procs = parse(
        "Proc t(G: Graph, A: N_P<Int>) {\n"
        "  Int x = 0; Node(G) y; Bool p;\n"
        "  Foreach(n: G.Nodes)\n"
        "    <x; y, p> min= <n.A; n, n.A > 1>;\n"
        "}")
    fe = [s for s in procs[0].body.stmts if isinstance(s, A.Foreach)][0]
    am = fe.body
    assert isinstance(am, A.ArgMinMaxAssign)
    assert am.op == "MIN" and len(am.lhs_extra) == 2
    assert isinstance(am.rhs_extra[1], A.BinOp)  # n.A > 1


def test_parse_reduce_expressions():
    procs = parse(
        "Proc t(G: Graph, age: N_P<Int>) : Float {\n"
        "  Float s = Sum(n: G.Nodes)(n.age > 3){ n.age * 2 };\n"
        "  Int c = Count(j: G.Nodes)(j.age < 5);\n"
        "  Bool e = Exist(n: G.Nodes){ n.age == 7 };\n"
        "  Return s;\n"
        "}")
    decls = [s for s in procs[0].body.stmts if isinstance(s, A.VarDecl)]
    assert isinstance(decls[0].init, A.ReduceExpr)
    assert decls[0].init.op == "SUM" and decls[0].init.filter is not None
    assert decls[1].init.op == "COUNT"
    assert decls[2].init.op == "OR"


def test_parse_foreign():
    procs = parse(
        'Proc t(G: Graph, x: Double; y: Double) {\n'
        '  y = [sin($x) / 2];\n'
        '  [printf("hi")];\n'
        '  [$y = f($x)] :: [y];\n'
        "}")
    stmts = procs[0].body.stmts
    assert isinstance(stmts[0], A.Assign)
    assert isinstance(stmts[0].rhs, A.Foreign)
    assert isinstance(stmts[1], A.ForeignStmt)
    assert isinstance(stmts[2], A.ForeignStmt) and stmts[2].mutated


@pytest.mark.parametrize("subdir", [
    "apps/src", "test/parse", "test/sugars", "test/opt", "test/cpp_be",
    "test/rw_check", "test/gps", "test/errors"])
def test_reference_corpus_parses(subdir):
    files = sorted(glob.glob(f"{REF}/{subdir}/*.gm"))
    assert files, subdir
    for f in files:
        parse_file(f)  # must not raise (error-suite errors are semantic)
