"""Visitor/transform framework tests (reference ``gm_traverse.h`` /
``gm_transform_helper.h`` semantics) + const_fold + compile-step
framework."""

import copy
import glob
import os

import numpy as np
import pytest

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.lang import gm_ast as A
from green_marl_tpu.lang import opt, parser, reproduce, traverse
from green_marl_tpu.lang.lower import CompiledProc
from green_marl_tpu.lang.steps import (CompileStep, FunctionStep,
                                       Pipeline, step)
from green_marl_tpu.lang.typecheck import typecheck

APPS = "/root/reference/apps/src"

SRC = """
Procedure t(G: Graph, A: N_P<Int>(G)) : Int {
    Int total = 0;
    Foreach (n: G.Nodes) {
        total += n.A @ n;
    }
    If (total > 3) {
        total = total * 2;
    }
    Return total;
}
"""


def _parse(src=SRC):
    procs = parser.parse(src)
    typecheck(procs)
    return procs[-1]


# ---- visitor ------------------------------------------------------------

def test_stmt_pre_post_order():
    p = _parse()
    pre, post = [], []

    class V(traverse.Visitor):
        def visit_stmt(self, s):
            pre.append(type(s).__name__)

        def visit_stmt_post(self, s):
            post.append(type(s).__name__)

    traverse.traverse(p, V())
    assert pre[0] == "Block"            # procedure body first
    assert "Foreach" in pre and "If" in pre and "Return" in pre
    # post-order: a statement's post fires after its children's
    assert post.index("ReduceAssign") < post.index("Foreach")
    assert set(pre) == set(post)


def test_walk_equivalence_against_opt_walkers():
    """The visitor enumerates exactly the statements opt._walk_stmts
    does, in the same pre-order, over every reference app."""
    files = sorted(glob.glob(os.path.join(APPS, "*.gm")))
    if not files:
        pytest.skip("reference apps unavailable")
    for f in files:
        with open(f) as fh:
            try:
                procs = parser.parse(fh.read())
            except Exception:
                continue
        for p in procs:
            a = [id(s) for s in opt._walk_stmts(p.body)]
            b = []
            traverse.traverse_stmts(p.body, lambda s: b.append(id(s)))
            assert a == b, f


def test_expr_visit_and_prune():
    p = _parse()
    seen = []

    class V(traverse.Visitor):
        def visit_expr(self, e):
            seen.append(e)
            if isinstance(e, A.BinOp):
                return False            # prune below binops

    traverse.traverse(p, V())
    for e in seen:
        # pruned: no operand of a BinOp may appear
        for q in seen:
            if isinstance(q, A.BinOp):
                assert e is not q.lhs and e is not q.rhs


def test_ids_and_context_events():
    p = _parse()
    ids, ctx = [], []

    class V(traverse.Visitor):
        def visit_id(self, name, owner):
            ids.append(name)

        def begin_context(self, n):
            ctx.append(("in", type(n).__name__))

        def end_context(self, n):
            ctx.append(("out", type(n).__name__))

    traverse.traverse(p, V())
    assert {"G", "A", "n", "total"} <= set(ids)
    assert ctx[0] == ("in", "Procedure") and ctx[-1] == \
        ("out", "Procedure")
    assert ("in", "Foreach") in ctx


def test_lhs_rhs_matching():
    p = _parse()
    got = []

    class V(traverse.Visitor):
        def visit_rhs(self, root, stmt):
            got.append((type(stmt).__name__, root))
            assert self.matching_rhs_top is root
            assert self.matching_lhs is not None

    traverse.traverse(p, V())
    kinds = [k for k, _ in got]
    assert "ReduceAssign" in kinds and "Assign" in kinds


def test_parent_map_and_traverse_up():
    p = _parse()
    pmap = traverse.build_parent_map(p.body)
    # find the ReduceAssign and walk up to the Foreach then body Block
    hit = []
    traverse.traverse_stmts(p.body, lambda s: hit.append(s)
                            if isinstance(s, A.ReduceAssign) else None)
    ra = hit[0]
    chain = []
    ok = traverse.traverse_up(ra, pmap,
                              lambda n: chain.append(type(n).__name__)
                              or True)
    assert ok
    assert "Foreach" in chain and chain[-1] == "Block"
    # early stop returns False
    assert traverse.traverse_up(
        ra, pmap, lambda n: not isinstance(n, A.Foreach)) is False


def test_replace_subexpr():
    p = _parse()
    # replace the literal 3 in the If condition with 30
    target = []
    traverse.traverse_exprs(
        p, lambda e: target.append(e)
        if isinstance(e, A.Const) and e.value == 3 else None)
    new = A.Const(value=30, ctype="INT")
    assert traverse.replace_subexpr(p, target[0], new)
    text = reproduce.reproduce([p])
    assert "30" in text
    assert not traverse.replace_subexpr(p, A.Const(value=7,
                                                   ctype="INT"),
                                        new)


# ---- transformer / const_fold ------------------------------------------

FOLD_SRC = """
Procedure f(G: Graph, A: N_P<Int>(G)) : Int {
    Int x = 0;
    If (2 + 3 > 4) { x = x + (10 * 2 - 20); }
    If (1 > 2) { x = x + 1000; }
    While (False) { x = x + 7; }
    Foreach (n: G.Nodes) { x += (True && (n.A > 0)) ? 1 : 0; }
    Return x + (4 / 2) - (5 / 2);
}
"""


def test_const_fold_structure():
    procs = parser.parse(FOLD_SRC)
    typecheck(procs)
    p = opt.const_fold(copy.deepcopy(procs[-1]))
    text = reproduce.reproduce([p])
    assert "1000" not in text           # dead If dropped
    assert "While" not in text          # While(false) dropped
    assert "&&" not in text             # true && e -> e
    # int division folded with C truncation: 4/2=2, 5/2=2
    assert "4 / 2" not in text and "5 / 2" not in text
    typecheck([p])                      # still types


def test_const_fold_execution_equiv():
    procs = parser.parse(FOLD_SRC)
    typecheck(procs)
    base = procs[-1]
    folded = opt.const_fold(copy.deepcopy(base))
    typecheck([folded])
    src, dst = gen.rmat_edges(100, 600, seed=3)
    g, _ = from_edges(src, dst, 100)
    aprop = np.arange(100, dtype=np.int32) % 3 - 1
    r0 = CompiledProc(copy.deepcopy(base))(g, A=aprop)
    r1 = CompiledProc(folded)(g, A=aprop)
    assert int(r0["_return"]) == int(r1["_return"])


def test_const_fold_in_default_pipeline_keeps_apps_green():
    """const_fold sits in DEFAULT_PASSES; every reference app must
    still typecheck after the full pipeline (execution equivalence is
    covered app-by-app in test_apps/test_opt)."""
    files = sorted(glob.glob(os.path.join(APPS, "*.gm")))
    if not files:
        pytest.skip("reference apps unavailable")
    n = 0
    for f in files:
        with open(f) as fh:
            try:
                procs = parser.parse(fh.read())
                typecheck(procs)
            except Exception:
                continue
        for p in procs:
            o = opt.optimize(copy.deepcopy(p))
            typecheck([o])
            n += 1
    assert n >= 20


def test_transformer_splices_lists():
    p = _parse()

    class T(traverse.Transformer):
        def rewrite_stmt(self, s):
            if isinstance(s, A.Return):
                # duplicate for splice check: decl + return
                return [A.VarDecl(type=A.Type(kind="INT"),
                                  names=["zz"],
                                  init=A.Const(value=1, ctype="INT")),
                        s]

    traverse.transform(p, T())
    text = reproduce.reproduce([p])
    assert "zz" in text


# ---- steps framework ----------------------------------------------------

def test_function_step_and_pipeline_trace():
    procs = parser.parse(FOLD_SRC)
    typecheck(procs)
    pipe = opt.default_pipeline()
    assert "const_fold" in pipe.names()
    out = pipe.run(copy.deepcopy(procs[-1]), probe_affected=True)
    typecheck([out])
    ran = [name for _, name, ok, _ in pipe.trace]
    assert ran == pipe.names()
    assert all(ok for _, _, ok, _ in pipe.trace)
    # const_fold must report affected=True on this source
    aff = {name: a for _, name, _, a in pipe.trace}
    assert aff["const_fold"] is True


def test_pipeline_subset_matches_optimize_passes_arg():
    procs = parser.parse(FOLD_SRC)
    typecheck(procs)
    a = opt.optimize(copy.deepcopy(procs[-1]),
                     passes=["const_fold", "remove_unused"])
    pipe = opt.default_pipeline().subset(["const_fold",
                                          "remove_unused"])
    b = pipe.run(copy.deepcopy(procs[-1]))
    assert reproduce.reproduce([a]) == reproduce.reproduce([b])


def test_step_decorator_and_error_capture():
    @step("boom")
    def boom(proc):
        raise RuntimeError("nope")

    assert isinstance(boom, FunctionStep)
    procs = parser.parse(SRC)
    typecheck(procs)
    pipe = Pipeline([boom])
    with pytest.raises(RuntimeError):
        pipe.run(copy.deepcopy(procs[-1]))
    pipe2 = Pipeline([boom])
    out = pipe2.run(copy.deepcopy(procs[-1]), keep_going=True)
    assert out is not None
    assert pipe2.trace[-1][2] is False      # okay=False recorded

    class MyStep(CompileStep):
        name = "noop"
        description = "does nothing"

        def process(self, proc):
            return proc

    pipe3 = Pipeline([MyStep()])
    pipe3.run(copy.deepcopy(procs[-1]), probe_affected=True)
    assert pipe3.trace[-1][3] is False      # affected=False (probed)
    pipe4 = Pipeline([MyStep()])
    pipe4.run(copy.deepcopy(procs[-1]))
    assert pipe4.trace[-1][3] is None       # un-probed: no serialization
    # steps stay callable like the bare pass function
    assert MyStep()(procs[-1]) is procs[-1]
    assert "noop" in pipe3.describe()
