"""Backend-independent optimizer tests (reference ``src/opt/``, ``test/opt/``).

The reference golden-tests its optimizer by diffing reproduced source
(``test/opt/Makefile:1-22``).  We check *both* more and less: structural
assertions on the rewritten AST (what the goldens capture) plus execution
equivalence — the lowered program must produce identical results before
and after every pass (what the goldens can't check).
"""

import copy

import numpy as np
import pytest

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.lang import gm_ast as A
from green_marl_tpu.lang import opt, parser, reproduce
from green_marl_tpu.lang.lower import CompiledProc
from green_marl_tpu.lang.typecheck import typecheck


@pytest.fixture(scope="module")
def graph():
    src, dst = gen.rmat_edges(200, 1200, seed=11)
    g, _ = from_edges(src, dst, 200)
    return g


def _run(proc, g, *args, **kwargs):
    out = CompiledProc(copy.deepcopy(proc))(g, *args, **kwargs)
    return {k: np.asarray(v) for k, v in out.items()}


def _check_equiv(src, g, *args, passes=None, **kwargs):
    procs = parser.parse(src)
    typecheck(procs)
    base = procs[-1]
    o = opt.optimize(copy.deepcopy(base), passes=passes)
    typecheck([o])  # optimized AST must still typecheck
    r1 = _run(base, g, *args, **kwargs)
    r2 = _run(o, g, *args, **kwargs)
    assert set(r1) == set(r2)
    for k in r1:
        np.testing.assert_allclose(r1[k], r2[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)
    return base, o


SUGAR2_SRC = """
Procedure s2(G: Graph, w: N_P<Double>) : Double
{
    Double total = Sum(n: G.Nodes){n.w * 2.0};
    Int highs = Count(n: G.Nodes)(n.w > 0.5);
    Double m = Avg(n: G.Nodes){n.w};
    Return total + (Double) highs + m;
}
"""


def test_sugar2_expands_and_preserves(graph):
    w = np.random.RandomState(3).rand(graph.n_pad)
    base, o = _check_equiv(SUGAR2_SRC, graph, passes=["sugar2"], w=w)
    # all statement-level reduce-expressions are gone
    def has_stmt_reduce(p):
        for st in opt._walk_stmts(p.body):
            if isinstance(st, (A.Assign, A.VarDecl)):
                for e in opt._walk_exprs_of(st):
                    if any(isinstance(x, A.ReduceExpr)
                           for x in opt._walk_expr(e)):
                        return True
        return False
    assert has_stmt_reduce(base)
    assert not has_stmt_reduce(o)
    # and the expansion produced Foreach loops
    n_loops = sum(isinstance(st, A.Foreach)
                  for st in opt._walk_stmts(o.body))
    assert n_loops >= 4  # sum, count, avg-sum, avg-count


LOOP_MERGE_SRC = """
Procedure lm(G: Graph; a: N_P<Double>, b: N_P<Double>) : Double
{
    Foreach(n: G.Nodes) {
        n.a = (Double) n.OutDegree();
    }
    Foreach(m: G.Nodes) {
        m.b = m.a * 2.0;
    }
    Foreach(t: G.Nodes) {
        t.b = t.b + 1.0;
    }
    Return Sum(n: G.Nodes){n.a + n.b};
}
"""


def test_loop_merge_fuses(graph):
    base, o = _check_equiv(LOOP_MERGE_SRC, graph, passes=["loop_merge"])
    def count_loops(p):
        return sum(isinstance(st, A.Foreach) and not st.sequential
                   for st in opt._walk_stmts(p.body)
                   if isinstance(st, A.Foreach)
                   and st.iterator.iter_type == "NODES")
    # m-loop reads a at m only (LINEAR) -> mergeable; t-loop likewise
    assert count_loops(base) == 3
    assert count_loops(o) == 1


LOOP_MERGE_UNSAFE_SRC = """
Procedure lmu(G: Graph; a: N_P<Double>) : Double
{
    Foreach(n: G.Nodes) {
        n.a = 1.0;
    }
    Foreach(m: G.Nodes) {
        m.a = Sum(t: m.Nbrs){t.a};
    }
    Return Sum(n: G.Nodes){n.a};
}
"""


def test_loop_merge_rejects_random_conflict(graph):
    base, o = _check_equiv(LOOP_MERGE_UNSAFE_SRC, graph,
                           passes=["loop_merge"])
    # second loop reads a RANDOM (via t) while first writes it -> no fuse
    tops_base = [s for s in base.body.stmts if isinstance(s, A.Foreach)]
    tops_opt = [s for s in o.body.stmts if isinstance(s, A.Foreach)]
    assert len(tops_base) == len(tops_opt) == 2


MOVE_PROPDECL_SRC = """
Procedure mp(G: Graph, iters: Int; out: N_P<Double>)
{
    Int i = 0;
    G.out = 0.0;
    While (i < iters) {
        N_P<Double> tmp;
        Foreach(n: G.Nodes) { n.tmp = n.out + 1.0; }
        Foreach(n: G.Nodes) { n.out = n.tmp; }
        i = i + 1;
    }
}
"""


def test_move_propdecl_hoists(graph):
    base, o = _check_equiv(MOVE_PROPDECL_SRC, graph, 3,
                           passes=["move_propdecl"])
    # tmp's decl moved to procedure top
    first = o.body.stmts[0]
    assert isinstance(first, A.VarDecl) and first.type.is_property()
    w = next(st for st in opt._walk_stmts(o.body) if isinstance(st, A.While))
    assert not any(isinstance(st, A.VarDecl) and st.type.is_property()
                   for st in opt._walk_stmts(w.body))


NONCONF_SRC = """
Procedure nc(G: Graph, x: N_P<Double>; y: N_P<Double>) : Double
{
    G.y = 0.0;
    Foreach(n: G.Nodes) {
        n.y += n.x * 2.0 @ n;
        n.y += 1.0;
    }
    Return Sum(n: G.Nodes){n.y};
}
"""


def test_nonconf_reduce_demotes(graph):
    x = np.random.RandomState(5).rand(graph.n_pad)
    base, o = _check_equiv(NONCONF_SRC, graph, passes=["nonconf_reduce"],
                           x=x)
    fe = next(st for st in opt._walk_stmts(o.body)
              if isinstance(st, A.Foreach))
    assert all(isinstance(st, A.Assign)
               for st in fe.body.stmts), "reduce-assigns must be demoted"


DCE_SRC = """
Procedure dce(G: Graph; out: N_P<Double>) : Double
{
    Int never_used = 5;
    Double dead;
    dead = 3.0;
    G.out = 1.0;
    Foreach(n: G.Nodes) {
        Double ghost = n.out * 2.0;
        n.out = n.out + 1.0;
    }
    Return Sum(n: G.Nodes){n.out};
}
"""


def test_remove_unused_scalars(graph):
    base, o = _check_equiv(DCE_SRC, graph, passes=["remove_unused"])
    names = set()
    for st in opt._walk_stmts(o.body):
        if isinstance(st, A.VarDecl):
            names.update(st.names)
    assert "never_used" not in names
    assert "dead" not in names
    assert "ghost" not in names


ARGMM_SRC = """
Procedure amm(G: Graph, D: N_P<Int>(G)) : Node {
    Node r;
    Int best;
    best = +INF;
    Foreach (n: G.Nodes) {
        <best; r> min= <n.D; n>;
    }
    Return r;
}
"""


def test_remove_unused_keeps_argminmax_targets(graph):
    """An argmin/argmax reduction READS its targets (primary for the
    compare); remove_unused must not strip a target's decl/init while
    the reduction survives (regression: typecheck failed after
    optimize)."""
    procs = parser.parse(ARGMM_SRC)
    typecheck(procs)
    o = opt.optimize(copy.deepcopy(procs[-1]))
    typecheck([o])                       # 'best' must still resolve
    text = reproduce.reproduce([o])
    assert "Int best" in text and "best = " in text
    d = np.arange(graph.n_pad, dtype=np.int32) % 13
    r0 = _run(procs[-1], graph, D=d)
    r1 = _run(o, graph, D=d)
    assert int(r0["_return"]) == int(r1["_return"])


FLIP_SRC = """
Procedure fl(G: Graph, x: N_P<Double>; acc: N_P<Double>)
{
    G.acc = 0.0;
    Foreach(n: G.Nodes) {
        Foreach(t: n.InNbrs) {
            n.acc += t.x @ t;
        }
    }
}
"""


def test_flip_edges_pull_to_push(graph):
    x = np.random.RandomState(7).rand(graph.n_pad)
    procs = parser.parse(FLIP_SRC)
    typecheck(procs)
    base = procs[-1]
    flipped = opt.flip_edges(copy.deepcopy(base))
    typecheck([flipped])
    outer = next(st for st in opt._walk_stmts(flipped.body)
                 if isinstance(st, A.Foreach))
    inner = next(st for st in opt._walk_stmts(outer.body)
                 if isinstance(st, A.Foreach) and st is not outer)
    assert outer.iterator.var == "t"
    assert inner.iterator.iter_type == "NBRS"
    r1 = _run(base, graph, x=x)
    r2 = _run(flipped, graph, x=x)
    np.testing.assert_allclose(r1["acc"], r2["acc"], rtol=1e-6)


def test_default_pipeline_on_reference_apps(graph):
    """The full default pipeline preserves results of real programs."""
    import os
    ref = "/root/reference/apps/src"
    cases = {
        "pagerank.gm": ((0.001, 0.85, 30), {}),
        "conduct.gm": ((), {"member": np.arange(graph.n_pad) % 4,
                            "num": 2}),
    }
    for fname, (args, kwargs) in cases.items():
        path = os.path.join(ref, fname)
        if not os.path.exists(path):
            pytest.skip("reference apps not mounted")
        procs = parser.parse_file(path)
        typecheck(procs)
        base = procs[-1]
        o = opt.optimize(copy.deepcopy(base))
        typecheck([o])
        r1 = _run(base, graph, *args, **kwargs)
        r2 = _run(o, graph, *args, **kwargs)
        for k in r1:
            np.testing.assert_allclose(r1[k], r2[k], rtol=1e-5,
                                       atol=1e-6, err_msg=f"{fname}:{k}")


def test_all_reference_apps_optimize_and_reproduce():
    """Every reference program survives the full pipeline: optimize ->
    still typechecks -> still reproduces to parseable source."""
    import glob
    import os
    files = sorted(glob.glob("/root/reference/apps/src/*.gm"))
    if not files:
        pytest.skip("reference apps not mounted")
    for f in files:
        procs = parser.parse_file(f)
        typecheck(procs)
        outs = opt.optimize(procs)
        typecheck(outs)
        text = reproduce.reproduce(outs)
        reparsed = parser.parse(text, f + "<opt>")
        assert len(reparsed) == len(outs)


def test_hoist_respects_iterator_source_and_field_mutators():
    """Hoisting must not move a Foreach above a write to its iteration
    source, nor past set-valued property mutators (round-3 review)."""
    from green_marl_tpu.lang import opt
    from green_marl_tpu.lang.parser import parse
    from green_marl_tpu.lang.reproduce import reproduce
    from green_marl_tpu.lang.typecheck import typecheck

    src = """
    Procedure f(G: Graph, b: Node, p: N_P<Int>) {
        Node x;
        x = b;
        Foreach(s: x.Nbrs) { s.p += 1; }
    }
    """
    procs = parse(src)
    typecheck(procs)
    out = reproduce(opt.optimize(procs[0]))
    assert out.index("x = b") < out.index("Foreach")

    src2 = """
    Procedure g2(G: Graph, root: Node, S: N_P<N_S>) {
        root.S.Remove(root);
        Foreach(n: G.Nodes) { n.S.Add(root); }
    }
    """
    procs2 = parse(src2)
    typecheck(procs2)
    out2 = reproduce(opt.optimize(procs2[0]))
    assert out2.index("Remove") < out2.index("Foreach")


class TestReachingDefs:
    """Reaching-defs + dead-store elimination (VERDICT r3 item 9:
    gm_reaching_def_analysis.cc analog as a real pass)."""

    def _count_loops(self, proc):
        from green_marl_tpu.lang import gm_ast as A
        n = 0

        def walk(s):
            nonlocal n
            if isinstance(s, A.Foreach):
                n += 1
            for attr in ("stmts", "then", "els", "body"):
                sub = getattr(s, attr, None)
                if isinstance(sub, list):
                    for x in sub:
                        walk(x)
                elif sub is not None and isinstance(sub, A.Stmt):
                    walk(sub)
        walk(proc.body)
        return n

    def test_dead_group_store_removed(self):
        from green_marl_tpu.lang import opt
        from green_marl_tpu.lang.parser import parse
        from green_marl_tpu.lang.typecheck import typecheck
        src = """
        Proc p(G: Graph, A: N_P<Int>, B: N_P<Int>) {
            G.A = 0;
            Foreach(n: G.Nodes) { n.A = n.B + 1; }
        }
        """
        procs = parse(src)
        typecheck(procs)
        p = opt.optimize(procs[0], clone=True)
        from green_marl_tpu.lang import gm_ast as A_
        tops = p.body.stmts
        assert not any(isinstance(s, A_.Assign) and
                       isinstance(s.lhs, A_.Field) and
                       s.lhs.driver == "G" for s in tops), \
            "dead G.A = 0 should be eliminated"

    def test_filtered_overwrite_keeps_store(self):
        from green_marl_tpu.lang import opt
        from green_marl_tpu.lang import gm_ast as A_
        from green_marl_tpu.lang.parser import parse
        from green_marl_tpu.lang.typecheck import typecheck
        src = """
        Proc p(G: Graph, A: N_P<Int>, B: N_P<Int>) {
            G.A = 0;
            Foreach(n: G.Nodes)(n.B > 0) { n.A = n.B + 1; }
        }
        """
        procs = parse(src)
        typecheck(procs)
        p = opt.optimize(procs[0], clone=True)
        tops = p.body.stmts
        assert any(isinstance(s, A_.Assign) and
                   isinstance(s.lhs, A_.Field) and
                   s.lhs.driver == "G" for s in tops), \
            "filtered overwrite must NOT kill the init"

    def test_merge_enabled_only_by_reaching_defs(self):
        """Two loops separated by a dead store of a property BOTH write:
        the flat RW sets can never reorder across it; removing it via
        reaching-defs lets loop_merge fuse them."""
        from green_marl_tpu.lang import opt
        from green_marl_tpu.lang.parser import parse
        from green_marl_tpu.lang.typecheck import typecheck
        src = """
        Proc p(G: Graph, A: N_P<Int>, B: N_P<Int>, C: N_P<Int>) {
            Foreach(n: G.Nodes) { n.A = n.C + 1; }
            G.B = 0;
            Foreach(m: G.Nodes) { m.B = m.A + 2; }
        }
        """
        procs = parse(src)
        typecheck(procs)
        # without dead_store_elim: the G.B store blocks hoisting (both
        # write $B) and the loops stay separate
        passes = [(n, f) for n, f in opt.DEFAULT_PASSES
                  if n != "dead_store_elim"]
        p0 = opt.optimize(procs[0], passes=[n for n, _ in passes],
                          clone=True)
        assert self._count_loops(p0) == 2
        # with it: the store dies, the loops become adjacent and merge
        p1 = opt.optimize(procs[0], clone=True)
        assert self._count_loops(p1) == 1

    def test_scalar_dead_store(self):
        from green_marl_tpu.lang import gm_ast as A_
        from green_marl_tpu.lang import opt
        from green_marl_tpu.lang.parser import parse
        from green_marl_tpu.lang.typecheck import typecheck
        src = """
        Proc p(G: Graph) : Int {
            Int x;
            x = 3;
            x = 5;
            Return x;
        }
        """
        procs = parse(src)
        typecheck(procs)
        p = opt.optimize(procs[0], clone=True)
        assigns = [s for s in p.body.stmts
                   if isinstance(s, A_.Assign)]
        vals = [int(s.rhs.value) for s in assigns]
        assert 3 not in vals and 5 in vals
