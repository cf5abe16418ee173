"""DSL lowering tests: .gm sources -> jitted JAX programs -> oracles.

The reference's codegen tests are compile-link smoke only
(``test/cpp_be/``, SURVEY.md §4); here every lowered program is *executed*
and checked against an independent numpy oracle — the verification the
reference defers to ``scripts/extract_result.py`` goldens.

Programs are the reference's own ``apps/src/*.gm`` sources (DSL inputs,
not code) when available, with inline fallbacks so the suite runs without
the reference mount.
"""

import os
from collections import deque

import numpy as np
import pytest

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.lang.lower import (LowerError, RaceWarning,
                                       compile_file, compile_source)

REF = "/root/reference"
INF32 = np.iinfo(np.int32).max

PAGERANK_GM = """
Procedure pagerank(G: Graph, e,d: Double, max: Int;
                   pg_rank: Node_Prop<Double>)
{
    Double diff;
    Int cnt = 0;
    Double N = G.NumNodes();
    G.pg_rank = 1 / N;
    Do {
        diff = 0.0;
        Foreach (t: G.Nodes) {
            Double val = (1-d) / N + d*
                Sum(w: t.InNbrs) { w.pg_rank / w.OutDegree() };
            diff += | val - t.pg_rank |;
            t.pg_rank <= val @ t;
        }
        cnt++;
    } While ((diff > e) && (cnt < max));
}
"""

HOP_DIST_GM = """
Procedure hop_dist(G:Graph, dist:N_P<Int>, root: Node)
{
    N_P<Bool> updated;
    N_P<Bool> updated_nxt;
    N_P<Int>  dist_nxt;
    Bool fin = False;
    G.dist = (G == root) ? 0 : +INF;
    G.updated = (G == root) ? True: False;
    G.dist_nxt = G.dist;
    G.updated_nxt = G.updated;
    While(!fin) {
        fin = True;
        Foreach(n: G.Nodes)(n.updated) {
            Foreach(s: n.Nbrs) {
                <s.dist_nxt; s.updated_nxt> min= <n.dist + 1; True>;
            }
        }
        G.dist = G.dist_nxt;
        G.updated = G.updated_nxt;
        G.updated_nxt = False;
        fin = ! Exist(n: G.Nodes){n.updated};
    }
}
"""


def _load(name, fallback=None):
    path = f"{REF}/apps/src/{name}.gm"
    if os.path.exists(path):
        return compile_file(path)
    if fallback is None:
        pytest.skip(f"{path} not available")
    return compile_source(fallback)


@pytest.fixture(scope="module")
def graph():
    src, dst = gen.rmat_edges(300, 2000, seed=5)
    g, _ = from_edges(src, dst, 300)
    return g, src, dst


def _csr_np(g):
    e = g.num_edges
    return (np.asarray(g.node_idx_src)[:e], np.asarray(g.node_idx)[:e])


class TestPageRank:
    def test_matches_oracle(self, graph):
        g, src, dst = graph
        pr = _load("pagerank", PAGERANK_GM)
        rank = np.asarray(pr(g, e=1e-7, d=0.85, max=100)["pg_rank"])[:300]
        N = 300
        deg = np.zeros(N, np.int64)
        np.add.at(deg, src, 1)
        r = np.full(N, 1.0 / N)
        for _ in range(100):
            s = np.zeros(N)
            np.add.at(s, dst,
                      np.where(deg[src] > 0,
                               r[src] / np.maximum(deg[src], 1), 0.0))
            val = 0.15 / N + 0.85 * s
            diff = np.abs(val - r).sum()
            r = val
            if diff <= 1e-7:
                break
        assert np.abs(rank - r).max() < 1e-4


class TestHopDist:
    def test_matches_bfs_oracle(self, graph):
        g, src, dst = graph
        hd = _load("hop_dist", HOP_DIST_GM)
        dist = np.asarray(hd(g, root=0)["dist"])[:300]
        d = np.full(300, INF32, np.int64)
        d[0] = 0
        adj = {}
        for s_, t_ in zip(src, dst):
            adj.setdefault(int(s_), []).append(int(t_))
        q = deque([0])
        while q:
            u = q.popleft()
            for v in adj.get(u, []):
                if d[v] == INF32:
                    d[v] = d[u] + 1
                    q.append(v)
        assert (dist == d).all()


class TestSSSP:
    def test_matches_bellman_ford(self, graph):
        g, src, dst = graph
        ss = _load("sssp")
        wl = np.random.RandomState(0).randint(
            1, 10, size=g.e_pad).astype(np.int32)
        sd = np.asarray(ss(g, root=0, len=wl)["dist"])[:300]
        csr_src, csr_dst = _csr_np(g)
        w = np.asarray(wl)[:g.num_edges]
        od = np.full(300, np.inf)
        od[0] = 0
        for _ in range(300):
            new = od.copy()
            np.minimum.at(new, csr_dst, od[csr_src] + w)
            if (new == od).all():
                break
            od = new
        od2 = np.where(np.isinf(od), INF32, od).astype(np.int64)
        assert (sd == od2).all()


class TestConduct:
    def test_matches_definition(self, graph):
        g, src, dst = graph
        cd = _load("conduct")
        member = (np.arange(g.n_pad) % 3).astype(np.int32)
        got = float(cd(g, member=member, num=1)["_return"])
        csr_src, csr_dst = _csr_np(g)
        m = member[:300]
        degall = np.asarray(g.out_degree())[:300]
        din = degall[m == 1].sum()
        dout = degall[m != 1].sum()
        cross = ((m[csr_src] == 1) & (m[csr_dst] != 1)).sum()
        mm = min(din, dout)
        exp = ((0.0 if cross == 0 else np.inf) if mm == 0
               else cross / float(mm))
        assert abs(got - exp) < 1e-4 * max(1, abs(exp))

    def test_return_through_branches(self, graph):
        g, _, _ = graph
        cd = _load("conduct")
        member = np.zeros(g.n_pad, np.int32)   # num=1 empty -> m == 0
        got = float(cd(g, member=member, num=1)["_return"])
        assert got == 0.0 or np.isinf(got)


class TestFeasibility:
    """check_feasible analog: racy/unsupported constructs are rejected
    at lowering, mirroring gm_cpp_opt_check_feasible.cc +
    the rw_analysis race oracle."""

    def test_race_warned_and_deterministic(self, graph):
        """Plain neighbor writes are a WW conflict. The reference's
        check2 reports them as *warnings* (is_warning=true,
        gm_rw_analysis_check2.cc) and keeps last-store-wins semantics;
        we warn identically and pick a deterministic winner — the result
        must be a valid instance of the racy spec (every node with an
        in-neighbor gets the written value)."""
        g, csr_src, csr_dst = graph
        src_text = """
        Procedure racy(G: Graph, p: N_P<Int>) {
            Foreach(n: G.Nodes) {
                Foreach(s: n.Nbrs) {
                    s.p = 1;      // plain neighbor write: WW conflict
                }
            }
        }
        """
        with pytest.warns(RaceWarning):
            prog = compile_source(src_text)
        assert prog.race_warnings
        p = np.asarray(prog(g)["p"])[:g.num_nodes]
        _, dst = _csr_np(g)
        indeg = np.zeros(g.num_nodes, np.int64)
        np.add.at(indeg, dst, 1)
        np.testing.assert_array_equal(p, (indeg > 0).astype(np.int32))

    def test_items_loop_executes(self, graph):
        """For (x: Seq.Items) must run the body once per item — guards
        against the r2 regression where the ITEMS dispatch became dead
        code and the loop silently no-opped (bc.gm's seed loop)."""
        g, _, _ = graph
        # seeds arrive as a Node_Seq argument (bc.gm's signature) —
        # PushBack(<int literal>) is a builtin arg-type error in the
        # reference frontend too (same class as test/errors/e30)
        src_text = """
        Procedure items_loop(G: Graph, A: N_P<Int>, S: Node_Seq) : Int {
            Int total = 0;
            For (v: S.Items) {
                v.A = 7;
                total = total + 1;
            }
            Return total;
        }
        """
        out = compile_source(src_text)(g, S=[1, 3, 5])
        assert int(out["_return"]) == 3
        a = np.asarray(out["A"])[:g.num_nodes]
        assert a[1] == 7 and a[3] == 7 and a[5] == 7
        assert a.sum() == 21

    def test_scalar_race_warned_and_deterministic(self, graph):
        """Scalar WW inside a parallel loop: warning + a valid instance
        (reference check2 warns, keeps last-store-wins; we pick the
        lowest-active-slot winner)."""
        g, _, _ = graph
        src_text = """
        Procedure racy2(G: Graph) : Int {
            Int x = 0;
            Foreach(n: G.Nodes) {
                x = 1;            // uniform write: all winners agree
            }
            Return x;
        }
        """
        with pytest.warns(RaceWarning):
            prog = compile_source(src_text)
        assert int(prog(g)["_return"]) == 1

    def test_reduction_allowed(self, graph):
        g, _, _ = graph
        src_text = """
        Procedure degsum(G: Graph) : Long {
            Long x = 0;
            Foreach(n: G.Nodes) {
                x += n.Degree();
            }
            Return x;
        }
        """
        got = int(compile_source(src_text)(g)["_return"])
        assert got == g.num_edges


class TestWhileCarry:
    def test_group_assign_and_loop(self, graph):
        g, _, _ = graph
        src_text = """
        Procedure iterate(G: Graph, k: Int; acc: N_P<Int>) {
            Int i = 0;
            G.acc = 0;
            While (i < k) {
                Foreach(n: G.Nodes) { n.acc += 2; }
                i++;
            }
        }
        """
        out = compile_source(src_text)(g, k=5)
        acc = np.asarray(out["acc"])[:300]
        assert (acc == 10).all()
