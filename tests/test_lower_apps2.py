"""End-to-end execution tests for the round-2 DSL coverage batch:
collections, RNG builtins, scalar argminmax over edge contexts,
deterministic racy-write lowering, UpNbrs/DownNbrs reductions, and the
InBFS replay engine (bc.gm) — apps that the reference compiles via
gm_cpp_gen_bfs.cc / gm_set.h / gm_rand.h.
"""

import collections as pycollections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.lang.lower import compile_file, compile_source

APPS = "/root/reference/apps/src/"


@pytest.fixture(scope="module")
def small_graph():
    src, dst = gen.rmat_edges(200, 1200, seed=3)
    g, _ = from_edges(src, dst, 200)
    return g


def _csr(g):
    return np.asarray(g.begin), np.asarray(g.node_idx)


def test_sssp_path_argmin_payload(small_graph):
    """sssp_path.gm: min= with payload (updated_nxt, prev) keyed by the
    neighbor — the reference's spinlock argmin path
    (gm_cpp_gen.cc:1563-1742)."""
    g = small_graph
    cp = compile_file(APPS + "sssp_path.gm")
    assert cp.name == "sssp_path"
    L = np.ones(g.e_pad, np.int32)
    out = cp(g, len=L, root=jnp.asarray(0, jnp.int32))
    dist = np.asarray(out["dist"])
    # oracle: unit-weight BFS distances from 0
    begin, ni = _csr(g)
    INF = np.iinfo(np.int32).max
    d = np.full(200, INF, np.int64)
    d[0] = 0
    q = pycollections.deque([0])
    while q:
        u = q.popleft()
        for v in ni[begin[u]:begin[u + 1]]:
            if d[v] > d[u] + 1:
                d[v] = d[u] + 1
                q.append(v)
    np.testing.assert_array_equal(dist[:200], d)
    # prev is a valid parent pointer: dist[prev[v]] + 1 == dist[v]
    prev = np.asarray(out["prev"])[:200]
    for v in range(200):
        if 0 < d[v] < INF:
            assert d[prev[v]] + 1 == d[v]


def test_v_cover_executes_and_covers(small_graph):
    """v_cover.gm: greedy max-degree-pair edge selection; every edge must
    end covered (vertex-cover invariant)."""
    g = small_graph
    cp = compile_file(APPS + "v_cover.gm")
    out = cp(g)
    sel = np.asarray(out["select"])
    assert out["_return"] >= 1
    begin, ni = _csr(g)
    # invariant: selected edges form a cover of all edges' endpoints
    cov = np.zeros(200, bool)
    src_ids = np.asarray(g.node_idx_src)
    for e in np.nonzero(sel)[0]:
        if e < g.num_edges:
            cov[src_ids[e]] = cov[ni[e]] = True
    for u in range(200):
        for v in ni[begin[u]:begin[u + 1]]:
            assert cov[u] or cov[v]


def test_random_node_sampling_set_output(small_graph):
    g = small_graph
    cp = compile_file(APPS + "random_node_sampling.gm")
    out = cp(g, N=4)
    bits = np.asarray(out["S"])
    assert bits.shape == (g.n_pad,)
    # ~N nodes expected; deterministic given the fixed counter-based RNG
    assert 0 < bits.sum() < 200
    out2 = cp(g, N=4)
    np.testing.assert_array_equal(bits, np.asarray(out2["S"]))


def test_random_walk_sampling_reaches_n(small_graph):
    g = small_graph
    cp = compile_file(APPS + "random_walk_sampling_with_random_jump.gm")
    out = cp(g, N=25, c=0.2)
    assert np.asarray(out["S"]).sum() >= 1   # S.Add inside traced While


def test_bipartite_matching_valid(small_graph):
    """random_bipartite_matching.gm: the racy Suitor write lowers to a
    deterministic lowest-slot winner; the result must be a valid
    matching (mutual, respecting sides)."""
    # the app assumes a true bipartite graph: every edge left -> right
    rng = np.random.default_rng(7)
    src = rng.integers(0, 100, 600) * 2            # even = left
    dst = rng.integers(0, 100, 600) * 2 + 1        # odd  = right
    g, _ = from_edges(src.astype(np.int32), dst.astype(np.int32), 200)
    cp = compile_file(APPS + "random_bipartite_matching.gm")
    is_left = (np.arange(g.n_pad) % 2 == 0)
    out = cp(g, isLeft=jnp.asarray(is_left))
    match = np.asarray(out["Match"])[:200]
    cnt = int(out["_return"])
    matched = [(u, match[u]) for u in range(200)
               if match[u] >= 0 and is_left[u]]
    assert cnt == len(matched) > 0
    for u, v in matched:
        assert match[v] == u        # mutual
        assert not is_left[v]
    # determinism
    out2 = cp(g, isLeft=jnp.asarray(is_left))
    np.testing.assert_array_equal(match, np.asarray(out2["Match"])[:200])


def _bc_literal_oracle(g, seeds):
    """Literal reference semantics: visit_fw runs for the root too
    (gm_bfs_template.h:102 — no special case), so sigma[root] is
    overwritten by the empty UpNbrs sum."""
    begin, ni = _csr(g)
    rbegin, rni = np.asarray(g.r_begin), np.asarray(g.r_node_idx)
    N = 200
    BC = np.zeros(N, np.float32)
    for s in seeds:
        level = np.full(N, -1)
        level[s] = 0
        order = [s]
        q = pycollections.deque([s])
        while q:
            u = q.popleft()
            for v in ni[begin[u]:begin[u + 1]]:
                if level[v] < 0:
                    level[v] = level[u] + 1
                    q.append(v)
                    order.append(v)
        sigma = np.zeros(N, np.float32)
        sigma[s] = 1
        for u in sorted(order, key=lambda x: level[x]):
            sigma[u] = sum(sigma[p] for p in rni[rbegin[u]:rbegin[u + 1]]
                           if level[p] == level[u] - 1)
        delta = np.zeros(N, np.float32)
        for u in sorted(order, key=lambda x: -level[x]):
            tot = np.float32(0)
            for w in ni[begin[u]:begin[u + 1]]:
                if level[w] == level[u] + 1:
                    tot += sigma[u] / sigma[w] * (1 + delta[w])
            delta[u] = tot
            BC[u] += delta[u]
    return BC


def test_bc_literal_semantics(small_graph):
    """bc.gm executes through the InBFS replay engine; output matches a
    numpy oracle of the reference's literal visit semantics (NaN
    positions included — the committed bc.gm zeroes the root's sigma)."""
    g = small_graph
    cp = compile_file(APPS + "bc.gm")
    out = cp(g, Seeds=np.array([1, 2, 3], np.int32))
    got = np.asarray(out["BC"])[:200]
    want = _bc_literal_oracle(g, [1, 2, 3])
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], rtol=1e-4)


def test_bc_random_executes(small_graph):
    g = small_graph
    cp = compile_file(APPS + "bc_random.gm")
    out = cp(g, K=2)
    assert np.asarray(out["BC"]).shape == (g.n_pad,)


def test_degree_builtin_group_assign(small_graph):
    g = small_graph
    cp = compile_source("""
Proc degs(G: Graph; D: N_P<Int>) {
    G.D = G.Degree() + G.InDegree();
}
""", name="degs")
    out = cp(g)
    want = np.asarray(g.out_degree()) + np.asarray(g.in_degree())
    np.testing.assert_array_equal(np.asarray(out["D"]), want)


def test_uniform_vector_and_scalar_rng():
    src, dst = gen.rmat_edges(64, 256, seed=1)
    g, _ = from_edges(src, dst, 64)
    cp = compile_source("""
Proc draws(G: Graph; P: N_P<Double>) : Double {
    Foreach(v: G.Nodes) { v.P = Uniform(); }
    Return Uniform();
}
""", name="draws")
    out = cp(g)
    p = np.asarray(out["P"])[:64]
    assert (p >= 0).all() and (p < 1).all()
    assert len(np.unique(p)) > 32            # distinct per-node draws
    out2 = cp(g)
    np.testing.assert_array_equal(p, np.asarray(out2["P"])[:64])


def test_get_path_seq(small_graph):
    """sssp_path.gm's second proc: sequence PushFront in a traced While
    with a NodeSeq loop carry."""
    g = small_graph
    cp = compile_file(APPS + "sssp_path.gm", name="get_path")
    # build a tiny parent chain 5 <- 7 <- 9
    prev = np.full(g.n_pad, -1, np.int32)
    prev[9] = 7
    prev[7] = 5
    out = cp(g, begin=jnp.asarray(5, jnp.int32),
             end=jnp.asarray(9, jnp.int32), prev=prev)
    q = out["Q"]
    items = np.asarray(q.items())[:int(q.count)]
    np.testing.assert_array_equal(items, [5, 7, 9])
