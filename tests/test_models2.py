"""Second algorithm batch: bc, scc, communities, v_cover, analytics,
sampling, sssp_path, delta_stepping, dfs, collections."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges, to_undirected
from green_marl_tpu.models import analytics as m_an
from green_marl_tpu.models import bc as m_bc
from green_marl_tpu.models import communities as m_comm
from green_marl_tpu.models import delta_stepping as m_ds
from green_marl_tpu.models import dfs as m_dfs
from green_marl_tpu.models import relax as m_relax
from green_marl_tpu.models import sampling as m_samp
from green_marl_tpu.models import scc as m_scc
from green_marl_tpu.models import sssp_path as m_sp
from green_marl_tpu.models import v_cover as m_vc
from green_marl_tpu.runtime import collections as coll

INT32_MAX = np.iinfo(np.int32).max


def make_graph(n=200, m=1200, seed=0):
    src, dst = gen.uniform_random_edges(n, m, seed=seed)
    return from_edges(src, dst, n)


class TestBC:
    def test_path_graph(self):
        # undirected path 0-1-2-3: BC (directed both ways) of middle nodes
        src, dst = to_undirected(np.array([0, 1, 2]), np.array([1, 2, 3]))
        g, _ = from_edges(src, dst, 4)
        res = m_bc.bc(g, jnp.asarray([0, 1, 2, 3]))
        got = np.asarray(res.bc)[:4]
        # Reference semantics: the reverse sweep includes level 0
        # (gm_bfs_template.h do_bfs_reverse runs down to level==0), so the
        # seed's own dependency delta_s(s) = |reachable(s)| is added.
        # Path 0-1-2-3: BC[0]=BC[3]=3; BC[1]=BC[2]=3+2+1+1=7.
        assert got[0] == pytest.approx(3.0) and got[3] == pytest.approx(3.0)
        assert got[1] == pytest.approx(7.0) and got[2] == pytest.approx(7.0)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_oracle(self, seed):
        g, _ = make_graph(80, 400, seed=seed)
        seeds = [0, 5, 17]
        res = m_bc.bc(g, jnp.asarray(seeds, dtype=jnp.int32))
        want = m_bc.bc_np(np.asarray(g.begin),
                          np.asarray(g.node_idx)[: g.num_edges], seeds)
        np.testing.assert_allclose(np.asarray(res.bc)[: g.num_nodes],
                                   want, rtol=1e-4, atol=1e-4)


class TestSCC:
    def test_simple_cycle_plus_tail(self):
        # cycle 0->1->2->0, tail 2->3->4
        src = np.array([0, 1, 2, 2, 3])
        dst = np.array([1, 2, 0, 3, 4])
        g, _ = from_edges(src, dst, 5)
        res = m_scc.scc(g)
        comp = np.asarray(res.comp)[:5]
        assert comp[0] == comp[1] == comp[2] == 0
        assert comp[3] == 3 and comp[4] == 4

    @pytest.mark.parametrize("n,m,seed", [(60, 150, 0), (100, 500, 1),
                                          (50, 40, 2)])
    def test_matches_tarjan(self, n, m, seed):
        src, dst = gen.uniform_random_edges(n, m, seed=seed)
        g, _ = from_edges(src, dst, n)
        res = m_scc.scc(g)
        want = m_scc.scc_np(np.asarray(g.begin),
                            np.asarray(g.node_idx)[: g.num_edges])
        got = np.asarray(res.comp)[: n]
        assert (got == want).all()


class TestCommunities:
    @pytest.mark.parametrize("seed", [1, 2])
    def test_matches_oracle(self, seed):
        src, dst = gen.uniform_random_edges(50, 300, seed=seed)
        g, _ = from_edges(src, dst, 50)
        res = m_comm.communities(g, max_iter=40)
        want = m_comm.communities_np(
            np.asarray(g.begin), np.asarray(g.node_idx)[: g.num_edges],
            max_iter=40)
        assert (np.asarray(res.comm)[:50] == want).all()


class TestVCover:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_oracle(self, seed):
        src, dst = gen.uniform_random_edges(40, 120, seed=seed)
        g, perm = from_edges(src, dst, 40)
        res = m_vc.v_cover(g)
        want_sel, want_cnt = m_vc.v_cover_np(
            np.asarray(g.begin), np.asarray(g.node_idx)[: g.num_edges])
        assert int(res.count) == want_cnt
        assert (np.asarray(res.select)[: g.num_edges] == want_sel).all()


class TestAnalytics:
    def test_avg_teen_cnt(self):
        g, _ = make_graph(100, 700, seed=4)
        rng = np.random.default_rng(0)
        age = np.zeros(g.n_pad, np.int32)
        age[: g.num_nodes] = rng.integers(0, 60, g.num_nodes)
        avg, cnt = m_an.avg_teen_cnt(g, jnp.asarray(age), 30)
        begin = np.asarray(g.begin)
        ni = np.asarray(g.node_idx)[: g.num_edges]
        deg = np.diff(begin)
        srcs = np.repeat(np.arange(g.num_nodes), deg)
        teen = (age[: g.num_nodes] >= 10) & (age[: g.num_nodes] < 20)
        want_cnt = np.zeros(g.num_nodes, np.int64)
        np.add.at(want_cnt, ni, teen[srcs])
        assert (np.asarray(cnt)[: g.num_nodes] == want_cnt).all()
        sel = age[: g.num_nodes] > 30
        want_avg = want_cnt[sel].sum() / sel.sum()
        assert float(avg) == pytest.approx(want_avg, rel=1e-6)

    def test_adamic_adar(self):
        src, dst = gen.uniform_random_edges(40, 250, seed=5)
        src, dst = to_undirected(src, dst)
        keep = src != dst
        g, _ = from_edges(src[keep], dst[keep], 40)
        aa = m_an.adamic_adar_edges(g)
        begin = np.asarray(g.begin)
        ni = np.asarray(g.node_idx)[: g.num_edges]
        deg = np.diff(begin)
        srcs = np.repeat(np.arange(g.num_nodes), deg)
        rows = [set(ni[begin[v]:begin[v + 1]].tolist())
                for v in range(g.num_nodes)]
        want = np.zeros(g.num_edges, np.float32)
        for e, (f, t) in enumerate(zip(srcs, ni)):
            s = 0.0
            for n in rows[f]:
                if n in rows[t]:  # wait: IsNbrFrom(to) means to->n edge
                    pass
            # reference: n in from.Nbrs with n.IsNbrFrom(to) — i.e. edge
            # to -> n exists
            for n in ni[begin[f]:begin[f + 1]]:
                if n in rows[t]:
                    d = deg[n]
                    s += 1.0 / np.log(max(d, 1.0000001))
            want[e] = s
        np.testing.assert_allclose(aa, want, rtol=1e-4)

    def test_potential_friends(self):
        src = np.array([0, 1, 2])
        dst = np.array([1, 2, 3])
        g, _ = from_edges(src, dst, 4)
        pot = np.asarray(m_an.potential_friends(g))
        # 0 -> 2 via 1 (no direct edge): potential
        assert pot[0, 2] and pot[1, 3]
        assert not pot[0, 1]  # direct edge
        assert not pot[0, 3]  # 3 hops

    def test_triangle_directed(self):
        src, dst = gen.uniform_random_edges(40, 250, seed=6)
        keep = src != dst
        g, _ = from_edges(src[keep], dst[keep], 40)
        got = m_an.triangle_directed_count(g, chunk=512)
        # oracle: literal transliteration
        begin = np.asarray(g.begin)
        ni = np.asarray(g.node_idx)[: g.num_edges]
        rows = [set(ni[begin[v]:begin[v + 1]].tolist())
                for v in range(g.num_nodes)]
        T = 0
        for v in range(g.num_nodes):
            row = ni[begin[v]:begin[v + 1]]
            for i in range(len(row)):
                for j in range(len(row)):
                    u, w = row[i], row[j]
                    if w > u:
                        if u in rows[w] or w in rows[u]:
                            T += 1
        assert got == T


class TestSamplingMatching:
    def test_random_node_sampling_rate(self):
        g, _ = make_graph(4000, 8000, seed=7)
        s = m_samp.random_node_sampling(
            g, jax.random.PRNGKey(0), jnp.asarray(10))
        cnt = int(np.asarray(s).sum())
        assert 100 < cnt < 900  # E[cnt]=400

    def test_degree_sampling_prefers_hubs(self):
        src, dst = gen.rmat_edges(512, 4096, seed=1, permute=False)
        g, _ = from_edges(src, dst, 512)
        s = m_samp.random_degree_node_sampling(
            g, jax.random.PRNGKey(1), jnp.asarray(50))
        deg = np.diff(np.asarray(g.begin))
        picked = np.asarray(s)[:512]
        if picked.any():
            assert deg[picked].mean() >= deg.mean()

    def test_random_walk_visits(self):
        g, _ = make_graph(100, 800, seed=8)
        visited = m_samp.random_walk_with_jump(
            g, jax.random.PRNGKey(2), steps=50)
        cnt = int(np.asarray(visited).sum())
        assert 1 <= cnt <= 50

    def test_parallel_walks_shapes(self):
        g, _ = make_graph(100, 800, seed=9)
        starts = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)
        counts, traj = m_samp.parallel_random_walks(
            g, jax.random.PRNGKey(3), starts, steps=20)
        assert traj.shape == (20, 4)
        assert int(counts.sum()) == 80

    def test_bipartite_matching(self):
        # bipartite: left {0,1,2}, right {3,4,5}; edges left->right
        src = np.array([0, 0, 1, 2, 2])
        dst = np.array([3, 4, 4, 4, 5])
        g, _ = from_edges(src, dst, 6)
        is_left = jnp.asarray([True] * 3 + [False] * 3 +
                              [False] * (g.n_pad - 6))
        res = m_samp.random_bipartite_matching(g, is_left)
        match = np.asarray(res.match)[:6]
        # perfect matching exists: 0-3, 1-4, 2-5
        assert int(res.count) == 3
        for left in range(3):
            r = match[left]
            assert 3 <= r <= 5 and match[r] == left


class TestSsspPath:
    def test_path_reconstruction(self):
        g, perm = make_graph(150, 900, seed=10)
        rng = np.random.default_rng(1)
        w_in = rng.integers(1, 10, g.num_edges)
        w = np.zeros(g.e_pad, np.int32)
        w[: g.num_edges] = w_in[perm]
        res = m_sp.sssp_path(g, 0, jnp.asarray(w))
        dist = np.asarray(res.dist)[: g.num_nodes]
        prev = np.asarray(res.prev)
        want = m_relax.min_relax_np(
            np.asarray(g.begin), np.asarray(g.node_idx)[: g.num_edges],
            0, edge_len=w[: g.num_edges])
        got = np.where(dist == INT32_MAX, np.iinfo(np.int64).max,
                       dist.astype(np.int64))
        assert (got == want).all()
        # every reachable non-root node's prev edge is consistent
        begin = np.asarray(g.begin)
        ni = np.asarray(g.node_idx)[: g.num_edges]
        for v in range(g.num_nodes):
            if v == 0 or dist[v] == INT32_MAX:
                continue
            p = prev[v]
            assert p >= 0
            assert v in ni[begin[p]:begin[p + 1]]
            # dist consistency: dist[v] = dist[p] + w(p->v) for some edge
            slots = np.where((ni == v) &
                             (np.repeat(np.arange(g.num_nodes),
                                        np.diff(begin)) == p))[0]
            assert any(dist[p] + w[: g.num_edges][s] == dist[v]
                       for s in slots)
        path = m_sp.get_path(prev, 0, int(np.argmax(dist < INT32_MAX)))
        assert path == [] or path[0] == 0


class TestDeltaStepping:
    @pytest.mark.parametrize("delta", [1, 4, 16])
    def test_matches_bellman_ford(self, delta):
        g, perm = make_graph(120, 800, seed=11)
        rng = np.random.default_rng(2)
        w_in = rng.integers(1, 30, g.num_edges)
        w = np.zeros(g.e_pad, np.int32)
        w[: g.num_edges] = w_in[perm]
        res = m_ds.delta_stepping(g, 0, jnp.asarray(w), delta=delta)
        want = m_relax.min_relax_np(
            np.asarray(g.begin), np.asarray(g.node_idx)[: g.num_edges],
            0, edge_len=w[: g.num_edges])
        got = np.asarray(res.dist)[: g.num_nodes].astype(np.int64)
        got = np.where(got == INT32_MAX, np.iinfo(np.int64).max, got)
        assert (got == want).all()


class TestDFS:
    def test_orders(self):
        # 0 -> 1 -> 2, 0 -> 3
        begin = np.array([0, 2, 3, 3, 3])
        node_idx = np.array([1, 3, 2])
        pre, post = m_dfs.dfs(begin, node_idx, 0)
        assert pre[0] == 0 and pre[1] == 1 and pre[2] == 2 and pre[3] == 3
        assert post[2] == 0 and post[1] == 1 and post[3] == 2
        assert post[0] == 3

    def test_b2(self):
        begin = np.array([0, 1, 1])
        node_idx = np.array([1])
        a, b = m_dfs.b2(begin, node_idx, np.zeros(2), np.zeros(2), 0)
        # pre: a=b+1 -> a=1; post (leaf first): b=a+1=2
        assert a.tolist() == [1, 1] and b.tolist() == [2, 2]


class TestCollections:
    def test_node_set(self):
        s = coll.NodeSet.empty(128)
        s = s.add(3).add(5).add_mask(
            jnp.zeros(128, bool).at[7].set(True))
        assert bool(s.has(3)) and bool(s.has(7)) and not bool(s.has(4))
        s = s.remove(3)
        assert int(s.size()) == 2

    def test_node_seq(self):
        q = coll.NodeSeq.empty(8)
        q = q.push_back(4).push_front(2).push_back(6)
        items = np.asarray(q.items())
        assert items[:3].tolist() == [2, 4, 6]
        assert (items[3:] == -1).all()

    def test_node_order_dedup(self):
        o = coll.NodeOrder.empty(8, 128)
        o = o.push_back(5).push_back(5).push_back(2)
        assert int(o.seq.count) == 2
        assert np.asarray(o.seq.items())[:2].tolist() == [5, 2]
