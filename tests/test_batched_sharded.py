"""Batched multi-instance engine + mesh-sharded execution tests.

The sharded paths are *executed* on a virtual 8-device CPU mesh
(fixing the reference's compile-only distributed testing gap,
SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.models import batched as m_b
from green_marl_tpu.models import bfs as m_bfs
from green_marl_tpu.models import pagerank as m_pr
from green_marl_tpu.parallel import sharded as sh

INT32_MAX = np.iinfo(np.int32).max


def make_graph(n=300, m=2000, seed=0):
    src, dst = gen.uniform_random_edges(n, m, seed=seed)
    return from_edges(src, dst, n)[0]


class TestBatched:
    def test_multi_source_bfs(self):
        g = make_graph()
        roots = jnp.asarray([0, 5, 17, 123], dtype=jnp.int32)
        res = m_b.multi_source_bfs(g, roots)
        begin = np.asarray(g.begin)
        ni = np.asarray(g.node_idx)[: g.num_edges]
        dist = np.asarray(res.dist)
        for b, r in enumerate([0, 5, 17, 123]):
            want = m_bfs.bfs_np(begin, ni, r)
            got = dist[: g.num_nodes, b].astype(np.int64)
            got = np.where(got == INT32_MAX, -1, got)
            assert (got == want).all(), f"instance {b}"

    def test_multi_source_bfs_chunked(self):
        g = make_graph(128, 900, seed=1)
        roots = jnp.asarray([3, 60], dtype=jnp.int32)
        r_full = m_b.multi_source_bfs(g, roots)
        r_chunk = m_b.multi_source_bfs(g, roots, chunk=256)
        assert (np.asarray(r_full.dist) == np.asarray(r_chunk.dist)).all()

    def test_multi_pagerank_matches_single(self):
        g = make_graph(200, 1400, seed=2)
        damping = jnp.asarray([0.85, 0.6], dtype=jnp.float32)
        res = m_b.multi_pagerank(g, damping)
        for b, d in enumerate([0.85, 0.6]):
            single = m_pr.pagerank(g, d=d)
            np.testing.assert_allclose(
                np.asarray(res.rank)[:, b],
                np.asarray(single.rank), rtol=1e-5, atol=1e-9)

    def test_multi_pagerank_per_instance_convergence(self):
        g = make_graph(150, 1000, seed=3)
        # tiny epsilon instance must not perturb the loose one
        res = m_b.multi_pagerank(
            g, jnp.asarray([0.85, 0.85]), e=0.001)
        np.testing.assert_allclose(np.asarray(res.rank)[:, 0],
                                   np.asarray(res.rank)[:, 1],
                                   rtol=0, atol=0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestSharded:
    def test_shard_graph_slabs(self):
        g = make_graph(100, 700, seed=4)
        sg = sh.shard_graph(g, 4)
        assert sg.csc_src.shape[0] == 4
        flat = np.asarray(sg.csc_src).reshape(-1)[: g.e_pad]
        assert (flat == np.asarray(g.r_node_idx)).all()

    def test_pagerank_sharded_matches_single(self):
        g = make_graph(250, 1800, seed=5)
        mesh = sh.make_mesh(batch=1, v=8)
        sg = sh.place(sh.shard_graph(g, 8), mesh)
        rank, diff, iters = sh.pagerank_sharded(sg, mesh)
        single = m_pr.pagerank(g)
        assert int(iters) == int(single.iterations)
        np.testing.assert_allclose(np.asarray(rank),
                                   np.asarray(single.rank),
                                   rtol=1e-5, atol=1e-9)

    def test_bfs_sharded_2d_mesh(self):
        g = make_graph(200, 1500, seed=6)
        mesh = sh.make_mesh(batch=2, v=4)
        sg = sh.place(sh.shard_graph(g, 4), mesh)
        roots = jnp.asarray([0, 7, 90, 140], dtype=jnp.int32)
        dist, depth = sh.multi_source_bfs_sharded(
            sg, mesh, roots, max_iter=g.num_nodes)
        ref = m_b.multi_source_bfs(g, roots)
        assert (np.asarray(dist) == np.asarray(ref.dist)).all()
