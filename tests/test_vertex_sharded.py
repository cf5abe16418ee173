"""Vertex-sharded distributed engine tests (the GPS capability match).

Checks, on the virtual 8-device CPU mesh:

* sharded pagerank / hop_dist / sssp equal single-device oracles,
* per-device owned-property footprint is O(N/S) — the round-1
  replicate-everything scheme is gone from this path,
* the ghost exchange moves only boundary values (cut-sized, not O(N·S)).

Reference analog: ``src/backend_gps`` vertex partitioning + message
exchange — which the reference only ever compile-tested.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.parallel import vertex_sharded as V


@pytest.fixture(scope="module")
def setup():
    src, dst = gen.rmat_edges(500, 4000, seed=11)
    g, _ = from_edges(src, dst, 500)
    mesh = V.vmesh(8)
    vsg = V.place(V.build_vertex_sharded(g, 8), mesh)
    return g, vsg, mesh, (src, dst)


def _csr_np(g):
    e = g.num_edges
    return (np.asarray(g.node_idx_src)[:e], np.asarray(g.node_idx)[:e])


def test_footprint_is_n_over_s(setup):
    g, vsg, mesh, _ = setup
    S = vsg.num_shards
    # owned slab is ceil(N/S) rounded up to 8 — O(N/S)
    assert vsg.L < -(-g.num_nodes // S) + 8
    assert vsg.L * S < 2 * g.num_nodes + 16 * S
    # per-device shard of every [S,...] array is exactly 1/S of global
    for f in ("dst_local", "src_vidx", "emask", "send_idx", "deg_owned"):
        arr = getattr(vsg, f)
        shards = arr.sharding.shard_shape(arr.shape)
        assert shards[0] == arr.shape[0] // S, f
    # ghost exchange is cut-sized: strictly less than replicating N per pair
    assert vsg.ghost_total < S * g.num_nodes


def test_pagerank_matches_single_device(setup):
    g, vsg, mesh, _ = setup
    from green_marl_tpu.models.pagerank import pagerank
    ref = np.asarray(pagerank(g, e=1e-9, d=0.85,
                              max_iter=40)[0])[:g.num_nodes]
    got, diff, it = V.pagerank_vsharded(vsg, mesh, e=1e-9, d=0.85,
                                        max_iter=40)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6,
                               atol=1e-9)


def test_hop_dist_matches_bfs_oracle(setup):
    g, vsg, mesh, (src, dst) = setup
    from collections import deque
    n = g.num_nodes
    adj = [[] for _ in range(n)]
    s_, d_ = _csr_np(g)
    for a, b in zip(s_, d_):
        adj[a].append(b)
    dist = np.full(n, np.iinfo(np.int32).max, np.int64)
    dist[0] = 0
    q = deque([0])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if dist[w] > dist[u] + 1:
                dist[w] = dist[u] + 1
                q.append(w)
    got, depth = V.hop_dist_vsharded(vsg, mesh, root=0)
    np.testing.assert_array_equal(np.asarray(got), dist)


def test_sssp_matches_oracle(setup):
    g, vsg, mesh, _ = setup
    n = g.num_nodes
    e = g.num_edges
    rng = np.random.default_rng(3)
    w = rng.integers(1, 10, e).astype(np.int32)
    w_pad = np.zeros(g.e_pad, np.int32)
    w_pad[:e] = w
    w_slab = V.shard_edge_prop(vsg, g, w_pad)

    # numpy Bellman-Ford oracle (sentinel INT32_MAX like the
    # single-device path / reference +INF saturation)
    s_, d_ = _csr_np(g)
    BIG = np.iinfo(np.int32).max
    dist = np.full(n, BIG, np.int64)
    dist[0] = 0
    for _ in range(n):
        nd = dist.copy()
        np.minimum.at(nd, d_, dist[s_] + w)
        if (nd == dist).all():
            break
        dist = nd
    got, it = V.sssp_vsharded(vsg, mesh, w_slab, root=0)
    np.testing.assert_array_equal(np.asarray(got), dist)


def test_pagerank_bit_identical_per_vertex_sums(setup):
    """Destination-owner placement keeps each vertex's in-edge list in
    one contiguous CSC slice, so the sharded per-vertex segment sums are
    *bit-identical* to single-device — stronger than tolerance."""
    g, vsg, mesh, _ = setup
    from green_marl_tpu.models.pagerank import pagerank
    ref = np.asarray(pagerank(g, e=0.0, d=0.85, max_iter=5)[0])[:g.num_nodes]
    got, _, it = V.pagerank_vsharded(vsg, mesh, e=0.0, d=0.85, max_iter=5)
    assert int(it) == 5
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_placement_report(setup):
    g, vsg, mesh, _ = setup
    rep = V.placement_report(vsg, mesh)
    assert "distribution=[X]" in rep
    assert "ghost exchange" in rep
