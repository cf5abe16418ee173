"""Degree-binned batched edge-map engine tests (ops/binned.py).

Oracles are direct numpy CSC reductions; graph fixtures include skewed
degree distributions so the hub (chunked) path is exercised.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.models import batched
from green_marl_tpu.ops import binned


def random_graph(rng, n=500, m=4000, skew=False):
    if skew:
        # power-law-ish: preferential destinations + one mega-hub
        dst = (rng.pareto(1.0, m) * 5).astype(np.int64) % n
        src = rng.integers(0, n, m)
        hub = rng.integers(0, n)
        extra_src = rng.integers(0, n, 300)
        src = np.concatenate([src, extra_src])
        dst = np.concatenate([dst, np.full(300, hub)])
    else:
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
    g, _ = from_edges(src.astype(np.int32), dst.astype(np.int32), n)
    return g, src.astype(np.int64), dst.astype(np.int64)


def oracle_pull(src, dst, n, x, op):
    """out[v, :] = op over {x[w] : (w -> v)} with op identity default."""
    B = x.shape[1]
    ident = {"sum": 0.0, "or": 0.0, "min": np.inf, "max": -np.inf}[op]
    out = np.full((n, B), ident, x.dtype)
    for s, d in zip(src, dst):
        if op == "sum":
            out[d] += x[s]
        elif op in ("max", "or"):
            out[d] = np.maximum(out[d], x[s])
        else:
            out[d] = np.minimum(out[d], x[s])
    return out


@pytest.mark.parametrize("skew", [False, True])
@pytest.mark.parametrize("op", ["sum", "min", "max"])
def test_edge_map_matches_oracle(rng, skew, op):
    g, src, dst = random_graph(rng, skew=skew)
    # small w_max so the hub/chunk path triggers on the skewed fixture
    bp = binned.binned_in(g, w_max=16)
    n, B = g.num_nodes, 8
    x = rng.random((n, B)).astype(np.float32)

    ident = binned.op_identity(op, np.float32)
    table = bp.make_table(bp.to_binned(jnp.asarray(x)), ident)
    out = binned.edge_map(bp, table, op)
    got = np.asarray(bp.from_binned(out[:bp.n_nodes]))

    want = oracle_pull(src, dst, n, x, op).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_edge_map_out_direction(rng):
    g, src, dst = random_graph(rng)
    bp = binned.binned_out(g, w_max=32)
    n, B = g.num_nodes, 4
    x = rng.random((n, B)).astype(np.float32)
    table = bp.make_table(bp.to_binned(jnp.asarray(x)), 0.0)
    out = binned.edge_map(bp, table, "sum")
    got = np.asarray(bp.from_binned(out[:bp.n_nodes]))
    # out-direction pull: out[v] = sum over v's out-neighbors
    want = oracle_pull(dst, src, n, x, "sum")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_edge_map_weighted_relax(rng):
    """min over in-nbrs of x[w] + weight(e) — the SSSP relax shape."""
    g, src, dst = random_graph(rng, n=200, m=1500)
    bp = binned.binned_in(g, w_max=16)
    n, B = g.num_nodes, 4
    x = rng.random((n, B)).astype(np.float32)
    # weights in CSC slot order = the layout of g.r_node_idx
    csc_src = np.asarray(g.r_node_idx)[:g.num_edges]
    csc_dst = np.asarray(g.r_node_idx_dst)[:g.num_edges]
    w = rng.random(g.num_edges).astype(np.float32)
    w_pad = np.zeros(g.e_pad, np.float32)
    w_pad[:g.num_edges] = w

    slot_w = binned.edge_slot_vals(bp, jnp.asarray(w_pad), np.float32(0))
    table = bp.make_table(bp.to_binned(jnp.asarray(x)), np.float32(np.inf))
    out = binned.edge_map(bp, table, "min", slot_vals=slot_w)
    got = np.asarray(bp.from_binned(out[:bp.n_nodes]))

    want = np.full((n, B), np.inf, np.float32)
    for s, d, ww in zip(csc_src, csc_dst, w):
        want[d] = np.minimum(want[d], x[s] + ww)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multi_source_bfs_binned_matches_scan_version(rng):
    g, src, dst = random_graph(rng, n=300, m=2500, skew=True)
    bp = binned.binned_in(g, w_max=16)
    roots = jnp.asarray(rng.integers(0, g.num_nodes, 6).astype(np.int32))
    ref = batched.multi_source_bfs(g, roots)
    got = batched.multi_source_bfs_binned(bp, roots)
    d_ref = np.asarray(ref.dist)[:g.num_nodes]
    d_got = np.asarray(bp.from_binned(got.dist[:bp.n_nodes]))
    np.testing.assert_array_equal(d_got, d_ref)


def test_multi_pagerank_binned_matches_scan_version(rng):
    g, src, dst = random_graph(rng, n=300, m=2500)
    bp = binned.binned_in(g, w_max=16)
    damping = jnp.asarray([0.85, 0.6], jnp.float32)
    ref = batched.multi_pagerank(g, damping, max_iter=20)
    deg = bp.to_binned(g.out_degree()[:g.num_nodes])
    got = batched.multi_pagerank_binned(bp, deg, damping, max_iter=20)
    r_ref = np.asarray(ref.rank)[:g.num_nodes]
    r_got = np.asarray(bp.from_binned(got.rank[:bp.n_nodes]))
    np.testing.assert_allclose(r_got, r_ref, rtol=2e-4, atol=1e-7)
    assert int(got.iterations) == int(ref.iterations)


def test_multi_source_bfs_bits_matches_int_version(rng):
    g, src, dst = random_graph(rng, n=300, m=2500, skew=True)
    bp = binned.binned_in(g, w_max=16)
    B = 20
    roots = jnp.asarray(rng.integers(0, g.num_nodes, B).astype(np.int32))
    deg = bp.to_binned(g.out_degree()[:g.num_nodes]).astype(jnp.int32)
    deg_rows = jnp.concatenate(
        [deg, jnp.zeros((bp.n_rows - bp.n_nodes,), jnp.int32)])

    ref = batched.multi_source_bfs_binned(bp, roots)
    got = batched.multi_source_bfs_bits(bp, roots, deg_rows)

    d_ref = np.asarray(ref.dist)
    reached_ref = (d_ref != batched.INT32_MAX)[:bp.n_nodes]
    np.testing.assert_array_equal(
        np.asarray(got.reached), reached_ref.sum(axis=0))
    deg_np = np.asarray(deg)
    trav_ref = (reached_ref * deg_np[:, None]).sum(axis=0)
    np.testing.assert_array_equal(np.asarray(got.traversed), trav_ref)
    # visited bit planes decode to the reached masks
    vis = np.asarray(got.visited)[:bp.n_nodes]
    for b in range(B):
        bits = (vis[:, b // 8] >> (b % 8)) & 1
        np.testing.assert_array_equal(bits.astype(bool), reached_ref[:, b])
    assert int(got.levels_run) == int(ref.levels_run)


def test_bit_popstats_chunked_matches(rng, monkeypatch):
    """The row-chunked popstats path (engaged at twitter-class n_rows
    to cap the int32 expansion transient) sums identically to the
    single-block path."""
    g, src, dst = random_graph(rng, n=300, m=2500, skew=True)
    bp = binned.binned_in(g, w_max=16)
    B = 20
    roots = jnp.asarray(rng.integers(0, g.num_nodes, B).astype(np.int32))
    deg = bp.to_binned(g.out_degree()[:g.num_nodes]).astype(jnp.int32)
    deg_rows = jnp.concatenate(
        [deg, jnp.zeros((bp.n_rows - bp.n_nodes,), jnp.int32)])
    a = batched.multi_source_bfs_bits(bp, roots, deg_rows)
    monkeypatch.setattr(batched, "_POP_CH", 37)   # force many chunks
    # _POP_CH is read at trace time — drop the cached executable so
    # the chunked path actually retraces
    batched.multi_source_bfs_bits._clear_cache()
    b = batched.multi_source_bfs_bits(bp, roots, deg_rows)
    batched.multi_source_bfs_bits._clear_cache()
    np.testing.assert_array_equal(np.asarray(a.reached),
                                  np.asarray(b.reached))
    np.testing.assert_array_equal(np.asarray(a.traversed),
                                  np.asarray(b.traversed))


def test_multi_source_bfs_bits32_matches(rng):
    """uint32 planes: 32 instances/lane (the 4096-source headline
    packing) — same results as the uint8 path."""
    g, src, dst = random_graph(rng, n=300, m=2500, skew=True)
    bp = binned.binned_in(g, w_max=16)
    B = 70
    roots = jnp.asarray(rng.integers(0, g.num_nodes, B).astype(np.int32))
    deg = bp.to_binned(g.out_degree()[:g.num_nodes]).astype(jnp.int32)
    deg_rows = jnp.concatenate(
        [deg, jnp.zeros((bp.n_rows - bp.n_nodes,), jnp.int32)])
    a = batched.multi_source_bfs_bits(bp, roots, deg_rows, plane_bits=8)
    b = batched.multi_source_bfs_bits(bp, roots, deg_rows, plane_bits=32)
    np.testing.assert_array_equal(np.asarray(a.reached),
                                  np.asarray(b.reached))
    np.testing.assert_array_equal(np.asarray(a.traversed),
                                  np.asarray(b.traversed))
    assert int(a.levels_run) == int(b.levels_run)
