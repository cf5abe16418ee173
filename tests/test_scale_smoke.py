"""Large-graph (twitter-class) readiness smoke (VERDICT r4 item 4).

The reference compiles EDGE_SIZE=64 for twitter_rv (setup.mk.in:55-57,
extract_result.py:102-104 goldens).  This repo's answer: host edge
space is int64-capable (graph/binary_io.py, GraphBuilder), the native
CSR builder takes int64 edge counts with int32 ids (twitter's N=41.6M,
E=1.47B both fit int32 values), the 24-bit transfer pack refuses ids >=
2^24 at SELECTION time (bench.py can_pack; utils/pack.py asserts), and
the vertex-sharded layout keeps per-shard device slots int32.

The 42M-NODE smoke (loader -> binned schedule -> one PageRank
superstep) allocates ~12 GB host + ~2 GB device and takes minutes, so
it is opt-in: ``SCALE_SMOKE=1 python -m pytest tests/test_scale_smoke.py``.
Results are recorded in BASELINE.md's max-scale table.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges, round_up
from green_marl_tpu.ops import binned
from green_marl_tpu.utils import pack


def test_pack24_refuses_wide_ids():
    """Ids >= 2^24 must fail the pack range assert (bench.py guards at
    selection time; this is the backstop)."""
    with pytest.raises(AssertionError):
        pack.pack24(np.asarray([1 << 24], np.int64))
    # 2^24 - 1 is the largest packable id
    w = pack.pack24(np.asarray([(1 << 24) - 1, 3], np.int64))
    got = np.asarray(pack.unpack24(jnp.asarray(w), 2))
    np.testing.assert_array_equal(got, [(1 << 24) - 1, 3])


def test_int64_host_edge_space_small():
    """from_edges accepts int64 edge dtype (host edge space beyond
    2^31 slots; values here stay small so the device cast is lossless)."""
    src = np.asarray([0, 1, 2, 2], np.int64)
    dst = np.asarray([1, 2, 0, 1], np.int64)
    g, perm = from_edges(src, dst, 3, edge_dtype=np.int64)
    assert g.num_edges == 4
    deg = np.diff(np.asarray(g.begin))
    assert deg.sum() == 4


@pytest.mark.skipif(os.environ.get("SCALE_SMOKE") != "1",
                    reason="opt-in: ~12 GB host RAM, minutes of CPU")
def test_scale_42m_nodes_smoke():
    N = 42_000_000            # > 2^24 (pack24-ineligible), twitter-class
    E = 120_000_000
    src, dst = gen.uniform_random_edges(N, E, seed=1)
    src = src.astype(np.int32)
    dst = dst.astype(np.int32)
    g, _ = from_edges(src, dst, N)
    assert g.num_nodes == N and g.num_edges == E
    out_deg = np.diff(np.asarray(g.begin)).astype(np.int64)
    assert out_deg.sum() == E
    del src, dst

    # binned schedule over the pull direction
    r_begin = np.asarray(g.r_begin)
    csc_src = np.asarray(g.r_node_idx)
    e_pad = round_up(E)
    bp = binned.build_binned(r_begin, csc_src, N, e_pad)
    assert bp.n_nodes >= N

    # one PageRank superstep through the binned device path
    bp_d = binned.device_put_lite(bp)
    deg_rows = np.zeros(bp.n_rows, np.int32)
    deg_rows[:N] = out_deg[np.asarray(bp.perm)]
    res = binned.pull_sum_ones_superstep(bp_d, jnp.asarray(deg_rows)) \
        if hasattr(binned, "pull_sum_ones_superstep") else None
    if res is None:
        # generic path: one multi_pagerank_binned iteration, B=1
        from green_marl_tpu.models import batched
        r = batched.multi_pagerank_binned(
            bp_d, jnp.asarray(deg_rows[: bp.n_nodes]),
            jnp.asarray([0.85], np.float32), e=0.0, max_iter=1)
        v = np.asarray(r.rank[0, :8])
        assert np.isfinite(v).all()
