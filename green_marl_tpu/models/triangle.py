"""Triangle counting (``apps/src/triangle_counting.gm:1-13``).

Reference semantics (undirected version)::

    Foreach(v) Foreach(u: v.Nbrs)(u > v) Foreach(w: v.Nbrs)(w > u)
        If (w.HasEdgeTo(u)) T += 1;

i.e. every triangle {a<b<c} is counted exactly once; ``HasEdgeTo`` is a
binary search over the semi-sorted neighbor row
(``gm_graph.cc:468``, ``gm_common_neighbor_iter.cc``).

TPU formulation: orient the graph into a DAG by **degree order** (ties by
id) — triangle count is orientation-invariant, and degree ordering bounds
the DAG out-degree by ~sqrt(E), collapsing the wedge count vs. the
reference's id ordering.  Then enumerate wedges (b, c) ∈ N⁺(a)² with
slot(c) > slot(b) in a flat index space (no ragged loops, no wedge
materialization: each chunk reconstructs its wedges from a cumulative-pair
prefix via binary search) and tests c ∈ N⁺(b) by binary search.  All
reduction is a fixed-order sum — no atomics (reference uses an OpenMP
reduction on T).

The Pallas sorted-merge intersection kernel (M4) replaces the inner
binary search for large graphs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph, round_up
from ..utils.limbs import limb_add, limb_value, limb_zero


class DagContext(NamedTuple):
    """Degree-ordered oriented DAG in CSR form (device arrays).

    Rows are sorted by destination *rank*, so binary-search membership
    works; ``rank`` maps original node id -> orientation rank.
    """
    dag_begin: jax.Array   # [N+1]
    dag_dst: jax.Array     # [D_pad] destination ranks, row-sorted
    pair_cum: jax.Array    # [D_pad+1] cumulative wedge (pair) counts / slot
    num_wedges: int
    num_dag_edges: int


def build_dag(g: Graph) -> DagContext:
    """Host-side preprocessing (numpy), like ``make_reverse_edges``."""
    begin = np.asarray(g.begin)
    dst = np.asarray(g.node_idx)[: g.num_edges].astype(np.int64)
    N = g.num_nodes
    deg = np.diff(begin).astype(np.int64)
    src = np.repeat(np.arange(N, dtype=np.int64), deg)

    # Orientation rank: ascending degree, ties by id.
    order = np.lexsort((np.arange(N), deg))      # rank -> node
    rank = np.empty(N, np.int64)
    rank[order] = np.arange(N)

    rs, rd = rank[src], rank[dst]
    keep = rs < rd                                # orient low-rank -> high-rank
    ds, dd = rs[keep], rd[keep]
    # dedup parallel edges (multigraphs would over-count)
    codes = np.unique(ds * N + dd)
    ds, dd = codes // N, codes % N
    D = ds.shape[0]

    dag_begin = np.zeros(N + 1, np.int64)
    np.cumsum(np.bincount(ds, minlength=N), out=dag_begin[1:])
    # rows already sorted by (ds, dd) because codes are sorted

    d_pad = round_up(max(D, 1))
    dag_dst = np.full(d_pad, N, np.int64)
    dag_dst[:D] = dd

    row_end = dag_begin[ds + 1]
    slots = np.arange(D, dtype=np.int64)
    pairs = row_end - slots - 1                   # wedges anchored at slot
    pair_cum = np.zeros(d_pad + 1, np.int64)
    pair_cum[1:D + 1] = np.cumsum(pairs)
    if D < d_pad:
        pair_cum[D + 1:] = pair_cum[D]

    # int32 on device (x64 off); counts beyond int32 are rejected at the
    # count entry points before these arrays are indexed
    return DagContext(
        dag_begin=jnp.asarray(dag_begin.astype(np.int32)),
        dag_dst=jnp.asarray(dag_dst.astype(np.int32)),
        pair_cum=jnp.asarray(np.minimum(pair_cum, 2**31 - 1)
                             .astype(np.int32)),
        num_wedges=int(pair_cum[D]),
        num_dag_edges=D,
    )


@partial(jax.jit, static_argnames=("num_wedges", "chunk"))
def _count_wedges(dag_begin, dag_dst, pair_cum, num_wedges: int,
                  chunk: int) -> jax.Array:
    """Sum over all wedges of [c in N+(b)]; flat wedge ids -> (slot, offset)
    via binary search on the pair prefix, then membership by binary search
    in row b."""
    n = dag_begin.shape[0] - 1
    num_chunks = (num_wedges + chunk - 1) // chunk
    bits = max(1, int(n).bit_length()) + 1

    def row_contains(b, c):
        lo = dag_begin[b]
        hi = dag_begin[b + 1]

        def body(_, state):
            lo, hi = state
            active = lo < hi
            mid = (lo + hi) // 2
            v = dag_dst[jnp.clip(mid, 0, dag_dst.shape[0] - 1)]
            go_right = active & (v < c)
            return (jnp.where(go_right, mid + 1, lo),
                    jnp.where(active & ~go_right, mid, hi))

        lo, hi = jax.lax.fori_loop(0, bits, body, (lo, hi))
        return (lo < dag_begin[b + 1]) & \
            (dag_dst[jnp.clip(lo, 0, dag_dst.shape[0] - 1)] == c)

    def do_chunk(ci, acc):
        k = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = k < num_wedges
        kk = jnp.minimum(k, num_wedges - 1)
        # anchor slot i: largest i with pair_cum[i] <= kk
        i = jnp.searchsorted(pair_cum, kk, side="right") - 1
        off = kk - pair_cum[i]
        j = i + 1 + off
        b = dag_dst[i]
        c = dag_dst[j]
        hit = row_contains(b, c) & valid
        return limb_add(acc, jnp.sum(hit.astype(jnp.int32)))

    return jax.lax.fori_loop(0, num_chunks, do_chunk, limb_zero())


def triangle_count(g: Graph, chunk: int = 1 << 20) -> int:
    """Count triangles of the (undirected, symmetric) graph ``g``.

    Returns a Python int (reference prints ``number of triangles: T``).
    """
    ctx = build_dag(g)
    if ctx.num_wedges == 0:
        return 0
    if ctx.num_wedges >= 2 ** 31 - (1 << 21):
        # flat wedge ids are int32 on device (x64 disabled); beyond this
        # the enumeration must be split into sub-ranges — not a bundled
        # workload (LJ's oriented wedge count is ~1.8e9 < 2^31)
        raise NotImplementedError(
            f"wedge id space {ctx.num_wedges} exceeds int32")
    chunk = min(chunk, round_up(ctx.num_wedges))
    t = _count_wedges(ctx.dag_begin, ctx.dag_dst, ctx.pair_cum,
                      ctx.num_wedges, chunk)
    return limb_value(t)


def triangle_count_np(begin, node_idx):
    """Host oracle: literal transliteration of triangle_counting.gm."""
    begin = np.asarray(begin)
    node_idx = np.asarray(node_idx)
    N = begin.shape[0] - 1
    rows = [set(node_idx[begin[v]:begin[v + 1]].tolist()) for v in range(N)]
    T = 0
    for v in range(N):
        nbrs = sorted(rows[v])
        for u in nbrs:
            if u <= v:
                continue
            for w in nbrs:
                if w <= u:
                    continue
                if u in rows[w]:
                    T += 1
    return T


# ---------------------------------------------------------------------------
# Literal semantics (directed graphs, multigraph slot counting)
# ---------------------------------------------------------------------------

class LiteralCtx(NamedTuple):
    f_dst: jax.Array       # [F_pad] suffix-slot dst values (sorted per row)
    jbase: jax.Array       # [F_pad] first strictly-greater pair slot
    pair_cum: jax.Array    # [F_pad+1]
    num_wedges: int


def build_literal(g: Graph) -> LiteralCtx:
    """Host-side wedge schedule for the literal ``triangle_counting.gm``
    semantics: ``Foreach(u: v.Nbrs)(u > v) Foreach(w: v.Nbrs)(w > u)``
    iterates CSR *slots* with strict value ordering, so parallel edges
    multiply wedge counts exactly as the generated OpenMP loops do
    (``gm_cpp_gen_foreach.cc:33-328``)."""
    begin = np.asarray(g.begin)
    dst = np.asarray(g.node_idx)[: g.num_edges].astype(np.int64)
    N = g.num_nodes
    deg = np.diff(begin).astype(np.int64)
    src = np.repeat(np.arange(N, dtype=np.int64), deg)

    keep = dst > src                     # suffix of each semi-sorted row
    f_dst_np = dst[keep]
    f_src = src[keep]
    f_cnt = np.bincount(f_src, minlength=N).astype(np.int64)
    f_begin = np.zeros(N + 1, np.int64)
    np.cumsum(f_cnt, out=f_begin[1:])
    F = int(f_dst_np.shape[0])

    # strictly-greater pair base: skip the tail of the current equal run
    slots = np.arange(F, dtype=np.int64)
    row_end = f_begin[f_src + 1]
    # run ends: position of last slot with the same (row, value)
    if F:
        same_next = np.zeros(F, bool)
        same_next[:-1] = (f_dst_np[1:] == f_dst_np[:-1]) & \
            (f_src[1:] == f_src[:-1])
        # eq_after[i] = number of following slots in the same equal run
        run_end = np.empty(F, np.int64)
        idx = F - 1
        # vectorized run-end: positions where run breaks
        brk = np.nonzero(~same_next)[0]          # last slot of each run
        run_id = np.zeros(F, np.int64)
        run_id[1:] = (~same_next[:-1]).cumsum()
        run_end = brk[run_id]
        jbase_np = run_end + 1
    else:
        jbase_np = np.zeros(0, np.int64)
    pairs = np.maximum(row_end - jbase_np, 0)

    f_pad = round_up(max(F, 1))
    pair_cum = np.zeros(f_pad + 1, np.int64)
    pair_cum[1:F + 1] = np.cumsum(pairs)
    if F < f_pad:
        pair_cum[F + 1:] = pair_cum[F] if F else 0
    f_dst_pad = np.full(f_pad, N, np.int64)
    f_dst_pad[:F] = f_dst_np
    jbase_pad = np.zeros(f_pad, np.int64)
    jbase_pad[:F] = jbase_np

    return LiteralCtx(
        f_dst=jnp.asarray(f_dst_pad.astype(np.int32)),
        jbase=jnp.asarray(jbase_pad.astype(np.int32)),
        pair_cum=jnp.asarray(np.minimum(pair_cum, 2**31 - 1)
                             .astype(np.int32)),
        num_wedges=int(pair_cum[F]) if F else 0,
    )


@partial(jax.jit, static_argnames=("num_wedges", "chunk"))
def _count_wedges_literal(g: Graph, f_dst, jbase, pair_cum,
                          num_wedges: int, chunk: int) -> jax.Array:
    """hit(k) = HasEdgeTo(w_k, u_k) over the *original* directed CSR."""
    from ..ops.segment import has_edge_to
    num_chunks = (num_wedges + chunk - 1) // chunk

    def do_chunk(ci, acc):
        k = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = k < num_wedges
        kk = jnp.minimum(k, num_wedges - 1)
        i = jnp.searchsorted(pair_cum, kk, side="right") - 1
        off = kk - pair_cum[i]
        j = jbase[i] + off
        u = f_dst[i]
        w = f_dst[jnp.clip(j, 0, f_dst.shape[0] - 1)]
        uu = jnp.clip(u, 0, g.num_nodes - 1).astype(g.node_dtype)
        ww = jnp.clip(w, 0, g.num_nodes - 1).astype(g.node_dtype)
        hit = has_edge_to(g, ww, uu) & valid & (u < g.num_nodes)
        return limb_add(acc, jnp.sum(hit.astype(jnp.int32)))

    return jax.lax.fori_loop(0, num_chunks, do_chunk, limb_zero())


def triangle_count_literal(g: Graph, chunk: int = 1 << 20) -> int:
    """Exact reference semantics on arbitrary (directed, multi-) graphs —
    the CLI/parity entry point.  ``triangle_count`` (degree-oriented DAG)
    remains the fast path for symmetric simple graphs, where both agree."""
    ctx = build_literal(g)
    if ctx.num_wedges == 0:
        return 0
    if ctx.num_wedges >= 2 ** 31 - (1 << 21):
        raise NotImplementedError(
            f"wedge id space {ctx.num_wedges} exceeds int32")
    chunk = min(chunk, round_up(ctx.num_wedges))
    t = _count_wedges_literal(g, ctx.f_dst, ctx.jbase, ctx.pair_cum,
                              ctx.num_wedges, chunk)
    return limb_value(t)
