"""Batched multi-instance algorithms: many roots / configs in lockstep.

The reference runs one algorithm instance per process (bc.gm iterates its
seed set sequentially; SURVEY.md §2.10 "batched instances: absent").  This
module adds the new capability the TPU build is for: advancing B instances
per superstep with one fused device program.

TPU-first layout: instance state is ``[N_pad, B]`` with the batch as the
**trailing (lane) axis** — a per-edge gather then touches one contiguous
B-wide vector per endpoint, so edge maps stay dense vector loads/stores
instead of strided scatters.  Edge traversal is chunked with
``lax.scan`` over fixed-size slices of the padded edge arrays, carrying the
``[N_pad, B]`` accumulator (donated, updated in place by XLA) — the same
structure the Pallas kernels drop into.

Numeric note: distances are int32; convergence predicates reduce over both
axes so the loop runs until *every* instance is done (matching vmap
semantics of ``lax.while_loop`` but with explicit masking).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..engine.superstep import while_loop
from ..graph.csr import Graph
from ..ops import segment as ops

INT32_MAX = jnp.iinfo(jnp.int32).max


def _edge_chunks(g: Graph, chunk: int):
    """(chunk, n_chunks, pad_to) — edge arrays are padded with sentinel
    slots up to ``n_chunks * chunk`` so ``reshape`` is exact."""
    chunk = min(chunk, g.e_pad)
    n_chunks = -(-g.e_pad // chunk)
    return chunk, n_chunks, n_chunks * chunk


def _chunked(g: Graph, arr: jax.Array, n_chunks: int, chunk: int,
             fill) -> jax.Array:
    pad = n_chunks * chunk - arr.shape[0]
    if pad:
        arr = jnp.pad(arr, (0, pad), constant_values=fill)
    return arr.reshape(n_chunks, chunk)


class MultiBfsResult(NamedTuple):
    dist: jax.Array        # [N_pad, B] int32 (INT32_MAX = unreached)
    levels_run: jax.Array


@partial(jax.jit, static_argnames=("max_iter", "chunk"))
def multi_source_bfs(g: Graph, roots: jax.Array,
                     max_iter: Optional[int] = None,
                     chunk: int = 1 << 20) -> MultiBfsResult:
    """Level-synchronous BFS from ``roots[b]`` for every instance b.

    The frontier is implicit — ``dist == depth`` — so per-instance state is
    one int32 plane; supersteps run until no instance has a live frontier.
    """
    if max_iter is None:
        max_iter = g.num_nodes + 1
    B = roots.shape[0]
    chunk, n_chunks, _ = _edge_chunks(g, chunk)
    mask = g.node_mask()

    dist0 = jnp.full((g.n_pad, B), INT32_MAX, jnp.int32)
    dist0 = dist0.at[roots, jnp.arange(B)].set(0)
    dist0 = jnp.where(mask[:, None], dist0, INT32_MAX)

    sent = g.sentinel
    csc_src = _chunked(g, g.r_node_idx, n_chunks, chunk, sent)
    csc_dst = _chunked(g, g.r_node_idx_dst, n_chunks, chunk, sent)

    def step(state):
        dist, depth = state
        frontier = dist == depth                      # [N_pad, B]

        def scan_body(hit, edges):
            src, dst = edges
            vals = frontier[src]                      # [chunk, B] gather
            return hit.at[dst].max(vals), None

        hit0 = jnp.zeros((g.n_pad, B), jnp.bool_)
        hit, _ = jax.lax.scan(scan_body, hit0, (csc_src, csc_dst))
        newly = hit & (dist == INT32_MAX) & mask[:, None]
        new_dist = jnp.where(newly, depth + 1, dist)
        return new_dist, depth + 1

    def not_done(state):
        dist, depth = state
        return jnp.any(dist == depth)

    (dist, _), stats = while_loop(
        step, not_done, (dist0, jnp.zeros((), jnp.int32)), max_iter)
    return MultiBfsResult(dist=dist, levels_run=stats.iterations)


class MultiPageRankResult(NamedTuple):
    rank: jax.Array        # [N_pad, B]
    diff: jax.Array        # [B]
    iterations: jax.Array


@partial(jax.jit, static_argnames=("max_iter", "chunk", "dtype"))
def multi_pagerank(g: Graph, damping: jax.Array, e=0.001,
                   max_iter: int = 100, chunk: int = 1 << 20,
                   dtype=jnp.float32) -> MultiPageRankResult:
    """PageRank with a per-instance damping factor ``damping[b]``.

    Converged instances are frozen (their rank plane stops changing) while
    the rest keep iterating; the loop exits when all are converged or at
    ``max_iter``.
    """
    B = damping.shape[0]
    chunk, n_chunks, _ = _edge_chunks(g, chunk)
    n = g.num_nodes
    mask = g.node_mask()
    inv_n = jnp.asarray(1.0 / n, dtype)
    e = jnp.asarray(e, dtype)
    d = damping.astype(dtype)[None, :]                # [1, B]

    out_deg = g.out_degree().astype(dtype)
    inv_deg = jnp.where(out_deg > 0, 1.0 / jnp.maximum(out_deg, 1), 0.0)

    rank0 = jnp.where(mask[:, None], inv_n, 0).astype(dtype) \
        * jnp.ones((1, B), dtype)

    sent = g.sentinel
    csc_src = _chunked(g, g.r_node_idx, n_chunks, chunk, sent)
    csc_dst = _chunked(g, g.r_node_idx_dst, n_chunks, chunk, sent)

    def step(state):
        rank, diff, active = state
        contrib = rank * inv_deg[:, None]

        def scan_body(acc, edges):
            src, dst = edges
            return acc.at[dst].add(contrib[src]), None

        s0 = jnp.zeros((g.n_pad, B), dtype)
        s, _ = jax.lax.scan(scan_body, s0, (csc_src, csc_dst))
        val = (1 - d) * inv_n + d * s
        val = jnp.where(mask[:, None], val, 0)
        new_diff = jnp.sum(jnp.abs(val - rank), axis=0)  # [B]
        rank = jnp.where(active[None, :], val, rank)
        return rank, jnp.where(active, new_diff, diff), active & (new_diff > e)

    def not_done(state):
        return jnp.any(state[2])

    state0 = (rank0, jnp.zeros((B,), dtype), jnp.ones((B,), jnp.bool_))
    (rank, diff, _), stats = while_loop(step, not_done, state0, max_iter)
    return MultiPageRankResult(rank=rank, diff=diff,
                               iterations=stats.iterations)


# ---------------------------------------------------------------------------
# Degree-binned engine variants (ops.binned) — the TPU fast path.
#
# The ``lax.scan``-over-edge-chunks versions above express the edge map as
# elementwise gathers + scatter-adds, which XLA executes at ~1 GB/s on TPU
# (measured; VERDICT r1 item 1).  These variants run the same algorithms
# through the row-gather + fixed-width-reduce engine (ops/binned.py), which
# sustains ~9.5 ns/row independent of B — per-edge cost drops ~B×.
# State lives in *binned row order*; use ``bp.from_binned`` on results.
# ---------------------------------------------------------------------------

from ..ops import binned as _binned  # noqa: E402


@partial(jax.jit, static_argnames=("max_iter",))
def multi_source_bfs_binned(bp, roots: jax.Array,
                            max_iter: Optional[int] = None
                            ) -> MultiBfsResult:
    """Multi-source BFS on the binned engine.

    ``bp``: ``ops.binned.BinnedPull`` built over the *in*-neighbor view
    (``binned_in``) — a node joins the frontier when any in-neighbor is in
    it, which traverses out-edges forward (reference ST_RD bottom-up,
    ``gm_bfs_template.h:176-198``, run dense every level).
    ``roots``: [B] original node ids.  Result ``dist`` is [n_rows, B] in
    binned row order (INT32_MAX = unreached).
    """
    if max_iter is None:
        max_iter = bp.n_nodes + 1
    B = roots.shape[0]
    root_rows = bp.inv_perm[roots]                    # [B] binned rows
    node_rows = bp.node_rows_mask()                   # [n_rows, 1]

    dist0 = jnp.full((bp.n_rows, B), INT32_MAX, jnp.int32)
    dist0 = dist0.at[root_rows, jnp.arange(B)].set(0)
    dist0 = jnp.where(node_rows, dist0, INT32_MAX)
    f0 = (dist0 == 0).astype(jnp.float32)

    def step(state):
        dist, f, depth = state
        hit = _binned.edge_map(bp, f, "or")           # [n_rows, B]
        newly = (hit > 0) & (dist == INT32_MAX) & node_rows
        dist = jnp.where(newly, depth + 1, dist)
        return dist, newly.astype(jnp.float32), depth + 1

    def not_done(state):
        return jnp.any(state[1] > 0)

    state0 = (dist0, f0, jnp.zeros((), jnp.int32))
    (dist, _, _), stats = while_loop(step, not_done, state0, max_iter)
    return MultiBfsResult(dist=dist, levels_run=stats.iterations)


@partial(jax.jit, static_argnames=("max_iter", "dtype"))
def multi_pagerank_binned(bp, out_deg_binned: jax.Array,
                          damping: jax.Array, e=0.001,
                          max_iter: int = 100,
                          dtype=jnp.float32) -> MultiPageRankResult:
    """PageRank (per-instance damping) on the binned engine.

    ``out_deg_binned``: [n_nodes] out-degrees in binned row order
    (``bp.to_binned(g.out_degree()[:N])``); ``bp`` is over in-neighbors.
    Result rank is [n_rows, B] in binned row order.
    """
    B = damping.shape[0]
    n = bp.n_nodes
    node_rows = bp.node_rows_mask()
    inv_n = jnp.asarray(1.0 / n, dtype)
    e = jnp.asarray(e, dtype)
    d = damping.astype(dtype)[None, :]

    deg = out_deg_binned.astype(dtype)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0)
    inv_deg = jnp.concatenate(
        [inv_deg, jnp.zeros((bp.n_rows - n,), dtype)])[:, None]

    rank0 = jnp.where(node_rows, inv_n, 0).astype(dtype) \
        * jnp.ones((1, B), dtype)

    def step(state):
        rank, diff, active = state
        contrib = rank * inv_deg                      # pad rows stay 0
        s = _binned.edge_map(bp, contrib, "sum")
        val = (1 - d) * inv_n + d * s
        val = jnp.where(node_rows, val, 0)
        new_diff = jnp.sum(jnp.abs(val - rank), axis=0)
        rank = jnp.where(active[None, :], val, rank)
        return rank, jnp.where(active, new_diff, diff), \
            active & (new_diff > e)

    def not_done(state):
        return jnp.any(state[2])

    state0 = (rank0, jnp.zeros((B,), dtype), jnp.ones((B,), jnp.bool_))
    (rank, diff, _), stats = while_loop(step, not_done, state0, max_iter)
    return MultiPageRankResult(rank=rank, diff=diff,
                               iterations=stats.iterations)


class BitBfsResult(NamedTuple):
    visited: jax.Array     # [n_rows, LANES] uint8/16/32 bit planes
    #                        (binned order)
    levels_run: jax.Array
    reached: jax.Array     # [B] per-instance reached-node counts
    traversed: jax.Array   # [B] per-instance Graph500 traversed edges


# Row-chunk size for the popstats bit expansion: the per-bit int32
# view of the plane costs 4x its bytes, and at twitter-class n_rows
# (>2^24) a whole-plane expansion transient is what OOMs a 16 GB chip
# (probe_twitter_scale: N=24M failed at warmup, N=20M ran).  Chunking
# caps the transient at ~0.5 GB per bit with identical int32 sums.
_POP_CH = 1 << 20


def _bit_popstats(newly, deg_rows, lanes, bits=8):
    """Per-instance (lane*8+bit) counts and degree-weighted counts from a
    [n_rows, lanes] uint8 plane.

    Counters are per-instance int32: a single instance traverses at most
    E edges (< 2^31 for every supported workload incl. twitter_rv's
    1.46B); callers aggregate across instances on the host in int64 —
    device-side int64 is unavailable without jax_enable_x64."""
    one = jnp.ones((), newly.dtype)
    n_rows = newly.shape[0]
    starts = range(0, n_rows, _POP_CH)
    cnt = jnp.zeros((lanes, bits), jnp.int32)
    trav = jnp.zeros((lanes, bits), jnp.int32)
    for s in starts:
        blk = newly[s:s + _POP_CH]
        dblk = deg_rows[s:s + _POP_CH]
        cnts = []
        travs = []
        for i in range(bits):
            p = ((blk >> i) & one).astype(jnp.int32)   # [<=CH, lanes]
            cnts.append(jnp.sum(p, axis=0))             # [lanes]
            travs.append(jnp.sum(p * dblk[:, None], axis=0,
                                 dtype=jnp.int32))
        cnt = cnt + jnp.stack(cnts, axis=1)
        trav = trav + jnp.stack(travs, axis=1)
    # instance index convention: b = lane * 8 + bit
    return cnt.reshape(-1), trav.reshape(-1)


@partial(jax.jit, static_argnames=("max_iter", "plane_bits"))
def multi_source_bfs_bits(bp, roots: jax.Array, deg_rows: jax.Array,
                          max_iter: Optional[int] = None,
                          plane_bits: int = 8) -> BitBfsResult:
    """Bit-packed multi-source BFS: ``plane_bits`` instances per lane —
    with the engine's 128-lane tables, up to 128*32 = 4096 BFS
    instances per row gather (uint32 planes).

    The row-gather engine is issue-rate-bound (~9.5 ns/row on v5e
    regardless of payload), so packing instances into bits multiplies
    aggregate traversal throughput by the pack factor.  Plays the role of
    running the reference binary B times (it has no batched mode;
    SURVEY.md §2.10) at a tiny fraction of the cost.

    ``roots``: [B <= 128*plane_bits] original node ids; instance b lives
    at lane b//plane_bits, bit b%plane_bits.  ``deg_rows``: [n_rows]
    int32 out-degrees (binned, padded) for Graph500 accounting.
    Per-instance reached/traversed are computed ONCE from the final
    visited planes (they depend only on the reached set), so the
    superstep loop does no per-bit work.  Level arrays are not
    materialized — callers needing distances use
    ``multi_source_bfs_binned``.
    """
    if max_iter is None:
        max_iter = bp.n_nodes + 1
    dt = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32}[plane_bits]
    B = roots.shape[0]
    lanes = (B + plane_bits - 1) // plane_bits
    root_rows = bp.inv_perm[roots]
    node_rows = bp.node_rows_mask()

    bits0 = jnp.zeros((bp.n_rows, lanes), dt)
    b_ix = jnp.arange(B, dtype=jnp.int32)
    # scatter-OR of the root bits: .add is exact because every instance
    # owns a distinct bit (scatter-max would keep only the highest bit
    # when two roots share a row and lane)
    bits0 = bits0.at[root_rows, b_ix // plane_bits].add(
        (jnp.ones((), dt) << (b_ix % plane_bits).astype(dt)))
    bits0 = jnp.where(node_rows, bits0, jnp.zeros((), dt))

    def step(state):
        visited, frontier, depth = state
        hit = _binned.edge_map(bp, frontier, "bor")
        newly = hit & ~visited
        newly = jnp.where(node_rows, newly, jnp.zeros((), dt))
        return (visited | newly, newly, depth + 1)

    def not_done(state):
        return jnp.any(state[1] != 0)

    state0 = (bits0, bits0, jnp.zeros((), jnp.int32))
    (visited, _, _), stats = while_loop(step, not_done, state0, max_iter)
    cnt, trav = _bit_popstats(visited, deg_rows, lanes,
                              bits=plane_bits)
    return BitBfsResult(visited=visited, levels_run=stats.iterations,
                        reached=cnt[:B], traversed=trav[:B])
