"""Delta-stepping SSSP — the Dijkstra-class replacement.

The reference's ``sssp_dijkstra.gm`` / ``bidir_dijkstra.gm`` drive a
mutable priority map (``gm_mutatable_priority_map.h``, 1322 LoC of
heap/map code) — inherently sequential.  Per SURVEY.md §7 ("hard parts"),
the device-friendly reformulation is **delta-stepping** (Meyer &
Sanders): nodes are bucketed by ``dist // delta``; the lowest non-empty
bucket is settled by relaxing *light* edges (w <= delta) to a fixpoint,
then heavy edges once.  For non-negative weights the distances equal
Dijkstra's exactly; only the work schedule differs (documented semantic
deviation: no priority map is exposed).

Every relaxation is the same masked min-reduce superstep as
``models.relax`` — two nested ``lax.while_loop``s, no data-dependent
shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..graph.csr import Graph
from ..ops import segment as ops


class DeltaSteppingResult(NamedTuple):
    dist: jax.Array
    buckets_processed: jax.Array
    inner_steps: jax.Array


@partial(jax.jit, static_argnames=("max_buckets", "max_inner"))
def delta_stepping(g: Graph, root, edge_len: jax.Array, delta: int = 8,
                   max_buckets: int | None = None,
                   max_inner: int | None = None) -> DeltaSteppingResult:
    """``edge_len``: [E_pad] non-negative int weights (CSR order)."""
    if max_buckets is None:
        max_buckets = g.num_nodes + 1
    if max_inner is None:
        max_inner = g.num_nodes + 1
    inf = jnp.iinfo(jnp.int32).max
    ids = jnp.arange(g.n_pad, dtype=jnp.int32)
    mask = g.node_mask()
    dist0 = jnp.where((ids == root) & mask, 0, inf)
    delta = jnp.asarray(delta, jnp.int32)

    w_csc = edge_len[g.e_rev2idx].astype(jnp.int32)
    light = w_csc <= delta
    src = g.r_node_idx
    dstseg = g.r_node_idx_dst

    def relax(dist, active, use_light):
        sel = jnp.where(use_light, light, True)
        cand = jnp.where(active[src] & sel, dist[src] + w_csc, inf)
        best = ops.sorted_segment_reduce(cand, dstseg, g.r_begin,
                                         g.n_pad, "min")
        return jnp.minimum(dist, best)

    def outer(state):
        dist, bkt, inner_total = state

        in_bucket = mask & (dist != inf) & (dist // delta == bkt)

        # settle the bucket: light-edge fixpoint
        def inner(st):
            dist, active, steps = st
            new = relax(dist, active, use_light=True)
            changed = new < dist
            nxt_active = changed & (new // delta == bkt)
            return new, nxt_active, steps + 1

        def inner_not_done(st):
            return jnp.any(st[1])

        (dist, _, steps), _ = _while(inner, inner_not_done,
                                     (dist, in_bucket,
                                      jnp.zeros((), jnp.int32)),
                                     max_inner)

        # heavy edges once, from everything settled in this bucket
        settled = mask & (dist != inf) & (dist // delta == bkt)
        dist = relax(dist, settled, use_light=False)
        # skip straight to the next non-empty bucket
        nxt = jnp.min(jnp.where(mask & (dist != inf) & (dist // delta > bkt),
                                dist // delta, inf))
        return dist, nxt, inner_total + steps

    def outer_not_done(state):
        dist, bkt, _ = state
        # any node with dist in a bucket >= bkt still unfinished?  run
        # while some unsettled finite node has bucket >= bkt or any
        # reachable-but-inf remains improvable: simply: exists node with
        # finite dist bucket >= bkt (work pending)
        pending = jnp.any(mask & (dist != inf) & (dist // delta >= bkt))
        return pending

    (dist, _, inner_total), outer_iters = _while(
        outer, outer_not_done,
        (dist0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
        max_buckets)
    return DeltaSteppingResult(dist=dist, buckets_processed=outer_iters,
                               inner_steps=inner_total)


def _while(step, not_done, state, max_iter):
    def cond(carry):
        st, it = carry
        return jnp.logical_and(it < max_iter, not_done(st))

    def body(carry):
        st, it = carry
        return step(st), it + 1

    final, iters = jax.lax.while_loop(cond, body,
                                      (state, jnp.zeros((), jnp.int32)))
    return final, iters
