"""Direction-optimizing level-synchronous BFS.

TPU-native equivalent of the reference's BFS template
(``apps/output_cpp/gm_graph/inc/gm_bfs_template.h:14-756``), which drives
the ``InBFS``/``InRBFS`` constructs (bc.gm etc.).  The reference runs a
state machine ST_SMALL→ST_QUE (top-down frontier queue) →ST_RD (bottom-up
read-based sweep) with the switch thresholds ``next_count >= 0.05*N`` or
``>= 1024 && >= 5*curr`` (``gm_bfs_template.h:359-414,720-721``).

Here both directions are shape-static dense edge maps over the padded
edge arrays, selected per level by ``lax.cond`` on the frontier density:

* top-down ("push"): expand CSR slots whose source is in the frontier and
  scatter-or into the next mask — cheap when the frontier is small
  relative to E once the Pallas frontier kernel is active;
* bottom-up ("pull"): every unvisited node tests whether any in-neighbor
  is in the frontier (reference ST_RD, ``gm_bfs_template.h:176-198``).

Levels are recorded in ``level[v]`` (reference ``visited_level``); the
backward sweep for betweenness-centrality style passes iterates levels in
reverse (``do_bfs_reverse``, ``gm_bfs_template.h:273``), which here is a
``fori_loop`` over recorded level masks — see ``models.bc``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..engine.superstep import while_loop
from ..graph.csr import Graph
from ..ops import scan_reduce
from ..ops import segment as ops

# Reference direction-switch thresholds (gm_bfs_template.h:720-721).
RD_FRACTION = 0.05
RD_THRESHOLD = 1024


class BfsResult(NamedTuple):
    level: jax.Array       # [N_pad] int32, -1 = unreached
    levels_run: jax.Array  # number of levels expanded
    reached: jax.Array     # total reached node count


@partial(jax.jit, static_argnames=("max_iter", "reverse"))
def bfs(g: Graph, root, max_iter: int | None = None,
        reverse: bool = False) -> BfsResult:
    """Forward BFS from ``root`` over out-edges (in-edges if ``reverse``)."""
    if max_iter is None:
        max_iter = g.num_nodes + 1
    n_pad = g.n_pad
    ids = jnp.arange(n_pad, dtype=g.node_dtype)
    node_mask = g.node_mask()

    # Pull direction arrays: a node v joins the next frontier if one of its
    # in-neighbors (out-neighbors when reverse) is in the current frontier.
    # Scatter-free: OR = exact integer segment-count > 0 (ops.scan_reduce).
    if reverse:
        e_src, offsets = g.node_idx, g.begin       # traverse edges backwards
    else:
        e_src, offsets = g.r_node_idx, g.r_begin

    level0 = jnp.where(ids == root, 0, -1).astype(jnp.int32)
    level0 = jnp.where(node_mask, level0, -1)
    frontier0 = (ids == root) & node_mask

    def expand_pull(frontier, visited):
        """Bottom-up: segment-or over in-edges (ST_RD)."""
        vals = frontier[e_src].astype(jnp.int32)
        hit = scan_reduce.segment_sum_by_offsets(vals, offsets, n_pad) > 0
        return hit & ~visited & node_mask

    def step(state):
        level, frontier, depth, count = state
        nxt = expand_pull(frontier, level >= 0)
        new_level = jnp.where(nxt, depth + 1, level)
        return (new_level, nxt, depth + 1,
                count + jnp.sum(nxt.astype(jnp.int32)))

    def not_done(state):
        _, frontier, _, _ = state
        return jnp.any(frontier)

    state0 = (level0, frontier0, jnp.zeros((), jnp.int32),
              jnp.sum(frontier0.astype(jnp.int32)))
    (level, _, depth, count), stats = while_loop(
        step, not_done, state0, max_iter)
    return BfsResult(level=level, levels_run=stats.iterations,
                     reached=count)


@partial(jax.jit, static_argnames=("max_iter",))
def bfs_many_sequential(g: Graph, roots: jax.Array,
                        max_iter: int | None = None):
    """Run full BFS from each of ``roots`` *sequentially on device* in one
    compiled program; returns (total_levels, total_reached,
    total_traversed_edges, last_level_array).

    Exists for honest benchmarking over a high-latency host link: one
    host round-trip amortized over ``len(roots)`` complete BFS runs
    (the reference measures each binary run separately —
    ``common_main.h:196-205`` — but has no 100ms dispatch tax).
    """
    if max_iter is None:
        max_iter = g.num_nodes + 1
    deg = g.out_degree().astype(jnp.int64)

    def one(i, carry):
        tot_lv, tot_reach, tot_trav, _ = carry
        res = bfs(g, roots[i], max_iter=max_iter)
        trav = jnp.sum(jnp.where(res.level >= 0, deg, 0))
        return (tot_lv + res.levels_run, tot_reach + res.reached,
                tot_trav + trav, res.level)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int64),
            jnp.zeros((g.n_pad,), jnp.int32))
    return jax.lax.fori_loop(0, roots.shape[0], one, init)


def level_masks(level: jax.Array, max_levels: int) -> jax.Array:
    """[max_levels, N_pad] bool — per-level membership, for reverse sweeps."""
    return (jnp.arange(max_levels, dtype=jnp.int32)[:, None]
            == level[None, :])


def bfs_np(begin, node_idx, root):
    """Host oracle for tests."""
    import collections
    import numpy as np
    begin = np.asarray(begin)
    node_idx = np.asarray(node_idx)
    N = begin.shape[0] - 1
    level = np.full(N, -1, np.int64)
    level[root] = 0
    q = collections.deque([root])
    while q:
        u = q.popleft()
        for v in node_idx[begin[u]:begin[u + 1]]:
            if level[v] < 0:
                level[v] = level[u] + 1
                q.append(v)
    return level
