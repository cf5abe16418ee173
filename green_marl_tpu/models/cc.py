"""Connected components.

``weak_cc``: weakly-connected components by min-label propagation over both
edge directions until fixpoint — the device-friendly replacement for the
reference's sequential SCC drivers where only undirected connectivity is
needed (e.g. communities.gm's label propagation skeleton).

Strongly-connected components (replacing kosaraju.gm / tarjan_scc.gm) live
in ``models.scc``; component ids everywhere are canonicalized to the
minimum member node id so outputs are deterministic and comparable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..engine.superstep import while_loop
from ..graph.csr import Graph
from ..ops import segment as ops


class CCResult(NamedTuple):
    comp: jax.Array        # [N_pad] component label = min node id in comp
    iterations: jax.Array


@partial(jax.jit, static_argnames=("max_iter",))
def weak_cc(g: Graph, max_iter: int | None = None) -> CCResult:
    if max_iter is None:
        max_iter = g.num_nodes + 1
    n_pad = g.n_pad
    mask = g.node_mask()
    ids = jnp.arange(n_pad, dtype=jnp.int32)
    sent = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
    comp0 = jnp.where(mask, ids, sent)

    def step(state):
        comp, _ = state
        # min over in-neighbors and out-neighbors (undirected closure)
        from_in = ops.sorted_segment_reduce(
            comp[g.r_node_idx], g.r_node_idx_dst, g.r_begin, n_pad, "min")
        from_out = ops.sorted_segment_reduce(
            comp[g.node_idx], g.node_idx_src, g.begin, n_pad, "min")
        new = jnp.minimum(comp, jnp.minimum(from_in, from_out))
        changed = jnp.any(new < comp)
        return new, changed

    def not_done(state):
        return state[1]

    (comp, _), stats = while_loop(
        step, not_done, (comp0, jnp.asarray(True)), max_iter)
    return CCResult(comp=jnp.where(mask, comp, -1),
                    iterations=stats.iterations)


def weak_cc_np(begin, node_idx):
    import numpy as np
    begin = np.asarray(begin)
    node_idx = np.asarray(node_idx)
    N = begin.shape[0] - 1
    deg = np.diff(begin)
    src = np.repeat(np.arange(N), deg)
    dst = node_idx[: src.shape[0]]
    comp = np.arange(N)
    changed = True
    while changed:
        new = comp.copy()
        np.minimum.at(new, dst, comp[src])
        np.minimum.at(new, src, comp[dst])
        changed = bool((new < comp).any())
        comp = new
    return comp
