"""SSSP — Bellman-Ford relaxation (``apps/src/sssp.gm:1-28``).

The priority-queue variants (sssp_dijkstra.gm / bidir_dijkstra.gm, built on
``gm_mutatable_priority_map.h``) have no device-friendly equivalent; per
SURVEY.md §7 they are reformulated as delta-stepping/Bellman-Ford —
``sssp`` here converges to the same distances for non-negative weights.
``models.delta_stepping`` provides the bucketed work-efficient variant.

``dijkstra_host_exact`` additionally replicates ``sssp_dijkstra.gm``'s
sequential pop-min loop STEP FOR STEP on the host over the
pop-order-exact ``runtime.priority_map`` replica — Parent/ParentEdge
trees match the reference binary's tie-breaks exactly, closing the
PARITY.md row-46 caveat for users who need them (the device paths keep
the argmin tie-break, documented)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph
from .relax import RelaxResult, min_relax


@partial(jax.jit, static_argnames=("max_iter",))
def sssp(g: Graph, root, edge_len: jax.Array,
         max_iter: int | None = None) -> RelaxResult:
    """``edge_len``: [E_pad] weights in CSR slot order (``e.len``)."""
    return min_relax(g, root, edge_len=edge_len, max_iter=max_iter,
                     dist_dtype=jnp.int32)


def dijkstra_host_exact(g: Graph, edge_len, root: int, dest: int):
    """``apps/src/sssp_dijkstra.gm:1-54`` transliterated over the
    pop-order-exact priority-map replica.

    The reference's compiled loop is: ``GetMinKey`` -> compare with
    dest -> mark Reached -> read ``Reachable[next]`` -> ``Remove(next)``
    (compiler-rewritten to ``RemoveMin``,
    ``gm_cpp_opt_select_map_implementation.cc:171-204``) -> relax the
    semi-sorted neighbor list in CSR slot order.  Because
    ``runtime.priority_map.MutatablePriorityMap`` reproduces
    ``gm_mutatable_priority_map_unordered_min``'s heap pop-for-pop
    (tests/test_priority_map.py proves bit-exactness against a driver
    compiled from the reference header), the Parent/ParentEdge trees
    here carry the reference binary's EXACT tie-breaks.

    Host-sequential by nature (the reference's loop is, too); use
    ``sssp``/``lang.lower_priority`` device paths at scale.

    Returns (found, parent[N], parent_edge[N], dist_at_dest) with NIL
    encoded as -1; ``dist_at_dest`` is -1 when unreachable.
    """
    from ..runtime.priority_map import MutatablePriorityMap

    begin = np.asarray(g.begin)
    node_idx = np.asarray(g.node_idx)[: g.num_edges]
    lens = np.asarray(edge_len)[: g.num_edges]
    n = g.num_nodes
    parent = np.full(n, -1, np.int32)
    parent_edge = np.full(n, -1, np.int32)
    reached = np.zeros(n, bool)

    m: MutatablePriorityMap[int, int] = MutatablePriorityMap(0)
    m.set_value(int(root), 0)
    found = failed = False
    while not found and not failed:
        if m.size() == 0:
            failed = True
        else:
            nxt = m.peek_key()
            if nxt == dest:
                found = True
            else:
                reached[nxt] = True
                dist = m.get_value(nxt)
                m.remove_root()
                for slot in range(begin[nxt], begin[nxt + 1]):
                    v = int(node_idx[slot])
                    if reached[v]:
                        continue
                    relax = dist + int(lens[slot])
                    if not m.has_key(v):
                        m.set_value(v, relax)
                        parent[v] = nxt
                        parent_edge[v] = slot
                    elif m.get_value(v) > relax:
                        m.set_value(v, relax)
                        parent[v] = nxt
                        parent_edge[v] = slot
    dist_dest = m.get_value(int(dest)) if found else -1
    return (not failed), parent, parent_edge, dist_dest
