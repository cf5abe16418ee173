"""SSSP — Bellman-Ford relaxation (``apps/src/sssp.gm:1-28``).

The priority-queue variants (sssp_dijkstra.gm / bidir_dijkstra.gm, built on
``gm_mutatable_priority_map.h``) have no device-friendly equivalent; per
SURVEY.md §7 they are reformulated as delta-stepping/Bellman-Ford —
``sssp`` here converges to the same distances for non-negative weights.
``models.delta_stepping`` provides the bucketed work-efficient variant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.csr import Graph
from .relax import RelaxResult, min_relax


@partial(jax.jit, static_argnames=("max_iter",))
def sssp(g: Graph, root, edge_len: jax.Array,
         max_iter: int | None = None) -> RelaxResult:
    """``edge_len``: [E_pad] weights in CSR slot order (``e.len``)."""
    return min_relax(g, root, edge_len=edge_len, max_iter=max_iter,
                     dist_dtype=jnp.int32)
