"""hop_dist — level-synchronous BFS distances (``apps/src/hop_dist.gm:1-28``).

Identical to SSSP with unit edge weights; see ``models.relax`` for the
superstep.  Output protocol parity: ``dist[i]`` printed by the CLI matches
the reference golden (root distance 0, its out-neighbors 1 —
``scripts/extract_result.py:50-61``).  Unreached nodes keep +INF
(``INT_MAX`` in the reference's Int dist).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.csr import Graph
from .relax import RelaxResult, min_relax


@partial(jax.jit, static_argnames=("max_iter",))
def hop_dist(g: Graph, root, max_iter: int | None = None) -> RelaxResult:
    return min_relax(g, root, edge_len=None, max_iter=max_iter,
                     dist_dtype=jnp.int32)
