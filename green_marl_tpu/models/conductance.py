"""Conductance of a cut (``apps/src/conduct.gm:1-16``).

.. code-block:: none

    Din   = Sum(u)(u.member == num){ u.Degree() };
    Dout  = Sum(u)(u.member != num){ u.Degree() };
    Cross = Sum(u)(u.member == num){ Count(j: u.Nbrs)(j.member != num) };
    m = min(Din, Dout);  return m == 0 ? (Cross==0 ? 0 : INF) : Cross/m;

Pure masked reductions — a single fused device program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.csr import Graph
from ..ops import segment as ops


@jax.jit
def conductance(g: Graph, member: jax.Array, num) -> jax.Array:
    """``member``: [N_pad] int labels; returns float32 conductance of the
    cut between ``member == num`` and the rest."""
    mask = g.node_mask()
    inside = (member == num) & mask
    deg = g.out_degree().astype(jnp.int64)
    din = jnp.sum(jnp.where(inside, deg, 0))
    dout = jnp.sum(jnp.where(mask & ~inside, deg, 0))
    # Count(j: u.Nbrs)(j.member != num) summed over inside u:
    # edge (u -> j) contributes when inside[u] & ~inside[j].
    src_in = inside[g.node_idx_src]
    dst_out = ~inside[g.node_idx] & (g.node_idx < g.num_nodes)
    cross = jnp.sum((src_in & dst_out).astype(jnp.int64))
    m = jnp.minimum(din, dout).astype(jnp.float32)
    return jnp.where(
        m == 0,
        jnp.where(cross == 0, 0.0, jnp.inf),
        cross.astype(jnp.float32) / jnp.maximum(m, 1.0))
