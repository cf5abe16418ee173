"""Scatter-free sorted-segment reductions via prefix sums.

XLA's scatter on TPU serializes on duplicate indices (measured ~40ms for a
1.6M-edge ``segment_max`` vs ~0.1ms for a gather of the same size), so none
of the hot edge maps can go through ``jax.ops.segment_*`` on TPU.  Because
our CSC/CSR slot arrays are sorted by segment (destination resp. source),
every segment is a contiguous run ``[begin[v], begin[v+1])`` and a segment
reduction is expressible with *dense* bandwidth-speed primitives:

    c = exclusive_cumsum(vals)          # one pass over E
    out[v] = c[begin[v+1]] - c[begin[v]]  # two gathers over N

This module provides that path for **invertible** ops (integer/bool sums,
counts, OR/ANY via sum>0).  It is *exact* for integers; for float32 sums the
global prefix magnitude would swamp small addends, so float sums and
min/max reductions use the Pallas segmented-scan kernel
(``ops.pallas_kernels``) instead — this module is also their reference
implementation for tests.

Cost model (v5e, ~800 GB/s HBM): gather+cumsum+diff is ~20 B/edge, i.e.
~1.7 ms per sweep of a 69M-edge graph — the per-superstep floor for dense
pull kernels until the fused Pallas path (~12 B/edge) lands.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.csr import Graph


def segment_sum_by_offsets(vals: jax.Array, offsets: jax.Array,
                           n_out: int) -> jax.Array:
    """Sum of sorted-run segments: ``out[v] = sum(vals[offsets[v]:offsets[v+1]])``.

    ``vals``: [E_pad] — entries beyond ``offsets[-1]`` are ignored (the
    prefix is only ever evaluated at offsets).  Exact for integer dtypes;
    for float32 prefer the Pallas row-sum kernel (precision).
    """
    if jax.default_backend() == "tpu":
        # XLA's scan lowering is pathological at scale on TPU (4.1 s for
        # 69M int32); the two-pass MXU kernel runs at bandwidth.
        from . import pallas_kernels
        c = pallas_kernels.plain_cumsum(vals)
    else:
        c = jnp.cumsum(vals)
    ex = jnp.concatenate([jnp.zeros((1,), c.dtype), c])  # exclusive prefix
    lo = ex[offsets[:-1]]
    hi = ex[offsets[1:]]
    out = hi - lo
    pad = n_out - out.shape[0]
    if pad:
        out = jnp.pad(out, (0, pad))
    return out


def in_nbr_count_true(g: Graph, node_mask_vals: jax.Array) -> jax.Array:
    """[N_pad] int32 — per node, number of in-neighbors w with
    ``node_mask_vals[w]`` true.  Exact (integer cumsum)."""
    vals = node_mask_vals[g.r_node_idx].astype(jnp.int32)
    return segment_sum_by_offsets(vals, g.r_begin, g.n_pad)


def in_nbr_any_fast(g: Graph, node_mask_vals: jax.Array) -> jax.Array:
    """Scatter-free ``Exist(w: v.InNbrs){ mask[w] }``: OR as sum>0."""
    return in_nbr_count_true(g, node_mask_vals) > 0


def out_nbr_count_true(g: Graph, node_mask_vals: jax.Array) -> jax.Array:
    vals = node_mask_vals[g.node_idx].astype(jnp.int32)
    return segment_sum_by_offsets(vals, g.begin, g.n_pad)


def out_nbr_any_fast(g: Graph, node_mask_vals: jax.Array) -> jax.Array:
    return out_nbr_count_true(g, node_mask_vals) > 0


def in_nbr_sum_int(g: Graph, node_vals: jax.Array,
                   edge_vals: Optional[jax.Array] = None) -> jax.Array:
    """Exact integer pull-sum over in-edges (int32/int64 vals)."""
    x = node_vals[g.r_node_idx]
    if edge_vals is not None:
        x = x * edge_vals[g.e_rev2idx]
    return segment_sum_by_offsets(x, g.r_begin, g.n_pad)
