"""Pallas TPU kernels: segmented scan / sorted-segment reduction.

The hot op of every model is a sorted-segment reduction over the padded
edge arrays (pull-sum for PageRank, min-relax for SSSP/hop_dist, OR for
BFS).  XLA's scatter serializes on duplicate indices on TPU (measured
~40 ms for a 1.6M-edge segment_max — unusable), so this kernel computes a
**globally segmented inclusive scan** over the edge-value array instead:

* grid = sequential chunks of ``CHUNK`` edges, laid out ``[CHUNK//128, 128]``;
* in-chunk: two-phase Hillis-Steele segmented scan (lanes via ``pltpu.roll``
  + masked combine, then a sublane-level scan of row totals);
* cross-chunk: the trailing open segment's value and id carry over in SMEM
  scratch (TPU grids execute sequentially);
* segment boundaries come from the sorted id array itself
  (``ids[i] != ids[i-1]``), so no offsets are needed inside the kernel.

The caller then reads each segment's total with a dense XLA *gather* at
``offsets[v+1]-1`` — bandwidth-speed, no scatter anywhere.  Precision: the
scan value never exceeds one segment's running total (unlike a global
cumsum), so float32 sums have row-local rounding — the same error class as
the reference's sequential per-row accumulation in
``gm_cpp_gen_foreach.cc`` loops.

Supported ops: add, min, max on int32/float32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBS = 256                # sublane rows per chunk
CHUNK = SUBS * LANES      # 32768 edges per grid step

_OPS = {
    "add": (jnp.add, lambda dt: jnp.zeros((), dt)),
    "min": (jnp.minimum,
            lambda dt: jnp.asarray(
                jnp.iinfo(dt).max if jnp.issubdtype(dt, jnp.integer)
                else jnp.inf, dt)),
    "max": (jnp.maximum,
            lambda dt: jnp.asarray(
                jnp.iinfo(dt).min if jnp.issubdtype(dt, jnp.integer)
                else -jnp.inf, dt)),
}


def _seg_scan_kernel(vals_ref, ids_ref, out_ref, carry_val, carry_id,
                     *, op_name: str, dtype):
    """One CHUNK: segmented inclusive scan with cross-chunk carry."""
    op, ident_fn = _OPS[op_name]
    ident = ident_fn(dtype)

    v = vals_ref[:]                       # [SUBS, LANES]
    ids = ids_ref[:]                      # [SUBS, LANES] int32

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_val[0] = ident
        carry_id[0] = jnp.int32(-1)

    # --- segment-start flags from id changes (row-major order) ----------
    # prev in flattened row-major order: lane c>0 -> (r, c-1); lane 0 ->
    # (r-1, 127); (0, 0) -> carry_id.  Built from two rolls (Mosaic has no
    # cross-layout concats of lane-sliced columns).
    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 1)
    row_ix2 = jax.lax.broadcasted_iota(jnp.int32, (SUBS, LANES), 0)
    p_lane = pltpu.roll(ids, 1, axis=1)               # (r,0) <- ids[r,127]
    p_both = pltpu.roll(p_lane, 1, axis=0)            # (r,0) <- ids[r-1,127]
    prev_id = jnp.where(lane_ix == 0, p_both, p_lane)
    prev_id = jnp.where((lane_ix == 0) & (row_ix2 == 0), carry_id[0],
                        prev_id)
    # int32 flags (Mosaic cannot rotate i1 vectors)
    flags = (prev_id != ids).astype(jnp.int32)         # [SUBS, LANES]

    # --- phase A: segmented Hillis-Steele along lanes -------------------
    fv = v
    ff = flags
    shift = 1
    while shift < LANES:
        sv = pltpu.roll(fv, shift, axis=1)
        sf = pltpu.roll(ff, shift, axis=1)
        valid = lane_ix >= shift
        sv = jnp.where(valid, sv, ident)
        sf = jnp.where(valid, sf, 0)
        fv = jnp.where(ff > 0, fv, op(sv, fv))
        ff = ff | sf
        shift *= 2
    # fv[r,c]: scan within row; ff[r,c]: prefix-OR of flags within row.

    # --- phase B: row carries (trailing open-segment totals) ------------
    # Extract the last lane of each row via a masked reduction (keeps an
    # offset-0 layout; direct column slices carry lane offset 127, which
    # Mosaic cannot concat/shift).
    last = lane_ix == LANES - 1
    zero = jnp.zeros((), dtype)
    t = jnp.sum(jnp.where(last, fv, zero), axis=1, keepdims=True)
    fr = jnp.sum(jnp.where(last, ff, 0), axis=1, keepdims=True)
    # inject global carry into row 0's trailing total if row 0 is open
    row_ix = jax.lax.broadcasted_iota(jnp.int32, (SUBS, 1), 0)
    t = jnp.where((row_ix == 0) & (fr == 0), op(carry_val[0], t), t)
    st, sf2 = t, fr
    shift = 1
    while shift < SUBS:
        pv = jnp.concatenate(
            [jnp.full((shift, 1), ident, dtype), st[:-shift]], axis=0)
        pf = jnp.concatenate(
            [jnp.zeros((shift, 1), jnp.int32), sf2[:-shift]], axis=0)
        st = jnp.where(sf2 > 0, st, op(pv, st))
        sf2 = sf2 | pf
        shift *= 2
    # exclusive carry into each row r: S[r-1]; row 0 gets the global carry
    carry_rows = jnp.concatenate(
        [jnp.full((1, 1), carry_val[0], dtype), st[:-1]], axis=0)

    # --- apply row carry to each row's leading open segment -------------
    out = jnp.where(ff > 0, fv, op(carry_rows, fv))
    out_ref[:] = out

    # --- cross-chunk carry (single-element masked reductions) -----------
    tail = (row_ix2 == SUBS - 1) & (lane_ix == LANES - 1)
    carry_val[0] = jnp.sum(jnp.where(tail, out, zero))
    carry_id[0] = jnp.sum(jnp.where(tail, ids, 0))


@functools.partial(jax.jit,
                   static_argnames=("op", "interpret"))
def segmented_scan(vals: jax.Array, ids: jax.Array, op: str = "add",
                   interpret: Optional[bool] = None) -> jax.Array:
    """Globally segmented inclusive scan of ``vals`` with sorted ``ids``.

    ``vals``/``ids``: [E_tot] with E_tot a multiple of CHUNK (pad with
    identity values and a fresh id, e.g. -2).  Returns the scan, same
    shape.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e_tot = vals.shape[0]
    assert e_tot % CHUNK == 0, e_tot
    n_chunks = e_tot // CHUNK
    dtype = vals.dtype
    v2 = vals.reshape(n_chunks * SUBS, LANES)
    i2 = ids.astype(jnp.int32).reshape(n_chunks * SUBS, LANES)

    kernel = functools.partial(_seg_scan_kernel, op_name=op, dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((SUBS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUBS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks * SUBS, LANES), dtype),
        scratch_shapes=[
            pltpu.SMEM((1,), dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(v2, i2)
    return out.reshape(e_tot)


def segment_reduce_sorted(vals: jax.Array, ids: jax.Array,
                          offsets: jax.Array, n_out: int, op: str = "add",
                          interpret: Optional[bool] = None) -> jax.Array:
    """Sorted-segment reduction: ``out[v] = op-reduce(vals[offsets[v]:offsets[v+1]])``.

    ``vals``/``ids``: [E_pad] edge-slot arrays (CSC or CSR order);
    ``offsets``: [N+1].  Empty segments get the op identity.  The heavy
    lifting is the Pallas segmented scan; the finish is an XLA gather at
    each segment's last slot.
    """
    _, ident_fn = _OPS[op]
    ident = ident_fn(vals.dtype)
    e_pad = vals.shape[0]
    e_tot = ((e_pad + CHUNK - 1) // CHUNK) * CHUNK
    if e_tot != e_pad:
        vals = jnp.pad(vals, (0, e_tot - e_pad), constant_values=ident)
        ids = jnp.pad(ids, (0, e_tot - e_pad), constant_values=-2)
    scan = segmented_scan(vals, ids, op=op, interpret=interpret)

    lo = offsets[:-1]
    hi = offsets[1:]
    out = scan[jnp.maximum(hi - 1, 0)]
    out = jnp.where(hi > lo, out, ident)
    pad = n_out - out.shape[0]
    if pad:
        out = jnp.pad(out, (0, pad), constant_values=ident)
    return out


# ---------------------------------------------------------------------------
# Plain prefix sum (cumsum) — MXU triangular matmuls, two-pass parallel
# ---------------------------------------------------------------------------
#
# XLA's cumsum lowering collapses at scale on TPU (measured 4.1 s for 69M
# int32), and a single-pass sequential-carry kernel serializes on the
# cross-chunk dependency (~36 us/chunk of latency).  This version is the
# classic two-pass scan: pass 1 reduces each chunk to its total (parallel
# grid, fully pipelined), the tiny total array is prefix-summed in XLA,
# and pass 2 recomputes chunk-local prefixes on the MXU and adds the
# chunk base — no inter-chunk dependency anywhere.
#
# Integer inputs stay exact: the f32 matmul only sees chunk-local sums
# (< 2^24 for 0/1 indicators); bases are added in the integer domain and
# may wrap mod 2^32, keeping offset *differences* exact.

CS_SUBS = 512
CS_CHUNK = CS_SUBS * LANES


def _cumsum_local_kernel(base_ref, v_ref, out_ref, *, is_int: bool):
    v = v_ref[:]
    vf = v.astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    upper = (lane <= lane2).astype(jnp.float32)          # [128,128]
    p = jnp.dot(vf, upper, preferred_element_type=jnp.float32)

    # cross-row prefix: strictly-lower-triangular matvec over row totals
    # (no vector reshapes — Mosaic rejects (g,128)->(SUBS,1) shape casts)
    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (CS_SUBS, LANES), 1)
    t = jnp.sum(jnp.where(lane_ix == LANES - 1, p, 0.0), axis=1,
                keepdims=True)                           # [SUBS,1]
    srow = jax.lax.broadcasted_iota(jnp.int32, (CS_SUBS, CS_SUBS), 0)
    scol = jax.lax.broadcasted_iota(jnp.int32, (CS_SUBS, CS_SUBS), 1)
    low = (scol < srow).astype(jnp.float32)
    row_base = jnp.dot(low, t, preferred_element_type=jnp.float32)

    local = p + row_base
    b = base_ref[pl.program_id(0)]
    if is_int:
        out_ref[:] = local.astype(v.dtype) + b
    else:
        out_ref[:] = local + b


@functools.partial(jax.jit, static_argnames=("interpret",))
def plain_cumsum(vals: jax.Array,
                 interpret: Optional[bool] = None) -> jax.Array:
    """Inclusive prefix sum of a 1-D array at HBM bandwidth.

    Exact for int32 inputs whose chunk-local sums stay below 2^24 (always
    true for 0/1 edge indicators; the global prefix may wrap mod 2^32,
    which keeps offset differences exact).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = vals.shape[0]
    n_tot = ((n + CS_CHUNK - 1) // CS_CHUNK) * CS_CHUNK
    v = vals
    if n_tot != n:
        v = jnp.pad(v, (0, n_tot - n))
    is_int = jnp.issubdtype(v.dtype, jnp.integer)
    v2 = v.reshape(-1, LANES)
    n_chunks = v2.shape[0] // CS_SUBS

    # chunk totals + exclusive bases (plain XLA reduction — fast; only the
    # *scan* lowering is pathological in XLA, reductions are fine)
    totals = v.reshape(n_chunks, CS_CHUNK).sum(axis=1)
    base = jnp.concatenate(
        [jnp.zeros((1,), v.dtype), jnp.cumsum(totals[:-1])])

    kernel = functools.partial(_cumsum_local_kernel, is_int=is_int)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((CS_SUBS, LANES), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CS_SUBS, LANES), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(v2.shape, v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(base, v2)
    return out.reshape(n_tot)[:n]
