"""Pallas segmented-scan kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from green_marl_tpu.ops import pallas_kernels as pk


def seg_scan_np(vals, ids, op):
    out = np.empty_like(vals)
    for i in range(len(vals)):
        if i == 0 or ids[i] != ids[i - 1]:
            out[i] = vals[i]
        else:
            out[i] = op(out[i - 1], vals[i])
    return out


def make_case(e, n_segs, seed, dtype):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.integers(0, n_segs, e)).astype(np.int32)
    if dtype == np.float32:
        vals = rng.random(e).astype(np.float32)
    else:
        vals = rng.integers(-100, 100, e).astype(np.int32)
    return vals, ids


@pytest.mark.parametrize("op,npop", [("add", np.add), ("min", np.minimum),
                                     ("max", np.maximum)])
@pytest.mark.parametrize("nchunks", [1, 3])
def test_segmented_scan(op, npop, nchunks):
    e = pk.CHUNK * nchunks
    vals, ids = make_case(e, 57, seed=0, dtype=np.int32)
    got = np.asarray(pk.segmented_scan(
        jnp.asarray(vals), jnp.asarray(ids), op=op, interpret=True))
    want = seg_scan_np(vals, ids, npop)
    assert (got == want).all()


def test_segmented_scan_float():
    e = pk.CHUNK * 2
    vals, ids = make_case(e, 91, seed=1, dtype=np.float32)
    got = np.asarray(pk.segmented_scan(
        jnp.asarray(vals), jnp.asarray(ids), op="add", interpret=True))
    want = seg_scan_np(vals, ids, np.add)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_segment_boundaries_at_chunk_edges():
    # one segment spanning an entire chunk boundary, another exactly at it
    e = pk.CHUNK * 2
    ids = np.zeros(e, np.int32)
    ids[pk.CHUNK + 5:] = 1
    vals = np.ones(e, np.int32)
    got = np.asarray(pk.segmented_scan(
        jnp.asarray(vals), jnp.asarray(ids), op="add", interpret=True))
    want = seg_scan_np(vals, ids, np.add)
    assert (got == want).all()


@pytest.mark.parametrize("op,red", [("add", np.add.reduceat),
                                    ("min", np.minimum.reduceat),
                                    ("max", np.maximum.reduceat)])
def test_segment_reduce_sorted(op, red):
    rng = np.random.default_rng(3)
    n = 300
    e = 5000
    ids = np.sort(rng.integers(0, n, e)).astype(np.int32)
    vals = rng.integers(-50, 50, e).astype(np.int32)
    counts = np.bincount(ids, minlength=n)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    # pad edge arrays to LANE like the Graph does
    e_pad = ((e + 127) // 128) * 128
    vals_p = np.zeros(e_pad, vals.dtype)
    vals_p[:e] = vals
    ids_p = np.full(e_pad, n, np.int32)
    ids_p[:e] = ids
    got = np.asarray(pk.segment_reduce_sorted(
        jnp.asarray(vals_p), jnp.asarray(ids_p), jnp.asarray(offsets),
        n_out=n + 128, op=op, interpret=True))
    ident = {"add": 0, "min": np.iinfo(np.int32).max,
             "max": np.iinfo(np.int32).min}[op]
    want = np.full(n, ident, np.int64)
    nonempty = counts > 0
    want[nonempty] = red(vals, offsets[:-1][nonempty])[
        : nonempty.sum()] if op == "add" else want[nonempty]
    # reduceat semantics are awkward for empty segments; recompute directly
    for v in range(n):
        if counts[v]:
            seg = vals[offsets[v]:offsets[v + 1]]
            want[v] = seg.sum() if op == "add" else (
                seg.min() if op == "min" else seg.max())
    assert (got[:n] == want).all()
    assert (got[n:] == ident).all()
