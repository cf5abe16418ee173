"""24-bit transfer packing for node-id arrays.

The axon tunnel moves ~16-25 MB/s, so bulk int32 arrays whose values fit
24 bits (node ids, binned row ids — anything < 16.7M) ship 25% smaller:
4 values pack into 3 uint32 words on the host, one cheap vectorized
unpack runs on device.  Used by bench.py's transfer stage (round-3
verdict item 6: prep+transfer was 92 s for ~1.5 GB).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX24 = (1 << 24) - 1


def pack24(a: np.ndarray) -> np.ndarray:
    """[n] nonneg ints < 2^24  ->  [ceil(n/4)*3] uint32 words.

    PLANAR wire layout: the padded value array is split into four
    contiguous quarters q0..q3 and the three word planes are
    ``q0|q1<<24``, ``q1>>8|q2<<16``, ``q2>>16|q3<<8``, concatenated.
    The interleaved layout this replaces needed an [m, 3]-shaped view
    on device, which XLA materializes in (8, 128)-tiled form — the
    minor dim pads 3 -> 128, a 42x blowup (35 GB for the 1.1 GB
    triangle wide table, observed AOT OOM).  Planar unpacking is pure
    contiguous 1-D slices + a flat concatenate: no tiled small-minor
    intermediate exists at any size."""
    a = np.asarray(a)
    assert a.min(initial=0) >= 0 and a.max(initial=0) <= MAX24, \
        "pack24 range"
    n = a.shape[0]
    m = (n + 3) // 4
    v = np.zeros(m * 4, np.uint32)
    v[:n] = a.astype(np.uint32)
    q = v.reshape(4, m)
    w = np.empty(3 * m, np.uint32)
    w[:m] = q[0] | (q[1] << 24)
    w[m:2 * m] = (q[1] >> 8) | (q[2] << 16)
    w[2 * m:] = (q[2] >> 16) | (q[3] << 8)
    return w


def unpack24(w: jax.Array, n: int) -> jax.Array:
    """Device-side inverse of :func:`pack24` -> [n] int32.

    Contiguous 1-D slices only (see :func:`pack24` on why the layout
    is planar); the quarter concatenation restores flat order, so the
    <=3 pad values always sit at the tail and ``[:n]`` drops them."""
    m = w.shape[0] // 3
    w0, w1, w2 = w[:m], w[m:2 * m], w[2 * m:]
    v0 = w0 & MAX24
    v1 = ((w0 >> 24) | (w1 << 8)) & MAX24
    v2 = ((w1 >> 16) | (w2 << 16)) & MAX24
    v3 = (w2 >> 8) & MAX24
    out = jnp.concatenate([v0, v1, v2, v3])
    return out[:n].astype(jnp.int32)


def put_packed(a: np.ndarray, n: int | None = None) -> jax.Array:
    """Host->device transfer through the packed representation.

    N-d arrays are packed flat and restored to ``a.shape`` inside the
    same unpack jit (used for the triangle wide-hash table).  The
    packed staging buffer is explicitly ``delete()``d once the
    unpacked array materializes — on a 16 GB chip the staging copies of
    several O(E) arrays otherwise stack up and OOM later allocations
    (round-4 bench crash, VERDICT Weak #1)."""
    a = np.asarray(a)
    shape = a.shape
    flat = a.reshape(-1)
    if n is None:
        n = int(flat.shape[0])
    w = jax.device_put(pack24(flat))
    out = jax.jit(unpack24, static_argnames=("n",))(w, n)
    out.block_until_ready()
    w.delete()
    if len(shape) > 1:
        # SEPARATE jitted reshape: fusing it into the unpack jit makes
        # XLA materialize the [m, 3] word view in tiled layout (minor
        # dim padded 3 -> 128 = 42x memory, a 35 GB allocation for the
        # 1.1 GB triangle wide table — observed AOT OOM on-chip);
        # standalone, the flat unpack fuses and the flat -> [rows, 128]
        # reshape is tile-aligned.
        out2 = _reshape_dev(out, shape)
        out2.block_until_ready()
        out.delete()
        out = out2
    return out


@partial(jax.jit, static_argnames=("shape",))
def _reshape_dev(x, shape):
    return x.reshape(shape)


def csc_dst_from_offsets(r_begin: jax.Array, e_pad: int,
                         num_edges: int, sentinel: int) -> jax.Array:
    """Derive the CSC destination-per-slot array on DEVICE from the
    offsets alone (``repeat(arange(N), indeg)``) — saves shipping an
    O(E) array through the tunnel.  Pads get ``sentinel``."""
    n = r_begin.shape[0] - 1
    marks = jnp.zeros((e_pad,), jnp.int32).at[
        jnp.clip(r_begin[1:], 0, e_pad - 1)].add(
        jnp.where(r_begin[1:] < e_pad, 1, 0).astype(jnp.int32))
    dst = jnp.cumsum(marks)
    slots = jnp.arange(e_pad, dtype=jnp.int32)
    return jnp.where(slots < num_edges,
                     jnp.minimum(dst, n - 1).astype(jnp.int32),
                     jnp.asarray(sentinel, jnp.int32))
