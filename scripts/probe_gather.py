"""Probe: which gather formulations run at bandwidth on this TPU?

Decides the architecture of the fused edge-map kernel (VERDICT r1 item #1).
Full output is consumed (summed into the carry) so nothing is DCE'd; ITER
dependent sweeps per jit call amortize the ~112ms axon dispatch tax.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 16_000_000
N = 1_000_000
ITER = 8

rng = np.random.default_rng(0)
idx_np = rng.integers(0, N, E).astype(np.int32)
x_np = rng.random(N).astype(np.float32)

idx = jax.device_put(jnp.asarray(idx_np))
idx_sorted = jax.device_put(jnp.sort(jnp.asarray(idx_np)))
x = jax.device_put(jnp.asarray(x_np))


def timeit(name, fn, *args, bytes_per_iter=E * 8):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as ex:  # noqa
        msg = str(ex).splitlines()[0][:200]
        print(f"{name:36s} FAILED: {type(ex).__name__} {msg}")
        return None
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / ITER
    gbs = bytes_per_iter / dt / 1e9
    print(f"{name:36s} {dt*1e3:8.2f} ms/sweep  {gbs:8.1f} GB/s")
    return dt


def chain(body):
    """ITER dependent sweeps; FULL output consumed via sum into carry."""
    @jax.jit
    def run(x, idx):
        def step(i, x):
            out = body(x, idx)
            return x + jnp.sum(out).astype(x.dtype) * 1e-30
        return jax.lax.fori_loop(0, ITER, step, x)
    return run


timeit("xla gather random", chain(lambda x, i: x[i]), x, idx)
timeit("xla gather sorted", chain(lambda x, i: x[i]), x, idx_sorted)
timeit("xla take sorted-hint",
       chain(lambda x, i: jnp.take(x, i, indices_are_sorted=True)),
       x, idx_sorted)

# row gather from [N/8, 128] table (batched analog): same out bytes
B = 128
E_row = E // B
N_row = N // 8
x2 = jax.device_put(jnp.asarray(rng.random((N_row, B)).astype(np.float32)))
idx2 = jax.device_put(jnp.asarray(
    rng.integers(0, N_row, E_row).astype(np.int32)))
timeit("xla row gather [*,128] random", chain(lambda x, i: x[i]), x2, idx2,
       bytes_per_iter=E_row * (B * 4 + 4))

# ---------------------------------------------------------------------------
# Pallas in-kernel gather probes: table slice resident in VMEM
# ---------------------------------------------------------------------------
TBL = 512 * 1024     # 2 MB f32 table window
CHUNK_S, LANES = 256, 128
CHUNK = CHUNK_S * LANES

idx_small = jax.device_put(jnp.asarray(
    rng.integers(0, TBL, E).astype(np.int32)))
x_small = jax.device_put(
    jnp.asarray(rng.random(TBL).astype(np.float32)))


def mk_pallas(kern, tbl_rows):
    @jax.jit
    def f(tbl, idx):
        n_chunks = idx.shape[0] // CHUNK
        return pl.pallas_call(
            kern,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((tbl_rows, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK_S, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK_S, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_chunks * CHUNK_S, LANES),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(tbl.reshape(tbl_rows, LANES), idx.reshape(-1, LANES))
    return f


# A. take_along_axis along sublanes (axis=0): out[i,j] = t[r[i,j], j]
def kern_sub(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[:]
    r = idx_ref[:] >> 7          # pretend row index
    r = jnp.clip(r, 0, t.shape[0] - 1)
    out_ref[:] = jnp.take_along_axis(t, r, axis=0)

# B. take_along_axis along lanes (axis=1) on a same-shape array
def kern_lane(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[:]
    l = idx_ref[:] & 127
    c = t[:CHUNK_S, :]           # same shape as idx block
    out_ref[:] = jnp.take_along_axis(c, l, axis=1)

# C. composed full gather: row gather then lane shuffle (incorrect values,
#    probes lowering + speed of the composition)
def kern_full(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[:]
    ids = idx_ref[:]
    r = jnp.clip(ids >> 7, 0, t.shape[0] - 1)
    l = ids & 127
    rows = jnp.take_along_axis(t, r, axis=0)
    out_ref[:] = jnp.take_along_axis(rows, l, axis=1)

TBL_ROWS = TBL // LANES
for name, kern in [("pallas sublane t_a_a axis=0", kern_sub),
                   ("pallas lane t_a_a axis=1", kern_lane),
                   ("pallas composed 2-axis", kern_full)]:
    f = mk_pallas(kern, TBL_ROWS)
    timeit(name, chain(lambda x, i, f=f: f(x_small, i)), x_small, idx_small)

print("done")
