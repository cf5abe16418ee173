"""Probe 3: TRUE device timings (scalar fetch sync, per-call distinct args)
for gather primitives, plus dynamic_gather axis=0 shape support matrix.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 16_000_000
N = 1_000_000
ITER = 8
K = 3

rng = np.random.default_rng(0)

_fetch_base = None


def fetch_baseline():
    global _fetch_base
    if _fetch_base is None:
        x = jnp.zeros((), jnp.float32)
        float(x)
        t0 = time.time()
        for _ in range(5):
            float(x + 1.0)
        _fetch_base = (time.time() - t0) / 5
    return _fetch_base


def bench(name, fn, inputs, bytes_per_sweep):
    """fn returns a scalar; inputs: list of K arg tuples (distinct)."""
    try:
        float(fn(*inputs[0]))  # compile+warm
    except Exception as ex:  # noqa
        lines = str(ex).splitlines() or ["?"]
        print(f"{name:36s} FAILED: {type(ex).__name__} {lines[0][:120]}")
        return None
    base = fetch_baseline()
    ts = []
    for k in range(1, K):
        t0 = time.time()
        float(fn(*inputs[k]))
        ts.append((time.time() - t0 - base) / ITER)
    dt = float(np.median(ts))
    print(f"{name:36s} {dt*1e3:8.3f} ms/sweep  "
          f"{bytes_per_sweep/dt/1e9:7.1f} GB/s")
    return dt


def chain(body):
    @jax.jit
    def run(x, idx):
        def step(i, x):
            out = body(x, idx)
            return x + jnp.sum(out).astype(x.dtype) * 1e-30
        x = jax.lax.fori_loop(0, ITER, step, x)
        return jnp.sum(x)
    return run


# ---- A. XLA 1-D random gather --------------------------------------------
idx1 = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
xs = [jnp.asarray(rng.random(N).astype(np.float32)) for _ in range(K)]
bench("A xla 1d gather random", chain(lambda x, i: x[i]),
      [(x, idx1) for x in xs], E * 8)

# ---- B/C. XLA take_along_axis --------------------------------------------
R = E // 128
x2s = [jnp.asarray(rng.random((R, 128)).astype(np.float32))
       for _ in range(K)]
idxB = jnp.asarray(rng.integers(0, R, (R, 128)).astype(np.int32))
bench("B xla taa axis0 [R,128]",
      chain(lambda x, i: jnp.take_along_axis(x, i, axis=0)),
      [(x, idxB) for x in x2s], E * 8)
idxC = jnp.asarray(rng.integers(0, 128, (R, 128)).astype(np.int32))
bench("C xla taa axis1 [R,128]",
      chain(lambda x, i: jnp.take_along_axis(x, i, axis=1)),
      [(x, idxC) for x in x2s], E * 8)

# ---- G. XLA row gather -----------------------------------------------------
NR = N // 128
E_row = E // 128
xrs = [jnp.asarray(rng.random((NR, 128)).astype(np.float32))
       for _ in range(K)]
idxG = jnp.asarray(rng.integers(0, NR, E_row).astype(np.int32))
bench("G xla row gather 512B rows", chain(lambda x, i: x[i]),
      [(x, idxG) for x in xrs], E_row * (512 + 4))

# ---- P. Pallas dynamic_gather shape matrix --------------------------------
def mk_pallas(sub, axis, hi):
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    @jax.jit
    def f(x, idx):
        n_blocks = idx.shape[0] // sub
        return pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((sub, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sub, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((sub, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, idx)
    return f


for sub in (8, 64, 256, 1024):
    idxP = jnp.asarray(rng.integers(0, sub, (R, 128)).astype(np.int32))
    f = mk_pallas(sub, 0, sub)
    bench(f"P pallas dg axis0 sub={sub}",
          chain(lambda x, i, f=f: f(x, i)),
          [(x, idxP) for x in x2s], E * 8)

idxE = jnp.asarray(rng.integers(0, 128, (R, 128)).astype(np.int32))
fE = mk_pallas(1024, 1, 128)
bench("P pallas dg axis1 sub=1024",
      chain(lambda x, i, f=fE: f(x, i)),
      [(x, idxE) for x in x2s], E * 8)

print("done")
