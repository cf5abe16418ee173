"""Probe 2: honest timings for gather primitives on v5e.

Anti-memoization: K distinct input buffers, each timed call uses a fresh
one; ITER chained sweeps inside one jit amortize dispatch (~112ms).
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


def bench(name, make_fn, inputs, bytes_per_sweep):
    """inputs: list of K arg-tuples. make_fn() -> jitted fn(x, idx)."""
    fn = make_fn
    try:
        jax.block_until_ready(fn(*inputs[0]))  # compile+warm
    except Exception as ex:  # noqa
        lines = str(ex).splitlines() or ["?"]
        print(f"{name:34s} FAILED: {type(ex).__name__} {lines[0][:140]}")
        return
    ts = []
    for k in range(1, K):
        t0 = time.time()
        jax.block_until_ready(fn(*inputs[k]))
        ts.append((time.time() - t0) / ITER)
    dt = float(np.median(ts))
    print(f"{name:34s} {dt*1e3:8.2f} ms/sweep  {bytes_per_sweep/dt/1e9:7.1f} GB/s")


def chain(body):
    @jax.jit
    def run(x, idx):
        def step(i, x):
            out = body(x, idx)
            return x + jnp.sum(out).astype(x.dtype) * 1e-30
        return jax.lax.fori_loop(0, ITER, step, x)
    return run


def chain2d(body):
    @jax.jit
    def run(x, idx):
        def step(i, x):
            out = body(x, idx)
            return x + jnp.sum(out).astype(x.dtype) * 1e-30
        return jax.lax.fori_loop(0, ITER, step, x)
    return run


# ---- A. XLA 1-D random gather --------------------------------------------
idx1 = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
xs = [jnp.asarray(rng.random(N).astype(np.float32)) for _ in range(K)]
bench("A xla 1d gather random", chain(lambda x, i: x[i]),
      [(x, idx1) for x in xs], E * 8)

# ---- B. XLA take_along_axis axis=0 same-shape ----------------------------
R = E // 128
x2s = [jnp.asarray(rng.random((R, 128)).astype(np.float32))
       for _ in range(K)]
idxB = jnp.asarray(rng.integers(0, R, (R, 128)).astype(np.int32))
bench("B xla taa axis0 [R,128]",
      chain2d(lambda x, i: jnp.take_along_axis(x, i, axis=0)),
      [(x, idxB) for x in x2s], E * 8)

# ---- C. XLA taa axis=1 (lane shuffle) ------------------------------------
idxC = jnp.asarray(rng.integers(0, 128, (R, 128)).astype(np.int32))
bench("C xla taa axis1 [R,128]",
      chain2d(lambda x, i: jnp.take_along_axis(x, i, axis=1)),
      [(x, idxC) for x in x2s], E * 8)

# ---- G. XLA row gather ----------------------------------------------------
NR = N // 128
E_row = E // 128
xrs = [jnp.asarray(rng.random((NR, 128)).astype(np.float32))
       for _ in range(K)]
idxG = jnp.asarray(rng.integers(0, NR, E_row).astype(np.int32))
bench("G xla row gather [NR,128]", chain2d(lambda x, i: x[i]),
      [(x, idxG) for x in xrs], E_row * (512 + 4))

# ---- D/E/F: Pallas dynamic_gather micro-kernels ---------------------------
SUB = 1024          # rows per block


def mk_pallas(kern, idx):
    n_blocks = idx.shape[0] // SUB

    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, idx)
    return f


def kern_axis0(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)


def kern_axis1(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)


def kern_row(x_ref, i_ref, o_ref):
    # row gather: broadcast a per-row index across lanes
    r = jnp.broadcast_to(i_ref[:, :1], (SUB, 128))
    o_ref[:] = jnp.take_along_axis(x_ref[:], r, axis=0)


idxD = jnp.asarray(rng.integers(0, SUB, (R, 128)).astype(np.int32))
idxE = jnp.asarray(rng.integers(0, 128, (R, 128)).astype(np.int32))

fD = mk_pallas(kern_axis0, idxD)
bench("D pallas dyngather axis0 [1k,128]",
      chain2d(lambda x, i, f=fD: f(x, i)),
      [(x, idxD) for x in x2s], E * 8)

fE = mk_pallas(kern_axis1, idxE)
bench("E pallas dyngather axis1 [1k,128]",
      chain2d(lambda x, i, f=fE: f(x, i)),
      [(x, idxE) for x in x2s], E * 8)

fF = mk_pallas(kern_row, idxD)
bench("F pallas row-bcast gather",
      chain2d(lambda x, i, f=fF: f(x, i)),
      [(x, idxD) for x in x2s], E * 8)

# ---- H. Pallas dyn gather axis0, taller operand blocks --------------------
for SUB_H in (4096, 16384):
    def mk_tall(sub):
        def kern(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

        n_blocks = R // sub

        @jax.jit
        def f(x, idx):
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

    idxH = jnp.asarray(rng.integers(0, SUB_H, (R, 128)).astype(np.int32))
    fH = mk_tall(SUB_H)
    bench(f"H pallas dyngather axis0 [{SUB_H},128]",
          chain2d(lambda x, i, f=fH: f(x, i)),
          [(x, idxH) for x in x2s], E * 8)

print("done")
