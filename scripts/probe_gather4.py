"""Probe 4: can multi-outstanding DMA beat the ~7-9.5 ns/row gather
issue rate? (round-5 verdict item 3)

probe_gather3 measured XLA gathers and simple in-VMEM Pallas gathers at
~7-9.5 ns/row regardless of payload <= 512 B and BASELINE.md adopted
that as the single-instance traversal ceiling.  The one untried attack:
K in-flight ``pltpu.make_async_copy`` row copies (HBM -> VMEM), the
descriptor-level pipeline a hand-written CUDA/C++ runtime would use.
If the rate is a descriptor-dispatch artifact, K outstanding DMAs lift
it; if it is true memory-system latency/banking, they won't.

Kernel: for T repetitions over R random row ids (SMEM-prefetched), keep
K DMAs in flight; consume each row with a trivial VPU reduce.  Reports
ns/row and effective GB/s per (K, row-bytes) combination.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N_ROWS = 1 << 20            # table rows (4.8M-node graph analog)
R = 1 << 15                 # distinct random rows per sweep (SMEM 128KB)
T = 64                      # sweeps per kernel launch


def gather_kernel(idx_ref, table_ref, out_ref, scratch, sems, *,
                  k_bufs: int, roww: int):
    def one_sweep(t, acc0):
        def dma(slot, r):
            # vary the row with the sweep index so consecutive sweeps
            # don't hit identical addresses
            rid = idx_ref[r]
            return pltpu.make_async_copy(
                table_ref.at[rid], scratch.at[slot], sems.at[slot])

        for s in range(k_bufs):
            dma(s, s).start()

        def body(r, acc):
            slot = jax.lax.rem(r, k_bufs)
            dma(slot, r).wait()
            v = scratch[slot, 0]        # touch the row (VPU consume)

            @pl.when(r + k_bufs < R)
            def _():
                dma(slot, r + k_bufs).start()

            return acc + v

        return jax.lax.fori_loop(0, R, body, acc0)

    out_ref[0, 0] = jax.lax.fori_loop(0, T, one_sweep, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("k_bufs", "roww"))
def run(idx, table, k_bufs: int, roww: int):
    kern = functools.partial(gather_kernel, k_bufs=k_bufs, roww=roww)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((k_bufs, roww), jnp.int32),
                pltpu.SemaphoreType.DMA((k_bufs,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(idx, table)


def main():
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1)
    print(f"# tunnel init {time.time()-t0:.1f}s", flush=True)

    for roww in (8, 32, 128):           # 32B, 128B, 512B rows
        table = jax.device_put(
            rng.integers(0, 100, (N_ROWS, roww)).astype(np.int32))
        jax.block_until_ready(table)
        for k in (1, 2, 4, 8, 16):
            idx = jax.device_put(
                rng.integers(0, N_ROWS, R).astype(np.int32))
            try:
                r0 = run(idx, table, k, roww)   # compile + warm
                v0 = int(np.asarray(jax.device_get(r0))[0, 0])
                times = []
                for rep in range(3):
                    idx2 = jax.device_put(
                        rng.integers(0, N_ROWS, R).astype(np.int32))
                    t0 = time.time()
                    rr = run(idx2, table, k, roww)
                    int(np.asarray(jax.device_get(rr))[0, 0])
                    times.append(time.time() - t0)
                dt = float(np.median(times))
                rows = R * T
                print(f"rowB={roww*4:4d} K={k:2d} {dt*1e9/rows:7.2f} "
                      f"ns/row  {rows*roww*4/dt/1e9:7.2f} GB/s "
                      f"(chk {v0 & 0xffff})", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"rowB={roww*4:4d} K={k:2d} FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
