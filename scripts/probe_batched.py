"""Probe: fused batched pull-sum = row-gather + reshape-sum (pure XLA).

The candidate flagship edge-map: out[seg] = sum over W-slot segments of
table rows gathered by edge index.  If XLA fuses gather+reduce this runs
at ~table-read bandwidth (E*B*4 bytes of random row reads).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

ITER = 4
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
    try:
        float(fn(*inputs[0]))
    except Exception as ex:  # noqa
        lines = str(ex).splitlines() or ["?"]
        print(f"{name:44s} FAILED: {type(ex).__name__} {lines[0][:120]}")
        return None
    base = fetch_baseline()
    ts = []
    for k in range(1, K):
        t0 = time.time()
        float(fn(*inputs[k]))
        ts.append((time.time() - t0 - base) / ITER)
    dt = float(np.median(ts))
    print(f"{name:44s} {dt*1e3:8.2f} ms/sweep  "
          f"{bytes_per_sweep/dt/1e9:7.1f} GB/s")
    return dt


def chain(body):
    @jax.jit
    def run(x, idx):
        def step(i, x):
            out = body(x, idx)
            upd = jnp.sum(out[:1]).astype(x.dtype) * 1e-30
            return x + upd  # dependency; out fully consumed by reduce
        x = jax.lax.fori_loop(0, ITER, step, x)
        return jnp.sum(x[0])
    return run


E = 16_000_000
N = 1_000_000
W = 16

for B, dtype in [(128, jnp.float32), (256, jnp.float32),
                 (128, jnp.int8), (1024, jnp.int8)]:
    NR = N
    if dtype == jnp.int8:
        x_np = rng.integers(0, 2, (NR, B)).astype(np.int8)
    else:
        x_np = rng.random((NR, B)).astype(np.float32)
    idx_np = rng.integers(0, NR, E).astype(np.int32)
    idx = jnp.asarray(idx_np)
    xs = [jnp.asarray(x_np + (k % 2 if dtype == jnp.int8 else
                              k * 1e-3)) for k in range(K)]

    def pull_sum(x, i):
        rows = x[i]                       # [E, B] row gather
        seg = rows.reshape(-1, W, B)
        if x.dtype == jnp.int8:
            return jnp.max(seg, axis=1)   # OR for frontier masks
        return jnp.sum(seg, axis=1)

    bpe = B * (1 if dtype == jnp.int8 else 4)
    bytes_sweep = E * (bpe + 4) + (E // W) * bpe
    dt = bench(f"pull_{'sum' if dtype!=jnp.int8 else 'or'} B={B} {np.dtype(dtype).name}",
               chain(pull_sum), [(x, idx) for x in xs], bytes_sweep)
    if dt:
        print(f"    -> per-instance-edge: {dt/ E / B * 1e12:.1f} ps, "
              f"aggregate {E*B/dt/1e9:.1f} Gedge/s")

print("done")
