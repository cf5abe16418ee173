"""Probe 2: batched pull scaling in B/dtype. One case per invocation:
   python probe_batched2.py E B dtype
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITER = 4
K = 3
rng = np.random.default_rng(0)

E = int(sys.argv[1])
B = int(sys.argv[2])
dtype = dict(f32=jnp.float32, bf16=jnp.bfloat16, i8=jnp.int8)[sys.argv[3]]
N = 500_000
W = 16

is_int = "int" in str(np.dtype(sys.argv[3].replace("i8", "int8")) if sys.argv[3] == "i8" else "f")

if sys.argv[3] == "i8":
    x_np = rng.integers(0, 2, (N, B)).astype(np.int8)
    xs = [jnp.asarray((x_np + k) % 2) for k in range(K)]
else:
    x_np = rng.random((N, B)).astype(np.float32)
    xs = [jnp.asarray(x_np + k * 1e-3, dtype=dtype) for k in range(K)]
idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))


def pull(x, i):
    rows = x[i]
    seg = rows.reshape(-1, W, B)
    if "int" in str(x.dtype):
        return jnp.max(seg, axis=1)
    return jnp.sum(seg, axis=1)


@jax.jit
def run(x, idx):
    def step(i, x):
        out = pull(x, idx)
        upd = (jnp.sum(out[:1]) * 0).astype(x.dtype)
        return x + upd
    x = jax.lax.fori_loop(0, ITER, step, x)
    return jnp.sum(x[0].astype(jnp.float32))


x0 = jnp.zeros((), jnp.float32)
float(x0)
t0 = time.time()
for _ in range(5):
    float(x0 + 1.0)
base = (time.time() - t0) / 5

try:
    float(run(xs[0], idx))
except Exception as ex:  # noqa
    print(f"E={E//10**6}M B={B} {sys.argv[3]} FAILED: "
          f"{type(ex).__name__} {(str(ex).splitlines() or ['?'])[0][:110]}")
    sys.exit(0)
ts = []
for k in range(1, K):
    t0 = time.time()
    float(run(xs[k], idx))
    ts.append((time.time() - t0 - base) / ITER)
dt = float(np.median(ts))
bpe = np.dtype(str(jnp.zeros((), dtype).dtype)).itemsize * B
bytes_sweep = E * (bpe + 4) + (E // W) * bpe
print(f"E={E//10**6}M B={B} {sys.argv[3]:4s}  {dt*1e3:8.2f} ms  "
      f"{bytes_sweep/dt/1e9:7.1f} GB/s  {E/dt/1e9:6.3f} Grow/s  "
      f"agg {E*B/dt/1e9:7.1f} Gedge/s")
