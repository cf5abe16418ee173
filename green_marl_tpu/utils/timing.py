"""Device timing utilities that are correct under the axon remote TPU.

``jax.block_until_ready`` does NOT reliably wait for remote execution
through the axon tunnel (an 8192^3 matmul "blocks" in 0.25 ms); the only
trustworthy synchronization is an actual device->host transfer.  Every
timing helper here therefore reduces the result to a scalar on device and
*fetches* it, and subtracts the measured fetch round-trip baseline.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(tree) -> jax.Array:
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
    return acc


def sync(tree) -> float:
    """Force completion of everything producing ``tree``; returns the
    fetched scalar (device->host round trip)."""
    return float(_scalarize(tree))


_FETCH_BASELINE = None


def fetch_baseline() -> float:
    """Measured round-trip seconds for fetching one ready scalar."""
    global _FETCH_BASELINE
    if _FETCH_BASELINE is None:
        x = jnp.zeros((), jnp.float32)
        float(x)  # ensure device ready + path warm
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            float(x + 1.0)
        _FETCH_BASELINE = (time.time() - t0) / reps
    return _FETCH_BASELINE


def device_time(fn: Callable, *args, reps: int = 3,
                warmup: int = 1) -> float:
    """Median wall seconds of ``fn(*args)`` with true device sync,
    fetch-baseline subtracted."""
    for _ in range(max(warmup, 1)):
        sync(fn(*args))
    base = fetch_baseline()
    times = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        times.append(time.time() - t0 - base)
    return max(float(np.median(times)), 1e-9)
