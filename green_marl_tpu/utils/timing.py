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


def profile_supersteps(step, state, cond, max_iter: int = 10 ** 6,
                       out=None):
    """Host-driven superstep loop with per-step device timing — the
    reference's Shoal step timers / BFS ``PROFILE_LEVEL_TIME`` analog
    (``gm_cpp_gen.cc:761-770``, ``gm_bfs_template.h:85-96``).

    ``step(state) -> state``; ``cond(state) -> bool-ish device scalar``.
    Each step is synced with a real fetch; lines print as
    ``superstep[i] time=X ms`` (parseable by the extract pipeline).
    Returns the final state.  Slower than the fused ``lax.while_loop``
    (one dispatch per step) — profiling mode only.
    """
    import sys
    base = fetch_baseline()
    i = 0
    while i < max_iter and bool(np.asarray(jax.device_get(cond(state)))):
        t0 = time.time()
        state = step(state)
        sync(state)
        dt = (time.time() - t0 - base) * 1000
        print(f"superstep[{i}] time={max(dt, 0.0):.3f} ms",
              file=out or sys.stdout, flush=True)
        i += 1
    return state


def graph_placement_report(g, extra=()) -> str:
    """Per-array HBM placement table for a device-resident Graph — the
    runtime's ``Array[...]`` report lines (Shoal, run.sh:218-236) plus
    the compiler's decision table (gm_cpp_gen.cc:229-305)."""
    rows = []
    fields = ["begin", "node_idx", "node_idx_src", "r_begin",
              "r_node_idx", "r_node_idx_dst", "e_rev2idx"]
    for f in fields:
        a = getattr(g, f)
        rows.append(
            f"Array[{f}]: elements={a.size} size={a.nbytes} "
            f"dtype={a.dtype} -- hugepage=[ ] replication=[X] "
            f"distribution=[ ]")
    for name, a in extra:
        rows.append(
            f"Array[{name}]: elements={a.size} size={a.nbytes} "
            f"dtype={a.dtype} -- hugepage=[ ] replication=[X] "
            f"distribution=[ ]")
    return "\n".join(rows)
