"""Benchmark harness: BFS GTEPS/chip on a LiveJournal-scale RMAT graph.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Protocol mirrors the reference measurement rules (BASELINE.md): the timed
region covers the algorithm only (graph build/transfer excluded, like the
reference's ``running time=`` which excludes load + reverse-edge build);
3 repetitions, best-of reported (reference NUM_RUNS=3 takes separate runs).

GTEPS follows the Graph500 convention: edges reachable from the root
(sum of out-degrees of reached vertices) / BFS wall time.

The workload is a fixed-seed RMAT graph at soc-LiveJournal1 scale
(N=4.85M, E=69M, a/b/c=.45/.22/.22) since no public dataset ships in this
image; the generator is ``green_marl_tpu.graph.generate.rmat_edges``
(semantics of the reference ``graph_gen`` RMAT, ``graph_gen.cc:154-265``).
Baseline for ``vs_baseline`` is the 5 GTEPS/chip north-star target
(BASELINE.json).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "data", "rmat_lj.npz")
N = 4_800_000
M = 69_000_000
SEED = 42
BASELINE_GTEPS = 5.0
# Scale down automatically when running on CPU (smoke mode).
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    N, M = 100_000, 1_600_000


def get_edges():
    if os.path.exists(DATA) and not SMOKE:
        z = np.load(DATA)
        return z["src"], z["dst"]
    from green_marl_tpu.graph import generate as gen
    src, dst = gen.rmat_edges(N, M, seed=SEED)
    src = src.astype(np.int32)
    dst = dst.astype(np.int32)
    if not SMOKE:
        os.makedirs(os.path.dirname(DATA), exist_ok=True)
        np.savez(DATA, src=src, dst=dst)
    return src, dst


def main():
    import jax
    import jax.numpy as jnp
    from green_marl_tpu.graph.csr import from_edges
    from green_marl_tpu.models import bfs as m_bfs

    t0 = time.time()
    src, dst = get_edges()
    # host-side degree stats: device->host transfers over the axon tunnel
    # cost ~112 ms per round trip, so everything bulky stays host/device
    # local and the timed region amortizes ROOTS complete BFS runs per
    # fetch.
    out_deg = np.bincount(src, minlength=N).astype(np.int64)
    g, _ = from_edges(src, dst, N)
    g = jax.device_put(g)
    build_s = time.time() - t0

    # Roots in the giant component: highest out-degree nodes.
    n_roots = 4 if SMOKE else 8
    roots = np.argsort(out_deg)[-n_roots:][::-1].astype(np.int32).copy()

    def run_roots(rr):
        lv, reach, trav, level = m_bfs.bfs_many_sequential(
            g, jnp.asarray(rr))
        return jnp.stack([jnp.asarray(lv, jnp.int32),
                          jnp.asarray(reach, jnp.int32),
                          jnp.asarray(trav, jnp.int32)])

    # The axon tunnel memoizes identical (executable, args) dispatches, so
    # every repetition must use a distinct root *order* (same workload:
    # each run is the same n_roots BFS traversals, just permuted).
    orders = [np.roll(roots, k) for k in range(4)]
    stats = np.asarray(jax.device_get(run_roots(orders[0])))  # warm+compile
    times = []
    for k in range(1, 4):
        t0 = time.time()
        np.asarray(jax.device_get(run_roots(orders[k])))
        times.append(time.time() - t0)
    dt = float(np.median(times))
    lv, reach, trav = (int(x) for x in stats)
    gteps = trav / dt / 1e9
    print(f"# roots={n_roots} total_levels={lv} total_reached={reach} "
          f"traversed={trav} time={dt*1000:.1f}ms "
          f"({dt*1000/n_roots:.1f}ms/bfs) gteps={gteps:.3f}",
          file=sys.stderr)
    best_gteps = gteps

    print(f"# graph build+transfer: {build_s:.1f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "bfs_gteps_per_chip_rmat_lj_scale",
        "value": round(best_gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(best_gteps / BASELINE_GTEPS, 4),
    }))


if __name__ == "__main__":
    main()
