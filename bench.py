"""Benchmark: batched multi-source BFS + multi-PageRank on one TPU chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: aggregate traversed-edges/s over a bit-packed B=1024
multi-source BFS on a LiveJournal-scale RMAT graph (N=4.8M, E=69M) — the
batched capability BASELINE.json names as the north star (1024-source
BFS; 5 GTEPS/chip target).  Frontier/visited state is uint8 bit planes
(8 instances/lane -> 1024 per 128-lane row gather), because the row
gather is issue-rate bound (~9.5 ns/row) independent of payload decode.
PageRank throughput (f32, B=128) is reported on stderr.

Engine: ops/binned.py (degree-binned row-gather edge maps).  Protocol
mirrors the reference (BASELINE.md): timed region excludes graph build /
host transfer / binning (the reference's `running time=` excludes load +
reverse-edge build); repetitions use distinct root sets because the axon
tunnel memoizes identical dispatches; synchronization is a real
device->host scalar fetch (block_until_ready does not block through the
tunnel).

GTEPS accounting (Graph500 style): per instance, edges traversed =
sum of out-degrees over reached vertices; aggregate = sum over the B
instances / wall time of the whole batched run.
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
B = 1024
PR_B = 128
PR_ITERS = 20
BASELINE_GTEPS = 5.0
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    N, M, B_ = 100_000, 1_600_000, 16


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
    from green_marl_tpu.models import batched
    from green_marl_tpu.ops import binned

    t0 = time.time()
    src, dst = get_edges()
    out_deg_np = np.bincount(src, minlength=N).astype(np.int64)
    g, _ = from_edges(src, dst, N)
    t_csr = time.time() - t0

    t0 = time.time()
    bp = binned.binned_in(g)
    bp = jax.device_put(bp)
    deg_binned = bp.to_binned(jnp.asarray(out_deg_np.astype(np.int32)))
    deg_rows = jnp.concatenate(
        [deg_binned, jnp.zeros((bp.n_rows - bp.n_nodes,), jnp.int32)])
    t_bin = time.time() - t0
    print(f"# csr build {t_csr:.1f}s, binning+transfer {t_bin:.1f}s",
          file=sys.stderr)

    # sync/fetch baseline
    z = jnp.zeros((), jnp.float32)
    float(z)
    t0 = time.time()
    for _ in range(5):
        float(z + 1.0)
    fetch_base = (time.time() - t0) / 5

    # roots: top out-degree nodes (giant component), rotated per rep
    order = np.argsort(out_deg_np)[::-1]
    n_b = B if not SMOKE else 64
    roots_np = order[:n_b].astype(np.int32).copy()

    import functools

    def run_bfs(rr):
        res = batched.multi_source_bfs_bits(bp, jnp.asarray(rr), deg_rows)
        trav = np.asarray(jax.device_get(res.traversed))
        return int(res.levels_run), trav

    lv, trav = run_bfs(roots_np)                   # compile + warm
    times = []
    for k in (1, 2, 3):
        rr = np.roll(roots_np, k)
        t0 = time.time()
        run_bfs(rr)
        times.append(time.time() - t0 - fetch_base)
    dt = float(np.median(times))
    total_trav = int(trav.sum())
    gteps = total_trav / dt / 1e9
    print(f"# bfs B={n_b} levels={lv} traversed={total_trav} "
          f"time={dt*1000:.1f}ms agg={gteps:.2f} GTEPS "
          f"({total_trav/n_b/dt/1e9:.3f} GTEPS/instance-equiv)",
          file=sys.stderr)

    # ---- batched PageRank ------------------------------------------------
    n_pr = PR_B if not SMOKE else 16
    damp_np = 0.85 + 0.0005 * np.arange(n_pr, dtype=np.float32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def pr_run(bp, deg_binned, damp, iters):
        res = batched.multi_pagerank_binned(
            bp, deg_binned, damp, e=0.0, max_iter=iters)
        return res.rank[0, 0] + jnp.sum(res.diff)

    float(pr_run(bp, deg_binned, jnp.asarray(damp_np), PR_ITERS))  # warm
    pr_times = []
    for k in (1, 2, 3):
        d2 = jnp.asarray(damp_np + k * 1e-5)
        t0 = time.time()
        float(pr_run(bp, deg_binned, d2, PR_ITERS))
        pr_times.append(time.time() - t0 - fetch_base)
    pr_dt = float(np.median(pr_times))
    pr_edges = g.num_edges * n_pr * PR_ITERS
    print(f"# pagerank B={n_pr} iters={PR_ITERS} time={pr_dt*1000:.1f}ms "
          f"{pr_edges/pr_dt/1e9:.2f} Gedge/s "
          f"({PR_ITERS*n_pr/pr_dt:.1f} instance-iters/s)", file=sys.stderr)

    print(json.dumps({
        "metric": f"batched_{n_b}src_bfs_agg_gteps_rmat_lj_scale",
        "value": round(gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / BASELINE_GTEPS, 4),
    }))


if __name__ == "__main__":
    main()
