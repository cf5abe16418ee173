"""Twitter-class (>2^24 nodes) batched BFS ON-CHIP — the executed
upgrade of the host-side 42M smoke (tests/test_scale_smoke.py).

Sizing on a 16 GB chip: bit planes live as [n_rows, 128] uint8 (the
(8,128)-tiled layout pads any smaller lane count to 128, so B=1024
with uint8 planes is the densest packing that wastes nothing); the
level-sync loop carries ~3 plane buffers, so N=24M x 128 B = 3.1 GB
per buffer ~ 9.2 GB + the 1.1x-E slot schedule.  N=42M (x3 = 16.1 GB)
does not fit single-chip — that operating point is the vertex-sharded
multi-chip path (lang/lower_vertex.py, BASELINE north star).

Usage:  python scripts/probe_twitter_scale.py [N] [E]
Prints one JSON line with aggregate GTEPS.  Reference context: the
reference compiles EDGE_SIZE=64 for twitter_rv
(/root/reference/setup.mk.in:55-57); its oracle table carries
twitter goldens (scripts/extract_result.py:102-104).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Measured on this 16 GB chip: N=20M runs (9.92 GTEPS aggregate, 14
# levels, run-to-run spread 0.3 ms/13.4 s); N=24M OOMs even with the
# row-chunked popstats (models/batched._POP_CH) — the 3 live plane
# buffers + edge_map gather intermediates bind, so larger N is the
# vertex-sharded multi-chip path.
N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
E = int(sys.argv[2]) if len(sys.argv) > 2 else 130_000_000
B = 1024
PLANE_BITS = 8
SEED = 1


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, "data", "jaxcache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    except Exception as e:  # noqa: BLE001
        log(f"# compile cache unavailable: {e}")

    from green_marl_tpu.graph import generate as gen
    from green_marl_tpu.graph import native
    from green_marl_tpu.graph.csr import round_up
    from green_marl_tpu.models import batched
    from green_marl_tpu.ops import binned

    assert N > (1 << 24), "the point of this probe is N > 2^24"
    t0 = time.time()
    src, dst = gen.uniform_random_edges(N, E, seed=SEED)
    src = src.astype(np.int32)
    dst = dst.astype(np.int32)
    log(f"# edges {time.time()-t0:.1f}s")

    t0 = time.time()
    if native.available():
        (begin, _csr_dst, _s, _p, r_begin, csc_src, _cd,
         _ri) = native.build_csr(src, dst, N)
    else:
        r_begin = np.zeros(N + 1, np.int64)
        np.cumsum(np.bincount(dst, minlength=N), out=r_begin[1:])
        order = np.argsort(dst, kind="stable")
        csc_src = src[order]
        begin = np.zeros(N + 1, np.int64)
        np.cumsum(np.bincount(src, minlength=N), out=begin[1:])
    out_deg = np.diff(np.asarray(begin)).astype(np.int64)
    del src, dst
    log(f"# csr {time.time()-t0:.1f}s")

    t0 = time.time()
    bp = binned.build_binned(np.asarray(r_begin), np.asarray(csc_src),
                             N, round_up(E))
    deg_rows = np.zeros(bp.n_rows, np.int32)
    deg_rows[: bp.n_nodes] = np.asarray(
        bp.to_binned(out_deg.astype(np.int32)))
    log(f"# binning {time.time()-t0:.1f}s (n_rows={bp.n_rows} "
        f"slots={bp.slot_src.shape[0]})")

    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    log(f"# tunnel init {time.time()-t0:.1f}s")
    t0 = time.time()
    # N >= 2^24: ids are pack24-ineligible by range — plain device_put
    bp_d = binned.device_put_lite(bp)
    deg_d = jax.device_put(deg_rows)
    jax.block_until_ready(deg_d)
    mb = (bp.slot_src.nbytes + deg_rows.nbytes) / 1e6
    log(f"# transfer ~{mb:.0f}MB in {time.time()-t0:.1f}s")

    order = np.argsort(out_deg)[::-1]
    roots0 = order[:B].astype(np.int32).copy()

    def run(rr):
        res = batched.multi_source_bfs_bits(
            bp_d, jnp.asarray(rr), deg_d, plane_bits=PLANE_BITS)
        lv, trav = jax.device_get((res.levels_run, res.traversed))
        return int(lv), np.asarray(trav).astype(np.int64)

    lv, trav = run(roots0)                       # compile + warm
    times = []
    for k in (1, 2, 3):
        rr = np.roll(roots0, k)
        t0 = time.time()
        run(rr)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    tot = int(trav.sum())
    gteps = tot / dt / 1e9
    log(f"# B={B} levels={lv} traversed={tot} time={dt*1000:.1f}ms "
        f"agg={gteps:.2f} GTEPS")
    print(json.dumps({
        "metric": "twitter_class_batched_bfs_on_chip",
        "n": N, "e": E, "b": B, "plane_bits": PLANE_BITS,
        "levels": lv, "traversed": tot,
        "time_ms": round(dt * 1000, 1),
        "agg_gteps": round(gteps, 3),
        "run_times_ms": [round(t * 1000, 1) for t in times]}))


if __name__ == "__main__":
    main()
