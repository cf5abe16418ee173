"""Scaling efficiency of the vertex-sharded engine on a virtual CPU
mesh: PageRank supersteps at S = 1, 2, 4, 8 shards on one RMAT graph.

CPU-mesh scaling is a *correctness-of-scaling* proxy (virtual devices
share the same silicon, so wall-clock speedup is bounded by core
count); the quantity worth tracking is that per-device owned state and
ghost traffic shrink as O(N/S) / O(cut) while results stay exact.
Prints a table + appends to BASELINE.md between scaling markers.
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

MARK_A = "<!-- scaling:begin -->"
MARK_B = "<!-- scaling:end -->"


def main():
    from green_marl_tpu.graph import generate as gen
    from green_marl_tpu.graph.csr import from_edges
    from green_marl_tpu.parallel import vertex_sharded as V

    N, M = 400_000, 4_000_000
    src, dst = gen.rmat_edges(N, M, seed=13)
    g, _ = from_edges(src, dst, N)
    print(f"# graph N={N} E={g.num_edges}")

    rows = []
    base_t = None
    ref_rank = None
    for S in (1, 2, 4, 8):
        mesh = V.vmesh(S)
        vsg = V.place(V.build_vertex_sharded(g, S), mesh)
        t0 = time.time()
        rank, diff, it = V.pagerank_vsharded(vsg, mesh, e=0.0,
                                             max_iter=20)
        np.asarray(jax.device_get(rank[:4]))
        compile_t = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            rank, diff, it = V.pagerank_vsharded(vsg, mesh, e=0.0,
                                                 max_iter=20)
            np.asarray(jax.device_get(rank[:4]))
            ts.append(time.time() - t0)
        t = min(ts)
        if base_t is None:
            base_t = t
            ref_rank = np.asarray(jax.device_get(rank))
        else:
            got = np.asarray(jax.device_get(rank))
            assert np.array_equal(got, ref_rank), "results diverge!"
        eff = base_t / (t * 1)          # same silicon: report raw ratio
        state_mb = vsg.L * 4 / 1e6
        ghost_kb = vsg.num_shards * vsg.cap * 4 / 1e3
        rows.append((S, t * 1000, eff, state_mb, ghost_kb,
                     vsg.ghost_total))
        print(f"S={S}  20 supersteps {t*1000:8.1f} ms  t1/tS={eff:5.2f}  "
              f"state/dev {state_mb:6.2f} MB  "
              f"ghost buf/dev {ghost_kb:8.1f} KB  cut={vsg.ghost_total}",
              flush=True)

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE.md")
    lines = [MARK_A,
             f"### Vertex-sharded scaling (virtual CPU mesh, RMAT "
             f"N={N} E={g.num_edges}, 20 PageRank supersteps; results "
             "bit-identical across S)",
             "",
             "| S | time (ms) | t1/tS | owned state/dev | "
             "ghost buf/dev | cut size |",
             "|---|---|---|---|---|---|"]
    for S, ms, eff, mb, kb, cut in rows:
        lines.append(f"| {S} | {ms:.1f} | {eff:.2f} | {mb:.2f} MB | "
                     f"{kb:.1f} KB | {cut} |")
    lines.append(MARK_B)
    block = "\n".join(lines)
    text = open(base).read() if os.path.exists(base) else ""
    if MARK_A in text and MARK_B in text:
        text = text.split(MARK_A)[0] + block + text.split(MARK_B)[1]
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    open(base, "w").write(text)
    print("BASELINE.md updated")


if __name__ == "__main__":
    main()
