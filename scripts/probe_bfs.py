"""Per-phase timing of the single-source BFS on the real chip:
pull sweep alone, push tiers at each cap, full auto BFS."""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from green_marl_tpu.graph.csr import Graph, round_up
    from green_marl_tpu.models import bfs as B
    from green_marl_tpu.ops import scan_reduce

    z = np.load("data/rmat_lj_prep.npz")
    N = 4_800_000
    E = int(z["begin"][-1])
    e_pad_r = round_up(E)

    def padded(a, fill):
        out = np.full(e_pad_r, fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    sent = np.int32(N)
    g = Graph(
        begin=jax.device_put(z["begin"]),
        node_idx=jax.device_put(padded(z["csr_dst"], sent)),
        node_idx_src=jax.device_put(np.zeros(e_pad_r, np.int32)),
        r_begin=jax.device_put(z["r_begin"]),
        r_node_idx=jax.device_put(padded(z["csc_src"], sent)),
        r_node_idx_dst=jax.device_put(padded(z["csc_dst"], sent)),
        e_rev2idx=jax.device_put(padded(z["e_rev2idx"], np.int32(0))),
        num_nodes=N, num_edges=E)
    float(jnp.zeros((), jnp.float32) + 1)  # tunnel init
    print("graph on device", flush=True)

    def sync(x):
        return np.asarray(jax.device_get(jnp.ravel(x)[:1]))

    def t(label, fn, reps=3, vary=None):
        fn(0)  # compile+warm
        ts = []
        for k in range(1, reps + 1):
            t0 = time.time()
            fn(k if vary else 0)
            ts.append(time.time() - t0)
        print(f"{label}: {min(ts)*1000:.1f} ms", flush=True)

    # 1. one pull sweep (frontier half-full)
    rng = np.random.default_rng(0)
    fr_np = rng.random(g.n_pad) < 0.5

    @jax.jit
    def pull(gg, fr, salt):
        fr = fr ^ (salt > 10**9)    # defeat memoization
        vals = fr[gg.r_node_idx].astype(jnp.int32)
        return scan_reduce.segment_sum_by_offsets(vals, gg.r_begin,
                                                  gg.n_pad) > 0

    fr_dev = jax.device_put(fr_np)
    t("pull sweep (int32 gather+segment)",
      lambda k: sync(pull(g, fr_dev, jnp.asarray(k, jnp.int32))),
      vary=True)

    # 2. push tiers: frontier of ~cap/16 nodes (to fill the budget)
    deg = np.diff(z["begin"])
    for cap in (4096, 65536, 1 << 20):
        nsel = max(1, cap // 32)
        ids = np.argsort(deg)[: nsel * 4: 4][:nsel]
        fr2 = np.zeros(g.n_pad, bool)
        fr2[ids] = True
        fr2_dev = jax.device_put(fr2)

        @partial(jax.jit, static_argnames=("cap",))
        def push(gg, fr, salt, cap):
            fr = fr ^ (salt > 10**9)
            return B._push_expand(gg, fr, gg.begin, gg.node_idx, cap)

        t(f"push tier cap={cap}",
          lambda k, fr2_dev=fr2_dev, cap=cap:
          sync(push(g, fr2_dev, jnp.asarray(k, jnp.int32), cap)),
          vary=True)

    # 3. full auto bfs from a high-degree root
    roots = np.argsort(deg)[::-1][:4].astype(np.int32)

    @jax.jit
    def run(gg, r):
        res = B.bfs(gg, r)
        return res.levels_run, res.reached

    lv, rc = run(g, jnp.asarray(int(roots[0]), jnp.int32))
    print(f"bfs levels={int(lv)} reached={int(rc)}", flush=True)
    ts = []
    for r in roots[1:]:
        t0 = time.time()
        lv, rc = run(g, jnp.asarray(int(r), jnp.int32))
        int(lv)
        ts.append(time.time() - t0)
    print(f"auto bfs: {min(ts)*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
