"""Measure preprocessing breakdown at LJ scale on the real chip:
csr build, host binning, per-field device transfer, to_binned."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 4_800_000
M = 69_000_000


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label}: {time.time()-t0:.1f}s", flush=True)
    return r


def main():
    import jax
    import jax.numpy as jnp
    from green_marl_tpu.graph.csr import from_edges
    from green_marl_tpu.ops import binned

    DATA = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "rmat_lj.npz")
    z = np.load(DATA)
    src, dst = z["src"], z["dst"]
    print("edges loaded", flush=True)
    g, _ = t("from_edges", lambda: from_edges(src, dst, N))[0:2] if False \
        else t("from_edges", lambda: from_edges(src, dst, N))
    bp = t("binned_in (host)", lambda: binned.binned_in(g))
    print(f"slot_src {bp.slot_src.shape[0]*4/1e6:.0f}MB "
          f"slot_edge {bp.slot_edge.shape[0]*4/1e6:.0f}MB", flush=True)
    for f in ("slot_src", "slot_edge", "hub_owner", "perm", "inv_perm"):
        a = getattr(bp, f)
        t(f"device_put {f} ({np.asarray(a).nbytes/1e6:.0f}MB)",
          lambda a=a: jax.block_until_ready(jax.device_put(np.asarray(a))))
    deg = np.bincount(src, minlength=N).astype(np.int32)
    t("to_binned(deg) device", lambda: jax.block_until_ready(
        bp.to_binned(jnp.asarray(deg))))


if __name__ == "__main__":
    main()
