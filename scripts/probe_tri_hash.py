"""On-TPU probe: full LJ-scale triangle count through the 2-round
hashed-membership kernel (round-5 verdict item 2).

Loads the cached DAG (data/rmat_lj_tri.npz) + the prebuilt edge hash
(/tmp/ehash_lj.npz or rebuilds), transfers once, then counts every
wedge sub-range, reporting per-slice wall/Mwedges-per-s and the final T
(golden: 9,346,475 from the binary-search path, 4x confirmed r4).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import green_marl_tpu.models.triangle as T  # noqa: E402

d = np.load("/root/repo/data/rmat_lj_tri.npz")
dag_begin = d["dag_begin"]
dag_dst = d["dag_dst"]
D = int(d["D"])

if "wide" in d.files:
    wide, seed = d["wide"], int(d["seed"])
    print(f"# hash loaded: wide {wide.nbytes/1e9:.2f}GB", flush=True)
else:
    class Ctx:
        pass
    Ctx.dag_begin, Ctx.dag_dst, Ctx.num_dag_edges = dag_begin, dag_dst, D
    t0 = time.time()
    eh = T.build_edge_hash(Ctx)
    wide, seed = eh.wide, eh.seed
    print(f"# hash built {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
float(jnp.zeros((), jnp.float32) + 1)
print(f"# tunnel init {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
# idempotent on a v4 cache (rows already in descending-pair order)
perm_dst, cum, _nb = T.descending_row_layout(dag_begin, dag_dst, D)
print(f"# descending-row layout {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
wide_d = jax.device_put(wide)
pad = np.zeros(int(dag_dst.shape[0]) - perm_dst.shape[0], np.int32)
dd = jax.device_put(np.concatenate([perm_dst, pad]))
db = jax.device_put(dag_begin)      # unused by hashed path
jax.block_until_ready(wide_d)
print(f"# transfer {(wide.nbytes+dag_dst.nbytes)/1e6:.0f}MB "
      f"in {time.time()-t0:.1f}s", flush=True)

deg = np.diff(dag_begin.astype(np.int64))
num_w = int(cum[-1])
bits = max(1, int(deg.max(initial=1)).bit_length()) + 1
max_deg = int(deg.max(initial=1))
print(f"# wedges {num_w} D {D} max_deg {max_deg}", flush=True)

LIMIT = min(T._SUBRANGE_LIMIT, 1 << 27)
chunk = int(os.environ.get("TRI_CHUNK", str(1 << 18)))
eh_dev = (wide_d, seed)

bounds = []
s0 = 0
while cum[min(s0, D)] < num_w:
    s1 = int(np.searchsorted(cum, cum[s0] + LIMIT, side="left"))
    s1 = max(min(s1 - 1, D), s0 + 1)
    if cum[s1] - cum[s0] <= 0:
        break
    bounds.append((s0, s1))
    s0 = s1
subs = []
for s0, s1 in bounds:
    n_w = int(cum[s1] - cum[s0])
    pcv = np.clip(cum[s0: s1 + 2] - cum[s0], 0, n_w)
    smp, span_bits = T._anchor_samples(pcv, n_w)
    smp = (smp.astype(np.int64) + s0).astype(np.int32)
    subs.append((s0, n_w, pcv, smp, span_bits))


class _Shim:
    def __init__(self, pcv, n_w):
        self.pair_cum = pcv
        self.num_wedges = n_w


hints = T._class_pad_hints(
    [(s0, _Shim(pcv, n_w), smp, sb, s0)
     for s0, n_w, pcv, smp, sb in subs],
    chunk, max_deg, int(dag_dst.shape[0]))
print(f"# window classes: {sorted(set(h[2] for h in hints))}",
      flush=True)

from green_marl_tpu.utils.limbs import limb_value  # noqa: E402

total = 0
covered = 0
t_all = time.time()
prev, prev_w, prev_s0 = [], 0, 0
t_sl = time.time()
for (s0, n_w, pcv, smp, span_bits), hint in zip(subs, hints):
    pc = jax.device_put(pcv.astype(np.int32))
    smp_d = jax.device_put(smp)
    cur = T._count_sub(db, dd, pc, smp_d, n_w, chunk, bits,
                       span_bits, samples_np=smp, max_deg=max_deg,
                       pc_base=s0, edge_hash=eh_dev, pad_hint=hint,
                       defer=True)
    for t in prev:
        total += limb_value(t)
    if prev_w:
        dt = time.time() - t_sl
        print(f"# slice [{prev_s0}..] w={prev_w} {dt:.1f}s "
              f"{prev_w/dt/1e6:.1f} Mw/s (pipelined)", flush=True)
        t_sl = time.time()
    covered += prev_w
    prev, prev_w, prev_s0 = cur, n_w, s0
for t in prev:
    total += limb_value(t)
covered += prev_w
dt_all = time.time() - t_all
print(f"TOTAL T={total} wedges={covered} {dt_all:.1f}s "
      f"{covered/dt_all/1e6:.2f} Mwedges/s "
      f"(golden 9346475, match={total == 9346475})", flush=True)
