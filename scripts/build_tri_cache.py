"""Rebuild data/rmat_lj_tri.npz (v5: descending-row layout + packable hash)
host-side — the same prep bench.py's triangle section performs on a
cache miss, extracted so probes can run without a device session."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import green_marl_tpu.models.triangle as T  # noqa: E402
from green_marl_tpu.graph.csr import from_edges, to_undirected  # noqa: E402

DDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")
EDGES = os.path.join(DDIR, "rmat_lj.npz")
TRI = os.path.join(DDIR, "rmat_lj_tri.npz")
N = 4_800_000
TRI_VERSION = 5

t0 = time.time()
e = np.load(EDGES)
s_, d_ = to_undirected(e["src"], e["dst"], dedup=False)
g_u, _ = from_edges(s_, d_, N)
ctx0 = T.build_dag(g_u)
rank_begin = np.asarray(ctx0.dag_begin)
rank_dst = np.asarray(ctx0.dag_dst)
D = ctx0.num_dag_edges
del g_u, s_, d_, e
print(f"# dag build {time.time()-t0:.1f}s D={D}", flush=True)


class _Ctx:
    pass


_Ctx.dag_begin, _Ctx.dag_dst, _Ctx.num_dag_edges = \
    rank_begin, rank_dst, D
t0 = time.time()
eh = T.build_edge_hash(_Ctx)
wide, seed = eh.wide, eh.seed
print(f"# hash build {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
perm_dst, _cum, nb = T.descending_row_layout(rank_begin, rank_dst, D)
dag_dst = np.full(rank_dst.shape[0], N, np.int32)
dag_dst[:D] = perm_dst
dag_begin = nb.astype(np.int64)
np.savez(TRI, version=np.int64(TRI_VERSION),
         dag_begin=dag_begin, dag_dst=dag_dst, D=np.int64(D),
         wide=wide, seed=np.int64(seed))
print(f"# layout+save {time.time()-t0:.1f}s -> {TRI}", flush=True)
