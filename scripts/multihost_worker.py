"""Worker for the 2-process multi-host test: run vertex-sharded
PageRank over a mesh spanning both processes; process 0 prints the
result row for verification.

Usage: python scripts/multihost_worker.py <pid> <nprocs> <port>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    pid, nprocs, port = (int(x) for x in sys.argv[1:4])
    from green_marl_tpu.parallel import multihost as mh
    mh.init(coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs, process_id=pid,
            local_cpu_devices=2)

    import jax
    import numpy as np
    assert len(jax.devices()) == 2 * nprocs, jax.devices()

    from green_marl_tpu.graph import generate as gen
    from green_marl_tpu.graph.csr import from_edges
    from green_marl_tpu.parallel import vertex_sharded as V

    src, dst = gen.rmat_edges(400, 3000, seed=7)
    g, _ = from_edges(src, dst, 400)
    S = len(jax.devices())
    vsg = V.build_vertex_sharded(g, S)
    mesh = mh.global_mesh()
    vsg = mh.place_multihost(vsg, mesh)
    rank, diff, it = V.pagerank_vsharded(vsg, mesh, e=1e-9, d=0.85,
                                         max_iter=30)
    # rank is a global array sharded over processes; gather the
    # process-local shards and let the driver check process 0's output
    local = np.concatenate(
        [np.asarray(s.data).reshape(-1)
         for s in rank.addressable_shards])
    first_owned = int(rank.addressable_shards[0].index[0].start or 0)
    vals = " ".join(f"{x:.10e}" for x in local[:4])
    print(f"MH pid={pid} it={int(it)} base={first_owned} "
          f"local4=[{vals}]", flush=True)


if __name__ == "__main__":
    main()
