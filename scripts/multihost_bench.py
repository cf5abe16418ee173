"""Multi-process scaling measurement (VERDICT r3 item 5 / scalebench
analog, reference ``scripts/run.sh:306-330``).

Times vertex-sharded PageRank supersteps on a fixed graph over FOUR
devices, arranged two ways:

* 1 process x 4 virtual CPU devices (all collectives in-process), vs
* 2 processes x 2 devices, collectives crossing the process boundary
  over jax.distributed/gloo (the multi-host runtime path).

Efficiency = t_1proc / t_2proc isolates the cross-process collective
overhead — the best multi-host proxy this single-machine image allows
(both processes share the same silicon; a real 2-host ICI/DCN number
needs real hosts).  North star: >= 0.8.

Usage:
  python scripts/multihost_bench.py            # orchestrates both runs
  python scripts/multihost_bench.py worker <pid> <nprocs> <port>
"""
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N, E, ITERS = 400_000, 4_000_000, 40


def _build():
    from green_marl_tpu.graph import generate as gen
    from green_marl_tpu.graph.csr import from_edges
    src, dst = gen.rmat_edges(N, E, seed=13)
    g, _ = from_edges(src, dst, N)
    return g


def _time_pagerank(vsg, mesh, V):
    import numpy as np
    import jax
    rank, diff, it = V.pagerank_vsharded(vsg, mesh, e=0.0, d=0.85,
                                         max_iter=ITERS)
    np.asarray(jax.device_get(diff))          # warm compile + run
    t0 = time.time()
    rank, diff, it = V.pagerank_vsharded(vsg, mesh, e=1e-30, d=0.85,
                                         max_iter=ITERS)
    np.asarray(jax.device_get(diff))
    return time.time() - t0, int(it)


def worker(pid: int, nprocs: int, port: int):
    from green_marl_tpu.parallel import multihost as mh
    local = 4 // nprocs
    # NOTE: vertex_sharded must be imported AFTER mh.init — its
    # module-level jnp constants would initialize the XLA backend,
    # which jax.distributed.initialize forbids
    mh.init(coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs, process_id=pid,
            local_cpu_devices=local)
    from green_marl_tpu.parallel import vertex_sharded as V
    import jax
    assert len(jax.devices()) == 4
    g = _build()
    vsg = V.build_vertex_sharded(g, 4)
    mesh = mh.global_mesh()
    vsg = mh.place_multihost(vsg, mesh)
    dt, it = _time_pagerank(vsg, mesh, V)
    print(f"MHBENCH pid={pid} nprocs={nprocs} iters={it} "
          f"time={dt:.3f}", flush=True)


def single_process() -> float:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from green_marl_tpu.parallel import vertex_sharded as V
    g = _build()
    mesh = V.vmesh(4)
    vsg = V.place(V.build_vertex_sharded(g, 4), mesh)
    dt, it = _time_pagerank(vsg, mesh, V)
    print(f"1-process (4 dev): {ITERS} supersteps in {dt:.3f}s "
          f"({ITERS / dt:.1f} steps/s)")
    return dt


def two_process() -> float:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(pid),
         "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in (0, 1)]
    times = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise SystemExit(f"worker failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("MHBENCH"):
                times.append(float(line.split("time=")[1]))
    dt = max(times)
    print(f"2-process (2x2 dev, gloo): {ITERS} supersteps in {dt:.3f}s "
          f"({ITERS / dt:.1f} steps/s)")
    return dt


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=4")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    t1 = single_process()
    t2 = two_process()
    eff = t1 / t2
    print(json.dumps({
        "metric": "multiproc_scaling_efficiency",
        "graph": f"rmat N={N} E={E}", "iters": ITERS,
        "t_1proc_s": round(t1, 3), "t_2proc_s": round(t2, 3),
        "efficiency": round(eff, 3), "target": 0.8}))


if __name__ == "__main__":
    main()
