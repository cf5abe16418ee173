"""Multi-host runtime test: REAL separate processes + gloo collectives.

Two Python processes, each with 2 virtual CPU devices, run
vertex-sharded PageRank over one global 4-device mesh
(``parallel.multihost`` — the XOMP bootstrap analog).  The reference
only ever compile-tested its distributed backends
(``test/regression/test.py:157-158``); this executes the path.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pagerank_matches_single_host():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    line0 = [ln for ln in outs[0].splitlines()
             if ln.startswith("MH pid=0")]
    assert line0, outs[0][-2000:]

    # single-host oracle on the same deterministic graph
    from green_marl_tpu.graph import generate as gen
    from green_marl_tpu.graph.csr import from_edges
    from green_marl_tpu.models.pagerank import pagerank
    src, dst = gen.rmat_edges(400, 3000, seed=7)
    g, _ = from_edges(src, dst, 400)
    ref = np.asarray(pagerank(g, e=1e-9, d=0.85, max_iter=30).rank)[:4]
    got = np.fromstring(
        line0[0].split("local4=[")[1].rstrip("]"), sep=" ") \
        if False else np.array(
        [float(x) for x in line0[0].split("local4=[")[1]
         .rstrip("]").split()])
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)
