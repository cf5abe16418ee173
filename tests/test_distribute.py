"""Distributed DSL execution tests (GPS/Giraph-backend equivalent).

Runs compiled reference programs edge-sharded over the virtual 8-device
CPU mesh and checks exact agreement with single-device execution — the
execution coverage the reference's distributed backends never had
(compile-only, ``test/regression/test.py:157-158``).
"""

import numpy as np
import pytest

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.lang import distribute
from green_marl_tpu.lang.lower import LowerError, compile_file, \
    compile_source

REF = "/root/reference/apps/src"


@pytest.fixture(scope="module")
def graph():
    src, dst = gen.rmat_edges(400, 3000, seed=9)
    g, _ = from_edges(src, dst, 400)
    return g


def _both(cp, g, *args, **kwargs):
    ref = cp(g, *args, **{k: v for k, v in kwargs.items()})
    out = distribute.run_sharded(cp, g, *args, **kwargs)
    assert set(ref) == set(out)
    for k in ref:
        r, o = np.asarray(ref[k]), np.asarray(out[k])
        if r.ndim:
            o = o[:r.shape[0]]
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6, err_msg=k)
    return out


def test_pagerank_sharded_matches(graph):
    import os
    path = f"{REF}/pagerank.gm"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cp = compile_file(path)
    _both(cp, graph, 1e-8, 0.85, 30)


def test_hop_dist_sharded_matches(graph):
    import os
    path = f"{REF}/hop_dist.gm"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cp = compile_file(path)
    _both(cp, graph, root=0)


def test_sssp_sharded_matches(graph):
    import os
    path = f"{REF}/sssp.gm"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cp = compile_file(path)
    rng = np.random.RandomState(0)
    w = rng.randint(1, 10, size=graph.e_pad).astype(np.int32)
    _both(cp, graph, len=w, root=0)


def test_conduct_sharded_matches(graph):
    import os
    path = f"{REF}/conduct.gm"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cp = compile_file(path)
    member = (np.arange(graph.n_pad) % 3).astype(np.int32)
    _both(cp, graph, member=member, num=1)


def test_random_read_rejected(graph):
    src = """
Procedure tri(G: Graph) : Long
{
    Long T = 0;
    Foreach(v: G.Nodes) {
        Foreach(u: v.Nbrs)(u > v) {
            If (u.HasEdgeTo(v)) {
                T += 1;
            }
        }
    }
    Return T;
}
"""
    cp = compile_source(src)
    with pytest.raises(LowerError, match="random"):
        distribute.run_sharded(cp, graph)


def test_scalar_edge_reduction_sharded(graph):
    src = """
Procedure esum(G: Graph, w: E_P<Double>) : Double
{
    Double s = 0.0;
    Foreach(e: G.Edges) {
        s += e.w;
    }
    Return s;
}
"""
    cp = compile_source(src)
    rng = np.random.RandomState(1)
    w = rng.rand(graph.e_pad)
    w[graph.num_edges:] = 0.0
    out = _both(cp, graph, w=w)
    np.testing.assert_allclose(float(np.asarray(out["_return"])),
                               w[:graph.num_edges].sum(), rtol=1e-6)


def test_inbfs_sharded_matches(graph):
    """InBFS (forward + InReverse) under sharding: the traced level-sync
    replay (lower_bfs._replay_traced — the GPS transform_bfs analog).
    Was rejected outright before round 3."""
    src = """
Procedure paths(G: Graph, root: Node, sigma: N_P<Float>,
                delta: N_P<Float>)
{
    G.sigma = 0;
    root.sigma = 1;
    InBFS(v: G.Nodes From root)(v != root) {
        v.sigma = Sum(w: v.UpNbrs){ w.sigma };
    } InReverse(v != root) {
        v.delta = Sum(w: v.DownNbrs){ w.delta + w.sigma };
    }
}
"""
    cp = compile_source(src)
    _both(cp, graph, root=0)


def test_gmnumchips_cli_runs_sharded(graph, tmp_path, capsys):
    """`-GMNumChips=8` routes pagerank through the vertex-sharded engine
    on the virtual CPU mesh (the reference's -GMNumThreads analog)."""
    from green_marl_tpu.graph import binary_io as bio
    from green_marl_tpu.cli.apps import main
    g = graph
    p = str(tmp_path / "t.bin")
    bio.store_binary(p, np.asarray(g.begin),
                     np.asarray(g.node_idx)[:g.num_edges])
    rc = main(["pagerank", "-GMNumChips=8", p])
    assert rc == 0
    out = capsys.readouterr().out
    ranks8 = [line for line in out.splitlines()
              if line.startswith("rank[")]
    rc = main(["pagerank", p])
    assert rc == 0
    out1 = capsys.readouterr().out
    ranks1 = [line for line in out1.splitlines()
              if line.startswith("rank[")]
    assert ranks8 and ranks8 == ranks1


def test_transpose_inbfs_sharded_matches(graph):
    """BFS over G^ under sharding: the reach must come from the local
    slab endpoints + pcomb, not global offsets (round-3 review)."""
    src = """
Procedure revreach(G: Graph, root: Node, vis: N_P<Int>)
{
    G.vis = 0;
    InBFS(v: G^.Nodes From root) {
        v.vis = 1;
    }
}
"""
    cp = compile_source(src)
    _both(cp, graph, root=0)


def test_random_target_sum_not_multiplied(graph):
    """Node-context random-keyed += is replicated under edge sharding;
    it must NOT be psum'd across shards (round-3 review: cnt came back
    multiplied by the shard count)."""
    src = """
Procedure selfcnt(G: Graph, p: N_P<Node>, cnt: N_P<Int>)
{
    Foreach(n: G.Nodes) { n.p = n; }
    Foreach(n: G.Nodes) {
        Node m = n.p;
        m.cnt += 1;
    }
}
"""
    cp = compile_source(src)
    out = _both(cp, graph)
    c = np.asarray(out["cnt"])[: graph.num_nodes]
    np.testing.assert_array_equal(c, np.ones_like(c))
