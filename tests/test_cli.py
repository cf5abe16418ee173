"""CLI end-to-end tests: graph_gen -> converter -> app drivers, stdout
protocol (the reference run.sh/extract_result.py pipeline analog)."""

import io
import re
import sys

import numpy as np
import pytest

from green_marl_tpu.cli import apps, format_converter, graph_gen
from green_marl_tpu.graph import binary_io as bio


def run_cli(fn, argv, capsys):
    rc = fn(argv)
    out = capsys.readouterr().out
    return rc, out


def test_graph_gen_and_pagerank(tmp_path, capsys):
    binp = str(tmp_path / "g.bin")
    rc, _ = run_cli(graph_gen.main,
                    ["-type=uniform", "-seed=3", "400", "3000", binp],
                    capsys)
    assert rc == 0
    rc, out = run_cli(
        apps.main, ["pagerank", "-GMMeasureTime=1", binp], capsys)
    assert rc == 0
    assert re.search(r"graph loading time=[\d.]+", out)
    assert re.search(r"running time=[\d.]+", out)
    ranks = re.findall(r"rank\[(\d)\] = (0\.\d{9})", out)
    assert len(ranks) == 4
    assert re.search(r"CRC rank 0x[0-9a-f]{8}", out)
    # determinism: run again, CRC identical
    _, out2 = run_cli(apps.main, ["pagerank", binp], capsys)
    crc1 = re.search(r"CRC rank (0x[0-9a-f]+)", out).group(1)
    crc2 = re.search(r"CRC rank (0x[0-9a-f]+)", out2).group(1)
    assert crc1 == crc2


def test_hop_dist_protocol(tmp_path, capsys):
    binp = str(tmp_path / "g.bin")
    run_cli(graph_gen.main, ["-type=rmat", "-seed=1", "256", "2048", binp],
            capsys)
    rc, out = run_cli(apps.main,
                      ["hop_dist", "-root=5", "-GMDumpValues=10", binp],
                      capsys)
    assert rc == 0
    dists = re.findall(r"dist\[(\d+)\] = (-?\d+)", out)
    assert len(dists) == 10
    # root prints its own distance 0 at index 5
    assert ("5", "0") in dists


def test_triangle_counting_protocol(tmp_path, capsys):
    import green_marl_tpu.graph.generate as gen
    from green_marl_tpu.graph.csr import from_edges, to_undirected
    src, dst = gen.uniform_random_edges(60, 300, seed=2)
    src, dst = to_undirected(src, dst)
    keep = src != dst
    g, _ = from_edges(src[keep], dst[keep], 60)
    binp = str(tmp_path / "und.bin")
    bio.store_binary(binp, np.asarray(g.begin),
                     np.asarray(g.node_idx)[: g.num_edges])
    rc, out = run_cli(apps.main, ["triangle_counting", binp], capsys)
    assert rc == 0
    m = re.search(r"number of triangles: (\d+)", out)
    assert m
    from green_marl_tpu.models.triangle import triangle_count_np
    want = triangle_count_np(np.asarray(g.begin),
                             np.asarray(g.node_idx)[: g.num_edges])
    assert int(m.group(1)) == want


def test_format_converter_edge_with_props(tmp_path, capsys):
    txt = tmp_path / "g.txt"
    txt.write_text("10 20 3\n20 30 4\n30 10 5\n")
    schema = tmp_path / "schema"
    schema.write_text("EDGE: int\n")
    out = str(tmp_path / "g.bin")
    rc, _ = run_cli(format_converter.main,
                    [str(txt), out, str(schema), "-GMInputFormat=EDGE"],
                    capsys)
    assert rc == 0
    raw = bio.load_binary(out)
    assert raw.num_nodes == 3 and raw.num_edges == 3
    assert raw.nodekey is not None
    assert len(raw.edge_props) == 1
    # run sssp with the converted edge weights (EBIN input)
    rc, out_txt = run_cli(
        apps.main,
        ["sssp", "-GMInputFormat=EBIN", "-root=0", "-GMDumpValues=3", out],
        capsys)
    assert rc == 0
    dists = dict(re.findall(r"dist\[(\d+)\] = (-?\d+)", out_txt))
    assert dists["0"] == "0"
    assert dists["1"] == "3"   # 10->20 weight 3
    assert dists["2"] == "7"   # 10->20->30: 3+4


def test_conduct_cli(tmp_path, capsys):
    binp = str(tmp_path / "g.bin")
    run_cli(graph_gen.main, ["-type=uniform", "128", "1024", binp], capsys)
    rc, out = run_cli(apps.main, ["conduct", "-num=0", binp], capsys)
    assert rc == 0
    assert "conduct returns:" in out


def test_weak_cc_cli(tmp_path, capsys):
    binp = str(tmp_path / "g.bin")
    run_cli(graph_gen.main, ["-type=uniform", "100", "50", binp], capsys)
    rc, out = run_cli(apps.main, ["weak_cc", binp], capsys)
    assert rc == 0
    assert re.search(r"comp\[0\] = \d+", out)


def test_remote_scheme_fails_fast_without_tooling():
    """hdfs:// paths route through the fs resolver (gm_file_handling
    analog) and fail with a clear error when the CLI is absent."""
    import pytest as _pytest

    from green_marl_tpu.graph import fs
    assert fs.fetch("/tmp/local_path") == "/tmp/local_path"
    if fs.shutil.which("hdfs") is None:
        with _pytest.raises(RuntimeError, match="hdfs"):
            fs.fetch("hdfs://nn/graph.bin")


def test_gmprofile_superstep_lines(tmp_path, capsys):
    """-GMProfile prints the per-array placement table (stderr) and
    parseable superstep[i] time= lines (the Shoal step-timer /
    PROFILE_LEVEL_TIME protocol)."""
    import numpy as np

    from green_marl_tpu.cli.apps import main
    from green_marl_tpu.graph import binary_io as bio
    from green_marl_tpu.graph import generate as gen
    from green_marl_tpu.graph.csr import from_edges
    src, dst = gen.rmat_edges(150, 900, seed=2)
    g, _ = from_edges(src, dst, 150)
    p = str(tmp_path / "t.bin")
    bio.store_binary(p, np.asarray(g.begin),
                     np.asarray(g.node_idx)[: g.num_edges])
    rc = main(["pagerank", "-GMProfile=1", "-max_iter=3", p])
    assert rc == 0
    cap = capsys.readouterr()
    steps = [line for line in cap.out.splitlines()
             if line.startswith("superstep[")]
    assert len(steps) == 3 and "time=" in steps[0]
    assert "Array[begin]:" in cap.err
    rc = main(["hop_dist", "-GMProfile=1", p])
    assert rc == 0
    cap = capsys.readouterr()
    assert any(line.startswith("superstep[")
               for line in cap.out.splitlines())


def test_new_reference_mains_run(tmp_path, capsys):
    """The 6 reference mains added in round 4 (VERDICT item 7):
    adamicAdar, b2, bc_adj, bc_random, bidir_dijkstra, sssp_path_adj —
    each runs its protocol end-to-end (27 mains total now)."""
    import numpy as np
    from green_marl_tpu.cli.apps import APPS, main
    from green_marl_tpu.graph import binary_io as bio
    from green_marl_tpu.graph import generate as gen
    from green_marl_tpu.graph.csr import from_edges
    src, dst = gen.rmat_edges(300, 2000, seed=5)
    g, _ = from_edges(src, dst, 300)
    p = str(tmp_path / "t.bin")
    bio.store_binary(p, np.asarray(g.begin),
                     np.asarray(g.node_idx)[: g.num_edges])
    cases = [
        ("adamicAdar", [], "0-> "),
        ("b2", [], "A[0]"),
        ("bc_adj", ["-GMInputFormat=BIN"], "BC[0]"),
        ("bc_random", [], "BC[0]"),
        ("bidir_dijkstra", ["-src=1", "-dst=7"], "weight"),
        ("sssp_path_adj", ["-GMInputFormat=BIN", "-begin=1", "-end=7"],
         "1 -> 7"),
    ]
    for app, extra, frag in cases:
        assert app in APPS
        rc = main([app] + extra + [p])
        out = capsys.readouterr().out
        assert rc == 0, app
        assert frag in out, (app, out[-400:])
    assert len(APPS) >= 27


CUSTOM_GM = """\
Procedure my_deg_scale(G: Graph, alpha: Double;
                       S: N_P<Double>(G)): Double {
    Double total = 0.0;
    Foreach(n: G.Nodes) {
        n.S = alpha * (Double) n.OutDegree();
        total += n.S;
    }
    Return total;
}
"""


def test_custom_gm_main(tmp_path, capsys):
    """Generic usermain for an arbitrary .gm file (the reference's
    -CppMain / gm_default_usermain capability): scalar args become
    flags, output properties print + CRC, and -GMNumChips routes
    through the compiled vertex-sharded path with identical output."""
    binp = str(tmp_path / "g.bin")
    rc, _ = run_cli(graph_gen.main,
                    ["-type=uniform", "-seed=3", "400", "3000", binp],
                    capsys)
    assert rc == 0
    gm = tmp_path / "my_deg_scale.gm"
    gm.write_text(CUSTOM_GM)

    rc, out1 = run_cli(apps.main, [str(gm), "-alpha=2.5", binp], capsys)
    assert rc == 0
    assert "my_deg_scale returns: 7500.000000000" in out1   # 2.5 * E
    assert re.search(r"CRC16 S 0x[0-9a-f]{4}", out1)

    rc, out8 = run_cli(apps.main,
                       [str(gm), "-GMNumChips=8", "-alpha=2.5", binp],
                       capsys)
    assert rc == 0
    # bit-identical across placements (determinism/CRC gate)
    tail = lambda s: [ln for ln in s.splitlines()
                      if ln.startswith(("S[", "CRC", "my_deg_scale"))]
    assert tail(out8) == tail(out1)

    # unknown app error still lists the .gm path option
    rc = apps.main(["definitely_not_an_app"])
    assert rc == 1
