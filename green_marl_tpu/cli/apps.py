"""Per-algorithm CLI drivers (the generated ``*_main.cc`` equivalents).

Each app mirrors its reference main's arguments, defaults, and stdout
protocol: pagerank (``apps/output_cpp/src/pagerank_main.cc``:
``rank[%d] = %0.9lf``, defaults e=0.001 d=0.85 max=100), hop_dist
(``dist[%d] = %d``), triangle_counting (``number of triangles: %d``),
plus sssp / conductance / cc drivers on the same pattern.
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np

from ..graph import binary_io as bio
from .usermain import (GM_EDGEPROP, GM_NODEPROP, GM_SCALAR, RunContext,
                       UserMain)


def _rng_root(ctx: RunContext) -> int:
    root = ctx.scalars.get("root", 0)
    return int(root) if root is not None else 0


def make_pagerank() -> UserMain:
    m = UserMain("pagerank", "PageRank power iteration (pagerank.gm)")
    m.declare_scalar("max_iter", bio.GMTYPE_INT, True, False, default=100)
    m.declare_scalar("e", bio.GMTYPE_DOUBLE, True, False, default=0.001)
    m.declare_scalar("d", bio.GMTYPE_DOUBLE, True, False, default=0.85)
    m.declare_property("rank", bio.GMTYPE_DOUBLE, False, True, GM_NODEPROP)

    def run(ctx: RunContext) -> Dict:
        from ..models.pagerank import pagerank
        res = pagerank(ctx.graph, e=float(ctx.scalars["e"]),
                       d=float(ctx.scalars["d"]),
                       max_iter=int(ctx.scalars["max_iter"]))
        return {"rank": np.asarray(res.rank)}

    m.set_run(run)
    return m


def make_hop_dist() -> UserMain:
    m = UserMain("hop_dist", "Level-synchronous BFS distances (hop_dist.gm)")
    m.declare_scalar("root", bio.GMTYPE_NODE, True, False, default=0)
    m.declare_property("dist", bio.GMTYPE_INT, False, True, GM_NODEPROP,
                       dump_count=10)  # hop_dist_main.cc prints dist[0..9]

    def run(ctx: RunContext) -> Dict:
        from ..models.hop_dist import hop_dist
        res = hop_dist(ctx.graph, _rng_root(ctx))
        return {"dist": np.asarray(res.dist)}

    m.set_run(run)
    return m


def make_sssp() -> UserMain:
    m = UserMain("sssp", "Bellman-Ford SSSP (sssp.gm)")
    m.declare_scalar("root", bio.GMTYPE_NODE, True, False, default=0)
    m.declare_property("len", bio.GMTYPE_INT, True, False, GM_EDGEPROP)
    m.declare_property("dist", bio.GMTYPE_INT, False, True, GM_NODEPROP,
                       dump_count=10)  # hop_dist_main.cc prints dist[0..9]

    def run(ctx: RunContext) -> Dict:
        import jax.numpy as jnp
        from ..models.sssp import sssp
        g = ctx.graph
        if "len" in ctx.edge_props:
            w = np.zeros(g.e_pad, np.int32)
            w[: g.num_edges] = np.asarray(ctx.edge_props["len"])
        else:
            w = np.ones(g.e_pad, np.int32)
        res = sssp(g, _rng_root(ctx), jnp.asarray(w))
        return {"dist": np.asarray(res.dist)}

    m.set_run(run)
    return m


def make_triangle_counting() -> UserMain:
    m = UserMain("triangle_counting",
                 "Triangle counting, undirected (triangle_counting.gm)")
    m.declare_scalar("return", bio.GMTYPE_LONG, False, True)

    def run(ctx: RunContext) -> Dict:
        from ..models.triangle import triangle_count_literal
        t = triangle_count_literal(ctx.graph)
        print(f"number of triangles: {t}")
        return {"return": t}

    m.set_run(run)
    return m


def make_conduct() -> UserMain:
    m = UserMain("conduct", "Conductance of a cut (conduct.gm)")
    m.declare_scalar("num", bio.GMTYPE_INT, True, False, default=1)
    m.declare_property("member", bio.GMTYPE_INT, True, False, GM_NODEPROP)
    m.declare_scalar("return", bio.GMTYPE_FLOAT, False, True)

    def run(ctx: RunContext) -> Dict:
        import jax.numpy as jnp
        from ..models.conductance import conductance
        g = ctx.graph
        member = np.zeros(g.n_pad, np.int32)
        if "member" in ctx.node_props:
            member[: g.num_nodes] = np.asarray(ctx.node_props["member"])
        c = float(conductance(g, jnp.asarray(member),
                              int(ctx.scalars["num"])))
        return {"return": c}

    m.set_run(run)
    return m


def make_cc() -> UserMain:
    m = UserMain("weak_cc", "Weakly-connected components")
    m.declare_property("comp", bio.GMTYPE_NODE, False, True, GM_NODEPROP)

    def run(ctx: RunContext) -> Dict:
        from ..models.cc import weak_cc
        res = weak_cc(ctx.graph)
        return {"comp": np.asarray(res.comp)}

    m.set_run(run)
    return m


APPS = {
    "pagerank": make_pagerank,
    "hop_dist": make_hop_dist,
    "sssp": make_sssp,
    "triangle_counting": make_triangle_counting,
    "conduct": make_conduct,
    "weak_cc": make_cc,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m green_marl_tpu.cli.run <app> [options] "
              "<graph> [output]")
        print("apps: " + ", ".join(sorted(APPS)))
        return 1
    app = argv[0]
    if app not in APPS:
        print(f"unknown app '{app}'; available: {', '.join(sorted(APPS))}",
              file=sys.stderr)
        return 1
    return APPS[app]().main(argv[1:])
