"""Direction-optimizing BFS (VERDICT r1 item 3): the push (ST_QUE) and
pull (ST_RD) branches of ``models.bfs.bfs`` must agree with the host
oracle, and the auto switch must pick push tiers for small frontiers.

Reference state machine: gm_bfs_template.h:98-200 (expand states) and
:359-414 (density switch).
"""

import numpy as np

from green_marl_tpu.graph import generate as gen
from green_marl_tpu.graph.csr import from_edges
from green_marl_tpu.models import bfs as B


def _graph(n=2000, m=12000, seed=9):
    src, dst = gen.rmat_edges(n, m, seed=seed)
    g, _ = from_edges(src, dst, n)
    return g, src


def test_all_directions_match_oracle():
    g, src = _graph()
    root = int(np.argmax(np.bincount(src, minlength=2000)))
    want = B.bfs_np(np.asarray(g.begin), np.asarray(g.node_idx), root)
    for d in ("pull", "push", "auto"):
        res = B.bfs(g, root, direction=d)
        np.testing.assert_array_equal(
            np.asarray(res.level)[:2000], want,
            err_msg=f"direction={d}")
        assert int(res.reached) == int((want >= 0).sum())


def test_low_degree_root_both_branches():
    """A leaf-ish root gives tiny frontiers -> push tiers exercise; the
    pull branch must agree."""
    g, src = _graph()
    deg = np.bincount(src, minlength=2000)
    roots = np.nonzero(deg == 1)[0]
    root = int(roots[0]) if roots.size else 3
    want = B.bfs_np(np.asarray(g.begin), np.asarray(g.node_idx), root)
    for d in ("pull", "push", "auto"):
        res = B.bfs(g, root, direction=d)
        np.testing.assert_array_equal(np.asarray(res.level)[:2000], want)


def test_reverse_bfs_directions():
    g, _ = _graph()
    want = B.bfs_np(np.asarray(g.r_begin), np.asarray(g.r_node_idx), 5)
    for d in ("pull", "push", "auto"):
        res = B.bfs(g, 5, reverse=True, direction=d)
        np.testing.assert_array_equal(np.asarray(res.level)[:2000], want)
