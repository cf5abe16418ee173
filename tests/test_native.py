"""Native (C++/ctypes) host runtime tests."""

import numpy as np
import pytest

from green_marl_tpu.graph import native
from green_marl_tpu.graph.csr import from_edges


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_build_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 500, 4000).astype(np.int32)
    dst = rng.integers(0, 500, 4000).astype(np.int32)
    built = native.build_csr(src, dst, 500)
    begin, csr_dst, csr_src, perm, r_begin, csc_src, csc_dst, rev = built
    g, perm2 = from_edges(src, dst, 500)   # uses native itself, but the
    # numpy fallback is exercised via a direct comparison:
    import green_marl_tpu.graph.csr as csrmod
    import green_marl_tpu.graph.native as natmod
    avail = natmod.available
    natmod.available = lambda: False
    try:
        g2, perm3 = from_edges(src, dst, 500)
    finally:
        natmod.available = avail
    assert (np.asarray(g.begin) == np.asarray(g2.begin)).all()
    assert (np.asarray(g.node_idx) == np.asarray(g2.node_idx)).all()
    assert (np.asarray(g.r_node_idx) == np.asarray(g2.r_node_idx)).all()
    assert (np.asarray(g.e_rev2idx) == np.asarray(g2.e_rev2idx)).all()
    assert (perm2 == perm3).all()


def test_parse_edge_list(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# comment\n0 1\n1\t2\n2 0 extra ignored\n")
    src, dst = native.parse_edge_list(str(p))
    assert src.tolist() == [0, 1, 2] and dst.tolist() == [1, 2, 0]


def test_rmat_deterministic():
    a = native.rmat_edges(1024, 8192, seed=7)
    b = native.rmat_edges(1024, 8192, seed=7)
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all()
    assert (a[0] != a[1]).all()   # no self loops
    deg = np.bincount(a[0], minlength=1024)
    assert np.sort(deg)[-102:].sum() > 0.25 * 8192  # skew
