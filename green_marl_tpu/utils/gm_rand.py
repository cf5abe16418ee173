"""Bit-exact replica of the reference host RNG (``gm_rand.h``/``.cc``).

``gm_rand32``: xorshift-style int32 recurrence with the reference's own
quirks preserved — the middle step is a plain *arithmetic* right shift
assignment (``next = next >> 17``, not xor), and C ``%`` truncates toward
zero (negative draws give negative remainders).  The app mains seed
per-run state with the default 2463534242u and derive edge weights /
memberships from it (``sssp_main.cc:21-34``, ``conduct_main.cc:20-38``);
reproducing the sequence exactly is what makes value-level output parity
possible on generated inputs.
"""

from __future__ import annotations

import numpy as np


class GmRand32:
    DEFAULT_SEED = np.uint32(2463534242)

    def __init__(self, seed: int | None = None):
        s = self.DEFAULT_SEED if seed is None else np.uint32(seed)
        self.next = np.int32(s.view(np.int32) if hasattr(s, "view")
                             else np.uint32(s).astype(np.int32))

    def rand(self) -> int:
        with np.errstate(over="ignore"):
            n = self.next
            n = np.int32(n ^ np.int32(np.uint32(n) << np.uint32(13)))
            n = np.int32(n >> 17)          # arithmetic shift (reference)
            n = np.int32(n ^ np.int32(np.uint32(n) << np.uint32(5)))
            self.next = n
        return int(n)

    def sequence(self, count: int) -> np.ndarray:
        """[count] int32 draws (host loop; fixture-scale use only)."""
        out = np.empty(count, np.int64)
        for i in range(count):
            out[i] = self.rand()
        return out


def c_mod(a: np.ndarray, m: int) -> np.ndarray:
    """C's truncating ``%`` (numpy's ``%`` floors)."""
    return np.sign(a) * (np.abs(a) % m)


def sssp_edge_lengths(num_edges: int) -> np.ndarray:
    """``len[i] = (rand() % 100) + 1`` over edges in CSR order
    (sssp_main.cc:31-33).  Native (OpenMP-side C loop) beyond fixture
    scale; the Python recurrence covers small inputs and environments
    without the compiled helper."""
    if num_edges > 1_000_000:
        from ..graph import native
        out = native.xorshift_lengths(num_edges, 100, 1)
        if out is not None:
            return out
    r = GmRand32().sequence(num_edges)
    return (c_mod(r, 100) + 1).astype(np.int32)


def conduct_membership(num_nodes: int) -> np.ndarray:
    """10/20/30/40% membership split (conduct_main.cc:27-38)."""
    r = c_mod(GmRand32().sequence(num_nodes), 100)
    m = np.full(num_nodes, 3, np.int32)
    m[r < 60] = 2
    m[r < 30] = 1
    m[r < 10] = 0
    return m
