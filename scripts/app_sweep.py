"""Sweep: compile + EXECUTE every reference .gm app through the DSL
pipeline on a small RMAT graph (CPU), with generically synthesized
arguments.  Tracks the lowerable-subset count (VERDICT r1 item 6).

Usage: python scripts/app_sweep.py [--no-opt]
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from green_marl_tpu.graph import generate as gen  # noqa: E402
from green_marl_tpu.graph.csr import from_edges  # noqa: E402
from green_marl_tpu.lang.lower import LowerError, compile_file  # noqa: E402

PRIM_DEFAULT = {
    "INT": 4, "LONG": 4, "FLOAT": 0.3, "DOUBLE": 0.3, "BOOL": True,
}


def arg_value(t, g, rng):
    k = t.kind
    if k == "GRAPH":
        return g
    if k in PRIM_DEFAULT:
        return PRIM_DEFAULT[k]
    if k in ("NODE",):
        return jnp.asarray(1, jnp.int32)
    if k in ("EDGE",):
        return jnp.asarray(0, jnp.int32)
    if k == "NODEPROP":
        base = t.elem.kind if t.elem is not None else "DOUBLE"
        if base in ("INT", "LONG", "NODE", "EDGE"):
            return jnp.zeros((g.n_pad,), jnp.int32)
        if base == "BOOL":
            return jnp.zeros((g.n_pad,), jnp.bool_)
        if base == "NSET":
            return "SKIP"    # N_P<Node_Set>: let _bind allocate the
            #                  bit matrix (potential_friends.gm)
        return jnp.zeros((g.n_pad,), jnp.float32)
    if k == "EDGEPROP":
        base = t.elem.kind if t.elem is not None else "DOUBLE"
        if base in ("INT", "LONG", "NODE", "EDGE"):
            return jnp.ones((g.e_pad,), jnp.int32)
        if base == "BOOL":
            return jnp.zeros((g.e_pad,), jnp.bool_)
        return jnp.asarray(rng.random(g.e_pad).astype(np.float32))
    if k == "NSET":
        return "SKIP"        # output-style: let _bind allocate empty
    if k in ("NSEQ", "NORDER"):
        return np.array([1, 2, 3], np.int32)   # e.g. bc.gm seed list
    return None


def main():
    do_opt = "--no-opt" not in sys.argv
    src, dst = gen.rmat_edges(200, 1200, seed=3)
    g, _ = from_edges(src, dst, 200)
    rng = np.random.default_rng(0)

    ok, fail = [], []
    for f in sorted(glob.glob("/root/reference/apps/src/*.gm")):
        name = os.path.basename(f)[:-3]
        try:
            cp = compile_file(f, optimize=do_opt)
            proc = cp.proc
            kwargs = {}
            for a in proc.args:
                if a.type.kind == "GRAPH":
                    continue
                for nm in a.names:
                    v = arg_value(a.type, g, rng)
                    if v is None:
                        raise LowerError(
                            f"no generic value for arg type {a.type.kind}")
                    if isinstance(v, str) and v == "SKIP":
                        continue
                    kwargs[nm] = v
            cp(g, **kwargs)
            ok.append(name)
        except Exception as e:  # noqa
            fail.append((name, f"{type(e).__name__}: {str(e)[:100]}"))
    print(f"EXEC OK: {len(ok)}/27")
    for n in ok:
        print("  ok  ", n)
    for n, e in fail:
        print("  FAIL", n, "--", e)
    return 0


if __name__ == "__main__":
    sys.exit(main())
