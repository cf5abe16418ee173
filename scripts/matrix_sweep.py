#!/usr/bin/env python
"""Config-matrix sweep (the ``test_all.sh`` analog, reference
``scripts/test_all.sh:40-58``: programs x placement configs x thread
counts, each run VERIFIED).

Runs each app through the CLI over the full placement matrix on the
virtual 8-device CPU mesh:

    apps x {1 chip} x {8 chips: distribute | engine | replicate}

and asserts every configuration's protocol output agrees with the
single-chip run (numerically for float ranks).  One command, green or
dead: ``python scripts/matrix_sweep.py``.
"""
import io
import os
import re
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# apps with a sharded path x the placement policies each supports
MATRIX = [
    ("pagerank", ["distribute", "engine", "replicate"]),
    ("hop_dist", ["distribute", "engine", "replicate"]),
    ("sssp", ["distribute", "engine", "replicate"]),
    ("conduct", ["distribute"]),
    ("avg_teen_cnt", ["distribute"]),
    ("multi_bfs", ["engine"]),
]

VAL_RE = re.compile(r"^(\w+)\[(\d+)\] = (.+)$")


def run_cli(args):
    from green_marl_tpu.cli.apps import main
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(args)
    out = buf.getvalue()
    assert rc == 0, f"{args} -> rc={rc}\n{out[-2000:]}"
    vals = {}
    for ln in out.splitlines():
        mm = VAL_RE.match(ln.strip())
        if mm:
            vals[f"{mm.group(1)}[{mm.group(2)}]"] = float(mm.group(3))
        tm = re.search(r"traversed=(\d+)", ln)
        if tm:
            vals["traversed"] = float(tm.group(1))
        rm = re.search(r"returns: ([-0-9.eE]+)", ln)
        if rm:
            vals["_return"] = float(rm.group(1))
    assert vals, f"no protocol values from {args}"
    return vals


def main():
    from green_marl_tpu.graph import binary_io as bio
    from green_marl_tpu.graph import generate as gen
    from green_marl_tpu.graph.csr import from_edges
    src, dst = gen.rmat_edges(400, 3000, seed=7)
    g, _ = from_edges(src, dst, 400)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        # extended binary with a real membership property so conduct's
        # cross-placement comparison is non-trivial
        rng = np.random.default_rng(11)
        member = rng.integers(0, 3, g.num_nodes).astype(np.int32)
        bio.store_binary(path, np.asarray(g.begin),
                         np.asarray(g.node_idx)[: g.num_edges],
                         node_props=[member])
        n_cfg = 0
        for app, placements in MATRIX:
            base = run_cli([app, path])
            for pl in placements:
                got = run_cli([app, "-GMNumChips=8",
                               f"-GMPlacement={pl}", path])
                for k, v in base.items():
                    dv = got.get(k)
                    assert dv is not None, (app, pl, k)
                    ok = (abs(dv - v) <=
                          1e-5 * max(abs(v), 1e-30) + 1e-9)
                    assert ok, (app, pl, k, v, dv)
                n_cfg += 1
                print(f"ok  {app:10s} chips=8 placement={pl} "
                      f"({len(base)} values checked)")
        print(f"MATRIX OK: {len(MATRIX)} apps x placements = "
              f"{n_cfg} sharded configs, all output-verified vs "
              "single-chip")
    return 0


if __name__ == "__main__":
    sys.exit(main())
