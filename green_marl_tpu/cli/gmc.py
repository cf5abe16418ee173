"""``gm_comp`` driver analog: compile .gm files with stage control.

Mirrors the reference compiler CLI (``src/common/gm_main.cc:152-290``,
flags ``src/inc/gm_argopts.h:26-84``) for the stages that exist in this
framework (parse -> typecheck -> rw/race analysis -> independent
optimizer -> lowering):

    python -m green_marl_tpu.cli.gmc file.gm [options]

      -DS=<n>   stop after stage n: 2 = frontend (typecheck),
                3 = independent optimizer (default: full lowering check)
      -Dr       reproduce (pretty-print) the program at the stop stage
                (the golden-output protocol of test/parse, test/sugars,
                test/opt: ``-DS=2.7 -Dr`` etc.)
      -Dw       print the RW/race analysis report (``-Dw``;
                test/rw_check protocol: conflicts are REPORTED, rc 0)
      -Dp       list the optimizer pass schedule (name + description,
                the ``gm_compile_step`` table) and, with -V, the
                per-pass affected trace after stage 3
      -V        verbose stage markers
      -p <name> procedure to compile (default: file-name match / last)

Exit code 0 on success (including reported-but-legal race warnings),
1 on compile errors — never a crash (test/errors protocol).
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    stop = None
    do_repro = False
    do_rw = False
    do_passes = False
    verbose = False
    proc_name = None
    files = []
    try:
        i = 0
        while i < len(argv):
            a = argv[i]
            if a.startswith("-DS="):
                stop = float(a[4:])
            elif a == "-Dr":
                do_repro = True
            elif a == "-Dw":
                do_rw = True
            elif a == "-Dp":
                do_passes = True
            elif a.startswith("-V"):
                verbose = True
            elif a == "-p":
                i += 1
                proc_name = argv[i]
            elif a.startswith("-"):
                print(f"unknown option {a}", file=sys.stderr)
                return 1
            else:
                files.append(a)
            i += 1
    except (IndexError, ValueError) as e:
        print(f"bad arguments: {e}", file=sys.stderr)
        return 1
    if not files:
        print(__doc__)
        return 1

    from ..lang import opt
    from ..lang.parser import parse_file
    from ..lang.reproduce import reproduce
    from ..lang.rw_analysis import analyze
    from ..lang.typecheck import GMTypeError, typecheck

    if do_passes:
        pipe = opt.default_pipeline()
        print(pipe.describe())
    rc = 0
    for f in files:
        try:
            if verbose:
                print(f"..stage 1 parse       {f}", file=sys.stderr)
            procs = parse_file(f)
            if verbose:
                print("..stage 2 frontend (typecheck + rw analysis)",
                      file=sys.stderr)
            typecheck(procs)
            rw = analyze(procs, f)
            for w in rw.warnings:
                print(f"warning: {w}", file=sys.stderr)
            if do_rw:
                print(rw.pretty())
            if stop is not None and stop < 3:
                if do_repro:
                    for p in procs:
                        print(reproduce(p))
                continue
            if verbose:
                print("..stage 3 independent optimizer", file=sys.stderr)
            pipe = opt.default_pipeline() if do_passes else None
            procs = [opt.optimize(p, clone=True, pipeline=pipe,
                                  probe_affected=do_passes and verbose)
                     for p in procs]
            if do_passes and verbose:
                for pn, sn, ok, aff in pipe.trace:
                    print(f"..pass {sn:<16s} [{pn}] "
                          f"{'changed' if aff else 'no change'}",
                          file=sys.stderr)
            typecheck(procs)
            if stop is not None and stop < 4:
                if do_repro:
                    for p in procs:
                        print(reproduce(p))
                continue
            if verbose:
                print("..stage 4 lowering check", file=sys.stderr)
            # lowering feasibility: execute on a tiny deterministic graph
            import warnings as W

            import numpy as np

            from ..lang.lower import CompiledProc, LowerError
            name = proc_name
            if name is None:
                import os
                base = os.path.splitext(os.path.basename(f))[0]
                if any(p.name == base for p in procs):
                    name = base
            cands = [p for p in procs if not p.is_local]
            proc = (next(p for p in procs if p.name == name)
                    if name else cands[-1])
            CompiledProc(proc)          # constructs the lowerer binding
            if do_repro:
                print(reproduce(proc))
            print(f"{f}: ok ({proc.name})")
        except GMTypeError as e:
            print(f"{f}: type error:\n{e}", file=sys.stderr)
            rc = 1
        except SyntaxError as e:
            print(f"{f}: parse error: {e}", file=sys.stderr)
            rc = 1
        except Exception as e:  # never crash (test/errors protocol)
            print(f"{f}: error: {type(e).__name__}: {e}",
                  file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
