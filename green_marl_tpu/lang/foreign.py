"""Native execution of ``[ C++ ]`` foreign escapes.

The reference cpp backend splices foreign text verbatim into its
generated C++ (``src/parse/gm_parse_foreign_syntax.cc:1-261``,
``test/parse/p10.gm``) with ``$var`` references bound to the enclosing
scope and an optional ``::[x, ...]`` mutation list naming what the text
writes.  The TPU-native analog keeps the semantics AND the language:
the same text is compiled by g++ into a tiny shared object (the
toolchain the reference's output needs anyway) and executed on the
HOST against the DSL scalar values, with the mutation list written
back.  Scope mirrors the reference's distributed backend limits:

* scalar symbols only (``$x``); ``$n.prop`` field refs are rejected
  (the GPS backend cannot place foreign text either);
* host execution on CONCRETE values — a foreign escape inside traced
  device control flow is rejected with a remedy;
* a text that does not compile (undefined user functions, e.g.
  ``my_function`` in p10.gm) raises with the g++ diagnostic — exactly
  when the reference's generated .cc would fail to build.

Compiled objects are content-hashed and cached per process + on disk.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import re
import subprocess
import tempfile
from typing import Dict, List, Tuple

import numpy as np

_REF = re.compile(r"\$([A-Za-z_][A-Za-z0-9_]*)"
                  r"(\s*\.\s*[A-Za-z_][A-Za-z0-9_]*)?")

_SO_CACHE: Dict[str, ctypes.CDLL] = {}
_DIR = None

_PRELUDE = """#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
"""

_CTYPE = {
    np.dtype(np.int32): ("int32_t", ctypes.c_int32),
    np.dtype(np.int64): ("int64_t", ctypes.c_int64),
    np.dtype(np.float32): ("float", ctypes.c_float),
    np.dtype(np.float64): ("double", ctypes.c_double),
    np.dtype(np.bool_): ("uint8_t", ctypes.c_uint8),
}


class ForeignError(Exception):
    pass


def _refs(text: str) -> List[Tuple[str, bool]]:
    """Ordered unique $refs; (name, is_field)."""
    out, seen = [], set()
    for m in _REF.finditer(text):
        name = m.group(1)
        is_field = m.group(2) is not None
        if (name, is_field) not in seen:
            seen.add((name, is_field))
            out.append((name, is_field))
    return out


def _scalar_np(v):
    """Concrete scalar -> 0-d numpy array; None if not scalar-like."""
    import jax
    if isinstance(v, jax.core.Tracer):
        return None
    if isinstance(v, (bool, int, float, np.generic)):
        return np.asarray(v)
    if isinstance(v, (jax.Array, np.ndarray)):
        a = np.asarray(v)
        return a if a.ndim == 0 else None
    return None


def _compile(src: str, tag: str) -> ctypes.CDLL:
    global _DIR
    h = hashlib.sha256(src.encode()).hexdigest()[:16]
    if h in _SO_CACHE:
        return _SO_CACHE[h]
    if _DIR is None:
        _DIR = tempfile.mkdtemp(prefix="gm_foreign_")
    cc = os.path.join(_DIR, f"f_{h}.cc")
    so = os.path.join(_DIR, f"f_{h}.so")
    if not os.path.exists(so):
        with open(cc, "w") as f:
            f.write(src)
        r = subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", so, cc],
            capture_output=True, text=True, timeout=60)
        if r.returncode != 0:
            raise ForeignError(
                f"foreign C++ {tag} does not compile (the reference's "
                f"generated .cc would fail the same way):\n"
                + r.stderr.strip()[:800])
    lib = ctypes.CDLL(so)
    _SO_CACHE[h] = lib
    return lib


def _bind(text: str, env, loc_tag: str):
    """Resolve $refs against env -> (c_args_decl, call_values, subs)."""
    import jax
    params = []
    values = []
    subs = {}
    for name, is_field in _refs(text):
        if is_field:
            raise ForeignError(
                f"foreign {loc_tag}: ${name}.<field> references are not "
                "supported in this backend (scalar $refs only; the "
                "reference GPS backend rejects foreign text entirely)")
        if name not in env:
            raise ForeignError(
                f"foreign {loc_tag}: unbound symbol ${name}")
        v = env[name]
        if isinstance(v, jax.core.Tracer):
            raise ForeignError(
                f"foreign {loc_tag}: ${name} is traced (foreign text "
                "runs on the host; move it outside jit/while control "
                "flow)")
        a = _scalar_np(v)
        if a is None or a.dtype not in _CTYPE:
            raise ForeignError(
                f"foreign {loc_tag}: ${name} is not a host scalar "
                "(scalar Int/Long/Float/Double/Bool only)")
        cty, pyty = _CTYPE[a.dtype]
        params.append((name, cty, pyty, a.dtype))
        values.append(a)
        subs[name] = f"(*p_{name})"
    body = _REF.sub(lambda m: subs[m.group(1)], text)
    return params, values, body


def exec_stmt(lw, s, env) -> None:
    """Run a ForeignStmt: compile, call, write back the mutation list."""
    text = s.expr.text
    mutated = []
    for m in s.mutated:
        nm = getattr(m, "name", None)
        if nm is None:
            raise ForeignError(
                "foreign statement: only scalar mutation targets are "
                "supported (::[x])")
        mutated.append(nm)
    params, values, body = _bind(text, env, "statement")
    names = [p[0] for p in params]
    for nm in mutated:
        if nm not in names:
            # mutation listed but not referenced: still pass it through
            params2, values2, _ = _bind(f"${nm}", env, "statement")
            params.extend(params2)
            values.extend(values2)
            names.append(nm)
    arglist = ", ".join(f"{cty}* p_{nm}" for nm, cty, _, _ in params)
    src = (_PRELUDE
           + f'extern "C" void gm_foreign({arglist}) {{\n'
           + f"  {body};\n}}\n")
    lib = _compile(src, "statement")
    fn = lib.gm_foreign
    fn.restype = None
    fn.argtypes = [ctypes.POINTER(p[2]) for p in params]
    boxes = [p[2](v.item()) for p, v in zip(params, values)]
    fn(*[ctypes.byref(b) for b in boxes])
    import jax.numpy as jnp
    for nm in mutated:
        i = names.index(nm)
        dt = params[i][3]
        lw._wr(env, nm, jnp.asarray(np.asarray(boxes[i].value, dt)))


def eval_expr(lw, e, env):
    """Evaluate a foreign expression ([sin($y)/2]); typed DOUBLE like
    the typechecker assumes."""
    params, values, body = _bind(e.text, env, "expression")
    arglist = ", ".join(f"{cty}* p_{nm}" for nm, cty, _, _ in params)
    src = (_PRELUDE
           + f'extern "C" double gm_foreign({arglist}) {{\n'
           + f"  return (double)({body});\n}}\n")
    lib = _compile(src, "expression")
    fn = lib.gm_foreign
    fn.restype = ctypes.c_double
    fn.argtypes = [ctypes.POINTER(p[2]) for p in params]
    boxes = [p[2](v.item()) for p, v in zip(params, values)]
    out = fn(*[ctypes.byref(b) for b in boxes])
    import jax.numpy as jnp
    from .lower import _float_dtype
    return jnp.asarray(out, _float_dtype())
