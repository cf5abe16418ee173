"""Backend-independent AST optimizer (the reference's ``src/opt/``).

AST -> AST passes mirroring the reference pipeline order
(``src/opt/gm_ind_opt.cc:15-24``):

==================  =====================================================
pass                reference
==================  =====================================================
sugar2              ``gm_syntax_sugar2.cc`` — expand inline reductions
                    ``Sum(t: ...){e}`` into explicit Foreach + reduce-
                    assign on a fresh temp (worked example
                    ``doc/gm_comp.md:112-140``)
move_propdecl       ``gm_moveup_propdecl.cc`` — hoist property decls out
                    of sequential (While/Do) loops so the buffer is
                    allocated once (here: outside the traced loop body)
flip_edges          ``gm_flip_edges.cc`` — rewrite pull loops
                    (outer Nodes x inner InNbrs, reduction-only body) as
                    push over out-neighbors and vice versa
loop_merge          ``gm_merge_loops.cc`` — fuse adjacent Foreach over
                    the same domain when their RW sets don't conflict
                    (worked example ``doc/gm_comp.md:142-168``)
nonconf_reduce      ``gm_opt_nonconf_reduce.cc`` — demote reductions
                    that cannot conflict (LHS driven by the immediate
                    parallel iterator) to plain read-modify-writes
prop_trivial        ``gm_opt_propagate_trivial_writes.cc`` — forward
                    constant scalar writes into subsequent statements
remove_unused       ``gm_opt_remove_unused_scalar.cc`` — drop scalar
                    temporaries (and their defining statements) that are
                    never read
==================  =====================================================

Passes are semantics-preserving; the test suite checks this by executing
the lowered program before/after each pass on random graphs (something
the reference's golden-text tests cannot do).
"""

from __future__ import annotations

import copy
import itertools
from typing import Callable, Dict, List, Optional, Set, Tuple

from . import gm_ast as A

# ---------------------------------------------------------------------------
# small AST walking helpers


def _walk_stmts(s: A.Stmt):
    """Yield every statement node (pre-order)."""
    yield s
    if isinstance(s, A.Block):
        for sub in s.stmts:
            yield from _walk_stmts(sub)
    elif isinstance(s, A.Foreach):
        yield from _walk_stmts(s.body)
    elif isinstance(s, A.If):
        yield from _walk_stmts(s.then)
        if s.els is not None:
            yield from _walk_stmts(s.els)
    elif isinstance(s, A.While):
        yield from _walk_stmts(s.body)
    elif isinstance(s, A.BFS):
        yield from _walk_stmts(s.body_fw)
        if s.body_bw is not None:
            yield from _walk_stmts(s.body_bw)


def _walk_exprs_of(s: A.Stmt):
    """Yield the expression roots attached directly to a statement."""
    if isinstance(s, A.VarDecl) and s.init is not None:
        yield s.init
    elif isinstance(s, A.Assign):
        yield s.lhs
        yield s.rhs
    elif isinstance(s, (A.ReduceAssign, A.DeferAssign)):
        yield s.lhs
        yield s.rhs
    elif isinstance(s, A.ArgMinMaxAssign):
        yield s.lhs
        yield from s.lhs_extra
        yield s.rhs
        yield from s.rhs_extra
    elif isinstance(s, A.Foreach):
        if s.filter is not None:
            yield s.filter
    elif isinstance(s, A.If):
        yield s.cond
    elif isinstance(s, A.While):
        yield s.cond
    elif isinstance(s, A.Return) and s.value is not None:
        yield s.value
    elif isinstance(s, A.CallStmt):
        yield s.call
    elif isinstance(s, A.BFS):
        for e in (s.navigator, s.filter_fw, s.filter_bw):
            if e is not None:
                yield e


def _walk_expr(e: A.Expr):
    yield e
    if isinstance(e, A.UnOp):
        yield from _walk_expr(e.operand)
    elif isinstance(e, A.Cast):
        yield from _walk_expr(e.operand)
    elif isinstance(e, A.BinOp):
        yield from _walk_expr(e.lhs)
        yield from _walk_expr(e.rhs)
    elif isinstance(e, A.Ternary):
        yield from _walk_expr(e.cond)
        yield from _walk_expr(e.then)
        yield from _walk_expr(e.els)
    elif isinstance(e, A.Builtin):
        if e.driver_field is not None:
            yield from _walk_expr(e.driver_field)
        for a in e.args:
            yield from _walk_expr(a)
    elif isinstance(e, A.ReduceExpr):
        if e.filter is not None:
            yield from _walk_expr(e.filter)
        if e.body is not None:
            yield from _walk_expr(e.body)
    elif isinstance(e, A.MapAccess):
        yield from _walk_expr(e.key)


def _idents_read(e: A.Expr) -> Set[str]:
    out = set()
    for sub in _walk_expr(e):
        if isinstance(sub, A.Ident):
            out.add(sub.name)
        elif isinstance(sub, A.Field):
            out.add(sub.driver)
            out.add(sub.prop)
        elif isinstance(sub, A.Builtin):
            if sub.driver:
                out.add(sub.driver)
        elif isinstance(sub, A.MapAccess):
            out.add(sub.map_name)
        elif isinstance(sub, A.ReduceExpr):
            out.add(sub.iterator.source)
            if sub.iterator.source_field is not None:
                out.add(sub.iterator.source_field.driver)
                out.add(sub.iterator.source_field.prop)
    return out


def _props_read(s: A.Stmt, skip_lhs: bool = False) -> Set[str]:
    out: Set[str] = set()
    for st in _walk_stmts(s):
        exprs = list(_walk_exprs_of(st))
        if skip_lhs and isinstance(
                st, (A.Assign, A.ReduceAssign, A.DeferAssign)):
            exprs = [st.rhs]
        for e in exprs:
            for sub in _walk_expr(e):
                if isinstance(sub, A.Field):
                    out.add(sub.prop)
                elif isinstance(sub, A.Ident):
                    out.add(sub.name)
    return out


def _written_syms(s: A.Stmt) -> Set[str]:
    """Names (scalars and properties) written anywhere under ``s``."""
    out: Set[str] = set()
    for st in _walk_stmts(s):
        lhss = []
        if isinstance(st, (A.Assign, A.ReduceAssign, A.DeferAssign)):
            lhss = [st.lhs]
        elif isinstance(st, A.ArgMinMaxAssign):
            lhss = [st.lhs] + list(st.lhs_extra)
        for lhs in lhss:
            if isinstance(lhs, A.Ident):
                out.add(lhs.name)
            elif isinstance(lhs, A.Field):
                out.add(lhs.prop)
            elif isinstance(lhs, A.MapAccess):
                out.add(lhs.map_name)
    return out


def _lhs_infos(s: A.Stmt) -> List[Tuple[str, Optional[str]]]:
    """(name, driver) pairs for every write under ``s`` (driver None for
    scalars)."""
    out = []
    for st in _walk_stmts(s):
        lhss = []
        if isinstance(st, (A.Assign, A.ReduceAssign, A.DeferAssign)):
            lhss = [st.lhs]
        elif isinstance(st, A.ArgMinMaxAssign):
            lhss = [st.lhs] + list(st.lhs_extra)
        for lhs in lhss:
            if isinstance(lhs, A.Ident):
                out.append((lhs.name, None))
            elif isinstance(lhs, A.Field):
                out.append((lhs.prop, lhs.driver))
            elif isinstance(lhs, A.MapAccess):
                out.append((lhs.map_name, None))
    return out


def _prop_accesses(s: A.Stmt) -> List[Tuple[str, str]]:
    """(prop, driver) pairs for every property READ under ``s``."""
    out = []
    for st in _walk_stmts(s):
        for e in _walk_exprs_of(st):
            for sub in _walk_expr(e):
                if isinstance(sub, A.Field):
                    out.append((sub.prop, sub.driver))
    return out


class _TempNames:
    def __init__(self):
        self.n = itertools.count()

    def fresh(self, prefix="_gm"):
        return f"{prefix}{next(self.n)}"


# ---------------------------------------------------------------------------
# pass: sugar2 — expand inline reduction expressions

_RED_IDENT = {
    "SUM": A.Const(value=0, ctype="INT"),
    "COUNT": A.Const(value=0, ctype="INT"),
    "PRODUCT": A.Const(value=1, ctype="INT"),
    "MIN": A.Const(value=float("inf"), ctype="INF"),
    "MAX": A.Const(value=float("-inf"), ctype="INF"),
    "AND": A.Const(value=True, ctype="BOOL"),
    "OR": A.Const(value=False, ctype="BOOL"),
}
_RED_TYPE = {
    "COUNT": A.Type(kind="LONG"), "AND": A.Type(kind="BOOL"),
    "OR": A.Type(kind="BOOL"),
}


def _infer_reduce_type(e: A.ReduceExpr) -> A.Type:
    if e.op in _RED_TYPE:
        return copy.deepcopy(_RED_TYPE[e.op])
    if e.op == "AVG":
        return A.Type(kind="DOUBLE")
    # SUM/PRODUCT/MIN/MAX take the body's syntactic hint: float consts or
    # division force float; otherwise leave widest-prim Double for safety
    # on SUM/AVG, and Int stays exact under MIN/MAX of ints.  Without full
    # type info the safe choice is Double except for obviously-int bodies.
    for sub in _walk_expr(e.body):
        if isinstance(sub, A.Const) and sub.ctype in ("FLOAT", "INF"):
            return A.Type(kind="DOUBLE")
        if isinstance(sub, A.BinOp) and sub.op == "/":
            return A.Type(kind="DOUBLE")
    return A.Type(kind="DOUBLE") if e.op == "SUM" else A.Type(kind="INT")


def _expand_reduce(e: A.ReduceExpr, names: _TempNames,
                   prelude: List[A.Stmt]) -> A.Expr:
    """Append decl+init+Foreach computing ``e`` to prelude; return temp."""
    if e.op == "AVG":
        # Avg(it)(f){b}  ->  Sum{b} / (Double) Count(f)
        s = A.ReduceExpr(op="SUM", iterator=copy.deepcopy(e.iterator),
                         filter=copy.deepcopy(e.filter),
                         body=copy.deepcopy(e.body))
        c = A.ReduceExpr(op="COUNT", iterator=copy.deepcopy(e.iterator),
                         filter=copy.deepcopy(e.filter),
                         body=A.Const(value=1, ctype="INT"))
        sv = _expand_reduce(s, names, prelude)
        cv = _expand_reduce(c, names, prelude)
        one = A.Const(value=1, ctype="INT")
        denom = A.Ternary(cond=A.BinOp(op="<", lhs=copy.deepcopy(cv),
                                       rhs=one),
                          then=A.Const(value=1, ctype="INT"),
                          els=copy.deepcopy(cv))
        return A.BinOp(op="/", lhs=sv,
                       rhs=A.Cast(to=A.Type(kind="DOUBLE"), operand=denom))
    tmp = names.fresh("_rx")
    t = _infer_reduce_type(e)
    prelude.append(A.VarDecl(type=t, names=[tmp],
                             init=copy.deepcopy(_RED_IDENT[e.op])))
    body_expr = (A.Const(value=1, ctype="INT") if e.op == "COUNT"
                 else copy.deepcopy(e.body))
    op = "SUM" if e.op == "COUNT" else e.op
    filt = copy.deepcopy(e.filter)
    if e.op == "COUNT" and e.body is not None and not (
            isinstance(e.body, A.Const) and e.body.value == 1):
        cond = copy.deepcopy(e.body)
        filt = cond if filt is None else A.BinOp(op="&&", lhs=filt,
                                                 rhs=cond)
    red = A.ReduceAssign(lhs=A.Ident(name=tmp), rhs=body_expr, op=op,
                         bind=e.iterator.var)
    prelude.append(A.Foreach(iterator=copy.deepcopy(e.iterator),
                             filter=filt,
                             body=A.Block(stmts=[red]), sequential=False))
    return A.Ident(name=tmp)


def _rewrite_expr_reductions(e: A.Expr, names, prelude) -> A.Expr:
    """Replace every ReduceExpr inside ``e`` (outermost-first)."""
    if isinstance(e, A.ReduceExpr):
        inner = copy.deepcopy(e)
        return _expand_reduce(inner, names, prelude)
    if isinstance(e, A.UnOp):
        e.operand = _rewrite_expr_reductions(e.operand, names, prelude)
    elif isinstance(e, A.Cast):
        e.operand = _rewrite_expr_reductions(e.operand, names, prelude)
    elif isinstance(e, A.BinOp):
        e.lhs = _rewrite_expr_reductions(e.lhs, names, prelude)
        e.rhs = _rewrite_expr_reductions(e.rhs, names, prelude)
    elif isinstance(e, A.Ternary):
        e.cond = _rewrite_expr_reductions(e.cond, names, prelude)
        e.then = _rewrite_expr_reductions(e.then, names, prelude)
        e.els = _rewrite_expr_reductions(e.els, names, prelude)
    elif isinstance(e, A.Builtin):
        e.args = [_rewrite_expr_reductions(a, names, prelude)
                  for a in e.args]
    elif isinstance(e, A.MapAccess):
        e.key = _rewrite_expr_reductions(e.key, names, prelude)
    return e


def _sugar2_block(b: A.Block, names: _TempNames, in_parallel: bool):
    new_stmts: List[A.Stmt] = []
    for s in b.stmts:
        prelude: List[A.Stmt] = []
        # Only expand at statement level OUTSIDE parallel bodies: inside a
        # parallel Foreach the vectorizing lowerer evaluates nested
        # reductions directly as segment ops (faster than the expansion).
        if not in_parallel and isinstance(s, (A.Assign, A.VarDecl)):
            tgt = s.rhs if isinstance(s, A.Assign) else s.init
            if tgt is not None and any(
                    isinstance(x, A.ReduceExpr) for x in _walk_expr(tgt)):
                new = _rewrite_expr_reductions(tgt, names, prelude)
                if isinstance(s, A.Assign):
                    s.rhs = new
                else:
                    s.init = new
        _sugar2_stmt(s, names, in_parallel)
        new_stmts.extend(prelude)
        new_stmts.append(s)
    b.stmts = new_stmts


def _sugar2_stmt(s: A.Stmt, names, in_parallel):
    if isinstance(s, A.Block):
        _sugar2_block(s, names, in_parallel)
    elif isinstance(s, A.Foreach):
        par = in_parallel or not s.sequential
        if isinstance(s.body, A.Block):
            _sugar2_block(s.body, names, par)
        else:
            _sugar2_stmt(s.body, names, par)
    elif isinstance(s, A.If):
        _sugar2_stmt(s.then, names, in_parallel)
        if s.els is not None:
            _sugar2_stmt(s.els, names, in_parallel)
    elif isinstance(s, A.While):
        _sugar2_stmt(s.body, names, in_parallel)
    elif isinstance(s, A.BFS):
        _sugar2_stmt(s.body_fw, names, True)
        if s.body_bw is not None:
            _sugar2_stmt(s.body_bw, names, True)


def sugar2(proc: A.Procedure) -> A.Procedure:
    """Expand inline reduce-expressions in sequential scope into explicit
    Foreach + reduce-assign (``gm_syntax_sugar2.cc``)."""
    names = _TempNames()
    _sugar2_block(proc.body, names, in_parallel=False)
    return proc


# ---------------------------------------------------------------------------
# pass: move_propdecl — hoist property decls out of While/Do loops


def _hoist_propdecls(b: A.Block, hoisted: List[A.VarDecl],
                     inside_loop: bool, taken: Set[str]):
    out = []
    for s in b.stmts:
        if inside_loop and isinstance(s, A.VarDecl) and \
                s.type.is_property() and s.init is None and \
                not any(n in taken for n in s.names):
            hoisted.append(s)
            taken.update(s.names)
            continue
        if isinstance(s, A.While):
            if isinstance(s.body, A.Block):
                _hoist_propdecls(s.body, hoisted, True, taken)
        elif isinstance(s, A.Block):
            _hoist_propdecls(s, hoisted, inside_loop, taken)
        elif isinstance(s, A.If):
            for sub in (s.then, s.els):
                if isinstance(sub, A.Block):
                    _hoist_propdecls(sub, hoisted, inside_loop, taken)
        elif isinstance(s, A.Foreach) and s.sequential:
            if isinstance(s.body, A.Block):
                _hoist_propdecls(s.body, hoisted, True, taken)
        out.append(s)
    b.stmts = out


def move_propdecl(proc: A.Procedure) -> A.Procedure:
    """Hoist property declarations out of sequential loops so the dense
    array is allocated once (``gm_moveup_propdecl.cc``)."""
    hoisted: List[A.VarDecl] = []
    taken: Set[str] = set()
    _hoist_propdecls(proc.body, hoisted, False, taken)
    proc.body.stmts = hoisted + proc.body.stmts
    return proc


# ---------------------------------------------------------------------------
# pass: flip_edges — pull <-> push rewrite

_FLIP = {"IN_NBRS": "NBRS", "NBRS": "IN_NBRS"}


def _is_reduce_only(b: A.Stmt) -> bool:
    stmts = b.stmts if isinstance(b, A.Block) else [b]
    return all(isinstance(s, (A.ReduceAssign, A.DeferAssign)) and
               s.bind is not None for s in stmts)


def flip_edges(proc: A.Procedure,
               direction: str = "IN_NBRS") -> A.Procedure:
    """Rewrite ``Foreach(n: G.Nodes) Foreach(t: n.InNbrs) <reduce>`` as the
    push form ``Foreach(t: G.Nodes) Foreach(n: t.Nbrs) <reduce>``
    (``gm_flip_edges.cc``; forced for Pregel targets by ``-FlipPull``,
    ``src/common/gm_main.cc:182,187``).  The (src,dst) pair multiset is
    identical, and reduction bodies are order-independent, so semantics
    are preserved."""
    def visit(s):
        if isinstance(s, A.Block):
            s.stmts = [visit(x) for x in s.stmts]
            return s
        if isinstance(s, (A.If,)):
            s.then = visit(s.then)
            if s.els is not None:
                s.els = visit(s.els)
            return s
        if isinstance(s, A.While):
            s.body = visit(s.body)
            return s
        if isinstance(s, A.Foreach):
            inner = s.body
            if isinstance(inner, A.Block) and len(inner.stmts) == 1:
                inner = inner.stmts[0]
            if (not s.sequential and s.iterator.iter_type == "NODES"
                    and s.filter is None
                    and isinstance(inner, A.Foreach)
                    and not inner.sequential
                    and inner.iterator.iter_type == direction
                    and inner.iterator.source == s.iterator.var
                    and _is_reduce_only(inner.body)):
                n, t = s.iterator.var, inner.iterator.var
                new_outer_it = A.Iterator(var=t, source=s.iterator.source,
                                          iter_type="NODES")
                new_inner_it = A.Iterator(var=n, source=t,
                                          iter_type=_FLIP[direction])
                new_inner = A.Foreach(iterator=new_inner_it,
                                      filter=inner.filter,
                                      body=inner.body, sequential=False)
                return A.Foreach(iterator=new_outer_it, filter=None,
                                 body=A.Block(stmts=[new_inner]),
                                 sequential=False)
            s.body = visit(s.body)
            return s
        return s

    proc.body = visit(proc.body)
    return proc


# ---------------------------------------------------------------------------
# pass: loop_merge — fuse adjacent same-domain Foreach


def _same_domain(a: A.Iterator, b: A.Iterator) -> bool:
    return (a.iter_type == b.iter_type == "NODES" or
            a.iter_type == b.iter_type == "EDGES") and \
        a.source == b.source and a.source_field is None and \
        b.source_field is None and a.reverse == b.reverse


def _rename_ident(s: A.Stmt, old: str, new: str):
    for st in _walk_stmts(s):
        if isinstance(st, A.Foreach):
            if st.iterator.source == old:
                st.iterator.source = new
        for e in _walk_exprs_of(st):
            for sub in _walk_expr(e):
                if isinstance(sub, A.Ident) and sub.name == old:
                    sub.name = new
                elif isinstance(sub, A.Field) and sub.driver == old:
                    sub.driver = new
                elif isinstance(sub, A.Builtin) and sub.driver == old:
                    sub.driver = new
                elif isinstance(sub, A.ReduceExpr):
                    if sub.iterator.source == old:
                        sub.iterator.source = new
        if isinstance(st, (A.ReduceAssign, A.DeferAssign,
                           A.ArgMinMaxAssign)) and st.bind == old:
            st.bind = new


def _merge_safe(l1: A.Foreach, l2: A.Foreach) -> bool:
    """Conservative RW check: every symbol written by one loop and touched
    by the other must be accessed LINEAR-by-driver on both sides (the
    reference consults its rw_analysis maps the same way)."""
    v1, v2 = l1.iterator.var, l2.iterator.var
    w1 = dict()
    for name, drv in _lhs_infos(l1.body):
        w1.setdefault(name, set()).add(drv)
    w2 = dict()
    for name, drv in _lhs_infos(l2.body):
        w2.setdefault(name, set()).add(drv)
    r1 = dict()
    for p, d in _prop_accesses(l1.body):
        r1.setdefault(p, set()).add(d)
    r2 = dict()
    for p, d in _prop_accesses(l2.body):
        r2.setdefault(p, set()).add(d)
    for name in set(w1) | set(w2):
        drvs1 = w1.get(name, set()) | r1.get(name, set())
        drvs2 = w2.get(name, set()) | r2.get(name, set())
        touched1 = name in w1 or name in r1
        touched2 = name in w2 or name in r2
        if (name in w1 and touched2) or (name in w2 and touched1):
            # every access must be linear by own loop driver
            if not (drvs1 <= {v1} and drvs2 <= {v2}):
                return False
    # scalar reads of one loop must not be scalar writes of the other
    s1r = set().union(*(
        _idents_read(e) for st in _walk_stmts(l1.body)
        for e in _walk_exprs_of(st))) if True else set()
    s2r = set().union(*(
        _idents_read(e) for st in _walk_stmts(l2.body)
        for e in _walk_exprs_of(st))) if True else set()
    sw1 = {n for n, d in _lhs_infos(l1.body) if d is None}
    sw2 = {n for n, d in _lhs_infos(l2.body) if d is None}
    if (sw1 & s2r) or (sw2 & s1r) or (sw1 & sw2):
        return False
    return True


def loop_merge(proc: A.Procedure) -> A.Procedure:
    """Fuse adjacent conflict-free Foreach loops over the same domain
    (``gm_merge_loops.cc``; example ``doc/gm_comp.md:142-168``)."""
    def visit_block(b: A.Block):
        out: List[A.Stmt] = []
        for s in b.stmts:
            visit_stmt(s)
            if out and isinstance(s, A.Foreach) and \
                    isinstance(out[-1], A.Foreach):
                l1, l2 = out[-1], s
                if (not l1.sequential and not l2.sequential
                        and l1.filter is None and l2.filter is None
                        and _same_domain(l1.iterator, l2.iterator)
                        and _merge_safe(l1, l2)):
                    body2 = copy.deepcopy(l2.body)
                    _rename_ident(body2, l2.iterator.var,
                                  l1.iterator.var)
                    stmts1 = (l1.body.stmts if isinstance(l1.body, A.Block)
                              else [l1.body])
                    stmts2 = (body2.stmts if isinstance(body2, A.Block)
                              else [body2])
                    # re-bind @-bounds of the second body
                    for st in stmts2:
                        pass
                    l1.body = A.Block(stmts=stmts1 + stmts2)
                    continue
            out.append(s)
        b.stmts = out

    def visit_stmt(s: A.Stmt):
        if isinstance(s, A.Block):
            visit_block(s)
        elif isinstance(s, A.Foreach) and isinstance(s.body, A.Block):
            visit_block(s.body)
        elif isinstance(s, A.If):
            visit_stmt(s.then)
            if s.els is not None:
                visit_stmt(s.els)
        elif isinstance(s, A.While):
            visit_stmt(s.body)

    visit_block(proc.body)
    return proc


# ---------------------------------------------------------------------------
# pass: nonconf_reduce — demote conflict-free reductions


def nonconf_reduce(proc: A.Procedure) -> A.Procedure:
    """``n.x += e @ n`` where ``n`` is the immediate parallel iterator is
    conflict-free (LINEAR access): rewrite to a plain read-modify-write
    (``gm_opt_nonconf_reduce.cc``).  In the reference this drops the
    atomic; here it lets the lowerer use a dense vector update instead of
    a segment reduction."""
    _COMB = {"SUM": "+", "PRODUCT": "*"}

    def visit(s: A.Stmt, loop_var: Optional[str]):
        if isinstance(s, A.Block):
            s.stmts = [visit(x, loop_var) for x in s.stmts]
            return s
        if isinstance(s, A.Foreach):
            s.body = visit(s.body, s.iterator.var if not s.sequential
                           else loop_var)
            return s
        if isinstance(s, A.If):
            s.then = visit(s.then, loop_var)
            if s.els is not None:
                s.els = visit(s.els, loop_var)
            return s
        if isinstance(s, A.While):
            s.body = visit(s.body, None)
            return s
        if isinstance(s, A.ReduceAssign) and loop_var is not None and \
                isinstance(s.lhs, A.Field) and s.lhs.driver == loop_var \
                and (s.bind is None or s.bind == loop_var):
            if s.op in _COMB:
                return A.Assign(
                    lhs=s.lhs,
                    rhs=A.BinOp(op=_COMB[s.op],
                                lhs=copy.deepcopy(s.lhs), rhs=s.rhs),
                    loc=s.loc)
        return s

    proc.body = visit(proc.body, None)
    return proc


# ---------------------------------------------------------------------------
# pass: prop_trivial + remove_unused — copy-prop and scalar DCE


def prop_trivial(proc: A.Procedure) -> A.Procedure:
    """Forward scalar constants written exactly once at top level into
    later reads (``gm_opt_propagate_trivial_writes.cc``)."""
    writes: Dict[str, int] = {}
    const_of: Dict[str, A.Const] = {}
    for st in _walk_stmts(proc.body):
        for name, drv in _lhs_infos(st):
            if drv is None:
                writes[name] = writes.get(name, 0) + 1
    for st in proc.body.stmts:
        if isinstance(st, A.VarDecl) and st.init is not None and \
                isinstance(st.init, A.Const) and len(st.names) == 1 and \
                writes.get(st.names[0], 0) == 0:
            const_of[st.names[0]] = st.init
        elif isinstance(st, A.Assign) and isinstance(st.lhs, A.Ident) \
                and isinstance(st.rhs, A.Const) and \
                writes.get(st.lhs.name, 0) == 1:
            const_of[st.lhs.name] = st.rhs

    if not const_of:
        return proc

    def subst(e: A.Expr) -> A.Expr:
        if isinstance(e, A.Ident) and e.name in const_of:
            return copy.deepcopy(const_of[e.name])
        for attr in ("operand", "lhs", "rhs", "cond", "then", "els",
                     "key", "body", "filter"):
            if hasattr(e, attr):
                v = getattr(e, attr)
                if isinstance(v, A.Expr):
                    setattr(e, attr, subst(v))
        if isinstance(e, A.Builtin):
            e.args = [subst(a) for a in e.args]
        return e

    for st in _walk_stmts(proc.body):
        if isinstance(st, A.Assign):
            st.rhs = subst(st.rhs)
        elif isinstance(st, (A.ReduceAssign, A.DeferAssign)):
            st.rhs = subst(st.rhs)
        elif isinstance(st, A.VarDecl) and st.init is not None and not (
                len(st.names) == 1 and st.names[0] in const_of):
            st.init = subst(st.init)
        elif isinstance(st, A.If):
            st.cond = subst(st.cond)
        elif isinstance(st, A.While):
            st.cond = subst(st.cond)
        elif isinstance(st, A.Foreach) and st.filter is not None:
            st.filter = subst(st.filter)
        elif isinstance(st, A.Return) and st.value is not None:
            st.value = subst(st.value)
    return proc


def remove_unused(proc: A.Procedure) -> A.Procedure:
    """Drop never-read scalar temporaries and their defining statements
    (``gm_opt_remove_unused_scalar.cc``).  Output args, returns, and
    property/collection symbols are kept."""
    keep: Set[str] = set()
    for d in proc.args + proc.out_args:
        keep.update(d.names)

    changed = True
    while changed:
        changed = False
        read: Set[str] = set(keep)
        for st in _walk_stmts(proc.body):
            exprs = []
            if isinstance(st, (A.Assign, A.ReduceAssign, A.DeferAssign)):
                exprs.append(st.rhs)
                if isinstance(st.lhs, A.Field):
                    read.add(st.lhs.driver)
                if isinstance(st.lhs, A.MapAccess):
                    read.add(st.lhs.map_name)
                    exprs.append(st.lhs.key)
            elif isinstance(st, A.ArgMinMaxAssign):
                exprs += [st.rhs] + list(st.rhs_extra)
                for x in [st.lhs] + list(st.lhs_extra):
                    if isinstance(x, A.Field):
                        read.add(x.driver)
                    elif isinstance(x, A.Ident):
                        # the reduction READS its targets (primary for
                        # the compare, extras for the group write) —
                        # dropping a target's decl/init while the
                        # argminmax survives breaks the program
                        read.add(x.name)
            elif isinstance(st, A.VarDecl) and st.init is not None:
                exprs.append(st.init)
            else:
                exprs += list(_walk_exprs_of(st))
            if isinstance(st, A.Foreach):
                read.add(st.iterator.source)
                if st.iterator.source_field is not None:
                    read.add(st.iterator.source_field.driver)
                    read.add(st.iterator.source_field.prop)
            if isinstance(st, A.BFS):
                read.add(st.root)
                read.add(st.source_graph)
            for e in exprs:
                read |= _idents_read(e)

        def prune(b: A.Block) -> bool:
            ch = False
            out = []
            for s in b.stmts:
                if isinstance(s, A.Assign) and isinstance(s.lhs, A.Ident) \
                        and s.lhs.name not in read:
                    ch = True
                    continue
                if isinstance(s, A.ReduceAssign) and \
                        isinstance(s.lhs, A.Ident) and \
                        s.lhs.name not in read:
                    ch = True
                    continue
                if isinstance(s, A.VarDecl) and s.type.kind in \
                        A.PRIM_TYPES and \
                        all(n not in read for n in s.names):
                    ch = True
                    continue
                if isinstance(s, A.Block):
                    ch |= prune(s)
                elif isinstance(s, A.Foreach) and \
                        isinstance(s.body, A.Block):
                    ch |= prune(s.body)
                elif isinstance(s, A.If):
                    for sub in (s.then, s.els):
                        if isinstance(sub, A.Block):
                            ch |= prune(sub)
                elif isinstance(s, A.While) and isinstance(s.body, A.Block):
                    ch |= prune(s.body)
                out.append(s)
            b.stmts = out
            return ch

        changed = prune(proc.body)

    # drop Foreach loops whose bodies became empty
    def drop_empty(b: A.Block):
        out = []
        for s in b.stmts:
            if isinstance(s, A.Foreach) and isinstance(s.body, A.Block):
                drop_empty(s.body)
                if not s.body.stmts:
                    continue
            elif isinstance(s, A.Block):
                drop_empty(s)
            out.append(s)
        b.stmts = out

    drop_empty(proc.body)
    return proc


# ---------------------------------------------------------------------------
# driver

def _stmt_rw(s: A.Stmt):
    """Conservative (reads, writes) over scalar symbols and property
    names (props prefixed '$') for hoisting legality."""
    reads: Set[str] = set()
    for st in _walk_stmts(s):
        for e in _walk_exprs_of(st):
            reads |= _idents_read(e)
        # iteration sources are reads too (Foreach(s: x.Nbrs) depends
        # on x; hoisting past a write/declaration of x reorders wrongly)
        if isinstance(st, A.Foreach):
            it = st.iterator
            if it.source:
                reads.add(it.source)
            if it.common_with:
                reads.add(it.common_with)
            if it.source_field is not None:
                reads.add("$" + it.source_field.prop)
                reads.add(it.source_field.driver)
        if isinstance(st, A.BFS):
            reads.add(st.root)
    reads |= {"$" + p for p in _props_read(s)}
    writes: Set[str] = set()
    for name, _ in _lhs_infos(s):
        writes.add(name)
    for st in _walk_stmts(s):
        if isinstance(st, (A.Assign, A.ReduceAssign, A.DeferAssign)):
            if isinstance(st.lhs, A.Field):
                writes.add("$" + st.lhs.prop)
        if isinstance(st, A.ArgMinMaxAssign):
            for lhs in [st.lhs] + list(st.lhs_extra):
                if isinstance(lhs, A.Field):
                    writes.add("$" + lhs.prop)
        if isinstance(st, A.VarDecl):
            for nm in st.names:
                writes.add(nm)
                if st.type.is_property():
                    writes.add("$" + nm)
        if isinstance(st, A.CallStmt):
            if st.call.driver is not None:
                writes.add(st.call.driver)
            if st.call.driver_field is not None:
                # set-valued property mutators: v.S.Add(w) writes $S
                writes.add("$" + st.call.driver_field.prop)
                reads.add(st.call.driver_field.driver)
        # EXPRESSION-position collection mutators also write their
        # driver (``x = Q.PopBack()`` as an Assign rhs / VarDecl init):
        # without this, hoist_foreach/hoist_assign could reorder a
        # Foreach reading Q across the pop (advisor r3, medium)
        for e in _walk_exprs_of(st):
            for sub in _walk_subexprs(e):
                if isinstance(sub, A.Builtin) and \
                        sub.name.lower() in _MUTATE_METHODS:
                    if sub.driver is not None:
                        writes.add(sub.driver)
                    if sub.driver_field is not None:
                        writes.add("$" + sub.driver_field.prop)
    return reads, writes


_MUTATE_METHODS = {"add", "remove", "clear", "pushback", "pushfront",
                   "popback", "popfront", "push", "pop", "union",
                   "intersect", "complement"}


def _walk_subexprs(e):
    if not isinstance(e, A.Expr):
        return
    yield e
    for attr in ("lhs", "rhs", "operand", "cond", "then", "els", "body",
                 "filter", "key"):
        sub = getattr(e, attr, None)
        if isinstance(sub, A.Expr):
            yield from _walk_subexprs(sub)
    for sub in getattr(e, "args", []) or []:
        yield from _walk_subexprs(sub)


def _hoist_conflict(a: A.Stmt, b: A.Stmt) -> bool:
    ra, wa = _stmt_rw(a)
    rb, wb = _stmt_rw(b)
    return bool((wa & (rb | wb)) | (ra & wb))


def _hoistable_past(s: A.Stmt) -> bool:
    # never move across control constructs whose execution count is
    # data-dependent or which sequence side effects
    return not isinstance(s, (A.While, A.BFS, A.Return, A.ForeignStmt))


def hoist_foreach(proc: A.Procedure) -> A.Procedure:
    """Bubble parallel Foreach statements upward past independent
    statements so same-domain loops become adjacent for ``loop_merge``
    (``gm_hoist_foreach.cc``)."""
    def visit_block(b: A.Block):
        for s in b.stmts:
            visit_stmt(s)
        i = 1
        while i < len(b.stmts):
            s = b.stmts[i]
            if isinstance(s, A.Foreach) and not s.sequential:
                j = i
                while j > 0:
                    prev = b.stmts[j - 1]
                    if isinstance(prev, A.Foreach) or \
                            not _hoistable_past(prev) or \
                            _hoist_conflict(prev, s):
                        break
                    b.stmts[j - 1], b.stmts[j] = s, prev
                    j -= 1
            i += 1

    def visit_stmt(s: A.Stmt):
        if isinstance(s, A.Block):
            visit_block(s)
        elif isinstance(s, A.Foreach):
            visit_stmt(s.body)
        elif isinstance(s, A.If):
            visit_stmt(s.then)
            if s.els is not None:
                visit_stmt(s.els)
        elif isinstance(s, A.While):
            visit_stmt(s.body)

    visit_stmt(proc.body)
    return proc


def hoist_assign(proc: A.Procedure) -> A.Procedure:
    """Bubble scalar assignments/declarations upward past independent
    Foreach loops (``gm_hoist_assign.cc``) — clears the space between
    mergeable loops."""
    def visit_block(b: A.Block):
        for s in b.stmts:
            visit_stmt(s)
        i = 1
        while i < len(b.stmts):
            s = b.stmts[i]
            if isinstance(s, (A.Assign, A.VarDecl)) and not (
                    isinstance(s, A.Assign)
                    and not isinstance(s.lhs, A.Ident)):
                j = i
                while j > 0:
                    prev = b.stmts[j - 1]
                    if not isinstance(prev, A.Foreach) or \
                            _hoist_conflict(prev, s):
                        break
                    b.stmts[j - 1], b.stmts[j] = s, prev
                    j -= 1
            i += 1

    def visit_stmt(s: A.Stmt):
        if isinstance(s, A.Block):
            visit_block(s)
        elif isinstance(s, A.Foreach):
            visit_stmt(s.body)
        elif isinstance(s, A.If):
            visit_stmt(s.then)
            if s.els is not None:
                visit_stmt(s.els)
        elif isinstance(s, A.While):
            visit_stmt(s.body)

    visit_stmt(proc.body)
    return proc


def dead_store_elim(proc: A.Procedure) -> A.Procedure:
    """Reaching-defs consumer (``gm_reaching_def_analysis.cc`` analog):
    drops full definitions killed before any use, un-blocking
    hoist/merge across the removed store (lang.reaching_defs)."""
    from .reaching_defs import dead_store_elim as _dse
    return _dse(proc)


def const_fold(proc: A.Procedure) -> A.Procedure:
    """Constant folding + dead-branch elimination, written against the
    visitor/transform framework (lang.traverse).  The reference has no
    dedicated fold pass — its C++ compiler folds the emitted text — but
    here folded conditions feed `lax.cond`-free lowering and let
    `remove_unused`/`dead_store_elim` fire on the exposed dead code.
    C semantics are preserved: INT division truncates toward zero, a
    constant 0 divisor is left in place (the runtime's business), and
    INF/NIL literals never fold."""
    from .traverse import Transformer, transform

    NUM = ("INT", "FLOAT")

    def _const(e):
        return e if isinstance(e, A.Const) and e.ctype in (
            "INT", "FLOAT", "BOOL") else None

    def _mk(value, ctype, loc):
        return A.Const(loc=loc, value=value, ctype=ctype)

    class _Fold(Transformer):
        def rewrite_expr(self, e):
            if isinstance(e, A.UnOp):
                c = _const(e.operand)
                if c is None:
                    return None
                if e.op == "NEG" and c.ctype in NUM:
                    return _mk(-c.value, c.ctype, e.loc)
                if e.op == "NOT" and c.ctype == "BOOL":
                    return _mk(not c.value, "BOOL", e.loc)
                if e.op == "ABS" and c.ctype in NUM:
                    return _mk(abs(c.value), c.ctype, e.loc)
                return None
            if isinstance(e, A.Ternary):
                c = _const(e.cond)
                if c is not None and c.ctype == "BOOL":
                    return e.then if c.value else e.els
                return None
            if not isinstance(e, A.BinOp):
                return None
            lc, rc = _const(e.lhs), _const(e.rhs)
            if e.op in ("&&", "||"):
                for this, other in ((lc, e.rhs), (rc, e.lhs)):
                    if this is not None and this.ctype == "BOOL":
                        if e.op == "&&":
                            return other if this.value \
                                else _mk(False, "BOOL", e.loc)
                        return _mk(True, "BOOL", e.loc) \
                            if this.value else other
                return None
            if lc is None or rc is None or lc.ctype not in NUM \
                    or rc.ctype not in NUM:
                return None
            a, b = lc.value, rc.value
            out_t = "FLOAT" if "FLOAT" in (lc.ctype, rc.ctype) \
                else "INT"
            if e.op in ("+", "-", "*"):
                v = a + b if e.op == "+" else (
                    a - b if e.op == "-" else a * b)
                return _mk(v, out_t, e.loc)
            if e.op == "/" and b != 0:
                if out_t == "FLOAT":
                    v = a / b
                else:
                    # C truncation toward zero, in exact integer
                    # arithmetic (float division would mis-round
                    # operands beyond 2^53)
                    q = abs(a) // abs(b)
                    v = q if (a < 0) == (b < 0) else -q
                return _mk(v, out_t, e.loc)
            if e.op in ("<", ">", "<=", ">=", "==", "!="):
                v = {"<": a < b, ">": a > b, "<=": a <= b,
                     ">=": a >= b, "==": a == b, "!=": a != b}[e.op]
                return _mk(v, "BOOL", e.loc)
            return None

        def rewrite_stmt(self, s):
            if isinstance(s, A.If):
                c = _const(s.cond)
                if c is not None and c.ctype == "BOOL":
                    taken = s.then if c.value else s.els
                    return taken if taken is not None \
                        else A.Block(loc=s.loc, stmts=[])
            if isinstance(s, A.While) and not s.do_while:
                c = _const(s.cond)
                if c is not None and c.ctype == "BOOL" \
                        and c.value is False:
                    return A.Block(loc=s.loc, stmts=[])
            return None

    return transform(proc, _Fold())


DEFAULT_PASSES: List[Tuple[str, Callable[[A.Procedure], A.Procedure]]] = [
    ("const_fold", const_fold),
    ("sugar2", sugar2),
    ("move_propdecl", move_propdecl),
    ("dead_store_elim", dead_store_elim),
    ("hoist_assign", hoist_assign),
    ("hoist_foreach", hoist_foreach),
    ("loop_merge", loop_merge),
    ("nonconf_reduce", nonconf_reduce),
    ("prop_trivial", prop_trivial),
    ("remove_unused", remove_unused),
]


def default_pipeline():
    """The backend-independent pass schedule as a steps.Pipeline
    (``gm_ind_opt.cc prepare_steps`` analog)."""
    from .steps import FunctionStep, Pipeline
    return Pipeline([FunctionStep(n, f) for n, f in DEFAULT_PASSES])


def optimize(procs, passes=None, clone: bool = True, pipeline=None,
             probe_affected: bool = False):
    """Run the backend-independent pipeline (``gm_ind_opt.cc:15-24``
    equivalent) over one procedure or a list.  ``passes`` selects a
    named subset; ``pipeline`` substitutes a whole steps.Pipeline;
    ``probe_affected`` records per-pass changed flags in its trace
    (costs two reproduce() serializations per pass — diagnostics
    only)."""
    single = isinstance(procs, A.Procedure)
    if single:
        procs = [procs]
    if clone:
        procs = copy.deepcopy(procs)
    pipe = pipeline if pipeline is not None else default_pipeline()
    if passes is not None:
        pipe = pipe.subset(passes)
    out = [pipe.run(p, probe_affected=probe_affected) for p in procs]
    return out[0] if single else out
