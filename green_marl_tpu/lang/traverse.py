"""Reusable AST traversal / transformation framework.

The reference compiler routes every analysis and rewrite through a
visitor-class hierarchy: ``gm_apply`` with pre/post ``apply`` hooks per
node kind, lhs/rhs matching state, scope ``begin_context``/``end_context``
events, and driver helpers (``gm_traverse_sents`` / ``_ids`` / ``_exprs``
/ ``gm_traverse_up_sent``, ``src/inc/gm_traverse.h:9-290``), plus the
surgery helpers of ``src/inc/gm_transform_helper.h`` (e.g.
``gm_replace_subexpr:155``).  This module is the equivalent for the
dataclass AST of :mod:`gm_ast`:

* :class:`Visitor` — pre/post hooks over statements, expressions and
  identifiers, with lhs/rhs tagging for assignment-class statements
  (``apply_lhs``/``apply_rhs`` + ``get_matching_lhs``/``_rhs_top``),
  subtree pruning by returning ``False`` from a pre hook, and
  ``begin_context``/``end_context`` around scope-introducing nodes
  (Procedure / Foreach / BFS — the nodes that own symtabs in the
  reference).
* :func:`traverse` / :func:`traverse_stmts` / :func:`traverse_exprs` /
  :func:`traverse_ids` — the driver entry points.
* :func:`build_parent_map` + :func:`traverse_up` — the
  ``gm_traverse_up_sent`` analog (the dataclass AST carries no parent
  pointers; the map is built in one pass).
* :class:`Transformer` + :func:`transform` — bottom-up in-place
  rewriting: ``rewrite_expr`` returns a replacement expression (or
  ``None`` to keep), ``rewrite_stmt`` a statement, a list (spliced into
  the enclosing block), or ``None``.
* :func:`replace_subexpr` — ``gm_replace_subexpr`` by identity.

Unlike the reference there is no ``set_for_*`` flag protocol: hooks are
methods you override, and the driver only pays for the ones present.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Union

from . import gm_ast as A

# statement-kind -> (expression fields, child-statement fields), in
# source order; BFS bodies handle begin/end_traverse_reverse specially
_STMT_EXPRS: Dict[type, List[str]] = {
    A.VarDecl: ["init"],
    A.Assign: ["lhs", "rhs"],
    A.ReduceAssign: ["lhs", "rhs"],
    A.DeferAssign: ["lhs", "rhs"],
    A.If: ["cond"],
    A.While: ["cond"],
    A.Return: ["value"],
    A.CallStmt: ["call"],
    A.ForeignStmt: ["expr"],
}
_STMT_BODIES: Dict[type, List[str]] = {
    A.Foreach: ["body"],
    A.If: ["then", "els"],
    A.While: ["body"],
    A.BFS: ["body_fw", "body_bw"],
}
_SCOPED = (A.Procedure, A.Foreach, A.BFS)

# expression-kind -> child expression fields, in source order
_EXPR_KIDS: Dict[type, List[str]] = {
    A.UnOp: ["operand"],
    A.Cast: ["operand"],
    A.BinOp: ["lhs", "rhs"],
    A.Ternary: ["cond", "then", "els"],
    A.MapAccess: ["key"],
    A.ReduceExpr: ["filter", "body"],
}


class Visitor:
    """Base visitor; override any subset of the hooks.

    Pre hooks (``visit_stmt`` / ``visit_expr``) may return ``False`` to
    prune the subtree (children are skipped, the post hook still runs).
    During the expressions of an assignment-class statement,
    ``matching_lhs`` / ``matching_rhs_top`` name the enclosing side
    roots and ``current_stmt`` the statement — the reference's
    ``get_matching_lhs()`` / ``get_matching_rhs_top()`` /
    ``get_current_sent()`` state (gm_traverse.h:104-117, 196-203).
    """

    current_stmt: Optional[A.Stmt] = None
    matching_lhs: Optional[A.Expr] = None
    matching_rhs_top: Optional[A.Expr] = None

    # -- statement / expression / id hooks (pre, post) ----------------
    def visit_proc(self, p: A.Procedure):          # apply(ast_procdef*)
        pass

    def visit_stmt(self, s: A.Stmt):               # apply(ast_sent*)
        pass

    def visit_stmt_post(self, s: A.Stmt):          # apply2(ast_sent*)
        pass

    def visit_expr(self, e: A.Expr):               # apply(ast_expr*)
        pass

    def visit_expr_post(self, e: A.Expr):          # apply2(ast_expr*)
        pass

    def visit_id(self, name: str, owner):          # apply(ast_id*)
        pass

    # -- lhs/rhs tagging (apply_lhs / apply_rhs) ----------------------
    def visit_lhs(self, root: A.Expr, stmt: A.Stmt):
        pass

    def visit_rhs(self, root: A.Expr, stmt: A.Stmt):
        pass

    # -- scope events -------------------------------------------------
    def begin_context(self, node):
        pass

    def end_context(self, node):
        pass

    # -- BFS reverse-body brackets ------------------------------------
    def begin_traverse_reverse(self, bfs: A.BFS):
        pass

    def end_traverse_reverse(self, bfs: A.BFS):
        pass


def _visit_expr_tree(e: Optional[A.Expr], v: Visitor):
    if e is None:
        return
    pruned = v.visit_expr(e) is False
    if not pruned:
        if isinstance(e, A.Ident):
            v.visit_id(e.name, e)
        elif isinstance(e, A.Field):
            v.visit_id(e.driver, e)
        elif isinstance(e, A.MapAccess):
            v.visit_id(e.map_name, e)
        elif isinstance(e, A.Builtin):
            if e.driver:
                v.visit_id(e.driver, e)
            if e.driver_field is not None:
                _visit_expr_tree(e.driver_field, v)
            for a in e.args:
                _visit_expr_tree(a, v)
        elif isinstance(e, A.ReduceExpr):
            _visit_iter_ids(e.iterator, v)
        for f in _EXPR_KIDS.get(type(e), ()):
            _visit_expr_tree(getattr(e, f), v)
    v.visit_expr_post(e)


def _visit_iter_ids(it: Optional[A.Iterator], v: Visitor):
    if it is None:
        return
    v.visit_id(it.var, it)
    if it.source_field is not None:
        _visit_expr_tree(it.source_field, v)
    elif it.source:
        v.visit_id(it.source, it)


_ASSIGNS = (A.Assign, A.ReduceAssign, A.DeferAssign)


def _visit_stmt_tree(s: Optional[A.Stmt], v: Visitor):
    if s is None:
        return
    prev = v.current_stmt
    v.current_stmt = s
    scoped = isinstance(s, _SCOPED)
    if scoped:
        v.begin_context(s)
    try:
        pruned = v.visit_stmt(s) is False
        if not pruned:
            _visit_stmt_parts(s, v)
        v.visit_stmt_post(s)
    finally:
        if scoped:
            v.end_context(s)
        v.current_stmt = prev


def _visit_stmt_parts(s: A.Stmt, v: Visitor):
    if isinstance(s, A.Block):
        for sub in s.stmts:
            _visit_stmt_tree(sub, v)
        return
    if isinstance(s, _ASSIGNS):
        v.matching_lhs, v.matching_rhs_top = s.lhs, s.rhs
        v.visit_lhs(s.lhs, s)
        _visit_expr_tree(s.lhs, v)
        v.visit_rhs(s.rhs, s)
        _visit_expr_tree(s.rhs, v)
        v.matching_lhs = v.matching_rhs_top = None
        return
    if isinstance(s, A.ArgMinMaxAssign):
        v.matching_lhs, v.matching_rhs_top = s.lhs, s.rhs
        for x in [s.lhs] + list(s.lhs_extra):
            v.visit_lhs(x, s)
            _visit_expr_tree(x, v)
        for x in [s.rhs] + list(s.rhs_extra):
            v.visit_rhs(x, s)
            _visit_expr_tree(x, v)
        v.matching_lhs = v.matching_rhs_top = None
        return
    if isinstance(s, A.VarDecl):
        for n in s.names:
            v.visit_id(n, s)
        _visit_expr_tree(s.init, v)
        return
    if isinstance(s, A.Foreach):
        _visit_iter_ids(s.iterator, v)
        _visit_expr_tree(s.filter, v)
        _visit_stmt_tree(s.body, v)
        return
    if isinstance(s, A.BFS):
        v.visit_id(s.var, s)
        v.visit_id(s.root, s)
        v.visit_id(s.source_graph, s)
        for e in (s.navigator, s.filter_fw, s.filter_bw):
            _visit_expr_tree(e, v)
        _visit_stmt_tree(s.body_fw, v)
        if s.body_bw is not None:
            v.begin_traverse_reverse(s)
            _visit_stmt_tree(s.body_bw, v)
            v.end_traverse_reverse(s)
        return
    if isinstance(s, A.ForeignStmt):
        _visit_expr_tree(s.expr, v)
        for m in s.mutated:
            _visit_expr_tree(m, v)
        return
    for f in _STMT_EXPRS.get(type(s), ()):
        _visit_expr_tree(getattr(s, f), v)
    for f in _STMT_BODIES.get(type(s), ()):
        _visit_stmt_tree(getattr(s, f), v)


def traverse(root: Union[A.Procedure, A.Stmt, A.Expr], v: Visitor):
    """Walk ``root`` applying every hook ``v`` overrides (the
    ``ast_procdef::traverse`` driver)."""
    if isinstance(root, A.Procedure):
        v.begin_context(root)
        try:
            v.visit_proc(root)
            for d in root.args + root.out_args:
                for n in d.names:
                    v.visit_id(n, d)
            _visit_stmt_tree(root.body, v)
        finally:
            v.end_context(root)
    elif isinstance(root, A.Stmt):
        _visit_stmt_tree(root, v)
    else:
        _visit_expr_tree(root, v)
    return v


class _FnVisitor(Visitor):
    def __init__(self, **hooks: Callable):
        for k, fn in hooks.items():
            setattr(self, k, fn)


def traverse_stmts(root, fn: Callable[[A.Stmt], None], post=False):
    """``gm_traverse_sents`` — every statement, pre- (default) or
    post-order."""
    traverse(root, _FnVisitor(**{"visit_stmt_post" if post
                                 else "visit_stmt": fn}))


def traverse_exprs(root, fn: Callable[[A.Expr], None], post=False):
    """``gm_traverse_exprs`` — every expression node."""
    traverse(root, _FnVisitor(**{"visit_expr_post" if post
                                 else "visit_expr": fn}))


def traverse_ids(root, fn: Callable[[str, object], None]):
    """``gm_traverse_ids`` — every identifier occurrence with its
    owning node (Ident / Field / MapAccess / Builtin / Iterator /
    VarDecl / BFS / ArgDecl)."""
    traverse(root, _FnVisitor(visit_id=fn))


# ---- parent map + upward walk (gm_traverse_up_sent) ----------------------

def build_parent_map(root) -> Dict[int, object]:
    """id(node) -> parent node for every statement/expression under
    ``root`` (the dataclass AST has no parent pointers; the reference
    stores them on each node, gm_ast.h `get_parent`)."""
    pmap: Dict[int, object] = {}

    class _P(Visitor):
        def __init__(self):
            self.stack: List[object] = [root]

        def visit_stmt(self, s):
            if s is not root:
                pmap[id(s)] = self.stack[-1]
            self.stack.append(s)

        def visit_stmt_post(self, s):
            self.stack.pop()

        def visit_expr(self, e):
            pmap[id(e)] = self.stack[-1]
            self.stack.append(e)

        def visit_expr_post(self, e):
            self.stack.pop()

    traverse(root, _P())
    return pmap


def traverse_up(node, pmap: Dict[int, object],
                fn: Callable[[object], bool]) -> bool:
    """Apply ``fn`` to ``node`` and each ancestor until it returns
    ``False`` (stop; return False) or the root is passed (return True)
    — ``gm_traverse_up_sent`` (gm_traverse.h:285)."""
    cur = node
    while cur is not None:
        if fn(cur) is False:
            return False
        cur = pmap.get(id(cur))
    return True


# ---- bottom-up transformer ----------------------------------------------

class Transformer:
    """Override ``rewrite_expr`` / ``rewrite_stmt``; return a
    replacement node (or a statement list, spliced into the enclosing
    Block), or ``None`` to keep the original.  Children are rewritten
    before their parent (bottom-up), so a rewrite sees already-reduced
    operands."""

    def rewrite_expr(self, e: A.Expr) -> Optional[A.Expr]:
        return None

    def rewrite_stmt(self, s: A.Stmt) \
            -> Optional[Union[A.Stmt, List[A.Stmt]]]:
        return None


def _tx_expr(e: Optional[A.Expr], t: Transformer) -> Optional[A.Expr]:
    if e is None:
        return None
    for f in _EXPR_KIDS.get(type(e), ()):
        setattr(e, f, _tx_expr(getattr(e, f), t))
    if isinstance(e, A.Builtin):
        if e.driver_field is not None:
            e.driver_field = _tx_expr(e.driver_field, t)
        e.args = [_tx_expr(a, t) for a in e.args]
    if isinstance(e, A.ReduceExpr) and e.iterator is not None \
            and e.iterator.source_field is not None:
        e.iterator.source_field = _tx_expr(e.iterator.source_field, t)
    r = t.rewrite_expr(e)
    return e if r is None else r


def _tx_stmt(s: Optional[A.Stmt], t: Transformer) \
        -> Optional[Union[A.Stmt, List[A.Stmt]]]:
    if s is None:
        return None
    if isinstance(s, A.Block):
        out: List[A.Stmt] = []
        for sub in s.stmts:
            r = _tx_stmt(sub, t)
            out.extend(r) if isinstance(r, list) else out.append(r)
        s.stmts = out
    else:
        for f in _STMT_EXPRS.get(type(s), ()):
            setattr(s, f, _tx_expr(getattr(s, f), t))
        if isinstance(s, A.ArgMinMaxAssign):
            s.lhs = _tx_expr(s.lhs, t)
            s.rhs = _tx_expr(s.rhs, t)
            s.lhs_extra = [_tx_expr(x, t) for x in s.lhs_extra]
            s.rhs_extra = [_tx_expr(x, t) for x in s.rhs_extra]
        if isinstance(s, A.Foreach):
            s.filter = _tx_expr(s.filter, t)
            if s.iterator is not None \
                    and s.iterator.source_field is not None:
                s.iterator.source_field = _tx_expr(
                    s.iterator.source_field, t)
        if isinstance(s, A.ForeignStmt):
            s.mutated = [_tx_expr(m, t) for m in s.mutated]
        if isinstance(s, A.BFS):
            s.navigator = _tx_expr(s.navigator, t)
            s.filter_fw = _tx_expr(s.filter_fw, t)
            s.filter_bw = _tx_expr(s.filter_bw, t)
        for f in _STMT_BODIES.get(type(s), ()):
            sub = getattr(s, f)
            if sub is None:
                continue
            r = _tx_stmt(sub, t)
            if isinstance(r, list):      # non-block body got spliced:
                r = A.Block(stmts=r)     # re-wrap to keep arity
            setattr(s, f, r)
    r = t.rewrite_stmt(s)
    return s if r is None else r


def transform(root: Union[A.Procedure, A.Stmt], t: Transformer):
    """Rewrite in place; returns ``root`` (with a fresh body if the
    top statement itself was replaced)."""
    if isinstance(root, A.Procedure):
        r = _tx_stmt(root.body, t)
        root.body = A.Block(stmts=r) if isinstance(r, list) else r
        return root
    r = _tx_stmt(root, t)
    return A.Block(stmts=r) if isinstance(r, list) else r


def replace_subexpr(root: Union[A.Procedure, A.Stmt, A.Expr],
                    old: A.Expr, new: A.Expr) -> bool:
    """Replace the subexpression ``old`` (by identity) with ``new``
    everywhere under ``root`` — ``gm_replace_subexpr``
    (gm_transform_helper.h:155).  Returns True if found."""
    hit = [False]

    class _R(Transformer):
        def rewrite_expr(self, e):
            if e is old:
                hit[0] = True
                return new
            return None

    if isinstance(root, A.Expr):
        # top-level expression roots cannot be replaced in place;
        # walk children only (matches the reference helper's contract)
        _tx_expr(root, _R())
    else:
        transform(root, _R())
    return hit[0]
