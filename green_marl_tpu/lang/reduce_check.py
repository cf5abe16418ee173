"""Reduce-bound and parallel-conflict semantic checks.

The reference runs these after RW analysis as hard errors:

* **Reduce-bound conflicts** (``src/frontend/gm_reduce_error_check.cc``):
  once a target is bound to a (reduce-op, iterator) pair, any reduce of
  the same target visible in an enclosing scope with a different bound
  iterator (GM_ERROR_DOUBLE_BOUND_ITOR, test/errors/e18) or a different
  operator (GM_ERROR_DOUBLE_BOUND_OP, e19/e36) is an error.
* **Read/write-reduce conflicts** (``gm_rw_analysis.cc`` conflict
  classes with ``is_warning=false``): a property that is
  reduce-assigned inside a parallel loop must not also be plain-read
  (GM_ERROR_READ_REDUCE, e22/e37) or plain-written
  (GM_ERROR_WRITE_REDUCE, e23 — defer counts for the write side) in the
  same loop.  WW/RW races stay warnings (``rw_analysis.RaceWarning``).
* **Collection write-while-mutate** (e40/e43): assigning a whole
  collection that is simultaneously mutated (Add/Remove/...) inside a
  parallel loop is an error; mutate-in-two-directions and
  mutate-while-read remain warnings in the reference (e38/39/41/42
  compile) and are accepted here too.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from . import gm_ast as A

_MUTATORS = {"add", "remove", "clear", "push", "pushback", "pushfront",
             "pop", "popback", "popfront", "union", "intersect",
             "complement"}

_COLL_KINDS = {"NSET", "NSEQ", "NORDER", "COLLECTION"}


def _target_key(lhs) -> Optional[str]:
    if isinstance(lhs, A.Ident):
        return lhs.name
    if isinstance(lhs, A.Field):
        return "F$" + lhs.prop
    return None


class _Checker:
    def __init__(self, proc: A.Procedure, filename: str):
        self.proc = proc
        self.filename = filename
        self.errors: List[str] = []
        self.coll_syms: Set[str] = set()
        for a in list(proc.args) + list(proc.out_args):
            if a.type.kind in _COLL_KINDS:
                self.coll_syms.update(a.names)

    def err(self, loc, msg: str):
        line = getattr(loc, "line", 0)
        col = getattr(loc, "col", 0)
        self.errors.append(f"{self.filename}:{line}:{col}: {msg}")

    # ------------------------------------------------------------------
    # generic statement walk with a callback at loop boundaries
    # ------------------------------------------------------------------
    def _sub_stmts(self, s):
        if isinstance(s, A.Block):
            return list(s.stmts)
        out = []
        for attr in ("then", "els", "body", "body_fw", "body_bw"):
            sub = getattr(s, attr, None)
            if sub is not None:
                out.append(sub)
        return out

    # ------------------------------------------------------------------
    # Pass A: reduce-bound conflicts
    # ------------------------------------------------------------------
    def check_bounds(self):
        self._walk_bound_scope(self.proc.body, [])

    @staticmethod
    def _implicit_bind(lhs, loop_stack):
        """The sugar pass's implicit binding for an UNBOUND reduce is
        the OUTERMOST enclosing loop.  Measured against the reference
        binary: unbound ``a.A += 1; b.A += 2`` in nested loops compiles
        (both implicitly bound to ``a`` — privatization handles it,
        test/opt/o8/o11.gm), while the same shape with differing ops is
        DOUBLE_BOUND_OP, and EXPLICIT ``@t``/``@q`` binds on one target
        are DOUBLE_BOUND_ITOR (test/rw_check/rw10.gm)."""
        if not loop_stack:
            return None
        return loop_stack[0]

    def _reduce_entries(self, s, loop_stack):
        """(key, bound_iter, op, loc) for a reduce/defer/argminmax."""
        out = []
        if isinstance(s, A.ReduceAssign):
            k = _target_key(s.lhs)
            b = s.bind or self._implicit_bind(s.lhs, loop_stack)
            if k and b:
                out.append((k, b, s.op, s.loc))
        elif isinstance(s, A.DeferAssign):
            k = _target_key(s.lhs)
            b = s.bind or self._implicit_bind(s.lhs, loop_stack)
            if k and b:
                out.append((k, b, "DEFER", s.loc))
        elif isinstance(s, A.ArgMinMaxAssign):
            b = getattr(s, "bind", None) or \
                self._implicit_bind(s.lhs, loop_stack)
            if b:
                for lhs in [s.lhs] + list(s.lhs_extra):
                    k = _target_key(lhs)
                    if k:
                        out.append((k, b, s.op, s.loc))
        return out

    def _walk_bound_scope(self, body, _):
        """Reference algorithm: DFS; entering a loop, check its bound
        set against the accumulated scope; leaving, remove it."""
        scope: Dict[str, Tuple[str, str]] = {}
        stack: List[Tuple[str, Dict[str, Tuple[str, str]]]] = []

        def enter(loop_var, node, loop_stack):
            added: Dict[str, Tuple[str, str]] = {}
            for (k, b, op, loc) in self._entries_of(node, loop_stack):
                if b != loop_var:
                    continue
                if k in scope:
                    b0, op0 = scope[k]
                    if b0 != b:
                        self.err(loc, "Reduce(Defer) Target already "
                                 f"bound to a different iterator: {b}")
                        continue
                    if op0 != op:
                        self.err(loc, "Reduce(Defer) Target already "
                                 f"bound to a different operator: {op}")
                        continue
                elif k in added:
                    pass
                else:
                    scope[k] = (b, op)
                    added[k] = (b, op)
            return added

        def walk(s, loop_stack):
            if s is None:
                return
            if isinstance(s, A.Foreach):
                added = enter(s.iterator.var, s,
                              loop_stack + [s.iterator.var])
                walk(s.body, loop_stack + [s.iterator.var])
                for k in added:
                    scope.pop(k, None)
                return
            if isinstance(s, A.BFS):
                added = enter(s.var, s, loop_stack + [s.var])
                walk(s.body_fw, loop_stack + [s.var])
                if s.body_bw is not None:
                    walk(s.body_bw, loop_stack + [s.var])
                for k in added:
                    scope.pop(k, None)
                return
            for sub in self._sub_stmts(s):
                walk(sub, loop_stack)

        walk(body, [])

    def _entries_of(self, loop_node, loop_stack):
        """All reduce entries in the subtree of ``loop_node`` whose
        effective bound is ``loop_node``'s iterator."""
        out = []

        def walk(s, stack):
            if s is None:
                return
            if isinstance(s, A.Foreach) and s is not loop_node:
                walk(s.body, stack + [s.iterator.var])
                return
            if isinstance(s, A.BFS) and s is not loop_node:
                walk(s.body_fw, stack + [s.var])
                if s.body_bw is not None:
                    walk(s.body_bw, stack + [s.var])
                return
            if isinstance(s, (A.ReduceAssign, A.DeferAssign,
                              A.ArgMinMaxAssign)):
                out.extend(self._reduce_entries(s, stack))
            for sub in self._sub_stmts(s):
                walk(sub, stack)

        if isinstance(loop_node, A.Foreach):
            walk(loop_node.body, loop_stack)
        else:
            walk(loop_node.body_fw, loop_stack)
            if loop_node.body_bw is not None:
                walk(loop_node.body_bw, loop_stack)
        return out

    # ------------------------------------------------------------------
    # Pass B: property read/write-reduce conflicts inside parallel loops
    # ------------------------------------------------------------------
    def check_prop_conflicts(self):
        # BFS bodies are exempt: Up/DownNbrs accesses are level-ranged
        # (the reference's LEVEL/LEVEL_UP/LEVEL_DOWN access ranges never
        # conflict across levels — test/parse/p7.gm, test/gps/gps16.gm)
        def walk(s):
            if s is None:
                return
            if isinstance(s, A.BFS):
                return
            if isinstance(s, A.Foreach) and not s.sequential:
                self._check_loop_conflicts(s)
                # nested loops are covered by the subtree scan
            for sub in self._sub_stmts(s):
                walk(sub)
        walk(self.proc.body)

    def _check_loop_conflicts(self, loop: A.Foreach):
        # prop -> {driver} + first loc; a read via the same driver as
        # the reduce touches only the thread's own slot (no conflict);
        # a read via a different driver races the reduction
        # (GM_ERROR_READ_REDUCE, test/errors/e22)
        reduces: Dict[str, Tuple[Set[str], object]] = {}
        defers: Dict[str, object] = {}
        writes: Dict[str, object] = {}
        reads: Dict[str, Tuple[Set[str], object]] = {}

        def note(d, prop, driver, loc):
            if prop not in d:
                d[prop] = (set(), loc)
            d[prop][0].add(driver)

        def scan_expr(e):
            if e is None or not isinstance(e, (A.Expr,)):
                return
            if isinstance(e, A.Field):
                note(reads, e.prop, e.driver, e.loc)
            for attr in ("lhs", "rhs", "operand", "cond", "then", "els",
                         "body", "filter", "key"):
                sub = getattr(e, attr, None)
                if isinstance(sub, A.Expr):
                    scan_expr(sub)
            for sub in getattr(e, "args", []) or []:
                scan_expr(sub)

        def scan(s):
            if s is None:
                return
            if isinstance(s, A.BFS):
                return
            if isinstance(s, A.ReduceAssign):
                if isinstance(s.lhs, A.Field):
                    note(reduces, s.lhs.prop, s.lhs.driver, s.loc)
                scan_expr(s.rhs)
                return
            if isinstance(s, A.DeferAssign):
                if isinstance(s.lhs, A.Field):
                    defers.setdefault(s.lhs.prop, s.loc)
                scan_expr(s.rhs)
                return
            if isinstance(s, A.ArgMinMaxAssign):
                for lhs in [s.lhs] + list(s.lhs_extra):
                    if isinstance(lhs, A.Field):
                        note(reduces, lhs.prop, lhs.driver, s.loc)
                scan_expr(s.rhs)
                for r in s.rhs_extra:
                    scan_expr(r)
                return
            if isinstance(s, A.Assign):
                if isinstance(s.lhs, A.Field):
                    writes.setdefault(s.lhs.prop, s.loc)
                elif isinstance(s.lhs, A.MapAccess):
                    scan_expr(s.lhs.key)
                scan_expr(s.rhs)
                return
            if isinstance(s, A.VarDecl):
                scan_expr(s.init)
                return
            for attr in ("cond", "filter", "navigator", "filter_fw",
                         "filter_bw"):
                sub = getattr(s, attr, None)
                if isinstance(sub, A.Expr):
                    scan_expr(sub)
            if isinstance(s, A.CallStmt):
                scan_expr(s.call)
            for sub in self._sub_stmts(s):
                scan(sub)

        scan(loop.body)
        if loop.filter is not None:
            scan_expr(loop.filter)
        for p, (rdrvs, loc) in reduces.items():
            if p in reads and reads[p][0] - rdrvs:
                self.err(loc, f"Property {p} may have read-reduce "
                         "conflict")
        for p, loc in [(p, l) for p, (_d, l) in reduces.items()] + \
                list(defers.items()):
            if p in writes:
                self.err(writes[p], f"Property {p} may have "
                         "write-reduce conflict")

    # ------------------------------------------------------------------
    # Pass C: collection write-while-mutate (errors only for write+mutate)
    # ------------------------------------------------------------------
    def check_collection_conflicts(self):
        def decl_scan(s):
            if isinstance(s, A.VarDecl) and s.type.kind in _COLL_KINDS:
                self.coll_syms.update(s.names)
            for sub in self._sub_stmts(s):
                decl_scan(sub)
        decl_scan(self.proc.body)

        def walk(s):
            if s is None:
                return
            if (isinstance(s, A.Foreach) and not s.sequential) or \
                    isinstance(s, A.BFS):
                self._check_coll_loop(s)
            for sub in self._sub_stmts(s):
                walk(sub)
        walk(self.proc.body)

    def _check_coll_loop(self, loop):
        mutated: Dict[str, object] = {}
        assigned: Dict[str, object] = {}

        def scan(s):
            if s is None:
                return
            if isinstance(s, A.CallStmt):
                c = s.call
                if c.driver is not None and c.driver in self.coll_syms \
                        and c.name.lower() in _MUTATORS:
                    mutated.setdefault(c.driver, s.loc)
            if isinstance(s, A.Assign) and isinstance(s.lhs, A.Ident) \
                    and s.lhs.name in self.coll_syms:
                assigned.setdefault(s.lhs.name, s.loc)
            for sub in self._sub_stmts(s):
                scan(sub)

        for sub in self._sub_stmts(loop):
            scan(sub)
        for name, loc in assigned.items():
            if name in mutated:
                self.err(loc, f"Collection {name} is written while "
                         "being mutated in the same parallel region")


def check_reduce_errors(proc: A.Procedure,
                        filename: str = "<input>") -> List[str]:
    c = _Checker(proc, filename)
    c.check_bounds()
    c.check_prop_conflicts()
    c.check_collection_conflicts()
    return c.errors
