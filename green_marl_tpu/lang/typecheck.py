"""Green-Marl semantic analysis (typecheck steps 1-5 equivalent).

Covers the reference frontend's five typecheck passes
(``src/frontend/gm_new_typecheck_step1..5.cc``): scoped symbol
resolution, per-graph property binding, iterator typing, builtin binding
via the signature table (``lang.builtins``), expression typing with
numeric coercion (``gm_typecheck_oprules.cc``), and assignment/call-site
checks.  Errors carry line info and never crash (the reference's
``test/errors`` contract, ``test/check_if_crash.sh``).

Each AST expression gets a ``.stype`` annotation (a ``gm_ast.Type``);
identifiers get ``.symbol`` (their ``Symbol``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional

from . import gm_ast as A
from .builtins import lookup as builtin_lookup


class GMTypeError(Exception):
    def __init__(self, errors: List[str]):
        super().__init__("\n".join(errors))
        self.errors = errors


@dataclass
class Symbol:
    name: str
    type: A.Type
    is_arg: bool = False
    is_out_arg: bool = False
    is_iterator: bool = False
    iter_of: Optional[A.Iterator] = None


NUMERIC = {"INT", "LONG", "FLOAT", "DOUBLE"}
_RANK = {"INT": 0, "LONG": 1, "FLOAT": 2, "DOUBLE": 3}
COLLECTIONS = {"NSET", "NSEQ", "NORDER", "COLLECTION"}


def promote(a: str, b: str) -> Optional[str]:
    if a in NUMERIC and b in NUMERIC:
        return a if _RANK[a] >= _RANK[b] else b
    if a == b:
        return a
    if {a, b} <= {"NODE", "INT", "LONG"}:   # node ids coerce to ints
        return "NODE" if "NODE" in (a, b) else a
    if {a, b} <= {"EDGE", "INT", "LONG"}:
        return "EDGE" if "EDGE" in (a, b) else a
    return None


def assignable(dst: str, src: str) -> bool:
    if dst == src or "GENERIC" in (dst, src):
        return True
    if dst in NUMERIC and src in NUMERIC:
        return True    # narrowing allowed with warning in reference
    if dst in ("NODE", "EDGE") and src in ("NODE", "EDGE", "NIL"):
        return True
    if src == "NIL" and dst in ("NODE", "EDGE"):
        return True
    if dst in NUMERIC and src in ("NODE", "EDGE"):
        return True
    # INF saturates into any numeric/node target (gm_coercion)
    if src == "INF" and (dst in NUMERIC or dst in ("NODE", "EDGE")):
        return True
    # the reference's checker is lenient across collection kinds in
    # plain assignment (test/errors/e58 compiles); method arguments
    # stay strict (e57 rejected)
    if dst in COLLECTIONS and src in COLLECTIONS:
        return True
    return False


def builtin_arg_ok(param: str, arg: str) -> bool:
    """Strict argument matching for builtin calls / map keys
    (``gm_new_typecheck_step2.cc`` GM_ERROR_INVALID_BUILTIN_ARG_TYPE):
    unlike plain assignment, Node does NOT coerce to Int here
    (test/errors/e30, e68)."""
    if param == arg or "GENERIC" in (param, arg):
        return True
    if param in NUMERIC:
        return arg in NUMERIC
    if param in ("NODE", "EDGE"):
        return arg in (param, "NIL")
    return False


class Scope:
    """Two namespaces, like the reference's ``curr_sym``/``curr_field``
    symtab pair: properties live separately from scalars/nodes, so a node
    variable may shadow-share a property's name (test/sugars/s8.gm)."""

    def __init__(self, parent: Optional["Scope"] = None):
        self.parent = parent
        self.syms: Dict[str, Symbol] = {}
        self.fields: Dict[str, Symbol] = {}

    def find(self, name: str) -> Optional[Symbol]:
        s = self.syms.get(name)
        if s is not None:
            return s
        return self.parent.find(name) if self.parent else None

    def find_field(self, name: str) -> Optional[Symbol]:
        s = self.fields.get(name)
        if s is not None:
            return s
        return self.parent.find_field(name) if self.parent else None

    def declare(self, sym: Symbol) -> bool:
        """False if the name already exists in the same namespace of ANY
        enclosing scope (the reference forbids shadowing —
        test/errors/e06)."""
        if sym.type.is_property():
            if self.find_field(sym.name) is not None:
                return False
            self.fields[sym.name] = sym
            return True
        if self.find(sym.name) is not None:
            return False
        self.syms[sym.name] = sym
        return True


class TypeChecker:
    def __init__(self, filename: str = "<input>"):
        self.filename = filename
        self.errors: List[str] = []
        self.graphs: List[str] = []

    def err(self, loc: A.Loc, msg: str):
        self.errors.append(f"{self.filename}:{loc.line}:{loc.col}: {msg}")

    # -- entry -----------------------------------------------------------
    def check(self, proc: A.Procedure) -> List[str]:
        scope = Scope()
        self.graphs = []
        self.proc = proc
        # the default-graph rule is GLOBAL per procedure: if more than
        # one graph appears anywhere (args or locals), every unbound
        # Node/Edge/property/collection declaration is an error —
        # test/errors/e44-e53 incl. e52 where the second graph is
        # declared AFTER the unbound node (gm_new_typecheck_step1.cc)
        self.multi_graph = self._count_graphs(proc) > 1
        for arglist, is_out in ((proc.args, False), (proc.out_args, True)):
            for a in arglist:
                t = a.type
                if is_out and t.kind == "GRAPH":
                    self.err(proc.loc,
                             "Graph cannot be an output argument")
                for nm in a.names:
                    if t.kind == "GRAPH":
                        self.graphs.append(nm)
                    self._check_default_bind(t, proc.loc)
                    tt = self._default_bind(t)
                    if not scope.declare(Symbol(nm, tt, is_arg=True,
                                                is_out_arg=is_out)):
                        self.err(proc.loc, f"duplicate argument '{nm}'")
        self.check_block(proc.body, scope, parallel_depth=0)
        return self.errors

    @staticmethod
    def _count_graphs(proc: A.Procedure) -> int:
        n = 0
        for a in list(proc.args) + list(proc.out_args):
            if a.type.kind == "GRAPH":
                n += len(a.names)

        def walk(s):
            nonlocal n
            if s is None:
                return
            if isinstance(s, A.VarDecl) and s.type.kind == "GRAPH":
                n += len(s.names)
            for attr in ("stmts", "then", "els", "body", "body_fw",
                         "body_bw"):
                sub = getattr(s, attr, None)
                if isinstance(sub, list):
                    for x in sub:
                        walk(x)
                elif sub is not None and isinstance(sub, A.Stmt):
                    walk(sub)
        walk(proc.body)
        return n

    _NEEDS_BIND = ("NODE", "EDGE", "NODEPROP", "EDGEPROP", "NSET",
                   "NSEQ", "NORDER", "COLLECTION")

    def _check_default_bind(self, t: A.Type, loc: A.Loc):
        if not self.multi_graph:
            return
        msg = ("More than one graph present. Explicit binding of nodes, "
               "edges, properties and collections is required")
        if t.kind in self._NEEDS_BIND and t.target_graph is None:
            self.err(loc, msg)
        if t.kind == "MAP":
            for sub in (t.key, t.value):
                if sub is not None and sub.kind in self._NEEDS_BIND and \
                        sub.target_graph is None:
                    self.err(loc, msg)

    def _graph_conflict(self, lt: Optional[A.Type],
                        rt: Optional[A.Type]) -> bool:
        """Node/Edge values bound to different graphs (test/errors/e11,
        e32, e62, e63, e67 — GM_ERROR_TARGET_MISMATCH)."""
        if lt is None or rt is None:
            return False
        if lt.kind in ("NODE", "EDGE") and rt.kind in ("NODE", "EDGE"):
            return bool(lt.target_graph and rt.target_graph
                        and lt.target_graph != rt.target_graph)
        return False

    def _default_bind(self, t: A.Type) -> A.Type:
        """Bind unannotated Node/props to the procedure's single graph."""
        if t.kind in ("NODE", "EDGE", "NODEPROP", "EDGEPROP", "NSET",
                      "NSEQ", "NORDER") and t.target_graph is None \
                and len(self.graphs) == 1:
            return A.Type(kind=t.kind, target_graph=self.graphs[0],
                          elem=t.elem, key=t.key, value=t.value)
        return t

    # -- statements ------------------------------------------------------
    def check_block(self, blk: A.Block, scope: Scope, parallel_depth):
        inner = Scope(scope)
        for s in blk.stmts:
            self.check_stmt(s, inner, parallel_depth)

    def check_stmt(self, s: A.Stmt, scope: Scope, pd: int):
        if isinstance(s, A.Block):
            self.check_block(s, scope, pd)
        elif isinstance(s, A.VarDecl):
            self._check_default_bind(s.type, s.loc)
            t = self._default_bind(s.type)
            if t.kind in ("NODE", "EDGE") and t.target_graph:
                g = scope.find(t.target_graph)
                if g is None or g.type.kind != "GRAPH":
                    self.err(s.loc,
                             f"'{t.target_graph}' is not a graph")
            if t.kind == "MAP":
                # maps hold primitive/node/edge values only
                # (test/errors/e59: "we only allow primitive types")
                for sub in (t.key, t.value):
                    if sub is not None and (sub.kind in COLLECTIONS
                                            or sub.is_property()):
                        self.err(s.loc,
                                 f"map key/value cannot be {sub.kind} "
                                 "(only primitive types in maps)")
            for nm in s.names:
                if not scope.declare(Symbol(nm, t)):
                    self.err(s.loc, f"duplicate declaration of '{nm}'")
            if s.init is not None:
                it = self.type_expr(s.init, scope)
                if it and not assignable(t.kind, it.kind):
                    self.err(s.loc,
                             f"cannot initialize {t.kind} with {it.kind}")
                if self._graph_conflict(t, it):
                    self.err(s.loc, "Assignment to different Graphs")
        elif isinstance(s, A.Assign):
            lt = self.type_lhs(s.lhs, scope)
            rt = self.type_expr(s.rhs, scope)
            if lt and rt and not assignable(lt.kind, rt.kind):
                self.err(s.loc,
                         f"cannot assign {rt.kind} to {lt.kind}")
            if self._graph_conflict(lt, rt):
                self.err(s.loc, "Assignment to different Graphs")
            self._check_group_assign(s, scope)
        elif isinstance(s, (A.ReduceAssign, A.DeferAssign)):
            lt = self.type_lhs(s.lhs, scope)
            rt = self.type_expr(s.rhs, scope)
            if isinstance(s.lhs, A.Field):
                drv = scope.find(s.lhs.driver)
                if drv is not None and drv.type.kind == "GRAPH":
                    # test/errors/e20 (GM_ERROR_GROUP_REDUCTION)
                    self.err(s.loc,
                             "Group assignment cannot be a reduction")
            op = getattr(s, "op", None)
            if op in ("AND", "OR") and lt and lt.kind != "BOOL":
                self.err(s.loc, f"{op}= requires Bool lhs")
            if op in ("SUM", "PRODUCT", "MIN", "MAX") and lt and \
                    lt.kind not in NUMERIC and lt.kind not in \
                    ("NODE", "EDGE"):
                self.err(s.loc, f"{op}= requires numeric lhs")
            if s.bind is not None:
                b = scope.find(s.bind)
                if b is None or not b.is_iterator:
                    self.err(s.loc,
                             f"'@{s.bind}' is not an iterator")
        elif isinstance(s, A.ArgMinMaxAssign):
            lt0 = self.type_lhs(s.lhs, scope)
            lts = [self.type_lhs(e, scope) for e in s.lhs_extra]
            rt0 = self.type_expr(s.rhs, scope)
            rts = [self.type_expr(e, scope) for e in s.rhs_extra]
            if len(s.lhs_extra) != len(s.rhs_extra):
                self.err(s.loc, "argmin/max list length mismatch")
            for le, lt, rt in zip(s.lhs_extra, lts, rts):
                if lt and rt and not assignable(lt.kind, rt.kind):
                    # test/errors/e34 (payload type mismatch)
                    self.err(le.loc,
                             f"Typemismatch in Assignment. LHS:{lt.kind}"
                             f", RHS:{rt.kind}")
            if lt0 and rt0 and not assignable(lt0.kind, rt0.kind):
                self.err(s.loc,
                         f"Typemismatch in Assignment. LHS:{lt0.kind}, "
                         f"RHS:{rt0.kind}")
            # all targets scalar, or all fields with the same driver
            # (test/errors/e35, gm_new_typecheck LHS-list consistency)
            targets = [s.lhs] + list(s.lhs_extra)
            drivers = set()
            for t in targets:
                if isinstance(t, A.Field):
                    drivers.add(t.driver)
                else:
                    drivers.add(None)
            if len(drivers) > 1:
                self.err(s.loc,
                         "LHS list of argminmax assignment is not "
                         "consistent; They should be all scalar or have "
                         "same driver")
        elif isinstance(s, A.Foreach):
            self.check_foreach(s, scope, pd)
        elif isinstance(s, A.If):
            ct = self.type_expr(s.cond, scope)
            if ct and ct.kind != "BOOL":
                self.err(s.loc, "If condition must be Bool")
            self.check_stmt(s.then, Scope(scope), pd)
            if s.els:
                self.check_stmt(s.els, Scope(scope), pd)
        elif isinstance(s, A.While):
            ct = self.type_expr(s.cond, scope)
            if ct and ct.kind != "BOOL":
                self.err(s.loc, "While condition must be Bool")
            self.check_stmt(s.body, Scope(scope), pd)
        elif isinstance(s, A.Return):
            if s.value is not None:
                rt = self.type_expr(s.value, scope)
                want = self.proc.return_type
                if want is None:
                    self.err(s.loc, "procedure has no return type")
                elif rt and not assignable(want.kind, rt.kind):
                    self.err(s.loc,
                             f"cannot return {rt.kind} as {want.kind}")
        elif isinstance(s, A.CallStmt):
            self.type_expr(s.call, scope)
        elif isinstance(s, A.ForeignStmt):
            for m in s.mutated:
                self.type_lhs(m, scope)
        elif isinstance(s, A.BFS):
            self.check_bfs(s, scope, pd)

    def _check_group_assign(self, s: A.Assign, scope: Scope):
        """Group assignment ``G.prop = expr`` (test/errors/e24): every
        graph-driven field in the RHS must be driven by the same graph
        (GM_ERROR_TARGET_MISMATCH) and be the same node/edge kind
        (GM_ERROR_GROUP_MISMATCH)."""
        if not isinstance(s.lhs, A.Field):
            return
        drv = scope.find(s.lhs.driver)
        if drv is None or drv.type.kind != "GRAPH":
            return
        lprop = scope.find_field(s.lhs.prop)
        lkind = lprop.type.kind if lprop else None

        fields: List[A.Field] = []

        def walk(e):
            if e is None:
                return
            if isinstance(e, A.Field):
                fields.append(e)
            for attr in ("lhs", "rhs", "operand", "cond", "then", "els",
                         "body", "filter", "key"):
                sub = getattr(e, attr, None)
                if isinstance(sub, A.Expr):
                    walk(sub)
            for sub in getattr(e, "args", []) or []:
                walk(sub)
        walk(s.rhs)
        for f in fields:
            fd = scope.find(f.driver)
            if fd is None or fd.type.kind != "GRAPH":
                continue
            if f.driver != s.lhs.driver:
                self.err(f.loc, f"{f.driver} cannot be used outside "
                         "group assignment")
                continue
            fp = scope.find_field(f.prop)
            if fp is not None and lkind is not None and \
                    fp.type.kind != lkind:
                self.err(f.loc,
                         "node/edge property mismatch in group "
                         "assignment")

    def check_foreach(self, s: A.Foreach, scope: Scope, pd: int):
        it = s.iterator
        inner = Scope(scope)
        elem = self.bind_iterator(it, scope, s.loc)
        if elem is not None:
            if not inner.declare(Symbol(it.var, elem, is_iterator=True,
                                        iter_of=it)):
                self.err(s.loc, f"duplicate declaration of '{it.var}'")
        if s.filter is not None:
            ft = self.type_expr(s.filter, inner)
            if ft and ft.kind != "BOOL":
                self.err(s.loc, "Foreach filter must be Bool")
        new_pd = pd + (0 if s.sequential else 1)
        self.check_stmt(s.body, inner, new_pd)

    def bind_iterator(self, it: A.Iterator, scope: Scope,
                      loc: A.Loc) -> Optional[A.Type]:
        src = scope.find(it.source)
        if src is None:
            self.err(loc, f"undefined symbol '{it.source}'")
            return None
        k = it.iter_type
        if k in ("NODES", "EDGES"):
            if src.type.kind != "GRAPH":
                self.err(loc, f"'{it.source}' is not a graph")
                return None
            kind = "NODE" if k == "NODES" else "EDGE"
            return A.Type(kind=kind, target_graph=it.source)
        if k in ("NBRS", "IN_NBRS", "UP_NBRS", "DOWN_NBRS",
                 "COMMON_NBRS"):
            if src.type.kind != "NODE":
                self.err(loc, f"'{it.source}' is not a node")
                return None
            if k == "COMMON_NBRS" and it.common_with is not None:
                other = scope.find(it.common_with)
                if other is not None and self._graph_conflict(
                        src.type, other.type):
                    # test/errors/e32: CommonNbrs across graphs
                    self.err(loc, "Assignment to different Graphs")
            return A.Type(kind="NODE",
                          target_graph=src.type.target_graph)
        if k == "ITEMS":
            if it.source_field is not None:
                ft = self.type_field(it.source_field, scope)
                if ft is None:
                    return None
                if ft.kind not in COLLECTIONS:
                    # test/errors/e71: Items over a scalar-valued prop
                    self.err(loc,
                             f"{it.source_field.prop} is not a "
                             "collection type object")
                    return None
                return A.Type(kind="NODE", target_graph=ft.target_graph)
            if not src.type.is_collection():
                self.err(loc, f"'{it.source}' is not a collection")
                return None
            if src.type.kind == "COLLECTION" and src.type.elem is not None:
                return src.type.elem      # collection-of-collections
            return A.Type(kind="NODE",
                          target_graph=src.type.target_graph)
        self.err(loc, f"bad iterator {k}")
        return None

    def check_bfs(self, s: A.BFS, scope: Scope, pd: int):
        g = scope.find(s.source_graph)
        if g is None or g.type.kind != "GRAPH":
            self.err(s.loc, f"'{s.source_graph}' is not a graph")
        r = scope.find(s.root)
        if r is None or r.type.kind != "NODE":
            self.err(s.loc, f"'{s.root}' is not a node")
        inner = Scope(scope)
        itr = A.Iterator(var=s.var, source=s.source_graph,
                         iter_type="NODES")
        inner.declare(Symbol(s.var, A.Type(kind="NODE",
                                           target_graph=s.source_graph),
                             is_iterator=True, iter_of=itr))
        if s.navigator is not None:
            self.type_expr(s.navigator, inner)
        if s.filter_fw is not None:
            self.type_expr(s.filter_fw, inner)
        self.check_stmt(s.body_fw, inner, pd + 1)
        if s.body_bw is not None:
            if s.filter_bw is not None:
                self.type_expr(s.filter_bw, inner)
            self.check_stmt(s.body_bw, inner, pd + 1)

    # -- lhs / expressions ----------------------------------------------
    def type_lhs(self, e: A.Expr, scope: Scope) -> Optional[A.Type]:
        if isinstance(e, A.Ident):
            sym = scope.find(e.name)
            if sym is None:
                self.err(e.loc, f"undefined symbol '{e.name}'")
                return None
            if sym.is_iterator:
                self.err(e.loc,
                         f"cannot assign to iterator '{e.name}'")
                return None
            e.symbol = sym
            e.stype = sym.type
            return sym.type
        if isinstance(e, A.Field):
            return self.type_field(e, scope)
        if isinstance(e, A.MapAccess):
            return self.type_map_access(e, scope)
        self.err(e.loc, "invalid assignment target")
        return None

    def type_field(self, e: A.Field, scope: Scope) -> Optional[A.Type]:
        drv = scope.find(e.driver)
        if drv is None:
            self.err(e.loc, f"undefined symbol '{e.driver}'")
            return None
        if drv.type.kind == "MAP":
            d = builtin_lookup("MAP", e.name)
            if d is None:
                self.err(e.loc, f"unknown method '{e.name}' on Map")
                return None
            e.builtin = d
            e.driver_symbol = drv
            if d.ret == "Generic":
                if "Key" in e.name:
                    return drv.type.key or A.Type(kind="GENERIC")
                return drv.type.value or A.Type(kind="GENERIC")
            return A.Type(kind=_ret_kind(d.ret))
        prop = scope.find_field(e.prop)
        if prop is None:
            self.err(e.loc, f"'{e.prop}' is not a property")
            return None
        want = "EDGEPROP" if (drv.type.kind == "EDGE" or e.is_edge_of) \
            else "NODEPROP"
        if drv.type.kind == "GRAPH":
            # group access G.prop — either kind allowed
            if prop.type.target_graph and \
                    prop.type.target_graph != e.driver:
                self.err(e.loc,
                         f"property '{e.prop}' is not defined on graph "
                         f"'{e.driver}'")
                return None
        elif drv.type.kind in ("NODE", "EDGE"):
            if prop.type.kind != want:
                self.err(e.loc,
                         f"'{e.prop}' is a {prop.type.kind}, driver is "
                         f"{drv.type.kind}")
                return None
            if prop.type.target_graph and drv.type.target_graph and \
                    prop.type.target_graph != drv.type.target_graph:
                self.err(e.loc,
                         f"property '{e.prop}' bound to graph "
                         f"'{prop.type.target_graph}', driver to "
                         f"'{drv.type.target_graph}'")
                return None
        elif drv.type.is_collection():
            # group assignment over set members: S.prop = ... expands to
            # Foreach(x: S.Items) x.prop = ...
            pass
        else:
            self.err(e.loc,
                     f"'{e.driver}' ({drv.type.kind}) cannot drive a "
                     f"property access")
            return None
        e.driver_symbol = drv
        e.prop_symbol = prop
        e.stype = prop.type.elem or A.Type(kind="INT")
        return e.stype

    def type_map_access(self, e: A.MapAccess,
                        scope: Scope) -> Optional[A.Type]:
        m = scope.find(e.map_name)
        if m is None or m.type.kind != "MAP":
            self.err(e.loc, f"'{e.map_name}' is not a map")
            return None
        kt = self.type_expr(e.key, scope)
        want = m.type.key
        if kt is not None and want is not None:
            if not builtin_arg_ok(want.kind, kt.kind):
                # test/errors/e61, e65 (map-key type mismatch)
                self.err(e.loc,
                         f"Type mismatch for map-key. Expected "
                         f"{want.kind}, but was {kt.kind}")
            elif self._graph_conflict(want, kt):
                # test/errors/e63 (key target graph mismatch)
                self.err(e.loc, "Assignment to different Graphs")
        e.map_symbol = m
        e.stype = m.type.value
        return m.type.value

    def type_expr(self, e: A.Expr, scope: Scope) -> Optional[A.Type]:
        t = self._type_expr(e, scope)
        if t is not None:
            e.stype = t
        return t

    def _type_expr(self, e: A.Expr, scope: Scope) -> Optional[A.Type]:
        if isinstance(e, A.Const):
            if e.ctype == "INT":
                return A.Type(kind="INT")
            if e.ctype == "FLOAT":
                return A.Type(kind="DOUBLE")
            if e.ctype == "INF":
                # INF is its own type: valid in assignment/comparison,
                # invalid in arithmetic (test/errors/e28,
                # GM_ERROR_OPERATOR_MISMATCH on (INF, Int))
                return A.Type(kind="INF")
            if e.ctype == "BOOL":
                return A.Type(kind="BOOL")
            if e.ctype == "NIL":
                return A.Type(kind="NIL")
        if isinstance(e, A.Ident):
            sym = scope.find(e.name)
            if sym is None:
                self.err(e.loc, f"undefined symbol '{e.name}'")
                return None
            e.symbol = sym
            return sym.type
        if isinstance(e, A.Field):
            return self.type_field(e, scope)
        if isinstance(e, A.MapAccess):
            return self.type_map_access(e, scope)
        if isinstance(e, A.UnOp):
            t = self.type_expr(e.operand, scope)
            if t is None:
                return None
            if e.op == "NOT":
                if t.kind != "BOOL":
                    self.err(e.loc, "! requires Bool")
                return A.Type(kind="BOOL")
            if t.kind not in NUMERIC:
                self.err(e.loc, f"{e.op} requires numeric operand")
            return t
        if isinstance(e, A.Cast):
            ot = self.type_expr(e.operand, scope)
            if ot is not None:
                if (ot.kind == "BOOL") != (e.to.kind == "BOOL"):
                    self.err(e.loc,
                             "Type conversion cannot be applied between "
                             "numeric and boolean types")
                elif ot.kind == "GRAPH" or e.to.kind == "GRAPH" or \
                        ot.kind in COLLECTIONS or \
                        e.to.kind in COLLECTIONS:
                    self.err(e.loc,
                             f"Type conversion cannot be applied to "
                             f"{ot.kind}")
            return e.to
        if isinstance(e, A.BinOp):
            lt = self.type_expr(e.lhs, scope)
            rt = self.type_expr(e.rhs, scope)
            if lt is None or rt is None:
                return None
            if e.op in ("&&", "||"):
                if lt.kind != "BOOL" or rt.kind != "BOOL":
                    self.err(e.loc, f"{e.op} requires Bool operands")
                return A.Type(kind="BOOL")
            if e.op in ("==", "!=", "<", ">", "<=", ">="):
                if promote(lt.kind, rt.kind) is None and \
                        not ({lt.kind, rt.kind} &
                             {"NIL", "GRAPH", "GENERIC", "INF"}):
                    # GRAPH comparisons are group-assignment sugar:
                    # (G == root) means (<current node> == root)
                    self.err(e.loc,
                             f"cannot compare {lt.kind} and {rt.kind}")
                if self._graph_conflict(lt, rt):
                    self.err(e.loc, "Assignment to different Graphs")
                return A.Type(kind="BOOL")
            p = promote(lt.kind, rt.kind)
            if p is None or p == "BOOL":
                self.err(e.loc,
                         f"cannot apply {e.op} to {lt.kind}/{rt.kind}")
                return None
            return A.Type(kind=p if p in NUMERIC else "INT")
        if isinstance(e, A.Ternary):
            ct = self.type_expr(e.cond, scope)
            if ct and ct.kind != "BOOL":
                self.err(e.loc, "?: condition must be Bool")
            tt = self.type_expr(e.then, scope)
            et = self.type_expr(e.els, scope)
            if tt and et:
                p = promote(tt.kind, et.kind)
                if p:
                    return A.Type(kind=p)
                return tt
            return tt or et
        if isinstance(e, A.ReduceExpr):
            inner = Scope(scope)
            elem = self.bind_iterator(e.iterator, scope, e.loc)
            if elem is not None:
                inner.declare(Symbol(e.iterator.var, elem,
                                     is_iterator=True,
                                     iter_of=e.iterator))
            if e.filter is not None:
                ft = self.type_expr(e.filter, inner)
                if ft and ft.kind != "BOOL":
                    self.err(e.loc, "reduction filter must be Bool")
            bt = self.type_expr(e.body, inner)
            if e.op in ("OR", "AND"):
                return A.Type(kind="BOOL")
            if e.op == "COUNT":
                return A.Type(kind="INT")
            if e.op == "AVG":
                return A.Type(kind="DOUBLE")
            return bt
        if isinstance(e, A.Builtin):
            return self.type_builtin(e, scope)
        if isinstance(e, A.Foreign):
            return A.Type(kind="DOUBLE")   # foreign exprs untyped
        return None

    _PARAM_KIND = {"Node": "NODE", "Edge": "EDGE", "Int": "INT",
                   "Long": "LONG", "Float": "FLOAT", "Double": "DOUBLE",
                   "Bool": "BOOL", "N_S": "NSET", "N_O": "NORDER",
                   "N_Q": "NSEQ"}

    def _check_builtin_args(self, e: A.Builtin, d, arg_types,
                            generic: Optional[A.Type] = None,
                            drv_graph: Optional[str] = None):
        """Argument typecheck against the signature table
        (``gm_new_typecheck_step2.cc`` GM_ERROR_INVALID_BUILTIN_ARG_TYPE;
        test/errors/e30, e57, e68)."""
        for i, (param, at) in enumerate(zip(d.arg_types, arg_types)):
            if at is None:
                continue
            if param == "Generic":
                want = generic
                if want is None:
                    continue
                if not builtin_arg_ok(want.kind, at.kind):
                    self.err(e.loc, f"type mismatch for built-in:"
                             f"{e.name}, arg_no:{i + 1}")
                elif self._graph_conflict(want, at):
                    self.err(e.loc, "Assignment to different Graphs")
                continue
            want_kind = self._PARAM_KIND.get(param, param.upper())
            if want_kind == "NODE" and generic is not None:
                # collection-of-collections: the element type substitutes
                # for the nominal Node param (test/errors/e57)
                want_kind = generic.kind
            if not builtin_arg_ok(want_kind, at.kind):
                self.err(e.loc, f"type mismatch for built-in:{e.name}, "
                         f"arg_no:{i + 1}")
            elif want_kind in ("NODE", "EDGE") and drv_graph and \
                    at.target_graph and at.target_graph != drv_graph:
                self.err(e.loc, "Assignment to different Graphs")

    def type_builtin(self, e: A.Builtin,
                     scope: Scope) -> Optional[A.Type]:
        arg_types = [self.type_expr(a, scope) for a in e.args]
        if e.driver is None and e.driver_field is None:
            d = builtin_lookup("_", e.name)
            if d is None:
                self.err(e.loc, f"unknown function '{e.name}'")
                return None
            e.builtin = d
            return A.Type(kind=_ret_kind(d.ret))
        if e.driver_field is not None:
            ft = self.type_field(e.driver_field, scope)
            if ft is None:
                return None
            d = builtin_lookup(ft.kind, e.name)
            if d is None:
                self.err(e.loc,
                         f"unknown method '{e.name}' on {ft.kind}")
                return None
            e.builtin = d
            self._check_builtin_args(e, d, arg_types,
                                     drv_graph=ft.target_graph)
            return A.Type(kind=_ret_kind(d.ret))
        drv = scope.find(e.driver)
        if drv is None:
            self.err(e.loc, f"undefined symbol '{e.driver}'")
            return None
        if drv.type.kind == "MAP":
            d = builtin_lookup("MAP", e.name)
            if d is None:
                self.err(e.loc, f"unknown method '{e.name}' on Map")
                return None
            e.builtin = d
            e.driver_symbol = drv
            self._check_builtin_args(e, d, arg_types,
                                     generic=drv.type.key)
            if d.ret == "Generic":
                if "Key" in e.name:
                    return drv.type.key or A.Type(kind="GENERIC")
                return drv.type.value or A.Type(kind="GENERIC")
            return A.Type(kind=_ret_kind(d.ret))
        it_kind = drv.iter_of.iter_type if drv.is_iterator and \
            drv.iter_of else None
        d = builtin_lookup(drv.type.kind, e.name, it_kind)
        if d is None and drv.type.kind == "GRAPH":
            # group-assignment sugar: G.NumNbrs() means per-node NumNbrs
            # (expand_group_assignment desugars it; test/sugars/s9.gm)
            d = builtin_lookup("NODE", e.name)
        if d is None:
            self.err(e.loc,
                     f"unknown method '{e.name}' on {drv.type.kind}")
            return None
        if len(e.args) != len(d.arg_types):
            self.err(e.loc,
                     f"'{e.name}' expects {len(d.arg_types)} args, got "
                     f"{len(e.args)}")
        elem = drv.type.elem if drv.type.kind == "COLLECTION" else None
        self._check_builtin_args(e, d, arg_types, generic=elem,
                                 drv_graph=drv.type.target_graph)
        e.builtin = d
        e.driver_symbol = drv
        return A.Type(kind=_ret_kind(d.ret),
                      target_graph=drv.type.target_graph)


def _ret_kind(r: str) -> str:
    return {"Int": "INT", "Long": "LONG", "Float": "FLOAT",
            "Double": "DOUBLE", "Bool": "BOOL", "Node": "NODE",
            "Edge": "EDGE", "Void": "VOID",
            "Generic": "GENERIC"}.get(r, "INT")


def typecheck(procs: List[A.Procedure], filename: str = "<input>",
              semantic: bool = True) -> None:
    """Raise ``GMTypeError`` with all collected diagnostics on failure.

    ``semantic=False`` skips the reduce-bound/conflict passes — used for
    the post-optimizer re-typecheck, since optimizer rewrites (e.g.
    nonconf reduction-to-write conversion) legitimately produce shapes
    the source-level checks reject.  The reference likewise runs
    ``gm_reduce_error_check`` once, in the frontend only
    (``gm_frontend.cc`` pass list)."""
    from .reduce_check import check_reduce_errors
    errors: List[str] = []
    for p in procs:
        tc = TypeChecker(filename)
        errs = tc.check(p)
        errors.extend(errs)
        if not errs and semantic:
            # reduce-bound / conflict checks assume resolvable symbols
            errors.extend(check_reduce_errors(p, filename))
    if errors:
        raise GMTypeError(errors)
