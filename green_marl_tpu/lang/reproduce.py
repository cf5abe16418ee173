"""AST -> Green-Marl source pretty-printer (the "reproducer").

Equivalent of the reference's ``src/common/gm_reproduce.cc``: prints a
parsed/transformed AST back as compilable Green-Marl text.  The reference
uses this as the oracle of its golden-test suites (``test/parse``,
``test/sugars``, ``test/opt`` compile with ``-Dr`` and diff the reproduced
source, ``test/parse/Makefile:1-15``).  We use it the same way: the
round-trip ``reproduce(parse(reproduce(ast)))`` must be a fixpoint, and the
reproduced source must re-typecheck — plus it lets optimizer passes
(``lang/opt.py``) be golden-tested as AST->AST rewrites.
"""

from __future__ import annotations

from typing import List, Optional

from . import gm_ast as A

# ---------------------------------------------------------------------------
# type / operator spellings (canonical synonym of each lexer keyword class)

_TYPE_NAMES = {
    "INT": "Int", "LONG": "Long", "FLOAT": "Float", "DOUBLE": "Double",
    "BOOL": "Bool", "GRAPH": "Graph",
}
_PROP_NAMES = {"NODEPROP": "N_P", "EDGEPROP": "E_P"}
_COLL_NAMES = {"NSET": "N_S", "NSEQ": "N_Q", "NORDER": "N_O"}
_ITER_NAMES = {
    "NODES": "Nodes", "EDGES": "Edges", "NBRS": "Nbrs",
    "IN_NBRS": "InNbrs", "UP_NBRS": "UpNbrs", "DOWN_NBRS": "DownNbrs",
    "ITEMS": "Items", "COMMON_NBRS": "CommonNbrs",
}
_REDUCE_NAMES = {
    "SUM": "Sum", "PRODUCT": "Product", "MIN": "Min", "MAX": "Max",
    "AND": "All", "OR": "Exist", "AVG": "Avg", "COUNT": "Count",
}
_REDUCE_EQ = {
    "SUM": "+=", "PRODUCT": "*=", "MIN": "min=", "MAX": "max=",
    "AND": "&=", "OR": "|=",
}
# parser._BINOPS precedence, left-associative
_PREC = {
    "||": 1, "&&": 2, "==": 3, "!=": 3,
    "<": 4, ">": 4, "<=": 4, ">=": 4,
    "+": 5, "-": 5, "*": 6, "/": 6, "%": 6,
}
_TERNARY_PREC = 0


def type_str(t: A.Type) -> str:
    if t.kind in _TYPE_NAMES:
        return _TYPE_NAMES[t.kind]
    tg = f"({t.target_graph})" if t.target_graph else ""
    if t.kind in ("NODE", "EDGE"):
        return f"{t.kind.title()}{tg}"
    if t.kind in _PROP_NAMES:
        return f"{_PROP_NAMES[t.kind]}<{type_str(t.elem)}>{tg}"
    if t.kind in _COLL_NAMES:
        return f"{_COLL_NAMES[t.kind]}{tg}"
    if t.kind == "COLLECTION":
        return f"Collection<{type_str(t.elem)}>{tg}"
    if t.kind == "MAP":
        return f"Map<{type_str(t.key)}, {type_str(t.value)}>"
    raise ValueError(f"unknown type kind {t.kind}")


def _float_text(v: float) -> str:
    s = repr(float(v))
    if "." not in s and "e" not in s and "inf" not in s:
        s += ".0"
    return s


class Reproducer:
    def __init__(self, indent: str = "    "):
        self.ind = indent

    # -- expressions ------------------------------------------------------
    def expr(self, e: A.Expr, prec: int = 0) -> str:
        if isinstance(e, A.Const):
            return self._const(e)
        if isinstance(e, A.Ident):
            return e.name
        if isinstance(e, A.Field):
            if e.is_edge_of:
                return f"Edge({e.driver}).{e.prop}"
            return f"{e.driver}.{e.prop}"
        if isinstance(e, A.MapAccess):
            return f"{e.map_name}[{self.expr(e.key)}]"
        if isinstance(e, A.UnOp):
            if e.op == "ABS":
                return f"| {self.expr(e.operand)} |"
            sym = "-" if e.op == "NEG" else "!"
            return f"{sym}{self.expr(e.operand, 99)}"
        if isinstance(e, A.Cast):
            return f"({type_str(e.to)}) {self.expr(e.operand, 99)}"
        if isinstance(e, A.BinOp):
            p = _PREC[e.op]
            s = (f"{self.expr(e.lhs, p)} {e.op} "
                 f"{self.expr(e.rhs, p + 1)}")
            return f"({s})" if p < prec else s
        if isinstance(e, A.Ternary):
            s = (f"{self.expr(e.cond, 1)} ? {self.expr(e.then)} : "
                 f"{self.expr(e.els)}")
            return f"({s})" if prec > _TERNARY_PREC else s
        if isinstance(e, A.Builtin):
            args = ", ".join(self.expr(a) for a in e.args)
            if e.driver_field is not None:
                return f"{self.expr(e.driver_field)}.{e.name}({args})"
            if e.driver is not None:
                return f"{e.driver}.{e.name}({args})"
            return f"{e.name}({args})"
        if isinstance(e, A.ReduceExpr):
            head = _REDUCE_NAMES[e.op]
            it = self.iterator(e.iterator)
            filt = f"({self.expr(e.filter)})" if e.filter is not None \
                else ""
            if e.op == "COUNT":
                return f"Count{it}{filt}"
            return f"{head}{it}{filt}{{{self.expr(e.body)}}}"
        if isinstance(e, A.Foreign):
            return f"[{e.text}]"
        raise ValueError(f"unknown expr {type(e).__name__}")

    def _const(self, e: A.Const) -> str:
        if e.ctype == "INT":
            return str(int(e.value))
        if e.ctype == "FLOAT":
            return _float_text(e.value)
        if e.ctype == "BOOL":
            return "True" if e.value else "False"
        if e.ctype == "INF":
            return "+INF" if e.value > 0 else "-INF"
        if e.ctype == "NIL":
            return "NIL"
        raise ValueError(f"unknown const ctype {e.ctype}")

    def iterator(self, it: A.Iterator) -> str:
        src = it.source
        if it.source_field is not None:
            src = f"{it.source_field.driver}.{it.source_field.prop}"
        rev = "^" if it.reverse else ""
        kind = _ITER_NAMES[it.iter_type]
        if it.iter_type == "COMMON_NBRS":
            kind = f"CommonNbrs({it.common_with})"
        return f"({it.var}: {src}{rev}.{kind})"

    # -- statements -------------------------------------------------------
    def stmt(self, s: A.Stmt, depth: int) -> List[str]:
        pad = self.ind * depth
        if isinstance(s, A.Block):
            out = [pad + "{"]
            for sub in s.stmts:
                out.extend(self.stmt(sub, depth + 1))
            out.append(pad + "}")
            return out
        if isinstance(s, A.VarDecl):
            if s.init is not None:
                return [f"{pad}{type_str(s.type)} {s.names[0]} = "
                        f"{self.expr(s.init)};"]
            return [f"{pad}{type_str(s.type)} {', '.join(s.names)};"]
        if isinstance(s, A.Assign):
            return [f"{pad}{self.expr(s.lhs)} = {self.expr(s.rhs)};"]
        if isinstance(s, A.ReduceAssign):
            bind = f" @ {s.bind}" if s.bind else ""
            return [f"{pad}{self.expr(s.lhs)} {_REDUCE_EQ[s.op]} "
                    f"{self.expr(s.rhs)}{bind};"]
        if isinstance(s, A.DeferAssign):
            bind = f" @ {s.bind}" if s.bind else ""
            return [f"{pad}{self.expr(s.lhs)} <= "
                    f"{self.expr(s.rhs)}{bind};"]
        if isinstance(s, A.ArgMinMaxAssign):
            op = "min=" if s.op == "MIN" else "max="
            bind = f" @ {s.bind}" if s.bind else ""
            lhss = ", ".join(self.expr(x) for x in s.lhs_extra)
            rhss = ", ".join(self.expr(x) for x in s.rhs_extra)
            return [f"{pad}<{self.expr(s.lhs)}; {lhss}> {op} "
                    f"<{self.expr(s.rhs)}; {rhss}>{bind};"]
        if isinstance(s, A.Foreach):
            kw = "For" if s.sequential else "Foreach"
            filt = f"({self.expr(s.filter)})" if s.filter is not None \
                else ""
            head = f"{pad}{kw}{self.iterator(s.iterator)}{filt}"
            return self._headed_body(head, s.body, depth)
        if isinstance(s, A.If):
            out = self._headed_body(f"{pad}If ({self.expr(s.cond)})",
                                    s.then, depth)
            if s.els is not None:
                out.extend(self._headed_body(f"{pad}Else", s.els, depth))
            return out
        if isinstance(s, A.While):
            if s.do_while:
                out = [pad + "Do {"]
                out.extend(self._block_inner(s.body, depth))
                out.append(f"{pad}}} While ({self.expr(s.cond)});")
                return out
            out = [f"{pad}While ({self.expr(s.cond)}) {{"]
            out.extend(self._block_inner(s.body, depth))
            out.append(pad + "}")
            return out
        if isinstance(s, A.Return):
            if s.value is None:
                return [pad + "Return;"]
            return [f"{pad}Return {self.expr(s.value)};"]
        if isinstance(s, A.CallStmt):
            return [f"{pad}{self.expr(s.call)};"]
        if isinstance(s, A.ForeignStmt):
            mut = ""
            if s.mutated:
                mut = " :: [" + ", ".join(
                    self.expr(m) for m in s.mutated) + "]"
            return [f"{pad}[{s.expr.text}]{mut};"]
        if isinstance(s, A.BFS):
            return self._bfs(s, depth)
        raise ValueError(f"unknown stmt {type(s).__name__}")

    def _bfs(self, s: A.BFS, depth: int) -> List[str]:
        pad = self.ind * depth
        kw = "InBFS" if s.is_bfs else "InDFS"
        tr = "^" if s.transpose else ""
        head = (f"{pad}{kw}({s.var}: {s.source_graph}{tr}.Nodes "
                f"From {s.root})")
        if s.navigator is not None:
            head += f" [{self.expr(s.navigator)}]"
        if s.filter_fw is not None:
            head += f" ({self.expr(s.filter_fw)})"
        out = [head + " {"]
        out.extend(self._block_inner(s.body_fw, depth))
        out.append(pad + "}")
        if s.body_bw is not None:
            kw2 = "InReverse" if s.is_bfs else "InPost"
            head2 = pad + kw2
            if s.filter_bw is not None:
                head2 += f" ({self.expr(s.filter_bw)})"
            out.append(head2 + " {")
            out.extend(self._block_inner(s.body_bw, depth))
            out.append(pad + "}")
        return out

    def _block_inner(self, body: A.Stmt, depth: int) -> List[str]:
        if isinstance(body, A.Block):
            out = []
            for sub in body.stmts:
                out.extend(self.stmt(sub, depth + 1))
            return out
        return self.stmt(body, depth + 1)

    def _headed_body(self, head: str, body: A.Stmt,
                     depth: int) -> List[str]:
        out = [head + " {"]
        out.extend(self._block_inner(body, depth))
        out.append(self.ind * depth + "}")
        return out

    # -- procedure --------------------------------------------------------
    def procedure(self, p: A.Procedure) -> str:
        def decls(lst: List[A.ArgDecl]) -> str:
            return ", ".join(
                f"{', '.join(d.names)}: {type_str(d.type)}" for d in lst)

        sig = decls(p.args)
        if p.out_args:
            sig += "; " + decls(p.out_args)
        local = "Local " if p.is_local else ""
        ret = f" : {type_str(p.return_type)}" if p.return_type else ""
        lines = [f"{local}Procedure {p.name}({sig}){ret}"]
        lines.extend(self.stmt(p.body, 0))
        return "\n".join(lines)


def reproduce(procs, indent: str = "    ") -> str:
    """Pretty-print one procedure or a list of them back to Green-Marl."""
    r = Reproducer(indent)
    if isinstance(procs, A.Procedure):
        procs = [procs]
    return "\n\n".join(r.procedure(p) for p in procs) + "\n"
