"""Green-Marl recursive-descent parser.

Implements the reference grammar (``src/parse/gm_grammer.y:104-448``) over
the token stream from ``lexer``; the bison %glr ambiguities are resolved
the same way the reference does (dangling-else binds inner; statement-
level ``<`` opens an argminmax assignment; ``(`` after a reduce header is
a filter).  All 27 reference programs under ``apps/src`` parse (see
tests/test_lang.py).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from . import gm_ast as A
from .lexer import Token, tokenize


class ParseError(Exception):
    pass


# binary operator precedence (gm_grammer.y precedence table)
_BINOPS = {
    "OR": (1, "||"), "AND": (2, "&&"),
    "EQ": (3, "=="), "NEQ": (3, "!="),
    "LT": (4, "<"), "GT": (4, ">"), "LE": (4, "<="), "GE": (4, ">="),
    "PLUS": (5, "+"), "MINUS": (5, "-"),
    "STAR": (6, "*"), "SLASH": (6, "/"), "PERCENT": (6, "%"),
}

_REDUCE_OPS = {"SUM": "SUM", "PRODUCT": "PRODUCT", "MINR": "MIN",
               "MAXR": "MAX", "EXIST": "OR", "ALL": "AND", "AVG": "AVG"}

_ITER_KINDS = {"NODES": "NODES", "EDGES": "EDGES", "NBRS": "NBRS",
               "IN_NBRS": "IN_NBRS", "UP_NBRS": "UP_NBRS",
               "DOWN_NBRS": "DOWN_NBRS", "ITEMS": "ITEMS"}

_TYPE_STARTS = {"INT", "LONG", "FLOAT", "DOUBLE", "BOOL", "GRAPH", "NODE",
                "EDGE", "NODEPROP", "EDGEPROP", "NSET", "NSEQ", "NORDER",
                "COLLECTION", "MAP"}

_REDUCE_EQ = {"PLUSEQ": "SUM", "MULTEQ": "PRODUCT", "MINEQ": "MIN",
              "MAXEQ": "MAX", "ANDEQ": "AND", "OREQ": "OR"}


class Parser:
    def __init__(self, toks: List[Token], filename: str = "<input>"):
        self.toks = toks
        self.i = 0
        self.filename = filename

    # -- token helpers ---------------------------------------------------
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, *kinds) -> bool:
        return self.peek().kind in kinds

    def accept(self, kind) -> Optional[Token]:
        if self.at(kind):
            t = self.toks[self.i]
            self.i += 1
            return t
        return None

    def expect(self, kind) -> Token:
        t = self.accept(kind)
        if t is None:
            p = self.peek()
            raise ParseError(
                f"{self.filename}:{p.line}:{p.col}: expected {kind}, "
                f"found {p.kind}({p.value!r})")
        return t

    def loc(self) -> A.Loc:
        p = self.peek()
        return A.Loc(p.line, p.col)

    # -- program ---------------------------------------------------------
    def parse_program(self) -> List[A.Procedure]:
        procs = []
        while not self.at("EOF"):
            procs.append(self.parse_procedure())
        return procs

    def parse_procedure(self) -> A.Procedure:
        loc = self.loc()
        is_local = bool(self.accept("LOCAL"))
        if not is_local:
            self.expect("PROC")
        name = self.expect("ID").value
        self.expect("LPAREN")
        args: List[A.ArgDecl] = []
        out_args: List[A.ArgDecl] = []
        cur = args
        while not self.at("RPAREN"):
            cur.append(self.parse_arg_decl())
            if self.accept("COMMA"):
                continue
            if self.accept("SEMI"):
                cur = out_args
        self.expect("RPAREN")
        ret = None
        if self.accept("COLON"):
            ret = self.parse_type()
        body = self.parse_block()
        return A.Procedure(name=name, args=args, out_args=out_args,
                           return_type=ret, body=body, is_local=is_local,
                           loc=loc)

    def parse_arg_decl(self) -> A.ArgDecl:
        names = [self.expect("ID").value]
        while self.accept("COMMA"):
            names.append(self.expect("ID").value)
        self.expect("COLON")
        t = self.parse_type()
        return A.ArgDecl(names=names, type=t)

    # -- types -----------------------------------------------------------
    def parse_type(self) -> A.Type:
        k = self.peek().kind
        if k in ("INT", "LONG", "FLOAT", "DOUBLE", "BOOL", "GRAPH"):
            self.i += 1
            t = A.Type(kind=k)
        elif k in ("NODE", "EDGE"):
            self.i += 1
            tg = None
            if self.accept("LPAREN"):
                tg = self.expect("ID").value
                self.expect("RPAREN")
            t = A.Type(kind=k, target_graph=tg)
        elif k in ("NODEPROP", "EDGEPROP"):
            self.i += 1
            self.expect("LT")
            elem = self.parse_type()
            self.expect("GT")
            tg = None
            if self.accept("LPAREN"):
                tg = self.expect("ID").value
                self.expect("RPAREN")
            t = A.Type(kind=k, elem=elem, target_graph=tg)
        elif k in ("NSET", "NSEQ", "NORDER"):
            self.i += 1
            tg = None
            if self.accept("LPAREN"):
                tg = self.expect("ID").value
                self.expect("RPAREN")
            t = A.Type(kind=k, target_graph=tg)
        elif k == "COLLECTION":
            self.i += 1
            self.expect("LT")
            elem = self.parse_type()
            self.expect("GT")
            tg = None
            if self.accept("LPAREN"):
                tg = self.expect("ID").value
                self.expect("RPAREN")
            t = A.Type(kind="COLLECTION", elem=elem, target_graph=tg)
        elif k == "MAP":
            self.i += 1
            self.expect("LT")
            key = self.parse_type()
            self.expect("COMMA")
            val = self.parse_type()
            self.expect("GT")
            t = A.Type(kind="MAP", key=key, value=val)
        else:
            p = self.peek()
            raise ParseError(
                f"{self.filename}:{p.line}: expected type, got {p.kind}")
        return t

    # -- statements ------------------------------------------------------
    def parse_block(self) -> A.Block:
        loc = self.loc()
        self.expect("LBRACE")
        stmts = []
        while not self.at("RBRACE"):
            s = self.parse_stmt()
            if s is not None:
                stmts.append(s)
        self.expect("RBRACE")
        return A.Block(stmts=stmts, loc=loc)

    def parse_stmt(self) -> Optional[A.Stmt]:
        loc = self.loc()
        k = self.peek().kind
        if k == "SEMI":
            self.i += 1
            return None
        if k == "LBRACE":
            return self.parse_block()
        if k in ("FOREACH", "FOR"):
            return self.parse_foreach()
        if k == "IF":
            return self.parse_if()
        if k == "WHILE":
            self.i += 1
            self.expect("LPAREN")
            cond = self.parse_expr()
            self.expect("RPAREN")
            body = self.parse_block()
            return A.While(cond=cond, body=body, do_while=False, loc=loc)
        if k == "DO":
            self.i += 1
            body = self.parse_block()
            self.expect("WHILE")
            self.expect("LPAREN")
            cond = self.parse_expr()
            self.expect("RPAREN")
            self.expect("SEMI")
            return A.While(cond=cond, body=body, do_while=True, loc=loc)
        if k == "RETURN":
            self.i += 1
            if self.accept("SEMI"):
                return A.Return(value=None, loc=loc)
            v = self.parse_expr()
            self.expect("SEMI")
            return A.Return(value=v, loc=loc)
        if k in ("BFS", "DFS"):
            return self.parse_bfs(is_bfs=(k == "BFS"))
        if k == "LT":
            return self.parse_argminmax(loc)
        if k == "LBRACKET":
            return self.parse_foreign_stmt(loc)
        if k in _TYPE_STARTS:
            return self.parse_vardecl(loc)
        # assignment / reduce-assign / defer / call
        return self.parse_assign_or_call(loc)

    def parse_vardecl(self, loc) -> A.Stmt:
        t = self.parse_type()
        names = [self.expect("ID").value]
        init = None
        if self.accept("ASSIGN"):
            init = self.parse_expr()
        else:
            while self.accept("COMMA"):
                names.append(self.expect("ID").value)
        self.expect("SEMI")
        return A.VarDecl(type=t, names=names, init=init, loc=loc)

    def parse_lhs(self) -> A.Expr:
        loc = self.loc()
        if self.at("EDGE") and self.peek(1).kind == "LPAREN":
            # Edge(x).prop
            self.i += 1
            self.expect("LPAREN")
            drv = self.expect("ID").value
            self.expect("RPAREN")
            self.expect("DOT")
            prop = self.expect("ID").value
            return A.Field(driver=drv, prop=prop, is_edge_of=True, loc=loc)
        name = self.expect("ID").value
        if self.accept("DOT"):
            prop = self.expect("ID").value
            return A.Field(driver=name, prop=prop, loc=loc)
        if self.at("LBRACKET"):
            self.i += 1
            key = self.parse_expr()
            self.expect("RBRACKET")
            return A.MapAccess(map_name=name, key=key, loc=loc)
        return A.Ident(name=name, loc=loc)

    def parse_assign_or_call(self, loc) -> A.Stmt:
        start = self.i
        lhs = self.parse_lhs()
        k = self.peek().kind
        # builtin call statement: postfix args after field/ident chain
        if k == "LPAREN" or (k == "DOT" and isinstance(lhs, A.Field)):
            self.i = start
            call = self.parse_postfix()
            if not isinstance(call, A.Builtin):
                p = self.peek()
                raise ParseError(
                    f"{self.filename}:{p.line}: expected call statement")
            self.expect("SEMI")
            return A.CallStmt(call=call, loc=loc)
        if k == "ASSIGN":
            self.i += 1
            rhs = self.parse_expr()
            self.expect("SEMI")
            return A.Assign(lhs=lhs, rhs=rhs, loc=loc)
        if k in _REDUCE_EQ:
            op = _REDUCE_EQ[k]
            self.i += 1
            rhs = self.parse_expr()
            bind = self.parse_bind()
            self.expect("SEMI")
            return A.ReduceAssign(lhs=lhs, rhs=rhs, op=op, bind=bind,
                                  loc=loc)
        if k in ("PLUSPLUS", "MINUSMINUS"):
            self.i += 1
            bind = self.parse_bind()
            self.expect("SEMI")
            one = A.Const(value=1 if k == "PLUSPLUS" else -1, ctype="INT",
                          loc=loc)
            return A.ReduceAssign(lhs=lhs, rhs=one, op="SUM", bind=bind,
                                  loc=loc)
        if k == "LE":  # defer assignment  lhs <= rhs @ it
            self.i += 1
            rhs = self.parse_expr()
            bind = self.parse_bind()
            self.expect("SEMI")
            return A.DeferAssign(lhs=lhs, rhs=rhs, bind=bind, loc=loc)
        p = self.peek()
        raise ParseError(
            f"{self.filename}:{p.line}:{p.col}: unexpected {p.kind} in "
            f"statement")

    def _find_list2_close(self) -> int:
        """Index of the closing GT of an argminmax value list."""
        depth = 0
        last_gt = -1
        j = self.i
        while j < len(self.toks):
            k = self.toks[j].kind
            if k in ("LPAREN", "LBRACKET", "LBRACE"):
                depth += 1
            elif k in ("RPAREN", "RBRACKET", "RBRACE"):
                depth -= 1
            elif k == "GT" and depth == 0:
                last_gt = j
            elif k in ("SEMI",) and depth == 0 and last_gt >= 0:
                # ';' separating rhs from extras is inside the list; the
                # statement-ending ';' comes after the final GT.  Track
                # the latest GT and stop at a ';' that follows one with
                # only @id between them.
                nxt = self.toks[last_gt + 1].kind
                if last_gt + 1 == j or (
                        nxt == "AT" and last_gt + 3 == j):
                    return last_gt
            elif k == "EOF":
                break
            j += 1
        if last_gt >= 0:
            return last_gt
        p = self.peek()
        raise ParseError(
            f"{self.filename}:{p.line}: unterminated argminmax list")

    def parse_bind(self) -> Optional[str]:
        if self.accept("AT"):
            return self.expect("ID").value
        return None

    def parse_argminmax(self, loc) -> A.Stmt:
        self.expect("LT")
        lhs = self.parse_lhs()
        self.expect("SEMI")
        extras = [self.parse_lhs()]
        while self.accept("COMMA"):
            extras.append(self.parse_lhs())
        self.expect("GT")
        k = self.peek().kind
        if k not in ("MINEQ", "MAXEQ"):
            p = self.peek()
            raise ParseError(f"{self.filename}:{p.line}: expected min=/max=")
        op = "MIN" if k == "MINEQ" else "MAX"
        self.i += 1
        self.expect("LT")
        # The closing '>' is ambiguous with greater-than (the reference
        # uses a GLR parser): locate it first — the LAST depth-0 '>'
        # before the statement-terminating ';' — then parse the list
        # within that boundary at full precedence.
        close = self._find_list2_close()
        sub = Parser(self.toks[self.i:close] +
                     [Token("EOF", None, 0, 0)], self.filename)
        rhs = sub.parse_expr()
        sub.expect("SEMI")
        rextras = [sub.parse_expr()]
        while sub.accept("COMMA"):
            rextras.append(sub.parse_expr())
        if not sub.at("EOF"):
            p = sub.peek()
            raise ParseError(
                f"{self.filename}:{p.line}: trailing tokens in argminmax "
                f"value list")
        self.i = close + 1  # past the closing '>'.
        bind = self.parse_bind()
        self.expect("SEMI")
        return A.ArgMinMaxAssign(lhs=lhs, lhs_extra=extras, rhs=rhs,
                                 rhs_extra=rextras, op=op, bind=bind,
                                 loc=loc)

    def parse_foreign_stmt(self, loc) -> A.Stmt:
        self.expect("LBRACKET")
        txt = self.expect("USER_TEXT").value
        self.expect("RBRACKET")
        expr = A.Foreign(text=txt, loc=loc)
        mutated: List[A.Expr] = []
        if self.accept("DCOLON"):
            self.expect("LBRACKET")
            mutated.append(self.parse_lhs())
            while self.accept("COMMA"):
                mutated.append(self.parse_lhs())
            self.expect("RBRACKET")
        self.expect("SEMI")
        return A.ForeignStmt(expr=expr, mutated=mutated, loc=loc)

    def parse_foreach(self) -> A.Stmt:
        loc = self.loc()
        sequential = self.peek().kind == "FOR"
        self.i += 1
        it = self.parse_foreach_header()
        filt = None
        if self.at("LPAREN"):
            self.i += 1
            filt = self.parse_expr()
            self.expect("RPAREN")
        body = self.parse_stmt()
        return A.Foreach(iterator=it, filter=filt, body=body,
                         sequential=sequential, loc=loc)

    def parse_foreach_header(self) -> A.Iterator:
        self.expect("LPAREN")
        var = self.expect("ID").value
        self.expect("COLON")
        src = self.expect("ID").value
        src_field = None
        reverse = False
        # field source: id.prop.Items
        if self.peek().kind == "DOT" and self.peek(1).kind == "ID" and \
                self.peek(2).kind == "DOT":
            self.i += 1
            prop = self.expect("ID").value
            src_field = A.Field(driver=src, prop=prop)
        if self.accept("MINUS"):
            reverse = True
        elif self.accept("PLUS"):
            pass
        elif self.accept("CARET"):
            reverse = True
        self.expect("DOT")
        k = self.peek().kind
        common_with = None
        if k == "COMMON_NBRS":
            self.i += 1
            self.expect("LPAREN")
            common_with = self.expect("ID").value
            self.expect("RPAREN")
            it_kind = "COMMON_NBRS"
        elif k in _ITER_KINDS:
            self.i += 1
            it_kind = _ITER_KINDS[k]
        else:
            p = self.peek()
            raise ParseError(
                f"{self.filename}:{p.line}: expected iterator, got {p.kind}")
        self.expect("RPAREN")
        return A.Iterator(var=var, source=src, source_field=src_field,
                          iter_type=it_kind, common_with=common_with,
                          reverse=reverse)

    def parse_if(self) -> A.Stmt:
        loc = self.loc()
        self.expect("IF")
        self.expect("LPAREN")
        cond = self.parse_expr()
        self.expect("RPAREN")
        then = self.parse_stmt()
        els = None
        if self.accept("ELSE"):
            els = self.parse_stmt()
        return A.If(cond=cond, then=then, els=els, loc=loc)

    def parse_bfs(self, is_bfs: bool) -> A.Stmt:
        loc = self.loc()
        self.i += 1  # BFS/DFS
        self.expect("LPAREN")
        var = self.expect("ID").value
        self.expect("COLON")
        srcg = self.expect("ID").value
        transpose = bool(self.accept("CARET"))
        self.expect("DOT")
        self.expect("NODES")
        if not self.accept("FROM"):
            self.expect("SEMI")
        root = self.expect("ID").value
        self.expect("RPAREN")
        navigator = None
        filt = None
        while self.at("LBRACKET", "LPAREN"):
            if self.accept("LBRACKET"):
                navigator = self.parse_expr()
                self.expect("RBRACKET")
            else:
                self.i += 1
                filt = self.parse_expr()
                self.expect("RPAREN")
        body_fw = self.parse_block()
        body_bw = None
        filt_bw = None
        if self.at("BACK", "POST"):
            self.i += 1
            if self.accept("LPAREN"):
                filt_bw = self.parse_expr()
                self.expect("RPAREN")
            body_bw = self.parse_block()
        return A.BFS(var=var, source_graph=srcg, root=root,
                     navigator=navigator, filter_fw=filt,
                     filter_bw=filt_bw, body_fw=body_fw, body_bw=body_bw,
                     transpose=transpose, is_bfs=is_bfs, loc=loc)

    # -- expressions -----------------------------------------------------
    def parse_expr(self) -> A.Expr:
        return self.parse_ternary()

    def parse_ternary(self) -> A.Expr:
        loc = self.loc()
        cond = self.parse_binary(0)
        if self.accept("QUESTION"):
            then = self.parse_expr()
            self.expect("COLON")
            els = self.parse_expr()
            return A.Ternary(cond=cond, then=then, els=els, loc=loc)
        return cond

    def parse_binary(self, min_prec: int) -> A.Expr:
        lhs = self.parse_unary()
        while True:
            k = self.peek().kind
            if k not in _BINOPS:
                return lhs
            prec, sym = _BINOPS[k]
            if prec < min_prec:
                return lhs
            loc = self.loc()
            self.i += 1
            rhs = self.parse_binary(prec + 1)
            lhs = A.BinOp(op=sym, lhs=lhs, rhs=rhs, loc=loc)

    def parse_unary(self) -> A.Expr:
        loc = self.loc()
        k = self.peek().kind
        if k == "MINUS":
            self.i += 1
            return A.UnOp(op="NEG", operand=self.parse_unary(), loc=loc)
        if k == "NOT":
            self.i += 1
            return A.UnOp(op="NOT", operand=self.parse_unary(), loc=loc)
        if k == "BAR":
            self.i += 1
            e = self.parse_expr()
            self.expect("BAR")
            return A.UnOp(op="ABS", operand=e, loc=loc)
        if k == "LPAREN":
            # cast '(' prim_type ')' expr  vs parenthesized expr
            if self.peek(1).kind in ("INT", "LONG", "FLOAT", "DOUBLE",
                                     "BOOL") and self.peek(2).kind == \
                    "RPAREN":
                self.i += 1
                t = self.parse_type()
                self.expect("RPAREN")
                return A.Cast(to=t, operand=self.parse_unary(), loc=loc)
            self.i += 1
            e = self.parse_expr()
            self.expect("RPAREN")
            return e
        return self.parse_primary()

    def parse_primary(self) -> A.Expr:
        loc = self.loc()
        k = self.peek().kind
        if k == "INT_NUM":
            return A.Const(value=self.toks[self._next()].value,
                           ctype="INT", loc=loc)
        if k == "FLOAT_NUM":
            return A.Const(value=self.toks[self._next()].value,
                           ctype="FLOAT", loc=loc)
        if k == "BOOL_VAL":
            return A.Const(value=self.toks[self._next()].value,
                           ctype="BOOL", loc=loc)
        if k == "P_INF":
            self.i += 1
            return A.Const(value=float("inf"), ctype="INF", loc=loc)
        if k == "M_INF":
            self.i += 1
            return A.Const(value=float("-inf"), ctype="INF", loc=loc)
        if k == "NIL":
            self.i += 1
            return A.Const(value=None, ctype="NIL", loc=loc)
        if k in _REDUCE_OPS or k == "COUNT":
            return self.parse_reduce_expr(loc)
        if k == "LBRACKET":
            self.i += 1
            txt = self.expect("USER_TEXT").value
            self.expect("RBRACKET")
            return A.Foreign(text=txt, loc=loc)
        if k == "ID" or (k == "EDGE" and self.peek(1).kind == "LPAREN"):
            return self.parse_postfix()
        p = self.peek()
        raise ParseError(
            f"{self.filename}:{p.line}:{p.col}: unexpected {p.kind} in "
            f"expression")

    def _next(self) -> int:
        i = self.i
        self.i += 1
        return i

    def parse_reduce_expr(self, loc) -> A.Expr:
        k = self.peek().kind
        self.i += 1
        op = "COUNT" if k == "COUNT" else _REDUCE_OPS[k]
        it = self.parse_foreach_header()
        filt = None
        body = None
        if k == "COUNT":
            if self.at("LPAREN"):
                self.i += 1
                filt = self.parse_expr()
                self.expect("RPAREN")
            body = A.Const(value=1, ctype="INT", loc=loc)
        else:
            if self.at("LPAREN"):
                self.i += 1
                filt = self.parse_expr()
                self.expect("RPAREN")
            self.expect("LBRACE")
            body = self.parse_expr()
            self.expect("RBRACE")
        return A.ReduceExpr(op=op, iterator=it, filter=filt, body=body,
                            loc=loc)

    def parse_postfix(self) -> A.Expr:
        """id | id.id | id(args) | id.id(args) | field.id(args) |
        id[expr] | Edge(x).prop"""
        loc = self.loc()
        if self.at("EDGE"):
            self.i += 1
            self.expect("LPAREN")
            drv = self.expect("ID").value
            self.expect("RPAREN")
            self.expect("DOT")
            prop = self.expect("ID").value
            base: A.Expr = A.Field(driver=drv, prop=prop, is_edge_of=True,
                                   loc=loc)
        else:
            name = self.expect("ID").value
            if self.at("LPAREN"):
                args = self.parse_args()
                return A.Builtin(driver=None, name=name, args=args, loc=loc)
            if self.at("LBRACKET"):
                self.i += 1
                key = self.parse_expr()
                self.expect("RBRACKET")
                base = A.MapAccess(map_name=name, key=key, loc=loc)
                # map_access.method(...) not in grammar; stop here
                return base
            if self.at("DOT"):
                self.i += 1
                second = self.expect("ID").value
                if self.at("LPAREN"):
                    return A.Builtin(driver=name, name=second,
                                     args=self.parse_args(), loc=loc)
                base = A.Field(driver=name, prop=second, loc=loc)
            else:
                return A.Ident(name=name, loc=loc)
        # optional .method(args) on a field (built_in: field '.' id args)
        if self.at("DOT"):
            save = self.i
            self.i += 1
            if self.at("ID") and self.peek(1).kind == "LPAREN":
                mname = self.expect("ID").value
                return A.Builtin(driver=None, driver_field=base,
                                 name=mname, args=self.parse_args(),
                                 loc=loc)
            self.i = save
        return base

    def parse_args(self) -> List[A.Expr]:
        self.expect("LPAREN")
        args = []
        if not self.at("RPAREN"):
            args.append(self.parse_expr())
            while self.accept("COMMA"):
                args.append(self.parse_expr())
        self.expect("RPAREN")
        return args


def parse(text: str, filename: str = "<input>") -> List[A.Procedure]:
    return Parser(tokenize(text, filename), filename).parse_program()


def parse_file(path: str) -> List[A.Procedure]:
    with open(path) as f:
        return parse(f.read(), path)
