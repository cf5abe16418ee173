"""Green-Marl AST.

Python dataclass mirror of the reference AST node inventory
(``src/inc/gm_ast.h:16-3063``): ``ast_procdef``, ``ast_foreach`` (2504),
``ast_bfs`` (2662), ``ast_assign`` incl. reduce/defer/argminmax (2121),
``ast_expr_reduce``, if/while/return/call/foreign/vardecl, field and map
access.  Line/column info is carried on every node (``gm_error.cc``-style
diagnostics).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import List, Optional, Tuple

# ---- types ---------------------------------------------------------------

PRIM_TYPES = {"INT", "LONG", "FLOAT", "DOUBLE", "BOOL"}


@dataclass
class Type:
    kind: str                      # INT/LONG/FLOAT/DOUBLE/BOOL/GRAPH/
    #                                NODE/EDGE/NODEPROP/EDGEPROP/
    #                                NSET/NSEQ/NORDER/COLLECTION/MAP
    target_graph: Optional[str] = None   # Node(G), N_P<..>(G), ...
    elem: Optional["Type"] = None        # property payload / collection of
    key: Optional["Type"] = None         # map key
    value: Optional["Type"] = None       # map value

    def is_prim(self) -> bool:
        return self.kind in PRIM_TYPES

    def is_property(self) -> bool:
        return self.kind in ("NODEPROP", "EDGEPROP")

    def is_collection(self) -> bool:
        return self.kind in ("NSET", "NSEQ", "NORDER", "COLLECTION")

    def __str__(self):
        if self.kind in ("NODEPROP", "EDGEPROP"):
            return f"{self.kind}<{self.elem}>"
        if self.kind == "MAP":
            return f"Map<{self.key},{self.value}>"
        return self.kind


@dataclass
class Loc:
    line: int = 0
    col: int = 0


# ---- expressions ---------------------------------------------------------

@dataclass
class Expr:
    loc: Loc = dfield(default_factory=Loc)


@dataclass
class Const(Expr):
    value: object = None
    ctype: str = "INT"     # INT/FLOAT/BOOL/INF/NIL


@dataclass
class Ident(Expr):
    name: str = ""


@dataclass
class Field(Expr):
    driver: str = ""       # iterator/node var or graph name
    prop: str = ""
    is_edge_of: bool = False   # Edge(x).prop form


@dataclass
class MapAccess(Expr):
    map_name: str = ""
    key: Expr = None


@dataclass
class UnOp(Expr):
    op: str = ""           # NEG/NOT/ABS
    operand: Expr = None


@dataclass
class Cast(Expr):
    to: Type = None
    operand: Expr = None


@dataclass
class BinOp(Expr):
    op: str = ""           # + - * / % < > <= >= == != && ||
    lhs: Expr = None
    rhs: Expr = None


@dataclass
class Ternary(Expr):
    cond: Expr = None
    then: Expr = None
    els: Expr = None


@dataclass
class Builtin(Expr):
    driver: Optional[str] = None    # None = global function
    driver_field: Optional["Field"] = None
    name: str = ""
    args: List[Expr] = dfield(default_factory=list)


@dataclass
class Iterator:
    var: str = ""
    source: str = ""                # id or "driver.prop" for field source
    source_field: Optional[Field] = None
    iter_type: str = "NODES"        # NODES/EDGES/NBRS/IN_NBRS/UP_NBRS/
    #                                 DOWN_NBRS/ITEMS/COMMON_NBRS
    common_with: Optional[str] = None
    reverse: bool = False           # G-.Nodes


@dataclass
class ReduceExpr(Expr):
    op: str = ""                    # SUM/PRODUCT/MIN/MAX/AND/OR/AVG/COUNT
    iterator: Iterator = None
    filter: Optional[Expr] = None
    body: Expr = None


@dataclass
class Foreign(Expr):
    text: str = ""


# ---- statements ----------------------------------------------------------

@dataclass
class Stmt:
    loc: Loc = dfield(default_factory=Loc)


@dataclass
class Block(Stmt):
    stmts: List[Stmt] = dfield(default_factory=list)


@dataclass
class VarDecl(Stmt):
    type: Type = None
    names: List[str] = dfield(default_factory=list)
    init: Optional[Expr] = None


@dataclass
class Assign(Stmt):
    lhs: Expr = None               # Ident | Field | MapAccess
    rhs: Expr = None


@dataclass
class ReduceAssign(Stmt):
    lhs: Expr = None
    rhs: Expr = None
    op: str = ""                   # SUM(+=)/MULT/MIN/MAX/AND/OR
    bind: Optional[str] = None     # @ iterator


@dataclass
class DeferAssign(Stmt):
    lhs: Expr = None
    rhs: Expr = None
    bind: Optional[str] = None


@dataclass
class ArgMinMaxAssign(Stmt):
    lhs: Expr = None
    lhs_extra: List[Expr] = dfield(default_factory=list)
    rhs: Expr = None
    rhs_extra: List[Expr] = dfield(default_factory=list)
    op: str = "MIN"
    bind: Optional[str] = None


@dataclass
class Foreach(Stmt):
    iterator: Iterator = None
    filter: Optional[Expr] = None
    body: Stmt = None
    sequential: bool = False       # For vs Foreach


@dataclass
class If(Stmt):
    cond: Expr = None
    then: Stmt = None
    els: Optional[Stmt] = None


@dataclass
class While(Stmt):
    cond: Expr = None
    body: Stmt = None
    do_while: bool = False


@dataclass
class Return(Stmt):
    value: Optional[Expr] = None


@dataclass
class CallStmt(Stmt):
    call: Builtin = None


@dataclass
class ForeignStmt(Stmt):
    expr: Foreign = None
    mutated: List[Expr] = dfield(default_factory=list)


@dataclass
class BFS(Stmt):
    """InBFS/InDFS with optional navigator/filters and reverse/post body
    (grammar ``sent_bfs``/``sent_dfs``, gm_grammer.y:266-304)."""
    var: str = ""
    source_graph: str = ""
    root: str = ""
    navigator: Optional[Expr] = None
    filter_fw: Optional[Expr] = None
    filter_bw: Optional[Expr] = None
    body_fw: Stmt = None
    body_bw: Optional[Stmt] = None
    transpose: bool = False        # G^.Nodes
    is_bfs: bool = True            # False = DFS


# ---- procedure -----------------------------------------------------------

@dataclass
class ArgDecl:
    names: List[str]
    type: Type


@dataclass
class Procedure:
    name: str
    args: List[ArgDecl]
    out_args: List[ArgDecl]
    return_type: Optional[Type]
    body: Block
    is_local: bool = False
    loc: Loc = dfield(default_factory=Loc)
