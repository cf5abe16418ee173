"""Table-driven builtin manager.

Port of ``src/inc/gm_builtin.h:84-170`` / ``src/common/gm_builtin.cc``:
signature strings ``"Source:Name:ReturnType:NumArgs:ArgTypes..."`` with
``"*Synonym"`` rows inheriting the previous definition, ``"!NI_*"`` rows
restricted to specific iterator kinds, ``"_"`` for global functions, and
aux flags (needs reverse edges / neighbor check / edge source / mutating).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

# (source, name, return, args, aux)
_TABLE_SRC = [
    ("Graph", "NumNodes", "Int", [], ""),
    ("Graph", "NumEdges", "Int", [], ""),
    ("Graph", "PickRandom", "Node", [], ""),
    ("Node", "NumNbrs", "Int", [], ""),
    ("*", "NumOutNbrs", None, None, None),
    ("*", "Degree", None, None, None),
    ("*", "OutDegree", None, None, None),
    ("Node", "NumInNbrs", "Int", [], "use_reverse"),
    ("*", "InDegree", None, None, None),
    ("Node", "IsNbrFrom", "Bool", ["Node"], "check_nbr"),
    ("*", "HasEdgeFrom", None, None, None),
    ("Node", "HasEdgeTo", "Bool", ["Node"], "check_nbr"),
    ("Node", "PickRandomNbr", "Node", [], "check_nbr"),
    ("!NI_In", "ToEdge", "Edge", [], ""),
    ("!NI_Out", "ToEdge", "Edge", [], ""),
    ("!NI_Down", "ToEdge", "Edge", [], ""),
    ("!NI_Up", "ToEdge", "Edge", [], ""),
    ("Edge", "FromNode", "Node", [], "need_from"),
    ("Edge", "ToNode", "Node", [], ""),
    ("N_S", "Add", "Void", ["Node"], "mutate_grow"),
    ("N_S", "Remove", "Void", ["Node"], "mutate_shrink"),
    ("N_S", "Has", "Bool", ["Node"], ""),
    ("N_S", "Union", "Void", ["N_S"], "mutate_grow"),
    ("N_S", "Intersect", "Void", ["N_S"], "mutate_shrink"),
    ("N_S", "Complement", "Void", ["N_S"], "mutate_shrink"),
    ("N_S", "IsSubsetOf", "Bool", ["N_S"], ""),
    ("N_S", "Size", "Int", [], ""),
    ("N_S", "Clear", "Void", [], "mutate_shrink"),
    ("N_O", "PushBack", "Void", ["Node"], "mutate_grow"),
    ("*", "Push", None, None, None),
    ("N_O", "PushFront", "Void", ["Node"], "mutate_grow"),
    ("N_O", "PopBack", "Node", [], "mutate_shrink"),
    ("N_O", "PopFront", "Node", [], "mutate_shrink"),
    ("*", "Pop", None, None, None),
    ("N_O", "Has", "Bool", ["Node"], ""),
    ("N_O", "Size", "Int", [], ""),
    ("N_Q", "PushBack", "Void", ["Node"], "mutate_grow"),
    ("*", "Push", None, None, None),
    ("N_Q", "PushFront", "Void", ["Node"], "mutate_grow"),
    ("N_Q", "PopBack", "Node", [], "mutate_shrink"),
    ("N_Q", "PopFront", "Node", [], "mutate_shrink"),
    ("*", "Pop", None, None, None),
    ("N_Q", "Size", "Int", [], ""),
    ("_", "Uniform", "Double", [], ""),
    ("_", "Rand", "Long", ["Long"], ""),
    ("_", "Log", "Double", ["Double"], ""),
    ("_", "Exp", "Double", ["Double"], ""),
    ("_", "Pow", "Double", ["Double", "Double"], ""),
    ("Map", "Size", "Int", [], ""),
    ("Map", "Clear", "Void", [], ""),
    ("Map", "HasKey", "Bool", ["Generic"], ""),
    ("Map", "HasMaxValue", "Bool", ["Generic"], ""),
    ("Map", "HasMinValue", "Bool", ["Generic"], ""),
    ("Map", "GetMaxKey", "Generic", [], ""),
    ("Map", "GetMinKey", "Generic", [], ""),
    ("Map", "GetMaxValue", "Generic", [], ""),
    ("Map", "GetMinValue", "Generic", [], ""),
    ("Map", "Remove", "Void", ["Generic"], ""),
]

# source-string -> our Type.kind families
_SOURCE_KINDS = {
    "Graph": {"GRAPH"},
    "Node": {"NODE"},
    "Edge": {"EDGE"},
    "N_S": {"NSET", "COLLECTION"},
    "N_O": {"NORDER", "COLLECTION"},
    "N_Q": {"NSEQ", "COLLECTION"},
    "Map": {"MAP"},
    "_": {"_"},
    "!NI_In": {"NODE"}, "!NI_Out": {"NODE"},
    "!NI_Up": {"NODE"}, "!NI_Down": {"NODE"},
}

_ITER_REQ = {"!NI_In": "IN_NBRS", "!NI_Out": "NBRS",
             "!NI_Up": "UP_NBRS", "!NI_Down": "DOWN_NBRS"}


@dataclass(frozen=True)
class BuiltinDef:
    source: str
    name: str
    ret: str                 # type-kind string (Int/Node/.../Generic/Void)
    arg_types: Tuple[str, ...]
    aux: str
    iter_req: Optional[str]  # required iterator kind (ToEdge variants)


def _build() -> List[BuiltinDef]:
    out: List[BuiltinDef] = []
    prev: Optional[BuiltinDef] = None
    for src, name, ret, args, aux in _TABLE_SRC:
        if src == "*":
            assert prev is not None
            d = BuiltinDef(prev.source, name, prev.ret, prev.arg_types,
                           prev.aux, prev.iter_req)
        else:
            d = BuiltinDef(src, name, ret, tuple(args or ()), aux or "",
                           _ITER_REQ.get(src))
        out.append(d)
        prev = d
    return out


TABLE = _build()


def lookup(source_kind: str, name: str,
           iter_kind: Optional[str] = None) -> Optional[BuiltinDef]:
    """Find a builtin for a driver of ``source_kind`` (our Type.kind, or
    "_" for global).  ``iter_kind`` filters the !NI_ rows (ToEdge)."""
    for d in TABLE:
        if name != d.name:
            continue
        kinds = _SOURCE_KINDS.get(d.source, set())
        if source_kind not in kinds:
            continue
        if d.iter_req is not None and iter_kind is not None \
                and d.iter_req != iter_kind:
            continue
        return d
    return None
