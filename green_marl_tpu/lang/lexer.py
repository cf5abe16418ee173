"""Green-Marl lexer.

Token inventory mirrors the reference flex scanner
(``src/parse/gm_lex.l``): keyword synonyms (``Procedure``/``Proc``,
``N_P``/``Node_Prop``/``Node_Property``, ...), compound operators
(``+= ++ -- *= &= |= min= max= == != <= >= && || ::``), ``+INF/-INF``,
``True/False``, C and C++ comments, and ``[ ... ]`` foreign-text capture
(``gm_parse_foreign_syntax.cc``) which the parser requests explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

KEYWORDS = {
    "Local": "LOCAL", "Procedure": "PROC", "Proc": "PROC",
    "InBFS": "BFS", "InDFS": "DFS", "InPost": "POST", "InRBFS": "RBFS",
    "From": "FROM", "To": "TO", "InReverse": "BACK",
    "Graph": "GRAPH", "Node": "NODE", "Edge": "EDGE",
    "Node_Property": "NODEPROP", "Node_Prop": "NODEPROP", "N_P": "NODEPROP",
    "Edge_Property": "EDGEPROP", "Edge_Prop": "EDGEPROP", "E_P": "EDGEPROP",
    "Node_Set": "NSET", "N_S": "NSET",
    "Node_Order": "NORDER", "N_O": "NORDER",
    "Node_Seq": "NSEQ", "Node_Sequence": "NSEQ", "N_Q": "NSEQ",
    "Collection": "COLLECTION", "Map": "MAP",
    "Int": "INT", "Long": "LONG", "Float": "FLOAT", "Double": "DOUBLE",
    "Bool": "BOOL",
    "Nodes": "NODES", "Edges": "EDGES",
    "Nbrs": "NBRS", "OutNbrs": "NBRS", "InNbrs": "IN_NBRS",
    "UpNbrs": "UP_NBRS", "DownNbrs": "DOWN_NBRS", "Items": "ITEMS",
    "CommonNbrs": "COMMON_NBRS",
    "Foreach": "FOREACH", "For": "FOR",
    "And": "AND", "Or": "OR",
    "If": "IF", "Else": "ELSE", "While": "WHILE", "Return": "RETURN",
    "Do": "DO",
    "Sum": "SUM", "Avg": "AVG", "Count": "COUNT", "Product": "PRODUCT",
    "Max": "MAXR", "Min": "MINR", "All": "ALL", "Exist": "EXIST",
    "NIL": "NIL",
}

BOOL_VALS = {"True": True, "False": False}

# longest-match first
OPERATORS = [
    ("min=", "MINEQ"), ("max=", "MAXEQ"),
    ("::", "DCOLON"), ("&&", "AND"), ("||", "OR"), ("==", "EQ"),
    ("!=", "NEQ"), ("<=", "LE"), (">=", "GE"), ("+=", "PLUSEQ"),
    ("++", "PLUSPLUS"), ("--", "MINUSMINUS"), ("*=", "MULTEQ"),
    ("&=", "ANDEQ"), ("|=", "OREQ"),
    ("+", "PLUS"), ("-", "MINUS"), ("*", "STAR"), ("/", "SLASH"),
    ("%", "PERCENT"), ("<", "LT"), (">", "GT"), ("=", "ASSIGN"),
    ("!", "NOT"), ("|", "BAR"), ("(", "LPAREN"), (")", "RPAREN"),
    ("{", "LBRACE"), ("}", "RBRACE"), ("[", "LBRACKET"), ("]", "RBRACKET"),
    (";", "SEMI"), (":", "COLON"), (",", "COMMA"), (".", "DOT"),
    ("?", "QUESTION"), ("@", "AT"), ("^", "CARET"),
]


@dataclass
class Token:
    kind: str
    value: object
    line: int
    col: int

    def __repr__(self):
        return f"{self.kind}({self.value!r})@{self.line}:{self.col}"


class LexError(Exception):
    pass


class Lexer:
    def __init__(self, text: str, filename: str = "<input>"):
        self.text = text
        self.filename = filename
        self.pos = 0
        self.line = 1
        self.col = 1

    def _adv(self, n: int = 1):
        for _ in range(n):
            if self.pos < len(self.text) and self.text[self.pos] == "\n":
                self.line += 1
                self.col = 1
            else:
                self.col += 1
            self.pos += 1

    def _skip_ws_comments(self):
        t = self.text
        while self.pos < len(t):
            c = t[self.pos]
            if c in " \t\r\n":
                self._adv()
            elif t.startswith("//", self.pos):
                while self.pos < len(t) and t[self.pos] != "\n":
                    self._adv()
            elif t.startswith("/*", self.pos):
                self._adv(2)
                while self.pos < len(t) and not t.startswith("*/", self.pos):
                    self._adv()
                if self.pos >= len(t):
                    raise LexError(
                        f"{self.filename}:{self.line}: unterminated comment")
                self._adv(2)
            else:
                return

    def read_user_text(self) -> str:
        """Capture raw text up to the matching ']' (foreign syntax)."""
        t = self.text
        depth = 1
        start = self.pos
        while self.pos < len(t):
            c = t[self.pos]
            if c == "[":
                depth += 1
            elif c == "]":
                depth -= 1
                if depth == 0:
                    out = t[start:self.pos]
                    self._adv()  # consume ']'
                    return out
            self._adv()
        raise LexError(f"{self.filename}:{self.line}: unterminated [ text")

    def tokens(self) -> List[Token]:
        out: List[Token] = []
        t = self.text
        while True:
            self._skip_ws_comments()
            if self.pos >= len(t):
                out.append(Token("EOF", None, self.line, self.col))
                return out
            line, col = self.line, self.col
            c = t[self.pos]

            # +INF / -INF / INF (lexer-level, before operators)
            for lit, kind in (("+INF", "P_INF"), ("-INF", "M_INF"),
                              ("INF", "P_INF")):
                if t.startswith(lit, self.pos):
                    nxt = self.pos + len(lit)
                    if nxt >= len(t) or not (t[nxt].isalnum()
                                             or t[nxt] == "_"):
                        self._adv(len(lit))
                        out.append(Token(kind, lit, line, col))
                        break
            else:
                if c.isdigit() or (c == "." and self.pos + 1 < len(t)
                                   and t[self.pos + 1].isdigit()):
                    j = self.pos
                    isf = False
                    while j < len(t) and (t[j].isdigit() or t[j] in ".eE"
                                          or (t[j] in "+-"
                                              and t[j - 1] in "eE")):
                        if t[j] in ".eE":
                            isf = True
                        j += 1
                    raw = t[self.pos:j]
                    self._adv(j - self.pos)
                    out.append(Token("FLOAT_NUM" if isf else "INT_NUM",
                                     float(raw) if isf else int(raw),
                                     line, col))
                    continue
                # min= / max= outrank identifier scanning (gm_lex.l order)
                if t.startswith("min=", self.pos) or \
                        t.startswith("max=", self.pos):
                    lit = t[self.pos:self.pos + 4]
                    self._adv(4)
                    out.append(Token("MINEQ" if lit[1] == "i" else "MAXEQ",
                                     lit, line, col))
                    continue
                if c.isalpha() or c == "_":
                    j = self.pos
                    while j < len(t) and (t[j].isalnum() or t[j] == "_"):
                        j += 1
                    word = t[self.pos:j]
                    self._adv(j - self.pos)
                    if word in BOOL_VALS:
                        out.append(Token("BOOL_VAL", BOOL_VALS[word],
                                         line, col))
                    elif word in KEYWORDS:
                        out.append(Token(KEYWORDS[word], word, line, col))
                    else:
                        out.append(Token("ID", word, line, col))
                    continue
                if c == "[" and (not out or out[-1].kind not in
                                 ("ID", "RPAREN", "RBRACKET", "DCOLON")):
                    # foreign-syntax escape: capture raw text to the
                    # matching ']' (gm_lex.l user-text mode)
                    self._adv(1)
                    txt = self.read_user_text()
                    out.append(Token("LBRACKET", "[", line, col))
                    out.append(Token("USER_TEXT", txt, line, col))
                    out.append(Token("RBRACKET", "]", self.line, self.col))
                    continue
                for lit, kind in OPERATORS:
                    if t.startswith(lit, self.pos):
                        self._adv(len(lit))
                        out.append(Token(kind, lit, line, col))
                        break
                else:
                    raise LexError(
                        f"{self.filename}:{line}:{col}: bad character "
                        f"{c!r}")
                continue
            continue


def tokenize(text: str, filename: str = "<input>") -> List[Token]:
    return Lexer(text, filename).tokens()
