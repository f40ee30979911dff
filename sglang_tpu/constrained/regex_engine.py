"""Regex → byte-level DFA compiler.

Equivalent role to the reference's outsourced grammar engines (xgrammar /
outlines, ``srt/constrained/``) — built in-repo since neither ships in the
TPU image.  Supports the regex subset that JSON-schema compilation and
typical constrained-decoding patterns need:

  literals, escapes (\\d \\w \\s \\n \\t \\r \\\\ …), ``.``,
  char classes ``[a-z0-9_]`` / negated ``[^…]``, groups ``( … )``,
  alternation ``|``, quantifiers ``* + ? {m} {m,} {m,n}``.

Pipeline: parse → Thompson NFA → subset-construction DFA over the BYTE
alphabet (UTF-8; non-ASCII literals contribute their encoded bytes), with
a dense ``[num_states, 256]`` int32 transition table (-1 = dead) so token
masks can be computed with vectorized numpy walks (see token_fsm.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

import numpy as np

MAX_DFA_STATES = 1 << 14

# ------------------------------------------------------------------ parsing

_CLASS_ESCAPES = {
    "d": [(48, 57)],
    "D": [(0, 47), (58, 255)],
    "w": [(48, 57), (65, 90), (95, 95), (97, 122)],
    "W": [(0, 47), (58, 64), (91, 94), (96, 96), (123, 255)],
    "s": [(9, 13), (32, 32)],
    "S": [(0, 8), (14, 31), (33, 255)],
}
_CHAR_ESCAPES = {
    "n": 10, "t": 9, "r": 13, "f": 12, "v": 11, "0": 0, "a": 7, "b": 8,
}


@dataclass
class _Node:
    kind: str  # "char" | "concat" | "alt" | "star" | "plus" | "opt" | "repeat" | "empty"
    ranges: Optional[List[Tuple[int, int]]] = None  # for "char": byte ranges
    children: List["_Node"] = field(default_factory=list)
    lo: int = 0
    hi: int = 0  # for "repeat" {lo,hi}; hi == -1 → unbounded


class RegexParseError(ValueError):
    pass


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self) -> _Node:
        node = self._alt()
        if self.i != len(self.p):
            raise RegexParseError(f"unexpected {self.p[self.i]!r} at {self.i}")
        return node

    def _alt(self) -> _Node:
        branches = [self._concat()]
        while self.peek() == "|":
            self.next()
            branches.append(self._concat())
        if len(branches) == 1:
            return branches[0]
        return _Node("alt", children=branches)

    def _concat(self) -> _Node:
        items: List[_Node] = []
        while self.peek() not in (None, "|", ")"):
            items.append(self._repeat())
        if not items:
            return _Node("empty")
        if len(items) == 1:
            return items[0]
        return _Node("concat", children=items)

    def _repeat(self) -> _Node:
        atom = self._atom()
        while True:
            c = self.peek()
            if c == "*":
                self.next()
                atom = _Node("star", children=[atom])
            elif c == "+":
                self.next()
                atom = _Node("plus", children=[atom])
            elif c == "?":
                self.next()
                atom = _Node("opt", children=[atom])
            elif c == "{":
                save = self.i
                self.next()
                digits = ""
                while self.peek() and self.peek().isdigit():
                    digits += self.next()
                if not digits:
                    self.i = save  # literal '{'
                    break
                lo = int(digits)
                hi = lo
                if self.peek() == ",":
                    self.next()
                    digits2 = ""
                    while self.peek() and self.peek().isdigit():
                        digits2 += self.next()
                    hi = int(digits2) if digits2 else -1
                if self.peek() != "}":
                    self.i = save
                    break
                self.next()
                atom = _Node("repeat", children=[atom], lo=lo, hi=hi)
            else:
                break
        return atom

    def _atom(self) -> _Node:
        c = self.next()
        if c == "(":
            if self.peek() == "?":  # (?: non-capturing / flags — skip prefix
                self.next()
                if self.peek() == ":":
                    self.next()
                else:
                    raise RegexParseError("only (?: groups supported")
            node = self._alt()
            if self.peek() != ")":
                raise RegexParseError("unbalanced (")
            self.next()
            return node
        if c == "[":
            return self._char_class()
        if c == ".":
            return _Node("char", ranges=[(0, 9), (11, 255)])  # not \n
        if c == "\\":
            return self._escape()
        if c in ")|":
            raise RegexParseError(f"unexpected {c!r}")
        if c in "^$":
            # anchors are implicit in full-match semantics; ignore
            return _Node("empty")
        return self._literal(c)

    def _literal(self, ch: str) -> _Node:
        bs = ch.encode("utf-8")
        nodes = [_Node("char", ranges=[(b, b)]) for b in bs]
        if len(nodes) == 1:
            return nodes[0]
        return _Node("concat", children=nodes)

    def _escape(self) -> _Node:
        c = self.next()
        if c in _CLASS_ESCAPES:
            return _Node("char", ranges=list(_CLASS_ESCAPES[c]))
        if c in _CHAR_ESCAPES:
            return _Node("char", ranges=[(_CHAR_ESCAPES[c],) * 2])
        if c == "x":
            h = self.next() + self.next()
            b = int(h, 16)
            return _Node("char", ranges=[(b, b)])
        if c == "u":
            h = "".join(self.next() for _ in range(4))
            return self._literal(chr(int(h, 16)))
        # escaped punctuation: literal
        return self._literal(c)

    def _char_class(self) -> _Node:
        negate = False
        if self.peek() == "^":
            self.next()
            negate = True
        ranges: List[Tuple[int, int]] = []
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise RegexParseError("unbalanced [")
            if c == "]" and not first:
                self.next()
                break
            first = False
            c = self.next()
            if c == "\\":
                e = self.next()
                if e in _CLASS_ESCAPES:
                    ranges.extend(_CLASS_ESCAPES[e])
                    continue
                if e in _CHAR_ESCAPES:
                    lo_b = _CHAR_ESCAPES[e]
                elif e == "x":
                    lo_b = int(self.next() + self.next(), 16)
                else:
                    lo_b = self._class_char_bytes(e)
            else:
                lo_b = self._class_char_bytes(c)
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.next()
                c2 = self.next()
                if c2 == "\\":
                    e2 = self.next()
                    if e2 == "x":
                        hi_b = int(self.next() + self.next(), 16)
                    elif e2 in _CHAR_ESCAPES:
                        hi_b = _CHAR_ESCAPES[e2]
                    else:
                        hi_b = self._class_char_bytes(e2)
                else:
                    hi_b = self._class_char_bytes(c2)
                ranges.append((lo_b, hi_b))
            else:
                ranges.append((lo_b, lo_b))
        if negate:
            ranges = _negate_ranges(ranges)
        return _Node("char", ranges=ranges)

    def _class_char_bytes(self, ch: str) -> int:
        bs = ch.encode("utf-8")
        if len(bs) > 1:
            raise RegexParseError(
                "non-ASCII characters in classes are not supported"
            )
        return bs[0]


def _negate_ranges(ranges: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    allowed = np.zeros(256, bool)
    for lo, hi in ranges:
        allowed[lo : hi + 1] = True
    out = []
    start = None
    for b in range(256):
        if not allowed[b]:
            if start is None:
                start = b
        elif start is not None:
            out.append((start, b - 1))
            start = None
    if start is not None:
        out.append((start, 255))
    return out


# ---------------------------------------------------------------- NFA build


class _NFA:
    """Thompson construction with epsilon transitions."""

    def __init__(self):
        self.eps: List[Set[int]] = []
        self.trans: List[List[Tuple[int, int, int]]] = []  # (lo, hi, dst)

    def new_state(self) -> int:
        self.eps.append(set())
        self.trans.append([])
        return len(self.eps) - 1

    def add_eps(self, a: int, b: int):
        self.eps[a].add(b)

    def add_range(self, a: int, lo: int, hi: int, b: int):
        self.trans[a].append((lo, hi, b))

    def build(self, node: _Node) -> Tuple[int, int]:
        """Returns (start, accept)."""
        k = node.kind
        if k == "empty":
            s = self.new_state()
            return s, s
        if k == "char":
            s, a = self.new_state(), self.new_state()
            for lo, hi in node.ranges:
                self.add_range(s, lo, hi, a)
            return s, a
        if k == "concat":
            s, a = self.build(node.children[0])
            for child in node.children[1:]:
                s2, a2 = self.build(child)
                self.add_eps(a, s2)
                a = a2
            return s, a
        if k == "alt":
            s, a = self.new_state(), self.new_state()
            for child in node.children:
                cs, ca = self.build(child)
                self.add_eps(s, cs)
                self.add_eps(ca, a)
            return s, a
        if k == "star":
            s, a = self.new_state(), self.new_state()
            cs, ca = self.build(node.children[0])
            self.add_eps(s, cs)
            self.add_eps(s, a)
            self.add_eps(ca, cs)
            self.add_eps(ca, a)
            return s, a
        if k == "plus":  # X+ = X X*
            cs, ca = self.build(node.children[0])
            ss, sa = self.build(_Node("star", children=[node.children[0]]))
            self.add_eps(ca, ss)
            return cs, sa
        if k == "opt":
            s, a = self.new_state(), self.new_state()
            cs, ca = self.build(node.children[0])
            self.add_eps(s, cs)
            self.add_eps(ca, a)
            self.add_eps(s, a)
            return s, a
        if k == "repeat":
            lo, hi = node.lo, node.hi
            if hi != -1 and hi > 256:
                raise RegexParseError("repeat bound too large (>256)")
            if lo > 256:
                raise RegexParseError("repeat bound too large (>256)")
            s = self.new_state()
            cur = s
            for _ in range(lo):
                cs, ca = self.build(node.children[0])
                self.add_eps(cur, cs)
                cur = ca
            if hi == -1:
                ss, sa = self.build(_Node("star", children=[node.children[0]]))
                self.add_eps(cur, ss)
                cur = sa
            else:
                ends = [cur]
                for _ in range(hi - lo):
                    cs, ca = self.build(node.children[0])
                    self.add_eps(cur, cs)
                    cur = ca
                    ends.append(cur)
                final = self.new_state()
                for e in ends:
                    self.add_eps(e, final)
                cur = final
            return s, cur
        raise RegexParseError(f"unknown node kind {k}")

# ---------------------------------------------------------------- DFA build


@dataclass
class DFA:
    """Dense byte-level DFA.

    ``table``  — int32 [num_states, 256]; -1 = dead transition.
    ``accept`` — bool [num_states].
    State 0 is the start state.
    """

    table: np.ndarray
    accept: np.ndarray

    @property
    def num_states(self) -> int:
        return self.table.shape[0]

    def walk(self, state: int, data: bytes) -> int:
        """Returns the resulting state, or -1 if dead."""
        for b in data:
            if state < 0:
                return -1
            state = int(self.table[state, b])
        return state

    def matches(self, data: bytes) -> bool:
        s = self.walk(0, data)
        return s >= 0 and bool(self.accept[s])

    def live_states(self) -> np.ndarray:
        """States from which an accept state is reachable (all others are
        dead ends and equivalent to -1)."""
        n = self.num_states
        reach = self.accept.copy()
        changed = True
        while changed:
            changed = False
            src_has = np.zeros(n, bool)
            for s in range(n):
                if reach[s]:
                    continue
                nxt = self.table[s]
                valid = nxt[nxt >= 0]
                if valid.size and reach[valid].any():
                    src_has[s] = True
            if src_has.any():
                reach |= src_has
                changed = True
        return reach


def _eps_closure(nfa: _NFA, states: FrozenSet[int]) -> FrozenSet[int]:
    stack = list(states)
    out = set(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in out:
                out.add(t)
                stack.append(t)
    return frozenset(out)


def compile_regex(pattern: str) -> DFA:
    """Compile a full-match regex into a dense byte DFA."""
    ast = _Parser(pattern).parse()
    nfa = _NFA()
    start, accept = nfa.build(ast)

    start_set = _eps_closure(nfa, frozenset([start]))
    dfa_ids: Dict[FrozenSet[int], int] = {start_set: 0}
    worklist = [start_set]
    rows: List[np.ndarray] = []
    accepts: List[bool] = []

    while worklist:
        cur = worklist.pop()
        sid = dfa_ids[cur]
        while len(rows) <= sid:
            rows.append(None)
            accepts.append(False)
        row = np.full(256, -1, np.int64)
        # gather outgoing byte ranges
        moves: Dict[int, Set[int]] = {}
        for s in cur:
            for lo, hi, dst in nfa.trans[s]:
                for b in range(lo, hi + 1):
                    moves.setdefault(b, set()).add(dst)
        # group identical target sets to avoid recomputing closures per byte
        closure_cache: Dict[FrozenSet[int], FrozenSet[int]] = {}
        for b, dsts in moves.items():
            key = frozenset(dsts)
            tgt = closure_cache.get(key)
            if tgt is None:
                tgt = _eps_closure(nfa, key)
                closure_cache[key] = tgt
            tid = dfa_ids.get(tgt)
            if tid is None:
                tid = len(dfa_ids)
                if tid >= MAX_DFA_STATES:
                    raise RegexParseError(
                        f"regex DFA exceeds {MAX_DFA_STATES} states"
                    )
                dfa_ids[tgt] = tid
                worklist.append(tgt)
            row[b] = tid
        rows[sid] = row
        accepts[sid] = accept in cur

    table = np.stack(rows).astype(np.int32)
    dfa = DFA(table=table, accept=np.asarray(accepts, bool))
    # Prune dead-end states: redirect transitions into them to -1.
    live = dfa.live_states()
    dead = ~live
    if dead.any():
        t = dfa.table
        dead_ids = np.nonzero(dead)[0]
        mask = np.isin(t, dead_ids)
        t[mask] = -1
    return dfa
