"""EBNF grammar → regex compiler (for the in-repo regex→DFA engine).

Equivalent role to the reference's EBNF support in its grammar backends
(``constrained/base_grammar_backend.py`` dispatch_ebnf → xgrammar /
llguidance).  Our native engine is a byte-DFA, i.e. REGULAR languages:
non-recursive EBNF grammars compile exactly by inline expansion;
self-/mutually-recursive rules (true context-free constructs) raise a
clear error pointing at the json_schema path (which handles the common
nested-structure use case with bounded depth).

Syntax (GBNF/xgrammar-style):
    root      ::= rule definitions, one per line, ``name ::= expr``
    literals  "..."   (with \\n \\t \\\\ \\" escapes)
    classes   [a-z0-9_] (with ranges and \\ escapes; leading ^ negation)
    grouping  ( ... )
    choice    |
    repeats   e*  e+  e?  e{m}  e{m,n}
    refs      other rule names
The start rule is ``root``.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

_RULE_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_-]*)\s*::=\s*(.*)$")


class EbnfError(ValueError):
    pass


def _strip_comments(text: str) -> str:
    return re.sub(r"#[^\n]*", "", text)


def parse_rules(text: str) -> Dict[str, str]:
    """name → raw expression (continuation lines fold into the rule)."""
    rules: Dict[str, str] = {}
    current = None
    for line in _strip_comments(text).splitlines():
        if not line.strip():
            continue
        m = _RULE_RE.match(line)
        if m:
            current = m.group(1)
            rules[current] = m.group(2).strip()
        elif current is not None:
            rules[current] += " " + line.strip()
        else:
            raise EbnfError(f"EBNF line outside any rule: {line!r}")
    if "root" not in rules:
        raise EbnfError("EBNF grammar must define a 'root' rule")
    return rules


# ------------------------------------------------------------ tokenizer
_TOKEN_RE = re.compile(
    r"""
    \s+
  | "(?:[^"\\]|\\.)*"          # literal
  | \[(?:[^\]\\]|\\.)*\]       # char class
  | \{\s*\d+\s*(?:,\s*\d*\s*)?\}  # {m} {m,} {m,n}
  | [A-Za-z_][A-Za-z0-9_-]*    # rule ref
  | [()|*+?]
    """,
    re.VERBOSE,
)


def _tokens(expr: str) -> List[str]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            raise EbnfError(f"bad EBNF syntax at: {expr[pos:pos+20]!r}")
        tok = m.group(0)
        if tok.strip():
            out.append(tok.strip())
        pos = m.end()
    return out


_REGEX_SPECIALS = r"\.^$*+?{}[]|()"


def _literal_to_regex(lit: str) -> str:
    body = lit[1:-1]
    out = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}
            ch = mapped.get(nxt, nxt)
            i += 2
        else:
            i += 1
        out.append("\\" + ch if ch in _REGEX_SPECIALS else ch)
    return "".join(out)


def compile_ebnf_to_regex(text: str, max_depth: int = 64) -> str:
    """Expand the 'root' rule into one regex; recursion raises EbnfError."""
    rules = parse_rules(text)
    cache: Dict[str, str] = {}

    def expand(name: str, stack: Tuple[str, ...]) -> str:
        if name in cache:
            return cache[name]
        if name in stack:
            cycle = " -> ".join(stack + (name,))
            raise EbnfError(
                f"recursive EBNF rule ({cycle}): the native DFA engine "
                "compiles regular grammars only — use json_schema for "
                "nested structures"
            )
        if len(stack) > max_depth:
            raise EbnfError("EBNF expansion too deep")
        if name not in rules:
            raise EbnfError(f"undefined EBNF rule {name!r}")
        toks = _tokens(rules[name])
        parts: List[str] = []
        for tok in toks:
            if tok.startswith('"'):
                parts.append("(?:" + _literal_to_regex(tok) + ")")
            elif tok.startswith("["):
                parts.append(tok)
            elif tok in ("(", ")", "|", "*", "+", "?"):
                parts.append(tok if tok != "(" else "(?:")
            elif tok.startswith("{"):
                parts.append(re.sub(r"\s+", "", tok))
            else:  # rule reference
                parts.append(
                    "(?:" + expand(tok, stack + (name,)) + ")"
                )
        regex = "".join(parts)
        cache[name] = regex
        return regex

    return expand("root", ())
