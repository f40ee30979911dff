"""JSON schema → full-match regex.

Equivalent role to outlines' ``build_regex_from_schema`` (the reference
outsources this to xgrammar/outlines; ``srt/constrained/``) — supports the
common schema subset: object properties (+required), string (enum,
pattern, min/maxLength unbounded), integer, number, boolean, null, arrays
(items, min/maxItems small), enum/const of scalars, anyOf/oneOf, local
$defs/$ref (non-recursive).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional

WS = r"[ \n\t]{0,4}"  # bounded whitespace (flexible mode) keeps the DFA small

STRING_INNER = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
STRING = f'"{STRING_INNER}*"'
INTEGER = r"-?(?:0|[1-9][0-9]*)"
NUMBER = r"-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
BOOLEAN = r"(?:true|false)"
NULL = r"null"


class JsonSchemaError(ValueError):
    pass


def _regex_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.^$*+?{}[]()|/":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _literal_json(value: Any) -> str:
    return _regex_escape(json.dumps(value, separators=(",", ":"), ensure_ascii=True))


class _Compiler:
    def __init__(
        self,
        root: Dict[str, Any],
        max_depth: int = 16,
        any_whitespace: bool = False,
    ):
        self.root = root
        self.max_depth = max_depth
        # Strict (default) emits the canonical json.dumps form — ``": "``
        # and ``", "`` separators, no padding — so grammar scaffolding
        # becomes a deterministic byte chain and jump-forward decoding can
        # commit whole spans (reference xgrammar any_whitespace=False +
        # outlines_jump_forward).  ``any_whitespace=True`` restores the
        # bounded flexible form.
        if any_whitespace:
            self.colon = f"{WS}:{WS}"
            self.comma = f"{WS},{WS}"
            self.pad = WS
        else:
            self.colon = ": "
            self.comma = ", "
            self.pad = ""

    def compile(self) -> str:
        return self._node(self.root, 0)

    def _resolve_ref(self, ref: str) -> Dict[str, Any]:
        if not ref.startswith("#/"):
            raise JsonSchemaError(f"only local $refs supported, got {ref!r}")
        node: Any = self.root
        for part in ref[2:].split("/"):
            part = part.replace("~1", "/").replace("~0", "~")
            if part not in node:
                raise JsonSchemaError(f"cannot resolve {ref!r}")
            node = node[part]
        return node

    def _node(self, schema: Any, depth: int) -> str:
        if depth > self.max_depth:
            raise JsonSchemaError("schema nesting too deep (recursive $ref?)")
        if schema in (True, {}):
            # any JSON value (bounded: scalars or flat composites)
            return f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
        if not isinstance(schema, dict):
            raise JsonSchemaError(f"unsupported schema node {schema!r}")
        if "$ref" in schema:
            return self._node(self._resolve_ref(schema["$ref"]), depth + 1)
        if "const" in schema:
            return _literal_json(schema["const"])
        if "enum" in schema:
            opts = "|".join(_literal_json(v) for v in schema["enum"])
            return f"(?:{opts})"
        for key in ("anyOf", "oneOf"):
            if key in schema:
                opts = "|".join(
                    self._node(s, depth + 1) for s in schema[key]
                )
                return f"(?:{opts})"
        if "allOf" in schema and len(schema["allOf"]) == 1:
            return self._node(schema["allOf"][0], depth + 1)

        t = schema.get("type")
        if isinstance(t, list):
            opts = "|".join(
                self._node({**schema, "type": ti}, depth + 1) for ti in t
            )
            return f"(?:{opts})"
        if t == "string":
            if "pattern" in schema:
                return f'"{schema["pattern"]}"'
            if "maxLength" in schema or "minLength" in schema:
                lo = int(schema.get("minLength", 0))
                hi = schema.get("maxLength")
                bound = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
                return f'"{STRING_INNER}{bound}"'
            return STRING
        if t == "integer":
            return INTEGER
        if t == "number":
            return NUMBER
        if t == "boolean":
            return BOOLEAN
        if t == "null":
            return NULL
        if t == "array":
            items = schema.get("items", True)
            item_re = self._node(items, depth + 1)
            min_items = int(schema.get("minItems", 0))
            max_items = schema.get("maxItems")
            if min_items == 0:
                body = f"(?:{item_re}(?:{self.comma}{item_re})*)?"
                if max_items is not None:
                    body = (
                        f"(?:{item_re}(?:{self.comma}{item_re})"
                        f"{{0,{int(max_items) - 1}}})?"
                    )
            else:
                rep_lo = min_items - 1
                rep = (
                    f"{{{rep_lo},{int(max_items) - 1}}}"
                    if max_items is not None
                    else f"{{{rep_lo},}}"
                )
                body = f"{item_re}(?:{self.comma}{item_re}){rep}"
            return f"\\[{self.pad}{body}{self.pad}\\]"
        if t == "object" or "properties" in schema:
            props: Dict[str, Any] = schema.get("properties", {})
            required = set(
                schema.get("required", list(props.keys()))
            )
            if not props:
                return f"\\{{{self.pad}\\}}"
            parts: List[str] = []
            emitted_required = 0
            n_required = len([p for p in props if p in required])
            for idx, (name, sub) in enumerate(props.items()):
                key_re = _literal_json(name)
                val_re = self._node(sub, depth + 1)
                pair = f"{key_re}{self.colon}{val_re}"
                if name in required:
                    sep = self.comma if emitted_required > 0 else ""
                    parts.append(f"{sep}{pair}")
                    emitted_required += 1
                else:
                    # Optional properties are supported only after all
                    # required ones (fixed order keeps this regular).
                    sep = self.comma if (n_required > 0 or idx > 0) else ""
                    parts.append(f"(?:{sep}{pair})?")
            body = "".join(parts)
            return f"\\{{{self.pad}{body}{self.pad}\\}}"
        raise JsonSchemaError(f"unsupported schema: {schema!r}")


def build_regex_from_schema(schema: Any, any_whitespace: bool = False) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    if schema is True or schema == {} or schema == {"type": "object"}:
        # bare json_object mode: any flat object of scalar values (value
        # whitespace stays flexible here — free-form objects have no
        # scaffolding worth jump-forwarding)
        scalar = f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
        pair = f"{STRING}{WS}:{WS}{scalar}"
        return rf"\{{{WS}(?:{pair}(?:{WS},{WS}{pair})*)?{WS}\}}"
    return _Compiler(schema, any_whitespace=any_whitespace).compile()
