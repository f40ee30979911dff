"""Tool/function-call extraction from model output.

Equivalent role to the reference's ``function_call/`` (30+ model-specific
detectors behind ``function_call_parser.py``) — the common formats:

* ``qwen25``   — ``<tool_call>{"name": …, "arguments": {…}}</tool_call>``
  (Qwen 2.5/3, ChatML-family)
* ``llama3``   — ``{"name": "...", "parameters": {...}}`` as the whole
  message (Llama-3.x JSON tool calling)
* ``mistral``  — ``[TOOL_CALLS] [{"name": …, "arguments": {…}}, …]``
* ``hermes``   — alias of qwen25 (same <tool_call> wrapping)

``FunctionCallParser.parse(text)`` → (normal_text, [ToolCallItem…]).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class ToolCallItem:
    name: str
    arguments: str  # JSON-encoded string (OpenAI wire format)
    tool_index: int = 0


def _json_objects(text: str):
    """Yield (start, end, obj) for top-level JSON objects/arrays in text."""
    dec = json.JSONDecoder()
    i = 0
    while i < len(text):
        ch = text[i]
        if ch in "{[":
            try:
                obj, end = dec.raw_decode(text, i)
                yield i, end, obj
                i = end
                continue
            except ValueError:
                pass
        i += 1


def _norm_args(obj: Dict[str, Any]) -> Optional[ToolCallItem]:
    if not isinstance(obj, dict) or "name" not in obj:
        return None
    args = obj.get("arguments", obj.get("parameters", {}))
    if isinstance(args, str):
        args_str = args
    else:
        args_str = json.dumps(args, separators=(",", ":"))
    return ToolCallItem(name=str(obj["name"]), arguments=args_str)


class FunctionCallParser:
    FORMATS = ("qwen25", "hermes", "llama3", "mistral", "auto")

    def __init__(self, tools: Optional[List[dict]] = None, format: str = "auto"):
        if format not in self.FORMATS:
            raise ValueError(f"unknown tool-call format {format!r}")
        self.format = format
        self.tool_names = {
            t.get("function", t).get("name")
            for t in (tools or [])
            if isinstance(t, dict)
        }

    # ------------------------------------------------------------- parsing
    def has_tool_call(self, text: str) -> bool:
        _, calls = self.parse(text)
        return bool(calls)

    def parse(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        fmts = (
            ["qwen25", "mistral", "llama3"]
            if self.format == "auto"
            else ["qwen25" if self.format == "hermes" else self.format]
        )
        for fmt in fmts:
            normal, calls = getattr(self, f"_parse_{fmt}")(text)
            if calls:
                for i, c in enumerate(calls):
                    c.tool_index = i
                return normal, calls
        return text, []

    def _known(self, item: Optional[ToolCallItem]) -> Optional[ToolCallItem]:
        if item is None:
            return None
        if self.tool_names and item.name not in self.tool_names:
            return None
        return item

    def _parse_qwen25(self, text: str):
        calls: List[ToolCallItem] = []
        normal_parts: List[str] = []
        pos = 0
        pat = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)
        for m in pat.finditer(text):
            normal_parts.append(text[pos : m.start()])
            pos = m.end()
            try:
                item = self._known(_norm_args(json.loads(m.group(1))))
                if item:
                    calls.append(item)
            except ValueError:
                normal_parts.append(m.group(0))
        normal_parts.append(text[pos:])
        return "".join(normal_parts).strip(), calls

    def _parse_mistral(self, text: str):
        marker = "[TOOL_CALLS]"
        idx = text.find(marker)
        if idx < 0:
            return text, []
        rest = text[idx + len(marker):].strip()
        for start, end, obj in _json_objects(rest):
            if isinstance(obj, list):
                calls = [
                    it
                    for it in (self._known(_norm_args(o)) for o in obj)
                    if it
                ]
                if calls:
                    return (text[:idx] + rest[end:]).strip(), calls
        return text, []

    def _parse_llama3(self, text: str):
        stripped = text.strip()
        if stripped.startswith("<|python_tag|>"):
            stripped = stripped[len("<|python_tag|>"):]
        calls: List[ToolCallItem] = []
        consumed_to = 0
        for start, end, obj in _json_objects(stripped):
            objs = obj if isinstance(obj, list) else [obj]
            items = [
                it for it in (self._known(_norm_args(o)) for o in objs) if it
            ]
            if items and not stripped[consumed_to:start].strip():
                calls.extend(items)
                consumed_to = end
            elif calls:
                break
        if calls:
            return stripped[consumed_to:].strip(), calls
        return text, []
