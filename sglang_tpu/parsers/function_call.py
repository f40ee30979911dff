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


# Per-model detector registry (reference function_call_parser.py maps 30+
# model families to their detector class; the formats below cover the
# families this zoo serves).
MODEL_FORMAT = {
    "qwen2": "qwen25",
    "qwen2_moe": "qwen25",
    "qwen3": "qwen25",
    "qwen3_moe": "qwen25",
    "llama": "llama3",
    "mistral": "mistral",
    "mixtral": "mistral",
    "gemma": "llama3",
    "gemma2": "llama3",
    "gemma3": "llama3",
    "glm4": "glm4",
    "chatglm": "glm4",
    "deepseek_v2": "deepseekv3",
    "deepseek_v3": "deepseekv3",
    "kimi_k2": "deepseekv3",
}


def detector_for_model(model_type: Optional[str],
                       default: str = "auto") -> str:
    """Resolve the tool-call format for an HF ``model_type``."""
    return MODEL_FORMAT.get((model_type or "").lower(), default)


class FunctionCallParser:
    FORMATS = ("qwen25", "hermes", "llama3", "mistral", "glm4",
               "deepseekv3", "auto")

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
            ["qwen25", "mistral", "deepseekv3", "glm4", "llama3"]
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

    def _parse_deepseekv3(self, text: str):
        """DeepSeek-V3 marker format:
        ``<|tool▁call▁begin|>function<|tool▁sep|>NAME\\n```json\\n{…}\\n```
        <|tool▁call▁end|>`` inside a ``<|tool▁calls▁begin|>…`` block."""
        pat = re.compile(
            r"<｜tool▁call▁begin｜>.*?<｜tool▁sep｜>([^\n]+)\n"
            r"```json\n(.*?)\n```.*?<｜tool▁call▁end｜>"
            r"|<\|tool▁call▁begin\|>.*?<\|tool▁sep\|>([^\n]+)\n"
            r"```json\n(.*?)\n```.*?<\|tool▁call▁end\|>",
            re.DOTALL,
        )
        calls: List[ToolCallItem] = []
        normal = []
        pos = 0
        for m in pat.finditer(text):
            normal.append(text[pos : m.start()])
            pos = m.end()
            name = (m.group(1) or m.group(3) or "").strip()
            body = m.group(2) or m.group(4) or "{}"
            try:
                item = self._known(
                    _norm_args({"name": name, "arguments": json.loads(body)})
                )
                if item:
                    calls.append(item)
            except ValueError:
                normal.append(m.group(0))
        if not calls:
            return text, []
        normal.append(text[pos:])
        out = "".join(normal)
        for marker in ("<｜tool▁calls▁begin｜>", "<｜tool▁calls▁end｜>",
                       "<|tool▁calls▁begin|>", "<|tool▁calls▁end|>"):
            out = out.replace(marker, "")
        return out.strip(), calls

    def _parse_glm4(self, text: str):
        """GLM-4 format: ``NAME\\n{json args}`` (name on its own line,
        validated against the declared tool set to avoid false hits)."""
        if not self.tool_names:
            return text, []
        lines = text.split("\n")
        for i, line in enumerate(lines):
            name = line.strip()
            if name in self.tool_names and i + 1 < len(lines):
                rest = "\n".join(lines[i + 1 :])
                for start, end, obj in _json_objects(rest):
                    if not rest[:start].strip():
                        item = self._known(
                            _norm_args({"name": name, "arguments": obj})
                        )
                        if item:
                            normal = (
                                "\n".join(lines[:i]) + "\n" + rest[end:]
                            ).strip()
                            return normal, [item]
                    break
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


class StreamingFunctionCallParser:
    """Incremental tool-call extraction for SSE streaming (reference
    ``function_call/`` detectors' ``parse_streaming_increment``).

    ``push(delta)`` returns ``(text_delta, events)`` where events are
    dicts: ``{"type": "name", "index", "name"}``,
    ``{"type": "args", "index", "delta"}`` (raw argument-JSON chars as
    they arrive — OpenAI streams partial argument strings the same way)
    and ``{"type": "end", "index"}``.  Text that might be the start of a
    tool-call marker is held back until disambiguated; ``finish()``
    flushes whatever remains (and batch-parses it for whole-message
    formats like llama3 that only resolve at EOS).
    """

    MARKER = "<tool_call>"
    CLOSER = "</tool_call>"

    def __init__(self, tools=None, format: str = "auto",
                 model_type: Optional[str] = None):
        if format == "auto":
            format = detector_for_model(model_type, default="qwen25")
        self.batch = FunctionCallParser(tools, format if format in
                                        FunctionCallParser.FORMATS else "auto")
        self.format = format
        self.buf = ""
        self.index = -1
        self.state = "text"  # text | header | args | tail
        self._depth = 0
        self._in_str = False
        self._esc = False
        self._name_sent = False
        self.calls: List[ToolCallItem] = []
        self._args_parts: List[str] = []

    # ------------------------------------------------------------- helpers
    def _held_marker_prefix(self) -> int:
        """Longest suffix of buf that is a proper prefix of MARKER."""
        m = self.MARKER
        for n in range(min(len(m) - 1, len(self.buf)), 0, -1):
            if self.buf.endswith(m[:n]):
                return n
        return 0

    # --------------------------------------------------------------- push
    def push(self, delta: str):
        if self.format in ("mistral", "llama3", "deepseekv3", "glm4"):
            # whole-message / marker formats resolve at finish(); hold
            # back everything after the first plausible marker
            self.buf += delta
            markers = {"mistral": "[TOOL_CALLS]",
                       "deepseekv3": "<",
                       "glm4": "\n",
                       "llama3": "{"}
            mk = markers[self.format]
            cut = self.buf.find(mk)
            if cut < 0:
                out, self.buf = self.buf, ""
                return out, []
            out, self.buf = self.buf[:cut], self.buf[cut:]
            return out, []

        # qwen25 / hermes: real incremental parse
        self.buf += delta
        out: List[str] = []
        events: List[dict] = []
        while True:
            if self.state == "text":
                i = self.buf.find(self.MARKER)
                if i < 0:
                    held = self._held_marker_prefix()
                    emit_to = len(self.buf) - held
                    out.append(self.buf[:emit_to])
                    self.buf = self.buf[emit_to:]
                    break
                out.append(self.buf[:i])
                self.buf = self.buf[i + len(self.MARKER):]
                self.index += 1
                self.state = "header"
                self._name_sent = False
                self._args_parts = []
            elif self.state == "header":
                m = re.search(r'"name"\s*:\s*"((?:[^"\\]|\\.)*)"', self.buf)
                if m and not self._name_sent:
                    self._cur_name = json.loads('"%s"' % m.group(1))
                    events.append({"type": "name", "index": self.index,
                                   "name": self._cur_name})
                    self._name_sent = True
                am = re.search(r'"arguments"\s*:\s*', self.buf)
                if am and self._name_sent:
                    rest = self.buf[am.end():]
                    if not rest:
                        break
                    self.buf = rest
                    self.state = "args"
                    self._depth = 0
                    self._in_str = False
                    self._esc = False
                    continue
                if self.CLOSER in self.buf:
                    # no arguments key at all: {"name": "f"}
                    self.state = "tail"
                    continue
                break
            elif self.state == "args":
                consumed = 0
                done = False
                for ch in self.buf:
                    consumed += 1
                    if self._esc:
                        self._esc = False
                    elif self._in_str:
                        if ch == "\\":
                            self._esc = True
                        elif ch == '"':
                            self._in_str = False
                    elif ch == '"':
                        self._in_str = True
                    elif ch in "{[":
                        self._depth += 1
                    elif ch in "}]":
                        self._depth -= 1
                        if self._depth == 0:
                            done = True
                            break
                    elif self._depth == 0 and not ch.isspace():
                        # non-object argument value (string/number)
                        self._depth = 0
                chunk = self.buf[:consumed]
                self.buf = self.buf[consumed:]
                self._args_parts.append(chunk)
                events.append({"type": "args", "index": self.index,
                               "delta": chunk})
                if done:
                    self.calls.append(ToolCallItem(
                        name=getattr(self, "_cur_name", ""),
                        arguments="".join(self._args_parts),
                        tool_index=self.index,
                    ))
                    events.append({"type": "end", "index": self.index})
                    self.state = "tail"
                    continue
                break
            else:  # tail: swallow up to and including the closer
                i = self.buf.find(self.CLOSER)
                if i < 0:
                    if len(self.buf) > len(self.CLOSER):
                        self.buf = self.buf[-len(self.CLOSER):]
                    break
                self.buf = self.buf[i + len(self.CLOSER):]
                self.state = "text"
                continue
        return "".join(out), events

    # -------------------------------------------------------------- finish
    def finish(self):
        """Flush at EOS: resolve whole-message formats and any dangling
        buffer; returns (text_delta, events, completed_calls)."""
        events: List[dict] = []
        text = ""
        if self.format in ("mistral", "llama3", "deepseekv3", "glm4"):
            normal, calls = self.batch.parse(self.buf)
            self.buf = ""
            for c in calls:
                c.tool_index = len(self.calls)
                events.append({"type": "name", "index": c.tool_index,
                               "name": c.name})
                events.append({"type": "args", "index": c.tool_index,
                               "delta": c.arguments})
                events.append({"type": "end", "index": c.tool_index})
                self.calls.append(c)
            text = normal if not calls else (normal or "")
            if not calls:
                text = normal
        else:
            text, self.buf = self.buf, ""
        return text, events, list(self.calls)
