"""Reasoning (think-tag) separation.

Equivalent role to the reference's ``parser/reasoning_parser.py``: split a
model's chain-of-thought block (``<think>…</think>`` for DeepSeek-R1 /
Qwen3-style models) from the visible answer, with incremental streaming
support.
"""

from __future__ import annotations

from typing import Optional, Tuple


class ReasoningParser:
    """Stateful splitter: feed text chunks, get (reasoning, content)."""

    def __init__(
        self,
        think_start: str = "<think>",
        think_end: str = "</think>",
        in_reasoning: bool = True,
    ):
        # Many reasoning models start inside the think block without
        # emitting the opening tag (DeepSeek-R1 convention).
        self.think_start = think_start
        self.think_end = think_end
        self.in_reasoning = in_reasoning
        self._buf = ""

    def parse(self, full_text: str) -> Tuple[str, str]:
        """One-shot split → (reasoning_content, content)."""
        text = full_text
        if text.startswith(self.think_start):
            text = text[len(self.think_start):]
        elif not self.in_reasoning and self.think_start not in text:
            return "", full_text
        if self.think_end in text:
            reasoning, content = text.split(self.think_end, 1)
            return reasoning.strip(), content.lstrip("\n")
        if self.in_reasoning or full_text.startswith(self.think_start):
            return text.strip(), ""
        return "", full_text

    def parse_stream_chunk(self, delta: str) -> Tuple[str, str]:
        """Incremental: returns the (reasoning_delta, content_delta) for
        this chunk; tag fragments are held back until disambiguated."""
        self._buf += delta
        out_r, out_c = "", ""
        while self._buf:
            if self.in_reasoning:
                if self._buf.startswith(self.think_start):
                    self._buf = self._buf[len(self.think_start):]
                    continue
                idx = self._buf.find(self.think_end)
                if idx >= 0:
                    out_r += self._buf[:idx]
                    self._buf = self._buf[idx + len(self.think_end):]
                    self.in_reasoning = False
                    continue
                # hold back a possible partial end-tag
                keep = self._partial_suffix(self._buf, self.think_end)
                emit = len(self._buf) - keep
                out_r += self._buf[:emit]
                self._buf = self._buf[emit:]
                break
            out_c += self._buf
            self._buf = ""
        return out_r, out_c

    @staticmethod
    def _partial_suffix(text: str, tag: str) -> int:
        for n in range(min(len(tag) - 1, len(text)), 0, -1):
            if text.endswith(tag[:n]):
                return n
        return 0


class HarmonyParser(ReasoningParser):
    """GPT-OSS harmony channel separation (reference harmony parser):
    ``<|channel|>analysis<|message|>…<|end|><|start|>assistant
    <|channel|>final<|message|>…`` — the analysis channel is reasoning,
    the final channel is the visible answer."""

    def __init__(self):
        super().__init__(in_reasoning=False)

    def parse(self, full_text: str):
        import re

        chans = re.findall(
            r"<\|channel\|>(\w+)<\|message\|>(.*?)"
            r"(?=<\|end\|>|<\|channel\|>|<\|start\|>|<\|return\|>|$)",
            full_text,
            re.DOTALL,
        )
        if not chans:
            return "", full_text
        reasoning = "\n".join(
            body for name, body in chans if name == "analysis"
        ).strip()
        final = "\n".join(
            body for name, body in chans if name == "final"
        ).strip()
        return reasoning, final


def reasoning_parser_for(name: str):
    """Named reasoning parsers (reference --reasoning-parser registry)."""
    if name in ("gpt-oss", "harmony"):
        return HarmonyParser()
    return ReasoningParser()
