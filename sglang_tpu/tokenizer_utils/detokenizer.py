"""Incremental detokenization + stop-string handling.

Equivalent role to the reference's ``managers/detokenizer_manager.py``
(``DecodeStatus`` sent-offset state :65–91): decode streamed token ids into
text deltas without re-decoding the full sequence, holding back trailing
bytes that form incomplete UTF-8 sequences ("�").
"""

from __future__ import annotations

from typing import List, Optional, Tuple

REPLACEMENT_CHAR = "�"


class IncrementalDetokenizer:
    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self.ids: List[int] = []
        self.prefix_offset = 0  # start of the context window fed to decode
        self.read_offset = 0  # ids before this are already surfaced
        self.text = ""

    def update(self, all_output_ids: List[int]) -> str:
        """Feed the full output-id list; returns the new text delta."""
        self.ids = list(all_output_ids)
        prefix_text = self.tokenizer.decode(
            self.ids[self.prefix_offset : self.read_offset],
            skip_special_tokens=self.skip_special_tokens,
        )
        new_text = self.tokenizer.decode(
            self.ids[self.prefix_offset :],
            skip_special_tokens=self.skip_special_tokens,
        )
        if len(new_text) > len(prefix_text) and not new_text.endswith(
            REPLACEMENT_CHAR
        ):
            delta = new_text[len(prefix_text) :]
            self.prefix_offset = self.read_offset
            self.read_offset = len(self.ids)
            self.text += delta
            return delta
        return ""

    def flush(self) -> str:
        """Force out any held-back text (request finished)."""
        final = self.tokenizer.decode(
            self.ids[self.prefix_offset :],
            skip_special_tokens=self.skip_special_tokens,
        )
        prefix_text = self.tokenizer.decode(
            self.ids[self.prefix_offset : self.read_offset],
            skip_special_tokens=self.skip_special_tokens,
        )
        delta = final[len(prefix_text) :]
        self.prefix_offset = self.read_offset = len(self.ids)
        self.text += delta
        return delta


class StopStringChecker:
    """Find stop strings in streamed text; reports the trim point.

    The scheduler stops on token-level conditions; stop *strings* are a text
    phenomenon and are checked here (reference detokenizer path).
    """

    def __init__(self, stop_strs: List[str]):
        self.stop_strs = [s for s in stop_strs if s]
        self.max_len = max((len(s) for s in self.stop_strs), default=0)
        self.searched_upto = 0

    def check(self, text: str) -> Optional[Tuple[int, str]]:
        """Returns (trim_index, matched_stop) if a stop string appears."""
        if not self.stop_strs:
            return None
        start = max(0, self.searched_upto - self.max_len + 1)
        window = text[start:]
        best = None
        for s in self.stop_strs:
            idx = window.find(s)
            if idx != -1:
                pos = start + idx
                if best is None or pos < best[0]:
                    best = (pos, s)
        self.searched_upto = len(text)
        return best
