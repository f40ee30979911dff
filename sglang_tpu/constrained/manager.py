"""Grammar compile cache + request-facing entry.

Equivalent role to the reference's ``constrained/grammar_manager.py``
(async compile cache keyed by the grammar source).  Compilation happens on
the engine's submission path (regex→DFA is fast for typical schemas); a
process-wide LRU avoids recompiling hot schemas.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Optional

from sglang_tpu.constrained.json_schema import build_regex_from_schema
from sglang_tpu.constrained.token_fsm import (
    GrammarState,
    TokenFSM,
    compile_regex_fsm,
)
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class GrammarManager:
    def __init__(self, tokenizer, cache_size: int = 64):
        self.tokenizer = tokenizer
        self.cache_size = cache_size
        self._cache: "OrderedDict[str, TokenFSM]" = OrderedDict()
        self._lock = threading.Lock()

    def _get_fsm(self, key: str, pattern: str) -> TokenFSM:
        with self._lock:
            fsm = self._cache.get(key)
            if fsm is not None:
                self._cache.move_to_end(key)
                return fsm
        fsm = compile_regex_fsm(pattern, self.tokenizer)
        with self._lock:
            self._cache[key] = fsm
            while len(self._cache) > self.cache_size:
                self._cache.popitem(last=False)
        return fsm

    def create_state(self, sampling_params) -> Optional[GrammarState]:
        sp = sampling_params
        if sp.regex:
            fsm = self._get_fsm("re:" + sp.regex, sp.regex)
        elif sp.json_schema:
            pattern = build_regex_from_schema(sp.json_schema)
            fsm = self._get_fsm("json:" + sp.json_schema, pattern)
        elif sp.ebnf:
            from sglang_tpu.constrained.ebnf import compile_ebnf_to_regex

            pattern = compile_ebnf_to_regex(sp.ebnf)
            fsm = self._get_fsm("ebnf:" + sp.ebnf, pattern)
        else:
            return None
        return GrammarState(fsm)


def compile_grammar(sampling_params, tokenizer) -> Optional[GrammarState]:
    """One-shot compile (no shared cache) — used by tests."""
    return GrammarManager(tokenizer).create_state(sampling_params)
