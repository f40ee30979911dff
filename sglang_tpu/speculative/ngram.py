"""N-gram speculative drafting.

Equivalent role to the reference's ``speculative/ngram_worker.py`` +
``speculative/cpp_ngram/`` (suffix-corpus draft source): draft tokens come
from the request's OWN history (prompt + generated) via an (n-1)-gram →
next-token table — no draft model, no extra forward.  Verification is one
target extend over [last_token, draft...] with greedy acceptance
(``ModelRunner.verify_step``); exact for greedy requests, which is the
only mode the scheduler enables it for.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


class NgramPredictor:
    """Per-request incremental n-gram table over prompt+output tokens."""

    def __init__(self, n: int = 3):
        assert n >= 2
        self.n = n
        self.table: Dict[Tuple[int, ...], int] = {}
        self._seen = 0  # tokens already ingested

    def update(self, tokens: List[int]):
        """Ingest the full token history (prompt + outputs so far)."""
        n = self.n
        start = max(self._seen - (n - 1), 0)
        for i in range(start, len(tokens) - n + 1):
            key = tuple(tokens[i : i + n - 1])
            self.table[key] = tokens[i + n - 1]  # most recent wins
        self._seen = len(tokens)

    def draft(self, tokens: List[int], k: int) -> List[int]:
        """Chain up to k draft tokens continuing ``tokens``."""
        n = self.n
        if len(tokens) < n - 1:
            return []
        ctx = list(tokens[-(n - 1):])
        out: List[int] = []
        for _ in range(k):
            nxt = self.table.get(tuple(ctx))
            if nxt is None:
                break
            out.append(nxt)
            ctx = (ctx + [nxt])[-(n - 1):]
        return out
