"""Token-level FSM over a byte DFA — per-request grammar state + vocab masks.

Equivalent role to the reference's ``constrained/base_grammar_backend.py:42``
(``BaseGrammarObject``: accept_token / fill_vocab_mask / apply_vocab_mask)
and the mask-computation side of xgrammar/outlines.

Mask computation is vectorized: the tokenizer vocabulary is precomputed as
a padded byte matrix [V, max_len]; for a DFA state s, walking ALL tokens
simultaneously is ``max_len`` numpy gathers through the dense transition
table — a few ms for a 128k vocab — cached per visited state.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_tpu.constrained.regex_engine import DFA, compile_regex


class TokenVocab:
    """Byte matrix view of a tokenizer vocabulary (built once, shared)."""

    _cache: Dict[int, "TokenVocab"] = {}
    _lock = threading.Lock()

    def __init__(self, tokenizer):
        self.vocab_size = int(getattr(tokenizer, "vocab_size"))
        token_bytes = _extract_token_bytes(tokenizer)
        self.max_len = max((len(b) for b in token_bytes), default=1)
        V = self.vocab_size
        mat = np.zeros((V, self.max_len), np.uint8)
        lens = np.zeros((V,), np.int32)
        for t, bs in enumerate(token_bytes):
            lens[t] = len(bs)
            if bs:
                mat[t, : len(bs)] = np.frombuffer(bs, np.uint8)
        self.bytes_mat = mat
        self.lens = lens
        self.special_ids = np.asarray(
            sorted(set(getattr(tokenizer, "all_special_ids", []) or [])),
            np.int64,
        )
        eos = getattr(tokenizer, "eos_token_id", None)
        self.eos_token_id = eos

    @classmethod
    def get(cls, tokenizer) -> "TokenVocab":
        key = id(tokenizer)
        with cls._lock:
            tv = cls._cache.get(key)
            if tv is None:
                tv = TokenVocab(tokenizer)
                cls._cache[key] = tv
            return tv


def _extract_token_bytes(tokenizer) -> List[bytes]:
    """Per-token byte content.  Handles byte-level BPE ('Ġ' mapping), our
    ByteTokenizer, and falls back to per-token decode."""
    V = int(tokenizer.vocab_size)
    # In-repo byte tokenizer: id == byte value.
    if type(tokenizer).__name__ == "ByteTokenizer":
        return [bytes([i]) if i < 256 else b"" for i in range(V)]

    out: List[bytes] = [b""] * V
    ids = list(range(V))
    toks = tokenizer.convert_ids_to_tokens(ids)
    byte_decoder = _gpt2_byte_decoder()
    specials = set(getattr(tokenizer, "all_special_ids", []) or [])
    sample = [t for t in toks[:256] if t]
    bytelevel = sample and all(
        all(ch in byte_decoder for ch in t) for t in sample[:16]
    )
    for i, t in enumerate(toks):
        if t is None or i in specials:
            out[i] = b""
        elif bytelevel and all(ch in byte_decoder for ch in t):
            out[i] = bytes(byte_decoder[ch] for ch in t)
        elif t.startswith("▁"):  # sentencepiece underline
            out[i] = t.replace("▁", " ").encode("utf-8")
        else:
            out[i] = t.encode("utf-8")
    return out


def _gpt2_byte_decoder() -> Dict[str, int]:
    """GPT-2 byte↔unicode table (public algorithm)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


class TokenFSM:
    """Compiled grammar shared across requests; per-request state is the
    DFA state integer held by :class:`GrammarState`."""

    def __init__(self, dfa: DFA, vocab: TokenVocab):
        self.dfa = dfa
        self.vocab = vocab
        self._mask_cache: Dict[int, np.ndarray] = {}
        self._next_cache: Dict[int, np.ndarray] = {}
        self._jump_cache: Dict[int, Optional[Tuple[List[int], int]]] = {}
        self._lock = threading.Lock()

    def _compute_state(self, state: int) -> Tuple[np.ndarray, np.ndarray]:
        """(allowed_mask [V] bool, next_state [V] int32) from ``state``."""
        v = self.vocab
        V = v.vocab_size
        table = self.dfa.table
        cur = np.full((V,), state, np.int32)
        alive = v.lens > 0
        for pos in range(v.max_len):
            active = alive & (pos < v.lens) & (cur >= 0)
            if not active.any():
                break
            b = v.bytes_mat[active, pos]
            nxt = table[cur[active], b]
            cur[active] = nxt
            dead = active & (cur < 0)
            alive &= ~dead
        allowed = alive & (cur >= 0)
        # EOS is allowed exactly in accept states.
        if v.eos_token_id is not None and self.dfa.accept[state]:
            allowed[v.eos_token_id] = True
            cur[v.eos_token_id] = state
        return allowed, np.where(allowed, cur, -1).astype(np.int32)

    def mask_for(self, state: int) -> np.ndarray:
        with self._lock:
            m = self._mask_cache.get(state)
            if m is None:
                m, nxt = self._compute_state(state)
                self._mask_cache[state] = m
                self._next_cache[state] = nxt
            return m

    def next_state(self, state: int, token: int) -> int:
        self.mask_for(state)
        return int(self._next_cache[state][token])

    # ---------------------------------------------------- jump-forward
    def deterministic_bytes(self, state: int, max_len: int = 4096) -> bytes:
        """The forced byte chain from ``state``: follow transitions while
        exactly ONE byte is alive and the state is not accepting (an
        accept state can also emit EOS, so the continuation is no longer
        deterministic there).  Reference: compressed-FSM jump-forward,
        ``constrained/base_grammar_backend.py:91`` /
        ``outlines_jump_forward.py``."""
        table = self.dfa.table
        out = bytearray()
        s = state
        while len(out) < max_len and not self.dfa.accept[s]:
            alive = np.nonzero(table[s] >= 0)[0]
            if alive.shape[0] != 1:
                break
            b = int(alive[0])
            out.append(b)
            s = int(table[s, b])
        return bytes(out)

    def jump_tokens(
        self, state: int, min_bytes: int = 4, max_tokens: int = 512
    ) -> Optional[Tuple[List[int], int]]:
        """(forced token ids, DFA state after them) for the deterministic
        span from ``state``; None when the span is shorter than
        ``min_bytes`` or no token tiles it.

        Tokenization is greedy longest-prefix match over the vocabulary's
        OWN byte strings (not ``tokenizer.encode`` — normalization could
        produce tokens whose bytes differ from the forced span).  The last
        partial piece (no token fits without overrunning the span) is left
        for normal constrained decoding.  Results are cached per state —
        schema scaffolding states recur across requests.
        """
        with self._lock:
            if state in self._jump_cache:
                return self._jump_cache[state]
        chain = self.deterministic_bytes(state)
        result = None
        if len(chain) >= min_bytes:
            v = self.vocab
            toks: List[int] = []
            pos = 0
            while pos < len(chain) and len(toks) < max_tokens:
                remaining = len(chain) - pos
                window = np.zeros((v.max_len,), np.uint8)
                w = min(v.max_len, remaining)
                window[:w] = np.frombuffer(chain[pos : pos + w], np.uint8)
                eq = v.bytes_mat == window[None, :]
                ok_upto = np.logical_and.accumulate(eq, axis=1)
                lens = v.lens
                fit = (lens > 0) & (lens <= remaining)
                idx = np.clip(lens - 1, 0, v.max_len - 1)
                matches = fit & ok_upto[np.arange(v.vocab_size), idx]
                if v.special_ids.size:
                    matches[v.special_ids] = False
                if not matches.any():
                    break
                cand = np.nonzero(matches)[0]
                best = int(cand[np.argmax(lens[cand])])
                toks.append(best)
                pos += int(lens[best])
            if toks and pos >= min_bytes:
                # walk the consumed bytes to the post-jump DFA state
                s = state
                for b in chain[:pos]:
                    s = int(self.dfa.table[s, b])
                    assert s >= 0
                result = (toks, s)
        with self._lock:
            self._jump_cache[state] = result
        return result


class GrammarState:
    """Per-request grammar cursor (reference BaseGrammarObject)."""

    def __init__(self, fsm: TokenFSM):
        self.fsm = fsm
        self.state = 0
        self.finished = False

    def fill_vocab_mask(self) -> np.ndarray:
        """[V] bool allowed mask for the next token."""
        return self.fsm.mask_for(self.state)

    def accept_token(self, token: int) -> bool:
        if self.finished:
            return False
        if (
            self.fsm.vocab.eos_token_id is not None
            and token == self.fsm.vocab.eos_token_id
        ):
            self.finished = True
            return bool(self.fsm.dfa.accept[self.state])
        nxt = self.fsm.next_state(self.state, token)
        if nxt < 0:
            self.finished = True
            return False
        self.state = nxt
        # Terminal: accept state with no way forward except EOS.
        if bool(self.fsm.dfa.accept[nxt]) and not (
            self.fsm.dfa.table[nxt] >= 0
        ).any():
            self.finished = True
        return True

    @property
    def is_terminated(self) -> bool:
        return self.finished

    def jump_forward(self, min_bytes: int = 4) -> Optional[List[int]]:
        """If the grammar forces a deterministic span from the current
        state, return its token ids and advance the cursor past them;
        None otherwise.  The caller commits the tokens as forced output
        (logprob 0) and extends KV over them in one prefill pass."""
        if self.finished:
            return None
        jt = self.fsm.jump_tokens(self.state, min_bytes=min_bytes)
        if jt is None:
            return None
        toks, end_state = jt
        self.state = end_state
        return list(toks)


def compile_regex_fsm(pattern: str, tokenizer) -> TokenFSM:
    dfa = compile_regex(pattern)
    return TokenFSM(dfa, TokenVocab.get(tokenizer))


def pack_vocab_masks(masks: List[Optional[np.ndarray]], B: int, V: int) -> np.ndarray:
    """[B, ceil(V/32)] uint32 bitmask, LSB-first within each word (token t
    lives at word t//32, bit t%32).  Rows with mask=None allow everything."""
    W = (V + 31) // 32
    out = np.full((B, W), 0xFFFFFFFF, np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    for i, m in enumerate(masks):
        if m is None:
            continue
        padded = np.zeros(W * 32, bool)
        padded[:V] = m
        bits = padded.reshape(W, 32).astype(np.uint32)
        out[i] = (bits << shifts).sum(axis=1, dtype=np.uint32)
    return out


# ---------------------------------------------------------------------------
# Device-side FSM (K>1 grammar decode)
# ---------------------------------------------------------------------------

DEVICE_FSM_BUDGET = 64 << 20  # bytes of next-state table we allow on device


class DeviceFSM:
    """Dense token-level FSM tables resident on device.

    For small automata the full (mask, next-state) tables fit on the
    chip, so the fused K-step decode loop can advance the grammar and
    apply the vocab mask PER STEP on device — structured output keeps
    the K>1 fused window instead of dropping to one dispatch per token
    (the reference instead overlaps CPU mask-fill with the forward,
    scheduler.py:1665; on TPU the dispatch round-trip makes that a loss).
    """

    def __init__(self, mask_bits: np.ndarray, next_state: np.ndarray):
        self.mask_bits = mask_bits  # [S, W] uint32
        self.next_state = next_state  # [S, V] int32
        self._dev = None

    @property
    def num_states(self) -> int:
        return self.next_state.shape[0]

    def device_arrays(self):
        """(mask_bits, next_state) as device arrays (uploaded once)."""
        if self._dev is None:
            import jax.numpy as jnp

            self._dev = (
                jnp.asarray(self.mask_bits),
                jnp.asarray(self.next_state),
            )
        return self._dev


def build_device_fsm(fsm: TokenFSM, budget_bytes: int = DEVICE_FSM_BUDGET):
    """Precompute full tables for every DFA state; None if over budget."""
    S = fsm.dfa.table.shape[0]
    V = fsm.vocab.vocab_size
    if S * V * 4 > budget_bytes:
        return None
    cached = getattr(fsm, "_device_fsm", None)
    if cached is not None:
        return cached
    W = (V + 31) // 32
    mask_bits = np.zeros((S, W), np.uint32)
    next_state = np.full((S, V), -1, np.int32)
    shifts = np.arange(32, dtype=np.uint32)
    for s in range(S):
        m = fsm.mask_for(s)
        nxt = fsm._next_cache[s]
        padded = np.zeros(W * 32, bool)
        padded[:V] = m
        bits = padded.reshape(W, 32).astype(np.uint32)
        mask_bits[s] = (bits << shifts).sum(axis=1, dtype=np.uint32)
        next_state[s] = nxt
    dev = DeviceFSM(mask_bits, next_state)
    fsm._device_fsm = dev
    return dev
