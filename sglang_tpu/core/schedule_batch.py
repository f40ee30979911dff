"""Host-side batch: request set → packed device buffers.

Equivalent role to the reference's ``managers/schedule_batch.py:1674``
(``ScheduleBatch`` with prepare_for_extend :2014 / prepare_for_decode :2621 /
filter_batch :2698) — producing single packed int32/f32 buffers per step
(one host→device transfer each) at bucketed static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from sglang_tpu.core.req import Req
from sglang_tpu.layers.sampler import (
    needs_penalties,
    pack_penalty_table,
    pack_sampling_params,
)
from sglang_tpu.model_executor.forward_batch import (
    ForwardMode,
    pack_decode_batch,
    pack_extend_batch,
)
from sglang_tpu.utils import cdiv, next_power_of_2


@dataclass
class HostBatch:
    """One scheduled step (extend chunk or decode window) over requests."""

    reqs: List[Req]
    mode: ForwardMode
    # per-request number of new tokens this step (extend only)
    extend_lens: List[int] = field(default_factory=list)

    @property
    def batch_size(self) -> int:
        return len(self.reqs)

    def is_empty(self) -> bool:
        return len(self.reqs) == 0

    # -------------------------------------------------------------- extend
    def pack_extend(
        self, page_size: int, B: int, L: int, P: int, cp: int = 1,
        mrope: bool = False, swa: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        input_ids = np.zeros((B, L), np.int32)
        # cp > 1: padded positions get a huge sentinel so the zigzag
        # causal mask naturally excludes them (layers/cp) — it must
        # exceed ANY real position, which with a cached prefix can be
        # far beyond the L bucket
        positions = np.full((B, L), (1 << 30) if cp > 1 else 0, np.int32)
        out_slots = np.zeros((B, L), np.int32)
        seq_lens = np.zeros((B,), np.int32)
        logits_idx = np.zeros((B,), np.int32)
        page_table = np.zeros((B, P), np.int32)

        for i, (req, n_new) in enumerate(zip(self.reqs, self.extend_lens)):
            start = req.cached_len
            toks = req.fill_ids[start : start + n_new]
            assert len(toks) == n_new, (len(toks), n_new, req)
            input_ids[i, :n_new] = toks
            pos = np.arange(start, start + n_new)
            positions[i, :n_new] = pos
            seq_lens[i] = start + n_new
            n_pages = cdiv(start + n_new, page_size)
            assert n_pages <= len(req.pages), (n_pages, len(req.pages), req)
            page_table[i, :n_pages] = req.pages[:n_pages]
            pages_arr = np.asarray(req.pages[:n_pages], np.int32)
            out_slots[i, :n_new] = (
                pages_arr[pos // page_size] * page_size + pos % page_size
            )
            logits_idx[i] = i * L + (n_new - 1)

        if cp > 1:
            # zigzag column order: tokens feed the model sequence-sharded
            # over the cp mesh axis; everything downstream of attention is
            # token-order-independent, and positions/out_slots travel with
            # their tokens (reference cp/zigzag.py:15)
            from sglang_tpu.layers.context_parallel import zigzag_split

            perm = zigzag_split(L, cp)
            inv = np.empty_like(perm)
            inv[perm] = np.arange(L)
            input_ids = input_ids[:, perm]
            positions = positions[:, perm]
            out_slots = out_slots[:, perm]
            for i, n_new in enumerate(self.extend_lens):
                logits_idx[i] = i * L + inv[n_new - 1]

        mrope_pos = None
        if mrope:
            # M-RoPE (Qwen2-VL): per-token 3-axis rotary positions.  A
            # request's prompt planes come from the processor; tokens
            # past them (generated outputs on retract-replay) advance
            # all axes by the request's delta.
            mrope_pos = np.zeros((3, B, L), np.int32)
            for i, (req, n_new) in enumerate(
                zip(self.reqs, self.extend_lens)
            ):
                start = req.cached_len
                mp = req.mrope_positions  # [3, n_prompt] or None
                delta = int(getattr(req, "mrope_delta", 0) or 0)
                for j in range(n_new):
                    t = start + j
                    if mp is not None and t < mp.shape[1]:
                        mrope_pos[:, i, j] = mp[:, t]
                    else:
                        mrope_pos[:, i, j] = t + delta
            if cp > 1:
                mrope_pos = mrope_pos[:, :, perm]
        swa_out_slots = swa_page_table = None
        if swa:
            # hybrid-SWA: sliding layers' parallel table — freed
            # (behind-window) entries map to garbage page 0; the window
            # mask keeps them unread
            assert cp <= 1, "hybrid-SWA excludes CP prefill"
            swa_out_slots = np.zeros((B, L), np.int32)
            swa_page_table = np.zeros((B, P), np.int32)
            for i, (req, n_new) in enumerate(
                zip(self.reqs, self.extend_lens)
            ):
                start = req.cached_len
                n_pages = cdiv(start + n_new, page_size)
                sp = np.asarray(req.swa_pages[:n_pages], np.int32)
                sp = sp.copy()
                sp[: req.swa_freed] = 0
                swa_page_table[i, :n_pages] = sp
                pos = np.arange(start, start + n_new)
                swa_out_slots[i, :n_new] = (
                    sp[pos // page_size] * page_size + pos % page_size
                )
        packed = pack_extend_batch(
            input_ids, positions, out_slots, seq_lens, logits_idx,
            page_table, mrope_positions=mrope_pos,
            swa_out_slots=swa_out_slots, swa_page_table=swa_page_table,
        )
        return packed, pack_sampling_params(self.reqs, B), self._pen_table(B)

    def has_input_embeds(self) -> bool:
        return any(r.input_embeds is not None for r in self.reqs)

    def pack_embeds(self, B: int, L: int, hidden_size: int) -> np.ndarray:
        """[B, L, H] f32 rows for sentinel (negative-id) prompt positions
        of this chunk; zero elsewhere (multimodal embedding splice)."""
        buf = np.zeros((B, L, hidden_size), np.float32)
        for i, (req, n_new) in enumerate(zip(self.reqs, self.extend_lens)):
            if req.input_embeds is None:
                continue
            start = req.cached_len
            toks = req.fill_ids[start : start + n_new]
            for j, t in enumerate(toks):
                if t < 0:
                    buf[i, j] = req.input_embeds[-t - 1]
        return buf

    # -------------------------------------------------------------- decode
    def pack_decode(
        self, page_size: int, B: int, P: int, K: int, mrope: bool = False,
        swa: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Decode window: each request's page list must already cover
        cached_len + K tokens."""
        first_tokens = np.zeros((B,), np.int32)
        seq_lens = np.zeros((B,), np.int32)
        page_table = np.zeros((B, P), np.int32)
        swa_page_table = np.zeros((B, P), np.int32) if swa else None
        mrope_delta = np.zeros((B,), np.int32) if mrope else None
        for i, req in enumerate(self.reqs):
            first_tokens[i] = req.fill_ids[-1]
            seq_lens[i] = req.cached_len
            n_pages = cdiv(req.cached_len + K, page_size)
            assert n_pages <= len(req.pages), (n_pages, len(req.pages), req)
            page_table[i, :n_pages] = req.pages[:n_pages]
            if swa:
                sp = np.asarray(req.swa_pages[:n_pages], np.int32).copy()
                sp[: req.swa_freed] = 0
                swa_page_table[i, :n_pages] = sp
            if mrope:
                mrope_delta[i] = int(getattr(req, "mrope_delta", 0) or 0)
        packed = pack_decode_batch(
            first_tokens, seq_lens, page_table, mrope_delta=mrope_delta,
            swa_page_table=swa_page_table,
        )
        return packed, pack_sampling_params(self.reqs, B), self._pen_table(B)

    def _pen_table(self, B: int):
        if not needs_penalties(self.reqs):
            return None
        return pack_penalty_table(self.reqs, B)

    # ------------------------------------------------------------- mutation
    def filter_finished(self) -> List[Req]:
        done = [r for r in self.reqs if r.finished]
        self.reqs = [r for r in self.reqs if not r.finished]
        return done

    def merge(self, other: "HostBatch"):
        assert self.mode == other.mode
        self.reqs.extend(other.reqs)
        self.extend_lens.extend(other.extend_lens)


def extend_buckets(
    batch: HostBatch,
    page_size: int,
    bs_buckets: List[int],
    max_pages_per_req: int,
) -> Tuple[int, int, int]:
    """(B, L, P) buckets for an extend batch."""
    bs = batch.batch_size
    B = next(b for b in bs_buckets if b >= bs)
    max_new = max(batch.extend_lens)
    L = next_power_of_2(max_new)
    max_pages = 1
    for req, n_new in zip(batch.reqs, batch.extend_lens):
        max_pages = max(max_pages, cdiv(req.cached_len + n_new, page_size))
    P = min(next_power_of_2(max_pages), next_power_of_2(max_pages_per_req))
    return B, L, P


def decode_buckets(
    batch: HostBatch,
    page_size: int,
    bs_buckets: List[int],
    max_pages_per_req: int,
    K: int,
) -> Tuple[int, int]:
    """(B, P) buckets for a K-step decode window."""
    bs = batch.batch_size
    B = next(b for b in bs_buckets if b >= bs)
    max_pages = 1
    for req in batch.reqs:
        max_pages = max(max_pages, cdiv(req.cached_len + K, page_size))
    P = min(next_power_of_2(max_pages), next_power_of_2(max_pages_per_req))
    return B, P
