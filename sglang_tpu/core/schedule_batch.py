"""Host-side batch: request set → padded DeviceBatch tensors.

Equivalent role to the reference's ``managers/schedule_batch.py:1674``
(``ScheduleBatch`` with prepare_for_extend :2014 / prepare_for_decode :2621 /
filter_batch :2698 / merge_batch :2775) — except the device tensors are
assembled as padded-bucketed numpy arrays (XLA static shapes) instead of
ragged CSR CUDA tensors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sglang_tpu.core.req import Req
from sglang_tpu.layers.sampler import SamplingTensors
from sglang_tpu.model_executor.forward_batch import DeviceBatch, ForwardMode
from sglang_tpu.utils import cdiv, next_power_of_2


@dataclass
class HostBatch:
    """One scheduled step (extend or decode) over a set of requests."""

    reqs: List[Req]
    mode: ForwardMode
    # per-request number of new tokens this step (extend: chunk; decode: 1)
    extend_lens: List[int] = field(default_factory=list)

    @property
    def batch_size(self) -> int:
        return len(self.reqs)

    def is_empty(self) -> bool:
        return len(self.reqs) == 0

    # -------------------------------------------------------------- device
    def to_device_batch(
        self,
        page_size: int,
        bs_bucket: int,
        len_bucket: int,
        page_bucket: int,
    ) -> DeviceBatch:
        B, L, P = bs_bucket, len_bucket, page_bucket
        input_ids = np.zeros((B, L), np.int32)
        positions = np.zeros((B, L), np.int32)
        seq_lens = np.zeros((B,), np.int32)
        token_mask = np.zeros((B, L), bool)
        page_table = np.zeros((B, P), np.int32)
        out_slots = np.zeros((B, L), np.int32)
        logits_idx = np.zeros((B,), np.int32)

        for i, (req, n_new) in enumerate(zip(self.reqs, self.extend_lens)):
            start = req.cached_len
            toks = req.fill_ids[start : start + n_new]
            assert len(toks) == n_new, (len(toks), n_new, req)
            input_ids[i, :n_new] = toks
            positions[i, :n_new] = np.arange(start, start + n_new)
            seq_lens[i] = start + n_new
            token_mask[i, :n_new] = True
            n_pages = cdiv(start + n_new, page_size)
            assert n_pages <= len(req.pages), (n_pages, len(req.pages), req)
            page_table[i, :n_pages] = req.pages[:n_pages]
            # flat slot for each new token
            pos = np.arange(start, start + n_new)
            pages_arr = np.asarray(req.pages[:n_pages], np.int32)
            out_slots[i, :n_new] = (
                pages_arr[pos // page_size] * page_size + pos % page_size
            )
            logits_idx[i] = i * L + (n_new - 1)

        return DeviceBatch(
            input_ids=jnp.asarray(input_ids),
            positions=jnp.asarray(positions),
            seq_lens=jnp.asarray(seq_lens),
            token_mask=jnp.asarray(token_mask),
            page_table=jnp.asarray(page_table),
            out_slots=jnp.asarray(out_slots),
            logits_idx=jnp.asarray(logits_idx),
        )

    def make_sampling_tensors(self, bs_bucket: int) -> SamplingTensors:
        from sglang_tpu.layers.sampler import make_sampling_tensors

        return make_sampling_tensors(self.reqs, bs_bucket)

    # ------------------------------------------------------------- mutation
    def filter_finished(self) -> List[Req]:
        """Drop finished requests; returns the removed ones
        (reference filter_batch :2698)."""
        done = [r for r in self.reqs if r.finished]
        self.reqs = [r for r in self.reqs if not r.finished]
        self.extend_lens = [1] * len(self.reqs)
        return done

    def merge(self, other: "HostBatch"):
        assert self.mode == other.mode
        self.reqs.extend(other.reqs)
        self.extend_lens.extend(other.extend_lens)


def bucket_plan(
    batch: HostBatch,
    page_size: int,
    decode_bs_buckets: List[int],
    max_pages_per_req: int,
) -> Tuple[int, int, int]:
    """Pick (B, L, P) buckets for a host batch."""
    bs = batch.batch_size
    B = next(b for b in decode_bs_buckets if b >= bs)
    max_new = max(batch.extend_lens) if batch.extend_lens else 1
    L = 1 if batch.mode == ForwardMode.DECODE else next_power_of_2(max_new)
    max_pages = 1
    for req, n_new in zip(batch.reqs, batch.extend_lens):
        max_pages = max(max_pages, cdiv(req.cached_len + n_new, page_size))
    P = min(next_power_of_2(max_pages), next_power_of_2(max_pages_per_req))
    return B, L, P
