"""Device-side forward batch.

Equivalent role to the reference's ``model_executor/forward_batch_info.py``
(``ForwardMode`` :78, ``ForwardBatch`` :333) — the tensors a model forward
needs, with TPU-specific differences:

* All shapes are **bucketed static** (B tokens-per-seq L, page-table width P)
  so XLA's compile cache plays the role of CUDA-graph capture sizes.
* EXTEND and DECODE share one layout: decode is EXTEND with L == 1.  Padding
  writes land in the reserved garbage page 0 (reference: slot-0 absorb,
  ``memory_pool.py:1450``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp


class ForwardMode(enum.IntEnum):
    EXTEND = 1  # prefill / chunked-prefill (ragged new tokens)
    DECODE = 2  # one token per running request
    IDLE = 3  # no local work; participate in collectives (DP-attention sync)
    TARGET_VERIFY = 4  # speculative: verify draft tree in one target forward
    DRAFT_EXTEND = 5  # speculative: refresh draft-model KV

    def is_extend(self) -> bool:
        return self in (
            ForwardMode.EXTEND,
            ForwardMode.TARGET_VERIFY,
            ForwardMode.DRAFT_EXTEND,
        )

    def is_decode(self) -> bool:
        return self == ForwardMode.DECODE


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceBatch:
    """All arrays are padded to bucketed shapes.

    Shapes: B = request bucket, L = per-request new-token bucket (1 for
    decode), P = page-table width bucket, S = total KV slots.
    """

    input_ids: jnp.ndarray  # [B, L] int32; pad = 0
    positions: jnp.ndarray  # [B, L] int32; absolute position of each new token
    seq_lens: jnp.ndarray  # [B] int32; total context len incl. new tokens (0 = pad slot)
    token_mask: jnp.ndarray  # [B, L] bool; True for real new tokens
    page_table: jnp.ndarray  # [B, P] int32 page ids; pad = 0 (garbage page)
    out_slots: jnp.ndarray  # [B, L] int32 flat KV slot for each new token; pad = 0
    logits_idx: jnp.ndarray  # [B] int32 index into [B*L] of last real token; pad = 0

    @property
    def batch_size(self) -> int:
        return self.input_ids.shape[0]

    @property
    def tokens_per_seq(self) -> int:
        return self.input_ids.shape[1]


def make_idle_batch(B: int, L: int, P: int) -> "DeviceBatch":
    z2 = jnp.zeros((B, L), dtype=jnp.int32)
    return DeviceBatch(
        input_ids=z2,
        positions=z2,
        seq_lens=jnp.zeros((B,), dtype=jnp.int32),
        token_mask=jnp.zeros((B, L), dtype=bool),
        page_table=jnp.zeros((B, P), dtype=jnp.int32),
        out_slots=z2,
        logits_idx=jnp.zeros((B,), dtype=jnp.int32),
    )
