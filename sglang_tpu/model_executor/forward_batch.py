"""Device-side forward batch.

Equivalent role to the reference's ``model_executor/forward_batch_info.py``
(``ForwardMode`` :78, ``ForwardBatch`` :333) — the tensors a model forward
needs, with TPU-specific differences:

* All shapes are **bucketed static** (B requests, L tokens-per-seq, P
  page-table width) so XLA's compile cache plays the role of CUDA-graph
  capture sizes.  Padding writes land in the reserved garbage page 0
  (reference: slot-0 absorb, ``memory_pool.py:1450``).
* The host packs every int32 field into ONE flat buffer per step
  (:func:`pack_batch` / :func:`unpack_batch`) — a single host→device
  transfer; over a remote-tunnel device link, per-array transfer latency
  would otherwise dominate the step.
* Decode runs as a K-step fused loop inside one jit (tokens chain
  device-side); only EXTEND materializes per-token fields on host.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


class ForwardMode(enum.IntEnum):
    EXTEND = 1  # prefill / chunked-prefill
    DECODE = 2  # K-step fused decode
    IDLE = 3  # no local work; participate in collectives (DP sync)
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
    """Unpacked on-device view (built inside jit from the packed buffer)."""

    input_ids: jnp.ndarray  # [B, L] int32; pad = 0
    positions: jnp.ndarray  # [B, L] int32 absolute positions of new tokens
    seq_lens: jnp.ndarray  # [B] int32 total context len incl. new (0 = pad)
    page_table: jnp.ndarray  # [B, P] int32 page ids; pad = 0 (garbage page)
    out_slots: jnp.ndarray  # [B, L] int32 flat KV slot per new token
    logits_idx: jnp.ndarray  # [B] int32 index into [B*L] of last real token
    # M-RoPE (Qwen2-VL): 3-axis rotary positions for prefill chunks with
    # images, and the per-request scalar offset for decode (all three
    # axes advance together after the last image).  None elsewhere.
    mrope_positions: jnp.ndarray = None  # [3, B, L] int32 or None
    mrope_delta: jnp.ndarray = None  # [B] int32 or None
    # Hybrid-SWA models (Gemma-2/3 class, reference
    # mem_cache/allocator/swa.py:20): sliding-window layers page into
    # their own small pool with an independent page-id space; freed
    # behind-window entries are zeroed (masked, never read).  None on
    # non-hybrid engines.
    swa_page_table: jnp.ndarray = None  # [B, P] int32 or None
    swa_out_slots: jnp.ndarray = None  # [B, L] int32 or None

    @property
    def batch_size(self) -> int:
        return self.input_ids.shape[0]

    @property
    def tokens_per_seq(self) -> int:
        return self.input_ids.shape[1]


# Packed extend layout (all int32):
#   [B*L input_ids | B*L positions | B*L out_slots | B seq_lens |
#    B logits_idx | B*P page_table | (B*L swa_out_slots + B*P
#    swa_page_table when hybrid-SWA) | (3*B*L mrope planes)]
def extend_packed_size(
    B: int, L: int, P: int, mrope: bool = False, swa: bool = False
) -> int:
    return (
        3 * B * L + 2 * B + B * P
        + ((B * L + B * P) if swa else 0)
        + (3 * B * L if mrope else 0)
    )


def pack_extend_batch(
    input_ids: np.ndarray,  # [B, L]
    positions: np.ndarray,  # [B, L]
    out_slots: np.ndarray,  # [B, L]
    seq_lens: np.ndarray,  # [B]
    logits_idx: np.ndarray,  # [B]
    page_table: np.ndarray,  # [B, P]
    mrope_positions: np.ndarray = None,  # [3, B, L] (M-RoPE models)
    swa_out_slots: np.ndarray = None,  # [B, L] (hybrid-SWA models)
    swa_page_table: np.ndarray = None,  # [B, P]
) -> np.ndarray:
    parts = [
        input_ids.ravel(),
        positions.ravel(),
        out_slots.ravel(),
        seq_lens,
        logits_idx,
        page_table.ravel(),
    ]
    if swa_page_table is not None:
        parts.append(np.asarray(swa_out_slots).ravel())
        parts.append(np.asarray(swa_page_table).ravel())
    if mrope_positions is not None:
        parts.append(np.asarray(mrope_positions).ravel())
    return np.concatenate(parts).astype(np.int32)


def unpack_extend_batch(
    packed: jnp.ndarray, B: int, L: int, P: int, mrope: bool = False,
    swa: bool = False,
) -> DeviceBatch:
    o = 0
    input_ids = packed[o : o + B * L].reshape(B, L); o += B * L
    positions = packed[o : o + B * L].reshape(B, L); o += B * L
    out_slots = packed[o : o + B * L].reshape(B, L); o += B * L
    seq_lens = packed[o : o + B]; o += B
    logits_idx = packed[o : o + B]; o += B
    page_table = packed[o : o + B * P].reshape(B, P); o += B * P
    swa_out_slots = swa_page_table = None
    if swa:
        swa_out_slots = packed[o : o + B * L].reshape(B, L); o += B * L
        swa_page_table = packed[o : o + B * P].reshape(B, P); o += B * P
    mrope_positions = None
    if mrope:
        mrope_positions = packed[o : o + 3 * B * L].reshape(3, B, L)
        o += 3 * B * L
    return DeviceBatch(
        input_ids=input_ids,
        positions=positions,
        seq_lens=seq_lens,
        page_table=page_table,
        out_slots=out_slots,
        logits_idx=logits_idx,
        mrope_positions=mrope_positions,
        swa_page_table=swa_page_table,
        swa_out_slots=swa_out_slots,
    )


# Packed decode layout (all int32):
#   [B first_tokens | B seq_lens | B*P page_table |
#    (B*P swa_page_table when hybrid-SWA) | (B mrope deltas)]
# positions/out_slots/logits_idx are derived on device each fused step.
def decode_packed_size(
    B: int, P: int, mrope: bool = False, swa: bool = False
) -> int:
    return 2 * B + B * P + (B * P if swa else 0) + (B if mrope else 0)


def pack_decode_batch(
    first_tokens: np.ndarray,  # [B] input token for the first fused step
    seq_lens: np.ndarray,  # [B] context length BEFORE the first new token
    page_table: np.ndarray,  # [B, P] covering seq_lens + K new tokens
    mrope_delta: np.ndarray = None,  # [B] (M-RoPE models)
    swa_page_table: np.ndarray = None,  # [B, P] (hybrid-SWA models)
) -> np.ndarray:
    parts = [first_tokens, seq_lens, page_table.ravel()]
    if swa_page_table is not None:
        parts.append(np.asarray(swa_page_table).ravel())
    if mrope_delta is not None:
        parts.append(np.asarray(mrope_delta))
    return np.concatenate(parts).astype(np.int32)


def unpack_decode_batch(
    packed: jnp.ndarray, B: int, P: int, mrope: bool = False,
    swa: bool = False,
):
    first_tokens = packed[:B]
    seq_lens = packed[B : 2 * B]
    page_table = packed[2 * B : 2 * B + B * P].reshape(B, P)
    o = 2 * B + B * P
    swa_table = None
    if swa:
        swa_table = packed[o : o + B * P].reshape(B, P)
        o += B * P
    delta = packed[o:] if mrope else None
    return first_tokens, seq_lens, page_table, delta, swa_table


def decode_step_batch(
    tokens: jnp.ndarray,  # [B] input token ids for this step
    seq_lens0: jnp.ndarray,  # [B] context len before this fused window
    page_table: jnp.ndarray,  # [B, P]
    k: jnp.ndarray,  # scalar: step index within the window
    page_size: int,
    swa_page_table: jnp.ndarray = None,  # [B, P] (hybrid-SWA models)
) -> DeviceBatch:
    """Build the L=1 DeviceBatch for fused-decode step k, on device."""
    B = tokens.shape[0]
    pos = seq_lens0 + k  # [B] position of the new token
    page_idx = pos // page_size
    page = jnp.take_along_axis(page_table, page_idx[:, None], axis=1)[:, 0]
    out_slots = page * page_size + pos % page_size
    # Padded rows (seq_lens0 == 0) must stay harmless: position 0 / page 0.
    is_pad = seq_lens0 == 0
    pos = jnp.where(is_pad, 0, pos)
    out_slots = jnp.where(is_pad, 0, out_slots)
    swa_out_slots = None
    if swa_page_table is not None:
        sp = jnp.take_along_axis(
            swa_page_table, page_idx[:, None], axis=1
        )[:, 0]
        swa_out_slots = jnp.where(
            is_pad, 0, sp * page_size + (seq_lens0 + k) % page_size
        )[:, None]
    return DeviceBatch(
        input_ids=tokens[:, None],
        positions=pos[:, None],
        seq_lens=jnp.where(is_pad, 0, pos + 1),
        page_table=page_table,
        out_slots=out_slots[:, None],
        logits_idx=np.arange(B, dtype=np.int32),
        swa_page_table=swa_page_table,
        swa_out_slots=swa_out_slots,
    )
