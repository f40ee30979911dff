"""Paged attention over the token-slot KV cache — backend dispatch.

Equivalent role to the reference's ``layers/radix_attention.py:57`` +
``layers/attention/`` backend ABC (``base_attn_backend.py:18``).  The KV
cache is a flat token-slot buffer ``[num_layers * num_slots, kv_heads,
head_dim]`` (reference layout "NHD", ``memory_pool.py:1450``); the page
table gives each request its slot list in token order, so context slot j
holds the token at position j.

Backends:
* ``xla``    — gather pages into a dense [B, C, Hkv, D] context and run
  masked attention; correct everywhere (CPU tests + TPU), ~3x the ideal
  HBM traffic.
* ``pallas`` — fused paged-attention kernels (ops/), speed-of-light path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.model_executor.forward_batch import DeviceBatch


def write_kv(
    kv_cache: jnp.ndarray,  # [L*S, 2, Hkv, D] fused K/V buffer
    k_new: jnp.ndarray,  # [B, Lq, Hkv, D]
    v_new: jnp.ndarray,  # [B, Lq, Hkv, D]
    out_slots: jnp.ndarray,  # [B, Lq] flat slot ids (pad -> 0 garbage page)
    layer_idx: jnp.ndarray,  # scalar int32
    num_slots: int,
) -> jnp.ndarray:
    """Scatter new K/V rows into the cache (in-place under donation)."""
    flat_slots = out_slots.reshape(-1) + layer_idx * num_slots  # [B*Lq]
    kv = jnp.stack(
        [
            k_new.reshape(-1, *k_new.shape[2:]),
            v_new.reshape(-1, *v_new.shape[2:]),
        ],
        axis=1,
    )  # [B*Lq, 2, Hkv, D]
    return kv_cache.at[flat_slots].set(kv.astype(kv_cache.dtype), mode="drop")


def gather_kv(
    kv_cache: jnp.ndarray,  # [L*S, 2, Hkv, D]
    page_table: jnp.ndarray,  # [B, P]
    layer_idx: jnp.ndarray,
    num_slots: int,
    page_size: int,
):
    """Gather a dense [B, C, Hkv, D] K and V context (C = P * page_size)."""
    B, P = page_table.shape
    # NOTE: np.arange, not jnp.arange — eager device constants get baked
    # into the jaxpr and force a device->host fetch at lowering time.
    ctx_slots = page_table[:, :, None] * page_size + np.arange(
        page_size, dtype=np.int32
    )
    ctx_slots = ctx_slots.reshape(B, P * page_size) + layer_idx * num_slots
    kv_ctx = kv_cache[ctx_slots]  # [B, C, 2, Hkv, D]
    return kv_ctx[:, :, 0], kv_ctx[:, :, 1]


def attention_xla(
    q: jnp.ndarray,  # [B, Lq, Hq, D]
    k_ctx: jnp.ndarray,  # [B, C, Hkv, D]
    v_ctx: jnp.ndarray,  # [B, C, Hkv, D]
    positions: jnp.ndarray,  # [B, Lq] absolute position of each query token
    seq_lens: jnp.ndarray,  # [B] total context length
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Dense masked attention over the gathered paged context.

    Context slot j holds token position j (pages are allocated in token
    order), so the causal mask is simply j <= positions[b, i].
    """
    B, Lq, Hq, D = q.shape
    C = k_ctx.shape[1]
    Hkv = k_ctx.shape[2]
    G = Hq // Hkv

    qg = q.reshape(B, Lq, Hkv, G, D)
    scores = jnp.einsum(
        "blhgd,bchd->bhglc", qg, k_ctx, preferred_element_type=jnp.float32
    )
    scores = scores * sm_scale
    if logit_cap is not None and logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)

    ctx_pos = np.arange(C, dtype=np.int32)  # position of each context slot
    valid = ctx_pos[None, :] < seq_lens[:, None]  # [B, C]
    causal = ctx_pos[None, None, :] <= positions[:, :, None]  # [B, Lq, C]
    mask = valid[:, None, :] & causal  # [B, Lq, C]
    if sliding_window is not None and sliding_window > 0:
        in_window = ctx_pos[None, None, :] > (
            positions[:, :, None] - sliding_window
        )
        mask = mask & in_window
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    # Fully-masked rows (padding) produce NaN from softmax(-inf); zero them.
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum(
        "bhglc,bchd->blhgd",
        probs.astype(v_ctx.dtype),
        v_ctx,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Lq, Hq, D).astype(q.dtype)


def paged_attention(
    q: jnp.ndarray,  # [B, Lq, Hq, D]
    k_new: jnp.ndarray,  # [B, Lq, Hkv, D]
    v_new: jnp.ndarray,
    kv_cache: jnp.ndarray,  # [L*S, 2, Hkv, D]
    batch: DeviceBatch,
    layer_idx: jnp.ndarray,
    *,
    num_slots: int,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    backend: str = "xla",
):
    """Write new K/V into the cache, then attend over the full context."""
    kv_cache = write_kv(
        kv_cache, k_new, v_new, batch.out_slots, layer_idx, num_slots
    )
    if backend == "pallas":
        from sglang_tpu.ops.paged_attention import paged_attention_pallas

        out = paged_attention_pallas(
            q,
            kv_cache,
            batch.page_table,
            batch.positions,
            batch.seq_lens,
            layer_idx,
            num_slots=num_slots,
            page_size=page_size,
            sm_scale=sm_scale,
            logit_cap=logit_cap,
            sliding_window=sliding_window,
        )
    else:
        k_ctx, v_ctx = gather_kv(
            kv_cache, batch.page_table, layer_idx, num_slots, page_size
        )
        out = attention_xla(
            q,
            k_ctx,
            v_ctx,
            batch.positions,
            batch.seq_lens,
            sm_scale,
            logit_cap=logit_cap,
            sliding_window=sliding_window,
        )
    return out, kv_cache
