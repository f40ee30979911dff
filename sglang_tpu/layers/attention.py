"""Paged attention over the token-slot KV cache — backend dispatch.

Equivalent role to the reference's ``layers/radix_attention.py:57`` +
``layers/attention/`` backend ABC (``base_attn_backend.py:18``).  The KV
cache is a paged buffer ``[num_layers * num_pages, page_size, 2,
kv_heads * head_dim]`` (reference's paged "HND" layout,
``memory_pool.py:1458``, folded for TPU lane alignment — see
``core/memory_pool.py``); the page table gives each request its page list
in token order, so context slot j holds the token at position j.

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
    kv_cache: jnp.ndarray,  # [L*NP, ps, 2, Hkv*D] fused K/V buffer
    k_new: jnp.ndarray,  # [B, Lq, Hkv, D]
    v_new: jnp.ndarray,  # [B, Lq, Hkv, D]
    out_slots: jnp.ndarray,  # [B, Lq] flat slot ids (pad -> 0 garbage page)
    layer_idx: jnp.ndarray,  # scalar int32
    num_slots: int,
    kv_scales=None,  # (k_scale, v_scale) traced scalars for quantized KV
) -> jnp.ndarray:
    """Scatter new K/V rows into the cache (in-place under donation).

    With ``kv_scales``, rows are divided by the per-layer scale before the
    cast to the (fp8) cache dtype — reference ``memory_pool.py:1679``
    ``set_kv_buffer`` applies ``/ k_scale`` the same way."""
    ps = kv_cache.shape[1]
    num_pages = num_slots // ps
    HD = kv_cache.shape[-1]
    flat_slots = out_slots.reshape(-1)  # [B*Lq], layer-relative
    page_rows = layer_idx * num_pages + flat_slots // ps
    in_page = flat_slots % ps
    if kv_scales is not None:
        ks, vs = kv_scales
        k_new = (k_new.astype(jnp.float32) / ks).astype(k_new.dtype)
        v_new = (v_new.astype(jnp.float32) / vs).astype(v_new.dtype)
    kv = jnp.stack(
        [k_new.reshape(-1, HD), v_new.reshape(-1, HD)], axis=1
    )  # [B*Lq, 2, HD]
    return kv_cache.at[page_rows, in_page].set(
        kv.astype(kv_cache.dtype), mode="drop"
    )


def gather_kv(
    kv_cache: jnp.ndarray,  # [L*NP, ps, 2, Hkv*D]
    page_table: jnp.ndarray,  # [B, P]
    layer_idx: jnp.ndarray,
    num_slots: int,
    page_size: int,
    head_dim: int,
):
    """Gather a dense [B, C, Hkv, D] K and V context (C = P * page_size)."""
    B, P = page_table.shape
    ps = page_size
    num_pages = num_slots // ps
    HD = kv_cache.shape[-1]
    rows = page_table + layer_idx * num_pages  # [B, P]
    kv_ctx = kv_cache[rows]  # [B, P, ps, 2, HD]
    kv_ctx = kv_ctx.reshape(B, P * ps, 2, HD)
    # Unfold heads on the (small) gathered context only.
    return (
        kv_ctx[:, :, 0].reshape(B, P * ps, -1, head_dim),
        kv_ctx[:, :, 1].reshape(B, P * ps, -1, head_dim),
    )


def attention_xla(
    q: jnp.ndarray,  # [B, Lq, Hq, D]
    k_ctx: jnp.ndarray,  # [B, C, Hkv, D]
    v_ctx: jnp.ndarray,  # [B, C, Hkv, D]
    positions: jnp.ndarray,  # [B, Lq] absolute position of each query token
    seq_lens: jnp.ndarray,  # [B] total context length
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    sinks: Optional[jnp.ndarray] = None,  # [Hq] attention-sink logits
    bidir_groups: Optional[jnp.ndarray] = None,  # [B, Lq] image spans
) -> jnp.ndarray:
    """Dense masked attention over the gathered paged context.

    Context slot j holds token position j (pages are allocated in token
    order), so the causal mask is simply j <= positions[b, i].

    ``sinks`` (GPT-OSS, reference gpt_oss eager_attention_forward):
    a learned per-head logit joins the softmax as a phantom slot and is
    dropped after normalization — probabilities no longer sum to 1.
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
    if sliding_window is not None:
        # traced scalar; 0 disables. NEGATIVE encodes Llama4-style
        # CHUNKED attention of size -win: token p attends only positions
        # in its own chunk [p - p % C, p].
        win = jnp.asarray(sliding_window, jnp.int32)
        in_window = ctx_pos[None, None, :] > (positions[:, :, None] - win)
        chunk = jnp.maximum(-win, 1)
        same_chunk = (
            ctx_pos[None, None, :] // chunk == positions[:, :, None] // chunk
        )
        mask = mask & jnp.where(
            win > 0, in_window, jnp.where(win < 0, same_chunk, True)
        )
    if bidir_groups is not None:
        # Gemma 3 multimodal: tokens of the same image span attend each
        # other BIDIRECTIONALLY (ORed over causal+window); context-slot
        # group ids come from scattering this chunk's groups at its own
        # positions — earlier chunks stay causal (images never split
        # across chunks).
        bg = bidir_groups.astype(jnp.int32)
        ctx_g = jnp.full((B, C), -1, jnp.int32)
        ctx_g = ctx_g.at[
            jnp.arange(B)[:, None],
            jnp.where(bg >= 0, positions, C),  # non-image rows drop
        ].set(bg, mode="drop")
        qg = bg[:, :, None]
        same_img = (qg >= 0) & (ctx_g[:, None, :] == qg)
        same_img = same_img & valid[:, None, :]
        mask = mask | same_img
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)

    if sinks is not None:
        s = sinks.astype(jnp.float32).reshape(Hkv, G)[
            None, :, :, None
        ]  # [1, Hkv, G, 1]
        m = jnp.maximum(
            jnp.max(scores, axis=-1), s
        )  # [B, Hkv, G, Lq]
        e = jnp.exp(scores - m[..., None])
        e = jnp.where(mask[:, None, None, :, :], e, 0.0)
        denom = jnp.sum(e, axis=-1) + jnp.exp(s - m)
        probs = e / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
        # Fully-masked rows (padding) give NaN from softmax(-inf); zero.
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    # With an fp8 KV cache the attention weights must NOT be quantized to
    # the cache dtype (~2 significant digits); dequantize V up to bf16 and
    # keep P in bf16 (reference dequantizes fp8 K/V, keeps P fp16/bf16).
    pv_dtype = v_ctx.dtype
    if jnp.issubdtype(pv_dtype, jnp.floating) and jnp.finfo(pv_dtype).bits == 8:
        pv_dtype = jnp.bfloat16
        v_ctx = v_ctx.astype(pv_dtype)
    out = jnp.einsum(
        "bhglc,bchd->blhgd",
        probs.astype(pv_dtype),
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
    kv_scales=None,  # (k_scale, v_scale) traced scalars (fp8 KV dequant)
    sinks: Optional[jnp.ndarray] = None,  # [Hq] sink logits (GPT-OSS)
    bidir_groups=None,  # [B, Lq] image-span ids (Gemma3-MM; xla path)
):
    """Write new K/V into the cache, then attend over the full context.

    The pallas decode path performs the KV write INSIDE the kernel (an XLA
    scatter on the cache would flip its layout and force ~GiB transposes
    around every Mosaic call — see ops/paged_attention.py).

    FP8 KV (reference ``memory_pool.py:1679–1696`` per-layer k/v scales):
    rows are stored as ``x / scale`` in fp8; at read time the k_scale is
    folded into q (scores are linear in k) and the v_scale into the
    output (out is linear in v) — no per-element dequant of the cache.
    The decode kernel then runs read-only (``fused_write=False``): the
    new rows are scattered by XLA first, which keeps the canonical
    folded layout (verified for the prefill scatter; see
    core/memory_pool.py notes).
    """
    from sglang_tpu.environ import envs

    interpret = bool(envs.SGLANG_TPU_INTERPRET_PALLAS.value)
    fp8_kv = (
        jnp.issubdtype(kv_cache.dtype, jnp.floating)
        and jnp.finfo(kv_cache.dtype).bits == 8
    )
    if fp8_kv and kv_scales is not None:
        # fold k_scale into q before scores (tanh softcap and softmax see
        # exactly the dequantized scores)
        q = (q.astype(jnp.float32) * kv_scales[0]).astype(q.dtype)
    if backend == "pallas" and q.shape[1] == 1 and not fp8_kv:
        from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

        return fused_paged_decode_attention(
            q,
            k_new,
            v_new,
            kv_cache,
            batch.page_table,
            batch.out_slots,
            batch.seq_lens,
            layer_idx,
            num_slots=num_slots,
            page_size=page_size,
            sm_scale=sm_scale,
            logit_cap=logit_cap,
            sliding_window=sliding_window,
            sinks=sinks,
            interpret=interpret,
        )
    if backend == "pallas" and q.shape[1] == 1:  # fp8 KV decode
        from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

        # The kernel READ-MODIFY-WRITES the new row's whole page (1-byte
        # [2, HD] slices violate Mosaic tiling, full-page DMAs don't) —
        # no XLA scatter on the cache.  Rows store x / scale, so
        # pre-scale here like write_kv would.
        k_w, v_w = k_new, v_new
        if kv_scales is not None:
            k_w = (k_new.astype(jnp.float32) / kv_scales[0]).astype(
                k_new.dtype
            )
            v_w = (v_new.astype(jnp.float32) / kv_scales[1]).astype(
                v_new.dtype
            )
        out, kv_cache = fused_paged_decode_attention(
            q,
            k_w,
            v_w,
            kv_cache,
            batch.page_table,
            batch.out_slots,
            batch.seq_lens,
            layer_idx,
            num_slots=num_slots,
            page_size=page_size,
            sm_scale=sm_scale,
            logit_cap=logit_cap,
            sliding_window=sliding_window,
            sinks=sinks,
            fused_write=False,
            rmw_write=True,
            interpret=interpret,
        )
        if kv_scales is not None:
            out = (out.astype(jnp.float32) * kv_scales[1]).astype(q.dtype)
        return out, kv_cache
    kv_cache = write_kv(
        kv_cache, k_new, v_new, batch.out_slots, layer_idx, num_slots,
        kv_scales=kv_scales if fp8_kv else None,
    )
    if backend == "pallas":  # extend / chunked prefill, Lq > 1
        from sglang_tpu.ops.prefill_attention import paged_prefill_attention

        B, Lq = q.shape[:2]
        # rows pack n_new as logits_idx = i*Lq + (n_new-1); padded rows → 0
        new_lens = jnp.maximum(
            batch.logits_idx - np.arange(B, dtype=np.int32) * Lq + 1, 0
        )
        out, kv_cache = paged_prefill_attention(
            q,
            kv_cache,
            batch.page_table,
            batch.seq_lens,
            new_lens,
            layer_idx,
            num_slots=num_slots,
            page_size=page_size,
            sm_scale=sm_scale,
            logit_cap=logit_cap,
            sliding_window=sliding_window,
            sinks=sinks,
            interpret=interpret,
        )
    else:
        k_ctx, v_ctx = gather_kv(
            kv_cache, batch.page_table, layer_idx, num_slots, page_size,
            q.shape[-1],
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
            sinks=sinks,
            bidir_groups=(
                bidir_groups if q.shape[1] > 1 else None
            ),
        )
    if fp8_kv and kv_scales is not None:
        out = (out.astype(jnp.float32) * kv_scales[1]).astype(q.dtype)
    return out, kv_cache
