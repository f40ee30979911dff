"""Pallas chunked-prefill (extend) flash attention.

Equivalent role to the reference's prefill/extend attention kernels
(flash-attention backends, ``layers/attention/``) — flash-style online
softmax so the [Lq, ctx] score matrix never touches HBM (the dense XLA
path materializes it in f32: ~2 GB for a 2k-token chunk against an 8k
context).

Design notes (measured on v5e):
* The paged context is first gathered CONTIGUOUS by one cheap XLA gather
  (KV bytes are far below score bytes), then the kernel runs over plain
  BlockSpec blocks — Pallas' automatic pipelining double-buffers the DMAs
  (a page-table-indirect variant spent ~70% of prefill issuing 16 KB page
  DMAs).
* GQA is handled by a (batch, kv_head) grid dimension with q rows packed
  as [TQ*G, D] per kv head — every MXU FLOP is useful.  (A block-diagonal
  q packing like the decode kernel's costs Hkv-times redundant FLOPs,
  which dominates prefill where attention is compute-heavy.)

Grid: (B, Hkv, q_blocks, kv_blocks) — kv innermost; m/l/acc live in
scratch across kv steps; the output block is written on the last kv step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _prefill_kernel(
    # scalar prefetch
    seq_lens_ref,  # [B] int32 total context (incl. new tokens)
    new_lens_ref,  # [B] int32 number of new (query) tokens
    window_ref,  # [1] int32 sliding window (<=0 disables)
    # inputs (auto-pipelined blocks)
    q_ref,  # [1, 1, 1, TQ*G, D] VMEM
    kv_ref,  # [1, 1, TC, 2, D] VMEM
    sinks_ref,  # [1, 1, TQ*G] f32 VMEM — per-row sink logits (zeros if unused)
    # outputs
    o_ref,  # [1, 1, 1, TQ*G, D] VMEM
    # scratch (persist across the kv grid dim)
    m_scr,  # [TQ*G, 8] f32
    l_scr,  # [TQ*G, 8] f32
    acc_scr,  # [TQ*G, D] f32
    *,
    tq: int,
    tc: int,
    g: int,
    logit_cap: Optional[float],
    use_sinks: bool,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ci = pl.program_id(3)
    nc = pl.num_programs(3)
    R = tq * g
    seq_len = seq_lens_ref[b]
    new_len = new_lens_ref[b]
    window = window_ref[0]
    pos0 = seq_len - new_len  # global position of query 0

    @pl.when(ci == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e20)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Row r covers query (r // g) of this q block (rows are q-major with
    # g head-variants each).
    qrow = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // g
    q_pos = pos0 + qi * tq + qrow
    q_live = qrow + qi * tq < new_len
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)
    p_c = ci * tc + col  # [1, tc]

    # Skip kv blocks fully outside this q block's causal range / window.
    q_hi = pos0 + jnp.minimum(qi * tq + tq, new_len) - 1
    needed = ci * tc <= q_hi
    q_lo = pos0 + qi * tq
    needed = jnp.logical_and(
        needed,
        jnp.logical_or(window <= 0, (ci + 1) * tc > q_lo - window + 1),
    )

    @pl.when(needed)
    def _():
        q = q_ref[0, 0, 0].astype(jnp.float32)  # [R, D]
        k = kv_ref[0, 0, :, 0]  # [TC, D]
        v = kv_ref[0, 0, :, 1]  # [TC, D]
        if jnp.issubdtype(k.dtype, jnp.floating) and jnp.finfo(k.dtype).bits == 8:
            # fp8 KV: upconvert via bf16 (dequant scales are folded into
            # q / the output by the caller — see layers/attention.py)
            k, v = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)

        scores = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, TC]
        if logit_cap is not None and logit_cap > 0:
            scores = logit_cap * jnp.tanh(scores / logit_cap)

        mask = (p_c <= q_pos) & (p_c < seq_len) & q_live
        mask = mask & ((window <= 0) | (p_c > q_pos - window))
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        # Clamp: fully-masked rows keep m at -1e20, so exp(-1e30 + 1e20)
        # underflows to exactly 0 — no [R, TC] where needed on p.
        m_new = jnp.maximum(jnp.maximum(m_prev, m_cur), -1e20)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, D]
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ci == nc - 1)
    def _():
        l = l_scr[:, :1]
        acc = acc_scr[:]
        if use_sinks:
            # Attention sinks (GPT-OSS): fold the per-head phantom-slot
            # logit into the running (m, l) stats at the end; the
            # numerator only rescales.  Dead (padded) rows have m at
            # -1e20 and l 0 → l becomes exp(0)=1, acc stays 0.
            m = m_scr[:, :1]
            s = sinks_ref[0, 0][:, None].astype(jnp.float32)  # [R, 1]
            m_f = jnp.maximum(m, s)
            l = l * jnp.exp(m - m_f) + jnp.exp(s - m_f)
            acc = acc * jnp.exp(m - m_f)
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, 0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "logit_cap", "tq", "tc", "interpret"),
)
def flash_prefill_attention(
    q: jnp.ndarray,  # [B, Lq, Hq, D]
    kv_ctx: jnp.ndarray,  # [B, C, 2, Hkv*D] contiguous gathered context
    seq_lens: jnp.ndarray,  # [B] int32 total context (incl. new)
    new_lens: jnp.ndarray,  # [B] int32 query tokens per row
    *,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window=None,  # traced scalar; None/<=0 disables
    sinks=None,  # [Hq] per-head sink logits (GPT-OSS); None disables
    tq: int = 0,  # 0 = auto: ~256 score rows per block
    tc: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash prefill over a contiguous context. Returns [B, Lq, Hq, D]."""
    B, Lq, Hq, D = q.shape
    C = kv_ctx.shape[1]
    Hkv = kv_ctx.shape[-1] // D
    G = Hq // Hkv

    if tq <= 0:
        tq = max(512 // G, 8)
    tq = min(tq, Lq)
    while Lq % tq != 0:  # Lq is a power-of-2 bucket
        tq -= 1
    tc = min(tc, C)
    while C % tc != 0:  # C = pages bucket * page_size (power-of-2 * ps)
        tc -= 1
    NQ, NC = Lq // tq, C // tc

    window = jnp.asarray(
        0 if sliding_window is None else sliding_window, jnp.int32
    ).reshape(1)

    # [B, Hkv, NQ, TQ*G, D] — rows q-major with G head-variants each.
    qh = (q * sm_scale).reshape(B, NQ, tq, Hkv, G, D)
    qh = qh.transpose(0, 3, 1, 2, 4, 5).reshape(B, Hkv, NQ, tq * G, D)
    # [B, Hkv, C, 2, D]
    kvh = kv_ctx.reshape(B, C, 2, Hkv, D).transpose(0, 3, 1, 2, 4)

    use_sinks = sinks is not None
    if use_sinks:
        # Row r of grid cell (b, h) is query r//G, head-variant r%G →
        # global query head h*G + r%G.
        sinks_in = jnp.tile(
            jnp.asarray(sinks, jnp.float32).reshape(Hkv, 1, G), (1, tq, 1)
        ).reshape(Hkv, 1, tq * G)
    else:
        sinks_in = jnp.zeros((Hkv, 1, tq * G), jnp.float32)

    kernel = functools.partial(
        _prefill_kernel, tq=tq, tc=tc, g=G, logit_cap=logit_cap,
        use_sinks=use_sinks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv, NQ, NC),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, tq * G, D),
                lambda b, h, qi, ci, *_: (b, h, qi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tc, 2, D),
                lambda b, h, qi, ci, *_: (b, h, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tq * G),
                lambda b, h, qi, ci, *_: (h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, tq * G, D),
            lambda b, h, qi, ci, *_: (b, h, qi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tq * G, 8), jnp.float32),
            pltpu.VMEM((tq * G, 8), jnp.float32),
            pltpu.VMEM((tq * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, NQ, tq * G, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        seq_lens.astype(jnp.int32),
        new_lens.astype(jnp.int32),
        window,
        qh,
        kvh,
        sinks_in,
    )
    # [B, Hkv, NQ, TQ*G, D] → [B, Lq, Hq, D]
    out = out.reshape(B, Hkv, NQ, tq, G, D).transpose(0, 2, 3, 1, 4, 5)
    return out.reshape(B, Lq, Hq, D)


def paged_prefill_attention(
    q,
    kv_cache,  # [L*NP, ps, 2, Hkv*D]; new K/V ALREADY written
    page_table,
    seq_lens,
    new_lens,
    layer_idx,
    *,
    num_slots,
    page_size,
    sm_scale,
    logit_cap=None,
    sliding_window=None,
    sinks=None,
    tq: int = 0,
    tc: int = 1024,
    interpret: bool = False,
):
    """Gather the paged context contiguous, then flash-attend.

    Returns (out, kv_cache) — the cache is passed through unchanged."""
    B, P = page_table.shape
    ps = page_size
    num_pages = num_slots // ps
    HD = kv_cache.shape[-1]
    rows = page_table + layer_idx * num_pages  # [B, P]
    kv_ctx = kv_cache[rows].reshape(B, P * ps, 2, HD)
    out = flash_prefill_attention(
        q,
        kv_ctx,
        seq_lens,
        new_lens,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        sinks=sinks,
        tq=tq,
        tc=tc,
        interpret=interpret,
    )
    return out, kv_cache
