"""NSA / InfLLM-v2-class block-sparse attention (native sparse serving).

Equivalent role to the reference's NSA backend + InfLLM-v2 kernels
(``srt/layers/attention/nsa_backend.py``, ``sgl-kernel/csrc/infllm_v2/``;
SURVEY §2.2 sparse-attention row): every KV PAGE carries a compressed
representation — the masked MEAN of its keys — maintained alongside the
pool; queries rank pages by their pooled scores and attend only the
top-K blocks, for BOTH decode and prefill.  Unlike double-sparsity
(ops/sparse_attention.py), which ranks by a thin per-channel label
cache, the pooled-key representation is the InfLLM-v2 block summary:
selection quality does not depend on a channel heuristic, and the same
machinery drives block-sparse PREFILL (per-query-tile top-K), which the
label path never had.

TPU-native notes:
* The pooled cache is ``[L*NP, Hkv*D]`` f32 — 1/page_size of the pool's
  K bytes; scoring is one small batched matmul + ``top_k`` (MXU/VPU).
* Decode reuses the fused selected-page Pallas kernel
  (ops/sparse_attention.fused_sparse_paged_decode): in-kernel page DMAs
  + KV write, HBM traffic ~ Ksel*ps*HD per row.
* Prefill gathers each query tile's selected pages CONTIGUOUS with one
  XLA gather and flash-attends with TRUE-position masks — the
  gather-then-flash rule measured on v5e (ops/prefill_attention.py
  design notes): selected bytes are far below score bytes, and
  page-table-indirect kernel DMAs lose to pipelined BlockSpec blocks.
* The selection mask forces the DIAGONAL pages (the tile's own
  positions) and page 0 (attention-sink prefix, the InfLLM initial
  tokens) so causal-local structure survives any ranking.
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


# ---------------------------------------------------------------------------
# pooled-key (block summary) cache
# ---------------------------------------------------------------------------

def update_pooled(
    pooled: jnp.ndarray,  # [L*NP, Hkv*D] f32 — masked per-page key means
    kv_cache: jnp.ndarray,  # [L*NP, ps, 2, Hkv*D] — new K ALREADY written
    page_table: jnp.ndarray,  # [B, P] int32
    positions: jnp.ndarray,  # [B, Lq] int32 positions of the written tokens
    seq_lens: jnp.ndarray,  # [B] int32 (incl. the new tokens; 0 = pad row)
    layer_idx: jnp.ndarray,  # scalar int32
    *,
    num_pages: int,
    page_size: int,
) -> jnp.ndarray:
    """Recompute the pooled summary of every page touched by this write.

    All touched ordinals recompute from the FINAL cache state, so
    duplicate scatters carry identical values (last-write-wins is a
    no-op).  Pages only partially filled average their valid slots."""
    B, Lq = positions.shape
    ps = page_size
    P = page_table.shape[1]
    HD = kv_cache.shape[-1]
    Nt = Lq // ps + 1  # max pages a contiguous Lq-token write can touch
    pos0 = positions[:, 0]
    o = pos0[:, None] // ps + jnp.arange(Nt, dtype=jnp.int32)[None]
    o_hi = jnp.maximum(seq_lens - 1, 0) // ps
    touched = (
        (o <= o_hi[:, None]) & (seq_lens[:, None] > 0) & (o < P)
    )  # [B, Nt]
    o_safe = jnp.clip(o, 0, P - 1)
    page = jnp.take_along_axis(page_table, o_safe, axis=1)  # [B, Nt]
    rows = layer_idx * num_pages + page
    kpage = kv_cache[rows][:, :, :, 0].astype(jnp.float32)  # [B, Nt, ps, HD]
    slotpos = (
        o_safe[:, :, None] * ps
        + jnp.arange(ps, dtype=jnp.int32)[None, None]
    )  # [B, Nt, ps]
    vmask = (slotpos < seq_lens[:, None, None])[..., None]
    ksum = jnp.sum(kpage * vmask, axis=2)  # [B, Nt, HD]
    cnt = jnp.maximum(jnp.sum(vmask, axis=2), 1)
    mean = ksum / cnt
    rows_w = jnp.where(touched, rows, jnp.int32(-1)).reshape(-1)
    return pooled.at[rows_w].set(
        mean.reshape(-1, HD).astype(pooled.dtype), mode="drop"
    )


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------

def nsa_select_decode(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    pooled: jnp.ndarray,  # [L*NP, Hkv*D] f32
    page_table: jnp.ndarray,  # [B, P]
    seq_lens: jnp.ndarray,  # [B] (incl. the new token)
    layer_idx: jnp.ndarray,
    *,
    num_pages: int,
    page_size: int,
    top_pages: int,
    sliding_window=None,
) -> jnp.ndarray:
    """Top-K page ordinals for the decode step [B, Ksel]; the newest
    page and page ordinal 0 (sink prefix) are always kept."""
    B, _, Hq, D = q.shape
    ps = page_size
    P = page_table.shape[1]
    Hkv = pooled.shape[-1] // D
    G = Hq // Hkv
    Ksel = min(top_pages, P)

    rows = page_table + layer_idx * num_pages
    pk = pooled[rows].reshape(B, P, Hkv, D).astype(jnp.float32)
    qg = q[:, 0].reshape(B, Hkv, G, D).astype(jnp.float32)
    s = jnp.einsum("bhgd,bphd->bhgp", qg, pk)  # [B, Hkv, G, P]
    score = s.max(axis=(1, 2))  # [B, P]
    ordv = jnp.arange(P, dtype=jnp.int32)
    valid = ordv[None, :] * ps < seq_lens[:, None]
    if sliding_window is not None:
        win = jnp.asarray(sliding_window, jnp.int32)
        in_win = (ordv[None, :] + 1) * ps > (
            seq_lens[:, None] - win
        )
        valid = valid & (in_win | (win <= 0))
    score = jnp.where(valid, score, NEG_INF)
    newest = jnp.clip((seq_lens - 1) // ps, 0, P - 1)
    score = score.at[jnp.arange(B), newest].set(jnp.inf)
    score = score.at[:, 0].set(
        jnp.where(valid[:, 0], jnp.inf, NEG_INF)
    )
    _, sel = jax.lax.top_k(score, Ksel)
    return sel


def nsa_select_prefill(
    q: jnp.ndarray,  # [B, Lq, Hq, D]
    pooled: jnp.ndarray,  # [L*NP, Hkv*D]
    page_table: jnp.ndarray,  # [B, P]
    seq_lens: jnp.ndarray,  # [B]
    new_lens: jnp.ndarray,  # [B] query tokens per row
    layer_idx: jnp.ndarray,
    *,
    num_pages: int,
    page_size: int,
    top_pages: int,
    tile_q: int,
) -> jnp.ndarray:
    """Per-query-tile top-K page ordinals [B, NQ, Ksel] (InfLLM-v2
    block selection).  Each tile's scores come from its mean query;
    the tile's own (diagonal) pages and page 0 are forced in."""
    B, Lq, Hq, D = q.shape
    ps = page_size
    P = page_table.shape[1]
    Hkv = pooled.shape[-1] // D
    G = Hq // Hkv
    NQ = Lq // tile_q
    Ksel = min(top_pages, P)

    rows = page_table + layer_idx * num_pages
    pk = pooled[rows].reshape(B, P, Hkv, D).astype(jnp.float32)

    pos0 = seq_lens - new_lens  # [B] global position of query 0
    qt = q.reshape(B, NQ, tile_q, Hq, D).astype(jnp.float32)
    # mean over LIVE queries of the tile
    qrow = (
        jnp.arange(NQ, dtype=jnp.int32)[:, None] * tile_q
        + jnp.arange(tile_q, dtype=jnp.int32)[None]
    )  # [NQ, tile_q]
    live = qrow[None] < new_lens[:, None, None]  # [B, NQ, tile_q]
    qmean = jnp.sum(
        qt * live[..., None, None], axis=2
    ) / jnp.maximum(jnp.sum(live, axis=2), 1)[..., None, None]
    qmg = qmean.reshape(B, NQ, Hkv, G, D)
    s = jnp.einsum("bthgd,bphd->bthgp", qmg, pk)
    score = s.max(axis=(2, 3))  # [B, NQ, P]

    ordv = jnp.arange(P, dtype=jnp.int32)[None, None]  # [1, 1, P]
    # causal bound per tile: the tile's highest live query position
    q_hi = pos0[:, None] + jnp.clip(
        (jnp.arange(NQ, dtype=jnp.int32)[None] + 1) * tile_q,
        None,
        new_lens[:, None],
    ) - 1  # [B, NQ]
    q_lo = pos0[:, None] + jnp.arange(NQ, dtype=jnp.int32)[None] * tile_q
    valid = (ordv * ps <= q_hi[:, :, None]) & (
        seq_lens[:, None, None] > 0
    )
    score = jnp.where(valid, score, NEG_INF)
    # force the diagonal (pages overlapping the tile's own positions)
    diag = (ordv * ps <= q_hi[:, :, None]) & (
        (ordv + 1) * ps > q_lo[:, :, None]
    )
    score = jnp.where(diag & valid, jnp.inf, score)
    score = score.at[:, :, 0].set(
        jnp.where(valid[:, :, 0], jnp.inf, NEG_INF)
    )
    _, sel = jax.lax.top_k(score, Ksel)  # [B, NQ, Ksel]
    return sel


# ---------------------------------------------------------------------------
# block-sparse prefill (gather selected pages, flash with true positions)
# ---------------------------------------------------------------------------

def _nsa_prefill_kernel(
    # scalar prefetch
    seq_lens_ref,  # [BN] int32 (per (b, tile) row)
    qpos0_ref,  # [BN] int32 global position of the tile's query 0
    nlive_ref,  # [BN] int32 live queries in the tile
    sel_ref,  # [BN, Ksel] int32 selected page ordinals (SMEM)
    # inputs
    q_ref,  # [1, 1, TQ*G, D] VMEM
    kv_ref,  # [1, 1, TC, 2, D] VMEM — gathered selected pages
    # outputs
    o_ref,  # [1, 1, TQ*G, D] VMEM
    # scratch
    m_scr,
    l_scr,
    acc_scr,
    *,
    tq: int,
    tc: int,
    g: int,
    ps: int,
    logit_cap: Optional[float],
):
    bn = pl.program_id(0)
    ci = pl.program_id(2)
    nc = pl.num_programs(2)
    R = tq * g
    seq_len = seq_lens_ref[bn]
    pos0 = qpos0_ref[bn]
    n_live = nlive_ref[bn]

    @pl.when(ci == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e20)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qrow = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // g
    q_pos = pos0 + qrow
    q_live = qrow < n_live
    # TRUE position of every gathered context slot, rebuilt from the
    # block's page ordinals in SMEM (a VMEM position buffer would need
    # a 128-aligned dynamic slice — Mosaic forbids tc % 128 != 0 here)
    ppb = tc // ps
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)
    p_c = slot_iota % ps
    page_j = slot_iota // ps
    for j in range(ppb):
        base = sel_ref[bn, ci * ppb + j] * ps
        p_c = jnp.where(page_j == j, p_c + base, p_c)

    q = q_ref[0, 0].astype(jnp.float32)
    k = kv_ref[0, 0, :, 0].astype(jnp.float32)
    v = kv_ref[0, 0, :, 1].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, TC]
    if logit_cap is not None and logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    mask = (p_c <= q_pos) & (p_c < seq_len) & q_live
    scores = jnp.where(mask, scores, NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(jnp.maximum(m_prev, m_cur), -1e20)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ci == nc - 1)
    def _():
        l = jnp.where(l_scr[:, :1] == 0.0, 1.0, l_scr[:, :1])
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_slots", "page_size", "sm_scale", "logit_cap", "tile_q",
        "backend", "interpret",
    ),
)
def nsa_prefill_attention(
    q: jnp.ndarray,  # [B, Lq, Hq, D]
    kv_cache: jnp.ndarray,  # [L*NP, ps, 2, Hkv*D]; new K/V already written
    page_table: jnp.ndarray,  # [B, P]
    sel: jnp.ndarray,  # [B, NQ, Ksel] page ordinals (nsa_select_prefill)
    seq_lens: jnp.ndarray,  # [B]
    new_lens: jnp.ndarray,  # [B]
    layer_idx: jnp.ndarray,
    *,
    num_slots: int,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    tile_q: int = 128,
    backend: str = "pallas",
    interpret: bool = False,
) -> jnp.ndarray:
    """Block-sparse prefill over each tile's selected pages.

    Returns [B, Lq, Hq, D].  HBM reads per tile are Ksel*ps*HD instead
    of the full context."""
    B, Lq, Hq, D = q.shape
    ps = page_size
    num_pages = num_slots // ps
    HD = kv_cache.shape[-1]
    Hkv = HD // D
    G = Hq // Hkv
    NQ, Ksel = sel.shape[1], sel.shape[2]
    C = Ksel * ps
    BN = B * NQ

    rows = jnp.take_along_axis(
        (page_table + layer_idx * num_pages)[:, None].repeat(NQ, 1),
        sel, axis=2,
    )  # [B, NQ, Ksel]
    ctx = kv_cache[rows].reshape(BN, C, 2, HD)

    pos0 = seq_lens - new_lens
    qpos0 = (
        pos0[:, None]
        + jnp.arange(NQ, dtype=jnp.int32)[None] * tile_q
    ).reshape(BN)
    nlive = jnp.clip(
        new_lens[:, None]
        - jnp.arange(NQ, dtype=jnp.int32)[None] * tile_q,
        0, tile_q,
    ).reshape(BN)
    seq_bn = jnp.repeat(seq_lens, NQ)

    if backend != "pallas":
        # XLA fallback (CPU tests / unaligned geometries): same math,
        # scores materialized per tile.
        pos_ctx = (
            sel[..., None] * ps
            + jnp.arange(ps, dtype=jnp.int32)[None, None, None]
        ).reshape(BN, C)
        qt = (q * sm_scale).reshape(BN, tile_q, Hkv, G, D)
        k_ctx = ctx[:, :, 0].reshape(BN, C, Hkv, D)
        v_ctx = ctx[:, :, 1].reshape(BN, C, Hkv, D)
        s = jnp.einsum(
            "bqhgd,bchd->bqhgc",
            qt.astype(jnp.float32), k_ctx.astype(jnp.float32),
        )
        if logit_cap is not None and logit_cap > 0:
            s = logit_cap * jnp.tanh(s / logit_cap)
        qp = qpos0[:, None] + jnp.arange(tile_q, dtype=jnp.int32)[None]
        live = (
            jnp.arange(tile_q, dtype=jnp.int32)[None] < nlive[:, None]
        )
        m = (
            (pos_ctx[:, None] <= qp[:, :, None])
            & (pos_ctx[:, None] < seq_bn[:, None, None])
            & live[:, :, None]
        )[:, :, None, None]
        s = jnp.where(m, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(jnp.isnan(p), 0.0, p)
        # dead (padding) query rows: softmax of an all-NEG_INF row is
        # UNIFORM (finite sentinel, not -inf) => mean(V) garbage.  Zero
        # them so the fallback matches the kernel (whose l==0 epilogue
        # emits exact zeros) bit-for-bit in the discarded region.
        p = jnp.where(live[:, :, None, None, None], p, 0.0)
        out = jnp.einsum(
            "bqhgc,bchd->bqhgd", p, v_ctx.astype(jnp.float32)
        )
        return out.reshape(B, Lq, Hq, D).astype(q.dtype)

    # rows q-major with G head-variants (see prefill_attention.py)
    qh = (q * sm_scale).reshape(BN, tile_q, Hkv, G, D)
    qh = qh.transpose(0, 2, 1, 3, 4).reshape(BN, Hkv, tile_q * G, D)
    kvh = ctx.reshape(BN, C, 2, Hkv, D).transpose(0, 3, 1, 2, 4)

    # context tile: whole pages (positions rebuild from page ordinals)
    ppb = Ksel
    while ppb * ps > 1024 and ppb % 2 == 0:
        ppb //= 2
    tc = ppb * ps
    NC = C // tc

    kernel = functools.partial(
        _nsa_prefill_kernel, tq=tile_q, tc=tc, g=G, ps=ps,
        logit_cap=logit_cap,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(BN, Hkv, NC),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_q * G, D),
                lambda bn, h, ci, *_: (bn, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tc, 2, D),
                lambda bn, h, ci, *_: (bn, h, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_q * G, D),
            lambda bn, h, ci, *_: (bn, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q * G, 8), jnp.float32),
            pltpu.VMEM((tile_q * G, 8), jnp.float32),
            pltpu.VMEM((tile_q * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BN, Hkv, tile_q * G, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        seq_bn.astype(jnp.int32),
        qpos0.astype(jnp.int32),
        nlive.astype(jnp.int32),
        sel.reshape(BN, Ksel).astype(jnp.int32),
        qh,
        kvh,
    )
    out = out.reshape(B, NQ, Hkv, tile_q, G, D).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, Lq, Hq, D)
