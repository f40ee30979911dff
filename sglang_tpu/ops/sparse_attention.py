"""Double-sparsity decode attention (post-training sparse attention).

Equivalent role to the reference's double-sparsity backend
(``srt/layers/attention/double_sparsity_backend.py`` + its label-cache
``token_to_kv_pool``; SURVEY §2.2 "sparse attention" row): long-context
decode reads only the top-K PAGES per query, ranked by approximate
scores over a LABEL CACHE — a thin copy of each key's ``r`` heaviest
channels maintained alongside the KV pool.  HBM traffic per step drops
from ``C·D`` to ``C·r + K_sel·ps·D``.

TPU-native notes: the label cache keeps the same folded
``[L·NP, ps, r_fold]`` layout as the KV pool (lane-sliceable); page
ranking is one small batched matmul + ``top_k`` — both MXU/VPU
friendly — and the selected pages re-use the dense gather + masked
attention path with their TRUE positions, so causal/window masks stay
exact.  Approximation is only in which pages participate.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


def label_channels(head_dim: int, num_kv_heads: int, r: int) -> np.ndarray:
    """Strided channel subset per kv head over the FOLDED lane axis
    (Double Sparsity picks offline heavy channels; a fixed stride is the
    checkpoint-free default — channels cover the rope spectrum evenly)."""
    assert r <= head_dim, (r, head_dim)
    stride = max(head_dim // r, 1)
    per_head = np.arange(0, head_dim, stride)[:r]
    return np.concatenate(
        [h * head_dim + per_head for h in range(num_kv_heads)]
    ).astype(np.int32)  # [num_kv_heads * r] indices into Hkv*D


def write_labels(
    label_cache: jnp.ndarray,  # [L*NP, ps, Hkv*r]
    k_new: jnp.ndarray,  # [B, Lq, Hkv, D]
    out_slots: jnp.ndarray,  # [B, Lq]
    layer_idx: jnp.ndarray,
    num_pages: int,
    channels: np.ndarray,  # [Hkv*r] folded-lane indices
) -> jnp.ndarray:
    """Mirror the KV write into the label cache (r channels of K)."""
    B, Lq, Hkv, D = k_new.shape
    ps = label_cache.shape[1]
    flat = out_slots.reshape(-1)
    rows = layer_idx * num_pages + flat // ps
    kf = k_new.reshape(B * Lq, Hkv * D)[:, channels]
    return label_cache.at[rows, flat % ps].set(
        kf.astype(label_cache.dtype), mode="drop"
    )


def select_top_pages(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    label_cache: jnp.ndarray,  # [L*NP, ps, Hkv*r]
    page_table: jnp.ndarray,  # [B, P]
    seq_lens: jnp.ndarray,  # [B] (incl. the new token)
    layer_idx: jnp.ndarray,
    *,
    num_pages: int,
    page_size: int,
    channels: np.ndarray,
    top_pages: int,
    hkv: int,
    sliding_window=None,
) -> jnp.ndarray:
    """Rank pages by approximate label scores; returns the top-K page
    ORDINALS into page_table [B, Ksel] (the newest page always kept)."""
    B, _, Hq, D = q.shape
    ps = page_size
    P = page_table.shape[1]
    Hkv = hkv
    G = Hq // Hkv
    r = len(channels) // Hkv
    Ksel = min(top_pages, P)

    rows = page_table + layer_idx * num_pages  # [B, P]
    labels = label_cache[rows]  # [B, P, ps, Hkv*r]
    labels = labels.reshape(B, P * ps, Hkv, r)
    # approximate scores over the label channels, MAX over the q group
    qg = q[:, 0].reshape(B, Hkv, G, D)
    ch_in_head = jnp.asarray(
        np.asarray(channels).reshape(Hkv, r) % D, jnp.int32
    )
    q_lab = jnp.take_along_axis(
        qg,
        jnp.broadcast_to(ch_in_head[None, :, None, :], (B, Hkv, G, r)),
        axis=-1,
    )  # [B, Hkv, G, r]
    approx = jnp.einsum(
        "bhgr,bchr->bhgc", q_lab.astype(jnp.float32),
        labels.astype(jnp.float32),
    )  # [B, Hkv, G, C]
    cpos = jnp.arange(P * ps, dtype=jnp.int32)
    valid = cpos[None, :] < seq_lens[:, None]  # [B, C]
    if sliding_window is not None:
        win = jnp.asarray(sliding_window, jnp.int32)
        in_win = cpos[None, :] > (seq_lens[:, None] - 1 - win)
        valid = valid & (in_win | (win <= 0))
    approx = jnp.where(valid[:, None, None, :], approx, NEG_INF)
    # page score = max over heads/groups/slots within the page
    page_score = approx.max(axis=(1, 2)).reshape(B, P, ps).max(-1)  # [B, P]
    page_valid = valid.reshape(B, P, ps).any(-1)
    # always keep the newest page (the running token's KV lives there)
    newest = jnp.clip((seq_lens - 1) // ps, 0, P - 1)
    page_score = jnp.where(page_valid, page_score, NEG_INF)
    page_score = page_score.at[jnp.arange(B), newest].set(jnp.inf)
    _, sel = jax.lax.top_k(page_score, Ksel)  # [B, Ksel] page ordinals
    return sel


def sparse_paged_decode(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    kv_cache: jnp.ndarray,  # [L*NP, ps, 2, Hkv*D]
    label_cache: jnp.ndarray,  # [L*NP, ps, Hkv*r]
    page_table: jnp.ndarray,  # [B, P]
    seq_lens: jnp.ndarray,  # [B] (incl. the new token)
    layer_idx: jnp.ndarray,
    *,
    num_pages: int,
    page_size: int,
    sm_scale: float,
    channels: np.ndarray,
    top_pages: int,
    sliding_window=None,
) -> jnp.ndarray:
    """Top-K-page decode attention (XLA gather path). Returns [B, 1, Hq, D]."""
    B, _, Hq, D = q.shape
    ps = page_size
    P = page_table.shape[1]
    Hkv = kv_cache.shape[-1] // D
    G = Hq // Hkv
    Ksel = min(top_pages, P)
    qg = q[:, 0].reshape(B, Hkv, G, D)

    rows = page_table + layer_idx * num_pages  # [B, P]
    sel = select_top_pages(
        q, label_cache, page_table, seq_lens, layer_idx,
        num_pages=num_pages, page_size=page_size, channels=channels,
        top_pages=top_pages, hkv=Hkv, sliding_window=sliding_window,
    )

    sel_rows = jnp.take_along_axis(rows, sel, axis=1)  # [B, Ksel]
    kv_sel = kv_cache[sel_rows]  # [B, Ksel, ps, 2, Hkv*D]
    k_ctx = kv_sel[:, :, :, 0].reshape(B, Ksel * ps, Hkv, D)
    v_ctx = kv_sel[:, :, :, 1].reshape(B, Ksel * ps, Hkv, D)
    # true positions of the selected slots drive the exact mask
    sel_pos = (
        sel[:, :, None] * ps + jnp.arange(ps, dtype=jnp.int32)[None, None]
    ).reshape(B, Ksel * ps)
    s_valid = sel_pos < seq_lens[:, None]
    if sliding_window is not None:
        win = jnp.asarray(sliding_window, jnp.int32)
        s_valid = s_valid & (
            (sel_pos > (seq_lens[:, None] - 1 - win)) | (win <= 0)
        )
    scores = jnp.einsum(
        "bhgd,bchd->bhgc",
        qg,
        k_ctx,
        preferred_element_type=jnp.float32,
    ) * sm_scale
    scores = jnp.where(s_valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum(
        "bhgc,bchd->bhgd", probs.astype(v_ctx.dtype), v_ctx,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, 1, Hq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas fused top-K-page decode kernel
# ---------------------------------------------------------------------------

def _sparse_decode_kernel(
    # scalar prefetch
    page_table_ref,  # [B, P] int32
    sel_ref,  # [B, Ksel] int32 — selected page ORDINALS into page_table
    seq_lens_ref,  # [B] int32 (incl. the new token)
    out_slots_ref,  # [B] int32 layer-relative slot of the new token
    layer_page0_ref,  # [2] int32: (layer_idx * num_pages, sliding_window)
    # inputs
    qb_ref,  # [RB, Hq, Hkv*D] VMEM — block-diagonal packed queries
    kv_new_ref,  # [RB, 2, Hkv*D] VMEM — new K/V rows to write
    kv_hbm_ref,  # [L*NP, ps, 2, Hkv*D] (ANY → HBM)
    # outputs
    o_ref,  # [RB, Hq, LANE] VMEM
    kv_out_ref,  # aliased to kv_hbm_ref — written via DMA only
    # scratch
    kv_buf,  # [2, RB, PB, ps, 2, Hkv*D] VMEM
    sems,  # DMA sems [2, RB, PB]
    w_sems,  # write sems [RB]
    *,
    rows_per_block: int,
    pages_per_block: int,
    page_size: int,
    n_groups: int,
    hq: int,
    hkv: int,
    d: int,
):
    """Like ops/paged_attention._decode_kernel, but the page walk follows
    the SELECTED page ordinals: only Ksel pages are DMA'd per row, and
    each slot's causal/window mask uses its TRUE sequence position
    (ordinal*ps + in-page offset) so sparsity never changes the mask —
    only which pages participate.  Reference role:
    double_sparsity_backend.py decode path."""
    blk = pl.program_id(0)
    RB, PB, ps = rows_per_block, pages_per_block, page_size
    T = PB * ps
    HD = hkv * d
    layer_page0 = layer_page0_ref[0]
    window = layer_page0_ref[1]

    @pl.when(blk == 0)
    def _():
        kv_buf[...] = jnp.zeros_like(kv_buf)

    # ---- 1. write the new K/V rows (newest page is always selected) ----
    for r in range(RB):
        b = blk * RB + r
        slot = out_slots_ref[b]
        page_row = layer_page0 + slot // ps
        in_page = slot % ps
        pltpu.make_async_copy(
            kv_new_ref.at[r],
            kv_out_ref.at[page_row, in_page],
            w_sems.at[r],
        ).start()
    for r in range(RB):
        pltpu.make_async_copy(
            kv_new_ref.at[r], kv_out_ref.at[0, 0], w_sems.at[r]
        ).wait()

    # ---- 2. attention over the selected pages (all n_groups groups;
    # rows with fewer live pages are killed by the position mask) ----
    def start_group(g, slot_idx):
        for r in range(RB):
            b = blk * RB + r
            for i in range(PB):
                page = (
                    page_table_ref[b, sel_ref[b, g * PB + i]] + layer_page0
                )
                pltpu.make_async_copy(
                    kv_out_ref.at[page],
                    kv_buf.at[slot_idx, r, i],
                    sems.at[slot_idx, r, i],
                ).start()

    def wait_group(g, slot_idx):
        for r in range(RB):
            for i in range(PB):
                pltpu.make_async_copy(
                    kv_out_ref.at[0],
                    kv_buf.at[slot_idx, r, i],
                    sems.at[slot_idx, r, i],
                ).wait()

    start_group(0, 0)
    qb = qb_ref[...].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    def body(g, carry):
        m_prev, l_prev, acc = carry
        slot_idx = g % 2

        @pl.when(g + 1 < n_groups)
        def _():
            start_group(g + 1, (g + 1) % 2)

        wait_group(g, slot_idx)
        kv = kv_buf[slot_idx]  # [RB, PB, ps, 2, HD]
        k3 = kv[:, :, :, 0].reshape(RB, T, HD)
        v3 = kv[:, :, :, 1].reshape(RB, T, HD)

        scores = jax.lax.dot_general(
            qb,
            k3.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [RB, Hq, T]

        # true position of every buffered slot: ordinal*ps + in-page col
        rows_ok = []
        for r in range(RB):
            b = blk * RB + r
            ordv = jnp.zeros((1, T), jnp.int32)
            for i in range(PB):
                o = sel_ref[b, g * PB + i]
                ordv = jnp.where(col // ps == i, o, ordv)
            pos = ordv * ps + col % ps  # [1, T]
            s = seq_lens_ref[b]
            ok = pos < s
            in_win = jnp.logical_or(window <= 0, pos > s - 1 - window)
            rows_ok.append(jnp.logical_and(ok, in_win))
        mask = jnp.stack(rows_ok, axis=0)  # [RB, 1, T]
        scores = jnp.where(mask, scores, NEG_INF)

        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        p = jnp.where(mask, p, 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p,
            v3.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    init = (
        jnp.full((RB, hq, 1), NEG_INF, jnp.float32),
        jnp.zeros((RB, hq, 1), jnp.float32),
        jnp.zeros((RB, hq, HD), jnp.float32),
    )
    _, l, acc = jax.lax.fori_loop(0, n_groups, body, init)

    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded) rows
    out_all = (acc / l).reshape(RB * hq, HD)
    G = hq // hkv
    if hkv == 1:
        o_ref[...] = out_all.reshape(RB, hq, HD).astype(o_ref.dtype)
        return
    row = jax.lax.broadcasted_iota(jnp.int32, (RB * hq, LANE), 0)
    out = jnp.zeros((RB * hq, LANE), jnp.float32)
    for h in range(hkv):
        rolled = pltpu.roll(out_all, shift=(HD - h * d) % HD, axis=1)[:, :LANE]
        if HD < LANE:
            pad = jnp.zeros((RB * hq, LANE - HD), jnp.float32)
            rolled = jnp.concatenate([rolled, pad], axis=1)
        out = jnp.where(((row % hq) // G) == h, rolled, out)
    o_ref[...] = out.reshape(RB, hq, LANE).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_slots",
        "page_size",
        "sm_scale",
        "pages_per_block",
        "rows_per_block",
        "interpret",
    ),
)
def fused_sparse_paged_decode(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_new: jnp.ndarray,  # [B, 1, Hkv, D]
    v_new: jnp.ndarray,  # [B, 1, Hkv, D]
    kv_cache: jnp.ndarray,  # [L*NP, ps, 2, Hkv*D]
    page_table: jnp.ndarray,  # [B, P] int32
    sel: jnp.ndarray,  # [B, Ksel] int32 selected page ordinals
    out_slots: jnp.ndarray,  # [B, 1] int32 layer-relative new-token slot
    seq_lens: jnp.ndarray,  # [B] int32 (incl. the new token)
    layer_idx: jnp.ndarray,  # scalar int32
    *,
    num_slots: int,
    page_size: int,
    sm_scale: float,
    sliding_window=None,  # traced scalar ok; None/<=0 disables
    pages_per_block: Optional[int] = None,
    rows_per_block: Optional[int] = None,
    interpret: bool = False,
):
    """Fused KV-write + top-K-page decode attention.

    Returns (out [B, 1, Hq, D], kv_cache).  HBM read traffic per step is
    Ksel*ps*HD per row instead of the full context — the label-score
    selection (select_top_pages) runs in XLA first."""
    B, Lq, Hq, D = q.shape
    assert Lq == 1, "sparse decode kernel handles Lq == 1"
    Hkv = kv_cache.shape[-1] // D
    G = Hq // Hkv
    Ksel = sel.shape[1]
    num_pages = num_slots // page_size

    if pages_per_block is None:
        pages_per_block = max(1, min(Ksel, max(1, 64 // page_size)))
    PB = min(pages_per_block, Ksel)
    while Ksel % PB != 0:
        PB -= 1
    if rows_per_block is None:
        rows_per_block = 8
    RB = min(rows_per_block, B)
    while B % RB != 0:
        RB -= 1

    window = jnp.asarray(
        0 if sliding_window is None else sliding_window, jnp.int32
    )
    layer_page0 = jnp.stack(
        [jnp.asarray(layer_idx * num_pages, jnp.int32), window]
    )

    onehot = jnp.asarray(
        np.eye(Hkv, dtype=np.float32)[np.arange(Hq) // G], q.dtype
    )
    qb = jnp.einsum("bhd,hk->bhkd", q.reshape(B, Hq, D) * sm_scale, onehot)
    qb = qb.reshape(B, Hq, Hkv * D)

    kv_new = jnp.stack(
        [k_new.reshape(B, Hkv * D), v_new.reshape(B, Hkv * D)], axis=1
    ).astype(kv_cache.dtype)

    kernel = functools.partial(
        _sparse_decode_kernel,
        rows_per_block=RB,
        pages_per_block=PB,
        page_size=page_size,
        n_groups=Ksel // PB,
        hq=Hq,
        hkv=Hkv,
        d=D,
    )
    lane_out = Hkv * D if Hkv == 1 else LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B // RB,),
        in_specs=[
            pl.BlockSpec(
                (RB, Hq, Hkv * D),
                lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RB, 2, Hkv * D),
                lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (RB, Hq, lane_out), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, RB, PB, page_size, 2, Hkv * D), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, RB, PB)),
            pltpu.SemaphoreType.DMA((RB,)),
        ],
    )
    out, kv_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, lane_out), q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        ),
        grid_spec=grid_spec,
        # operand 7 (kv_cache; 5 scalar-prefetch args) aliases output 1.
        input_output_aliases={7: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        page_table.astype(jnp.int32),
        sel.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        out_slots.reshape(B).astype(jnp.int32),
        layer_page0,
        qb,
        kv_new,
        kv_cache,
    )
    return out[:, :, :D].reshape(B, 1, Hq, D), kv_out
