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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


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
    """Top-K-page decode attention. Returns [B, 1, Hq, D]."""
    B, _, Hq, D = q.shape
    ps = page_size
    P = page_table.shape[1]
    Hkv = kv_cache.shape[-1] // D
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
    _, sel = jax.lax.top_k(page_score, Ksel)  # [B, Ksel] page indices

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
