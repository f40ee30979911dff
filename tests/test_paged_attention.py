"""Pallas fused KV-write + paged decode attention vs the XLA reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_tpu.layers.attention import attention_xla, gather_kv, write_kv
from sglang_tpu.ops.paged_attention import fused_paged_decode_attention


def _setup(B, P, ps, Hq, Hkv, D, L=3, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    num_pages = P * B + 8
    num_slots = num_pages * ps
    kv_cache = rng.randn(L * num_pages, ps, 2, Hkv * D).astype(np.float32)
    # Unique random page assignment (page 0 reserved as garbage).
    perm = rng.permutation(num_pages - 1)[: B * P] + 1
    page_table = perm.reshape(B, P).astype(np.int32)
    # seq_lens INCLUDE the new token being written this step.
    seq_lens = rng.randint(1, P * ps + 1, size=(B,)).astype(np.int32)
    out_slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = seq_lens[b] - 1
        out_slots[b, 0] = page_table[b, pos // ps] * ps + pos % ps
    q = rng.randn(B, 1, Hq, D).astype(np.float32)
    k_new = rng.randn(B, 1, Hkv, D).astype(np.float32)
    v_new = rng.randn(B, 1, Hkv, D).astype(np.float32)
    return dict(
        q=jnp.asarray(q, dtype),
        k_new=jnp.asarray(k_new, dtype),
        v_new=jnp.asarray(v_new, dtype),
        kv_cache=jnp.asarray(kv_cache, dtype),
        page_table=jnp.asarray(page_table),
        out_slots=jnp.asarray(out_slots),
        seq_lens=jnp.asarray(seq_lens),
        num_slots=num_slots,
    )


def _reference(s, ps, layer_idx, sm_scale, **attn_kw):
    kv = write_kv(
        s["kv_cache"], s["k_new"], s["v_new"], s["out_slots"], layer_idx,
        s["num_slots"],
    )
    k_ctx, v_ctx = gather_kv(kv, s["page_table"], layer_idx, s["num_slots"], ps, s["q"].shape[-1])
    positions = (s["seq_lens"] - 1)[:, None]
    out = attention_xla(
        s["q"], k_ctx, v_ctx, positions, s["seq_lens"], sm_scale, **attn_kw
    )
    return out, kv


@pytest.mark.parametrize("Hq,Hkv", [(8, 8), (8, 2), (32, 8)])
@pytest.mark.parametrize("ps,P", [(8, 4), (8, 16), (16, 8)])
def test_decode_matches_xla(Hq, Hkv, ps, P):
    B, D, L = 4, 64, 3
    s = _setup(B, P, ps, Hq, Hkv, D, L)
    layer_idx = jnp.int32(1)
    sm_scale = D ** -0.5

    out, kv_out = fused_paged_decode_attention(
        s["q"], s["k_new"], s["v_new"], s["kv_cache"], s["page_table"],
        s["out_slots"], s["seq_lens"], layer_idx,
        num_slots=s["num_slots"], page_size=ps, sm_scale=sm_scale,
        interpret=True,
    )
    ref, kv_ref = _reference(s, ps, layer_idx, sm_scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )
    # The in-kernel write must produce the same cache as the XLA scatter.
    np.testing.assert_allclose(
        np.asarray(kv_out), np.asarray(kv_ref), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("rows_per_block", [1, 2, 4])
def test_decode_rows_per_block(rows_per_block):
    B, P, ps, Hq, Hkv, D, L = 8, 8, 8, 16, 4, 64, 2
    s = _setup(B, P, ps, Hq, Hkv, D, L, seed=3)
    layer_idx = jnp.int32(0)
    sm_scale = D ** -0.5
    out, _ = fused_paged_decode_attention(
        s["q"], s["k_new"], s["v_new"], s["kv_cache"], s["page_table"],
        s["out_slots"], s["seq_lens"], layer_idx,
        num_slots=s["num_slots"], page_size=ps, sm_scale=sm_scale,
        rows_per_block=rows_per_block, interpret=True,
    )
    ref, _ = _reference(s, ps, layer_idx, sm_scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def _setup_contig(B, P, ps, Hq, Hkv, D, L=2, seed=0, dtype=jnp.float32):
    """Page tables as ASCENDING per-request runs (the allocator's common
    case) so multi-page groups take the ranged single-DMA branch."""
    s = _setup(B, P, ps, Hq, Hkv, D, L, seed=seed, dtype=dtype)
    pt = (
        np.arange(B * P, dtype=np.int32).reshape(B, P) + 1
    )  # page 0 = garbage
    s["page_table"] = jnp.asarray(pt)
    seq_lens = np.asarray(s["seq_lens"])
    out_slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = seq_lens[b] - 1
        out_slots[b, 0] = pt[b, pos // ps] * ps + pos % ps
    s["out_slots"] = jnp.asarray(out_slots)
    return s


# The shipped production config: pages_per_block > 1 (multi-page groups,
# double-buffered DMAs) with the runtime contiguity check.  These pin
# BOTH `pl.when(contig)` branches explicitly AND the runtime dispatch,
# over ≥2 page groups per row so a dropped first-group DMA start (the
# 55e... r04 regression: group 0 read an un-DMA'd zero buffer) fails
# every one of these with grossly wrong outputs.
@pytest.mark.parametrize("contig_mode", [None, True, False])
def test_decode_contiguous_pages_multigroup(contig_mode):
    B, P, ps, Hq, Hkv, D, L = 4, 16, 8, 8, 2, 64, 2
    s = _setup_contig(B, P, ps, Hq, Hkv, D, L, seed=7)
    # long contexts: 128 positions = 4 groups of PB=2 pages
    s["seq_lens"] = jnp.full((B,), P * ps, jnp.int32)
    pt = np.asarray(s["page_table"])
    out_slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = P * ps - 1
        out_slots[b, 0] = pt[b, pos // ps] * ps + pos % ps
    s["out_slots"] = jnp.asarray(out_slots)
    layer_idx = jnp.int32(1)
    sm_scale = D ** -0.5
    out, kv_out = fused_paged_decode_attention(
        s["q"], s["k_new"], s["v_new"], s["kv_cache"], s["page_table"],
        s["out_slots"], s["seq_lens"], layer_idx,
        num_slots=s["num_slots"], page_size=ps, sm_scale=sm_scale,
        pages_per_block=2, contig_mode=contig_mode, interpret=True,
    )
    ref, kv_ref = _reference(s, ps, layer_idx, sm_scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(kv_out), np.asarray(kv_ref), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("contig_mode", [None, False])
def test_decode_shuffled_pages_multigroup(contig_mode):
    """Shuffled (non-contiguous) page tables through the per-page DMA
    branch — with the runtime check (None) and forced off (False).
    Forcing contig_mode=True here would be WRONG by design (ranged DMA
    over non-adjacent pages); the runtime check must reject it."""
    B, P, ps, Hq, Hkv, D, L = 4, 16, 8, 8, 2, 64, 2
    s = _setup(B, P, ps, Hq, Hkv, D, L, seed=11)
    s["seq_lens"] = jnp.full((B,), P * ps, jnp.int32)
    pt = np.asarray(s["page_table"])
    out_slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = P * ps - 1
        out_slots[b, 0] = pt[b, pos // ps] * ps + pos % ps
    s["out_slots"] = jnp.asarray(out_slots)
    layer_idx = jnp.int32(0)
    sm_scale = D ** -0.5
    out, _ = fused_paged_decode_attention(
        s["q"], s["k_new"], s["v_new"], s["kv_cache"], s["page_table"],
        s["out_slots"], s["seq_lens"], layer_idx,
        num_slots=s["num_slots"], page_size=ps, sm_scale=sm_scale,
        pages_per_block=2, contig_mode=contig_mode, interpret=True,
    )
    ref, _ = _reference(s, ps, layer_idx, sm_scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_decode_mixed_contig_and_shuffled_rows():
    """Rows 0..1 contiguous runs, rows 2..3 shuffled — the runtime
    `pl.when(contig)` check must pick the right branch PER ROW."""
    B, P, ps, Hq, Hkv, D, L = 4, 8, 8, 8, 2, 64, 2
    s = _setup(B, P, ps, Hq, Hkv, D, L, seed=13)
    pt = np.asarray(s["page_table"]).copy()
    pt[0] = np.arange(P, dtype=np.int32) + 1
    pt[1] = np.arange(P, dtype=np.int32) + P + 1
    s["page_table"] = jnp.asarray(pt)
    s["seq_lens"] = jnp.full((B,), P * ps, jnp.int32)
    out_slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = P * ps - 1
        out_slots[b, 0] = pt[b, pos // ps] * ps + pos % ps
    s["out_slots"] = jnp.asarray(out_slots)
    layer_idx = jnp.int32(1)
    sm_scale = D ** -0.5
    out, _ = fused_paged_decode_attention(
        s["q"], s["k_new"], s["v_new"], s["kv_cache"], s["page_table"],
        s["out_slots"], s["seq_lens"], layer_idx,
        num_slots=s["num_slots"], page_size=ps, sm_scale=sm_scale,
        pages_per_block=2, interpret=True,
    )
    ref, _ = _reference(s, ps, layer_idx, sm_scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_decode_sliding_window():
    B, P, ps, Hq, Hkv, D, L = 4, 16, 8, 8, 4, 64, 2
    s = _setup(B, P, ps, Hq, Hkv, D, L)
    # Force long contexts so the window actually truncates.
    s["seq_lens"] = jnp.full((B,), P * ps, jnp.int32)
    pt = np.asarray(s["page_table"])
    out_slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = P * ps - 1
        out_slots[b, 0] = pt[b, pos // ps] * ps + pos % ps
    s["out_slots"] = jnp.asarray(out_slots)
    layer_idx = jnp.int32(0)
    sm_scale = D ** -0.5
    window = 24

    out, _ = fused_paged_decode_attention(
        s["q"], s["k_new"], s["v_new"], s["kv_cache"], s["page_table"],
        s["out_slots"], s["seq_lens"], layer_idx,
        num_slots=s["num_slots"], page_size=ps, sm_scale=sm_scale,
        sliding_window=window, interpret=True,
    )
    ref, _ = _reference(s, ps, layer_idx, sm_scale, sliding_window=window)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_decode_logit_cap_and_padded_rows():
    B, P, ps, Hq, Hkv, D, L = 4, 8, 8, 8, 8, 64, 2
    s = _setup(B, P, ps, Hq, Hkv, D, L)
    # Row 3 is padding (seq_len 0, writes to garbage slot 0) — no NaN.
    s["seq_lens"] = s["seq_lens"].at[3].set(0)
    s["out_slots"] = s["out_slots"].at[3, 0].set(0)
    layer_idx = jnp.int32(1)
    sm_scale = D ** -0.5

    out, _ = fused_paged_decode_attention(
        s["q"], s["k_new"], s["v_new"], s["kv_cache"], s["page_table"],
        s["out_slots"], s["seq_lens"], layer_idx,
        num_slots=s["num_slots"], page_size=ps, sm_scale=sm_scale,
        logit_cap=30.0, interpret=True,
    )
    assert not np.isnan(np.asarray(out)).any()
    ref, _ = _reference(s, ps, layer_idx, sm_scale, logit_cap=30.0)
    np.testing.assert_allclose(
        np.asarray(out)[:3], np.asarray(ref)[:3], rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("window", [None, 24])
def test_decode_attention_sinks(window):
    """GPT-OSS attention sinks through the fused decode kernel: the
    per-head phantom softmax slot (folded into the flash m/l epilogue)
    must match the XLA reference, alone and with a sliding window; a
    padded row (seq_len 0) must stay NaN-free."""
    B, P, ps, Hq, Hkv, D, L = 4, 8, 8, 8, 2, 64, 2
    s = _setup(B, P, ps, Hq, Hkv, D, L, seed=11)
    s["seq_lens"] = s["seq_lens"].at[3].set(0)
    s["out_slots"] = s["out_slots"].at[3, 0].set(0)
    layer_idx = jnp.int32(1)
    sm_scale = D ** -0.5
    rng = np.random.RandomState(13)
    sinks = jnp.asarray(rng.randn(Hq).astype(np.float32) * 2.0)

    out, _ = fused_paged_decode_attention(
        s["q"], s["k_new"], s["v_new"], s["kv_cache"], s["page_table"],
        s["out_slots"], s["seq_lens"], layer_idx,
        num_slots=s["num_slots"], page_size=ps, sm_scale=sm_scale,
        sliding_window=window, sinks=sinks, interpret=True,
    )
    assert not np.isnan(np.asarray(out)).any()
    ref, _ = _reference(
        s, ps, layer_idx, sm_scale, sliding_window=window, sinks=sinks
    )
    np.testing.assert_allclose(
        np.asarray(out)[:3], np.asarray(ref)[:3], rtol=2e-3, atol=2e-3
    )


def test_decode_kernel_mqa_wide_latent():
    """hkv=1 with a multi-tile lane span (absorbed-MLA shape): the kernel
    must return the full latent-width output (no head-segment select)."""
    import jax.numpy as jnp

    from sglang_tpu.layers.attention import attention_xla, gather_kv, write_kv
    from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

    rng = np.random.RandomState(0)
    B, hq, HD, ps, P = 4, 8, 256, 8, 4  # HD = 2 lane tiles, 1 kv head
    num_pages, L = 16, 1
    num_slots = num_pages * ps
    kv_cache = jnp.asarray(
        rng.randn(L * num_pages, ps, 2, HD).astype(np.float32) * 0.3
    )
    page_table = np.zeros((B, P), np.int32)
    perm = rng.permutation(np.arange(1, num_pages))
    k = 0
    seq_lens = np.asarray([5, 11, 17, 25], np.int32)
    for b in range(B):
        n = -(-int(seq_lens[b]) // ps)
        page_table[b, :n] = perm[k : k + n]
        k += n
    out_slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = seq_lens[b] - 1
        out_slots[b, 0] = page_table[b, pos // ps] * ps + pos % ps
    q = jnp.asarray(rng.randn(B, 1, hq, HD).astype(np.float32) * 0.2)
    k_new = jnp.asarray(rng.randn(B, 1, 1, HD).astype(np.float32) * 0.3)
    v_new = jnp.asarray(rng.randn(B, 1, 1, HD).astype(np.float32) * 0.3)

    out_p, kv_p = fused_paged_decode_attention(
        q, k_new, v_new, kv_cache, jnp.asarray(page_table),
        jnp.asarray(out_slots), jnp.asarray(seq_lens), jnp.int32(0),
        num_slots=num_slots, page_size=ps, sm_scale=0.1, interpret=True,
    )
    # reference: write then dense attention
    kv_ref = write_kv(kv_cache, k_new, v_new, jnp.asarray(out_slots),
                      jnp.int32(0), num_slots)
    k_ctx, v_ctx = gather_kv(kv_ref, jnp.asarray(page_table), jnp.int32(0),
                             num_slots, ps, HD)
    positions = jnp.asarray((seq_lens - 1)[:, None])
    out_ref = attention_xla(q, k_ctx, v_ctx, positions,
                            jnp.asarray(seq_lens), 0.1)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(kv_p), np.asarray(kv_ref),
                               rtol=1e-5, atol=1e-6)
