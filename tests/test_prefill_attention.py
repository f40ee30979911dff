"""Pallas flash prefill attention vs the dense XLA path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_tpu.layers.attention import attention_xla, gather_kv, write_kv
from sglang_tpu.ops.prefill_attention import paged_prefill_attention


def _case(B, Lq, ps, P, Hq, Hkv, D, seed=0, mixed_ctx=True):
    """Each row: cached prefix of random length + Lq-bucket of new tokens
    (ragged n_new per row), new K/V pre-written like the real extend path."""
    rng = np.random.RandomState(seed)
    num_pages = B * P + 8
    num_slots = num_pages * ps
    kv_cache = jnp.asarray(
        rng.randn(num_pages * 2, ps, 2, Hkv * D), jnp.float32
    )  # 2 layers
    page_table = np.zeros((B, P), np.int32)
    perm = rng.permutation(num_pages - 1)[: B * P] + 1
    page_table[:] = perm.reshape(B, P)
    new_lens = rng.randint(1, Lq + 1, (B,)).astype(np.int32)
    cached = (
        rng.randint(0, P * ps // 2, (B,)).astype(np.int32) if mixed_ctx
        else np.zeros((B,), np.int32)
    )
    seq_lens = np.minimum(cached + new_lens, P * ps).astype(np.int32)
    cached = seq_lens - new_lens

    positions = np.zeros((B, Lq), np.int32)
    out_slots = np.zeros((B, Lq), np.int32)
    logits_idx = np.zeros((B,), np.int32)
    for i in range(B):
        pos = np.arange(cached[i], cached[i] + new_lens[i])
        positions[i, : new_lens[i]] = pos
        out_slots[i, : new_lens[i]] = (
            page_table[i][pos // ps] * ps + pos % ps
        )
        logits_idx[i] = i * Lq + new_lens[i] - 1

    q = rng.randn(B, Lq, Hq, D).astype(np.float32)
    k_new = rng.randn(B, Lq, Hkv, D).astype(np.float32)
    v_new = rng.randn(B, Lq, Hkv, D).astype(np.float32)
    layer_idx = jnp.int32(1)
    kv = write_kv(
        kv_cache, jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(out_slots), layer_idx, num_slots,
    )
    return dict(
        q=jnp.asarray(q), kv=kv, page_table=jnp.asarray(page_table),
        seq_lens=jnp.asarray(seq_lens), new_lens=jnp.asarray(new_lens),
        positions=jnp.asarray(positions), layer_idx=layer_idx,
        num_slots=num_slots, ps=ps, D=D,
    )


@pytest.mark.parametrize("Hq,Hkv", [(8, 2), (4, 4)])
@pytest.mark.parametrize("Lq,tq", [(16, 8), (32, 32)])
def test_prefill_matches_dense(Hq, Hkv, Lq, tq):
    B, ps, P, D = 3, 8, 8, 64
    c = _case(B, Lq, ps, P, Hq, Hkv, D)
    sm = D ** -0.5
    out, _ = paged_prefill_attention(
        c["q"], c["kv"], c["page_table"], c["seq_lens"], c["new_lens"],
        c["layer_idx"], num_slots=c["num_slots"], page_size=ps,
        sm_scale=sm, tq=tq, interpret=True,
    )
    k_ctx, v_ctx = gather_kv(
        c["kv"], c["page_table"], c["layer_idx"], c["num_slots"], ps, D
    )
    ref = attention_xla(
        c["q"], k_ctx, v_ctx, c["positions"], c["seq_lens"], sm
    )
    out, ref = np.asarray(out), np.asarray(ref)
    # compare only live query rows
    for i in range(B):
        n = int(np.asarray(c["new_lens"])[i])
        np.testing.assert_allclose(
            out[i, :n], ref[i, :n], rtol=2e-3, atol=2e-3,
            err_msg=f"row {i}",
        )


def test_prefill_sliding_window_and_cap():
    B, Lq, ps, P, Hq, Hkv, D = 2, 16, 8, 8, 4, 2, 64
    c = _case(B, Lq, ps, P, Hq, Hkv, D, seed=3)
    sm = D ** -0.5
    out, _ = paged_prefill_attention(
        c["q"], c["kv"], c["page_table"], c["seq_lens"], c["new_lens"],
        c["layer_idx"], num_slots=c["num_slots"], page_size=ps,
        sm_scale=sm, sliding_window=12, logit_cap=30.0, tq=8,
        interpret=True,
    )
    k_ctx, v_ctx = gather_kv(
        c["kv"], c["page_table"], c["layer_idx"], c["num_slots"], ps, D
    )
    ref = attention_xla(
        c["q"], k_ctx, v_ctx, c["positions"], c["seq_lens"], sm,
        sliding_window=12, logit_cap=30.0,
    )
    out, ref = np.asarray(out), np.asarray(ref)
    for i in range(B):
        n = int(np.asarray(c["new_lens"])[i])
        np.testing.assert_allclose(
            out[i, :n], ref[i, :n], rtol=2e-3, atol=2e-3
        )


@pytest.mark.parametrize("window", [None, 12])
def test_prefill_attention_sinks(window):
    """GPT-OSS attention sinks through the flash prefill kernel: the
    per-head phantom softmax slot must match the XLA reference, alone
    and combined with a sliding window."""
    B, Lq, ps, P, Hq, Hkv, D = 2, 16, 8, 8, 8, 2, 64
    c = _case(B, Lq, ps, P, Hq, Hkv, D, seed=5)
    sm = D ** -0.5
    rng = np.random.RandomState(7)
    sinks = jnp.asarray(rng.randn(Hq).astype(np.float32) * 2.0)
    out, _ = paged_prefill_attention(
        c["q"], c["kv"], c["page_table"], c["seq_lens"], c["new_lens"],
        c["layer_idx"], num_slots=c["num_slots"], page_size=ps,
        sm_scale=sm, sliding_window=window, sinks=sinks, tq=8,
        interpret=True,
    )
    k_ctx, v_ctx = gather_kv(
        c["kv"], c["page_table"], c["layer_idx"], c["num_slots"], ps, D
    )
    ref = attention_xla(
        c["q"], k_ctx, v_ctx, c["positions"], c["seq_lens"], sm,
        sliding_window=window, sinks=sinks,
    )
    out, ref = np.asarray(out), np.asarray(ref)
    for i in range(B):
        n = int(np.asarray(c["new_lens"])[i])
        np.testing.assert_allclose(
            out[i, :n], ref[i, :n], rtol=2e-3, atol=2e-3
        )
