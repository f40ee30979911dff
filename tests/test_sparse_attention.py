"""Double-sparsity decode attention (reference
double_sparsity_backend.py role): label-cache page ranking + top-K-page
attention."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args


def test_sparse_decode_selects_hot_pages_exactly():
    """When attention mass lives in a few pages (others near-zero keys),
    the sparse path must match dense attention closely."""
    import jax

    from sglang_tpu.ops.sparse_attention import (
        label_channels,
        sparse_paged_decode,
        write_labels,
    )
    from sglang_tpu.layers.attention import attention_xla

    rng = np.random.RandomState(0)
    B, Hq, Hkv, D, ps, P = 2, 4, 2, 16, 4, 16
    L, NP = 1, 2 * P + 1
    C = P * ps
    seq_lens = np.asarray([C, C - 6], np.int32)
    # keys: near-zero everywhere except 3 hot pages per row whose keys
    # ALIGN with the query (every head's mass concentrates there — the
    # regime double sparsity exploits)
    q = rng.randn(B, 1, Hq, D).astype(np.float32) * 0.5
    k_all = rng.randn(B, C, Hkv, D).astype(np.float32) * 0.01
    hot = {0: [1, 7, 12], 1: [2, 5, 9]}
    G = Hq // Hkv
    for b, pages in hot.items():
        qh = q[b, 0].reshape(Hkv, G, D).sum(1)  # [Hkv, D]
        for pg in pages:
            k_all[b, pg * ps : (pg + 1) * ps] = (
                2.0 * qh[None, :, :]
                + rng.randn(ps, Hkv, D) * 0.05
            )
    v_all = rng.randn(B, C, Hkv, D).astype(np.float32) * 0.3

    # build the paged cache + label cache
    kv_cache = np.zeros((L * NP, ps, 2, Hkv * D), np.float32)
    page_table = np.zeros((B, P), np.int32)
    for b in range(B):
        for pg in range(P):
            page_table[b, pg] = 1 + (b * P + pg) % (NP - 1)
    # write rows (slot j of row b -> page_table[b, j//ps])
    ch = label_channels(D, Hkv, 8)
    labels = jnp.zeros((L * NP, ps, len(ch)), jnp.float32)
    kvb = jnp.asarray(kv_cache)
    from sglang_tpu.layers.attention import write_kv

    for b in range(B):
        slots = page_table[b, np.arange(C) // ps] * ps + np.arange(C) % ps
        kvb = write_kv(
            kvb,
            jnp.asarray(k_all[b : b + 1]),
            jnp.asarray(v_all[b : b + 1]),
            jnp.asarray(slots[None, :C]),
            jnp.int32(0),
            NP * ps,
        )
        labels = write_labels(
            labels, jnp.asarray(k_all[b : b + 1]),
            jnp.asarray(slots[None, :C]), jnp.int32(0), NP, ch,
        )

    # NOTE: shared pages across rows would alias; the table above gives
    # each row distinct pages, mirroring the allocator's guarantee.
    out_sparse = sparse_paged_decode(
        jnp.asarray(q), kvb, labels, jnp.asarray(page_table),
        jnp.asarray(seq_lens), jnp.int32(0),
        num_pages=NP, page_size=ps, sm_scale=1.0, channels=ch,
        top_pages=6,
    )
    positions = (seq_lens - 1)[:, None]
    out_dense = attention_xla(
        jnp.asarray(q), jnp.asarray(k_all), jnp.asarray(v_all),
        jnp.asarray(positions), jnp.asarray(seq_lens), 1.0,
    )
    # the truncated softmax must closely track full attention when the
    # mass is concentrated on the (selected) hot pages
    np.testing.assert_allclose(
        np.asarray(out_sparse), np.asarray(out_dense), rtol=0.1,
        atol=0.1,
    )

    # selection check: replicate the label ranking — every hot page (and
    # the newest page) must be in the top-6
    rows = page_table + 0 * NP
    labels_g = np.asarray(labels)[rows].reshape(B, C, Hkv, 8)
    qg = q[:, 0].reshape(B, Hkv, G, D)
    chh = np.asarray(ch).reshape(Hkv, 8) % D
    q_lab = np.take_along_axis(
        qg, np.broadcast_to(chh[None, :, None, :], (B, Hkv, G, 8)), axis=-1
    )
    approx = np.einsum("bhgr,bchr->bhgc", q_lab, labels_g)
    valid = np.arange(C)[None] < seq_lens[:, None]
    approx = np.where(valid[:, None, None], approx, -1e30)
    pscore = approx.max(axis=(1, 2)).reshape(B, P, ps).max(-1)
    for b in range(B):
        top = set(np.argsort(-pscore[b])[:6].tolist())
        assert set(hot[b]) <= top, (b, sorted(top), hot[b])


@pytest.mark.parametrize("window", [None, 40])
def test_fused_sparse_kernel_matches_xla_sparse(window):
    """fused_sparse_paged_decode (Pallas interpret: fused KV write +
    selected-page DMAs) must match the XLA sparse path given the same
    selection, incl. sliding windows and a short row."""
    from sglang_tpu.layers.attention import write_kv
    from sglang_tpu.ops.sparse_attention import (
        fused_sparse_paged_decode,
        label_channels,
        select_top_pages,
        sparse_paged_decode,
        write_labels,
    )

    rng = np.random.RandomState(42)
    B, Hq, Hkv, D, ps, P = 4, 8, 2, 64, 8, 16
    L, NP = 2, B * P + 8
    num_slots = NP * ps
    C = P * ps
    seq_lens = np.asarray([C, 37, 9, C - 5], np.int32)
    li = jnp.int32(1)

    kvb = jnp.asarray(rng.randn(L * NP, ps, 2, Hkv * D), jnp.float32)
    labels0 = jnp.zeros((L * NP, ps, Hkv * 8), jnp.float32)
    page_table = (
        rng.permutation(NP - 1)[: B * P].reshape(B, P) + 1
    ).astype(np.int32)
    ch = label_channels(D, Hkv, 8)

    # fill history (all but the newest token) + labels for ALL slots
    labels = labels0
    hist_k = rng.randn(B, C, Hkv, D).astype(np.float32)
    hist_v = rng.randn(B, C, Hkv, D).astype(np.float32)
    for b in range(B):
        n = int(seq_lens[b]) - 1
        if n <= 0:
            continue
        slots = page_table[b, np.arange(n) // ps] * ps + np.arange(n) % ps
        kvb = write_kv(
            kvb, jnp.asarray(hist_k[b : b + 1, :n]),
            jnp.asarray(hist_v[b : b + 1, :n]),
            jnp.asarray(slots[None]), li, num_slots,
        )
        labels = write_labels(
            labels, jnp.asarray(hist_k[b : b + 1, :n]),
            jnp.asarray(slots[None]), li, NP, ch,
        )

    q = jnp.asarray(rng.randn(B, 1, Hq, D).astype(np.float32) * 0.3)
    k_new = jnp.asarray(rng.randn(B, 1, Hkv, D).astype(np.float32))
    v_new = jnp.asarray(rng.randn(B, 1, Hkv, D).astype(np.float32))
    out_slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = int(seq_lens[b]) - 1
        out_slots[b, 0] = page_table[b, pos // ps] * ps + pos % ps
    out_slots = jnp.asarray(out_slots)

    # reference: XLA write + label write + XLA sparse attention
    kv_ref = write_kv(kvb, k_new, v_new, out_slots, li, num_slots)
    labels = write_labels(labels, k_new, out_slots, li, NP, ch)
    ref = sparse_paged_decode(
        q, kv_ref, labels, jnp.asarray(page_table),
        jnp.asarray(seq_lens), li, num_pages=NP, page_size=ps,
        sm_scale=D ** -0.5, channels=ch, top_pages=6,
        sliding_window=window,
    )
    # kernel: same selection, fused write + selected-page DMAs
    sel = select_top_pages(
        q, labels, jnp.asarray(page_table), jnp.asarray(seq_lens), li,
        num_pages=NP, page_size=ps, channels=ch, top_pages=6, hkv=Hkv,
        sliding_window=window,
    )
    out, kv_out = fused_sparse_paged_decode(
        q, k_new, v_new, kvb, jnp.asarray(page_table), sel, out_slots,
        jnp.asarray(seq_lens), li, num_slots=num_slots, page_size=ps,
        sm_scale=D ** -0.5, sliding_window=window, interpret=True,
    )
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )
    # the fused write must land the same cache rows as the XLA scatter
    np.testing.assert_allclose(
        np.asarray(kv_out), np.asarray(kv_ref), rtol=1e-6, atol=1e-6
    )


def _engine(**overrides):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(**overrides)
    cfg = ModelConfig.from_hf_dict(
        TINY_HF_CONFIG, model_path="test://tiny", dtype="float32"
    )
    return Engine(
        server_args=args,
        model_runner=ModelRunner(args, model_config=cfg),
    )


def test_ds_engine_exact_when_topk_covers_all():
    """With ds_top_pages >= every request's page count the selection is
    total — outputs must be token-exact vs the dense engine."""
    ds = _engine(enable_double_sparsity=True, ds_top_pages=64,
                 disable_radix_cache=True)
    ref = _engine(disable_radix_cache=True)
    try:
        prompt = [(3 * i) % 500 + 1 for i in range(40)]
        sp = {"temperature": 0.0, "max_new_tokens": 24, "ignore_eos": True}
        o1 = ds.generate(input_ids=list(prompt), sampling_params=dict(sp))
        o2 = ref.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert o1["output_ids"] == o2["output_ids"]
    finally:
        ds.shutdown()
        ref.shutdown()


def test_ds_engine_pallas_matches_xla(monkeypatch):
    """With 128-aligned KV lanes the ds engine serves on the fused
    sparse kernel (interpret here); it must match the forced-XLA sparse
    engine token-exactly (same selection, same participating pages)."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    hf = dict(TINY_HF_CONFIG)
    hf.update(head_dim=64, hidden_size=128)

    def build(force_xla):
        if force_xla:
            monkeypatch.setenv("SGLANG_TPU_FORCE_XLA_ATTENTION", "1")
        else:
            monkeypatch.delenv("SGLANG_TPU_FORCE_XLA_ATTENTION",
                               raising=False)
            monkeypatch.setenv("SGLANG_TPU_INTERPRET_PALLAS", "1")
        args = make_server_args(
            enable_double_sparsity=True, ds_top_pages=4,
            disable_radix_cache=True, dtype="float32",
        )
        cfg = ModelConfig.from_hf_dict(hf, dtype="float32")
        runner = ModelRunner(args, model_config=cfg)
        return Engine(server_args=args, model_runner=runner), runner

    prompt = [(7 * i) % 500 + 1 for i in range(120)]  # 30 pages > top 4
    sp = {"temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True}
    ep, rp = build(force_xla=False)
    try:
        assert rp.attn_backend == "pallas"
        out_p = ep.generate(input_ids=list(prompt), sampling_params=dict(sp))
    finally:
        ep.shutdown()
    ex, rx = build(force_xla=True)
    try:
        assert rx.attn_backend == "xla"
        out_x = ex.generate(input_ids=list(prompt), sampling_params=dict(sp))
    finally:
        ex.shutdown()
    assert out_p["output_ids"] == out_x["output_ids"], (
        out_p["output_ids"], out_x["output_ids"],
    )


def test_ds_engine_sparse_path_engages():
    """A long context with small ds_top_pages runs through the sparse
    program (page count bucket > top_pages) and still serves."""
    ds = _engine(enable_double_sparsity=True, ds_top_pages=4,
                 disable_radix_cache=True)
    try:
        prompt = [(7 * i) % 500 + 1 for i in range(120)]  # 30 pages
        out = ds.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": 16,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 16
        runner = ds.scheduler.runner
        assert isinstance(runner.kv_cache, dict)
    finally:
        ds.shutdown()
