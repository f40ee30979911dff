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
