"""NSA / InfLLM-v2 block-sparse attention (ops/nsa_attention.py).

Reference role: srt/layers/attention/nsa_backend.py +
sgl-kernel/csrc/infllm_v2/ — pooled-key block summaries, top-K page
selection for BOTH decode and prefill.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args

from sglang_tpu.ops.nsa_attention import (
    nsa_prefill_attention,
    nsa_select_decode,
    nsa_select_prefill,
    update_pooled,
)


def _mk_cache(rng, L, NP, ps, Hkv, D):
    return rng.randn(L * NP, ps, 2, Hkv * D).astype(np.float32) * 0.3


def test_update_pooled_matches_numpy_means():
    rng = np.random.RandomState(0)
    L, NP, ps, Hkv, D = 2, 16, 4, 2, 8
    kv = _mk_cache(rng, L, NP, ps, Hkv, D)
    pooled = np.zeros((L * NP, Hkv * D), np.float32)
    # row 0: tokens 0..9 written (pages 3, 5, 7 in the table)
    pt = np.zeros((2, 8), np.int32)
    pt[0, :3] = [3, 5, 7]
    positions = np.zeros((2, 12), np.int32)
    positions[0, :10] = np.arange(10)
    seq_lens = np.asarray([10, 0], np.int32)  # row 1 padded
    li = jnp.int32(1)
    out = np.asarray(
        update_pooled(
            jnp.asarray(pooled), jnp.asarray(kv), jnp.asarray(pt),
            jnp.asarray(positions), jnp.asarray(seq_lens), li,
            num_pages=NP, page_size=ps,
        )
    )
    # pages 3 and 5 are full (4 valid slots), page 7 holds 2
    for o, pg, n in ((0, 3, 4), (1, 5, 4), (2, 7, 2)):
        row = 1 * NP + pg
        want = kv[row, :n, 0].mean(axis=0)
        np.testing.assert_allclose(out[row], want, rtol=1e-5, atol=1e-6)
    # untouched rows stay zero (incl. all of layer 0)
    assert np.abs(out[: 1 * NP]).max() == 0.0
    assert np.abs(out[1 * NP + 4]).max() == 0.0


def test_select_decode_finds_hot_page():
    """A page whose keys align with q must rank into the selection."""
    rng = np.random.RandomState(1)
    L, NP, ps, Hkv, D = 1, 32, 4, 1, 16
    Hq = 2
    P = 16
    kv = _mk_cache(rng, L, NP, ps, Hkv, D) * 0.01
    q = rng.randn(1, 1, Hq, D).astype(np.float32)
    pt = np.zeros((1, P), np.int32)
    pt[0, :14] = np.arange(1, 15)
    hot_ord = 6  # page ordinal whose keys point along q head 0
    kv[pt[0, hot_ord], :, 0, :D] = q[0, 0, 0] * 3.0
    pooled = np.zeros((L * NP, Hkv * D), np.float32)
    positions = np.arange(56, dtype=np.int32)[None]
    pooled = update_pooled(
        jnp.asarray(pooled), jnp.asarray(kv), jnp.asarray(pt),
        jnp.asarray(positions), jnp.asarray([56], np.int32),
        jnp.int32(0), num_pages=NP, page_size=ps,
    )
    sel = np.asarray(
        nsa_select_decode(
            jnp.asarray(q), pooled, jnp.asarray(pt),
            jnp.asarray([56], np.int32), jnp.int32(0),
            num_pages=NP, page_size=ps, top_pages=4,
        )
    )
    assert hot_ord in sel[0], sel


def _dense_ref(q, kv, pt, seq, new, li, NP, ps, scale):
    """Numpy dense causal attention over the paged context."""
    B, Lq, Hq, D = q.shape
    Hkv = kv.shape[-1] // D
    G = Hq // Hkv
    P = pt.shape[1]
    outs = np.zeros_like(q)
    for b in range(B):
        rows = pt[b] + li * NP
        k = kv[rows][:, :, 0].reshape(P * ps, Hkv, D)
        v = kv[rows][:, :, 1].reshape(P * ps, Hkv, D)
        pos0 = seq[b] - new[b]
        for i in range(new[b]):
            qp = pos0 + i
            for h in range(Hq):
                s = (k[:, h // G] @ q[b, i, h]) * scale
                s[np.arange(P * ps) > qp] = -1e30
                s[np.arange(P * ps) >= seq[b]] = -1e30
                p = np.exp(s - s.max())
                p /= p.sum()
                outs[b, i, h] = p @ v[:, h // G]
    return outs


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_nsa_prefill_full_selection_matches_dense(backend):
    """Ksel = P (every page selected) ⇒ exact dense equivalence, on
    both the XLA fallback and the Pallas kernel (interpret)."""
    rng = np.random.RandomState(2)
    L, NP, ps, Hkv, D = 2, 32, 4, 1, 16
    Hq, B, Lq = 2, 2, 16
    P = 8
    kv = _mk_cache(rng, L, NP, ps, Hkv, D)
    q = rng.randn(B, Lq, Hq, D).astype(np.float32) * 0.4
    pt = np.zeros((B, P), np.int32)
    pt[0] = np.arange(1, 9)
    pt[1] = np.arange(9, 17)
    seq = np.asarray([28, 13], np.int32)
    new = np.asarray([16, 5], np.int32)
    li = jnp.int32(1)
    tile_q = 8
    sel = np.broadcast_to(
        np.arange(P, dtype=np.int32)[None, None], (B, Lq // tile_q, P)
    )
    out = np.asarray(
        nsa_prefill_attention(
            jnp.asarray(q), jnp.asarray(kv), jnp.asarray(pt),
            jnp.asarray(sel), jnp.asarray(seq), jnp.asarray(new), li,
            num_slots=NP * ps, page_size=ps, sm_scale=0.25,
            tile_q=tile_q, backend=backend, interpret=True,
        )
    )
    ref = _dense_ref(q, kv, pt, seq, new, 1, NP, ps, 0.25)
    for b in range(B):
        np.testing.assert_allclose(
            out[b, : new[b]], ref[b, : new[b]], rtol=2e-5, atol=2e-5
        )


def test_nsa_select_prefill_forces_diagonal_and_sink():
    rng = np.random.RandomState(3)
    NP, ps, Hkv, D = 64, 4, 1, 16
    Hq, B, Lq = 2, 1, 32
    P = 16
    pooled = rng.randn(NP, Hkv * D).astype(np.float32) * 0.01
    q = rng.randn(B, Lq, Hq, D).astype(np.float32)
    pt = np.zeros((B, P), np.int32)
    pt[0] = np.arange(1, 17)
    seq = np.asarray([64], np.int32)
    new = np.asarray([32], np.int32)  # queries at positions 32..63
    sel = np.asarray(
        nsa_select_prefill(
            jnp.asarray(q), jnp.asarray(pooled), jnp.asarray(pt),
            jnp.asarray(seq), jnp.asarray(new), jnp.int32(0),
            num_pages=NP, page_size=ps, top_pages=6, tile_q=16,
        )
    )  # [1, 2, 6]
    # tile 0 covers positions 32..47 → diagonal ordinals 8..11
    for o in (8, 9, 10, 11, 0):
        assert o in sel[0, 0], (o, sel)
    # tile 1 covers positions 48..63 → diagonal ordinals 12..15
    for o in (12, 13, 14, 15, 0):
        assert o in sel[0, 1], (o, sel)


# ---------------------------------------------------------------- engine

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


def test_nsa_engine_exact_when_topk_covers_all(monkeypatch):
    """Selection total (top_pages ≥ every valid page) with the sparse
    kernels ENGAGED (interpret) ⇒ token-exact vs the dense engine."""
    monkeypatch.setenv("SGLANG_TPU_INTERPRET_PALLAS", "1")
    nsa = _engine(enable_nsa=True, nsa_top_pages=24,
                  disable_radix_cache=True)
    monkeypatch.delenv("SGLANG_TPU_INTERPRET_PALLAS")
    ref = _engine(disable_radix_cache=True)
    try:
        assert getattr(nsa.scheduler.runner.model, "_nsa", None)
        assert isinstance(nsa.scheduler.runner.kv_cache, dict)
        assert "pooled" in nsa.scheduler.runner.kv_cache
        prompt = [(3 * i) % 500 + 1 for i in range(40)]  # 10 pages
        sp = {"temperature": 0.0, "max_new_tokens": 24, "ignore_eos": True}
        o1 = nsa.generate(input_ids=list(prompt), sampling_params=dict(sp))
        o2 = ref.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert o1["output_ids"] == o2["output_ids"], (
            o1["output_ids"], o2["output_ids"])
    finally:
        nsa.shutdown()
        ref.shutdown()


def test_nsa_engine_sparse_path_engages(monkeypatch):
    """Long context, small top_pages: decode AND prefill run the
    block-sparse programs and still serve."""
    monkeypatch.setenv("SGLANG_TPU_INTERPRET_PALLAS", "1")
    eng = _engine(enable_nsa=True, nsa_top_pages=4,
                  disable_radix_cache=True, chunked_prefill_size=64)
    try:
        prompt = [(7 * i) % 500 + 1 for i in range(150)]  # 38 pages
        out = eng.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": 12,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 12
        assert all(0 <= t < 512 for t in out["output_ids"])
    finally:
        eng.shutdown()
