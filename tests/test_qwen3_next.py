"""Qwen3-Next hybrid (GatedDeltaNet + full attention + MoE) — token-exact
vs HF transformers, incl. chunked prefill carrying the recurrent state."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import make_server_args  # noqa: E402

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,  # 3 linear + 1 full (default interval 4)
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    vocab_size=512,
    max_position_embeddings=512,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    partial_rotary_factor=0.25,
    linear_num_key_heads=2,
    linear_num_value_heads=4,
    linear_key_head_dim=16,
    linear_value_head_dim=16,
    linear_conv_kernel_dim=4,
    num_experts=4,
    num_experts_per_tok=2,
    decoder_sparse_step=1,
    moe_intermediate_size=48,
    shared_expert_intermediate_size=32,
    norm_topk_prob=True,
    tie_word_embeddings=False,
    eos_token_id=257,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    torch.manual_seed(0)
    m = Qwen3NextForCausalLM(Qwen3NextConfig(**TINY)).float().eval()
    d = tmp_path_factory.mktemp("qwen3next")
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def _engine(model_dir, **extra):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        model_path=model_dir, load_format="safetensors", dtype="float32",
        **extra,
    )
    cfg = ModelConfig.from_model_path(model_dir, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner), runner


def test_qwen3_next_greedy_matches_hf(hf_dir):
    d, hf = hf_dir
    eng, runner = _engine(d)
    try:
        # hybrid cache: paged KV sized to the 1 full-attention layer,
        # plus conv + recurrent state pools for the 3 linear layers
        assert runner.kv_pool.geometry.num_layers == 1
        assert set(runner.kv_cache) == {"kv", "conv", "rec"}
        assert runner.kv_cache["conv"].shape[0] == 3
        prompt = [(7 * i) % 500 + 1 for i in range(20)]
        out = eng.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": 12,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=12, do_sample=False,
            )[0, len(prompt):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


def test_qwen3_next_chunked_prefill_and_batch(hf_dir):
    """Chunked prefill must carry conv + recurrent state across chunks;
    batched requests use distinct state slots."""
    d, hf = hf_dir
    eng, _ = _engine(d, chunked_prefill_size=16)
    try:
        prompts = [
            [(11 * i + 3 * j) % 500 + 1 for i in range(30 + 7 * j)]
            for j in range(3)
        ]
        outs = eng.generate(
            input_ids=[list(p) for p in prompts],
            sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            for p, o in zip(prompts, outs):
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=8, do_sample=False,
                )[0, len(p):].tolist()
                assert o["output_ids"] == ref, (o["output_ids"], ref)
    finally:
        eng.shutdown()


def test_chunked_gdn_equals_recurrence():
    """The chunked WY gated delta rule must equal the per-token
    recurrence bit-for-bit up to f32 tolerance, incl. non-multiple
    lengths and padded (g=0, beta=0) tail rows."""
    import jax.numpy as jnp

    from sglang_tpu.models.qwen3_next import _chunked_gdn, _l2norm

    rng = np.random.RandomState(3)
    B, T, Hn, dk, dv = 2, 48, 3, 16, 16
    q = _l2norm(jnp.asarray(rng.randn(B, T, Hn, dk), jnp.float32)) * (
        dk ** -0.5
    )
    k = _l2norm(jnp.asarray(rng.randn(B, T, Hn, dk), jnp.float32))
    v = jnp.asarray(rng.randn(B, T, Hn, dv), jnp.float32)
    g = jnp.asarray(-np.abs(rng.randn(B, T, Hn)), jnp.float32)
    beta = jnp.asarray(
        1.0 / (1.0 + np.exp(-rng.randn(B, T, Hn))), jnp.float32
    )
    # padded tail: exact no-ops
    g = g.at[:, -5:].set(0.0)
    beta = beta.at[:, -5:].set(0.0)
    S0 = jnp.asarray(rng.randn(B, Hn, dk, dv) * 0.1, jnp.float32)

    yc, Sc = _chunked_gdn(q, k, v, g, beta, S0, chunk=16)

    # sequential reference
    S = np.asarray(S0)
    ys = np.zeros((B, T, Hn, dv), np.float32)
    qn, kn, vn = np.asarray(q), np.asarray(k), np.asarray(v)
    gn, bn = np.asarray(g), np.asarray(beta)
    for t in range(T):
        S = S * np.exp(gn[:, t])[..., None, None]
        kv_mem = np.einsum("bhkv,bhk->bhv", S, kn[:, t])
        delta = (vn[:, t] - kv_mem) * bn[:, t][..., None]
        S = S + kn[:, t][..., None] * delta[..., None, :]
        ys[:, t] = np.einsum("bhkv,bhk->bhv", S, qn[:, t])
    np.testing.assert_allclose(np.asarray(yc), ys, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Sc), S, rtol=2e-4, atol=2e-4)
