"""MoE: layer math vs dense reference, Mixtral E2E + HF numerics parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_tpu.layers.moe import moe_block, moe_topk


def _dense_reference(x, gate_w, w1, w3, w2, top_k, norm):
    """Per-token python loop over selected experts (silu)."""
    import scipy.special as sp

    T, H = x.shape
    E = gate_w.shape[-1]
    logits = x @ gate_w
    probs = sp.softmax(logits, axis=-1)
    out = np.zeros_like(x)
    for t in range(T):
        idx = np.argsort(-probs[t])[:top_k]
        w = probs[t][idx]
        if norm:
            w = w / w.sum()
        for e, wt in zip(idx, w):
            h1 = x[t] @ w1[e]
            h3 = x[t] @ w3[e]
            inter = (h1 * sp.expit(h1)) * h3  # silu(h1) * h3
            out[t] += wt * (inter @ w2[e])
    return out


def test_moe_topk_normalization():
    logits = jnp.asarray(np.random.RandomState(0).randn(5, 8).astype(np.float32))
    w, idx = moe_topk(logits, top_k=2, norm_topk_prob=True)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    assert np.asarray(idx).shape == (5, 2)
    w2, _ = moe_topk(logits, top_k=2, norm_topk_prob=False)
    assert np.all(np.asarray(w2).sum(-1) <= 1.0 + 1e-5)


@pytest.mark.parametrize("top_k,norm", [(2, True), (1, False), (3, True)])
def test_moe_block_matches_dense(top_k, norm):
    rng = np.random.RandomState(1)
    B, L, H, I, E = 2, 3, 16, 32, 4
    x = rng.randn(B, L, H).astype(np.float32) * 0.3
    gate_w = rng.randn(H, E).astype(np.float32) * 0.3
    w1 = rng.randn(E, H, I).astype(np.float32) * 0.2
    w3 = rng.randn(E, H, I).astype(np.float32) * 0.2
    w2 = rng.randn(E, I, H).astype(np.float32) * 0.2

    out = moe_block(
        jnp.asarray(x), jnp.asarray(gate_w), jnp.asarray(w1),
        jnp.asarray(w3), jnp.asarray(w2),
        top_k=top_k, norm_topk_prob=norm, hidden_act="silu",
    )
    ref = _dense_reference(
        x.reshape(-1, H), gate_w, w1, w3, w2, top_k, norm
    ).reshape(B, L, H)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


TINY_MOE_HF = {
    "architectures": ["MixtralForCausalLM"],
    "model_type": "mixtral",
    "hidden_size": 64,
    "intermediate_size": 96,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 512,
    "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 257,
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
}


def test_mixtral_engine_e2e():
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path="dummy://tiny-moe",
        tokenizer_path="test:byte",
        load_format="dummy",
        dtype="float32",
        page_size=8,
        max_total_tokens=4096,
        chunked_prefill_size=128,
    )
    cfg = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    out = eng.generate(
        prompt="moe test",
        sampling_params={
            "temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True,
        },
    )
    assert len(out["output_ids"]) == 8
    # deterministic repeat (radix-cache hit path)
    out2 = eng.generate(
        prompt="moe test",
        sampling_params={
            "temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True,
        },
    )
    assert out2["output_ids"] == out["output_ids"]
    eng.shutdown()


@pytest.fixture(scope="module")
def hf_mixtral_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        hidden_size=TINY_MOE_HF["hidden_size"],
        intermediate_size=TINY_MOE_HF["intermediate_size"],
        num_hidden_layers=TINY_MOE_HF["num_hidden_layers"],
        num_attention_heads=TINY_MOE_HF["num_attention_heads"],
        num_key_value_heads=TINY_MOE_HF["num_key_value_heads"],
        head_dim=TINY_MOE_HF["head_dim"],
        vocab_size=TINY_MOE_HF["vocab_size"],
        max_position_embeddings=TINY_MOE_HF["max_position_embeddings"],
        rms_norm_eps=TINY_MOE_HF["rms_norm_eps"],
        rope_theta=TINY_MOE_HF["rope_theta"],
        num_local_experts=TINY_MOE_HF["num_local_experts"],
        num_experts_per_tok=TINY_MOE_HF["num_experts_per_tok"],
        tie_word_embeddings=False,
        bos_token_id=256,
        eos_token_id=257,
    )
    torch.manual_seed(0)
    model = MixtralForCausalLM(cfg).float().eval()
    d = tmp_path_factory.mktemp("hf_tiny_mixtral")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_mixtral_greedy_matches_hf(hf_mixtral_dir):
    import torch
    from transformers import MixtralForCausalLM as HFModel

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    hf_model = HFModel.from_pretrained(
        hf_mixtral_dir, torch_dtype=torch.float32
    ).eval()
    args = ServerArgs(
        model_path=hf_mixtral_dir,
        tokenizer_path="test:byte",
        load_format="safetensors",
        dtype="float32",
        page_size=8,
        max_total_tokens=4096,
    )
    cfg = ModelConfig.from_model_path(hf_mixtral_dir, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)

    prompt_ids = [3, 14, 15, 92, 65, 35]
    n_new = 12
    out = eng.generate(
        input_ids=prompt_ids,
        sampling_params={
            "temperature": 0.0, "max_new_tokens": n_new, "ignore_eos": True,
        },
    )
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt_ids]),
            max_new_tokens=n_new,
            do_sample=False,
            num_beams=1,
        )
    hf_new = hf_out[0][len(prompt_ids):].tolist()
    assert out["output_ids"] == hf_new
    eng.shutdown()


def test_moe_topk_group_limited_routing():
    """DeepSeek n_group/topk_group: experts outside the selected groups
    must never be routed to (reference layers/moe/topk.py noaux_tc)."""
    rng = np.random.RandomState(3)
    T, E, n_group, topk_group, top_k = 16, 16, 4, 2, 4
    logits = jnp.asarray(rng.randn(T, E).astype(np.float32))
    bias = jnp.asarray(rng.randn(E).astype(np.float32) * 0.1)
    w, idx = moe_topk(
        logits, top_k, norm_topk_prob=True, gate_bias=bias,
        scoring="sigmoid", n_group=n_group, topk_group=topk_group,
    )
    idx = np.asarray(idx)
    gsz = E // n_group
    # python reference group selection: top-2-sum of biased sigmoid scores
    import scipy.special as sp
    probs = sp.expit(np.asarray(logits))
    select = probs + np.asarray(bias)
    for t in range(T):
        g_scores = np.sort(select[t].reshape(n_group, gsz), axis=-1)[:, -2:].sum(-1)
        allowed_groups = set(np.argsort(-g_scores)[:topk_group])
        token_groups = set(idx[t] // gsz)
        assert token_groups <= allowed_groups, (t, token_groups, allowed_groups)
    # weights come from UNbiased scores, normalized
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)


def test_moe_topk_group_noop_when_single_group():
    logits = jnp.asarray(np.random.RandomState(0).randn(5, 8).astype(np.float32))
    w1, i1 = moe_topk(logits, 2, n_group=1, topk_group=1)
    w2, i2 = moe_topk(logits, 2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_tbo_in_program_overlap_parity():
    """r05 (r04 VERDICT next #8): REAL two-batch overlap — the extend
    program splits the batch rows in half inside the compiled step so
    half 0's EP all-to-all is graph-independent of half 1's attention
    (XLA's latency-hiding scheduler overlaps them).  Token-exact vs the
    same EP engine without TBO, and the in-program path must engage."""
    import jax

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    prompts = [
        [(7 * i + j) % 250 + 1 for j in range(300)] for i in range(2)
    ]

    def batch_gen(eng):
        # batch submit: both requests are queued before the scheduler
        # steps, so they land in ONE prefill batch (2 rows -> split)
        outs = eng.generate(
            input_ids=[list(p) for p in prompts],
            sampling_params=dict(sp),
        )
        return [o["output_ids"] for o in outs]

    outs = {}
    for name, kw in (
        ("base", dict(tp_size=2, ep_size=2, moe_a2a_backend="a2a")),
        ("tbo", dict(tp_size=2, ep_size=2, moe_a2a_backend="a2a",
                     enable_two_batch_overlap=True,
                     tbo_token_threshold=256)),
    ):
        from tests.conftest import make_server_args

        cfg = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
        args = make_server_args(chunked_prefill_size=1024,
                                max_prefill_tokens=1024, **kw)
        runner = ModelRunner(args, model_config=cfg,
                             devices=jax.devices()[:2])
        eng = Engine(server_args=args, model_runner=runner)
        outs[name] = batch_gen(eng)
        if name == "tbo":
            assert getattr(runner.model, "_tbo_engaged", False), (
                "in-program TBO did not engage"
            )
            assert getattr(eng.scheduler, "num_tbo_splits", 0) >= 1
        eng.shutdown()
    assert outs["tbo"] == outs["base"]
