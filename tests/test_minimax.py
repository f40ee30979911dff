"""MiniMax (lightning linear attention + MoE hybrid) — token-exact vs
HF, incl. chunked prefill carrying the linear state and batches."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import make_server_args  # noqa: E402

TINY = dict(
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    vocab_size=512,
    max_position_embeddings=512,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    num_local_experts=4,
    num_experts_per_tok=2,
    layer_types=[
        "linear_attention", "full_attention",
        "linear_attention", "full_attention",
    ],
    block_size=16,
    full_attn_alpha_factor=0.9,
    full_attn_beta_factor=1.1,
    linear_attn_alpha_factor=1.2,
    linear_attn_beta_factor=0.8,
    mlp_alpha_factor=1.05,
    mlp_beta_factor=0.95,
    tie_word_embeddings=False,
    eos_token_id=257,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from transformers import MiniMaxConfig, MiniMaxForCausalLM

    torch.manual_seed(0)
    m = MiniMaxForCausalLM(MiniMaxConfig(**TINY)).float().eval()
    d = tmp_path_factory.mktemp("minimax")
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


def test_minimax_greedy_matches_hf(hf_dir):
    d, hf = hf_dir
    eng, runner = _engine(d)
    try:
        assert runner.kv_pool.geometry.num_layers == 2  # full attn only
        assert set(runner.kv_cache) == {"kv", "rec"}
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


def test_minimax_chunked_prefill_and_batch(hf_dir):
    d, hf = hf_dir
    eng, _ = _engine(d, chunked_prefill_size=16)
    try:
        prompts = [
            [(11 * i + 5 * j) % 500 + 1 for i in range(28 + 9 * j)]
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
