"""GPT-OSS family: attention sinks + alternating windows + YaRN + MoE
(clamped swiglu, top-k softmax router) — token-exact vs HF transformers;
harmony channel parsing."""

import json

import numpy as np
import pytest

from tests.conftest import make_server_args

OSS_HF = {
    "architectures": ["GptOssForCausalLM"],
    "model_type": "gpt_oss",
    "hidden_size": 64,
    "intermediate_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
    "vocab_size": 512,
    "sliding_window": 16,
    "max_position_embeddings": 256,
    "rms_norm_eps": 1e-5,
    "rope_theta": 150000.0,
    "rope_scaling": {
        "rope_type": "yarn", "factor": 32.0, "beta_fast": 32.0,
        "beta_slow": 1.0, "truncate": False,
        "original_max_position_embeddings": 4096,
    },
    "layer_types": ["sliding_attention", "full_attention"],
    "tie_word_embeddings": False,
    "eos_token_id": 257,
    "hidden_act": "silu",
}


def _save_hf(tmpdir):
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM

    cfg = GptOssConfig(
        hidden_size=64, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=2, vocab_size=512,
        sliding_window=16, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = GptOssForCausalLM(cfg).float().eval()
    import safetensors.torch as st

    sd = {k: v.contiguous() for k, v in m.state_dict().items()}
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    with open(f"{tmpdir}/config.json", "w") as f:
        json.dump(dict(OSS_HF), f)
    return m


def test_gpt_oss_greedy_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        model_path=str(tmp_path), load_format="safetensors",
        dtype="float32",
    )
    cfg = ModelConfig.from_model_path(str(tmp_path), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        model = runner.model
        assert model.rope_mscale != 1.0  # yarn attention factor applied
        assert (model.per_layer_window() == [16, 0]).all()
        # long enough to exercise the sliding layer's window (> 16 ctx)
        prompt = [(7 * i) % 500 + 1 for i in range(24)]
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


def test_gpt_oss_pallas_matches_xla(monkeypatch):
    """With 128-aligned KV lanes (Hkv*D = 2*64) GPT-OSS serves on the
    Pallas kernels — sinks + alternating sliding windows ride the fused
    decode/prefill paths (interpret mode here) and must match the forced
    XLA engine token-exactly on identical dummy weights."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    hf = dict(OSS_HF)
    hf.update(head_dim=64, hidden_size=128)

    def build(force_xla):
        if force_xla:
            monkeypatch.setenv("SGLANG_TPU_FORCE_XLA_ATTENTION", "1")
        else:
            monkeypatch.delenv("SGLANG_TPU_FORCE_XLA_ATTENTION",
                               raising=False)
            monkeypatch.setenv("SGLANG_TPU_INTERPRET_PALLAS", "1")
        args = make_server_args(dtype="float32")
        cfg = ModelConfig.from_hf_dict(hf, dtype="float32")
        runner = ModelRunner(args, model_config=cfg)
        return Engine(server_args=args, model_runner=runner), runner

    prompt = [(7 * i) % 500 + 1 for i in range(24)]
    sp = {"temperature": 0.0, "max_new_tokens": 12, "ignore_eos": True}
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


def test_harmony_channel_parsing():
    from sglang_tpu.parsers.reasoning import HarmonyParser, reasoning_parser_for

    text = (
        "<|channel|>analysis<|message|>Let me think about this."
        "<|end|><|start|>assistant<|channel|>final<|message|>"
        "The answer is 42."
    )
    reasoning, final = HarmonyParser().parse(text)
    assert reasoning == "Let me think about this."
    assert final == "The answer is 42."
    # plain text passes through
    r, c = HarmonyParser().parse("just an answer")
    assert r == "" and c == "just an answer"
    assert isinstance(reasoning_parser_for("gpt-oss"), HarmonyParser)
