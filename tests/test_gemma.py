"""Gemma2 numerics vs HF transformers + Gemma3 structural smoke."""

import numpy as np
import pytest

TINY_GEMMA2 = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,  # even+odd → exercises alternating windows
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    vocab_size=512,
    max_position_embeddings=512,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    sliding_window=32,
    query_pre_attn_scalar=16,
    attn_logit_softcapping=50.0,
    final_logit_softcapping=30.0,
    hidden_act="gelu_pytorch_tanh",
    bos_token_id=256,
    eos_token_id=257,
)


@pytest.fixture(scope="module")
def hf_gemma2_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(tie_word_embeddings=True, **TINY_GEMMA2)
    torch.manual_seed(0)
    model = Gemma2ForCausalLM(cfg).float().eval()
    d = tmp_path_factory.mktemp("hf_tiny_gemma2")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_gemma2_greedy_matches_hf(hf_gemma2_dir):
    import torch
    from transformers import Gemma2ForCausalLM as HFModel

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    hf_model = HFModel.from_pretrained(
        hf_gemma2_dir, torch_dtype=torch.float32, attn_implementation="eager"
    ).eval()
    args = ServerArgs(
        model_path=hf_gemma2_dir,
        tokenizer_path="test:byte",
        load_format="safetensors",
        dtype="float32",
        page_size=8,
        max_total_tokens=4096,
    )
    cfg = ModelConfig.from_model_path(hf_gemma2_dir, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)

    # Long enough that the sliding window (32) actually truncates.
    rng = np.random.RandomState(0)
    prompt_ids = rng.randint(1, 250, size=48).tolist()
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


def test_gemma3_structure():
    """Gemma3 per-layer window/rope pattern (no HF weights needed)."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.models.gemma import Gemma3ForCausalLM

    hf = {
        "architectures": ["Gemma3ForCausalLM"],
        "model_type": "gemma3_text",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 12,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "vocab_size": 512,
        "max_position_embeddings": 1024,
        "rms_norm_eps": 1e-6,
        "rope_theta": 1000000.0,
        "rope_local_base_freq": 10000.0,
        "sliding_window": 64,
        "sliding_window_pattern": 6,
        "query_pre_attn_scalar": 16,
        "tie_word_embeddings": True,
        "eos_token_id": 257,
    }
    cfg = ModelConfig.from_hf_dict(hf, dtype="float32")
    model = Gemma3ForCausalLM(cfg)
    win = model.per_layer_window()
    assert win.tolist() == [64, 64, 64, 64, 64, 0] * 2
    inv = model.per_layer_inv_freq()
    assert inv.shape[0] == 12
    # global layers (5, 11) use theta 1e6 → smaller inv freq tail
    assert inv[5][-1] < inv[0][-1]
    assert np.allclose(inv[5], inv[11])

    # end-to-end with dummy weights on the CPU mesh
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path="dummy://tiny-gemma3",
        tokenizer_path="test:byte",
        load_format="dummy",
        dtype="float32",
        page_size=8,
        max_total_tokens=4096,
    )
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    out = eng.generate(
        prompt="gemma3",
        sampling_params={
            "temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True,
        },
    )
    assert len(out["output_ids"]) == 6
    eng.shutdown()
