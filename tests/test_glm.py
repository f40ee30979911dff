"""GLM-4: token-exact greedy parity vs HF transformers (float32)."""

import numpy as np
import pytest

from tests.conftest import make_server_args

GLM4_TINY = {
    "architectures": ["Glm4ForCausalLM"],
    "model_type": "glm4",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "partial_rotary_factor": 0.5,
    "attention_bias": True,
    "vocab_size": 512,
    "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "bos_token_id": 256,
    "eos_token_id": 257,
}


@pytest.fixture(scope="module")
def glm_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Glm4Config, Glm4ForCausalLM

    cfg = Glm4Config(
        hidden_size=GLM4_TINY["hidden_size"],
        intermediate_size=GLM4_TINY["intermediate_size"],
        num_hidden_layers=GLM4_TINY["num_hidden_layers"],
        num_attention_heads=GLM4_TINY["num_attention_heads"],
        num_key_value_heads=GLM4_TINY["num_key_value_heads"],
        head_dim=GLM4_TINY["head_dim"],
        partial_rotary_factor=GLM4_TINY["partial_rotary_factor"],
        attention_bias=True,
        vocab_size=GLM4_TINY["vocab_size"],
        max_position_embeddings=GLM4_TINY["max_position_embeddings"],
        rms_norm_eps=GLM4_TINY["rms_norm_eps"],
        rope_theta=GLM4_TINY["rope_theta"],
        tie_word_embeddings=False,
        bos_token_id=256,
        eos_token_id=257,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    model = Glm4ForCausalLM(cfg).float().eval()
    d = tmp_path_factory.mktemp("glm4_tiny")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_glm4_greedy_matches_hf(glm_dir):
    import torch
    from transformers import Glm4ForCausalLM as HFGlm

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    hf_model = HFGlm.from_pretrained(glm_dir, torch_dtype=torch.float32).eval()
    args = make_server_args(
        model_path=glm_dir, load_format="safetensors", dtype="float32"
    )
    cfg = ModelConfig.from_model_path(glm_dir, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        prompt = [5, 99, 203, 17, 42, 7, 310, 8, 12]
        ours = eng.generate(
            input_ids=list(prompt),
            sampling_params={"max_new_tokens": 12, "temperature": 0.0,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            hf_out = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=12, do_sample=False,
                use_cache=True,
            )
        hf_new = hf_out[0, len(prompt):].tolist()
        assert ours["output_ids"] == hf_new, (ours["output_ids"], hf_new)
    finally:
        eng.shutdown()
