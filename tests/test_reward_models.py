"""Reward / sequence-classification models via the embedding path."""

import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args


@pytest.fixture(scope="module")
def reward_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForSequenceClassification

    cfg = LlamaConfig(
        hidden_size=TINY_HF_CONFIG["hidden_size"],
        intermediate_size=TINY_HF_CONFIG["intermediate_size"],
        num_hidden_layers=TINY_HF_CONFIG["num_hidden_layers"],
        num_attention_heads=TINY_HF_CONFIG["num_attention_heads"],
        num_key_value_heads=TINY_HF_CONFIG["num_key_value_heads"],
        head_dim=TINY_HF_CONFIG["head_dim"],
        vocab_size=TINY_HF_CONFIG["vocab_size"],
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        num_labels=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    model = LlamaForSequenceClassification(cfg).float().eval()
    d = tmp_path_factory.mktemp("llama_reward")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_reward_scores_match_hf(reward_dir):
    import torch
    from transformers import LlamaForSequenceClassification as HFCls

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    hf = HFCls.from_pretrained(reward_dir, torch_dtype=torch.float32).eval()
    args = make_server_args(
        model_path=reward_dir, load_format="safetensors", dtype="float32"
    )
    cfg = ModelConfig.from_model_path(reward_dir, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        prompt = [5, 99, 203, 17, 42, 7]
        out = eng.encode(input_ids=list(prompt))
        scores = np.asarray(out["meta_info"]["embedding"])
        with torch.no_grad():
            hf_out = hf(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(scores, hf_out, rtol=2e-4, atol=2e-4)
    finally:
        eng.shutdown()
