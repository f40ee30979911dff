"""Numerics: our JAX Llama matches HuggingFace transformers (torch CPU).

Reference analogue: per-model accuracy checks (test/registered/eval/) —
hermetic version: random-weight tiny Llama, greedy continuation must match
HF exactly in float32, logits must agree closely.
"""

import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args, make_tiny_config


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=TINY_HF_CONFIG["hidden_size"],
        intermediate_size=TINY_HF_CONFIG["intermediate_size"],
        num_hidden_layers=TINY_HF_CONFIG["num_hidden_layers"],
        num_attention_heads=TINY_HF_CONFIG["num_attention_heads"],
        num_key_value_heads=TINY_HF_CONFIG["num_key_value_heads"],
        head_dim=TINY_HF_CONFIG["head_dim"],
        vocab_size=TINY_HF_CONFIG["vocab_size"],
        max_position_embeddings=TINY_HF_CONFIG["max_position_embeddings"],
        rms_norm_eps=TINY_HF_CONFIG["rms_norm_eps"],
        rope_theta=TINY_HF_CONFIG["rope_theta"],
        tie_word_embeddings=False,
        bos_token_id=256,
        eos_token_id=257,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model = model.float().eval()
    d = tmp_path_factory.mktemp("hf_tiny")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def pair(hf_model_dir):
    """(our engine w/ HF weights, HF torch model)."""
    import torch
    from transformers import LlamaForCausalLM

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    hf_model = LlamaForCausalLM.from_pretrained(
        hf_model_dir, torch_dtype=torch.float32
    ).eval()

    args = make_server_args(
        model_path=hf_model_dir, load_format="safetensors", dtype="float32"
    )
    cfg = ModelConfig.from_model_path(hf_model_dir, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    yield eng, hf_model
    eng.shutdown()


def hf_greedy(hf_model, input_ids, n):
    import torch

    ids = torch.tensor([input_ids])
    with torch.no_grad():
        out = hf_model.generate(
            ids, max_new_tokens=n, do_sample=False, use_cache=True
        )
    return out[0, len(input_ids) :].tolist()


def test_greedy_matches_hf(pair):
    eng, hf_model = pair
    prompt_ids = [5, 99, 203, 17, 42, 42, 7, 310, 8, 12, 255]
    ours = eng.generate(
        input_ids=prompt_ids,
        sampling_params={"temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True},
    )["output_ids"]
    theirs = hf_greedy(hf_model, prompt_ids, 16)
    assert ours == theirs


def test_greedy_matches_hf_with_chunked_prefill(pair):
    eng, hf_model = pair
    rng = np.random.RandomState(7)
    prompt_ids = rng.randint(0, 256, size=200).tolist()  # > chunk size 64
    ours = eng.generate(
        input_ids=prompt_ids,
        sampling_params={"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True},
    )["output_ids"]
    theirs = hf_greedy(hf_model, prompt_ids, 8)
    assert ours == theirs


def test_greedy_matches_hf_batch(pair):
    eng, hf_model = pair
    rng = np.random.RandomState(11)
    prompts = [rng.randint(0, 256, size=n).tolist() for n in (5, 33, 64, 17)]
    outs = eng.generate(
        input_ids=prompts,
        sampling_params={"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True},
    )
    for p, o in zip(prompts, outs):
        assert o["output_ids"] == hf_greedy(hf_model, p, 8)
