"""Mamba2 SSM family (SURVEY §2.2 'Mamba kernels' row): state-pool
serving, chunked-prefill state carry, HF token-exact numerics."""

import json

import numpy as np
import pytest

from tests.conftest import make_server_args

MAMBA_HF = {
    "architectures": ["Mamba2ForCausalLM"],
    "model_type": "mamba2",
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "state_size": 16,
    "num_heads": 4,
    "head_dim": 16,
    "expand": 1,
    "n_groups": 1,
    "conv_kernel": 4,
    "vocab_size": 512,
    "layer_norm_epsilon": 1e-5,
    "tie_word_embeddings": True,
    "eos_token_id": 257,
    "max_position_embeddings": 1024,
}


def _save_hf(tmpdir):
    import torch
    from transformers import Mamba2Config, Mamba2ForCausalLM

    cfg = Mamba2Config(
        hidden_size=64, num_hidden_layers=2, state_size=16, num_heads=4,
        head_dim=16, expand=1, n_groups=1, conv_kernel=4, vocab_size=512,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    m = Mamba2ForCausalLM(cfg)
    m.eval()
    import safetensors.torch as st

    sd = {
        k: v.contiguous()
        for k, v in m.state_dict().items()
        if k != "lm_head.weight"  # tied to the embedding
    }
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    with open(f"{tmpdir}/config.json", "w") as f:
        json.dump(dict(MAMBA_HF), f)
    return m


def _engine(model_dir, **overrides):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        model_path=str(model_dir), load_format="safetensors",
        dtype="float32", **overrides,
    )
    cfg = ModelConfig.from_model_path(str(model_dir), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def test_mamba2_greedy_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    eng = _engine(tmp_path)
    try:
        assert eng.scheduler.runner.server_args.disable_radix_cache
        prompt = [3, 88, 41, 7, 205, 19, 66, 12, 301, 4]
        out = eng.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": 16,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=16, do_sample=False,
            )[0, len(prompt):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


def test_mamba2_chunked_prefill_state_carry(tmp_path):
    """A prompt longer than chunked_prefill_size streams through in
    chunks; the SSM state carries across chunks, so the output equals
    the HF full-prompt result."""
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    eng = _engine(tmp_path, chunked_prefill_size=16)
    try:
        rng = np.random.RandomState(2)
        prompt = rng.randint(1, 500, size=53).tolist()
        out = eng.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": 12,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=12, do_sample=False,
            )[0, len(prompt):].tolist()
        assert out["output_ids"] == ref
    finally:
        eng.shutdown()


def test_mamba2_batched_requests_isolated(tmp_path):
    """Concurrent requests use distinct state slots: batched greedy
    outputs equal each prompt generated alone."""
    pytest.importorskip("torch")
    _save_hf(tmp_path)
    eng = _engine(tmp_path)
    try:
        prompts = [
            [5, 9, 203, 17],
            [44, 45, 46, 47, 48, 49, 50],
            [7] * 12,
        ]
        sp = {"temperature": 0.0, "max_new_tokens": 10, "ignore_eos": True}
        batched = eng.generate(input_ids=prompts, sampling_params=sp)
        for p, ob in zip(prompts, batched):
            alone = eng.generate(input_ids=list(p), sampling_params=dict(sp))
            assert ob["output_ids"] == alone["output_ids"]
    finally:
        eng.shutdown()


def test_mamba2_multi_chunk_ssd_prefill(tmp_path):
    """A prompt spanning multiple SSD chunks (L bucket 128 -> two
    64-step chunks, with in-chunk padding) stays token-exact vs HF —
    validates the chunked state-space-duality math incl. the chunk
    boundary state carry."""
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    eng = _engine(tmp_path, chunked_prefill_size=256)
    try:
        rng = np.random.RandomState(7)
        prompt = rng.randint(1, 500, size=101).tolist()
        out = eng.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=10, do_sample=False,
            )[0, len(prompt):].tolist()
        assert out["output_ids"] == ref
    finally:
        eng.shutdown()


def test_mamba2_recycled_state_slots_deterministic(tmp_path):
    """State slots are recycled page ids: a FRESH request whose slot was
    used by a finished request must start from zero conv/SSM state, not
    the dead request's (r05 on-chip find — the second identical drive
    diverged because prefill read the recycled slot's dirty state).
    Identical prompts must produce identical outputs across sequential
    waves through one engine."""
    pytest.importorskip("torch")
    _save_hf(tmp_path)
    eng = _engine(tmp_path)
    sp = {"temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True}
    prompts = [[(7 * i + s) % 500 + 1 for i in range(9 + s)] for s in range(3)]
    try:
        wave1 = [
            eng.generate(input_ids=list(p), sampling_params=dict(sp))[
                "output_ids"
            ]
            for p in prompts
        ]
        wave2 = [
            eng.generate(input_ids=list(p), sampling_params=dict(sp))[
                "output_ids"
            ]
            for p in prompts
        ]
        assert wave1 == wave2
    finally:
        eng.shutdown()
