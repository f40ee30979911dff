"""BERT-family encoder embedding models (e5/bge class) — numerics vs HF
transformers and the Engine.encode serving path.

Reference parity: srt/models/bert.py BertModel + layers/pooler.py
(mean pooling, normalized)."""

import numpy as np
import pytest

BERT_HF = {
    "architectures": ["BertModel"],
    "model_type": "bert",
    "hidden_size": 64,
    "num_hidden_layers": 3,
    "num_attention_heads": 4,
    "intermediate_size": 128,
    "vocab_size": 512,
    "max_position_embeddings": 128,
    "type_vocab_size": 2,
    "layer_norm_eps": 1e-12,
    "hidden_act": "gelu",
    "pad_token_id": 0,
}


def _save_hf_bert(tmpdir):
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, vocab_size=512,
        max_position_embeddings=128, type_vocab_size=2,
    )
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()
    import safetensors.torch as st

    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    import json

    with open(f"{tmpdir}/config.json", "w") as f:
        json.dump(dict(BERT_HF), f)
    return model


def _jx_engine(model_dir):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import make_server_args

    args = make_server_args(
        model_path=str(model_dir), load_format="safetensors",
        dtype="float32",
    )
    cfg = ModelConfig.from_model_path(str(model_dir), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def test_bert_mean_pooled_embeddings_match_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf_model = _save_hf_bert(tmp_path)
    eng = _jx_engine(tmp_path)
    try:
        rng = np.random.RandomState(0)
        prompts = [
            rng.randint(1, 500, size=n).tolist() for n in (5, 11, 23)
        ]
        outs = eng.encode(input_ids=prompts)
        for ids, out in zip(prompts, outs):
            with torch.no_grad():
                res = hf_model(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
                )
            h = res.last_hidden_state[0].numpy()  # [L, H]
            ref = h.mean(axis=0)
            ref = ref / np.linalg.norm(ref)
            got = np.asarray(out["meta_info"]["embedding"])
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    finally:
        eng.shutdown()


def test_bert_batch_pad_independent(tmp_path):
    pytest.importorskip("torch")
    _save_hf_bert(tmp_path)
    eng = _jx_engine(tmp_path)
    try:
        a = [5, 9, 22, 301]
        b = [7] * 40
        single = eng.encode(input_ids=[a])[0]["meta_info"]["embedding"]
        batched = eng.encode(input_ids=[a, b])[0]["meta_info"]["embedding"]
        np.testing.assert_allclose(single, batched, rtol=1e-5, atol=1e-5)
    finally:
        eng.shutdown()


def test_generate_routes_to_embedding(tmp_path):
    pytest.importorskip("torch")
    _save_hf_bert(tmp_path)
    eng = _jx_engine(tmp_path)
    try:
        out = eng.generate(
            input_ids=[4, 5, 6],
            sampling_params={"max_new_tokens": 8},
        )
        assert out["meta_info"].get("embedding") is not None
    finally:
        eng.shutdown()
