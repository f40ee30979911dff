"""Gemma 3 multimodal: SigLIP tower + projector parity and end-to-end
image generation (incl. the bidirectional image-span mask) vs HF."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import make_server_args  # noqa: E402

TEXT_TINY = dict(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    vocab_size=512, max_position_embeddings=512, rms_norm_eps=1e-6,
    rope_theta=10000.0, sliding_window=16, sliding_window_pattern=2,
    rope_local_base_freq=10000.0, query_pre_attn_scalar=16,
    hidden_activation="gelu_pytorch_tanh",
)
VIS_TINY = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=56, patch_size=14,
)


def _save_hf(tmpdir):
    import safetensors.torch as st
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    cfg = Gemma3Config(
        text_config=dict(TEXT_TINY),
        vision_config=dict(VIS_TINY),
        mm_tokens_per_image=4,  # 4x4 patch grid pooled 2x2
        image_token_index=500,
        boi_token_index=498,
        eoi_token_index=499,
        tie_word_embeddings=True,
        eos_token_id=257,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    m = Gemma3ForConditionalGeneration(cfg).float().eval()
    sd = {k: v.contiguous() for k, v in m.state_dict().items()}
    sd.pop("lm_head.weight", None)  # tied
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    hf_json = {
        "architectures": ["Gemma3ForConditionalGeneration"],
        "model_type": "gemma3",
        "text_config": dict(
            TEXT_TINY, model_type="gemma3_text", eos_token_id=257,
            tie_word_embeddings=True,
        ),
        "vision_config": dict(VIS_TINY, model_type="siglip_vision_model"),
        "mm_tokens_per_image": 4,
        "image_token_index": 500,
        "eos_token_id": 257,
        "tie_word_embeddings": True,
    }
    with open(f"{tmpdir}/config.json", "w") as f:
        json.dump(hf_json, f)
    return m


def _engine(model_dir):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        model_path=str(model_dir), load_format="safetensors",
        dtype="float32", chunked_prefill_size=256,
    )
    cfg = ModelConfig.from_model_path(str(model_dir), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def _image(seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(56, 56, 3) * 255).astype(np.uint8))


def test_gemma3_tower_and_projector_match_hf(tmp_path):
    hf = _save_hf(tmp_path)
    import jax.numpy as jnp

    from sglang_tpu.multimodal.gemma3 import (
        gemma3_project,
        load_gemma3_vision_params,
        siglip_forward,
        siglip_preprocess,
    )

    px = siglip_preprocess(_image(), 56)
    params = load_gemma3_vision_params(str(tmp_path))
    feats = siglip_forward(
        params, jnp.asarray(px), num_heads=4, patch=14, eps=1e-6
    )
    ours = np.asarray(
        gemma3_project(
            params, feats, patches_per_side=4, tokens_per_side=2,
            eps=1e-6,
        )
    )
    with torch.no_grad():
        pv = torch.tensor(px[None])
        ref = hf.model.get_image_features(pv)[0].numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_gemma3_image_generation_matches_hf(tmp_path):
    """Full path incl. the BIDIRECTIONAL image-span mask: token-exact
    greedy continuation vs HF fed the same pixels and token types."""
    hf = _save_hf(tmp_path)
    from sglang_tpu.multimodal.gemma3 import siglip_preprocess

    img = _image(3)
    eng = _engine(tmp_path)
    try:
        prompt = [3, 88, 498, 500, 499, 41, 7]  # boi, image, eoi
        out = eng.generate(
            input_ids=list(prompt),
            images=[img],
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        hf_ids = [3, 88, 498] + [500] * 4 + [499, 41, 7]
        tti = [1 if t == 500 else 0 for t in hf_ids]
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([hf_ids]),
                pixel_values=torch.tensor(
                    siglip_preprocess(img, 56)[None]
                ),
                token_type_ids=torch.tensor([tti]),
                max_new_tokens=10, do_sample=False,
            )[0, len(hf_ids):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()
