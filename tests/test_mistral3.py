"""Mistral 3 (Pixtral tower): tower+projector parity and end-to-end
image generation vs HF transformers."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import make_server_args  # noqa: E402

TEXT_TINY = dict(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
    max_position_embeddings=512, rms_norm_eps=1e-5, head_dim=16,
    rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
    sliding_window=None, model_type="mistral",
)
VIS_TINY = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, patch_size=14, image_size=112, head_dim=8,
    rope_theta=10000.0, hidden_act="silu", model_type="pixtral",
)


def _save_hf(tmpdir):
    import safetensors.torch as st
    from transformers import Mistral3Config, Mistral3ForConditionalGeneration

    cfg = Mistral3Config(
        text_config=dict(TEXT_TINY),
        vision_config=dict(VIS_TINY),
        spatial_merge_size=2,
        image_token_index=500,
        multimodal_projector_bias=False,
        projector_hidden_act="gelu",
    )
    torch.manual_seed(0)
    m = Mistral3ForConditionalGeneration(cfg).float().eval()
    sd = {k: v.contiguous() for k, v in m.state_dict().items()}
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    hf_json = {
        "architectures": ["Mistral3ForConditionalGeneration"],
        "model_type": "mistral3",
        "text_config": dict(TEXT_TINY),
        "vision_config": dict(VIS_TINY),
        "spatial_merge_size": 2,
        "image_token_index": 500,
        "eos_token_id": 257,
        "tie_word_embeddings": False,
    }
    with open(f"{tmpdir}/config.json", "w") as f:
        json.dump(hf_json, f)
    return m


def _image(seed=0, hw=(90, 130)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    return Image.fromarray(
        (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)
    )


def test_mistral3_features_match_hf(tmp_path):
    """Tower + projector parity on a NON-SQUARE grid (2D rope + the
    channel-major unfold both bite)."""
    hf = _save_hf(tmp_path)
    import jax.numpy as jnp

    from sglang_tpu.multimodal.pixtral import (
        load_pixtral_vision_params,
        pixtral_preprocess,
        pixtral_project,
        pixtral_vision_forward,
    )

    px, grid = pixtral_preprocess(_image(), 14, 2, 112)
    assert grid[0] != grid[1]
    params = load_pixtral_vision_params(str(tmp_path))
    feats = pixtral_vision_forward(
        params, jnp.asarray(px), grid, num_heads=4, theta=10000.0,
    )
    ours = np.asarray(pixtral_project(params, feats, grid, merge=2))
    with torch.no_grad():
        ref = hf.model.get_image_features(
            torch.tensor(px[None]),
            image_sizes=torch.tensor([[px.shape[1], px.shape[2]]]),
            vision_feature_layer=-1,
        )[0].numpy()
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_mistral3_image_generation_matches_hf(tmp_path):
    hf = _save_hf(tmp_path)
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.multimodal.pixtral import (
        Mistral3Processor,
        pixtral_preprocess,
    )

    img = _image(3)
    px, grid = pixtral_preprocess(img, 14, 2, 112)
    count = (grid[0] // 2) * (grid[1] // 2)

    args = make_server_args(
        model_path=str(tmp_path), load_format="safetensors",
        dtype="float32",
    )
    cfg = ModelConfig.from_model_path(str(tmp_path), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        assert isinstance(eng.mm_processor, Mistral3Processor)
        prompt = [3, 88, 500, 41, 7]
        out = eng.generate(
            input_ids=list(prompt),
            images=[img],
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        hf_ids = [3, 88] + [500] * count + [41, 7]
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([hf_ids]),
                pixel_values=torch.tensor(px[None]),
                image_sizes=torch.tensor([[px.shape[1], px.shape[2]]]),
                max_new_tokens=10, do_sample=False,
            )[0, len(hf_ids):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()
