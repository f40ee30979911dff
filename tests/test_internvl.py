"""InternVL: BEiT-style tower + pixel-shuffle projector parity and
end-to-end image generation vs HF transformers."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import make_server_args  # noqa: E402

TEXT_TINY = dict(
    architectures=["Qwen2ForCausalLM"],
    model_type="qwen2",
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
    max_position_embeddings=512, rms_norm_eps=1e-6,
    rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
)
VIS_TINY = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=[56, 56], patch_size=[14, 14],
    norm_type="layer_norm", use_absolute_position_embeddings=True,
    use_qk_norm=False, attention_bias=True, layer_scale_init_value=0.1,
    hidden_act="gelu", use_mean_pooling=True,
)


def _save_hf(tmpdir):
    import safetensors.torch as st
    from transformers import InternVLConfig, InternVLForConditionalGeneration

    cfg = InternVLConfig(
        text_config=dict(TEXT_TINY),
        vision_config=dict(VIS_TINY),
        image_token_id=500,
        downsample_ratio=0.5,
        vision_feature_layer=-1,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(0)
    m = InternVLForConditionalGeneration(cfg).float().eval()
    # layer-scale lambdas init to 0.1 constants; randomize for a real test
    with torch.no_grad():
        for layer in m.model.vision_tower.encoder.layer:
            layer.lambda_1.normal_(0.2, 0.05)
            layer.lambda_2.normal_(0.2, 0.05)
    sd = {k: v.contiguous() for k, v in m.state_dict().items()}
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    hf_json = {
        "architectures": ["InternVLForConditionalGeneration"],
        "model_type": "internvl",
        "text_config": dict(TEXT_TINY),
        "vision_config": dict(VIS_TINY, model_type="internvl_vision"),
        "image_token_id": 500,
        "downsample_ratio": 0.5,
        "eos_token_id": 257,
        "tie_word_embeddings": False,
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


def test_internvl_features_match_hf(tmp_path):
    hf = _save_hf(tmp_path)
    import jax.numpy as jnp

    from sglang_tpu.multimodal.internvl import (
        internvl_preprocess,
        internvl_project,
        internvl_vision_forward,
        load_internvl_vision_params,
    )

    px = internvl_preprocess(_image(), 56)
    params = load_internvl_vision_params(str(tmp_path))
    feats = internvl_vision_forward(
        params, jnp.asarray(px), num_heads=4, patch=14,
        norm_type="layer_norm", eps=1e-6, qk_norm=False,
    )
    ours = np.asarray(
        internvl_project(params, feats, downsample_ratio=0.5)
    )
    with torch.no_grad():
        ref = hf.model.get_image_features(
            torch.tensor(px[None]),
            vision_feature_layer=-1,
            vision_feature_select_strategy="default",
        )[0].numpy()
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_internvl_image_generation_matches_hf(tmp_path):
    hf = _save_hf(tmp_path)
    from sglang_tpu.multimodal.internvl import internvl_preprocess

    img = _image(3)
    eng = _engine(tmp_path)
    try:
        assert eng.mm_processor.n_patches == 4  # (56/14 * 0.5)^2
        prompt = [3, 88, 500, 41, 7]
        out = eng.generate(
            input_ids=list(prompt),
            images=[img],
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        hf_ids = [3, 88] + [500] * 4 + [41, 7]
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([hf_ids]),
                pixel_values=torch.tensor(
                    internvl_preprocess(img, 56)[None]
                ),
                max_new_tokens=10, do_sample=False,
            )[0, len(hf_ids):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()
