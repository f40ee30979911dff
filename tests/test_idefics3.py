"""Idefics3 / SmolVLM: SigLIP tower + pixel-shuffle connector — feature
parity and end-to-end image generation vs HF transformers."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import make_server_args  # noqa: E402

TEXT_TINY = dict(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
    max_position_embeddings=512, rms_norm_eps=1e-5,
    rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
    model_type="llama",
)
VIS_TINY = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, patch_size=14, image_size=112,
    layer_norm_eps=1e-6, hidden_act="gelu_pytorch_tanh",
)


def _save_hf(tmpdir, arch="Idefics3ForConditionalGeneration"):
    import safetensors.torch as st

    if arch.startswith("Idefics3"):
        from transformers import (
            Idefics3Config as Cfg,
            Idefics3ForConditionalGeneration as Mdl,
        )

        mt = "idefics3"
    else:
        from transformers import (
            SmolVLMConfig as Cfg,
            SmolVLMForConditionalGeneration as Mdl,
        )

        mt = "smolvlm"
    cfg = Cfg(
        text_config=dict(TEXT_TINY),
        vision_config=dict(VIS_TINY),
        scale_factor=2,
        image_token_id=500,
    )
    torch.manual_seed(0)
    m = Mdl(cfg).float().eval()
    sd = {k: v.contiguous() for k, v in m.state_dict().items()}
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    hf_json = {
        "architectures": [arch],
        "model_type": mt,
        "text_config": dict(TEXT_TINY),
        "vision_config": dict(VIS_TINY),
        "scale_factor": 2,
        "image_token_id": 500,
        "eos_token_id": 257,
        "tie_word_embeddings": False,
    }
    with open(f"{tmpdir}/config.json", "w") as f:
        json.dump(hf_json, f)
    return m


def _image(seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(112, 112, 3) * 255).astype(np.uint8))


def test_idefics3_features_match_hf(tmp_path):
    hf = _save_hf(tmp_path)
    import jax.numpy as jnp

    from sglang_tpu.multimodal.gemma3 import siglip_preprocess
    from sglang_tpu.multimodal.idefics3 import (
        idefics3_connect,
        load_idefics3_vision_params,
    )
    from sglang_tpu.multimodal.gemma3 import siglip_forward

    from sglang_tpu.multimodal.idefics3 import idefics3_pos_ids

    px = siglip_preprocess(_image(), 112)
    params = load_idefics3_vision_params(str(tmp_path))
    params = dict(
        params, pos_emb=params["pos_emb"][jnp.asarray(idefics3_pos_ids(8))],
    )
    feats = siglip_forward(
        params, jnp.asarray(px), num_heads=4, patch=14, eps=1e-6,
    )
    ours = np.asarray(idefics3_connect(params, feats, 2))
    with torch.no_grad():
        ref = hf.model.get_image_features(
            torch.tensor(px[None, None]),  # [B, n_images, C, H, W]
        ).numpy().reshape(ours.shape[0], -1)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize(
    "arch", ["Idefics3ForConditionalGeneration",
             "SmolVLMForConditionalGeneration"],
)
def test_idefics3_image_generation_matches_hf(tmp_path, arch):
    hf = _save_hf(tmp_path, arch)
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.multimodal.gemma3 import siglip_preprocess

    img = _image(3)
    args = make_server_args(
        model_path=str(tmp_path), load_format="safetensors",
        dtype="float32",
    )
    cfg = ModelConfig.from_model_path(str(tmp_path), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        assert eng.mm_processor.n_patches == 16  # (112/14/2)^2
        prompt = [3, 88, 500, 41, 7]
        out = eng.generate(
            input_ids=list(prompt),
            images=[img],
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        hf_ids = [3, 88] + [500] * 16 + [41, 7]
        px = siglip_preprocess(img, 112)
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([hf_ids]),
                pixel_values=torch.tensor(px[None, None]),
                max_new_tokens=10, do_sample=False,
            )[0, len(hf_ids):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()
