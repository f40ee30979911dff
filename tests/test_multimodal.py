"""LLaVA multimodal path: CLIP tower parity + end-to-end generate vs HF."""

import numpy as np
import pytest

from tests.conftest import make_server_args

VISION_TINY = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    image_size=28,
    patch_size=14,
    projection_dim=32,
)
TEXT_TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    vocab_size=512,
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def llava_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    cfg = LlavaConfig(
        vision_config=CLIPVisionConfig(**VISION_TINY),
        text_config=LlamaConfig(**TEXT_TINY),
        image_token_index=500,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        pad_token_id=0,
    )
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg).float().eval()
    d = tmp_path_factory.mktemp("llava_tiny")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_clip_tower_matches_hf(llava_dir):
    import torch
    from transformers import LlavaForConditionalGeneration as HFLlava

    from sglang_tpu.multimodal import MultimodalProcessor

    hf = HFLlava.from_pretrained(llava_dir, torch_dtype=torch.float32).eval()
    proc = MultimodalProcessor(
        {
            "vision_config": VISION_TINY,
            "vision_feature_layer": -2,
            "image_token_index": 500,
        },
        llava_dir,
    )
    rng = np.random.RandomState(0)
    pixels = rng.rand(1, 3, 28, 28).astype(np.float32) * 2 - 1
    with torch.no_grad():
        hf_feats = hf.get_image_features(
            pixel_values=torch.tensor(pixels),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
        if isinstance(hf_feats, (list, tuple)):
            hf_feats = hf_feats[0]
        hf_feats = hf_feats.reshape(-1, hf_feats.shape[-1]).numpy()
    from sglang_tpu.multimodal import clip_vision_forward, llava_project
    import jax.numpy as jnp

    feats = clip_vision_forward(
        {k: v for k, v in proc.params.items() if k != "projector"},
        jnp.asarray(pixels), num_heads=4, feature_layer=-2,
    )
    ours = np.asarray(llava_project(proc.params["projector"], feats))
    ours = ours.reshape(-1, ours.shape[-1])
    np.testing.assert_allclose(ours, hf_feats, rtol=2e-4, atol=2e-4)


def test_llava_generate_matches_hf(llava_dir):
    import torch
    from transformers import LlavaForConditionalGeneration as HFLlava

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    hf = HFLlava.from_pretrained(llava_dir, torch_dtype=torch.float32).eval()
    args = make_server_args(
        model_path=llava_dir, load_format="safetensors", dtype="float32"
    )
    cfg = ModelConfig.from_model_path(llava_dir, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        assert eng.mm_processor is not None
        rng = np.random.RandomState(1)
        image = (rng.rand(28, 28, 3) * 255).astype(np.uint8)
        # prompt: tokens around one image placeholder (id 500)
        prompt = [5, 9, 500, 7, 3, 2]
        ours = eng.generate(
            input_ids=list(prompt),
            sampling_params={"max_new_tokens": 10, "temperature": 0.0,
                             "ignore_eos": True},
            images=[image],
        )
        # HF reference with the SAME preprocessed pixels
        from sglang_tpu.multimodal import preprocess_image

        pixels = torch.tensor(preprocess_image(image, 28)[None])
        # HF expects the image token pre-expanded to n_patches repeats
        n_patches = eng.mm_processor.n_patches
        hf_prompt = []
        for t in prompt:
            hf_prompt.extend([t] * (n_patches if t == 500 else 1))
        ids = torch.tensor([hf_prompt])
        with torch.no_grad():
            hf_out = hf.generate(
                input_ids=ids, pixel_values=pixels, max_new_tokens=10,
                do_sample=False, use_cache=True,
            )
        hf_new = hf_out[0, -10:].tolist()
        assert ours["output_ids"] == hf_new, (ours["output_ids"], hf_new)
    finally:
        eng.shutdown()


# ------------------------------------------------------------- anyres
def test_anyres_best_resolution_matches_hf_formula():
    from sglang_tpu.multimodal import MultimodalProcessor

    pin = [[56, 56], [28, 84], [84, 28]]
    # wide image: the wide pinpoint wins
    assert MultimodalProcessor.select_best_resolution((80, 25), pin) == (28, 84)
    # tall image
    assert MultimodalProcessor.select_best_resolution((25, 80), pin) == (84, 28)
    # square-ish
    assert MultimodalProcessor.select_best_resolution((50, 50), pin) == (56, 56)


def test_anyres_tiling_counts_and_expand(llava_dir):
    """LLaVA-NeXT anyres: a high-res image becomes global thumbnail +
    grid tiles; per-image counts feed the prompt expansion (reference
    llava anyres processing)."""
    from PIL import Image

    from sglang_tpu.multimodal import MultimodalProcessor

    proc = MultimodalProcessor(
        {
            "vision_config": VISION_TINY,
            "vision_feature_layer": -2,
            "image_token_index": 500,
            "image_grid_pinpoints": [[56, 56], [28, 56], [56, 28]],
        },
        llava_dir,
    )
    assert proc.anyres
    rng = np.random.RandomState(1)
    img = Image.fromarray(
        (rng.rand(50, 60, 3) * 255).astype(np.uint8)
    )  # landscape 60x50 → 56x56 pinpoint → 2x2 grid of 28px tiles
    rows = proc.encode_images([img])
    # 4 patches global + 4 tiles * 4 patches = 20 rows (no image_newline
    # tensor in a plain llava checkpoint)
    assert proc.last_counts == [20]
    assert rows.shape[0] == 20
    ids = proc.expand_prompt([1, 2, 500, 3], 1)
    assert len(ids) == 3 + 20
    assert ids[:2] == [1, 2] and ids[-1] == 3
    assert all(t < 0 for t in ids[2:-1])

    # a small image still tiles deterministically; distinct images give
    # distinct embeddings (sanity that tiles actually encode content)
    img2 = Image.fromarray(
        (rng.rand(50, 60, 3) * 255).astype(np.uint8)
    )
    rows2 = proc.encode_images([img2])
    assert rows2.shape == rows.shape
    assert not np.allclose(rows, rows2)


def test_anyres_end_to_end_generate(llava_dir):
    """Engine serves an anyres-config LLaVA: variable image token counts
    splice through the input_embeds path."""
    import json
    import os

    from PIL import Image

    # config.json with pinpoints so the engine's processor arms anyres
    with open(os.path.join(llava_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["image_grid_pinpoints"] = [[56, 56]]
    anyres_dir = llava_dir + "_anyres"
    os.makedirs(anyres_dir, exist_ok=True)
    for fn in os.listdir(llava_dir):
        if fn.endswith(".safetensors"):
            os.link(
                os.path.join(llava_dir, fn), os.path.join(anyres_dir, fn)
            ) if not os.path.exists(os.path.join(anyres_dir, fn)) else None
    with open(os.path.join(anyres_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(model_path=anyres_dir, load_format="safetensors")
    model_cfg = ModelConfig.from_model_path(anyres_dir, dtype="float32")
    runner = ModelRunner(args, model_config=model_cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        rng = np.random.RandomState(3)
        img = Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8))
        out = eng.generate(
            input_ids=[7, 8, 500, 9],
            images=[img],
            sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 6
        assert out["meta_info"]["prompt_tokens"] == 3 + 20
    finally:
        eng.shutdown()
