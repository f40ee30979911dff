"""Qwen3-VL: learned-pos-embed vision tower + DEEPSTACK injection +
interleaved M-RoPE — tower parity and end-to-end image generation vs HF
transformers (reference srt/models/qwen3_vl.py)."""

import json

import numpy as np
import pytest

from tests.conftest import make_server_args

TEXT_TINY = dict(
    hidden_size=64, intermediate_size=128, num_hidden_layers=3,
    num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
    max_position_embeddings=1024, rope_theta=10000.0,
    rms_norm_eps=1e-5, head_dim=16,
    rope_scaling={
        "rope_type": "default", "mrope_section": [2, 3, 3],
        "mrope_interleaved": True,
    },
)
VIS_TINY = dict(
    depth=3, hidden_size=32, out_hidden_size=64, intermediate_size=48,
    num_heads=4, in_channels=3, patch_size=14, spatial_merge_size=2,
    temporal_patch_size=2, num_position_embeddings=256,
    deepstack_visual_indexes=[0, 1], hidden_act="gelu_pytorch_tanh",
)


def _save_hf(tmpdir):
    import torch
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration

    cfg = Qwen3VLConfig(
        text_config=dict(TEXT_TINY),
        vision_config=dict(VIS_TINY),
        image_token_id=500, video_token_id=501,
        vision_start_token_id=502, vision_end_token_id=503,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = Qwen3VLForConditionalGeneration(cfg).float().eval()
    import safetensors.torch as st

    sd = {k: v.contiguous() for k, v in m.state_dict().items()}
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    hf_json = {
        "architectures": ["Qwen3VLForConditionalGeneration"],
        "model_type": "qwen3_vl",
        "text_config": dict(
            TEXT_TINY, model_type="qwen3_vl_text", eos_token_id=257,
            tie_word_embeddings=False,
        ),
        "vision_config": dict(VIS_TINY, model_type="qwen3_vl"),
        "image_token_id": 500,
        "video_token_id": 501,
        "vision_start_token_id": 502,
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
        dtype="float32",
    )
    cfg = ModelConfig.from_model_path(str(model_dir), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def _image(seed=0, hw=(150, 200)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    return Image.fromarray(
        (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)
    )


def test_qwen3_vl_vision_tower_matches_hf(tmp_path):
    """Tower parity incl. bilinear pos-embed interpolation (non-square
    grid off the 16×16 table) and both deepstack feature planes."""
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    import jax.numpy as jnp

    from sglang_tpu.multimodal.qwen_vl import (
        load_qwen3vl_vision_params,
        qwen3vl_vision_forward,
        qwen_patchify,
    )

    patches, grid = qwen_patchify(_image(), 14, 2, 2)
    params = load_qwen3vl_vision_params(str(tmp_path))
    main, ds = qwen3vl_vision_forward(
        params, jnp.asarray(patches), grid, num_heads=4, merge=2,
        deepstack_idx=(0, 1),
    )
    main, ds = np.asarray(main), np.asarray(ds)
    with torch.no_grad():
        ref, ref_ds = hf.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([list(grid)]),
        )
    np.testing.assert_allclose(
        main, ref.numpy(), rtol=3e-4, atol=3e-4
    )
    assert len(ref_ds) == 2
    for j in range(2):
        np.testing.assert_allclose(
            ds[j], ref_ds[j].numpy(), rtol=3e-4, atol=3e-4
        )


def test_qwen3_vl_image_generation_matches_hf(tmp_path):
    """Full path: tower → DEEPSTACK planes through the packed embeds
    buffer into the first text layers → interleaved M-RoPE — token-exact
    greedy continuation vs HF with the same patches."""
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    from sglang_tpu.multimodal.qwen_vl import Qwen3VLProcessor, qwen_patchify

    img = _image(3)
    patches, grid = qwen_patchify(img, 14, 2, 2)
    gt, gh, gw = grid
    count = gt * (gh // 2) * (gw // 2)

    eng = _engine(tmp_path)
    try:
        assert isinstance(eng.mm_processor, Qwen3VLProcessor)
        assert eng.mm_processor.deepstack_layers == 2
        assert eng.scheduler.runner.model.deepstack_layers == 2
        prompt = [3, 88, 502, 500, 41, 7]  # 502 vision_start, 500 image
        out = eng.generate(
            input_ids=list(prompt),
            images=[img],
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        hf_ids = [3, 88, 502] + [500] * count + [41, 7]
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([hf_ids]),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([list(grid)]),
                max_new_tokens=10, do_sample=False,
            )[0, len(hf_ids):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


def test_qwen3_vl_moe_image_generation_matches_hf(tmp_path):
    """Qwen3-VL-MoE: the deepstack/interleaved-M-RoPE trunk with the
    Mixtral MoE MLP loaded from FUSED STACKED expert tensors
    (gate_up_proj [E, H, 2MI] split into halves, down_proj as-is)."""
    torch = pytest.importorskip("torch")
    import safetensors.torch as st
    from transformers import (
        Qwen3VLMoeConfig,
        Qwen3VLMoeForConditionalGeneration,
    )

    from sglang_tpu.multimodal.qwen_vl import qwen_patchify

    text = dict(
        hidden_size=64, intermediate_size=128, moe_intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=512, max_position_embeddings=1024, rope_theta=10000.0,
        rms_norm_eps=1e-5, head_dim=16, num_experts=4,
        num_experts_per_tok=2, norm_topk_prob=True,
        rope_scaling={
            "rope_type": "default", "mrope_section": [2, 3, 3],
            "mrope_interleaved": True,
        },
    )
    vis = dict(VIS_TINY)
    cfg = Qwen3VLMoeConfig(
        text_config=dict(text), vision_config=vis,
        image_token_id=500, video_token_id=501,
        vision_start_token_id=502, vision_end_token_id=503,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = Qwen3VLMoeForConditionalGeneration(cfg).float().eval()
    sd = {k: v.contiguous() for k, v in hf.state_dict().items()}
    st.save_file(sd, f"{tmp_path}/model.safetensors")
    hf_json = {
        "architectures": ["Qwen3VLMoeForConditionalGeneration"],
        "model_type": "qwen3_vl_moe",
        "text_config": dict(
            text, model_type="qwen3_vl_moe_text", eos_token_id=257,
            tie_word_embeddings=False,
        ),
        "vision_config": dict(vis, model_type="qwen3_vl_moe"),
        "image_token_id": 500, "video_token_id": 501,
        "vision_start_token_id": 502,
        "eos_token_id": 257, "tie_word_embeddings": False,
    }
    with open(f"{tmp_path}/config.json", "w") as f:
        json.dump(hf_json, f)

    img = _image(5)
    patches, grid = qwen_patchify(img, 14, 2, 2)
    gt, gh, gw = grid
    count = gt * (gh // 2) * (gw // 2)
    eng = _engine(tmp_path)
    try:
        prompt = [3, 88, 502, 500, 41, 7]
        out = eng.generate(
            input_ids=list(prompt),
            images=[img],
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        hf_ids = [3, 88, 502] + [500] * count + [41, 7]
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([hf_ids]),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([list(grid)]),
                max_new_tokens=10, do_sample=False,
            )[0, len(hf_ids):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()
