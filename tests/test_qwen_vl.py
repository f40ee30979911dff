"""Qwen2-VL: vision tower parity, M-RoPE positions, end-to-end image
generation vs HF transformers (reference srt/models/qwen2_vl.py)."""

import json

import numpy as np
import pytest

from tests.conftest import make_server_args

TEXT_TINY = dict(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
    max_position_embeddings=1024, rope_theta=10000.0,
    rms_norm_eps=1e-5,
    rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
)
VIS_TINY = dict(
    depth=2, embed_dim=32, hidden_size=64, num_heads=4, in_channels=3,
    patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
    mlp_ratio=2,
)


def _save_hf(tmpdir):
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(TEXT_TINY),
        vision_config=dict(VIS_TINY),
        image_token_id=500, video_token_id=501,
        vision_start_token_id=502, vision_end_token_id=503,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = Qwen2VLForConditionalGeneration(cfg).float().eval()
    import safetensors.torch as st

    sd = {k: v.contiguous() for k, v in m.state_dict().items()}
    st.save_file(sd, f"{tmpdir}/model.safetensors")
    hf_json = {
        "architectures": ["Qwen2VLForConditionalGeneration"],
        "model_type": "qwen2_vl",
        "text_config": dict(
            TEXT_TINY, model_type="qwen2_vl_text", eos_token_id=257,
            tie_word_embeddings=False,
        ),
        "vision_config": dict(VIS_TINY, model_type="qwen2_vl"),
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


def _image(seed=0, hw=(40, 56)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    return Image.fromarray(
        (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)
    )


def test_qwen_vl_vision_tower_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    from sglang_tpu.multimodal.qwen_vl import (
        load_qwen_vl_vision_params,
        qwen_patchify,
        qwen_vision_forward,
    )
    import jax.numpy as jnp

    patches, grid = qwen_patchify(_image(), 14, 2, 2)
    params = load_qwen_vl_vision_params(str(tmp_path))
    ours = np.asarray(
        qwen_vision_forward(
            params, jnp.asarray(patches), grid, num_heads=4, merge=2
        )
    )
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([list(grid)]),
        ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_qwen_vl_text_only_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    eng = _engine(tmp_path)
    try:
        prompt = [3, 88, 41, 7, 205, 19, 66, 12]
        out = eng.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": 12,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=12, do_sample=False,
            )[0, len(prompt):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


def test_qwen_vl_image_generation_matches_hf(tmp_path):
    """Full path: dynamic-res tiling → tower → M-RoPE positions →
    token-exact greedy continuation vs HF with the same patches."""
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    from sglang_tpu.multimodal.qwen_vl import qwen_patchify

    img = _image(3)
    patches, grid = qwen_patchify(img, 14, 2, 2)
    gt, gh, gw = grid
    count = gt * (gh // 2) * (gw // 2)

    eng = _engine(tmp_path)
    try:
        assert eng.scheduler._needs_mrope
        prompt = [3, 88, 500, 41, 7]  # 500 = image token
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
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([list(grid)]),
                max_new_tokens=10, do_sample=False,
            )[0, len(hf_ids):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


def test_qwen_vl_video_generation_matches_hf(tmp_path):
    """Video path: frames group by temporal_patch_size into a gt>1
    grid; the M-RoPE t-axis advances per frame group — token-exact
    greedy continuation vs HF with the same patches."""
    torch = pytest.importorskip("torch")
    hf = _save_hf(tmp_path)
    from sglang_tpu.multimodal.qwen_vl import qwen_patchify_video

    rng = np.random.RandomState(9)
    frames = (rng.rand(6, 40, 56, 3) * 255).astype(np.uint8)
    patches, grid = qwen_patchify_video(frames, 14, 2, 2)
    gt, gh, gw = grid
    assert gt == 3  # 6 frames / temporal 2
    count = gt * (gh // 2) * (gw // 2)

    eng = _engine(tmp_path)
    try:
        prompt = [3, 88, 501, 41, 7]  # 501 = video token
        out = eng.generate(
            input_ids=list(prompt),
            videos=[frames],
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        hf_ids = [3, 88] + [501] * count + [41, 7]
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([hf_ids]),
                pixel_values_videos=torch.tensor(patches),
                video_grid_thw=torch.tensor([list(grid)]),
                max_new_tokens=10, do_sample=False,
            )[0, len(hf_ids):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


def test_qwen_vl_http_media_data_urls(tmp_path):
    """HTTP multimodal: /generate accepts image_data (data-URL) and
    video_data (multi-frame GIF data-URL); outputs match the library
    API fed the same decoded media."""
    import asyncio
    import base64
    import io
    import threading

    import httpx
    from aiohttp import web

    from sglang_tpu.entrypoints.http_server import (
        _decode_data_url_frames,
        build_app,
    )

    pytest.importorskip("torch")
    _save_hf(tmp_path)
    eng = _engine(tmp_path)
    args = eng.server_args if hasattr(eng, "server_args") else None
    from tests.conftest import make_server_args

    app = build_app(eng, make_server_args(host="127.0.0.1", port=0))
    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_box = {}

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            r = web.AppRunner(app)
            await r.setup()
            site = web.TCPSite(r, "127.0.0.1", 0)
            await site.start()
            port_box["port"] = site._server.sockets[0].getsockname()[1]
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    assert started.wait(15)
    base = f"http://127.0.0.1:{port_box['port']}"

    def durl(img, fmt="PNG", **kw):
        buf = io.BytesIO()
        img.save(buf, format=fmt, **kw)
        mime = "image/gif" if fmt == "GIF" else "image/png"
        return f"data:{mime};base64," + base64.b64encode(
            buf.getvalue()
        ).decode()

    try:
        sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
        # ---- image via data URL ----
        img = _image(5)
        r = httpx.post(base + "/generate", json={
            "input_ids": [3, 88, 500, 41, 7], "sampling_params": sp,
            "image_data": durl(img),
        }, timeout=120)
        assert r.status_code == 200, r.text
        direct = eng.generate(
            input_ids=[3, 88, 500, 41, 7], images=[img],
            sampling_params=dict(sp),
        )
        assert r.json()["output_ids"] == direct["output_ids"]
        # ---- video via multi-frame GIF data URL ----
        from PIL import Image

        rng = np.random.RandomState(4)
        frames = [
            Image.fromarray((rng.rand(40, 56, 3) * 255).astype(np.uint8))
            for _ in range(4)
        ]
        gif = durl(
            frames[0], fmt="GIF", save_all=True,
            append_images=frames[1:], loop=0,
        )
        r = httpx.post(base + "/generate", json={
            "input_ids": [3, 88, 501, 41, 7], "sampling_params": sp,
            "video_data": gif,
        }, timeout=120)
        assert r.status_code == 200, r.text
        # compare against the SAME decoded frames (GIF palettization is
        # lossy, so decode the data URL rather than reusing `frames`)
        dec = _decode_data_url_frames(gif)
        direct = eng.generate(
            input_ids=[3, 88, 501, 41, 7], videos=[dec],
            sampling_params=dict(sp),
        )
        assert r.json()["output_ids"] == direct["output_ids"]
    finally:
        loop.call_soon_threadsafe(loop.stop)
        eng.shutdown()
