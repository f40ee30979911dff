"""GGUF checkpoint loading (reference model_loader GGUFModelLoader):
native container parse, metadata→config, Q8_0/Q4_0 dequant, llama name
translation — outputs parity vs the same weights via safetensors."""

import struct

import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args


def _q8_0_bytes(x: np.ndarray) -> bytes:
    """Quantize a float array to GGUF Q8_0 blocks (32 elems / block)."""
    x = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(axis=1, keepdims=True)
    scale = (amax / 127.0).astype(np.float16)
    q = np.round(
        x / np.maximum(scale.astype(np.float32), 1e-12)
    ).astype(np.int8)
    out = bytearray()
    for s, row in zip(scale[:, 0], q):
        out += s.tobytes() + row.tobytes()
    return bytes(out)


def _write_gguf(path, meta, tensors):
    """Minimal GGUF v3 writer for the test (f32 and q8_0 tensors)."""
    ALIGN = 32

    def s(x):
        b = x.encode()
        return struct.pack("<Q", len(b)) + b

    buf = bytearray()
    buf += b"GGUF" + struct.pack("<I", 3)
    buf += struct.pack("<QQ", len(tensors), len(meta))
    for k, v in meta.items():
        buf += s(k)
        if isinstance(v, str):
            buf += struct.pack("<I", 8) + s(v)
        elif isinstance(v, float):
            buf += struct.pack("<I", 6) + struct.pack("<f", v)
        else:
            buf += struct.pack("<I", 4) + struct.pack("<I", int(v))
    blobs = []
    off = 0
    for name, (arr, ttype) in tensors.items():
        buf += s(name)
        dims = tuple(reversed(arr.shape))  # GGML order
        buf += struct.pack("<I", len(dims))
        buf += struct.pack(f"<{len(dims)}Q", *dims)
        buf += struct.pack("<I", ttype)
        buf += struct.pack("<Q", off)
        if ttype == 0:
            blob = arr.astype(np.float32).tobytes()
        elif ttype == 8:
            blob = _q8_0_bytes(arr)
        else:
            raise ValueError(ttype)
        pad = (-len(blob)) % ALIGN
        blobs.append(blob + b"\x00" * pad)
        off += len(blob) + pad
    pad = (-len(buf)) % ALIGN
    buf += b"\x00" * pad
    for b in blobs:
        buf += b
    with open(path, "wb") as f:
        f.write(bytes(buf))


def _tiny_weight_set(rng):
    H = TINY_HF_CONFIG["hidden_size"]
    I = TINY_HF_CONFIG["intermediate_size"]
    L = TINY_HF_CONFIG["num_hidden_layers"]
    hq = TINY_HF_CONFIG["num_attention_heads"]
    hkv = TINY_HF_CONFIG["num_key_value_heads"]
    d = TINY_HF_CONFIG["head_dim"]
    V = TINY_HF_CONFIG["vocab_size"]

    def w(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    sd = {
        "model.embed_tokens.weight": w(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(V, H),
    }
    for li in range(L):
        p = f"model.layers.{li}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = w(hq * d, H)
        sd[p + "self_attn.k_proj.weight"] = w(hkv * d, H)
        sd[p + "self_attn.v_proj.weight"] = w(hkv * d, H)
        sd[p + "self_attn.o_proj.weight"] = w(H, hq * d)
        sd[p + "mlp.gate_proj.weight"] = w(I, H)
        sd[p + "mlp.up_proj.weight"] = w(I, H)
        sd[p + "mlp.down_proj.weight"] = w(H, I)
    return sd


HF2GGUF = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.norm.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}
TAIL2GGUF = {
    "input_layernorm.weight": "attn_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}


def _gguf_name(hf):
    if hf in HF2GGUF:
        return HF2GGUF[hf]
    parts = hf.split(".")
    li = parts[2]
    return f"blk.{li}." + TAIL2GGUF[".".join(parts[3:])]


def _engine(model_dir, load_format):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        model_path=str(model_dir), load_format=load_format, dtype="float32",
    )
    cfg = ModelConfig.from_model_path(str(model_dir), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def test_gguf_loads_and_matches_safetensors(tmp_path):
    import json

    import safetensors.numpy as stnp

    rng = np.random.RandomState(0)
    sd = _tiny_weight_set(rng)

    st_dir = tmp_path / "st"
    st_dir.mkdir()
    stnp.save_file(sd, str(st_dir / "model.safetensors"))
    with open(st_dir / "config.json", "w") as f:
        json.dump(dict(TINY_HF_CONFIG), f)

    gg_dir = tmp_path / "gg"
    gg_dir.mkdir()
    c = TINY_HF_CONFIG
    meta = {
        "general.architecture": "llama",
        "general.alignment": 32,
        "llama.embedding_length": c["hidden_size"],
        "llama.feed_forward_length": c["intermediate_size"],
        "llama.block_count": c["num_hidden_layers"],
        "llama.attention.head_count": c["num_attention_heads"],
        "llama.attention.head_count_kv": c["num_key_value_heads"],
        "llama.attention.key_length": c["head_dim"],
        "llama.context_length": c["max_position_embeddings"],
        "llama.attention.layer_norm_rms_epsilon": c["rms_norm_eps"],
        "llama.rope.freq_base": c["rope_theta"],
        "llama.vocab_size": c["vocab_size"],
        "tokenizer.ggml.eos_token_id": c["eos_token_id"],
    }
    tensors = {
        _gguf_name(n): (a, 0) for n, a in sd.items()
    }
    _write_gguf(gg_dir / "model.gguf", meta, tensors)

    e_st = _engine(st_dir, "safetensors")
    e_gg = _engine(gg_dir, "gguf")
    try:
        # GGUF-derived config matches
        cg = e_gg.scheduler.runner.model_config
        assert cg.hidden_size == c["hidden_size"]
        assert cg.num_hidden_layers == c["num_hidden_layers"]
        prompt = [(3 * i) % 500 + 1 for i in range(23)]
        sp = {"temperature": 0.0, "max_new_tokens": 12, "ignore_eos": True}
        o1 = e_st.generate(input_ids=prompt, sampling_params=dict(sp))
        o2 = e_gg.generate(input_ids=prompt, sampling_params=dict(sp))
        assert o1["output_ids"] == o2["output_ids"]
    finally:
        e_st.shutdown()
        e_gg.shutdown()


def test_gguf_q8_0_dequant_roundtrip(tmp_path):
    from sglang_tpu.model_loader.gguf import GGUFFile

    rng = np.random.RandomState(1)
    x = (rng.randn(8, 64) * 0.3).astype(np.float32)
    _write_gguf(
        tmp_path / "q.gguf",
        {"general.architecture": "llama", "general.alignment": 32},
        {"t": (x, 8)},  # Q8_0
    )
    f = GGUFFile(str(tmp_path / "q.gguf"))
    got = f.get_tensor("t")
    assert got.shape == x.shape
    # Q8_0 is ~7-bit relative precision per block
    np.testing.assert_allclose(got, x, atol=np.abs(x).max() / 100)
