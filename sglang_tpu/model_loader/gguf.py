"""GGUF checkpoint reader (llama.cpp container format).

Equivalent role to the reference's GGUF loader
(``model_loader/loader.py`` GGUFModelLoader — it shells out to gguf-py;
this is a native parser, zero extra deps).  Supports GGUF v2/v3 little-
endian files with F32 / F16 / BF16 / Q8_0 / Q4_0 / Q4_1 tensors;
quantized blocks dequantize to float on read (the reference does the
same — GGUF quant layouts are CPU-oriented and repack into the serving
quant formats is a separate concern).

GGUF tensor names (``token_embd.weight``, ``blk.N.attn_q.weight``, …)
translate to HF names and flow through the model's normal
``hf_weight_mapping`` — so every family that loads from safetensors
loads from GGUF too.

Spec: https://github.com/ggerganov/ggml/blob/master/docs/gguf.md
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Iterator, Tuple

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

GGUF_MAGIC = b"GGUF"

# ggml type ids → (block_size_elems, block_bytes) for the ones we read
GGML_F32 = 0
GGML_F16 = 1
GGML_Q4_0 = 2
GGML_Q4_1 = 3
GGML_Q8_0 = 8
GGML_BF16 = 30

_META_READERS = {}


def _read_val(f, vtype: int):
    simple = {
        0: ("<B", 1), 1: ("<b", 1), 2: ("<H", 2), 3: ("<h", 2),
        4: ("<I", 4), 5: ("<i", 4), 6: ("<f", 4), 7: ("<?", 1),
        10: ("<Q", 8), 11: ("<q", 8), 12: ("<d", 8),
    }
    if vtype in simple:
        fmt, n = simple[vtype]
        return struct.unpack(fmt, f.read(n))[0]
    if vtype == 8:  # string
        n = struct.unpack("<Q", f.read(8))[0]
        return f.read(n).decode("utf-8", errors="replace")
    if vtype == 9:  # array
        etype = struct.unpack("<I", f.read(4))[0]
        n = struct.unpack("<Q", f.read(8))[0]
        return [_read_val(f, etype) for _ in range(n)]
    raise ValueError(f"unknown GGUF metadata value type {vtype}")


def _dequant_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    """Q8_0: blocks of 32 int8 with one f16 scale (34 bytes/block)."""
    blocks = raw.reshape(-1, 34)
    scale = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    qs = blocks[:, 2:].view(np.int8).astype(np.float32)
    return (qs * scale).reshape(-1)[:n]


def _dequant_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    """Q4_0: blocks of 32 4-bit values with one f16 scale (18 B/block);
    x = (q - 8) * scale, low nibbles first then high."""
    blocks = raw.reshape(-1, 18)
    scale = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    qs = blocks[:, 2:]
    lo = (qs & 0x0F).astype(np.float32) - 8.0
    hi = (qs >> 4).astype(np.float32) - 8.0
    out = np.concatenate([lo, hi], axis=1) * scale
    return out.reshape(-1)[:n]


def _dequant_q4_1(raw: np.ndarray, n: int) -> np.ndarray:
    """Q4_1: blocks of 32 4-bit values with f16 scale + f16 min
    (20 B/block); x = q * scale + min."""
    blocks = raw.reshape(-1, 20)
    scale = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    mn = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
    qs = blocks[:, 4:]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    out = np.concatenate([lo, hi], axis=1) * scale + mn
    return out.reshape(-1)[:n]


class GGUFFile:
    """Parsed GGUF container: metadata dict + lazy tensor reads."""

    def __init__(self, path: str):
        self.path = path
        self.metadata: Dict[str, Any] = {}
        self.tensors: Dict[str, Tuple[tuple, int, int]] = {}
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != GGUF_MAGIC:
                raise ValueError(f"{path}: not a GGUF file")
            version = struct.unpack("<I", f.read(4))[0]
            if version not in (2, 3):
                raise ValueError(f"{path}: unsupported GGUF v{version}")
            n_tensors = struct.unpack("<Q", f.read(8))[0]
            n_kv = struct.unpack("<Q", f.read(8))[0]
            for _ in range(n_kv):
                klen = struct.unpack("<Q", f.read(8))[0]
                key = f.read(klen).decode()
                vtype = struct.unpack("<I", f.read(4))[0]
                self.metadata[key] = _read_val(f, vtype)
            infos = []
            for _ in range(n_tensors):
                nlen = struct.unpack("<Q", f.read(8))[0]
                name = f.read(nlen).decode()
                ndim = struct.unpack("<I", f.read(4))[0]
                dims = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
                ttype = struct.unpack("<I", f.read(4))[0]
                off = struct.unpack("<Q", f.read(8))[0]
                # GGUF dims are GGML order (fastest-varying first) —
                # reverse for row-major numpy
                infos.append((name, tuple(reversed(dims)), ttype, off))
            align = int(self.metadata.get("general.alignment", 32))
            base = f.tell()
            base = (base + align - 1) // align * align
            for name, shape, ttype, off in infos:
                self.tensors[name] = (shape, ttype, base + off)

    def keys(self):
        return self.tensors.keys()

    def get_tensor(self, name: str) -> np.ndarray:
        shape, ttype, off = self.tensors[name]
        n = int(np.prod(shape)) if shape else 1
        with open(self.path, "rb") as f:
            f.seek(off)
            if ttype == GGML_F32:
                out = np.fromfile(f, np.float32, n)
            elif ttype == GGML_F16:
                out = np.fromfile(f, np.float16, n).astype(np.float32)
            elif ttype == GGML_BF16:
                import ml_dtypes

                out = np.fromfile(f, ml_dtypes.bfloat16, n).astype(
                    np.float32
                )
            elif ttype == GGML_Q8_0:
                nb = (n // 32) * 34
                out = _dequant_q8_0(np.fromfile(f, np.uint8, nb), n)
            elif ttype == GGML_Q4_0:
                nb = (n // 32) * 18
                out = _dequant_q4_0(np.fromfile(f, np.uint8, nb), n)
            elif ttype == GGML_Q4_1:
                nb = (n // 32) * 20
                out = _dequant_q4_1(np.fromfile(f, np.uint8, nb), n)
            else:
                raise ValueError(
                    f"{name}: unsupported GGML tensor type {ttype} "
                    "(supported: F32/F16/BF16/Q8_0/Q4_0/Q4_1)"
                )
        return out.reshape(shape)


# --------------------------------------------------------- name translation
def gguf_to_hf_name(name: str) -> str:
    """GGUF llama-family tensor names → HF names (reference gguf-py
    TENSOR_NAMES mapping, llama arch)."""
    fixed = {
        "token_embd.weight": "model.embed_tokens.weight",
        "output_norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    }
    if name in fixed:
        return fixed[name]
    if name.startswith("blk."):
        parts = name.split(".")
        li = parts[1]
        tail = ".".join(parts[2:])
        table = {
            "attn_norm.weight": "input_layernorm.weight",
            "attn_q.weight": "self_attn.q_proj.weight",
            "attn_k.weight": "self_attn.k_proj.weight",
            "attn_v.weight": "self_attn.v_proj.weight",
            "attn_output.weight": "self_attn.o_proj.weight",
            "attn_q.bias": "self_attn.q_proj.bias",
            "attn_k.bias": "self_attn.k_proj.bias",
            "attn_v.bias": "self_attn.v_proj.bias",
            "attn_q_norm.weight": "self_attn.q_norm.weight",
            "attn_k_norm.weight": "self_attn.k_norm.weight",
            "ffn_norm.weight": "post_attention_layernorm.weight",
            "ffn_gate.weight": "mlp.gate_proj.weight",
            "ffn_up.weight": "mlp.up_proj.weight",
            "ffn_down.weight": "mlp.down_proj.weight",
        }
        if tail in table:
            return f"model.layers.{li}.{table[tail]}"
    return name  # unknown: pass through (mapping() will skip it)


def gguf_config_to_hf(meta: Dict[str, Any]) -> Dict[str, Any]:
    """Derive an HF-style config dict from GGUF metadata (reference
    GGUFModelLoader builds the config the same way)."""
    arch = meta.get("general.architecture", "llama")

    def g(key, default=None):
        return meta.get(f"{arch}.{key}", default)

    heads = int(g("attention.head_count", 32))
    hidden = int(g("embedding_length", 4096))
    hf = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": arch,
        "hidden_size": hidden,
        "intermediate_size": int(g("feed_forward_length", 4 * hidden)),
        "num_hidden_layers": int(g("block_count", 32)),
        "num_attention_heads": heads,
        "num_key_value_heads": int(
            g("attention.head_count_kv", heads)
        ),
        "head_dim": int(g("attention.key_length", hidden // heads)),
        "max_position_embeddings": int(g("context_length", 4096)),
        "rms_norm_eps": float(
            g("attention.layer_norm_rms_epsilon", 1e-5)
        ),
        "rope_theta": float(g("rope.freq_base", 10000.0)),
        "vocab_size": int(g("vocab_size", 0))
        or len(meta.get("tokenizer.ggml.tokens", []) or []),
        "tie_word_embeddings": False,
        "eos_token_id": int(
            meta.get("tokenizer.ggml.eos_token_id", 2)
        ),
    }
    return hf


def iter_hf_tensors(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """(hf_name, float32 array) for every tensor in the GGUF file."""
    f = GGUFFile(path)
    for name in f.keys():
        yield gguf_to_hf_name(name), f.get_tensor(name)
