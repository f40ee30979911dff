"""Normalized model configuration.

Equivalent role to the reference's ``srt/configs/model_config.py:227``
(``ModelConfig``): turns a raw HuggingFace ``config.json`` into the exact
fields the KV pools, attention kernels, and model builders need — context
length, head geometry, KV architecture (MHA/GQA/MLA), MoE geometry, dtypes.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, List, Optional

import jax.numpy as jnp


class AttentionArch(str, Enum):
    MHA = "mha"  # covers GQA/MQA via num_kv_heads
    MLA = "mla"  # multi-head latent attention (DeepSeek family)


_DTYPE_MAP = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.bfloat16,  # fp16 not native on TPU; map to bf16
    "float8_e4m3": jnp.float8_e4m3fn,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}


def parse_dtype(name: str) -> Any:
    if name in ("auto", None):
        return jnp.bfloat16
    if name not in _DTYPE_MAP:
        raise ValueError(f"Unsupported dtype {name!r}")
    return _DTYPE_MAP[name]


@dataclass
class ModelConfig:
    architectures: List[str]
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    intermediate_size: int
    vocab_size: int
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    hidden_act: str = "silu"
    sliding_window: Optional[int] = None
    # qk layernorm (qwen3 family)
    qk_norm: bool = False
    # logit softcap (gemma2)
    final_logit_softcap: Optional[float] = None
    attn_logit_softcap: Optional[float] = None
    # partial rotary (e.g. phi, glm)
    partial_rotary_factor: float = 1.0
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: Optional[int] = None
    num_shared_experts: int = 0
    norm_topk_prob: bool = True
    moe_gate_bias: bool = False
    # runtime-filled
    dtype: Any = jnp.bfloat16
    context_length: int = 8192
    model_path: str = ""
    hf_config: Dict[str, Any] = field(default_factory=dict)
    attention_arch: AttentionArch = AttentionArch.MHA
    bos_token_id: Optional[int] = None
    eos_token_ids: List[int] = field(default_factory=list)
    # weight quantization (parsed from hf quantization_config; reference
    # layers/quantization/base_config.py) — None = unquantized
    quant_config: Optional[Any] = None
    # "pallas" (fused dequant GEMM) or "xla" (dequant+matmul) — set by
    # ModelRunner after backend selection; trace-time static.
    quant_backend: str = "xla"

    @property
    def kv_head_dim(self) -> int:
        return self.head_dim

    @property
    def q_per_kv(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @classmethod
    def from_hf_dict(
        cls,
        hf: Dict[str, Any],
        model_path: str = "",
        dtype: str = "bfloat16",
        context_length: Optional[int] = None,
    ) -> "ModelConfig":
        if hf.get("model_type") in ("gpt2", "gpt_bigcode"):
            # GPT-2-lineage configs use n_embd/n_head/n_layer/n_positions
            # (srt/models/gpt2.py, gpt_bigcode.py read the same fields)
            ne = hf.get("n_embd", hf.get("hidden_size"))
            nh = hf.get("n_head", hf.get("num_attention_heads"))
            mq = hf.get(
                "multi_query", hf.get("model_type") == "gpt_bigcode"
            )
            hf = dict(
                hf,
                hidden_size=ne,
                num_hidden_layers=hf.get(
                    "n_layer", hf.get("num_hidden_layers")
                ),
                num_attention_heads=nh,
                num_key_value_heads=1 if mq else nh,
                max_position_embeddings=hf.get("n_positions", 1024),
                intermediate_size=hf.get("n_inner") or 4 * ne,
                hidden_act=hf.get("activation_function", "gelu_new"),
                layer_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
                tie_word_embeddings=hf.get("tie_word_embeddings", True),
                attention_bias=True,
            )
        if hf.get("model_type") == "opt":
            hf = dict(
                hf,
                intermediate_size=hf.get(
                    "ffn_dim", 4 * hf["hidden_size"]
                ),
                hidden_act=hf.get("activation_function", "relu"),
                attention_bias=True,
            )
        if hf.get("model_type") == "dbrx":
            # DBRX nests its geometry under attn_config/ffn_config with
            # non-standard names — normalize to the common field names
            # (srt/models/dbrx.py reads the same nested config).
            attn = hf.get("attn_config") or {}
            ffn = hf.get("ffn_config") or {}
            nw = ffn.get("moe_normalize_expert_weights", 1)
            hf = dict(
                hf,
                hidden_size=hf["d_model"],
                num_hidden_layers=hf["n_layers"],
                num_attention_heads=hf["n_heads"],
                num_key_value_heads=attn.get("kv_n_heads", hf["n_heads"]),
                intermediate_size=ffn.get(
                    "ffn_hidden_size", 4 * hf["d_model"]
                ),
                max_position_embeddings=hf.get("max_seq_len", 8192),
                rope_theta=attn.get("rope_theta", 10000.0),
                num_local_experts=ffn.get("moe_num_experts", 0),
                num_experts_per_tok=ffn.get("moe_top_k", 0),
                # p-norm with p=1 over positive softmax weights == the
                # standard top-k renormalization; None disables it
                norm_topk_prob=bool(nw),
                clip_qkv=attn.get("clip_qkv"),
                tie_word_embeddings=hf.get("tie_word_embeddings", False),
            )
        # Some HF configs nest the text config (multimodal wrappers).
        text = hf.get("text_config", hf)
        # SSM configs (mamba2) have no attention heads; default from the
        # SSM head count so pool geometry math stays well-defined
        n_heads = text.get("num_attention_heads") or text.get(
            "num_heads"
        ) or 1
        hidden = text["hidden_size"]
        head_dim = text.get("head_dim") or hidden // n_heads
        n_kv = text.get("num_key_value_heads") or n_heads
        max_pos = text.get("max_position_embeddings", 8192)
        eos = text.get("eos_token_id")
        if eos is None:
            eos_ids = []
        elif isinstance(eos, int):
            eos_ids = [eos]
        else:
            eos_ids = list(eos)
        # DeepSeek MLA: the KV cache stores ONE latent vector per token
        # (c_kv + rope key), so pool geometry is 1 "kv head" of
        # kv_lora_rank + qk_rope_head_dim dims.
        attention_arch = AttentionArch.MHA
        if text.get("kv_lora_rank"):
            attention_arch = AttentionArch.MLA
            n_kv = 1
            head_dim = text["kv_lora_rank"] + text.get("qk_rope_head_dim", 0)
        cfg = cls(
            architectures=hf.get("architectures", []),
            hidden_size=hidden,
            num_hidden_layers=text["num_hidden_layers"],
            num_attention_heads=n_heads,
            num_key_value_heads=n_kv,
            head_dim=head_dim,
            intermediate_size=text.get("intermediate_size", 4 * hidden),
            vocab_size=text["vocab_size"],
            max_position_embeddings=max_pos,
            rms_norm_eps=text.get("rms_norm_eps", text.get("layer_norm_eps", 1e-5)),
            rope_theta=text.get("rope_theta", 10000.0),
            rope_scaling=text.get("rope_scaling"),
            # HF configs omit fields equal to the class default — which is
            # True for the Gemma family.
            tie_word_embeddings=hf.get(
                "tie_word_embeddings",
                str(hf.get("model_type", "")).startswith("gemma"),
            ),
            attention_bias=text.get(
                "attention_bias", text.get("qkv_bias", False)
            ),
            mlp_bias=text.get("mlp_bias", False),
            hidden_act=text.get(
                "hidden_act", text.get("hidden_activation", "silu")
            ),
            sliding_window=text.get("sliding_window"),
            qk_norm="qwen3" in str(hf.get("model_type", "")).lower(),
            final_logit_softcap=text.get("final_logit_softcapping"),
            attn_logit_softcap=text.get("attn_logit_softcapping"),
            partial_rotary_factor=text.get("partial_rotary_factor", 1.0),
            num_experts=text.get(
                "num_local_experts",
                text.get(
                    "n_routed_experts",
                    text.get(
                        "num_experts",  # qwen-moe / olmoe / hunyuan
                        text.get("moe_num_experts", 0) or 0,  # ernie 4.5
                    ) or 0,
                ),
            ),
            num_experts_per_tok=(
                text.get("num_experts_per_tok")
                or text.get("moe_k")  # ernie 4.5
                or text.get("moe_topk")  # hunyuan
                or 0
            ),
            moe_intermediate_size=text.get("moe_intermediate_size"),
            norm_topk_prob=text.get("norm_topk_prob", True),
            dtype=parse_dtype(dtype),
            context_length=context_length or max_pos,
            model_path=model_path,
            hf_config=hf,
            bos_token_id=text.get("bos_token_id"),
            eos_token_ids=eos_ids,
            attention_arch=attention_arch,
        )
        from sglang_tpu.layers.quantization import QuantConfig

        cfg.quant_config = QuantConfig.from_hf(hf)
        return cfg

    @classmethod
    def from_model_path(
        cls,
        model_path: str,
        dtype: str = "bfloat16",
        context_length: Optional[int] = None,
        trust_remote_code: bool = False,
    ) -> "ModelConfig":
        # GGUF checkpoints carry the config in their metadata (reference
        # GGUFModelLoader derives the HF config the same way)
        gguf_path = None
        if model_path.endswith(".gguf") and os.path.isfile(model_path):
            gguf_path = model_path
        elif os.path.isdir(model_path) and not os.path.exists(
            os.path.join(model_path, "config.json")
        ):
            import glob as _glob

            gg = sorted(_glob.glob(os.path.join(model_path, "*.gguf")))
            if gg:
                gguf_path = gg[0]
        if gguf_path is not None:
            from sglang_tpu.model_loader.gguf import (
                GGUFFile,
                gguf_config_to_hf,
            )

            hf = gguf_config_to_hf(GGUFFile(gguf_path).metadata)
            return cls.from_hf_dict(
                hf, model_path=model_path, dtype=dtype,
                context_length=context_length,
            )
        cfg_file = os.path.join(model_path, "config.json")
        if not os.path.exists(cfg_file):
            raise FileNotFoundError(
                f"config.json not found under {model_path!r}; "
                "pass a local model directory"
            )
        with open(cfg_file) as f:
            hf = json.load(f)
        return cls.from_hf_dict(
            hf, model_path=model_path, dtype=dtype, context_length=context_length
        )
