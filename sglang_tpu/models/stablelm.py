"""StabilityAI StableLM-2 causal LM.

Equivalent role to the reference's ``srt/models/stablelm.py`` — a llama
stack with LayerNorm (+bias) instead of RMSNorm, PARTIAL rotary
(``partial_rotary_factor``, handled by the shared rope path), optional
qkv biases (``use_qkv_bias``), and a standard gated-silu MLP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_tpu.models.llama import LlamaForCausalLM


class StableLmForCausalLM(LlamaForCausalLM):
    has_norm_bias = True

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        if hf.get("use_qkv_bias"):
            self.has_qkv_bias = True
        if hf.get("use_parallel_residual") or hf.get("qk_layernorm"):
            raise NotImplementedError(
                "StableLM parallel-residual / per-head qk LayerNorm "
                "variants are not supported"
            )

    def _norm(self, x, w, b=None):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        eps = (self.config.hf_config or {}).get("layer_norm_eps", 1e-5)
        out = (xf - mu) * jax.lax.rsqrt(var + eps) * w
        if b is not None:
            out = out + b
        return out.astype(x.dtype)

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        table = {
            "input_layernorm.bias": ("layers.input_ln_b", None),
            "post_attention_layernorm.bias": ("layers.post_ln_b", None),
        }

        def mapping(name: str):
            if name in ("model.norm.bias", "norm.bias"):
                return ("final_ln_b", None, None)
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2:])
                if tail in table:
                    path, tf = table[tail]
                    return (path, li, tf)
            return base(name)

        return mapping


EntryClass = [StableLmForCausalLM]
