"""StarCoder2 causal LM.

Equivalent role to the reference's ``srt/models/gpt_bigcode.py`` /
vLLM starcoder2 support — a Llama-style stack with StarCoder2's
differences via base-class hooks:

* LayerNorm (with bias) instead of RMSNorm — ``has_norm_bias`` adds
  the ``*_b`` leaves
* NON-gated MLP: ``c_proj(gelu_tanh(c_fc(x)))``, both with bias
* all attention projections carry biases; embeddings are tied
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP


class Starcoder2ForCausalLM(LlamaForCausalLM):
    has_qkv_bias = True
    has_o_bias = True
    has_norm_bias = True

    def _norm(self, x, w, b=None):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        hf = self.config.hf_config or {}
        eps = hf.get(
            "norm_epsilon", hf.get("layer_norm_epsilon",
                                   self.config.rms_norm_eps)
        )
        out = (xf - mu) * jax.lax.rsqrt(var + eps) * w
        if b is not None:
            out = out + b
        return out.astype(x.dtype)

    # ------------------------------------------------------------- params
    def param_shapes(self):
        shapes = super().param_shapes()
        shapes["layers"]["o_bias"] = (
            self.config.num_hidden_layers, self.config.hidden_size,
        )
        return shapes

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"]["o_bias"] = P(None, None)
        return specs

    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        return {
            "c_fc": (L, H, I),
            "c_fc_b": (L, I),
            "c_proj": (L, I, H),
            "c_proj_b": (L, H),
        }

    def _mlp_specs(self) -> Dict[str, Any]:
        return {
            "c_fc": P(None, None, AXIS_TP),
            "c_fc_b": P(None, AXIS_TP),
            "c_proj": P(None, AXIS_TP, None),
            "c_proj_b": P(None, None),
        }

    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        from sglang_tpu.layers.activation import get_act_fn

        del proj  # no LoRA targets on the non-gated MLP yet
        h = normed @ w["c_fc"] + w["c_fc_b"]
        # starcoder2/gpt-2: gelu tanh; OPT: relu — from config
        h = get_act_fn(self.config.hidden_act)(h)
        h = self._shard(h, None, None, AXIS_TP)
        return h @ w["c_proj"] + w["c_proj_b"]

    # ------------------------------------------------------- weight loading
    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        table = {
            "self_attn.o_proj.bias": ("layers.o_bias", None),
            "mlp.c_fc.weight": ("layers.c_fc", "t"),
            "mlp.c_fc.bias": ("layers.c_fc_b", None),
            "mlp.c_proj.weight": ("layers.c_proj", "t"),
            "mlp.c_proj.bias": ("layers.c_proj_b", None),
            "input_layernorm.bias": ("layers.input_ln_b", None),
            "post_attention_layernorm.bias": ("layers.post_ln_b", None),
        }

        def mapping(name: str):
            if name in ("model.norm.bias", "norm.bias"):
                return ("final_ln_b", None, None)
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2 :])
                if tail in table:
                    path, tf = table[tail]
                    return (path, li, tf)
            return base(name)

        return mapping


EntryClass = [Starcoder2ForCausalLM]
