"""Microsoft Phi-3.5-MoE causal LM.

Equivalent role to the reference's ``srt/models/phimoe.py`` — a
Mixtral-layout MoE (``block_sparse_moe.experts.N.w1/w2/w3``) with:

* SPARSEMIXER top-2 routing (arXiv:2409.12136): two greedy argmax
  rounds, each weight the softmax over the round's near-max-masked
  logits (``layers/moe.py`` scoring="sparsemixer")
* LayerNorm WITH bias instead of RMSNorm
* optional longrope su-scaling (same deployment-static factor choice as
  Phi-3) and an optional lm_head bias
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.models.mixtral import MixtralForCausalLM


class PhimoeForCausalLM(MixtralForCausalLM):
    has_norm_bias = True
    moe_scoring = "sparsemixer"

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        self.moe_jitter_eps = float(hf.get("router_jitter_noise", 0.01))
        self.lm_head_bias = bool(hf.get("lm_head_bias", False))
        rs = hf.get("rope_scaling") or {}
        if rs.get("rope_type", rs.get("type", "")) == "longrope":
            orig = int(hf.get("original_max_position_embeddings", 4096))
            scale = config.max_position_embeddings / orig
            factors = np.asarray(
                rs["long_factor"] if scale > 1.0 else rs["short_factor"],
                np.float64,
            )
            rot = self.rot_dim
            base = 1.0 / (
                config.rope_theta
                ** (np.arange(0, rot, 2, dtype=np.float64) / rot)
            )
            self.inv_freq = (base / factors).astype(np.float32)
            mscale = rs.get(
                "long_mscale" if scale > 1.0 else "short_mscale"
            )
            if mscale:
                self.rope_mscale = float(mscale)
            elif scale > 1.0:
                self.rope_mscale = math.sqrt(
                    1.0 + math.log(scale) / math.log(orig)
                )

    def _norm(self, x, w, b=None):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        eps = self.config.rms_norm_eps
        out = (xf - mu) * jax.lax.rsqrt(var + eps) * w
        if b is not None:
            out = out + b
        return out.astype(x.dtype)

    def param_shapes(self):
        shapes = super().param_shapes()
        if self.lm_head_bias:
            shapes["lm_head_b"] = (self.config.vocab_size,)
        return shapes

    def param_specs(self):
        from jax.sharding import PartitionSpec as P

        from sglang_tpu.parallel.mesh import AXIS_TP

        specs = super().param_specs()
        if self.lm_head_bias:
            specs["lm_head_b"] = P(AXIS_TP)
        return specs

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self.lm_head_bias:
            logits = logits + params["lm_head_b"]
        return logits

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        table = {
            "input_layernorm.bias": ("layers.input_ln_b", None),
            "post_attention_layernorm.bias": ("layers.post_ln_b", None),
        }

        def mapping(name: str):
            if name in ("model.norm.bias", "norm.bias"):
                return ("final_ln_b", None, None)
            if name == "lm_head.bias":
                return ("lm_head_b", None, None)
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2:])
                if tail in table:
                    path, tf = table[tail]
                    return (path, li, tf)
            return base(name)

        return mapping


EntryClass = [PhimoeForCausalLM]
