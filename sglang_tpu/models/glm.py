"""GLM-4 family causal LM.

Equivalent role to the reference's ``srt/models/glm4.py`` — a
llama-skeleton decoder with GLM's differences:

* **Interleaved-frequency partial rope**: HF repeat-interleaves the
  cos/sin tables to the full rotary span and applies rotate_half over
  it, so the two rotation halves see DIFFERENT per-lane frequencies
  (freq of lane i is inv_freq[i//2]); the tail past
  ``partial_rotary_factor * head_dim`` passes through unrotated.
* **Fused gate_up_proj** checkpoint tensor (split after the matmul).
* **Post-attention/post-MLP extra norms** (gemma2-style placement) named
  ``post_self_attn_layernorm`` / ``post_mlp_layernorm``.
* qkv bias (attention_bias=True in released configs).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP


class Glm4ForCausalLM(LlamaForCausalLM):
    has_post_norms = True

    # ------------------------------------------------------------- params
    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        return {
            "gate_up_proj": (L, H, 2 * I),
            "down_proj": (L, I, H),
        }

    def _mlp_specs(self) -> Dict[str, Any]:
        return {
            "gate_up_proj": P(None, None, AXIS_TP),
            "down_proj": P(None, AXIS_TP, None),
        }

    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        c = self.config
        gu = normed @ w["gate_up_proj"]
        gate, up = jnp.split(gu, 2, axis=-1)
        inter = act_and_mul(c.hidden_act, gate, up)
        inter = self._shard(inter, None, None, AXIS_TP)
        return inter @ w["down_proj"]

    # --------------------------------------------------------------- rope
    def _apply_rope(self, x, cos, sin, rot_half, d):
        # cos/sin are [B, L, 1, rot_half]; GLM duplicates each frequency
        # onto two adjacent lanes of the FULL rotary span (rot = 2*rot_half)
        # and rotates half-split over that span:
        #   out[i]          = x[i] * cf[i]        - x[i+rot/2] * sf[i]
        #   out[i + rot/2]  = x[i+rot/2] * cf[i+rot/2] + x[i] * sf[i+rot/2]
        # where cf = repeat_interleave(cos, 2).
        xf = x.astype(jnp.float32)
        rot = 2 * rot_half
        cf = jnp.repeat(cos, 2, axis=-1)  # [.., rot]
        sf = jnp.repeat(sin, 2, axis=-1)
        x1, x2 = xf[..., : rot // 2], xf[..., rot // 2 : rot]
        cf1, cf2 = cf[..., : rot // 2], cf[..., rot // 2 :]
        sf1, sf2 = sf[..., : rot // 2], sf[..., rot // 2 :]
        o1 = x1 * cf1 - x2 * sf1
        o2 = x2 * cf2 + x1 * sf2
        if rot < d:
            return jnp.concatenate(
                [o1, o2, xf[..., rot:]], axis=-1
            ).astype(x.dtype)
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)

    # ------------------------------------------------------- weight loading
    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2 :])
                table = {
                    "mlp.gate_up_proj.weight": ("layers.gate_up_proj", "t"),
                    "post_self_attn_layernorm.weight":
                        ("layers.post_attn_ln", None),
                    "post_mlp_layernorm.weight": ("layers.post_ffw_ln", None),
                }
                if tail in table:
                    path, tf = table[tail]
                    return (path, li, tf)
            return base(name)

        return mapping


EntryClass = [Glm4ForCausalLM]
