"""NVIDIA Nemotron causal LM.

Equivalent role to the reference's ``srt/models/nemotron_nas.py``
lineage base — a llama stack with Nemotron's quirks:

* LayerNorm1P: LayerNorm computed with ``weight + 1`` (and a bias) —
  the checkpoint stores the weight CENTERED AT ZERO
* non-gated ReLU² MLP (inherited from Arcee's hooks)
* partial rotary (``partial_rotary_factor`` 0.5)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_tpu.models.arcee import ArceeForCausalLM


class NemotronForCausalLM(ArceeForCausalLM):
    has_norm_bias = True

    def _norm(self, x, w, b=None):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        eps = (self.config.hf_config or {}).get("norm_eps", 1e-5)
        out = (xf - mu) * jax.lax.rsqrt(var + eps) * (w + 1.0)
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


EntryClass = [NemotronForCausalLM]
