"""Databricks DBRX sparse-MoE causal LM.

Equivalent role to the reference's ``srt/models/dbrx.py`` — a
Mixtral-style token-choice MoE trunk with DBRX's quirks:

* nested HF config (``d_model``/``n_heads``/``attn_config``/
  ``ffn_config``) — normalized to the standard field names in
  ``ModelConfig.from_hf_dict``
* fused ``Wqkv`` projection clamped to ±``clip_qkv`` (the llama base's
  ``clip_qkv`` hook)
* LayerNorm WITHOUT bias (norm_1 / norm_2 / norm_f), not RMSNorm
* experts stored as flat ``[E*I, H]`` slabs (``mlp.w1``/``v1``/``w2``);
  ``w2`` is applied UN-transposed (``inter @ w2[e]``), so it reshapes
  straight into our ``[E, I, H]`` layout
* router: softmax → top-k → p-norm normalize (p=1 in released configs
  == the standard renormalization path)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.models.mixtral import MixtralForCausalLM


class DbrxForCausalLM(MixtralForCausalLM):
    def _norm(self, x, w, b=None):
        del b  # DBRX LayerNorm carries no bias
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        eps = self.config.rms_norm_eps
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)

    def hf_weight_mapping(self):
        c = self.config
        hq, hkv, d = self.hq, self.hkv, self.hd
        I = self.moe_inter
        E = self.num_experts

        def split_qkv(t):
            w = np.asarray(t, np.float32)  # [hq*d + 2*hkv*d, H]
            return {
                "q_proj": w[: hq * d].T,
                "k_proj": w[hq * d : (hq + hkv) * d].T,
                "v_proj": w[(hq + hkv) * d :].T,
            }

        def expert_in(t):  # [E*I, H] → [E, H, I]
            return (
                np.asarray(t, np.float32)
                .reshape(E, I, -1)
                .transpose(0, 2, 1)
            )

        def expert_out(t):  # [E*I, H] → [E, I, H] (used un-transposed)
            return np.asarray(t, np.float32).reshape(E, I, -1)

        table = {
            "norm_attn_norm.norm_1.weight": ("layers.input_ln", None),
            "norm_attn_norm.attn.Wqkv.weight": ("layers", split_qkv),
            "norm_attn_norm.attn.out_proj.weight": ("layers.o_proj", "t"),
            "norm_attn_norm.norm_2.weight": ("layers.post_ln", None),
            "ffn.router.layer.weight": ("layers.moe_gate", "t"),
            "ffn.experts.mlp.w1": ("layers.moe_w1", expert_in),
            "ffn.experts.mlp.v1": ("layers.moe_w3", expert_in),
            "ffn.experts.mlp.w2": ("layers.moe_w2", expert_out),
        }

        def mapping(name: str):
            if name == "transformer.wte.weight":
                return ("embed", None, None)
            if name == "transformer.norm_f.weight":
                return ("final_ln", None, None)
            if name == "lm_head.weight":
                if c.tie_word_embeddings:
                    return None
                return ("lm_head", None, None)
            parts = name.split(".")
            if "blocks" not in parts:
                return None
            li = int(parts[parts.index("blocks") + 1])
            tail = ".".join(parts[parts.index("blocks") + 2 :])
            if tail not in table:
                return None
            path, tf = table[tail]
            return (path, li, tf)

        return mapping


EntryClass = [DbrxForCausalLM]
