"""OLMo 2 causal LM.

Equivalent role to the reference's ``srt/models/olmo2.py`` — the
Llama-style stack with OLMo2's differences via base-class hooks:

* NO pre-norms: each block normalizes its OUTPUT
  (``h += post_attention_layernorm(attn(h))``,
  ``h += post_feedforward_layernorm(mlp(h))``)
* q/k RMSNorm over the FLAT projection (num_heads * head_dim), applied
  before the head split
"""

from __future__ import annotations

from sglang_tpu.models.llama import LlamaForCausalLM


class Olmo2ForCausalLM(LlamaForCausalLM):
    has_pre_norms = False
    has_post_norms = True
    has_qk_norm = True
    qk_norm_full = True

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        renames = {
            "post_attention_layernorm.weight": "layers.post_attn_ln",
            "post_feedforward_layernorm.weight": "layers.post_ffw_ln",
        }

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2 :])
                if tail in renames:
                    return (renames[tail], li, None)
            return base(name)

        return mapping


EntryClass = [Olmo2ForCausalLM]
