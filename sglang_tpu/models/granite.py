"""IBM Granite causal LM.

Equivalent role to the reference's ``srt/models/granite.py`` — a Llama
stack scaled by four config multipliers:

* ``embedding_multiplier`` scales the token embeddings
* ``attention_multiplier`` replaces 1/sqrt(head_dim) as the attention
  score scale
* ``residual_multiplier`` scales each block's contribution before the
  residual add
* ``logits_scaling`` DIVIDES the final logits
"""

from __future__ import annotations

from sglang_tpu.models.llama import LlamaForCausalLM


class GraniteForCausalLM(LlamaForCausalLM):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        self.embed_scale = float(hf.get("embedding_multiplier", 1.0))
        self.sm_scale = float(
            hf.get("attention_multiplier", self.sm_scale)
        )
        self.residual_multiplier = float(
            hf.get("residual_multiplier", 1.0)
        )
        self.logits_divisor = float(hf.get("logits_scaling", 1.0))


EntryClass = [GraniteForCausalLM]
