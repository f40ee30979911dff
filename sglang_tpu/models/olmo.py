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


class Exaone4ForCausalLM(Olmo2ForCausalLM):
    """LG EXAONE 4.0 (reference ``srt/models/exaone4.py``): OLMo2's
    post-block-norm layout (``h += post_*_layernorm(block(h))``) with
    PER-HEAD q/k RMSNorm instead of flat-projection norms.  Hybrid
    configs interleave sliding-window ROPE layers with global NoPE
    layers (HF applies rotary only when ``sliding_window is None or
    is_sliding``) — expressed here as per-layer windows + zeroed
    per-layer inverse frequencies."""

    qk_norm_full = False

    def __init__(self, config, mesh_ctx=None):
        import numpy as np

        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        L = config.num_hidden_layers
        sw = hf.get("sliding_window")
        lt = hf.get("layer_types")
        if not sw:
            self._sliding = np.zeros((L,), bool)  # dense: rope everywhere
        elif lt is not None:
            self._sliding = np.asarray(
                [t == "sliding_attention" for t in lt]
            )
        else:
            pat = hf.get("sliding_window_pattern") or 1
            if isinstance(pat, str):  # "LLLG" → every len-th is global
                pat = len(pat)
            self._sliding = np.asarray(
                [(i + 1) % pat != 0 for i in range(L)]
            )

    def per_layer_window(self):
        import numpy as np

        w = self.config.sliding_window or 0
        return np.where(self._sliding, w, 0).astype(np.int32)

    def per_layer_inv_freq(self):
        base = super().per_layer_inv_freq()
        if not self._sliding.any():
            return base  # dense variant: rope on every layer
        # hybrid: global (non-sliding) layers are NoPE
        return base * self._sliding[:, None]


EntryClass = [Olmo2ForCausalLM, Exaone4ForCausalLM]
