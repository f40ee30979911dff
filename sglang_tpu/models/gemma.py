"""Gemma 1 / 2 / 3 (text) causal LMs.

Equivalent role to the reference's ``srt/models/gemma.py`` /
``gemma2.py`` / ``gemma3_causal.py`` — on the shared Llama-style stack
with Gemma's differences expressed through the base-class hooks:

* embeddings scaled by sqrt(hidden_size)
* RMSNorm computes ``x * (1 + w)`` (weights stored zero-centered)
* Gemma 2/3: post-attention and post-feedforward norms before the
  residual adds; attn/final logit softcaps (2 only)
* Gemma 2: sliding-window attention on even layers
* Gemma 3: qk-norm; local layers use sliding window + rope theta 10k,
  every ``sliding_window_pattern``-th layer is global with rope 1M
"""

from __future__ import annotations

import math

import numpy as np

from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.models.llama import LlamaForCausalLM


class GemmaForCausalLM(LlamaForCausalLM):
    norm_offset = 1.0
    has_post_norms = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        self.embed_scale = math.sqrt(config.hidden_size)


class Gemma2ForCausalLM(GemmaForCausalLM):
    has_post_norms = True

    def per_layer_window(self) -> np.ndarray:
        """Sliding window on even layers (HF Gemma2 convention)."""
        L = self.config.num_hidden_layers
        w = self.config.sliding_window or 0
        out = np.zeros((L,), np.int32)
        out[0::2] = w
        return out

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        renames = {
            "post_attention_layernorm.weight": "layers.post_attn_ln",
            "pre_feedforward_layernorm.weight": "layers.post_ln",
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


class Gemma3ForCausalLM(Gemma2ForCausalLM):
    has_qk_norm = True

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config.get("text_config", config.hf_config)
        self.pattern = hf.get("sliding_window_pattern", 6)
        local_theta = hf.get("rope_local_base_freq", 10000.0)
        # Global layers use config.rope_theta (1M); local layers 10k and
        # no rope scaling.
        self.inv_freq_local = compute_inv_freq(
            config.head_dim, local_theta, None, config.partial_rotary_factor
        )

    def _is_global(self, layer: int) -> bool:
        return (layer + 1) % self.pattern == 0

    def per_layer_window(self) -> np.ndarray:
        L = self.config.num_hidden_layers
        w = self.config.sliding_window or 0
        return np.asarray(
            [0 if self._is_global(i) else w for i in range(L)], np.int32
        )

    def per_layer_inv_freq(self) -> np.ndarray:
        L = self.config.num_hidden_layers
        return np.stack(
            [
                self.inv_freq if self._is_global(i) else self.inv_freq_local
                for i in range(L)
            ]
        )




class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    """Gemma 3 multimodal text trunk (the SigLIP tower + projector live
    in multimodal/gemma3.py).  Image-token spans (negative-sentinel
    runs) attend each other BIDIRECTIONALLY — the _bidir_groups hook
    feeds the OR-mask in attention_xla, so the family forces the XLA
    attention path.  Spans must be separated by at least one text token
    (Gemma's chat template always is) and must not straddle a prefill
    chunk boundary (size chunks >= mm_tokens_per_image + markers)."""

    force_xla_attention = True
    supports_cp = False
    supports_pp_wavefront = False

    def _bidir_groups(self, batch):
        import jax.numpy as jnp

        ids = batch.input_ids
        if ids.shape[1] == 1:
            return None  # decode: new tokens are text (causal)
        img = ids < 0
        prev = jnp.pad(img[:, :-1], ((0, 0), (1, 0)))
        starts = img & ~prev
        gid = jnp.cumsum(starts.astype(jnp.int32), axis=1) - 1
        return jnp.where(img, gid, -1)

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()

        def mapping(name: str):
            if "vision_tower" in name or "multi_modal_projector" in name:
                return None  # the processor loads the tower separately
            name = name.replace("model.language_model.", "model.")
            name = name.replace("language_model.", "")
            return base(name)

        return mapping


EntryClass = [
    GemmaForCausalLM,
    Gemma2ForCausalLM,
    Gemma3ForCausalLM,
    Gemma3ForConditionalGeneration,
]
