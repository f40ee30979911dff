"""Adept Persimmon causal LM.

Equivalent role to the reference's ``srt/models/persimmon.py`` — a
bias-everywhere LayerNorm transformer on the StarCoder2 hooks:

* fused ``query_key_value`` projection stored HEAD-INTERLEAVED
  (``[heads, 3, head_dim]`` per output block — split accordingly)
* PER-HEAD q/k LayerNorm WITH bias (``qk_norm_bias``), applied before
  the partial rotary (``partial_rotary_factor`` 0.5)
* non-gated ReLU² MLP with biases (``dense_h_to_4h``/``dense_4h_to_h``)
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.models.starcoder import Starcoder2ForCausalLM


class PersimmonForCausalLM(Starcoder2ForCausalLM):
    has_qk_norm = True
    qk_norm_bias = True

    def hf_weight_mapping(self):
        hq, d = self.hq, self.hd

        def split_qkv(t):
            # [3*H, H_in] with rows blocked [heads, 3, d]
            w = np.asarray(t, np.float32).T.reshape(-1, hq, 3, d)
            return {
                "q_proj": w[:, :, 0].reshape(w.shape[0], hq * d),
                "k_proj": w[:, :, 1].reshape(w.shape[0], hq * d),
                "v_proj": w[:, :, 2].reshape(w.shape[0], hq * d),
            }

        def split_bias(t):
            b = np.asarray(t, np.float32).reshape(hq, 3, d)
            return {
                "q_bias": b[:, 0].reshape(hq * d),
                "k_bias": b[:, 1].reshape(hq * d),
                "v_bias": b[:, 2].reshape(hq * d),
            }

        table = {
            "self_attn.query_key_value.weight": ("layers", split_qkv),
            "self_attn.query_key_value.bias": ("layers", split_bias),
            "self_attn.dense.weight": ("layers.o_proj", "t"),
            "self_attn.dense.bias": ("layers.o_bias", None),
            "self_attn.q_layernorm.weight": ("layers.q_norm", None),
            "self_attn.q_layernorm.bias": ("layers.q_norm_b", None),
            "self_attn.k_layernorm.weight": ("layers.k_norm", None),
            "self_attn.k_layernorm.bias": ("layers.k_norm_b", None),
            "input_layernorm.weight": ("layers.input_ln", None),
            "input_layernorm.bias": ("layers.input_ln_b", None),
            "post_attention_layernorm.weight": ("layers.post_ln", None),
            "post_attention_layernorm.bias": ("layers.post_ln_b", None),
            "mlp.dense_h_to_4h.weight": ("layers.c_fc", "t"),
            "mlp.dense_h_to_4h.bias": ("layers.c_fc_b", None),
            "mlp.dense_4h_to_h.weight": ("layers.c_proj", "t"),
            "mlp.dense_4h_to_h.bias": ("layers.c_proj_b", None),
        }

        def mapping(name: str):
            if name.startswith("model."):
                name = name[len("model."):]
            if name == "embed_tokens.weight":
                return ("embed", None, None)
            if name == "final_layernorm.weight":
                return ("final_ln", None, None)
            if name == "final_layernorm.bias":
                return ("final_ln_b", None, None)
            if name == "lm_head.weight":
                if self.config.tie_word_embeddings:
                    return None
                return ("lm_head", None, None)
            parts = name.split(".")
            if parts[0] != "layers":
                return None
            li = int(parts[1])
            tail = ".".join(parts[2:])
            if tail not in table:
                return None
            path, tf = table[tail]
            return (path, li, tf)

        return mapping


EntryClass = [PersimmonForCausalLM]
