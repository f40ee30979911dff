"""GPT-2 and GPT-BigCode (SantaCoder/StarCoderBase) causal LMs.

Equivalent role to the reference's ``srt/models/gpt2.py`` and
``srt/models/gpt_bigcode.py`` — the classic pre-norm transformer on the
shared llama stack via hooks:

* learned ABSOLUTE position embeddings (``has_abs_pos``; rotary angles
  zeroed so the shared rope application is the identity)
* LayerNorm with bias, biases on every projection, non-gated gelu MLP
  (all inherited from the StarCoder2 hooks)
* fused ``c_attn`` projection: GPT-2 stores Conv1D weights ``[in, out]``
  (split columns, no transpose); GPT-BigCode uses nn.Linear ``[out,
  in]`` (transpose then split) and is MULTI-QUERY (1 kv head)
* tied embeddings (``wte``), position table ``wpe``
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.models.starcoder import Starcoder2ForCausalLM


class GPT2LMHeadModel(Starcoder2ForCausalLM):
    has_abs_pos = True
    _cattn_conv1d = True  # Conv1D weights are already [in, out]

    def hf_weight_mapping(self):
        hq, hkv, d = self.hq, self.hkv, self.hd
        conv = self._cattn_conv1d

        def split_qkv(t):
            w = np.asarray(t, np.float32)
            if not conv:
                w = w.T  # nn.Linear [out, in] → [in, out]
            return {
                "q_proj": w[:, : hq * d],
                "k_proj": w[:, hq * d : (hq + hkv) * d],
                "v_proj": w[:, (hq + hkv) * d :],
            }

        def split_bias(t):
            b = np.asarray(t, np.float32)
            return {
                "q_bias": b[: hq * d],
                "k_bias": b[hq * d : (hq + hkv) * d],
                "v_bias": b[(hq + hkv) * d :],
            }

        table = {
            "ln_1.weight": ("layers.input_ln", None),
            "ln_1.bias": ("layers.input_ln_b", None),
            "attn.c_attn.weight": ("layers", split_qkv),
            "attn.c_attn.bias": ("layers", split_bias),
            "attn.c_proj.weight": (
                "layers.o_proj", None if conv else "t",
            ),
            "attn.c_proj.bias": ("layers.o_bias", None),
            "ln_2.weight": ("layers.post_ln", None),
            "ln_2.bias": ("layers.post_ln_b", None),
            "mlp.c_fc.weight": ("layers.c_fc", None if conv else "t"),
            "mlp.c_fc.bias": ("layers.c_fc_b", None),
            "mlp.c_proj.weight": (
                "layers.c_proj", None if conv else "t",
            ),
            "mlp.c_proj.bias": ("layers.c_proj_b", None),
        }

        def mapping(name: str):
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if name == "wte.weight":
                return ("embed", None, None)
            if name == "wpe.weight":
                return ("pos_embed", None, None)
            if name == "ln_f.weight":
                return ("final_ln", None, None)
            if name == "ln_f.bias":
                return ("final_ln_b", None, None)
            if name == "lm_head.weight":
                if self.config.tie_word_embeddings:
                    return None
                return ("lm_head", None, None)
            parts = name.split(".")
            if parts[0] != "h":
                return None
            li = int(parts[1])
            tail = ".".join(parts[2:])
            if tail not in table:
                return None
            path, tf = table[tail]
            return (path, li, tf)

        return mapping


class GPTBigCodeForCausalLM(GPT2LMHeadModel):
    """GPT-BigCode: GPT-2 layout with nn.Linear projections (transposed
    on load) and multi-query attention (1 kv head, from config
    ``multi_query``)."""

    _cattn_conv1d = False


EntryClass = [GPT2LMHeadModel, GPTBigCodeForCausalLM]
