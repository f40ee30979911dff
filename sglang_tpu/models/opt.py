"""Meta OPT causal LM.

Equivalent role to the reference's ``srt/models/opt.py`` — decoder-only
transformer with learned absolute position embeddings whose table is
OFFSET BY 2 (a relic of the fairseq padding convention), LayerNorm with
bias, biases on every projection, and a non-gated ReLU MLP.  Built on
the StarCoder2 hooks; rotary angles are zeroed (``has_abs_pos``).
"""

from __future__ import annotations

from sglang_tpu.models.starcoder import Starcoder2ForCausalLM


class OPTForCausalLM(Starcoder2ForCausalLM):
    has_abs_pos = True
    pos_offset = 2  # HF OPTLearnedPositionalEmbedding offset

    def __init__(self, config, mesh_ctx=None):
        hf = config.hf_config or {}
        w = hf.get("word_embed_proj_dim", hf["hidden_size"])
        if w != hf["hidden_size"]:
            raise NotImplementedError(
                "OPT word_embed_proj_dim != hidden_size (the 350m "
                "projection variant) is not supported"
            )
        if not hf.get("do_layer_norm_before", True):
            raise NotImplementedError(
                "OPT post-norm (do_layer_norm_before=False) unsupported"
            )
        super().__init__(config, mesh_ctx=mesh_ctx)

    def hf_weight_mapping(self):
        table = {
            "self_attn.q_proj.weight": ("layers.q_proj", "t"),
            "self_attn.q_proj.bias": ("layers.q_bias", None),
            "self_attn.k_proj.weight": ("layers.k_proj", "t"),
            "self_attn.k_proj.bias": ("layers.k_bias", None),
            "self_attn.v_proj.weight": ("layers.v_proj", "t"),
            "self_attn.v_proj.bias": ("layers.v_bias", None),
            "self_attn.out_proj.weight": ("layers.o_proj", "t"),
            "self_attn.out_proj.bias": ("layers.o_bias", None),
            "self_attn_layer_norm.weight": ("layers.input_ln", None),
            "self_attn_layer_norm.bias": ("layers.input_ln_b", None),
            "final_layer_norm.weight": ("layers.post_ln", None),
            "final_layer_norm.bias": ("layers.post_ln_b", None),
            "fc1.weight": ("layers.c_fc", "t"),
            "fc1.bias": ("layers.c_fc_b", None),
            "fc2.weight": ("layers.c_proj", "t"),
            "fc2.bias": ("layers.c_proj_b", None),
        }

        def mapping(name: str):
            for pre in ("model.decoder.", "decoder."):
                if name.startswith(pre):
                    name = name[len(pre):]
                    break
            if name == "embed_tokens.weight":
                return ("embed", None, None)
            if name == "embed_positions.weight":
                return ("pos_embed", None, None)
            if name == "final_layer_norm.weight":
                return ("final_ln", None, None)
            if name == "final_layer_norm.bias":
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


EntryClass = [OPTForCausalLM]
