"""Baidu ERNIE 4.5 causal LMs (dense + MoE).

Equivalent role to the reference's ``srt/models/ernie4.py`` /
``ernie45_moe``-lineage — the MoE variant rides the GLM4-MoE machinery
(dense-prefix scan + shared experts + selection-bias routing) with
ERNIE's flavors:

* SOFTMAX scoring; ``moe_statics.e_score_correction_bias`` affects
  SELECTION only (weights come from the unbiased probabilities,
  renormalized) — the same contract as DeepSeek's noaux_tc, on the
  softmax path
* config keys: ``moe_num_experts`` / ``moe_k`` /
  ``moe_num_shared_experts`` / ``moe_layer_start_index`` (the dense
  prefix length)
* ``use_bias`` gates qkv biases (default off); embeddings tied

The dense ``Ernie4_5ForCausalLM`` is a plain llama stack with
``use_bias``.
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.models.glm4_moe import Glm4MoeForCausalLM
from sglang_tpu.models.llama import LlamaForCausalLM


class Ernie4_5ForCausalLM(LlamaForCausalLM):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        if (config.hf_config or {}).get("use_bias"):
            # use_bias puts biases on EVERY projection (o_proj + MLP
            # included); released ERNIE 4.5 checkpoints ship use_bias=False
            raise NotImplementedError(
                "ERNIE use_bias=True (biases on o_proj/MLP) unsupported"
            )


class Ernie4_5_MoeForCausalLM(Glm4MoeForCausalLM):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        self.scoring = "softmax"
        if hf.get("use_bias"):
            raise NotImplementedError(
                "ERNIE use_bias=True (biases on o_proj/MLP) unsupported"
            )
        self.has_qkv_bias = False
        self.first_k_dense = int(hf.get("moe_layer_start_index", 0) or 0)
        self.n_shared = int(hf.get("moe_num_shared_experts", 0) or 0)
        self.routed_scaling = 1.0
        self.n_group = 1
        self.topk_group = 1

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        kd = self.first_k_dense

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2:])
                if tail == "mlp.moe_statics.e_score_correction_bias":
                    # stored [1, E] f32 → [E]
                    return (
                        "layers.gate_bias", li - kd,
                        lambda t: np.asarray(t, np.float32)[0],
                    )
            return base(name)

        return mapping


EntryClass = [Ernie4_5ForCausalLM, Ernie4_5_MoeForCausalLM]
