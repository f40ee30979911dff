"""IBM Granite causal LMs (dense + MoE).

Equivalent role to the reference's ``srt/models/granite.py`` and
``srt/models/granitemoe.py`` — a Llama stack scaled by four config
multipliers:

* ``embedding_multiplier`` scales the token embeddings
* ``attention_multiplier`` replaces 1/sqrt(head_dim) as the attention
  score scale
* ``residual_multiplier`` scales each block's contribution before the
  residual add
* ``logits_scaling`` DIVIDES the final logits

The MoE variant stores experts as FUSED stacked tensors
(``input_linear`` [E, 2I, H] = gate;up concatenated, ``output_linear``
[E, H, I]) and gates with top-k-then-softmax — identical to
softmax→top-k→renormalize, i.e. the Mixtral path with
``norm_topk_prob=True``.
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.models.mixtral import MixtralForCausalLM


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


class GraniteMoeForCausalLM(MixtralForCausalLM):
    """Granite multipliers on a Mixtral-style token-choice MoE with
    fused stacked expert tensors (HF GraniteMoeParallelExperts)."""

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

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        I = self.moe_inter

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2:])
                if tail == "block_sparse_moe.input_linear.weight":
                    # [E, 2I, H]: rows 0..I are the gate proj, I..2I the
                    # up proj (HF chunk(2, dim=-1) on the [.., 2I] output)
                    def split(t, I=I):
                        w = np.asarray(t, np.float32)
                        return {
                            "moe_w1": w[:, :I, :].transpose(0, 2, 1),
                            "moe_w3": w[:, I:, :].transpose(0, 2, 1),
                        }

                    return ("layers", li, split)
                if tail == "block_sparse_moe.output_linear.weight":
                    return (
                        "layers.moe_w2", li,
                        lambda t: np.asarray(t).transpose(0, 2, 1),
                    )
                if tail == "block_sparse_moe.router.layer.weight":
                    return ("layers.moe_gate", li, "t")
            return base(name)

        return mapping


class GraniteMoeSharedForCausalLM(GraniteMoeForCausalLM):
    """GraniteMoeShared (reference ``srt/models/granitemoe.py`` shared
    lineage): GraniteMoE plus an ALWAYS-ON shared MLP per layer, stored
    fused like the experts (``shared_mlp.input_linear`` [2S, H] = gate;up
    rows, ``output_linear`` [H, S])."""

    def _mlp_shapes(self, L, H, I):
        shapes = super()._mlp_shapes(L, H, I)
        S = int((self.config.hf_config or {}).get(
            "shared_intermediate_size", 0
        ))
        self._shared_I = S
        if S:
            shapes["shared_gate"] = (L, H, S)
            shapes["shared_up"] = (L, H, S)
            shapes["shared_down"] = (L, S, H)
        return shapes

    def _mlp_specs(self):
        from jax.sharding import PartitionSpec as P

        from sglang_tpu.parallel.mesh import AXIS_TP

        specs = super()._mlp_specs()
        if (self.config.hf_config or {}).get("shared_intermediate_size"):
            specs["shared_gate"] = P(None, None, AXIS_TP)
            specs["shared_up"] = P(None, None, AXIS_TP)
            specs["shared_down"] = P(None, AXIS_TP, None)
        return specs

    def _mlp_forward(self, w, normed, proj=None):
        from sglang_tpu.layers.activation import act_and_mul
        from sglang_tpu.parallel.mesh import AXIS_TP

        out = super()._mlp_forward(w, normed, proj)
        if "shared_gate" in w:
            shared = act_and_mul(
                self.config.hidden_act,
                normed @ w["shared_gate"],
                normed @ w["shared_up"],
            )
            shared = self._shard(shared, None, None, AXIS_TP)
            out = out + shared @ w["shared_down"]
        return out

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2:])
                if tail == "shared_mlp.input_linear.weight":
                    def split(t):
                        w = np.asarray(t, np.float32)  # [2S, H]
                        S = w.shape[0] // 2
                        return {
                            "shared_gate": w[:S].T,
                            "shared_up": w[S:].T,
                        }

                    return ("layers", li, split)
                if tail == "shared_mlp.output_linear.weight":
                    return ("layers.shared_down", li, "t")
            return base(name)

        return mapping


EntryClass = [
    GraniteForCausalLM,
    GraniteMoeForCausalLM,
    GraniteMoeSharedForCausalLM,
]
