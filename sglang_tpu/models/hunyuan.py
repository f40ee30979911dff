"""Tencent HunYuan MoE v1 causal LM.

Equivalent role to the reference's ``srt/models/hunyuan.py`` — a
Mixtral-style token-choice MoE (softmax→top-k→renorm; ``moe_topk``)
with an ALWAYS-ON shared dense MLP added to the routed output, and
per-head q/k RMSNorm (``query_layernorm``/``key_layernorm``) before
rotary."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.models.mixtral import MixtralForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP


class HunYuanMoEV1ForCausalLM(MixtralForCausalLM):
    has_qk_norm = True

    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        shapes = super()._mlp_shapes(L, H, I)
        shapes["shared_gate"] = (L, H, I)
        shapes["shared_up"] = (L, H, I)
        shapes["shared_down"] = (L, I, H)
        return shapes

    def _mlp_specs(self) -> Dict[str, Any]:
        specs = super()._mlp_specs()
        specs["shared_gate"] = P(None, None, AXIS_TP)
        specs["shared_up"] = P(None, None, AXIS_TP)
        specs["shared_down"] = P(None, AXIS_TP, None)
        return specs

    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        out = super()._mlp_forward(w, normed, proj)
        shared = act_and_mul(
            self.config.hidden_act,
            normed @ w["shared_gate"],
            normed @ w["shared_up"],
        )
        shared = self._shard(shared, None, None, AXIS_TP)
        return out + shared @ w["shared_down"]

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        table = {
            "mlp.gate.wg.weight": ("layers.moe_gate", "t"),
            "mlp.shared_mlp.gate_proj.weight": ("layers.shared_gate", "t"),
            "mlp.shared_mlp.up_proj.weight": ("layers.shared_up", "t"),
            "mlp.shared_mlp.down_proj.weight": ("layers.shared_down", "t"),
            "self_attn.query_layernorm.weight": ("layers.q_norm", None),
            "self_attn.key_layernorm.weight": ("layers.k_norm", None),
        }

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2:])
                if tail in table:
                    path, tf = table[tail]
                    return (path, li, tf)
            return base(name)

        return mapping


EntryClass = [HunYuanMoEV1ForCausalLM]
