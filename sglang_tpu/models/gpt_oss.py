"""GPT-OSS model family (OpenAI open-weight MoE).

Equivalent role to the reference's ``srt/models/gpt_oss.py``:
alternating sliding/full attention with learned ATTENTION SINKS (a
per-head phantom softmax slot — layers/attention.py), exact YaRN rope
with its attention factor, biased qkv/o projections, and a clamped
swiglu MoE (``(up+1) · gate·σ(1.702·gate)`` with ±7 clamps, softmax
over the top-k router logits).  Served through the llama trunk; the
expert mix runs as dense batched einsums over the stacked expert
tensors (top-k weights mask the sum), the right trade below DeepSeek
scale — EP dispatch plugs in via the shared MoE stack when needed.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.rotary import rope_attention_factor
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP


class GptOssForCausalLM(LlamaForCausalLM):
    supports_cp = False  # sinks not in the CP prefill path

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        self.has_qkv_bias = True
        self.has_o_bias = True
        self.num_experts = int(hf.get("num_local_experts", 32))
        self.top_k = int(hf.get("num_experts_per_tok", 4))
        self.moe_inter = int(hf.get("intermediate_size", 0)) or (
            config.intermediate_size
        )
        self.alpha = 1.702
        self.limit = 7.0
        self.rope_mscale = rope_attention_factor(hf.get("rope_scaling"))
        lt = hf.get("layer_types")
        if lt is None:
            lt = [
                "sliding_attention" if i % 2 == 0 else "full_attention"
                for i in range(config.num_hidden_layers)
            ]
        self._windows = np.asarray(
            [
                (hf.get("sliding_window") or 0)
                if t == "sliding_attention"
                else 0
                for t in lt
            ],
            np.int32,
        )

    def per_layer_window(self) -> np.ndarray:
        return self._windows

    # ------------------------------------------------------------ schema
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, H = c.num_hidden_layers, c.hidden_size
        E, MI = self.num_experts, self.moe_inter
        layers = shapes["layers"]
        for k in ("gate_proj", "up_proj", "down_proj"):
            layers.pop(k, None)
        layers.update(
            {
                "sinks": (L, self.hq),
                "o_bias": (L, H),
                "router_w": (L, H, E),
                "router_b": (L, E),
                "moe_gate_up": (L, E, H, 2 * MI),
                "moe_gate_up_b": (L, E, 2 * MI),
                "moe_down": (L, E, MI, H),
                "moe_down_b": (L, E, H),
            }
        )
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        layers = specs["layers"]
        for k in ("gate_proj", "up_proj", "down_proj"):
            layers.pop(k, None)
        layers.update(
            {
                "sinks": P(None, None),
                "o_bias": P(None, None),
                "router_w": P(None, None, None),
                "router_b": P(None, None),
                "moe_gate_up": P(None, AXIS_TP, None, None),
                "moe_gate_up_b": P(None, AXIS_TP, None),
                "moe_down": P(None, AXIS_TP, None, None),
                "moe_down_b": P(None, AXIS_TP, None),
            }
        )
        return specs

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2 :])
                table = {
                    "self_attn.sinks": ("layers.sinks", None),
                    "self_attn.o_proj.bias": ("layers.o_bias", None),
                    "mlp.router.weight": ("layers.router_w", "t"),
                    "mlp.router.bias": ("layers.router_b", None),
                    "mlp.experts.gate_up_proj": ("layers.moe_gate_up", None),
                    "mlp.experts.gate_up_proj_bias": (
                        "layers.moe_gate_up_b", None,
                    ),
                    "mlp.experts.down_proj": ("layers.moe_down", None),
                    "mlp.experts.down_proj_bias": (
                        "layers.moe_down_b", None,
                    ),
                }
                if tail in table:
                    path, tf = table[tail]
                    return (path, li, tf)
            return base(name)

        return mapping

    # ------------------------------------------------------------ forward
    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        del proj
        E, k = self.num_experts, self.top_k
        x = normed.astype(jnp.float32)
        logits = x @ w["router_w"].astype(jnp.float32) + w["router_b"]
        topv, topi = jax.lax.top_k(logits, k)  # [B, L, k]
        topw = jax.nn.softmax(topv, axis=-1)
        rw = jnp.sum(
            jax.nn.one_hot(topi, E, dtype=jnp.float32)
            * topw[..., None],
            axis=-2,
        )  # [B, L, E] routing weights (0 off the top-k)
        gu = jnp.einsum(
            "blh,ehi->blei", x, w["moe_gate_up"].astype(jnp.float32)
        ) + w["moe_gate_up_b"]
        gate, up = gu[..., 0::2], gu[..., 1::2]
        gate = jnp.minimum(gate, self.limit)
        up = jnp.clip(up, -self.limit, self.limit)
        act = (up + 1.0) * (gate * jax.nn.sigmoid(gate * self.alpha))
        out = jnp.einsum(
            "blei,eih->bleh", act, w["moe_down"].astype(jnp.float32)
        ) + w["moe_down_b"]
        out = jnp.sum(out * rw[..., None], axis=-2)
        return out.astype(normed.dtype)


EntryClass = [GptOssForCausalLM]
