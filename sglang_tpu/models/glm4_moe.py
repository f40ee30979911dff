"""GLM-4.5 / GLM-4.6 MoE family (HF ``glm4_moe``).

Equivalent role to the reference's ``srt/models/glm4_moe.py`` — a GQA
Llama skeleton (optional per-head qk norms applied BEFORE rope, qkv
bias, partial half-split rotary) with the DeepSeek-V3 MoE recipe:
sigmoid scores, ``e_score_correction_bias`` affecting SELECTION only,
group-limited top-k, normalized weights × ``routed_scaling_factor``,
always-on shared experts — and ``first_k_dense_replace`` DENSE prefix
layers riding the shared stack's dense-prefix scan
(``params["dense_layers"]``)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.layers.quantization import ParamShape
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.models.mixtral import MixtralForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP


def _resize_stack(tree: Dict[str, Any], n: int) -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = {
                sk: (
                    ParamShape((n,) + tuple(sv.shape[1:]), sv.dtype, sv.fan)
                    if isinstance(sv, ParamShape)
                    else (n,) + tuple(sv[1:])
                )
                for sk, sv in v.items()
            }
        elif isinstance(v, ParamShape):
            out[k] = ParamShape((n,) + tuple(v.shape[1:]), v.dtype, v.fan)
        else:
            out[k] = (n,) + tuple(v[1:])
    return out


class Glm4MoeForCausalLM(MixtralForCausalLM):
    supports_pp_wavefront = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        self.has_qkv_bias = bool(hf.get("attention_bias", True))
        if hf.get("use_qk_norm"):
            self.has_qk_norm = True
        self.first_k_dense = int(hf.get("first_k_dense_replace", 0) or 0)
        self.n_shared = int(hf.get("n_shared_experts", 0) or 0)
        self.scoring = "sigmoid"
        self.routed_scaling = float(hf.get("routed_scaling_factor", 1.0))
        self.n_group = int(hf.get("n_group", 1) or 1)
        self.topk_group = int(hf.get("topk_group", 1) or 1)

    # ------------------------------------------------------------- params
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()  # layers [L] with MoE leaves
        c = self.config
        L, H, MI = c.num_hidden_layers, c.hidden_size, self.moe_inter
        kd, Lm = self.first_k_dense, L - self.first_k_dense
        layers = shapes["layers"]
        moe = _resize_stack(layers, Lm)
        moe["gate_bias"] = (Lm, self.num_experts)
        if self.n_shared:
            SI = MI * self.n_shared
            moe["shared_gate"] = (Lm, H, SI)
            moe["shared_up"] = (Lm, H, SI)
            moe["shared_down"] = (Lm, SI, H)
        if kd:
            moe_leaf_names = {
                "moe_gate", "moe_w1", "moe_w3", "moe_w2",
            }
            dense = _resize_stack(
                {
                    k: v for k, v in layers.items()
                    if k not in moe_leaf_names
                },
                kd,
            )
            I = c.intermediate_size
            dense.update(
                gate_proj=(kd, H, I), up_proj=(kd, H, I),
                down_proj=(kd, I, H),
            )
            shapes["dense_layers"] = dense
        shapes["layers"] = moe
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()  # built from the BASE shapes
        layers = dict(specs["layers"])
        layers["gate_bias"] = P(None, None)
        if self.n_shared:
            layers["shared_gate"] = P(None, None, AXIS_TP)
            layers["shared_up"] = P(None, None, AXIS_TP)
            layers["shared_down"] = P(None, AXIS_TP, None)
        specs["layers"] = layers
        if self.first_k_dense:
            moe_leaf_names = {
                "moe_gate", "moe_w1", "moe_w3", "moe_w2",
                "moe_w1_scale", "moe_w3_scale", "moe_w2_scale",
                "gate_bias", "shared_gate", "shared_up", "shared_down",
            }
            dense = {
                k: v for k, v in layers.items()
                if k not in moe_leaf_names
            }
            dense.update(
                gate_proj=P(None, None, AXIS_TP),
                up_proj=P(None, None, AXIS_TP),
                down_proj=P(None, AXIS_TP, None),
            )
            specs["dense_layers"] = dense
        return specs

    # ------------------------------------------------------------- forward
    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        if "moe_w1" not in w:
            return LlamaForCausalLM._mlp_forward(self, w, normed, proj)
        from sglang_tpu.layers.moe import moe_block

        capture = getattr(self, "_ecounts_capture", False)
        out = moe_block(
            normed,
            w["moe_gate"],
            w["moe_w1"],
            w["moe_w3"],
            w["moe_w2"],
            top_k=self.top_k,
            norm_topk_prob=self.config.norm_topk_prob,
            hidden_act=self.config.hidden_act,
            gate_bias=w.get("gate_bias"),
            scoring=self.scoring,
            routed_scaling_factor=self.routed_scaling,
            n_group=self.n_group,
            topk_group=self.topk_group,
            mesh=self.mesh_ctx.mesh if self.mesh_ctx is not None else None,
            expert_parallel=self._expert_parallel(),
            return_counts=capture,
            a2a=(
                self.mesh_ctx is not None
                and self.mesh_ctx.parallel.moe_a2a
            ),
        )
        if capture:
            out, self._moe_counts_stash = out
        if self.n_shared:
            shared = act_and_mul(
                self.config.hidden_act,
                normed @ w["shared_gate"],
                normed @ w["shared_up"],
            )
            shared = self._shard(shared, None, None, AXIS_TP)
            out = out + shared @ w["shared_down"]
        return out

    # ------------------------------------------------------- weight loading
    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()  # mixtral expert + llama names
        kd = self.first_k_dense
        extra = {
            "mlp.gate.weight": "moe_gate.__t",
            "mlp.gate.e_score_correction_bias": "gate_bias.__n",
            "mlp.shared_experts.gate_proj.weight": "shared_gate.__t",
            "mlp.shared_experts.up_proj.weight": "shared_up.__t",
            "mlp.shared_experts.down_proj.weight": "shared_down.__t",
        }
        expert_leaf = {
            "gate_proj": "moe_w1", "up_proj": "moe_w3",
            "down_proj": "moe_w2",
        }

        def mapping(name: str):
            parts = name.split(".")
            if "layers" not in parts:
                return base(name)
            li = int(parts[parts.index("layers") + 1])
            tail = ".".join(parts[parts.index("layers") + 2 :])
            if li < kd:
                # dense prefix: llama-style names into dense_layers
                m = base(name)
                if m is None:
                    return None
                path, idx, tf = m
                return (path.replace("layers.", "dense_layers."), li, tf)
            mi = li - kd
            if ".experts." in f".{tail}":
                sub = tail.split(".")
                e = int(sub[sub.index("experts") + 1])
                leaf = expert_leaf.get(sub[-2])
                if leaf is None:
                    return None
                return (f"layers.{leaf}", (mi, e), "t")
            if tail in extra:
                leaf, kind = extra[tail].split(".__")
                return (f"layers.{leaf}", mi, "t" if kind == "t" else None)
            m = base(name)
            if m is None:
                return None
            path, idx, tf = m
            return (path, mi, tf)

        return mapping


EntryClass = [Glm4MoeForCausalLM]
