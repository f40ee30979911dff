"""Mixtral / Qwen-MoE sparse-expert causal LMs.

Equivalent role to the reference's ``srt/models/mixtral.py`` and
``srt/models/qwen3_moe.py`` — Llama-style attention (inherited) with the
dense MLP swapped for a token-choice sparse MoE block
(:mod:`sglang_tpu.layers.moe`).  Expert weights are stacked
``[L, E, ...]`` so the layer scan and TP sharding work unchanged.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.moe import moe_block
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP

_EXPERT_RE = re.compile(
    r"(?:block_sparse_moe|mlp)\.experts\.(\d+)\.(w1|w2|w3|gate_proj|up_proj|down_proj)\.weight"
)
_GATE_RE = re.compile(r"(?:block_sparse_moe|mlp)\.gate\.weight")

# HF expert tensor name → our stacked param leaf
_EXPERT_LEAF = {
    "w1": "moe_w1",  # mixtral: w1 = gate proj
    "w3": "moe_w3",  # mixtral: w3 = up proj
    "w2": "moe_w2",  # mixtral: w2 = down proj
    "gate_proj": "moe_w1",  # qwen-moe naming
    "up_proj": "moe_w3",
    "down_proj": "moe_w2",
}


class MixtralForCausalLM(LlamaForCausalLM):
    """Also serves Qwen2Moe/Qwen3Moe (qk-norm via config detection)."""

    # MoE MLP runs a mesh-wide shard_map (EP over tp); it can't nest
    # inside the manual-pp wavefront — pp serializes stages for MoE
    supports_pp_wavefront = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        assert config.num_experts > 0, "MoE model requires num_experts"
        self.num_experts = config.num_experts
        self.top_k = config.num_experts_per_tok
        self.moe_inter = config.moe_intermediate_size or config.intermediate_size

    # ------------------------------------------------------------- params
    def _moe_int8(self) -> bool:
        """INT8-RESIDENT expert weights (reference w8a8_int8 MoE): under
        --quantization w8a8_int8 (incl. fp8 transcode) the stacked expert
        tensors stay int8 in HBM with per-out-channel scales — half the
        expert memory; the dequant folds into the grouped-GEMM consumer."""
        qc = self.config.quant_config
        return qc is not None and qc.method == "w8a8_int8"

    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        from sglang_tpu.layers.quantization import ParamShape

        E, MI = self.num_experts, self.moe_inter
        if self._moe_int8():
            import jax.numpy as jnp

            return {
                "moe_gate": (L, H, E),
                "moe_w1": ParamShape((L, E, H, MI), jnp.int8, fan=H),
                "moe_w1_scale": ParamShape((L, E, 1, MI), jnp.float32,
                                           fan=H),
                "moe_w3": ParamShape((L, E, H, MI), jnp.int8, fan=H),
                "moe_w3_scale": ParamShape((L, E, 1, MI), jnp.float32,
                                           fan=H),
                "moe_w2": ParamShape((L, E, MI, H), jnp.int8, fan=MI),
                "moe_w2_scale": ParamShape((L, E, 1, H), jnp.float32,
                                           fan=MI),
            }
        return {
            "moe_gate": (L, H, E),
            "moe_w1": (L, E, H, MI),
            "moe_w3": (L, E, H, MI),
            "moe_w2": (L, E, MI, H),
        }

    def _expert_parallel(self) -> bool:
        return (
            self.mesh_ctx is not None
            and self.mesh_ctx.parallel.ep_size > 1
            and self.num_experts % self.mesh_ctx.tp_size == 0
        )

    def _mlp_specs(self) -> Dict[str, Any]:
        if self._expert_parallel():
            # experts sharded over the tp axis (reference ep_moe/layer.py)
            specs = {
                "moe_gate": P(None, None, None),
                "moe_w1": P(None, AXIS_TP, None, None),
                "moe_w3": P(None, AXIS_TP, None, None),
                "moe_w2": P(None, AXIS_TP, None, None),
            }
            if self._moe_int8():
                for n in ("moe_w1", "moe_w3", "moe_w2"):
                    specs[n + "_scale"] = P(None, AXIS_TP, None, None)
            return specs
        specs = {
            "moe_gate": P(None, None, None),
            "moe_w1": P(None, None, None, AXIS_TP),
            "moe_w3": P(None, None, None, AXIS_TP),
            "moe_w2": P(None, None, AXIS_TP, None),
        }
        if self._moe_int8():
            specs["moe_w1_scale"] = P(None, None, None, AXIS_TP)
            specs["moe_w3_scale"] = P(None, None, None, AXIS_TP)
            specs["moe_w2_scale"] = P(None, None, None, None)
        return specs

    # ------------------------------------------------------------- forward
    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        if "moe_w1" not in w:
            # dense-prefix layers (GLM4-MoE first_k_dense_replace) carry
            # plain gate/up/down leaves — standard llama MLP
            return LlamaForCausalLM._mlp_forward(self, w, normed, proj)
        del proj  # no LoRA on expert weights (reference likewise)
        capture = getattr(self, "_ecounts_capture", False)
        # int8-resident experts: the per-out-channel scales ride into the
        # grouped GEMM (applied to its OUTPUT rows) so the int8 slabs
        # stay resident in HBM through the dense, EP, and a2a paths
        scales = (
            (w["moe_w1_scale"], w["moe_w3_scale"], w["moe_w2_scale"])
            if self._moe_int8()
            else None
        )
        out = moe_block(
            normed,
            w["moe_gate"],
            w["moe_w1"],
            w["moe_w3"],
            w["moe_w2"],
            scales=scales,
            top_k=self.top_k,
            norm_topk_prob=self.config.norm_topk_prob,
            hidden_act=self.config.hidden_act,
            scoring=getattr(self, "moe_scoring", "softmax"),
            jitter_eps=getattr(self, "moe_jitter_eps", 0.01),
            # elastic-EP recovery injects a selection bias that masks the
            # failed rank's (duplicate) expert slots out of routing
            gate_bias=w.get("gate_bias"),
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
        return out

    # ------------------------------------------------------- weight loading
    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2 :])
                m = _EXPERT_RE.fullmatch(tail)
                if m:
                    expert, leaf = int(m.group(1)), _EXPERT_LEAF[m.group(2)]
                    if self._moe_int8():
                        # quantize to int8-resident + per-out-channel
                        # scale (multi-leaf transform; wants_dequant
                        # makes the loader fold the checkpoint's sibling
                        # weight_scale in BEFORE requantization)
                        def q8(t, leaf=leaf):
                            w = np.asarray(t, np.float32).T  # [in, out]
                            s = np.abs(w).max(axis=0, keepdims=True)
                            s = np.maximum(s, 1e-8) / 127.0
                            qw = np.clip(
                                np.round(w / s), -127, 127
                            ).astype(np.int8)
                            return {
                                leaf: qw,
                                leaf + "_scale": s.astype(np.float32),
                            }

                        q8.wants_dequant = True
                        return ("layers", (li, expert), q8)
                    return (f"layers.{leaf}", (li, expert), "t")
                if _GATE_RE.fullmatch(tail):
                    return ("layers.moe_gate", li, "t")
            return base(name)

        return mapping


class Qwen2MoeForCausalLM(MixtralForCausalLM):
    has_qkv_bias = True


class Qwen3MoeForCausalLM(MixtralForCausalLM):
    has_qkv_bias = False
    has_qk_norm = True


class OlmoeForCausalLM(MixtralForCausalLM):
    """OLMoE (reference ``srt/models/olmoe.py``): Mixtral-style
    token-choice MoE (softmax→topk, norm_topk_prob from config) on a
    llama trunk with FULL-width q/k RMSNorm (OLMo2-style, pre-split)
    and optional ±clip_qkv clamping after the norm."""

    has_qk_norm = True
    qk_norm_full = True


EntryClass = [
    MixtralForCausalLM,
    Qwen2MoeForCausalLM,
    Qwen3MoeForCausalLM,
    OlmoeForCausalLM,
]
