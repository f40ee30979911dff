"""Qwen2-VL family: ViT with 2D rotary + M-RoPE text model.

Equivalent role to the reference's ``srt/models/qwen2_vl.py`` (+
``qwen2_5_vl.py``): a qwen2 text trunk whose rotary positions are
3-DIMENSIONAL (temporal / height / width — "M-RoPE"), fed by a vision
transformer with 2D rotary embeddings and a 2×2 spatial merger.

TPU-native notes: M-RoPE is a trace-time GATHER over the per-axis
rotary angles — sections of the rotary half-dim read from axis
``section_map[j]`` — so the text forward stays one fused program; the
3D positions for a prompt pack as three extra planes (prefill) while
DECODE needs only a per-request scalar delta (all three axes advance
together after the last image), which rides the packed buffer.
The vision tower is a dense JAX forward like the CLIP tower
(multimodal/); its outputs splice through the existing
negative-sentinel input_embeds path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.models.llama import LlamaForCausalLM


class Qwen2VLForConditionalGeneration(LlamaForCausalLM):
    """Text trunk (the vision tower lives in the multimodal processor)."""

    supports_cp = False  # M-RoPE positions don't zigzag-shard yet
    supports_pp_wavefront = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        self.has_qkv_bias = True  # qwen2 attention bias
        hf = config.hf_config or {}
        text = hf.get("text_config", hf)
        rs = text.get("rope_scaling") or {}
        sec = rs.get("mrope_section")
        if sec is None:
            sec = [self.rot_dim // 2, 0, 0]
        # section j of the rotary half-dim reads axis section_map[j]
        m = []
        for axis, n in enumerate(sec):
            m.extend([axis] * n)
        assert len(m) == self.rot_dim // 2, (sec, self.rot_dim)
        self.mrope_section_map = np.asarray(m, np.int32)
        self.needs_mrope = True

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()

        def mapping(name: str):
            # strip the multimodal nesting; skip the vision tower (the
            # processor loads it separately)
            if ".visual." in name or name.startswith("visual."):
                return None
            name = name.replace("model.language_model.", "model.")
            name = name.replace("language_model.", "")
            return base(name)

        return mapping

    def _apply_rope(self, x, cos, sin, rot_half, d):
        # identical math to the base half-split rope; cos/sin already
        # carry the M-RoPE axis selection (built in layer_fn)
        return super()._apply_rope(x, cos, sin, rot_half, d)


class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """Qwen2.5-VL text trunk (reference ``srt/models/qwen2_5_vl.py``):
    identical M-RoPE text model; the vision tower differences (RMSNorm,
    SwiGLU, windowed attention) live in
    multimodal/qwen_vl.Qwen25VLProcessor."""


class Qwen3VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """Qwen3-VL text trunk (reference ``srt/models/qwen3_vl.py``):
    Qwen3 attention (per-head qk RMSNorm, no biases) with INTERLEAVED
    M-RoPE — frequency j reads axis T by default, H at j ∈ {1, 4, ...,
    3·sec_h−2}, W at j ∈ {2, 5, ..., 3·sec_w−1} (HF
    apply_interleaved_mrope) — plus DEEPSTACK: the processor's extra
    feature planes add into the residual stream after the first
    ``deepstack_layers`` text layers at visual positions (llama.py
    deepstack injection)."""

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        self.has_qkv_bias = False
        self.has_qk_norm = True
        hf = config.hf_config or {}
        text = hf.get("text_config", hf)
        rs = text.get("rope_scaling") or {}
        sec = rs.get("mrope_section") or [self.rot_dim // 2, 0, 0]
        if rs.get("mrope_interleaved", True):
            m = np.zeros((self.rot_dim // 2,), np.int32)
            for axis in (1, 2):
                m[axis : 3 * sec[axis] : 3] = axis
            self.mrope_section_map = m
        # else: the contiguous-block map from the base class stands
        vcfg = hf.get("vision_config") or {}
        self.deepstack_layers = len(
            vcfg.get("deepstack_visual_indexes") or ()
        )


class Qwen3VLMoeForConditionalGeneration(
    Qwen3VLForConditionalGeneration
):
    """Qwen3-VL-MoE (reference ``srt/models/qwen3_vl_moe.py``): the
    Qwen3-VL trunk (deepstack + interleaved M-RoPE) with the Mixtral
    MoE MLP.  HF stores experts as FUSED STACKED tensors —
    ``mlp.experts.gate_up_proj`` [E, H, 2·MI] (gate then up halves,
    already [in, out]) and ``down_proj`` [E, MI, H] — and always
    renormalizes the top-k softmax weights."""

    def __new__(cls, config, mesh_ctx=None):
        from sglang_tpu.models.mixtral import MixtralForCausalLM

        class _Trunk(Qwen3VLForConditionalGeneration, MixtralForCausalLM):
            def hf_weight_mapping(self):
                base = super().hf_weight_mapping()
                MI = self.moe_inter

                def mapping(name: str):
                    n = name.replace(
                        "model.language_model.", "model."
                    ).replace("language_model.", "")
                    parts = n.split(".")
                    if "layers" in parts:
                        li = int(parts[parts.index("layers") + 1])
                        tail = ".".join(
                            parts[parts.index("layers") + 2:]
                        )
                        if tail == "mlp.experts.gate_up_proj":
                            def split(t, MI=MI):
                                w = np.asarray(t, np.float32)
                                return {
                                    "moe_w1": w[..., :MI],
                                    "moe_w3": w[..., MI:],
                                }

                            return ("layers", li, split)
                        if tail == "mlp.experts.down_proj":
                            return ("layers.moe_w2", li, None)
                        if tail == "mlp.gate.weight":
                            return ("layers.moe_gate", li, "t")
                    return base(name)

                return mapping

        return _Trunk(config, mesh_ctx=mesh_ctx)


EntryClass = [
    Qwen2VLForConditionalGeneration,
    Qwen2_5_VLForConditionalGeneration,
    Qwen3VLForConditionalGeneration,
    Qwen3VLMoeForConditionalGeneration,
]


class InternVLForConditionalGeneration:
    """Dispatcher: InternVL's text trunk follows its text_config
    architecture (Qwen2/Qwen3/Llama); vision lives in
    multimodal/internvl.py.  Construction returns the right trunk
    subclass with the language_model-stripping weight mapping."""

    def __new__(cls, config, mesh_ctx=None):
        from sglang_tpu.models.llama import (
            LlamaForCausalLM,
            Qwen2ForCausalLM,
            Qwen3ForCausalLM,
        )

        hf = config.hf_config or {}
        text_arch = (
            (hf.get("text_config") or {}).get("architectures")
            or ["Qwen2ForCausalLM"]
        )[0]
        base = {
            "Qwen2ForCausalLM": Qwen2ForCausalLM,
            "Qwen3ForCausalLM": Qwen3ForCausalLM,
            "LlamaForCausalLM": LlamaForCausalLM,
        }.get(text_arch, Qwen2ForCausalLM)

        class _InternVLTrunk(base):
            def hf_weight_mapping(self):
                inner = super().hf_weight_mapping()

                def mapping(name: str):
                    if (
                        "vision_tower" in name
                        or "multi_modal_projector" in name
                    ):
                        return None
                    name = name.replace("model.language_model.", "model.")
                    name = name.replace("language_model.", "")
                    return inner(name)

                return mapping

        return _InternVLTrunk(config, mesh_ctx=mesh_ctx)


EntryClass.append(InternVLForConditionalGeneration)
