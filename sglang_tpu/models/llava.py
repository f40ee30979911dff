"""LLaVA-family vision-language models (text trunk).

Equivalent role to the reference's ``srt/models/llava.py`` — the language
model is a stock Llama trunk; images run through the CLIP tower +
projector in :mod:`sglang_tpu.multimodal` and enter the prompt as
precomputed embedding rows (negative sentinel ids), so the text engine
is unchanged.  This class only remaps the checkpoint's
``language_model.*`` tensor names (both the legacy and the
post-refactor HF layouts).
"""

from __future__ import annotations

from sglang_tpu.models.llama import LlamaForCausalLM


class LlavaForConditionalGeneration(LlamaForCausalLM):
    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()

        def mapping(name: str):
            if "vision_tower" in name or "multi_modal_projector" in name:
                return None  # loaded by the multimodal processor
            if name.startswith("language_model."):  # legacy layout
                name = name[len("language_model."):]
            elif name.startswith("model.language_model."):  # ≥4.52 layout
                name = "model." + name[len("model.language_model."):]
            return base(name)

        return mapping


class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):
    """Single-tile path (anyres tiling lands later)."""


EntryClass = [
    LlavaForConditionalGeneration,
    LlavaNextForConditionalGeneration,
]
