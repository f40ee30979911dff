"""Mistral 3 (Pixtral-towered) conditional generation.

Equivalent role to the reference's ``srt/models/mistral_large_3.py`` /
ministral3: the text trunk is a plain Mistral stack (vision lives in
multimodal/pixtral.py); construction returns the trunk with a
``language_model``-stripping weight mapping."""

from __future__ import annotations

from sglang_tpu.models.llama import MistralForCausalLM


class Mistral3ForConditionalGeneration:
    def __new__(cls, config, mesh_ctx=None):
        class _Trunk(MistralForCausalLM):
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

        return _Trunk(config, mesh_ctx=mesh_ctx)


EntryClass = [Mistral3ForConditionalGeneration]
