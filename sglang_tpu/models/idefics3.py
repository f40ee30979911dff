"""Idefics3 / SmolVLM conditional generation.

Equivalent role to the reference's ``srt/models/idefics2.py`` lineage —
the text trunk is a Llama stack under the ``model.text_model.`` prefix
(vision lives in multimodal/idefics3.py)."""

from __future__ import annotations

from sglang_tpu.models.llama import LlamaForCausalLM


def _make_trunk(config, mesh_ctx):
    class _Trunk(LlamaForCausalLM):
        def hf_weight_mapping(self):
            inner = super().hf_weight_mapping()

            def mapping(name: str):
                if "vision_model" in name or "connector" in name:
                    return None
                name = name.replace("model.text_model.", "model.")
                name = name.replace("text_model.", "")
                return inner(name)

            return mapping

    return _Trunk(config, mesh_ctx=mesh_ctx)


class Idefics3ForConditionalGeneration:
    def __new__(cls, config, mesh_ctx=None):
        return _make_trunk(config, mesh_ctx)


class SmolVLMForConditionalGeneration:
    def __new__(cls, config, mesh_ctx=None):
        return _make_trunk(config, mesh_ctx)


EntryClass = [
    Idefics3ForConditionalGeneration,
    SmolVLMForConditionalGeneration,
]
