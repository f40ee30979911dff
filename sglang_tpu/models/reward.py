"""Reward / sequence-classification model classes.

Equivalent role to the reference's reward-model entries in the zoo
(e.g. ``srt/models/llama_reward.py`` LlamaForSequenceClassification /
InternLM2ForRewardModel): a causal-LM trunk with a score head on the
last token's hidden state; served through the embedding path
(``Engine.encode`` → the "embedding" field carries the scores).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.models.llama import LlamaForCausalLM


class LlamaForSequenceClassification(LlamaForCausalLM):
    """Llama trunk + [H, num_labels] score head (reward models)."""

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config
        # HF's default num_labels is 2 and default-valued fields are
        # omitted from config.json; explicit settings win.
        self.num_labels = int(
            hf.get("num_labels") or len(hf.get("id2label") or {}) or 2
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        shapes.pop("lm_head", None)  # no LM head in classification ckpts
        shapes["score"] = (self.config.hidden_size, self.num_labels)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs.pop("lm_head", None)
        specs["score"] = P(None, None)
        return specs

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()

        def mapping(name: str):
            if name in ("score.weight", "classifier.weight"):
                return ("score", None, "t")
            if name == "lm_head.weight":
                return None
            return base(name)

        return mapping

    def compute_score(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        """[B, H] last-token hidden → [B, num_labels] score logits."""
        return hidden @ params["score"]

    def compute_logits(self, params, hidden):  # generation is undefined
        raise RuntimeError(
            "sequence-classification models serve scores via Engine.encode"
        )


class Qwen2ForSequenceClassification(LlamaForSequenceClassification):
    has_qkv_bias = True


class Qwen2ForRewardModel(LlamaForSequenceClassification):
    has_qkv_bias = True


EntryClass = [
    LlamaForSequenceClassification,
    Qwen2ForSequenceClassification,
    Qwen2ForRewardModel,
]
