"""Arcee (AFM) causal LM.

Equivalent role to the reference's ``srt/models/arcee.py`` — a llama
stack whose MLP is NON-gated ReLU²: ``down_proj(relu(up_proj(x))²)``,
no gate projection, no biases.  Everything else (RMSNorm, rope, GQA)
is the shared llama path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import get_act_fn
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP


class ArceeForCausalLM(LlamaForCausalLM):
    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        return {"up_proj": (L, H, I), "down_proj": (L, I, H)}

    def _mlp_specs(self) -> Dict[str, Any]:
        return {
            "up_proj": P(None, None, AXIS_TP),
            "down_proj": P(None, AXIS_TP, None),
        }

    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        del proj  # no LoRA targets on the non-gated MLP
        h = get_act_fn(self.config.hidden_act)(normed @ w["up_proj"])
        h = self._shard(h, None, None, AXIS_TP)
        return h @ w["down_proj"]


EntryClass = [ArceeForCausalLM]
