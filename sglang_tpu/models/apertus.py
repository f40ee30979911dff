"""Swiss AI Apertus causal LM.

Equivalent role to the reference's ``srt/models/apertus.py`` — a llama
stack with:

* NON-gated MLP using the xIELU activation (arXiv:2411.13010) with
  PER-LAYER learned scalars: ``softplus(alpha_p)·x² + beta·x`` for
  x>0, ``(expm1(min(x, eps)) − x)·(beta + softplus(alpha_n)) + beta·x``
  otherwise (eps is a small NEGATIVE buffer)
* per-head q/k RMSNorm before rotary
* pre-norms named ``attention_layernorm`` / ``feedforward_layernorm``
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP


class ApertusForCausalLM(LlamaForCausalLM):
    has_qk_norm = True

    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        return {
            "up_proj": (L, H, I),
            "down_proj": (L, I, H),
            "xielu_ap": (L, 1),
            "xielu_an": (L, 1),
            "xielu_beta": (L, 1),
            "xielu_eps": (L, 1),
        }

    def _mlp_specs(self) -> Dict[str, Any]:
        return {
            "up_proj": P(None, None, AXIS_TP),
            "down_proj": P(None, AXIS_TP, None),
            "xielu_ap": P(None, None),
            "xielu_an": P(None, None),
            "xielu_beta": P(None, None),
            "xielu_eps": P(None, None),
        }

    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        del proj
        x = (normed @ w["up_proj"]).astype(jnp.float32)
        ap = jax.nn.softplus(w["xielu_ap"].astype(jnp.float32))
        beta = w["xielu_beta"].astype(jnp.float32)
        eps = w["xielu_eps"].astype(jnp.float32)
        an = beta + jax.nn.softplus(w["xielu_an"].astype(jnp.float32))
        act = jnp.where(
            x > 0,
            ap * x * x + beta * x,
            (jnp.expm1(jnp.minimum(x, eps)) - x) * an + beta * x,
        ).astype(normed.dtype)
        act = self._shard(act, None, None, AXIS_TP)
        return act @ w["down_proj"]

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        scalar = lambda t: np.asarray(t, np.float32).reshape(1)  # noqa: E731
        table = {
            "attention_layernorm.weight": ("layers.input_ln", None),
            "feedforward_layernorm.weight": ("layers.post_ln", None),
            "mlp.act_fn.alpha_p": ("layers.xielu_ap", scalar),
            "mlp.act_fn.alpha_n": ("layers.xielu_an", scalar),
            "mlp.act_fn.beta": ("layers.xielu_beta", scalar),
            "mlp.act_fn.eps": ("layers.xielu_eps", scalar),
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


EntryClass = [ApertusForCausalLM]
