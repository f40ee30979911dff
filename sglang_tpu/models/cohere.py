"""Cohere Command-R family causal LM.

Equivalent role to the reference's ``srt/models/commandr.py`` — a
Llama-style stack with Cohere's differences via base-class hooks:

* PARALLEL block: attention and MLP both read the same
  ``input_layernorm(h)`` and add into the residual together (no
  second pre-norm)
* mean-centered LayerNorm (weight only, no bias)
* interleaved rotary pairs: lanes (2i, 2i+1) rotate together with
  frequency i (HF Cohere ``rotate_half`` over interleaved lanes)
* ``logit_scale`` multiplies the final logits; embeddings are tied
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_tpu.models.llama import LlamaForCausalLM


class CohereForCausalLM(LlamaForCausalLM):
    parallel_block = True

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        if hf.get("use_qk_norm"):
            raise NotImplementedError("Cohere use_qk_norm")
        scale = float(hf.get("logit_scale", 1.0))
        self.logits_divisor = 1.0 / scale if scale else 1.0

    def _norm(self, x, w, b=None):
        del b
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        eps = (self.config.hf_config or {}).get("layer_norm_eps", 1e-5)
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)

    def _apply_rope(self, x, cos, sin, rot_half, d):
        # interleaved pairs: out[2i] = x[2i]·c_i − x[2i+1]·s_i,
        # out[2i+1] = x[2i+1]·c_i + x[2i]·s_i
        xf = x.astype(jnp.float32)
        rot = 2 * rot_half
        xr = xf[..., :rot].reshape(*xf.shape[:-1], rot_half, 2)
        x1, x2 = xr[..., 0], xr[..., 1]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(*xf.shape[:-1], rot)
        if rot < d:
            out = jnp.concatenate([out, xf[..., rot:]], axis=-1)
        return out.astype(x.dtype)


EntryClass = [CohereForCausalLM]
