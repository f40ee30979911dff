"""LLaDA-style masked-diffusion language model (dLLM model family).

Equivalent role to the reference's dLLM model support (``dllm/`` hooked
into ``tp_worker.py:432-446``): a llama-shaped trunk whose attention is
BIDIRECTIONAL over the working window — generation is iterative
parallel denoising (see :mod:`sglang_tpu.dllm`), not autoregressive
decode, so there is no KV cache or paging: every denoise step re-runs
the full window, which maps perfectly onto the MXU (large dense
batched matmuls, one jit for the whole loop).

The param schema / checkpoint mapping / shardings are inherited from
the llama family — LLaDA-class releases reuse the llama tensor layout.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.models.llama import LlamaForCausalLM


class LladaForMaskedDiffusion(LlamaForCausalLM):
    is_diffusion = True
    # forward_dense reads per-projection leaves; the fused qkv execution
    # layout only rewrites LlamaForCausalLM.forward's path
    fuse_qkv_exec = False

    def forward_dense(
        self, params: Dict[str, Any], input_ids: jnp.ndarray  # [B, L] i32
    ) -> jnp.ndarray:
        """Full-window BIDIRECTIONAL forward → logits [B, L, V] f32.
        No KV cache, no paging — each denoise step recomputes the
        window (the dLLM contract)."""
        c = self.config
        B, L = input_ids.shape
        hq, hkv, d = self.hq, self.hkv, self.hd
        rot_half = self.rot_dim // 2

        hidden = params["embed"][input_ids]
        if self.embed_scale != 1.0:
            hidden = (
                hidden.astype(jnp.float32) * self.embed_scale
            ).astype(hidden.dtype)

        pos = jnp.arange(L, dtype=jnp.float32)[None, :, None]  # [1, L, 1]
        inv_freq = jnp.asarray(self.per_layer_inv_freq()[0])
        angles = pos * inv_freq  # [1, L, rot_half]
        cos = jnp.cos(angles)[:, :, None, :]
        sin = jnp.sin(angles)[:, :, None, :]

        def layer_fn(carry, w):
            h = carry
            normed = self._norm(h, w["input_ln"])
            q = (normed @ w["q_proj"]).reshape(B, L, hq, d)
            k = (normed @ w["k_proj"]).reshape(B, L, hkv, d)
            v = (normed @ w["v_proj"]).reshape(B, L, hkv, d)
            q = self._apply_rope(q, cos, sin, rot_half, d)
            k = self._apply_rope(k, cos, sin, rot_half, d)
            if hq != hkv:
                rep = hq // hkv
                k = jnp.repeat(k, rep, axis=2)
                v = jnp.repeat(v, rep, axis=2)
            scores = jnp.einsum(
                "blhd,bmhd->bhlm", q, k,
                preferred_element_type=jnp.float32,
            ) * (d ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)  # no causal mask
            att = jnp.einsum(
                "bhlm,bmhd->blhd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(h.dtype).reshape(B, L, hq * d)
            h = h + att @ w["o_proj"]
            normed = self._norm(h, w["post_ln"])
            inter = act_and_mul(
                c.hidden_act,
                normed @ w["gate_proj"],
                normed @ w["up_proj"],
            )
            return h + inter @ w["down_proj"], None

        scan_layers = {
            k: v
            for k, v in params["layers"].items()
            if not (isinstance(v, dict) and "qw" in v)
        }
        hidden, _ = jax.lax.scan(layer_fn, hidden, scan_layers)
        hidden = self._norm(hidden, params["final_ln"])
        w = (
            params["embed"]
            if c.tie_word_embeddings
            else params["lm_head"]
        )
        return jnp.einsum(
            "blh,vh->blv", hidden, w, preferred_element_type=jnp.float32
        )


EntryClass = [LladaForMaskedDiffusion]
