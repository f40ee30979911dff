"""Llama 4 text family (Scout-class: every layer MoE).

Equivalent role to the reference's ``srt/models/llama4.py`` — on the
shared stack with Llama 4's differences:

* **NoPE layers**: every ``no_rope_layers[i] == 0`` layer skips rotary
  (its per-layer inv_freq rides the scan as zeros → identity rotation)
  and applies attention TEMPERATURE TUNING instead
  (q · (log1p(floor((pos+1)/floor_scale)) · attn_scale + 1));
* **qk L2 norm** (weightless) after rope, on rope layers only;
* **chunked attention** on rope layers: token p attends only its own
  ``attention_chunk_size`` chunk (encoded as a NEGATIVE per-layer
  window; the XLA attention path masks by chunk — the model forces the
  XLA backend until the kernels learn chunk masks);
* **Llama4TextMoe**: router top-k on raw logits, sigmoid weights
  scaling the expert INPUT, plus an always-on shared expert;
* interleaved-pair rotary (complex rotation, like Cohere).

First cut covers ``interleave_moe_layer_step == 1`` (all-MoE, the
Scout deployment); interleaved dense/MoE stacks raise.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.layers.moe import moe_block
from sglang_tpu.models.mixtral import MixtralForCausalLM
from sglang_tpu.parallel.mesh import AXIS_TP


class Llama4ForCausalLM(MixtralForCausalLM):
    force_xla_attention = True  # chunked-attention masks (XLA path only)
    supports_cp = False
    supports_pp_wavefront = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config.get("text_config", config.hf_config)
        L = config.num_hidden_layers
        if hf.get("interleave_moe_layer_step", 1) != 1:
            raise NotImplementedError(
                "Llama4 interleaved dense/MoE stacks (128E geometry)"
            )
        self.top_k = int(hf.get("num_experts_per_tok", 1))
        # no_rope_layers[i] == 1 → rope; 0 → NoPE (default every 4th)
        nrl = hf.get("no_rope_layers")
        if not nrl:
            step = int(hf.get("no_rope_layer_interval", 4) or 4)
            nrl = [int((i + 1) % step != 0) for i in range(L)]
        self.rope_layers = np.asarray(nrl, np.int32)
        self.use_qk_norm = bool(hf.get("use_qk_norm", False))
        self.attn_temperature_tuning = bool(
            hf.get("attn_temperature_tuning", False)
        )
        self.floor_scale = float(hf.get("floor_scale", 8192.0))
        self.attn_scale = float(hf.get("attn_scale", 0.1))
        self.chunk_size = int(hf.get("attention_chunk_size", 0) or 0)

    # ------------------------------------------------- per-layer variation
    def per_layer_inv_freq(self) -> np.ndarray:
        base = super().per_layer_inv_freq()  # [L, rot/2]
        return base * self.rope_layers[:, None]  # NoPE rows → zeros

    def per_layer_window(self) -> np.ndarray:
        # NEGATIVE window encodes chunked attention (layers/attention.py);
        # NoPE layers attend the full context
        if not self.chunk_size:
            return np.zeros((self.config.num_hidden_layers,), np.int32)
        return np.where(
            self.rope_layers > 0, -self.chunk_size, 0
        ).astype(np.int32)

    # ------------------------------------------------------------- hooks
    def _apply_rope(self, x, cos, sin, rot_half, d):
        # interleaved complex pairs: lanes (2i, 2i+1) rotate with freq i
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

    def _post_rope(self, q, k, inv_freq, batch, pos_f):
        is_rope = jnp.any(inv_freq != 0.0)
        if self.use_qk_norm:
            eps = self.config.rms_norm_eps

            def l2(v):
                vf = v.astype(jnp.float32)
                return vf * jax.lax.rsqrt(
                    (vf * vf).mean(-1, keepdims=True) + eps
                )

            q = jnp.where(is_rope, l2(q), q.astype(jnp.float32)).astype(
                q.dtype
            )
            k = jnp.where(is_rope, l2(k), k.astype(jnp.float32)).astype(
                k.dtype
            )
        if self.attn_temperature_tuning:
            # NoPE layers: scale q by the position-dependent temperature
            scales = (
                jnp.log1p(
                    jnp.floor((pos_f + 1.0) / self.floor_scale)
                ) * self.attn_scale + 1.0
            )[..., None]  # [B, Lq, 1, 1]
            q = jnp.where(
                is_rope, q.astype(jnp.float32), q * scales
            ).astype(q.dtype)
        return q, k

    # ------------------------------------------------------------- params
    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        E, MI = self.num_experts, self.moe_inter
        return {
            "moe_gate": (L, H, E),
            "moe_w1": (L, E, H, MI),
            "moe_w3": (L, E, H, MI),
            "moe_w2": (L, E, MI, H),
            "shared_gate": (L, H, MI),
            "shared_up": (L, H, MI),
            "shared_down": (L, MI, H),
        }

    def _mlp_specs(self) -> Dict[str, Any]:
        specs = super()._mlp_specs()
        specs["shared_gate"] = P(None, None, AXIS_TP)
        specs["shared_up"] = P(None, None, AXIS_TP)
        specs["shared_down"] = P(None, AXIS_TP, None)
        return specs

    # ------------------------------------------------------------- forward
    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        del proj
        capture = getattr(self, "_ecounts_capture", False)
        out = moe_block(
            normed,
            w["moe_gate"],
            w["moe_w1"],
            w["moe_w3"],
            w["moe_w2"],
            top_k=self.top_k,
            norm_topk_prob=False,
            hidden_act=self.config.hidden_act,
            scoring="llama4",
            weight_on_input=True,
            mesh=self.mesh_ctx.mesh if self.mesh_ctx is not None else None,
            expert_parallel=self._expert_parallel(),
            return_counts=capture,
        )
        if capture:
            out, self._moe_counts_stash = out
        shared = act_and_mul(
            self.config.hidden_act,
            normed @ w["shared_gate"],
            normed @ w["shared_up"],
        )
        shared = self._shard(shared, None, None, AXIS_TP)
        return out + shared @ w["shared_down"]

    # ------------------------------------------------------- weight loading
    def hf_weight_mapping(self):
        from sglang_tpu.models.llama import LlamaForCausalLM

        base = LlamaForCausalLM.hf_weight_mapping(self)
        shared = {
            "feed_forward.shared_expert.gate_proj.weight": "layers.shared_gate",
            "feed_forward.shared_expert.up_proj.weight": "layers.shared_up",
            "feed_forward.shared_expert.down_proj.weight": "layers.shared_down",
        }
        MI = self.moe_inter

        def split_gate_up(t):
            # experts.gate_up_proj is a PARAMETER [E, H, 2*MI] — already
            # [in, out] per expert, no transpose
            t = np.asarray(t)
            return {
                "moe_w1": np.ascontiguousarray(t[..., :MI]),
                "moe_w3": np.ascontiguousarray(t[..., MI:]),
            }

        def mapping(name: str):
            # strip the Llama4ForConditionalGeneration nesting
            name = name.replace("language_model.", "")
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2 :])
                if tail == "feed_forward.router.weight":
                    return ("layers.moe_gate", li, "t")
                if tail == "feed_forward.experts.gate_up_proj":
                    return ("layers", li, split_gate_up)
                if tail == "feed_forward.experts.down_proj":
                    return ("layers.moe_w2", li, None)  # [E, MI, H] as-is
                if tail in shared:
                    return (shared[tail], li, "t")
                # dense-MLP names only appear on interleaved geometries
                name = name.replace("feed_forward.", "mlp.")
            return base(name)

        return mapping


EntryClass = [Llama4ForCausalLM]
