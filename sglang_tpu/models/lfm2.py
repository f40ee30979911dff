"""LiquidAI LFM2: hybrid gated-short-conv + attention causal LM.

Equivalent role to the reference's ``srt/models/lfm2.py`` — most layers
run a GATED SHORT CONVOLUTION mixer: ``in_proj`` → (B, C, x) thirds,
``Bx = B·x``, causal depthwise conv of width ``conv_L_cache`` over Bx,
``y = C·conv_out`` → ``out_proj``; the ``full_attention`` layers run
GQA with PER-HEAD q/k RMSNorm and full rotary over a paged KV pool
sized to the attention-layer count.  Every layer ends with a gated-SiLU
MLP whose width follows HF's auto-adjust rule (2/3·I rounded up to
``block_multiple_of``).  Conv states ride the Mamba-style state pool
({"kv", "conv"} hybrid cache); state slot = page_table[:, 0].
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.layers.attention import paged_attention
from sglang_tpu.layers.norm import rms_norm
from sglang_tpu.models.mamba import fresh_state_rows
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.parallel.mesh import AXIS_TP


class Lfm2ForCausalLM:
    is_stateful = True
    hybrid_state = True
    requires_disable_radix = True
    supports_cp = False
    supports_dcp = False

    def __init__(self, config, mesh_ctx=None):
        self.config = config
        self.mesh_ctx = mesh_ctx
        hf = config.hf_config or {}
        H = config.hidden_size
        self.hq = config.num_attention_heads
        self.hkv = config.num_key_value_heads
        self.hd = config.head_dim
        self.sm_scale = 1.0 / float(np.sqrt(self.hd))
        self.eps = float(hf.get("norm_eps", config.rms_norm_eps))
        self.conv_k = int(hf.get("conv_L_cache", 3))
        self.conv_bias = bool(hf.get("conv_bias", False))
        I = config.intermediate_size
        if hf.get("block_auto_adjust_ff_dim", True):
            I = int(2 * I / 3)
            mult = hf.get("block_ffn_dim_multiplier")
            if mult is not None:
                I = int(mult * I)
            m = int(hf.get("block_multiple_of", 256))
            I = m * ((I + m - 1) // m)
        self.ff_dim = I
        L = config.num_hidden_layers
        lt = hf.get("layer_types") or ["full_attention"] * L
        self.layer_types = list(lt)
        self.n_conv = sum(1 for t in self.layer_types if t == "conv")
        self.num_kv_layers = L - self.n_conv
        self.inv_freq = compute_inv_freq(
            self.hd, config.rope_theta, config.rope_scaling,
            config.partial_rotary_factor,
        )
        self.rot_half = int(self.inv_freq.shape[0])

    # ------------------------------------------------------------ schema
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, I = c.hidden_size, self.ff_dim
        hq, hkv, d = self.hq, self.hkv, self.hd
        Lc, Lf = self.n_conv, self.num_kv_layers
        mlp = lambda n: {  # noqa: E731
            "w1": (n, H, I),
            "w3": (n, H, I),
            "w2": (n, I, H),
            "ffn_ln": (n, H),
        }
        shapes = {"embed": (c.vocab_size, H), "final_ln": (H,)}
        if Lc:
            shapes["conv_layers"] = {
                "op_ln": (Lc, H),
                "in_proj": (Lc, H, 3 * H),
                "conv_w": (Lc, H, self.conv_k),
                "out_proj": (Lc, H, H),
                **mlp(Lc),
            }
            if self.conv_bias:
                shapes["conv_layers"]["conv_b"] = (Lc, H)
        if Lf:
            shapes["attn_layers"] = {
                "op_ln": (Lf, H),
                "q_proj": (Lf, H, hq * d),
                "k_proj": (Lf, H, hkv * d),
                "v_proj": (Lf, H, hkv * d),
                "q_norm": (Lf, d),
                "k_norm": (Lf, d),
                "o_proj": (Lf, hq * d, H),
                **mlp(Lf),
            }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (c.vocab_size, H)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        def spec_like(tree):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = spec_like(v)
                    continue
                nd = len(v)
                if k in ("in_proj", "q_proj", "k_proj", "v_proj",
                         "w1", "w3"):
                    out[k] = P(*([None] * (nd - 1) + [AXIS_TP]))
                elif k in ("o_proj", "out_proj", "w2"):
                    out[k] = P(*([None] * (nd - 2) + [AXIS_TP, None]))
                elif k in ("embed", "lm_head"):
                    out[k] = P(AXIS_TP, None)
                else:
                    out[k] = P(*([None] * nd))
            return out

        return spec_like(self.param_shapes())

    def hf_weight_mapping(self):
        c_idx, a_idx = {}, {}
        for i, t in enumerate(self.layer_types):
            if t == "conv":
                c_idx[i] = len(c_idx)
            else:
                a_idx[i] = len(a_idx)
        conv_table = {
            "conv.in_proj.weight": ("in_proj", "t"),
            "conv.conv.weight": (
                "conv_w", lambda t: np.asarray(t)[:, 0, :]
            ),
            "conv.conv.bias": ("conv_b", None),
            "conv.out_proj.weight": ("out_proj", "t"),
        }
        attn_table = {
            "self_attn.q_proj.weight": ("q_proj", "t"),
            "self_attn.k_proj.weight": ("k_proj", "t"),
            "self_attn.v_proj.weight": ("v_proj", "t"),
            "self_attn.out_proj.weight": ("o_proj", "t"),
            "self_attn.q_layernorm.weight": ("q_norm", None),
            "self_attn.k_layernorm.weight": ("k_norm", None),
        }
        both = {
            "operator_norm.weight": ("op_ln", None),
            "ffn_norm.weight": ("ffn_ln", None),
            "feed_forward.w1.weight": ("w1", "t"),
            "feed_forward.w3.weight": ("w3", "t"),
            "feed_forward.w2.weight": ("w2", "t"),
        }

        def mapping(name: str):
            if name in ("model.embed_tokens.weight", "embed_tokens.weight"):
                return ("embed", None, None)
            if name in ("model.embedding_norm.weight",
                        "embedding_norm.weight"):
                return ("final_ln", None, None)
            if name == "lm_head.weight":
                if self.config.tie_word_embeddings:
                    return None
                return ("lm_head", None, None)
            parts = name.split(".")
            if "layers" not in parts:
                return None
            li = int(parts[parts.index("layers") + 1])
            tail = ".".join(parts[parts.index("layers") + 2 :])
            is_c = self.layer_types[li] == "conv"
            stack = "conv_layers" if is_c else "attn_layers"
            idx = c_idx[li] if is_c else a_idx[li]
            for table in (conv_table if is_c else attn_table, both):
                if tail in table:
                    leaf, tf = table[tail]
                    return (f"{stack}.{leaf}", idx, tf)
            return None

        return mapping

    # --------------------------------------------------------- state pool
    def init_state_pool(self, num_pages: int, dtype=jnp.float32):
        return {
            "conv": jnp.zeros(
                (
                    self.n_conv, num_pages, self.conv_k - 1,
                    self.config.hidden_size,
                ),
                self.config.dtype,
            ),
        }

    def state_pool_bytes_per_slot(self) -> int:
        return 2 * self.n_conv * (self.conv_k - 1) * self.config.hidden_size

    # ---------------------------------------------------------- sublayers
    def _conv_mixer(self, w, normed, conv_pool, li, slot, tmask, n_new):
        """Gated short conv (HF Lfm2ShortConv.slow_forward)."""
        B, Lq, H = normed.shape
        k = self.conv_k
        bcx = normed @ w["in_proj"]  # [B, Lq, 3H]
        b, cgate, x = bcx[..., :H], bcx[..., H:2 * H], bcx[..., 2 * H:]
        bx = b * x
        bx = jnp.where(tmask[..., None], bx, 0.0)
        cstate = conv_pool[li][slot]  # [B, k-1, H]
        ext = jnp.concatenate([cstate.astype(bx.dtype), bx], axis=1)
        conv = sum(
            ext[:, i: i + Lq] * w["conv_w"][:, i] for i in range(k)
        )
        if "conv_b" in w:
            conv = conv + w["conv_b"]
        gidx = n_new[:, None] + jnp.arange(k - 1, dtype=jnp.int32)[None]
        new_cstate = jnp.take_along_axis(ext, gidx[..., None], axis=1)
        conv_pool = conv_pool.at[li, slot].set(
            new_cstate.astype(conv_pool.dtype)
        )
        y = cgate * conv
        return y @ w["out_proj"], conv_pool

    def _attn(self, w, normed, kv, batch, li, *, num_slots, page_size,
              attn_backend):
        B, Lq, H = normed.shape
        hq, hkv, d = self.hq, self.hkv, self.hd
        q = (normed @ w["q_proj"]).reshape(B, Lq, hq, d)
        k = (normed @ w["k_proj"]).reshape(B, Lq, hkv, d)
        v = (normed @ w["v_proj"]).reshape(B, Lq, hkv, d)
        q = rms_norm(q, w["q_norm"], self.eps)
        k = rms_norm(k, w["k_norm"], self.eps)
        half = self.rot_half
        angles = (
            batch.positions[..., None].astype(jnp.float32) * self.inv_freq
        )
        cos = jnp.cos(angles)[..., None, :]
        sin = jnp.sin(angles)[..., None, :]

        def rope(x):
            xf = x.astype(jnp.float32)
            rot = 2 * half
            x1, x2 = xf[..., :half], xf[..., half:rot]
            o = jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
            )
            if rot < d:
                o = jnp.concatenate([o, xf[..., rot:]], axis=-1)
            return o.astype(x.dtype)

        q, k = rope(q), rope(k)
        attn_out, kv = paged_attention(
            q, k, v, kv, batch, jnp.int32(li),
            num_slots=num_slots, page_size=page_size,
            sm_scale=self.sm_scale, backend=attn_backend,
        )
        return attn_out.reshape(B, Lq, hq * d) @ w["o_proj"], kv

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params,
        kv_cache,  # {"kv", "conv"}
        batch,
        *,
        num_slots,
        page_size,
        attn_backend="xla",
        return_all_hidden=False,
        capture_features=False,
        lora=None,
        context_parallel=False,
        capture_expert_counts=False,
        quant_stacks=None,
    ):
        del lora, context_parallel, capture_expert_counts, quant_stacks
        c = self.config
        B, Lq = batch.input_ids.shape
        slot = batch.page_table[:, 0]
        n_new = jnp.maximum(batch.seq_lens - batch.positions[:, 0], 0)
        tmask = (
            jnp.arange(Lq, dtype=jnp.int32)[None, :] < n_new[:, None]
        )

        hidden = params["embed"][batch.input_ids]
        kv = kv_cache["kv"]
        conv_pool = kv_cache["conv"]
        # Recycled state slots: zero fresh rows' slots before any layer
        # reads them (models/mamba.fresh_state_rows).
        zslot = jnp.where(fresh_state_rows(batch), slot, 0)
        conv_pool = conv_pool.at[:, zslot].set(0.0)
        li_c = li_a = 0
        for i, t in enumerate(self.layer_types):
            if t == "conv":
                w = jax.tree_util.tree_map(
                    lambda a, j=li_c: a[j], params["conv_layers"]
                )
                normed = rms_norm(hidden, w["op_ln"], self.eps)
                out, conv_pool = self._conv_mixer(
                    w, normed, conv_pool, li_c, slot, tmask, n_new,
                )
                li_c += 1
            else:
                w = jax.tree_util.tree_map(
                    lambda a, j=li_a: a[j], params["attn_layers"]
                )
                normed = rms_norm(hidden, w["op_ln"], self.eps)
                out, kv = self._attn(
                    w, normed, kv, batch, li_a,
                    num_slots=num_slots, page_size=page_size,
                    attn_backend=attn_backend,
                )
                li_a += 1
            hidden = hidden + out
            normed = rms_norm(hidden, w["ffn_ln"], self.eps)
            mlp = act_and_mul(
                "silu", normed @ w["w1"], normed @ w["w3"],
            ) @ w["w2"]
            hidden = hidden + mlp

        kv_cache = {"kv": kv, "conv": conv_pool}
        features = hidden
        hidden = rms_norm(hidden, params["final_ln"], self.eps)
        flat = hidden.reshape(B * Lq, -1)
        extras = []
        if capture_features:
            extras.append(features)
        if return_all_hidden:
            return (flat, kv_cache, *extras)
        return (flat[batch.logits_idx], kv_cache, *extras)

    def compute_logits(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        w = (
            params["embed"]
            if self.config.tie_word_embeddings
            else params["lm_head"]
        )
        return jnp.einsum(
            "bh,vh->bv", hidden, w, preferred_element_type=jnp.float32
        )

    def per_layer_window(self) -> np.ndarray:
        return np.zeros((self.config.num_hidden_layers,), np.int32)


EntryClass = [Lfm2ForCausalLM]
