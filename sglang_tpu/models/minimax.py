"""MiniMax-Text-01: lightning (linear) attention + MoE hybrid.

Equivalent role to the reference's ``srt/models/minimax_m2.py``
lineage — alternating LIGHTNING ATTENTION layers (decayed linear
attention: per-head slope rates, state S ← e^{−r}·S + k⊗v, output
q·S with an intra-chunk decay-masked raw-dot term — no softmax) and
standard softmax GQA layers, every layer ending in a Mixtral-style MoE.

MiniMax quirks handled exactly:

* norms apply to the STREAM (``h = norm(h); residual = h``), and the
  residual combine uses the config α/β factors
  (``h = residual·α + out·β``) per layer kind
* the lightning qkv projection is SiLU-activated (v included); output
  path is RMSNorm over the flat heads, a sigmoid gate from the layer
  input, then out_proj
* the linear state rides the Mamba-style state pool ({"kv", "rec"}
  hybrid cache); a single-block decay formulation handles prefill
  chunks and decode steps uniformly (per-request valid-length masks
  keep padded rows out of the state)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.attention import paged_attention
from sglang_tpu.layers.moe import moe_block
from sglang_tpu.layers.norm import rms_norm
from sglang_tpu.models.mamba import fresh_state_rows
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.parallel.mesh import AXIS_TP


class MiniMaxForCausalLM:
    is_stateful = True
    hybrid_state = True
    requires_disable_radix = True
    supports_cp = False
    supports_dcp = False
    supports_pp_wavefront = False

    def __init__(self, config, mesh_ctx=None):
        self.config = config
        self.mesh_ctx = mesh_ctx
        hf = config.hf_config or {}
        H = config.hidden_size
        self.hq = config.num_attention_heads
        self.hkv = config.num_key_value_heads
        self.hd = config.head_dim
        self.sm_scale = 1.0 / float(np.sqrt(self.hd))
        self.eps = config.rms_norm_eps
        self.num_experts = config.num_experts
        self.top_k = config.num_experts_per_tok
        self.moe_inter = (
            config.moe_intermediate_size or config.intermediate_size
        )
        L = config.num_hidden_layers
        lt = hf.get("layer_types") or ["full_attention"] * L
        self.layer_types = list(lt)
        self.n_linear = sum(
            1 for t in self.layer_types if t == "linear_attention"
        )
        self.num_kv_layers = L - self.n_linear
        self.a_full = float(hf.get("full_attn_alpha_factor", 1.0))
        self.b_full = float(hf.get("full_attn_beta_factor", 1.0))
        self.a_lin = float(hf.get("linear_attn_alpha_factor", 1.0))
        self.b_lin = float(hf.get("linear_attn_beta_factor", 1.0))
        self.a_mlp = float(hf.get("mlp_alpha_factor", 1.0))
        self.b_mlp = float(hf.get("mlp_beta_factor", 1.0))
        self.inv_freq = compute_inv_freq(
            self.hd, config.rope_theta, config.rope_scaling,
            config.partial_rotary_factor,
        )
        self.rot_half = int(self.inv_freq.shape[0])

    # ------------------------------------------------------------ schema
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, MI, E = c.hidden_size, self.moe_inter, self.num_experts
        hq, hkv, d = self.hq, self.hkv, self.hd
        Ll, Lf = self.n_linear, self.num_kv_layers
        moe = lambda n: {  # noqa: E731
            "post_ln": (n, H),
            "moe_gate": (n, H, E),
            "moe_w1": (n, E, H, MI),
            "moe_w3": (n, E, H, MI),
            "moe_w2": (n, E, MI, H),
        }
        shapes = {"embed": (c.vocab_size, H), "final_ln": (H,)}
        if Ll:
            shapes["lin_layers"] = {
                "input_ln": (Ll, H),
                "qkv_proj": (Ll, H, 3 * hq * d),
                "attn_norm": (Ll, hq * d),
                "output_gate": (Ll, H, hq * d),
                "out_proj": (Ll, hq * d, H),
                "slope": (Ll, hq),
                **moe(Ll),
            }
        if Lf:
            shapes["attn_layers"] = {
                "input_ln": (Lf, H),
                "q_proj": (Lf, H, hq * d),
                "k_proj": (Lf, H, hkv * d),
                "v_proj": (Lf, H, hkv * d),
                "o_proj": (Lf, hq * d, H),
                **moe(Lf),
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
                if k in ("qkv_proj", "q_proj", "k_proj", "v_proj",
                         "output_gate"):
                    out[k] = P(*([None] * (nd - 1) + [AXIS_TP]))
                elif k in ("o_proj", "out_proj"):
                    out[k] = P(*([None] * (nd - 2) + [AXIS_TP, None]))
                elif k in ("moe_w1", "moe_w3"):
                    out[k] = P(None, None, None, AXIS_TP)
                elif k == "moe_w2":
                    out[k] = P(None, None, AXIS_TP, None)
                elif k in ("embed", "lm_head"):
                    out[k] = P(AXIS_TP, None)
                else:
                    out[k] = P(*([None] * nd))
            return out

        return spec_like(self.param_shapes())

    def hf_weight_mapping(self):
        l_idx, a_idx = {}, {}
        for i, t in enumerate(self.layer_types):
            if t == "linear_attention":
                l_idx[i] = len(l_idx)
            else:
                a_idx[i] = len(a_idx)
        lin_table = {
            "self_attn.qkv_proj.weight": ("qkv_proj", "t"),
            "self_attn.out_proj.weight": ("out_proj", "t"),
            "self_attn.output_gate.weight": ("output_gate", "t"),
            "self_attn.norm.weight": ("attn_norm", None),
            "self_attn.slope_rate": (
                "slope", lambda t: np.asarray(t, np.float32)[:, 0, 0]
            ),
        }
        attn_table = {
            "self_attn.q_proj.weight": ("q_proj", "t"),
            "self_attn.k_proj.weight": ("k_proj", "t"),
            "self_attn.v_proj.weight": ("v_proj", "t"),
            "self_attn.o_proj.weight": ("o_proj", "t"),
        }
        both = {
            "input_layernorm.weight": ("input_ln", None),
            "post_attention_layernorm.weight": ("post_ln", None),
            "block_sparse_moe.gate.weight": ("moe_gate", "t"),
        }
        expert_leaf = {"w1": "moe_w1", "w3": "moe_w3", "w2": "moe_w2"}

        def mapping(name: str):
            if name in ("model.embed_tokens.weight", "embed_tokens.weight"):
                return ("embed", None, None)
            if name in ("model.norm.weight", "norm.weight"):
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
            is_l = self.layer_types[li] == "linear_attention"
            stack = "lin_layers" if is_l else "attn_layers"
            idx = l_idx[li] if is_l else a_idx[li]
            if ".experts." in f".{tail}":
                sub = tail.split(".")
                e = int(sub[sub.index("experts") + 1])
                leaf = expert_leaf.get(sub[-2])
                if leaf is None:
                    return None
                return (f"{stack}.{leaf}", (idx, e), "t")
            for table in (lin_table if is_l else attn_table, both):
                if tail in table:
                    leaf, tf = table[tail]
                    return (f"{stack}.{leaf}", idx, tf)
            # derived decay buffers (query/key/diagonal_decay) recompute
            return None

        return mapping

    # --------------------------------------------------------- state pool
    def init_state_pool(self, num_pages: int, dtype=jnp.float32):
        return {
            "rec": jnp.zeros(
                (self.n_linear, num_pages, self.hq, self.hd, self.hd),
                jnp.float32,
            ),
        }

    def state_pool_bytes_per_slot(self) -> int:
        return 4 * self.n_linear * self.hq * self.hd * self.hd

    # ---------------------------------------------------------- sublayers
    def _lightning(self, w, normed, rec_pool, li, slot, tmask, n_new):
        """Decayed linear attention (HF MiniMaxLightningAttention), one
        block over the chunk — handles prefill chunks and decode steps
        uniformly; padded rows mask out of the state update."""
        B, Lq, H = normed.shape
        nh, d = self.hq, self.hd
        qkv = jax.nn.silu(normed @ w["qkv_proj"]).reshape(B, Lq, nh, 3 * d)
        q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
        v = jnp.where(tmask[..., None, None], v, 0.0)
        r = w["slope"].astype(jnp.float32)  # [nh]
        S = rec_pool[li][slot].astype(jnp.float32)  # [B, nh, d, d]
        i = jnp.arange(Lq, dtype=jnp.float32)
        # inter-block: q decayed by position-within-block + 1
        qdec = jnp.exp(-r[None, :] * (i + 1.0)[:, None])  # [Lq, nh]
        inter = jnp.einsum(
            "blhd,bhde->blhe", q * qdec[None, :, :, None], S
        )
        # intra-block: raw dot with causal decay mask e^{-r (l-j)}
        delta = i[:, None] - i[None, :]
        diag = jnp.where(
            delta >= 0, jnp.exp(-r[:, None, None] * delta[None]), 0.0
        )  # [nh, Lq, Lq]
        qk = jnp.einsum("blhd,bmhd->bhlm", q, k)
        intra = jnp.einsum("bhlm,bmhd->blhd", qk * diag[None], v)
        out = inter + intra
        # state update: S' = e^{-r n} S + sum_j k_j e^{-r (n-1-j)} v_j
        nf = n_new.astype(jnp.float32)
        expo = jnp.where(
            i[None, :] < nf[:, None],
            -(nf[:, None] - 1.0 - i[None, :]),
            -jnp.inf,
        )  # [B, Lq]
        kdec = jnp.exp(expo[:, :, None] * r[None, None, :])  # [B, Lq, nh]
        # note: expo ≤ 0 inside the mask, scaled by r > 0 per head
        kdec = jnp.where(jnp.isfinite(expo)[..., None], kdec, 0.0)
        upd = jnp.einsum("blhd,blhe->bhde", k * kdec[..., None], v)
        S = S * jnp.exp(-r[None, :] * nf[:, None])[..., None, None] + upd
        rec_pool = rec_pool.at[li, slot].set(S)
        y = out.reshape(B, Lq, nh * d)
        y = rms_norm(y, w["attn_norm"], self.eps)
        gate = jax.nn.sigmoid(
            (normed @ w["output_gate"]).astype(jnp.float32)
        )
        y = (gate * y).astype(normed.dtype)
        return y @ w["out_proj"], rec_pool

    def _attn(self, w, normed, kv, batch, li, *, num_slots, page_size,
              attn_backend):
        B, Lq, H = normed.shape
        hq, hkv, d = self.hq, self.hkv, self.hd
        q = (normed @ w["q_proj"]).reshape(B, Lq, hq, d)
        k = (normed @ w["k_proj"]).reshape(B, Lq, hkv, d)
        v = (normed @ w["v_proj"]).reshape(B, Lq, hkv, d)
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
        kv_cache,  # {"kv", "rec"}
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
        rec_pool = kv_cache["rec"]
        # Recycled state slots: zero fresh rows' slots before any layer
        # reads them (models/mamba.fresh_state_rows).
        zslot = jnp.where(fresh_state_rows(batch), slot, 0)
        rec_pool = rec_pool.at[:, zslot].set(0.0)
        li_l = li_a = 0
        for i, t in enumerate(self.layer_types):
            is_l = t == "linear_attention"
            stack = "lin_layers" if is_l else "attn_layers"
            j = li_l if is_l else li_a
            w = jax.tree_util.tree_map(lambda a, jj=j: a[jj], params[stack])
            # MiniMax norms the STREAM; residual is the normed stream
            hidden = rms_norm(hidden, w["input_ln"], self.eps)
            if is_l:
                out, rec_pool = self._lightning(
                    w, hidden, rec_pool, li_l, slot, tmask, n_new,
                )
                hidden = hidden * self.a_lin + out * self.b_lin
                li_l += 1
            else:
                out, kv = self._attn(
                    w, hidden, kv, batch, li_a,
                    num_slots=num_slots, page_size=page_size,
                    attn_backend=attn_backend,
                )
                hidden = hidden * self.a_full + out * self.b_full
                li_a += 1
            hidden = rms_norm(hidden, w["post_ln"], self.eps)
            moe = moe_block(
                hidden,
                w["moe_gate"],
                w["moe_w1"],
                w["moe_w3"],
                w["moe_w2"],
                top_k=self.top_k,
                norm_topk_prob=True,
                hidden_act=c.hidden_act,
            )
            hidden = hidden * self.a_mlp + moe * self.b_mlp

        kv_cache = {"kv": kv, "rec": rec_pool}
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


EntryClass = [MiniMaxForCausalLM]
