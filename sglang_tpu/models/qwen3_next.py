"""Qwen3-Next: hybrid GatedDeltaNet (linear attention) + full attention.

Equivalent role to the reference's ``srt/models/qwen3_next.py`` — the
next-gen Qwen hybrid where 3 of every 4 layers replace softmax
attention with a GATED DELTA RULE recurrence:

* linear layers: grouped qkvz/ba projections (per-k-head interleaved
  layout), causal depthwise conv (+silu) over the flat [q|k|v] stream,
  per-head l2-normalized q/k, β = sigmoid(b),
  g = −exp(A_log)·softplus(a + dt_bias), recurrence
  ``S ← S·e^g + k ⊗ ((v − S·k)·β)``, readout ``y = S·q`` with a GATED
  RMSNorm (norm(y)·w·silu(z)); conv + recurrent state live in a STATE
  POOL slot-indexed by the request's first page (Mamba-style).
* full-attention layers: q_proj emits query + a sigmoid OUTPUT GATE,
  per-head-dim zero-centered q/k norms, partial rotary (0.25), paged
  KV over a pool sized to the FULL-attention layer count only.
* every layer: zero-centered RMSNorms and the Qwen3-Next sparse MoE
  (softmax top-k + normalized weights + a shared expert scaled by
  sigmoid(shared_expert_gate)).

The layer loop is unrolled over the (static) layer_types list — the
scan-blocked layout (stacking 3 linear + 1 full per block) is the
planned compile-time upgrade for deep deployments.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.attention import paged_attention
from sglang_tpu.layers.moe import moe_block
from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.layers.norm import rms_norm
from sglang_tpu.models.mamba import fresh_state_rows
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.parallel.mesh import AXIS_TP


def _l2norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt((xf * xf).sum(-1, keepdims=True) + eps)


def _chunked_gdn(q, k, v, g, beta, S0, chunk: int = 64):
    """Chunked gated delta rule (reference fla chunk_gated_delta_rule /
    HF torch_chunk_gated_delta_rule), exactly equal to the sequential
    recurrence: within-chunk work becomes [Q, Q] MXU matmuls (the WY
    inversion is one batched triangular solve), chunks carry the state.

    Shapes: q/k [B, T, Hn, dk] (q pre-scaled, both l2-normed),
    v [B, T, Hn, dv], g/beta [B, T, Hn] (pad rows must carry g=0,
    beta=0 — exact no-ops).  Returns (y [B, T, Hn, dv], S [B,Hn,dk,dv]).
    """
    B, T, Hn, dk = q.shape
    dv = v.shape[-1]
    Q = min(chunk, T)
    while T % Q:
        Q -= 1
    nC = T // Q

    # head-first chunked views [B, Hn, nC, Q, ...]
    def cview(t):
        t = jnp.moveaxis(t, 2, 1)  # [B, Hn, T, ...]
        return t.reshape(B, Hn, nC, Q, *t.shape[3:])

    qc, kc, vc = cview(q), cview(k), cview(v)
    gc = cview(g[..., None])[..., 0]  # [B, Hn, nC, Q]
    bc = cview(beta[..., None])[..., 0]
    g_cum = jnp.cumsum(gc, axis=-1)
    # decay_mask[i, j] = exp(g_i - g_j) for j <= i (lower incl. diag)
    tril = jnp.tril(jnp.ones((Q, Q), bool))
    dmask = jnp.where(
        tril, jnp.exp(g_cum[..., :, None] - g_cum[..., None, :]), 0.0
    )
    k_beta = kc * bc[..., None]
    v_beta = vc * bc[..., None]
    # WY inversion: M = strictly-lower(-(k_beta kᵀ ∘ dmask));
    # torch's row recurrence computes Tm with (I - M) Tm = I + ... —
    # equivalently (attn + I) = (I - M)^{-1}, one triangular solve.
    strict = jnp.tril(jnp.ones((Q, Q), bool), -1)
    M = jnp.where(
        strict,
        -(jnp.einsum("bhcqd,bhckd->bhcqk", k_beta, kc) * dmask),
        0.0,
    )
    eye = jnp.eye(Q, dtype=M.dtype)
    Tm = jax.scipy.linalg.solve_triangular(
        eye - M, jnp.broadcast_to(eye, M.shape), lower=True
    )  # [B, Hn, nC, Q, Q] == torch's (attn + I)
    value = jnp.einsum("bhcqk,bhckd->bhcqd", Tm, v_beta)
    k_cumdecay = jnp.einsum(
        "bhcqk,bhckd->bhcqd", Tm, k_beta * jnp.exp(g_cum)[..., None]
    )

    def chunk_step(S, ops):
        q_i, k_i, v_i, g_i, kcd_i = ops  # [B, Hn, Q, ...]
        attn = jnp.where(
            tril,
            jnp.einsum("bhqd,bhkd->bhqk", q_i, k_i)
            * jnp.exp(g_i[..., :, None] - g_i[..., None, :]),
            0.0,
        )
        v_prime = jnp.einsum("bhqk,bhkd->bhqd", kcd_i, S)
        v_new = v_i - v_prime
        y = (
            jnp.einsum("bhqk,bhkv->bhqv", q_i * jnp.exp(g_i)[..., None], S)
            + jnp.einsum("bhqk,bhkd->bhqd", attn, v_new)
        )
        g_last = g_i[..., -1]
        S = S * jnp.exp(g_last)[..., None, None] + jnp.einsum(
            "bhqk,bhqd->bhkd",
            k_i * jnp.exp(g_last[..., None] - g_i)[..., None],
            v_new,
        )
        return S, y

    S, ys = jax.lax.scan(
        chunk_step,
        S0,
        (
            qc.swapaxes(0, 2).swapaxes(1, 2),  # [nC, B, Hn, Q, d]
            kc.swapaxes(0, 2).swapaxes(1, 2),
            value.swapaxes(0, 2).swapaxes(1, 2),
            g_cum.swapaxes(0, 2).swapaxes(1, 2),
            k_cumdecay.swapaxes(0, 2).swapaxes(1, 2),
        ),
    )
    # ys [nC, B, Hn, Q, dv] → [B, T, Hn, dv]
    y = ys.transpose(1, 0, 3, 2, 4).reshape(B, T, Hn, dv)
    return y, S


class Qwen3NextForCausalLM:
    is_stateful = True
    hybrid_state = True  # paged KV for full layers + state pool for linear
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
        self.eps = config.rms_norm_eps
        # GatedDeltaNet geometry
        self.nk = int(hf.get("linear_num_key_heads", 16))
        self.nv = int(hf.get("linear_num_value_heads", 32))
        self.dk = int(hf.get("linear_key_head_dim", 128))
        self.dv = int(hf.get("linear_value_head_dim", 128))
        self.conv_k = int(hf.get("linear_conv_kernel_dim", 4))
        self.key_dim = self.nk * self.dk
        self.value_dim = self.nv * self.dv
        self.conv_dim = 2 * self.key_dim + self.value_dim
        self.rep = self.nv // self.nk
        # layer types (default: 3 linear + 1 full per 4)
        lt = hf.get("layer_types")
        L = config.num_hidden_layers
        if not lt:
            interval = int(hf.get("full_attention_interval", 4))
            lt = [
                "full_attention" if (i + 1) % interval == 0
                else "linear_attention"
                for i in range(L)
            ]
        self.layer_types = list(lt)
        self.n_linear = sum(
            1 for t in self.layer_types if t == "linear_attention"
        )
        self.num_kv_layers = L - self.n_linear  # paged pool sizing
        # MoE (decoder_sparse_step=1 → every layer; dense-only also ok)
        self.n_experts = int(hf.get("num_experts", 0) or 0)
        step = int(hf.get("decoder_sparse_step", 1) or 1)
        only = hf.get("mlp_only_layers") or []
        self.moe_layers = [
            bool(self.n_experts)
            and (i not in only)
            and ((i + 1) % step == 0)
            for i in range(L)
        ]
        if any(self.moe_layers) and not all(self.moe_layers):
            raise NotImplementedError(
                "Qwen3-Next mixed dense/MoE per-layer stacks"
            )
        self.is_moe = all(self.moe_layers) and bool(self.n_experts)
        self.top_k = int(hf.get("num_experts_per_tok", 8) or 0)
        self.moe_inter = int(
            hf.get("moe_intermediate_size", config.intermediate_size)
        )
        self.shared_inter = int(
            hf.get("shared_expert_intermediate_size", 0) or 0
        )
        self.inv_freq = compute_inv_freq(
            self.hd, config.rope_theta, config.rope_scaling,
            config.partial_rotary_factor,
        )
        self.rot_half = int(self.inv_freq.shape[0])

    # ------------------------------------------------------------ schema
    def _mlp_leaves(self, n: int) -> Dict[str, Any]:
        H, I = self.config.hidden_size, self.config.intermediate_size
        if not self.is_moe:
            return {
                "gate_proj": (n, H, I),
                "up_proj": (n, H, I),
                "down_proj": (n, I, H),
            }
        E, MI, SI = self.n_experts, self.moe_inter, self.shared_inter
        leaves = {
            "moe_gate": (n, H, E),
            "moe_w1": (n, E, H, MI),
            "moe_w3": (n, E, H, MI),
            "moe_w2": (n, E, MI, H),
        }
        if SI:
            leaves.update(
                shared_gate=(n, H, SI),
                shared_up=(n, H, SI),
                shared_down=(n, SI, H),
                shared_egate=(n, H, 1),
            )
        return leaves

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H = c.hidden_size
        hq, hkv, d = self.hq, self.hkv, self.hd
        Ll, Lf = self.n_linear, self.num_kv_layers
        qkvz = self.nk * (2 * self.dk + 2 * self.rep * self.dv)
        shapes = {"embed": (c.vocab_size, H), "final_ln": (H,)}
        if Ll:
            shapes["lin_layers"] = {
                "input_ln": (Ll, H),
                "in_qkvz": (Ll, H, qkvz),
                "in_ba": (Ll, H, 2 * self.nv),
                "conv_w": (Ll, self.conv_dim, self.conv_k),
                "dt_bias": (Ll, self.nv),
                "A_log": (Ll, self.nv),
                "gnorm": (Ll, self.dv),
                "out_proj": (Ll, self.value_dim, H),
                "post_ln": (Ll, H),
                **self._mlp_leaves(Ll),
            }
        if Lf:
            shapes["full_layers"] = {
                "input_ln": (Lf, H),
                "q_proj": (Lf, H, 2 * hq * d),  # query + output gate
                "k_proj": (Lf, H, hkv * d),
                "v_proj": (Lf, H, hkv * d),
                "o_proj": (Lf, hq * d, H),
                "q_norm": (Lf, d),
                "k_norm": (Lf, d),
                "post_ln": (Lf, H),
                **self._mlp_leaves(Lf),
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
                if k in ("in_qkvz", "in_ba", "q_proj", "k_proj", "v_proj",
                         "gate_proj", "up_proj", "shared_gate",
                         "shared_up"):
                    out[k] = P(*([None] * (nd - 1) + [AXIS_TP]))
                elif k in ("o_proj", "out_proj", "down_proj",
                           "shared_down"):
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
        lin_idx, full_idx = {}, {}
        for i, t in enumerate(self.layer_types):
            if t == "linear_attention":
                lin_idx[i] = len(lin_idx)
            else:
                full_idx[i] = len(full_idx)
        lin_table = {
            "linear_attn.in_proj_qkvz.weight": ("in_qkvz", "t"),
            "linear_attn.in_proj_ba.weight": ("in_ba", "t"),
            "linear_attn.conv1d.weight": (
                "conv_w", lambda t: np.asarray(t)[:, 0, :]
            ),
            "linear_attn.dt_bias": ("dt_bias", None),
            "linear_attn.A_log": ("A_log", None),
            "linear_attn.norm.weight": ("gnorm", None),
            "linear_attn.out_proj.weight": ("out_proj", "t"),
        }
        full_table = {
            "self_attn.q_proj.weight": ("q_proj", "t"),
            "self_attn.k_proj.weight": ("k_proj", "t"),
            "self_attn.v_proj.weight": ("v_proj", "t"),
            "self_attn.o_proj.weight": ("o_proj", "t"),
            "self_attn.q_norm.weight": ("q_norm", None),
            "self_attn.k_norm.weight": ("k_norm", None),
        }
        both = {
            "input_layernorm.weight": ("input_ln", None),
            "post_attention_layernorm.weight": ("post_ln", None),
            "mlp.gate.weight": ("moe_gate", "t"),
            "mlp.shared_expert.gate_proj.weight": ("shared_gate", "t"),
            "mlp.shared_expert.up_proj.weight": ("shared_up", "t"),
            "mlp.shared_expert.down_proj.weight": ("shared_down", "t"),
            "mlp.shared_expert_gate.weight": ("shared_egate", "t"),
            "mlp.gate_proj.weight": ("gate_proj", "t"),
            "mlp.up_proj.weight": ("up_proj", "t"),
            "mlp.down_proj.weight": ("down_proj", "t"),
        }
        expert_leaf = {
            "gate_proj": "moe_w1", "up_proj": "moe_w3",
            "down_proj": "moe_w2",
        }

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
            is_lin = self.layer_types[li] == "linear_attention"
            stack = "lin_layers" if is_lin else "full_layers"
            idx = lin_idx[li] if is_lin else full_idx[li]
            if ".experts." in f".{tail}":
                sub = tail.split(".")
                e = int(sub[sub.index("experts") + 1])
                leaf = expert_leaf.get(sub[-2])
                if leaf is None:
                    return None
                return (f"{stack}.{leaf}", (idx, e), "t")
            for table in (lin_table if is_lin else full_table, both):
                if tail in table:
                    leaf, tf = table[tail]
                    return (f"{stack}.{leaf}", idx, tf)
            return None

        return mapping

    # --------------------------------------------------------- state pool
    def init_state_pool(self, num_pages: int, dtype=jnp.float32):
        return {
            "conv": jnp.zeros(
                (self.n_linear, num_pages, self.conv_k - 1, self.conv_dim),
                self.config.dtype,
            ),
            "rec": jnp.zeros(
                (self.n_linear, num_pages, self.nv, self.dk, self.dv),
                jnp.float32,
            ),
        }

    def state_pool_bytes_per_slot(self) -> int:
        return (
            2 * self.n_linear * (self.conv_k - 1) * self.conv_dim
            + 4 * self.n_linear * self.nv * self.dk * self.dv
        )

    # ---------------------------------------------------------- sublayers
    def _gdn(self, w, normed, conv_pool, rec_pool, li, slot, tmask, n_new):
        B, Lq, H = normed.shape
        nk, nv, dk, dv, rep = self.nk, self.nv, self.dk, self.dv, self.rep
        k_sz = self.conv_k

        qkvz = (normed @ w["in_qkvz"]).reshape(
            B, Lq, nk, 2 * dk + 2 * rep * dv
        )
        ba = (normed @ w["in_ba"]).reshape(B, Lq, nk, 2 * rep)
        q = qkvz[..., :dk].reshape(B, Lq, nk * dk)
        k = qkvz[..., dk: 2 * dk].reshape(B, Lq, nk * dk)
        v = qkvz[..., 2 * dk: 2 * dk + rep * dv].reshape(
            B, Lq, nv * dv
        )
        z = qkvz[..., 2 * dk + rep * dv:].reshape(B, Lq, nv, dv)
        b = ba[..., :rep].reshape(B, Lq, nv)
        a = ba[..., rep:].reshape(B, Lq, nv)

        # causal depthwise conv (+silu) over the flat [q|k|v] stream,
        # state carried across chunks (no bias in Qwen3-Next)
        mixed = jnp.concatenate([q, k, v], axis=-1)  # [B, Lq, conv_dim]
        mixed = jnp.where(tmask[..., None], mixed, 0.0)
        cstate = conv_pool[li][slot]  # [B, k-1, conv_dim]
        ext = jnp.concatenate(
            [cstate.astype(mixed.dtype), mixed], axis=1
        )
        conv = sum(
            ext[:, i: i + Lq] * w["conv_w"][:, i] for i in range(k_sz)
        )
        mixed = jax.nn.silu(conv)
        gidx = (
            n_new[:, None] + jnp.arange(k_sz - 1, dtype=jnp.int32)[None]
        )
        new_cstate = jnp.take_along_axis(ext, gidx[..., None], axis=1)
        conv_pool = conv_pool.at[li, slot].set(
            new_cstate.astype(conv_pool.dtype)
        )

        kd = nk * dk
        q = mixed[..., :kd].reshape(B, Lq, nk, dk)
        k = mixed[..., kd: 2 * kd].reshape(B, Lq, nk, dk)
        v = mixed[..., 2 * kd:].reshape(B, Lq, nv, dv)

        q = _l2norm(q) * (dk ** -0.5)
        k = _l2norm(k)
        if rep > 1:
            q = jnp.repeat(q, rep, axis=2)  # [B, Lq, nv, dk]
            k = jnp.repeat(k, rep, axis=2)
        beta = jax.nn.sigmoid(b.astype(jnp.float32))
        g = -jnp.exp(w["A_log"].astype(jnp.float32)) * jax.nn.softplus(
            a.astype(jnp.float32) + w["dt_bias"]
        )
        # padded tokens are exact no-ops on the state
        beta = jnp.where(tmask[..., None], beta, 0.0)
        g = jnp.where(tmask[..., None], g, 0.0)

        S0 = rec_pool[li][slot]  # [B, nv, dk, dv] f32
        if Lq > 1:
            # prefill: chunked WY formulation — within-chunk [Q, Q] MXU
            # matmuls + one triangular solve, exactly equal to the
            # per-token recurrence
            y, S = _chunked_gdn(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), g, beta, S0,
            )
        else:
            # decode: one recurrence step
            # (reference torch_recurrent_gated_delta_rule)
            def step(S, xs):
                q_t, k_t, v_t, g_t, b_t = xs
                S = S * jnp.exp(g_t)[..., None, None]
                kv_mem = jnp.einsum("bhkv,bhk->bhv", S, k_t)
                delta = (v_t - kv_mem) * b_t[..., None]
                S = S + k_t[..., None] * delta[..., None, :]
                y = jnp.einsum("bhkv,bhk->bhv", S, q_t)
                return S, y

            xs = (
                q.astype(jnp.float32).transpose(1, 0, 2, 3),
                k.astype(jnp.float32).transpose(1, 0, 2, 3),
                v.astype(jnp.float32).transpose(1, 0, 2, 3),
                g.transpose(1, 0, 2),
                beta.transpose(1, 0, 2),
            )
            S, ys = jax.lax.scan(step, S0, xs)
            y = ys.transpose(1, 0, 2, 3)  # [B, Lq, nv, dv]
        rec_pool = rec_pool.at[li, slot].set(S)

        # gated RMSNorm (plain weight, NOT zero-centered): norm(y)·w·silu(z)
        yf = y
        var = jnp.mean(yf * yf, axis=-1, keepdims=True)
        yn = yf * jax.lax.rsqrt(var + self.eps)
        yn = yn * w["gnorm"].astype(jnp.float32)
        yn = yn * jax.nn.silu(z.astype(jnp.float32))
        out = yn.reshape(B, Lq, self.value_dim).astype(normed.dtype)
        return out @ w["out_proj"], conv_pool, rec_pool

    def _full_attn(self, w, normed, kv, batch, li, *, num_slots,
                   page_size, attn_backend):
        B, Lq, H = normed.shape
        hq, hkv, d = self.hq, self.hkv, self.hd
        qg = (normed @ w["q_proj"]).reshape(B, Lq, hq, 2 * d)
        q, gate = qg[..., :d], qg[..., d:].reshape(B, Lq, hq * d)
        k = (normed @ w["k_proj"]).reshape(B, Lq, hkv, d)
        v = (normed @ w["v_proj"]).reshape(B, Lq, hkv, d)
        q = rms_norm(q, w["q_norm"], self.eps, offset=1.0)
        k = rms_norm(k, w["k_norm"], self.eps, offset=1.0)
        # partial rotary, half-split over the rotary span
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
        attn_out = attn_out.reshape(B, Lq, hq * d)
        attn_out = attn_out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(
            attn_out.dtype
        )
        return attn_out @ w["o_proj"], kv

    def _mlp(self, w, normed):
        if not self.is_moe:
            inter = act_and_mul(
                self.config.hidden_act,
                normed @ w["gate_proj"], normed @ w["up_proj"],
            )
            return inter @ w["down_proj"]
        out = moe_block(
            normed, w["moe_gate"], w["moe_w1"], w["moe_w3"], w["moe_w2"],
            top_k=self.top_k,
            norm_topk_prob=bool(self.config.norm_topk_prob),
            hidden_act=self.config.hidden_act,
        )
        if self.shared_inter:
            shared = act_and_mul(
                self.config.hidden_act,
                normed @ w["shared_gate"], normed @ w["shared_up"],
            ) @ w["shared_down"]
            sg = jax.nn.sigmoid(
                (normed @ w["shared_egate"]).astype(jnp.float32)
            )
            out = out + (shared.astype(jnp.float32) * sg).astype(out.dtype)
        return out

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params,
        kv_cache,  # {"kv": paged pool, "conv": ..., "rec": ...}
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
        conv_pool, rec_pool = kv_cache["conv"], kv_cache["rec"]
        # Recycled state slots: zero fresh rows' slots before any layer
        # reads them (models/mamba.fresh_state_rows).
        zslot = jnp.where(fresh_state_rows(batch), slot, 0)
        conv_pool = conv_pool.at[:, zslot].set(0.0)
        rec_pool = rec_pool.at[:, zslot].set(0.0)
        li_lin = li_full = 0
        for i, t in enumerate(self.layer_types):
            if t == "linear_attention":
                w = jax.tree_util.tree_map(
                    lambda a, j=li_lin: a[j], params["lin_layers"]
                )
                normed = rms_norm(hidden, w["input_ln"], self.eps, offset=1.0)
                out, conv_pool, rec_pool = self._gdn(
                    w, normed, conv_pool, rec_pool, li_lin, slot, tmask,
                    n_new,
                )
                li_lin += 1
            else:
                w = jax.tree_util.tree_map(
                    lambda a, j=li_full: a[j], params["full_layers"]
                )
                normed = rms_norm(hidden, w["input_ln"], self.eps, offset=1.0)
                out, kv = self._full_attn(
                    w, normed, kv, batch, li_full,
                    num_slots=num_slots, page_size=page_size,
                    attn_backend=attn_backend,
                )
                li_full += 1
            hidden = hidden + out
            normed = rms_norm(hidden, w["post_ln"], self.eps, offset=1.0)
            hidden = hidden + self._mlp(w, normed)

        kv_cache = {"kv": kv, "conv": conv_pool, "rec": rec_pool}
        features = hidden
        hidden = rms_norm(hidden, params["final_ln"], self.eps, offset=1.0)
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


EntryClass = [Qwen3NextForCausalLM]
