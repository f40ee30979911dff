"""Bamba: hybrid Mamba2 + attention causal LM (IBM Bamba / HF ``bamba``).

Equivalent role to the reference's hybrid-SSM serving families
(``srt/models/nemotron_h.py`` / falcon_h1 class) — most layers run the
Mamba2 SSD mixer (same math as ``models/mamba.py``: carried conv state
+ chunked state-space duality), the layers listed in
``attn_layer_indices`` run GQA attention (partial half-split rotary,
no biases) over a paged KV pool sized to the attention-layer count,
and EVERY layer ends with a gated-SiLU MLP.  Conv + SSM states live in
the Mamba-style state pool; the runner's hybrid cache carries
{"kv", "conv", "ssm"} through every jitted step."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.layers.attention import paged_attention
from sglang_tpu.layers.norm import rms_norm
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.models.mamba import _chunked_ssd, fresh_state_rows
from sglang_tpu.parallel.mesh import AXIS_TP


class BambaForCausalLM:
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
        self.eps = config.rms_norm_eps
        # mamba mixer geometry (HF BambaMixer)
        self.d_inner = int(hf.get("mamba_expand", 2)) * H
        self.n_heads = int(hf.get("mamba_n_heads", 128))
        self.headdim = int(
            hf.get("mamba_d_head", self.d_inner // self.n_heads)
        )
        self.d_state = int(hf.get("mamba_d_state", 256))
        self.n_groups = int(hf.get("mamba_n_groups", 1))
        self.conv_k = int(hf.get("mamba_d_conv", 4))
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.d_in_proj = (
            2 * self.d_inner + 2 * self.n_groups * self.d_state
            + self.n_heads
        )
        L = config.num_hidden_layers
        lbt = hf.get("layers_block_type")
        if not lbt:
            attn_idx = set(hf.get("attn_layer_indices") or [])
            lbt = [
                "attention" if i in attn_idx else "mamba"
                for i in range(L)
            ]
        self.layer_types = list(lbt)
        self.n_mamba = sum(1 for t in self.layer_types if t == "mamba")
        self.num_kv_layers = L - self.n_mamba
        self.inv_freq = compute_inv_freq(
            self.hd, config.rope_theta, config.rope_scaling,
            config.partial_rotary_factor,
        )
        self.rot_half = int(self.inv_freq.shape[0])

    # ------------------------------------------------------------ schema
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        hq, hkv, d = self.hq, self.hkv, self.hd
        Lm, Lf = self.n_mamba, self.num_kv_layers
        mlp = lambda n: {  # noqa: E731
            "gate_proj": (n, H, I),
            "up_proj": (n, H, I),
            "down_proj": (n, I, H),
            "post_ln": (n, H),
        }
        shapes = {"embed": (c.vocab_size, H), "final_ln": (H,)}
        if Lm:
            shapes["mamba_layers"] = {
                "input_ln": (Lm, H),
                "in_proj": (Lm, H, self.d_in_proj),
                "conv_w": (Lm, self.conv_dim, self.conv_k),
                "conv_b": (Lm, self.conv_dim),
                "dt_bias": (Lm, self.n_heads),
                "A_log": (Lm, self.n_heads),
                "D": (Lm, self.n_heads),
                "gnorm": (Lm, self.d_inner),
                "out_proj": (Lm, self.d_inner, H),
                **mlp(Lm),
            }
        if Lf:
            shapes["attn_layers"] = {
                "input_ln": (Lf, H),
                "q_proj": (Lf, H, hq * d),
                "k_proj": (Lf, H, hkv * d),
                "v_proj": (Lf, H, hkv * d),
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
                         "gate_proj", "up_proj"):
                    out[k] = P(*([None] * (nd - 1) + [AXIS_TP]))
                elif k in ("o_proj", "out_proj", "down_proj"):
                    out[k] = P(*([None] * (nd - 2) + [AXIS_TP, None]))
                elif k in ("embed", "lm_head"):
                    out[k] = P(AXIS_TP, None)
                else:
                    out[k] = P(*([None] * nd))
            return out

        return spec_like(self.param_shapes())

    def hf_weight_mapping(self):
        m_idx, a_idx = {}, {}
        for i, t in enumerate(self.layer_types):
            if t == "mamba":
                m_idx[i] = len(m_idx)
            else:
                a_idx[i] = len(a_idx)
        mamba_table = {
            "mamba.in_proj.weight": ("in_proj", "t"),
            "mamba.conv1d.weight": (
                "conv_w", lambda t: np.asarray(t)[:, 0, :]
            ),
            "mamba.conv1d.bias": ("conv_b", None),
            "mamba.dt_bias": ("dt_bias", None),
            "mamba.A_log": ("A_log", None),
            "mamba.D": ("D", None),
            "mamba.norm.weight": ("gnorm", None),
            "mamba.out_proj.weight": ("out_proj", "t"),
        }
        attn_table = {
            "self_attn.q_proj.weight": ("q_proj", "t"),
            "self_attn.k_proj.weight": ("k_proj", "t"),
            "self_attn.v_proj.weight": ("v_proj", "t"),
            "self_attn.o_proj.weight": ("o_proj", "t"),
        }
        both = {
            "input_layernorm.weight": ("input_ln", None),
            "pre_ff_layernorm.weight": ("post_ln", None),
            "feed_forward.gate_proj.weight": ("gate_proj", "t"),
            "feed_forward.up_proj.weight": ("up_proj", "t"),
            "feed_forward.down_proj.weight": ("down_proj", "t"),
        }

        def mapping(name: str):
            if name in ("model.embed_tokens.weight", "embed_tokens.weight"):
                return ("embed", None, None)
            if name in ("model.final_layernorm.weight",
                        "final_layernorm.weight"):
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
            is_m = self.layer_types[li] == "mamba"
            stack = "mamba_layers" if is_m else "attn_layers"
            idx = m_idx[li] if is_m else a_idx[li]
            for table in (mamba_table if is_m else attn_table, both):
                if tail in table:
                    leaf, tf = table[tail]
                    return (f"{stack}.{leaf}", idx, tf)
            return None

        return mapping

    # --------------------------------------------------------- state pool
    def init_state_pool(self, num_pages: int, dtype=jnp.float32):
        return {
            "conv": jnp.zeros(
                (self.n_mamba, num_pages, self.conv_k - 1, self.conv_dim),
                self.config.dtype,
            ),
            "ssm": jnp.zeros(
                (
                    self.n_mamba, num_pages, self.n_heads, self.headdim,
                    self.d_state,
                ),
                jnp.float32,
            ),
        }

    def state_pool_bytes_per_slot(self) -> int:
        return (
            2 * self.n_mamba * (self.conv_k - 1) * self.conv_dim
            + 4 * self.n_mamba * self.n_heads * self.headdim * self.d_state
        )

    # ---------------------------------------------------------- sublayers
    def _mamba_mixer(self, w, normed, conv_pool, ssm_pool, li, slot,
                     tmask, n_new):
        """One Mamba2 mixer (identical math to models/mamba.py)."""
        B, Lq, H = normed.shape
        nh, hd, ns, ng = (
            self.n_heads, self.headdim, self.d_state, self.n_groups,
        )
        di, k = self.d_inner, self.conv_k
        zxbcdt = normed @ w["in_proj"]
        z = zxbcdt[..., :di]
        xBC = zxbcdt[..., di: di + self.conv_dim]
        dt_raw = zxbcdt[..., di + self.conv_dim:]

        xBC = jnp.where(tmask[..., None], xBC, 0.0)
        cstate = conv_pool[li][slot]
        ext = jnp.concatenate([cstate.astype(xBC.dtype), xBC], axis=1)
        conv = sum(
            ext[:, i: i + Lq] * w["conv_w"][:, i] for i in range(k)
        ) + w["conv_b"]
        xBC = jax.nn.silu(conv)
        gidx = (
            n_new[:, None] + jnp.arange(k - 1, dtype=jnp.int32)[None]
        )
        new_cstate = jnp.take_along_axis(ext, gidx[..., None], axis=1)
        conv_pool = conv_pool.at[li, slot].set(
            new_cstate.astype(conv_pool.dtype)
        )

        x = xBC[..., :di].reshape(B, Lq, nh, hd)
        Bmat = xBC[..., di: di + ng * ns].reshape(B, Lq, ng, ns)
        Cmat = xBC[..., di + ng * ns:].reshape(B, Lq, ng, ns)
        rep = nh // ng
        Bh = jnp.repeat(Bmat, rep, axis=2)
        Ch = jnp.repeat(Cmat, rep, axis=2)
        dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + w["dt_bias"])
        dt = jnp.where(tmask[..., None], dt, 0.0)
        A = -jnp.exp(w["A_log"].astype(jnp.float32))
        sstate = ssm_pool[li][slot].astype(jnp.float32)

        if Lq == 1:
            dA = jnp.exp(dt[:, 0] * A)
            upd = (
                dt[:, 0, :, None, None]
                * x[:, 0, :, :, None].astype(jnp.float32)
                * Bh[:, 0, :, None, :].astype(jnp.float32)
            )
            sstate = sstate * dA[:, :, None, None] + upd
            y = jnp.einsum(
                "bhpn,bhn->bhp", sstate, Ch[:, 0].astype(jnp.float32)
            )[:, None]
        else:
            y, sstate = _chunked_ssd(
                x.astype(jnp.float32), dt, A,
                Bh.astype(jnp.float32), Ch.astype(jnp.float32), sstate,
            )
        ssm_pool = ssm_pool.at[li, slot].set(sstate.astype(ssm_pool.dtype))
        y = y + w["D"][:, None] * x.astype(jnp.float32)
        y = y.reshape(B, Lq, di)
        y = y * jax.nn.silu(z.astype(jnp.float32))
        y = rms_norm(y, w["gnorm"], self.eps)
        return (y.astype(normed.dtype) @ w["out_proj"]), conv_pool, ssm_pool

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
        kv_cache,  # {"kv", "conv", "ssm"}
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
        conv_pool, ssm_pool = kv_cache["conv"], kv_cache["ssm"]
        # Recycled state slots: zero fresh rows' slots before any layer
        # reads them (models/mamba.fresh_state_rows — a fresh request
        # must not inherit a finished request's conv/SSM state; slot 0
        # is the garbage page, safe to zero for non-fresh rows).
        zslot = jnp.where(fresh_state_rows(batch), slot, 0)
        conv_pool = conv_pool.at[:, zslot].set(0.0)
        ssm_pool = ssm_pool.at[:, zslot].set(0.0)
        li_m = li_a = 0
        for i, t in enumerate(self.layer_types):
            if t == "mamba":
                w = jax.tree_util.tree_map(
                    lambda a, j=li_m: a[j], params["mamba_layers"]
                )
                normed = rms_norm(hidden, w["input_ln"], self.eps)
                out, conv_pool, ssm_pool = self._mamba_mixer(
                    w, normed, conv_pool, ssm_pool, li_m, slot, tmask,
                    n_new,
                )
                li_m += 1
            else:
                w = jax.tree_util.tree_map(
                    lambda a, j=li_a: a[j], params["attn_layers"]
                )
                normed = rms_norm(hidden, w["input_ln"], self.eps)
                out, kv = self._attn(
                    w, normed, kv, batch, li_a,
                    num_slots=num_slots, page_size=page_size,
                    attn_backend=attn_backend,
                )
                li_a += 1
            hidden = hidden + out
            normed = rms_norm(hidden, w["post_ln"], self.eps)
            mlp = act_and_mul(
                c.hidden_act,
                normed @ w["gate_proj"], normed @ w["up_proj"],
            ) @ w["down_proj"]
            hidden = hidden + mlp

        kv_cache = {"kv": kv, "conv": conv_pool, "ssm": ssm_pool}
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


EntryClass = [BambaForCausalLM]
