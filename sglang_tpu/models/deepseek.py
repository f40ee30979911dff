"""DeepSeek-V2 / V3 family (Multi-head Latent Attention + MoE).

Equivalent role to the reference's ``srt/models/deepseek_v2.py`` (the
flagship MLA family, DeepSeek-V2/V3/R1) — TPU-native v1:

* **MLA latent KV cache**: the pool stores ONE vector per token —
  ``[c_kv (kv_lora_rank, rms-normed) | k_rope (qk_rope_head_dim)]`` — as a
  single "kv head" (ModelConfig maps MLA → n_kv=1, head_dim=rank+rope),
  i.e. the reference's MLATokenToKVPool (memory_pool.py:2610).
* **Naive-decompress attention** on the XLA backend: the gathered latent
  context is expanded through ``kv_b_proj`` per layer, then standard
  masked attention with d_qk = qk_nope+qk_rope and d_v = v_head_dim.
  The absorbed-matmul decode kernel (attend in latent space) is the
  planned fast path.
* **Two-phase layer stacks**: the first ``first_k_dense_replace`` layers
  use a dense MLP and run unrolled; the remaining MoE layers (routed +
  shared experts, softmax 'greedy' or sigmoid+bias 'noaux_tc' gating,
  routed_scaling_factor) run under one ``lax.scan``.
* DeepSeek rope is INTERLEAVED: HF de-interleaves (even|odd) before the
  half-split rotation — matched exactly (parity test vs transformers).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.layers.attention import gather_kv, paged_attention, write_kv
from sglang_tpu.layers.moe import moe_block
from sglang_tpu.layers.norm import rms_norm
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.model_executor.forward_batch import DeviceBatch
from sglang_tpu.parallel.mesh import AXIS_TP


class DeepseekV2ForCausalLM:
    def __init__(self, config: ModelConfig, mesh_ctx=None):
        self.config = config
        self.mesh_ctx = mesh_ctx
        hf = config.hf_config
        self.hq = config.num_attention_heads
        self.q_lora_rank = hf.get("q_lora_rank")
        self.kv_lora_rank = hf["kv_lora_rank"]
        self.qk_nope = hf["qk_nope_head_dim"]
        self.qk_rope = hf["qk_rope_head_dim"]
        self.v_dim = hf["v_head_dim"]
        self.q_head_dim = self.qk_nope + self.qk_rope
        self.sm_scale = self.q_head_dim ** -0.5
        self.first_k_dense = hf.get("first_k_dense_replace", 0)
        self.n_experts = hf.get("n_routed_experts", 0) or 0
        self.n_shared = hf.get("n_shared_experts", 0) or 0
        self.top_k = hf.get("num_experts_per_tok", 0) or 0
        self.moe_inter = hf.get("moe_intermediate_size", config.intermediate_size)
        self.routed_scaling = float(hf.get("routed_scaling_factor", 1.0))
        self.scoring = hf.get("scoring_func", "softmax")
        # group-limited routing (reference layers/moe/topk.py noaux_tc)
        self.n_group = int(hf.get("n_group", 1) or 1)
        self.topk_group = int(hf.get("topk_group", 1) or 1)
        self.topk_method = hf.get("topk_method", "greedy")
        self.norm_topk = bool(hf.get("norm_topk_prob", False))
        if self.n_experts == 0:
            self.first_k_dense = config.num_hidden_layers
        self.n_moe_layers = config.num_hidden_layers - self.first_k_dense
        self.inv_freq = compute_inv_freq(self.qk_rope, config.rope_theta, None, 1.0)

    # ------------------------------------------------------------- params
    def _attn_shapes(self, L: int) -> Dict[str, Any]:
        hf = self.config.hf_config
        H = self.config.hidden_size
        hq, rank = self.hq, self.kv_lora_rank
        shapes = {
            "input_ln": (L, H),
            "kv_a": (L, H, rank + self.qk_rope),
            "kv_a_ln": (L, rank),
            "kv_b": (L, rank, hq * (self.qk_nope + self.v_dim)),
            "o_proj": (L, hq * self.v_dim, H),
            "post_ln": (L, H),
        }
        if self.q_lora_rank:
            shapes["q_a"] = (L, H, self.q_lora_rank)
            shapes["q_a_ln"] = (L, self.q_lora_rank)
            shapes["q_b"] = (L, self.q_lora_rank, hq * self.q_head_dim)
        else:
            shapes["q_proj"] = (L, H, hq * self.q_head_dim)
        return shapes

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, V, I = c.hidden_size, c.vocab_size, c.intermediate_size
        Kd, Km = self.first_k_dense, self.n_moe_layers
        dense = {
            **self._attn_shapes(Kd),
            "gate_proj": (Kd, H, I),
            "up_proj": (Kd, H, I),
            "down_proj": (Kd, I, H),
        }
        shapes = {"embed": (V, H), "final_ln": (H,)}
        if Kd > 0:
            shapes["dense_layers"] = dense
        if Km > 0:
            MI, E = self.moe_inter, self.n_experts
            moe = {
                **self._attn_shapes(Km),
                "moe_gate": (Km, H, E),
                "moe_w1": (Km, E, H, MI),
                "moe_w3": (Km, E, H, MI),
                "moe_w2": (Km, E, MI, H),
            }
            if self._moe_int8():
                from sglang_tpu.layers.quantization import ParamShape

                moe.update(
                    moe_w1=ParamShape((Km, E, H, MI), jnp.int8, fan=H),
                    moe_w1_scale=ParamShape(
                        (Km, E, 1, MI), jnp.float32, fan=H
                    ),
                    moe_w3=ParamShape((Km, E, H, MI), jnp.int8, fan=H),
                    moe_w3_scale=ParamShape(
                        (Km, E, 1, MI), jnp.float32, fan=H
                    ),
                    moe_w2=ParamShape((Km, E, MI, H), jnp.int8, fan=MI),
                    moe_w2_scale=ParamShape(
                        (Km, E, 1, H), jnp.float32, fan=MI
                    ),
                )
            if self.topk_method == "noaux_tc":
                moe["gate_bias"] = (Km, E)
            if self.n_shared:
                SI = MI * self.n_shared
                moe["shared_gate"] = (Km, H, SI)
                moe["shared_up"] = (Km, H, SI)
                moe["shared_down"] = (Km, SI, H)
            shapes["moe_layers"] = moe
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (V, H)
        return shapes

    def _expert_parallel(self) -> bool:
        return (
            self.mesh_ctx is not None
            and self.mesh_ctx.parallel.ep_size > 1
            and self.n_experts > 0
            and self.n_experts % self.mesh_ctx.tp_size == 0
        )

    def param_specs(self) -> Dict[str, Any]:
        ep = self._expert_parallel()

        def spec_like(tree):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = spec_like(v)
                    continue
                nd = len(v)
                # column-shard large projection outputs; replicate norms
                if k in ("q_b", "q_proj", "kv_b", "gate_proj", "up_proj",
                         "shared_gate", "shared_up"):
                    out[k] = P(*([None] * (nd - 1) + [AXIS_TP]))
                elif k in ("o_proj", "down_proj", "shared_down"):
                    out[k] = P(*([None] * (nd - 2) + [AXIS_TP, None]))
                elif ep and k.startswith("moe_w"):
                    # EP: experts sharded over the tp axis (weights AND
                    # their int8 per-out-channel scales move together)
                    out[k] = P(None, AXIS_TP, None, None)
                elif k in ("moe_w1", "moe_w3", "moe_w1_scale",
                           "moe_w3_scale"):
                    out[k] = P(None, None, None, AXIS_TP)
                elif k == "moe_w2":
                    out[k] = P(None, None, AXIS_TP, None)
                elif k == "moe_w2_scale":
                    out[k] = P(None, None, None, None)
                elif k == "embed" or k == "lm_head":
                    out[k] = P(AXIS_TP, None)
                else:
                    out[k] = P(*([None] * nd))
            return out

        return spec_like(self.param_shapes())

    # ------------------------------------------------------- weight loading
    def hf_weight_mapping(self):
        attn_table = {
            "input_layernorm.weight": ("input_ln", None),
            "post_attention_layernorm.weight": ("post_ln", None),
            "self_attn.q_proj.weight": ("q_proj", "t"),
            "self_attn.q_a_proj.weight": ("q_a", "t"),
            "self_attn.q_a_layernorm.weight": ("q_a_ln", None),
            "self_attn.q_b_proj.weight": ("q_b", "t"),
            "self_attn.kv_a_proj_with_mqa.weight": ("kv_a", "t"),
            "self_attn.kv_a_layernorm.weight": ("kv_a_ln", None),
            "self_attn.kv_b_proj.weight": ("kv_b", "t"),
            "self_attn.o_proj.weight": ("o_proj", "t"),
            "mlp.gate_proj.weight": ("gate_proj", "t"),
            "mlp.up_proj.weight": ("up_proj", "t"),
            "mlp.down_proj.weight": ("down_proj", "t"),
            "mlp.gate.weight": ("moe_gate", "t"),
            "mlp.gate.e_score_correction_bias": ("gate_bias", None),
            "mlp.shared_experts.gate_proj.weight": ("shared_gate", "t"),
            "mlp.shared_experts.up_proj.weight": ("shared_up", "t"),
            "mlp.shared_experts.down_proj.weight": ("shared_down", "t"),
        }
        expert_table = {
            "gate_proj": "moe_w1",
            "up_proj": "moe_w3",
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
            stack, idx = (
                ("dense_layers", li)
                if li < self.first_k_dense
                else ("moe_layers", li - self.first_k_dense)
            )
            if ".experts." in f".{tail}":
                sub = tail.split(".")
                e = int(sub[sub.index("experts") + 1])
                leaf = expert_table.get(sub[-2])
                if leaf is None:
                    return None
                if self._moe_int8():
                    import numpy as _np

                    # quantize to int8-resident + per-out-channel scale;
                    # wants_dequant makes the loader fold any checkpoint
                    # sibling scale in first (block-fp8 siblings always
                    # dequantize on read)
                    def q8(t, leaf=leaf):
                        wq = _np.asarray(t, _np.float32).T  # [in, out]
                        s = _np.abs(wq).max(axis=0, keepdims=True)
                        s = _np.maximum(s, 1e-8) / 127.0
                        qw = _np.clip(
                            _np.round(wq / s), -127, 127
                        ).astype(_np.int8)
                        return {
                            leaf: qw,
                            leaf + "_scale": s.astype(_np.float32),
                        }

                    q8.wants_dequant = True
                    return (stack, (idx, e), q8)
                return (f"{stack}.{leaf}", (idx, e), "t")
            if tail in attn_table:
                leaf, tf = attn_table[tail]
                return (f"{stack}.{leaf}", idx, tf)
            return None

        return mapping

    # ------------------------------------------------------------- forward
    def _rope(self, x, cos, sin):
        """DeepSeek interleaved rope: de-interleave, then half rotation."""
        d = x.shape[-1]
        xf = x.astype(jnp.float32)
        xf = xf.reshape(*x.shape[:-1], d // 2, 2)
        x1 = xf[..., 0]  # even lanes
        x2 = xf[..., 1]  # odd lanes
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)

    def _attention(self, w, h, kv, batch, li, cos, sin, num_slots, page_size,
                   attn_backend):
        c = self.config
        B, Lq = batch.input_ids.shape
        hq, rank = self.hq, self.kv_lora_rank
        nope, rope, vd = self.qk_nope, self.qk_rope, self.v_dim

        normed = rms_norm(h, w["input_ln"], c.rms_norm_eps)
        if self.q_lora_rank:
            qa = rms_norm(normed @ w["q_a"], w["q_a_ln"], c.rms_norm_eps)
            q = qa @ w["q_b"]
        else:
            q = normed @ w["q_proj"]
        q = q.reshape(B, Lq, hq, self.q_head_dim)
        q_nope, q_pe = q[..., :nope], q[..., nope:]
        q_pe = self._rope(q_pe, cos, sin)

        kv_a = normed @ w["kv_a"]  # [B, Lq, rank + rope]
        c_kv = rms_norm(kv_a[..., :rank], w["kv_a_ln"], c.rms_norm_eps)
        k_pe = self._rope(kv_a[..., None, rank:], cos, sin)  # [B, Lq, 1, rope]
        latent = jnp.concatenate([c_kv[..., None, :], k_pe], axis=-1)
        HDp = kv.shape[-1]  # pool lane dim (rank+rope padded to 128-mult)
        lat_pad = jnp.pad(latent, ((0, 0),) * 3 + ((0, HDp - (rank + rope)),))

        if Lq == 1:
            # ---- absorbed-MLA decode (reference flashmla/cutlass_mla
            # backends): attend in LATENT space.  q_eff = q_nope @ W_kc
            # folds the key decompression into the query; the output
            # projects back through W_vc — the per-token context
            # decompression (O(C·hq·(nope+vd)·rank) FLOPs + a huge
            # [B, C, hq, nope+vd] buffer) disappears entirely.
            w_kcvc = w["kv_b"].reshape(rank, hq, nope + vd)
            w_kc, w_vc = w_kcvc[..., :nope], w_kcvc[..., nope:]
            q_eff = jnp.einsum(
                "blhn,rhn->blhr", q_nope.astype(jnp.float32),
                w_kc.astype(jnp.float32),
            )
            q_lat = jnp.concatenate(
                [q_eff, q_pe.astype(jnp.float32)], axis=-1
            )  # [B, 1, hq, rank+rope]
            q_lat = jnp.pad(
                q_lat, ((0, 0),) * 3 + ((0, HDp - (rank + rope)),)
            ).astype(h.dtype)
            out_lat, kv = paged_attention(
                q_lat, lat_pad, lat_pad, kv, batch, li,
                num_slots=num_slots, page_size=page_size,
                sm_scale=self.sm_scale, backend=attn_backend,
            )  # [B, 1, hq, HDp] — PV over the latent "V"
            lat_o = out_lat[..., :rank].astype(jnp.float32)
            out = jnp.einsum(
                "blhr,rhv->blhv", lat_o, w_vc.astype(jnp.float32)
            ).astype(h.dtype)  # [B, 1, hq, vd]
            out = out.reshape(B, Lq, hq * vd)
            return h + out @ w["o_proj"], kv

        # ---- extend/prefill: naive decompress (decompression amortizes
        # over the chunk; absorbed math would recompute per query token)
        kv = write_kv(kv, lat_pad, lat_pad, batch.out_slots, li, num_slots)
        lat_ctx, _ = gather_kv(
            kv, batch.page_table, li, num_slots, page_size, HDp
        )  # [B, C, 1, HDp]
        lat_ctx = lat_ctx[:, :, 0, : rank + rope]
        ckv_ctx, kpe_ctx = lat_ctx[..., :rank], lat_ctx[..., rank:]
        kv_dec = jnp.einsum(
            "bcr,rm->bcm", ckv_ctx.astype(w["kv_b"].dtype), w["kv_b"]
        ).reshape(B, -1, hq, nope + vd)
        k_nope_ctx, v_ctx = kv_dec[..., :nope], kv_dec[..., nope:]

        qf = jnp.concatenate([q_nope, q_pe], axis=-1).astype(jnp.float32)
        kf = jnp.concatenate(
            [
                k_nope_ctx,
                jnp.broadcast_to(
                    kpe_ctx[:, :, None, :], (*k_nope_ctx.shape[:3], rope)
                ),
            ],
            axis=-1,
        ).astype(jnp.float32)
        scores = jnp.einsum("blhd,bchd->bhlc", qf, kf) * self.sm_scale
        Cl = kf.shape[1]
        ctx_pos = np.arange(Cl, dtype=np.int32)
        valid = ctx_pos[None, :] < batch.seq_lens[:, None]
        causal = ctx_pos[None, None, :] <= batch.positions[:, :, None]
        mask = valid[:, None, :] & causal
        scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        # Never quantize the attention weights to an 8-bit cache dtype
        # (see layers/attention.py — reference keeps P in bf16).
        pv_dtype = v_ctx.dtype
        if jnp.issubdtype(pv_dtype, jnp.floating) and jnp.finfo(pv_dtype).bits == 8:
            pv_dtype = jnp.bfloat16
            v_ctx = v_ctx.astype(pv_dtype)
        out = jnp.einsum(
            "bhlc,bchd->blhd", probs.astype(pv_dtype), v_ctx,
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        out = out.reshape(B, Lq, hq * vd)
        return h + out @ w["o_proj"], kv

    def _moe_int8(self) -> bool:
        """INT8-RESIDENT expert weights under w8a8_int8 execution (incl.
        the block-fp8 → int8 transcode DeepSeek-V3 checkpoints take):
        expert stacks stay int8 in HBM with per-out-channel scales —
        half the expert memory (reference w8a8_int8.py MoE role)."""
        qc = self.config.quant_config
        return qc is not None and qc.method == "w8a8_int8"

    def _dense_mlp(self, w, normed):
        inter = act_and_mul(
            self.config.hidden_act, normed @ w["gate_proj"], normed @ w["up_proj"]
        )
        return inter @ w["down_proj"]

    def _moe_mlp(self, w, normed):
        capture = getattr(self, "_ecounts_capture", False)
        # int8-resident experts: per-out-channel scales ride into the
        # grouped GEMM (output-side application) so the int8 slabs stay
        # resident in HBM through the dense, EP, and a2a paths
        scales = (
            (w["moe_w1_scale"], w["moe_w3_scale"], w["moe_w2_scale"])
            if self._moe_int8()
            else None
        )
        routed = moe_block(
            normed,
            w["moe_gate"],
            w["moe_w1"],
            w["moe_w3"],
            w["moe_w2"],
            scales=scales,
            top_k=self.top_k,
            norm_topk_prob=self.norm_topk,
            hidden_act=self.config.hidden_act,
            gate_bias=w.get("gate_bias"),
            scoring=self.scoring,
            routed_scaling_factor=self.routed_scaling,
            n_group=self.n_group,
            topk_group=self.topk_group,
            return_counts=capture,
            mesh=self.mesh_ctx.mesh if self.mesh_ctx is not None else None,
            expert_parallel=self._expert_parallel(),
            a2a=(
                self.mesh_ctx is not None
                and self.mesh_ctx.parallel.moe_a2a
            ),
        )
        if capture:
            routed, self._moe_counts_stash = routed
        if self.n_shared:
            shared = act_and_mul(
                self.config.hidden_act,
                normed @ w["shared_gate"],
                normed @ w["shared_up"],
            ) @ w["shared_down"]
            routed = routed + shared
        return routed

    def forward(self, params, kv_cache, batch: DeviceBatch, *, num_slots,
                page_size, attn_backend="xla", return_all_hidden=False,
                lora=None, capture_expert_counts=False):
        assert lora is None, "LoRA on MLA models lands with the absorbed path"
        c = self.config
        B, Lq = batch.input_ids.shape
        hidden = params["embed"][batch.input_ids]

        angles = (
            batch.positions[..., None].astype(jnp.float32) * self.inv_freq
        )
        cos = jnp.cos(angles)[..., None, :]
        sin = jnp.sin(angles)[..., None, :]

        def run_layer(h, kv, w, li, dense: bool):
            h, kv = self._attention(
                w, h, kv, batch, li, cos, sin, num_slots, page_size,
                attn_backend,
            )
            normed = rms_norm(h, w["post_ln"], c.rms_norm_eps)
            mlp = self._dense_mlp(w, normed) if dense else self._moe_mlp(w, normed)
            return h + mlp, kv

        li = 0
        for i in range(self.first_k_dense):
            w = jax.tree_util.tree_map(
                lambda x, i=i: x[i], params["dense_layers"]
            )
            hidden, kv_cache = run_layer(hidden, kv_cache, w, np.int32(li), True)
            li += 1

        ecounts = None
        if self.n_moe_layers:
            self._ecounts_capture = capture_expert_counts

            def scan_fn(carry, w):
                h, kv, lidx = carry
                h, kv = run_layer(h, kv, w, lidx, False)
                aux = (
                    self.__dict__.pop("_moe_counts_stash", None)
                    if capture_expert_counts
                    else None
                )
                return (h, kv, lidx + 1), aux

            (hidden, kv_cache, _), ecounts = jax.lax.scan(
                scan_fn,
                (hidden, kv_cache, np.int32(li)),
                params["moe_layers"],
            )

        hidden = rms_norm(hidden, params["final_ln"], c.rms_norm_eps)
        flat = hidden.reshape(B * Lq, -1)
        extras = []
        if capture_expert_counts:
            extras.append(
                ecounts
                if ecounts is not None
                else jnp.zeros((0, 0), jnp.int32)
            )
        if return_all_hidden:
            return (flat, kv_cache, *extras)
        return (flat[batch.logits_idx], kv_cache, *extras)

    def compute_logits(self, params, hidden):
        w = params["embed"] if self.config.tie_word_embeddings else params["lm_head"]
        logits = jnp.einsum(
            "bh,vh->bv", hidden, w, preferred_element_type=jnp.float32
        )
        return logits


class DeepseekV3ForCausalLM(DeepseekV2ForCausalLM):
    pass


class KimiK2ForCausalLM(DeepseekV3ForCausalLM):
    """Kimi-K2 ships the DeepSeek-V3 architecture (reference
    srt/models/kimi* — MLA + noaux_tc MoE); config differences are all
    data-driven."""


EntryClass = [DeepseekV2ForCausalLM, DeepseekV3ForCausalLM, KimiK2ForCausalLM]
