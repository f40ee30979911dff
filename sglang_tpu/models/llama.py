"""Llama-family causal LM (Llama 2/3, Mistral, and the Qwen2/Qwen3 variants).

Equivalent role to the reference's ``srt/models/llama.py`` (LlamaForCausalLM
``models/llama.py:461``) / ``models/qwen2.py`` / ``models/qwen3.py`` — but
TPU-idiomatic: a pure function over a params pytree, homogeneous decoder
layers **stacked on a leading [L, ...] axis and executed with lax.scan**
(fast XLA compiles, weight layout friendly to pipeline-stage splitting),
paged-KV attention via :mod:`sglang_tpu.layers.attention`.

Weight layout: projection matrices are stored ``[in_features, out_features]``
(transposed from HF's ``[out, in]``) so forward matmuls hit the MXU without
relayout.  ``lm_head``/``embed`` stay ``[vocab, hidden]``.
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
from sglang_tpu.layers.attention import paged_attention
from sglang_tpu.layers.norm import rms_norm
from sglang_tpu.layers.quantization import (
    PACK_BLOCK,
    ParamShape,
    awq_repack_qweight,
    awq_unpack_qzeros,
    gptq_repack_qweight,
    make_gptq_unpack_qzeros,
    pad_scales,
    quant_linear,
)
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.model_executor.forward_batch import DeviceBatch
from sglang_tpu.parallel.mesh import AXIS_CP, AXIS_DP, AXIS_PP, AXIS_TP


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class LlamaForCausalLM:
    """Also serves Mistral/Qwen2 (attention bias) and Qwen3 (qk-norm)."""

    has_qkv_bias = False
    has_qk_norm = False
    qk_norm_full = False  # OLMo2: norm over the FLAT q/k (hq*d), pre-split
    has_o_bias = False
    has_pre_norms = True  # OLMo2: False → post-block norms only
    parallel_block = False  # Cohere: attn and mlp share one normed input
    clip_qkv = None  # OLMoE/DBRX: clamp q/k/v activations to ±clip_qkv
    has_abs_pos = False  # GPT-2/OPT: learned absolute position embeddings
    pos_offset = 0  # OPT offsets its position table by 2
    qk_norm_bias = False  # Persimmon: per-head qk LayerNorm carries bias
    deepstack_layers = 0  # Qwen3-VL: visual planes add into layers 0..n-1
    residual_multiplier = 1.0  # Granite residual_multiplier
    logits_divisor = 1.0  # Granite logits_scaling
    # YaRN attention factor multiplying cos/sin (rotary.py)
    rope_mscale = 1.0
    # double-sparsity config (runner sets when --enable-double-sparsity)
    _ds = None

    def __init__(self, config: ModelConfig, mesh_ctx=None):
        self.config = config
        self.mesh_ctx = mesh_ctx
        c = config
        self.hq = c.num_attention_heads
        self.hkv = c.num_key_value_heads
        self.hd = c.head_dim
        qpa = config.hf_config.get("query_pre_attn_scalar")
        self.sm_scale = 1.0 / math.sqrt(qpa if qpa else c.head_dim)
        # numpy, not jnp: trace-time constants must stay host-side (a
        # jax.Array constant forces a device fetch when lowering).
        self.inv_freq = compute_inv_freq(
            c.head_dim, c.rope_theta, c.rope_scaling, c.partial_rotary_factor
        )
        self.rot_dim = int(2 * self.inv_freq.shape[0])
        if config.hf_config.get("attention_bias") or config.attention_bias:
            self.has_qkv_bias = True
        if config.qk_norm:
            self.has_qk_norm = True
        # OLMoE / DBRX: clamp q/k/v activations to ±clip_qkv
        self.clip_qkv = config.hf_config.get("clip_qkv")
        if self.has_abs_pos:
            # learned-absolute-position models carry no rotary: zero
            # angles make the shared rope application the identity
            self.inv_freq = np.zeros_like(self.inv_freq)

    # ------------------------------------------------------------- params
    # Projection name → (hf module suffix, in_dim fn, out_dim fn); drives
    # both param_shapes and the quantized-checkpoint weight mapping.
    def _proj_dims(self) -> Dict[str, tuple]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        hq, hkv, d = self.hq, self.hkv, self.hd
        return {
            "q_proj": ("self_attn.q_proj", H, hq * d),
            "k_proj": ("self_attn.k_proj", H, hkv * d),
            "v_proj": ("self_attn.v_proj", H, hkv * d),
            "o_proj": ("self_attn.o_proj", hq * d, H),
            "gate_proj": ("mlp.gate_proj", H, I),
            "up_proj": ("mlp.up_proj", H, I),
            "down_proj": ("mlp.down_proj", I, H),
        }

    def _is_quantized_proj(self, name: str) -> bool:
        qc = self.config.quant_config
        if qc is None:
            return False
        dims = self._proj_dims()
        if name not in dims:
            return False
        hf_mod, din, _ = dims[name]
        if qc.skips(hf_mod):
            return False
        if qc.group_size and din % qc.group_size != 0:
            return False
        return True

    def _quant_out_shards(self, name: str) -> int:
        """Number of tensor-parallel shards of this projection's OUT axis
        (drives the shard-aware int4 pack padding + the shard_map specs)."""
        mc = self.mesh_ctx
        if mc is None or mc.is_single_device or mc.parallel.pp_size > 1:
            return 1
        attn_proj = name in ("q_proj", "k_proj", "v_proj", "o_proj")
        col = name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
        if not col:
            return 1  # row-parallel: out axis replicated
        if self._attn_replicated() and attn_proj:
            return 1  # attention weights replicate (dp-attention / DCP)
        if self._dp_attention():
            return mc.parallel.dp_size * mc.parallel.tp_size
        return mc.parallel.tp_size

    def _quant_pack_block(self, name: str) -> int:
        from sglang_tpu.layers.quantization import choose_pack_block

        _, _, dout = self._proj_dims()[name]
        return choose_pack_block(dout, self._quant_out_shards(name))[0]

    def _quant_shard_info(self, name: str, seq_ax=None):
        """Build the :class:`QuantShardInfo` for running this projection's
        fused Pallas quant GEMM under the mesh (None → XLA dequant path)."""
        mc = self.mesh_ctx
        if mc is None or mc.is_single_device:
            return None
        if mc.parallel.pp_size > 1:
            return None  # [L] stacks shard over pp; kernels are gated off
        from jax.sharding import PartitionSpec as P

        from sglang_tpu.layers.quantization import QuantShardInfo

        axes = {AXIS_DP, AXIS_TP} | ({AXIS_CP} if seq_ax else set())
        col = name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
        attn_proj = name in ("q_proj", "k_proj", "v_proj", "o_proj")
        if self._dcp() and attn_proj:
            # attention weights replicated under DCP; the quant GEMM runs
            # replicated too (batch not sharded)
            return QuantShardInfo(
                mesh=mc.mesh, axis_names=frozenset(axes),
                x_spec=P(None, seq_ax, None), w_axis=None, col=col,
                out_spec=P(None, seq_ax, None),
            )
        if self._dp_attention():
            if attn_proj:  # weights replicated; batch shards over dp
                return QuantShardInfo(
                    mesh=mc.mesh, axis_names=frozenset(axes),
                    x_spec=P(AXIS_DP, seq_ax, None), w_axis=None, col=col,
                    out_spec=P(AXIS_DP, seq_ax, None),
                )
            fused = (AXIS_DP, AXIS_TP)
            if col:  # gate/up over the fused (dp, tp) axis
                return QuantShardInfo(
                    mesh=mc.mesh, axis_names=frozenset(axes),
                    x_spec=P(None, None, None), w_axis=fused, col=True,
                    out_spec=P(None, None, fused),
                )
            return QuantShardInfo(  # down_proj: row-parallel + psum
                mesh=mc.mesh, axis_names=frozenset(axes),
                x_spec=P(None, None, fused), w_axis=fused, col=False,
                out_spec=P(None, None, None), reduce_axes=fused,
            )
        if col:
            return QuantShardInfo(
                mesh=mc.mesh, axis_names=frozenset(axes),
                x_spec=P(AXIS_DP, seq_ax, None), w_axis=AXIS_TP, col=True,
                out_spec=P(AXIS_DP, seq_ax, AXIS_TP),
            )
        return QuantShardInfo(
            mesh=mc.mesh, axis_names=frozenset(axes),
            x_spec=P(AXIS_DP, seq_ax, AXIS_TP), w_axis=AXIS_TP, col=False,
            out_spec=P(AXIS_DP, seq_ax, None), reduce_axes=(AXIS_TP,),
        )

    def _quant_leaf(self, L: int, din: int, dout: int, shards: int = 1) -> Dict[str, Any]:
        qc = self.config.quant_config
        if qc.is_int4:
            from sglang_tpu.layers.quantization import choose_pack_block

            _, dout_p = choose_pack_block(dout, shards)
            g = qc.group_size
            return {
                "qw": ParamShape((L, din, dout_p // 2), jnp.uint8, fan=din),
                "scale": ParamShape((L, din // g, dout_p), jnp.float32, fan=din),
                "zero": ParamShape((L, din // g, dout_p), jnp.float32, fan=din),
            }
        if qc.method == "fp8":
            return {
                "qw": ParamShape((L, din, dout), jnp.float8_e4m3fn, fan=din),
                "scale": ParamShape((L, 1, dout), jnp.float32, fan=din),
            }
        if qc.method == "w8a8_int8":
            leaves = {
                "qw": ParamShape((L, din, dout), jnp.int8, fan=din),
                "scale": ParamShape((L, 1, dout), jnp.float32, fan=din),
            }
            if qc.src_fp8:  # fp8 checkpoint requant factor
                leaves["scale2"] = ParamShape(
                    (L, 1, dout), jnp.float32, fan=din
                )
            return leaves
        raise ValueError(qc.method)

    def _proj_shape(self, name: str, L: int) -> Any:
        _, din, dout = self._proj_dims()[name]
        if self._is_quantized_proj(name):
            return self._quant_leaf(
                L, din, dout, shards=self._quant_out_shards(name)
            )
        return (L, din, dout)

    def _mlp_shapes(self, L: int, H: int, I: int) -> Dict[str, Any]:
        return {
            "gate_proj": self._proj_shape("gate_proj", L),
            "up_proj": self._proj_shape("up_proj", L),
            "down_proj": self._proj_shape("down_proj", L),
        }

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H, I, V = (
            c.num_hidden_layers,
            c.hidden_size,
            c.intermediate_size,
            c.vocab_size,
        )
        hq, hkv, d = self.hq, self.hkv, self.hd
        layers = {
            "input_ln": (L, H),
            "q_proj": self._proj_shape("q_proj", L),
            "k_proj": self._proj_shape("k_proj", L),
            "v_proj": self._proj_shape("v_proj", L),
            "o_proj": self._proj_shape("o_proj", L),
            "post_ln": (L, H),
            **self._mlp_shapes(L, H, I),
        }
        if self.has_qkv_bias:
            layers["q_bias"] = (L, hq * d)
            layers["k_bias"] = (L, hkv * d)
            layers["v_bias"] = (L, hkv * d)
        if self.has_qk_norm:
            if self.qk_norm_full:  # OLMo2: one norm over the flat proj
                layers["q_norm"] = (L, hq * d)
                layers["k_norm"] = (L, hkv * d)
            else:
                layers["q_norm"] = (L, d)
                layers["k_norm"] = (L, d)
            if self.qk_norm_bias:  # Persimmon: per-head LayerNorm bias
                layers["q_norm_b"] = tuple(layers["q_norm"])
                layers["k_norm_b"] = tuple(layers["k_norm"])
        if self.has_post_norms:
            layers["post_attn_ln"] = (L, H)
            layers["post_ffw_ln"] = (L, H)
        if not self.has_pre_norms:
            del layers["input_ln"], layers["post_ln"]
        elif self.parallel_block:
            del layers["post_ln"]  # attn and mlp share input_ln
        if self.has_norm_bias:
            for nm in ("input_ln", "post_ln"):
                if nm in layers:
                    layers[nm + "_b"] = (L, H)
        shapes = {"embed": (V, H), "layers": layers, "final_ln": (H,)}
        if self.has_abs_pos:
            shapes["pos_embed"] = (
                c.max_position_embeddings + self.pos_offset, H,
            )
        if self.has_norm_bias:
            shapes["final_ln_b"] = (H,)
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (V, H)
        return shapes

    def _dp_attention(self) -> bool:
        return (
            self.mesh_ctx is not None
            and getattr(self.mesh_ctx.parallel, "dp_attention", False)
        )

    def _dcp(self) -> bool:
        return (
            self.mesh_ctx is not None
            and getattr(self.mesh_ctx.parallel, "dcp", False)
        )

    def _attn_replicated(self) -> bool:
        """Attention weights replicated over tp: DP-attention shards the
        BATCH over dp instead; DCP shards the KV PAGES over tp instead."""
        return self._dp_attention() or self._dcp()

    def _mlp_tp_axes(self):
        """MLP feature-sharding axes: plain TP, or the fused (dp, tp)
        axis pair under DP-attention (reference dp_attention.py:103 —
        attention data-parallel, MLP TP across ALL devices)."""
        return (AXIS_DP, AXIS_TP) if self._dp_attention() else AXIS_TP

    def _proj_spec(self, name: str, col_sharded: bool) -> Any:
        """Spec for one projection: plain weight or quant dict. Quant
        leaves are [L, in(ish), out(ish)]; a row-sharded (in-dim) spec
        falls back to replicated for leaves whose in-ish dim is 1
        (per-channel fp8/int8 scales)."""
        attn_proj = name in ("q_proj", "k_proj", "v_proj", "o_proj")
        if self._attn_replicated() and attn_proj:
            # attention weights replicate; dp-attention shards the batch
            # over dp, DCP shards the KV pages over tp
            spec = P(None, None, None)
        else:
            ax = self._mlp_tp_axes() if not attn_proj else AXIS_TP
            spec = P(None, None, ax) if col_sharded else P(None, ax, None)
        if not self._is_quantized_proj(name):
            return spec
        qc = self.config.quant_config
        out = {}
        for k in self._quant_leaf(1, 1, 1):
            if k == "scale" and not qc.is_int4 and not col_sharded:
                out[k] = P(None, None, None)
            else:
                out[k] = spec
        return out

    def _mlp_specs(self) -> Dict[str, Any]:
        return {
            "gate_proj": self._proj_spec("gate_proj", True),
            "up_proj": self._proj_spec("up_proj", True),
            "down_proj": self._proj_spec("down_proj", False),
        }

    def param_specs(self) -> Dict[str, Any]:
        """PartitionSpecs matching param_shapes (tp sharding)."""
        layers = {
            "input_ln": P(None, None),
            "q_proj": self._proj_spec("q_proj", True),
            "k_proj": self._proj_spec("k_proj", True),
            "v_proj": self._proj_spec("v_proj", True),
            "o_proj": self._proj_spec("o_proj", False),
            "post_ln": P(None, None),
            **self._mlp_specs(),
        }
        if self.has_qkv_bias:
            layers["q_bias"] = P(None, AXIS_TP)
            layers["k_bias"] = P(None, AXIS_TP)
            layers["v_bias"] = P(None, AXIS_TP)
        if self.has_qk_norm:
            # full-width (flat-proj) norms shard with the head axis
            ax = AXIS_TP if self.qk_norm_full else None
            layers["q_norm"] = P(None, ax)
            layers["k_norm"] = P(None, ax)
            if self.qk_norm_bias:
                layers["q_norm_b"] = P(None, ax)
                layers["k_norm_b"] = P(None, ax)
        if self.has_post_norms:
            layers["post_attn_ln"] = P(None, None)
            layers["post_ffw_ln"] = P(None, None)
        if not self.has_pre_norms:
            del layers["input_ln"], layers["post_ln"]
        elif self.parallel_block:
            del layers["post_ln"]
        if self.has_norm_bias:
            for nm in ("input_ln", "post_ln"):
                if nm in layers:
                    layers[nm + "_b"] = P(None, None)
        if self.mesh_ctx is not None and self.mesh_ctx.parallel.pp_size > 1:
            # layer stacks shard their leading [L] axis over pp stages
            def _pp(spec):
                if isinstance(spec, dict):
                    return {k: _pp(v) for k, v in spec.items()}
                return P(AXIS_PP, *tuple(spec)[1:])

            layers = {k: _pp(v) for k, v in layers.items()}
        specs = {
            "embed": P(AXIS_TP, None),
            "layers": layers,
            "final_ln": P(None),
        }
        if self.has_abs_pos:
            specs["pos_embed"] = P(None, None)
        if self.has_norm_bias:
            specs["final_ln_b"] = P(None)
        if not self.config.tie_word_embeddings:
            specs["lm_head"] = P(AXIS_TP, None)
        return specs

    # ------------------------------------------------ execution layout
    # Projection stacks fuse AFTER load: q/k/v concatenate on the out
    # axis into one [L, H, (hq+2hkv)*d] leaf so the decode scan issues a
    # single MXU dot per layer.  Measured on v5e
    # (scripts/perf_qkvo_variants.py): the separate-dots formulation
    # pays a per-layer weight transpose-copy (~12 us/layer,
    # constant_dynamic-slice_fusion in the r02 profile) that the fused
    # dot avoids — 2.2x on the 16-layer QKVO scan (3.27 → 1.47 ms at
    # B=64).  Loaders, HF weight mappings, and checkpoints keep the
    # per-projection layout; only the placed device tree fuses.
    fuse_qkv_exec = True  # class-level opt-out for exotic subclasses

    def _exec_fusions(self) -> Dict[str, list]:
        """fused leaf name → ordered list of loader-layout part names.
        Empty when fusion does not apply (quantized stacks ride the
        scalar-prefetch quant kernels; subclasses with their own forward
        never see the fused leaf)."""
        from sglang_tpu.environ import envs

        if envs.SGLANG_TPU_NO_FUSED_EXEC.value or not self.fuse_qkv_exec:
            return {}
        if type(self).forward is not LlamaForCausalLM.forward:
            return {}
        layers = self.param_shapes().get("layers", {})
        parts = ("q_proj", "k_proj", "v_proj")
        if not all(isinstance(layers.get(p), tuple) for p in parts):
            return {}  # quantized (dict leaves) or missing
        return {"qkv_proj": list(parts)}

    def exec_param_shapes(self) -> Dict[str, Any]:
        shapes = self.param_shapes()
        fus = self._exec_fusions()
        if not fus:
            return shapes
        layers = dict(shapes["layers"])
        for newname, parts in fus.items():
            dims = [layers.pop(p) for p in parts]
            layers[newname] = (
                dims[0][0], dims[0][1], sum(d[2] for d in dims),
            )
        return {**shapes, "layers": layers}

    def exec_param_specs(self) -> Dict[str, Any]:
        specs = self.param_specs()
        fus = self._exec_fusions()
        if not fus:
            return specs
        layers = dict(specs["layers"])
        for newname, parts in fus.items():
            first = layers[parts[0]]
            for p in parts:
                layers.pop(p)
            # parts share one spec (all col-parallel attn projections);
            # under TP the fused out axis shards in contiguous chunks
            # that mix q/k/v columns — GSPMD reshards at the split slices
            layers[newname] = first
        return {**specs, "layers": layers}

    def exec_fuse_host(self, host: Dict[str, Any]) -> Dict[str, Any]:
        """Rewrite a loader-layout host tree into the execution layout
        (concat on the out axis; numerics of each output column are
        unchanged).  Called by the loader just before device placement."""
        fus = self._exec_fusions()
        if not fus or "layers" not in host:
            return host
        layers = dict(host["layers"])
        for newname, parts in fus.items():
            if not all(
                isinstance(layers.get(p), np.ndarray) for p in parts
            ):
                continue
            arrs = [layers.pop(p) for p in parts]
            layers[newname] = np.concatenate(arrs, axis=-1)
        return {**host, "layers": layers}

    def exec_fused_map(self) -> Dict[str, tuple]:
        """loader path → (fused path, out-col offset, width); lets
        weight-sync updates keyed by HF names land in their column range
        of the fused leaf."""
        out: Dict[str, tuple] = {}
        shapes = self.param_shapes().get("layers", {})
        for newname, parts in self._exec_fusions().items():
            off = 0
            for p in parts:
                w = shapes[p][2]
                out[f"layers.{p}"] = (f"layers.{newname}", off, w)
                off += w
        return out

    # ------------------------------------------------------- weight loading
    def _quant_weight_table(self) -> Dict[str, tuple]:
        """HF-tensor-suffix → (param path, transform) for quantized projs
        (reference quantization loaders: awq.py / gptq.py / fp8.py)."""
        qc = self.config.quant_config
        table: Dict[str, tuple] = {}
        if qc is None:
            return table
        import numpy as _np

        t_transpose = lambda t: _np.ascontiguousarray(t.T)  # noqa: E731
        scale_row = lambda t: _np.asarray(t).reshape(1, -1)  # noqa: E731
        import functools as _ft

        from sglang_tpu.layers.quantization import choose_pack_block

        for name, (hf_mod, _, dout) in self._proj_dims().items():
            if not self._is_quantized_proj(name):
                continue
            if qc.is_int4:
                pb, dout_p = choose_pack_block(
                    dout, self._quant_out_shards(name)
                )
                pk = dict(pack_block=pb, out_pad=dout_p)
            if qc.method == "awq":
                table[f"{hf_mod}.qweight"] = (
                    f"layers.{name}.qw",
                    _ft.partial(awq_repack_qweight, **pk))
                table[f"{hf_mod}.qzeros"] = (
                    f"layers.{name}.zero",
                    _ft.partial(awq_unpack_qzeros, **pk))
                table[f"{hf_mod}.scales"] = (
                    f"layers.{name}.scale", _ft.partial(pad_scales, **pk))
            elif qc.method == "gptq":
                table[f"{hf_mod}.qweight"] = (
                    f"layers.{name}.qw",
                    _ft.partial(gptq_repack_qweight, **pk))
                table[f"{hf_mod}.qzeros"] = (
                    f"layers.{name}.zero",
                    make_gptq_unpack_qzeros(qc.gptq_v2, **pk),
                )
                table[f"{hf_mod}.scales"] = (
                    f"layers.{name}.scale", _ft.partial(pad_scales, **pk))
                table[f"{hf_mod}.g_idx"] = None  # trivial order only
            elif qc.src_fp8:  # fp8 ckpt → int8 exec: requant at load
                from sglang_tpu.layers.quantization import fp8_weight_to_int8

                table[f"{hf_mod}.weight"] = (
                    f"layers.{name}", fp8_weight_to_int8)  # dict transform
                table[f"{hf_mod}.weight_scale"] = (
                    f"layers.{name}.scale", scale_row)
                table[f"{hf_mod}.input_scale"] = None
            elif qc.src_block_fp8:
                # block-fp8 → int8 exec: the loader dequantized the
                # weight on read (sibling weight_scale_inv); requantize
                # per-out-channel here.
                from sglang_tpu.layers.quantization import dense_weight_to_int8

                table[f"{hf_mod}.weight"] = (
                    f"layers.{name}", dense_weight_to_int8)
                table[f"{hf_mod}.weight_scale_inv"] = None
                table[f"{hf_mod}.input_scale"] = None
            else:  # fp8 / w8a8_int8: plain [out,in] weight + scale
                table[f"{hf_mod}.weight"] = (
                    f"layers.{name}.qw", t_transpose)
                table[f"{hf_mod}.weight_scale"] = (
                    f"layers.{name}.scale", scale_row)
                table[f"{hf_mod}.input_scale"] = None  # dynamic act quant
        return table

    def hf_weight_mapping(self):
        """Map HF tensor names → (param path, layer index or None, transform).

        transform: "t" = transpose 2D [out,in]→[in,out]; a callable runs
        on the host numpy tensor (quant repacks); None = as-is.
        """
        quant_table = self._quant_weight_table()

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
            if tail in quant_table:
                ent = quant_table[tail]
                if ent is None:
                    return None
                path, tf = ent
                return (path, li, tf)
            table = {
                "input_layernorm.weight": ("layers.input_ln", None),
                "post_attention_layernorm.weight": ("layers.post_ln", None),
                "self_attn.q_proj.weight": ("layers.q_proj", "t"),
                "self_attn.k_proj.weight": ("layers.k_proj", "t"),
                "self_attn.v_proj.weight": ("layers.v_proj", "t"),
                "self_attn.o_proj.weight": ("layers.o_proj", "t"),
                "self_attn.q_proj.bias": ("layers.q_bias", None),
                "self_attn.k_proj.bias": ("layers.k_bias", None),
                "self_attn.v_proj.bias": ("layers.v_bias", None),
                "self_attn.q_norm.weight": ("layers.q_norm", None),
                "self_attn.k_norm.weight": ("layers.k_norm", None),
                "mlp.gate_proj.weight": ("layers.gate_proj", "t"),
                "mlp.up_proj.weight": ("layers.up_proj", "t"),
                "mlp.down_proj.weight": ("layers.down_proj", "t"),
            }
            if tail not in table:
                return None
            path, tf = table[tail]
            return (path, li, tf)

        return mapping

    # ------------------------------------------------------------- forward
    # True while tracing inside the manual-pp wavefront (sharding
    # constraints referencing the full mesh are invalid there)
    _skip_shard_constraints = False
    # Inside the pp wavefront: this stage's LOCAL quantized weight
    # shards (proj dispatches on it; None outside the wavefront)
    _quant_stack_override = None

    def _shard(self, x, *spec):
        if self._skip_shard_constraints:
            return x
        if self.mesh_ctx is not None and not self.mesh_ctx.is_single_device:
            return jax.lax.with_sharding_constraint(
                x, self.mesh_ctx.sharding(*spec)
            )
        return x

    # ------------------------------------------------- per-layer variation
    # Subclasses (Gemma) override these to vary rope theta / sliding window
    # per layer; arrays ride the layer scan as extra xs.
    def per_layer_inv_freq(self) -> np.ndarray:
        """[L, rot/2] f32 — rope inverse frequencies per layer."""
        return np.broadcast_to(
            self.inv_freq[None, :],
            (self.config.num_hidden_layers, self.inv_freq.shape[0]),
        )

    def per_layer_window(self) -> np.ndarray:
        """[L] int32 — sliding window per layer (0 = full attention)."""
        w = self.config.sliding_window or 0
        return np.full((self.config.num_hidden_layers,), w, np.int32)

    def hybrid_swa_pattern(self):
        """Hybrid-SWA layer pattern (reference mem_cache/allocator/
        swa.py:20 full+swa split pools): the shortest periodic 0/1
        pattern of sliding layers, or None when the model is not a
        mixed sliding/full stack (pure models use whole-page freeing;
        aperiodic stacks fall back to the unified pool).  Returns a
        tuple of bools, True = sliding."""
        wins = self.per_layer_window()
        if (wins < 0).any():  # chunked attention (Llama 4) — not SWA
            return None
        sw = wins > 0
        if sw.all() or not sw.any():
            return None
        pos = wins[sw]
        if not (pos == pos[0]).all():  # mixed window sizes
            return None
        L = len(wins)
        for p in range(1, min(L, 12) + 1):
            if L % p == 0 and (sw.reshape(-1, p) == sw[:p]).all():
                return tuple(bool(x) for x in sw[:p])
        return None

    # (k_scale, v_scale) per layer for quantized (fp8) KV caches; the
    # runner overwrites from checkpoint k_scale/v_scale tensors
    # (reference memory_pool.py:1679 per-layer dequant scales).
    _kv_scales: Optional[np.ndarray] = None  # [L, 2] f32

    def per_layer_kv_scales(self) -> np.ndarray:
        if self._kv_scales is not None:
            return np.asarray(self._kv_scales, np.float32)
        return np.ones((self.config.num_hidden_layers, 2), np.float32)

    # Embedding multiplier (Gemma scales by sqrt(hidden_size)).
    embed_scale: float = 1.0
    # zigzag prefill context-parallel support (runner gates per batch)
    supports_cp = True
    # decode context parallelism (page-sharded KV + LSE merge); MLA
    # models keep their own attention path for now
    supports_dcp = True
    # pp micro-batch wavefront (subclasses with mesh-wide shard_map MLPs
    # — MoE — opt out; their inner collectives don't nest under manual pp)
    supports_pp_wavefront = True
    # RMSNorm weight offset: out = normed * (offset + w) (Gemma uses 1+w).
    norm_offset: float = 0.0
    # Extra norms on attn/mlp outputs before the residual add (Gemma 2/3).
    has_post_norms: bool = False
    # LayerNorm families (Starcoder2) carry bias leaves next to the norms.
    has_norm_bias: bool = False

    def _norm(self, x, w, b=None):
        del b  # rms families have no norm bias; LayerNorm models override
        return rms_norm(
            x, w, self.config.rms_norm_eps, offset=self.norm_offset
        )

    def _post_rope(self, q, k, inv_freq, batch, pos_f):
        """Per-layer post-rotary hook (Llama4: qk L2 norm on rope layers,
        temperature tuning on nope layers — derived from the layer's
        inv_freq riding the scan).  Default: identity."""
        del inv_freq, batch, pos_f
        return q, k

    def _bidir_groups(self, batch):
        """Optional [B, Lq] image-span group ids (-1 = causal-only
        token): tokens of the same group attend each other
        BIDIRECTIONALLY (Gemma 3 multimodal).  Default: None."""
        del batch
        return None

    def _pp_wavefront(self, hidden, kv_cache, batch, xs_all, pp, M,
                      make_layer_fn, quant_stacks=None):
        """GPipe-style micro-batch pipeline inside one jitted program.

        shard_map manual over the pp axis: each rank holds its stage's
        layer stack + KV rows; at tick t, rank s runs its stage on
        micro-batch t-s and ppermutes the hidden state to rank s+1.
        Wall clock ≈ (M + pp - 1)/M per-stage steps instead of pp — the
        TPU-native mapping of the reference's event_loop_pp
        (scheduler_pp_mixin.py:68).  Inactive (fill/drain) ticks write
        their KV to the garbage page and their results are discarded.
        """
        from sglang_tpu.model_executor.forward_batch import DeviceBatch

        self._pp_wavefront_engaged = True  # trace-time marker for tests
        mesh = self.mesh_ctx.mesh
        B, Lq, H = hidden.shape
        Bm = B // M
        scan_layers, inv_freq, window, kvs, _la, _lb = xs_all
        T = M + pp - 1

        def fn(hidden, kv_local, layers_l, if_l, win_l, kvs_l, qs_l,
               input_ids, positions, seq_lens, page_table, out_slots,
               logits_idx):
            s = jax.lax.axis_index(AXIS_PP)
            # quantized [L/pp, ...] stage shards: the layer body's proj
            # dispatches on this override (fused per-rank quant kernels,
            # local layer indices — see make_proj)
            self._quant_stack_override = qs_l if qs_l else None

            def tick(carry, t):
                buf, kv_local, outs = carry
                mb = t - s
                active = jnp.logical_and(mb >= 0, mb < M)
                mbc = jnp.clip(mb, 0, M - 1)

                def sl(x):
                    return jax.lax.dynamic_slice_in_dim(x, mbc * Bm, Bm, 0)

                b_mb = DeviceBatch(
                    input_ids=sl(input_ids),
                    positions=sl(positions),
                    # inactive ticks: zero-length rows fully mask the
                    # attention; KV writes land in garbage page 0
                    seq_lens=jnp.where(active, sl(seq_lens), 0),
                    page_table=sl(page_table),
                    out_slots=jnp.where(active, sl(out_slots), 0),
                    # re-base flat last-token indices to the micro-batch
                    # (layers/attention.py:293 assumes row 0 at index 0)
                    logits_idx=sl(logits_idx)
                    - mbc * Bm * input_ids.shape[1],
                )
                pos_f = b_mb.positions[..., None].astype(jnp.float32)
                inp = jnp.where(
                    s == 0,
                    jax.lax.dynamic_slice_in_dim(hidden, mbc * Bm, Bm, 0),
                    buf,
                )
                lf = make_layer_fn(b_mb, pos_f)
                # local layer indices: the kv shard holds ONLY this
                # stage's rows, so page row = li_local * num_pages
                (h_out, kv_local, _), _ = jax.lax.scan(
                    lf, (inp, kv_local, np.int32(0)),
                    (layers_l, if_l, win_l, kvs_l, {}, {}),
                )
                nxt = jax.lax.ppermute(
                    h_out, AXIS_PP,
                    [(i, (i + 1) % pp) for i in range(pp)],
                )
                write = jnp.logical_and(s == pp - 1, active)
                upd = jax.lax.dynamic_update_slice_in_dim(
                    outs, h_out, mbc * Bm, 0
                )
                outs = jnp.where(write, upd, outs)
                return (nxt, kv_local, outs), None

            try:
                (buf, kv_local, outs), _ = jax.lax.scan(
                    tick,
                    (jnp.zeros((Bm, Lq, H), hidden.dtype), kv_local,
                     jnp.zeros_like(hidden)),
                    jnp.arange(T, dtype=jnp.int32),
                )
            finally:
                self._quant_stack_override = None
            # replicate the last stage's result to every pp rank (f32:
            # XLA:CPU's AllReducePromotion crashes on bf16 collectives)
            outs = jax.lax.psum(
                jnp.where(s == pp - 1, outs, jnp.zeros_like(outs)).astype(
                    jnp.float32
                ),
                AXIS_PP,
            ).astype(hidden.dtype)
            return outs, kv_local

        qs = quant_stacks or {}
        in_specs = (
            P(), P(AXIS_PP),
            jax.tree_util.tree_map(lambda _: P(AXIS_PP), scan_layers),
            P(AXIS_PP), P(AXIS_PP), P(AXIS_PP),
            jax.tree_util.tree_map(lambda _: P(AXIS_PP), qs),
            P(), P(), P(), P(), P(), P(),
        )
        # sharding-constraint hints inside the layer body reference the
        # full mesh; under manual-pp they'd be rejected — skip them
        self._skip_shard_constraints = True
        try:
            hidden_out, kv_out = jax.shard_map(
                fn, mesh=mesh,
                in_specs=in_specs,
                out_specs=(P(), P(AXIS_PP)),
                axis_names={AXIS_PP},
                check_vma=False,
            )(
                hidden, kv_cache, scan_layers,
                jnp.asarray(inv_freq), jnp.asarray(window),
                jnp.asarray(kvs), qs,
                batch.input_ids, batch.positions, batch.seq_lens,
                batch.page_table, batch.out_slots, batch.logits_idx,
            )
        finally:
            self._skip_shard_constraints = False
        return hidden_out, kv_out

    def _tbo_attn_mlp_tail(self, h, q, k, v, kv, w, li, batch, proj, *,
                           num_slots, page_size, attn_backend, window,
                           kv_scales, bidir_groups, seq_ax,
                           capture_expert_counts):
        """Two-batch-overlap layer tail (reference
        batch_overlap/two_batch_overlap.py + operations_strategy.py):
        the batch's rows split in half and the attention → o_proj → MLP
        tail runs PER HALF as independent graph regions — half 0's MoE
        all-to-all has no data dependence on half 1's attention, so
        XLA's latency-hiding scheduler runs the collective under the
        other half's compute.  (The r04 host-side batch split only hid
        host packing; this is the op-level overlap inside one compiled
        program.)  The KV cache threads through both halves (their
        writes are disjoint rows)."""
        from sglang_tpu.model_executor.forward_batch import DeviceBatch

        c = self.config
        B, Lq = batch.input_ids.shape
        B2 = B // 2
        hq, d = self.hq, self.hd
        self._tbo_engaged = True  # trace-time marker for tests
        halves = []
        counts = []
        kvc = kv
        for lo, hi in ((0, B2), (B2, B)):
            b_h = DeviceBatch(
                input_ids=batch.input_ids[lo:hi],
                positions=batch.positions[lo:hi],
                seq_lens=batch.seq_lens[lo:hi],
                page_table=batch.page_table[lo:hi],
                out_slots=batch.out_slots[lo:hi],
                # logits_idx packs flat [B*Lq] last-token indices
                # (row i at i*Lq + n_new-1, layers/attention.py:293) —
                # re-base to the half's row 0 so the prefill kernel's
                # per-row new_lens stay correct
                logits_idx=batch.logits_idx[lo:hi] - lo * Lq,
            )
            a_h, kvc = paged_attention(
                q[lo:hi], k[lo:hi], v[lo:hi], kvc, b_h, li,
                num_slots=num_slots, page_size=page_size,
                sm_scale=self.sm_scale, logit_cap=c.attn_logit_softcap,
                sliding_window=window, backend=attn_backend,
                kv_scales=kv_scales, sinks=w.get("sinks"),
                bidir_groups=(
                    bidir_groups[lo:hi]
                    if bidir_groups is not None
                    else None
                ),
            )
            a_h = a_h.reshape(hi - lo, Lq, hq * d)
            a_h = proj(a_h, "o_proj")
            if self.has_o_bias:
                a_h = a_h + w["o_bias"]
            if self.has_post_norms:
                a_h = self._norm(a_h, w["post_attn_ln"])
            if self.residual_multiplier != 1.0:
                a_h = a_h * self.residual_multiplier
            hh = h[lo:hi] + a_h
            normed = (
                self._norm(hh, w["post_ln"], w.get("post_ln_b"))
                if self.has_pre_norms
                else hh
            )
            mo = self._mlp_forward(w, normed, proj)
            if capture_expert_counts:
                counts.append(
                    self.__dict__.pop("_moe_counts_stash", None)
                )
            if self.has_post_norms:
                mo = self._norm(mo, w["post_ffw_ln"])
            if self.residual_multiplier != 1.0:
                mo = mo * self.residual_multiplier
            halves.append(hh + mo)
        h = jnp.concatenate(halves, axis=0)
        h = self._shard(h, AXIS_DP, seq_ax, None)
        aux = None
        if capture_expert_counts:
            valid = [x for x in counts if x is not None]
            if valid:
                aux = valid[0]
                for x in valid[1:]:
                    aux = aux + x
        return (h, kvc, li + 1), aux

    def _apply_rope(self, x, cos, sin, rot_half, d):
        """Half-split rope on [B, Lq, h, d] (GLM overrides with its
        interleaved-frequency variant)."""
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :rot_half], xf[..., rot_half : 2 * rot_half]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        if 2 * rot_half < d:
            return jnp.concatenate(
                [o1, o2, xf[..., 2 * rot_half :]], axis=-1
            ).astype(x.dtype)
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)

    def forward(
        self,
        params: Dict[str, Any],
        kv_cache: jnp.ndarray,  # [L*NP, ps, 2, Hkv*D]
        batch: DeviceBatch,
        *,
        num_slots: int,
        page_size: int,
        attn_backend: str = "xla",
        return_all_hidden: bool = False,
        lora=None,  # (LoRAManager.device_tree(), adapter_idx [B] i32)
        capture_features: bool = False,
        capture_aux_layers: tuple = (),  # EAGLE3: concat these layers' aux
        capture_expert_counts: bool = False,  # MoE: EPLB load recording
        context_parallel: bool = False,  # zigzag prefill CP (layers/cp)
        cp_prefix: bool = False,  # CP chunk has cached-prefix KV in pages
        input_embeds=None,  # [B, Lq, H] rows for NEGATIVE input_ids
        tbo: bool = False,  # two-batch overlap: split rows in-layer so
        # one half's MoE all-to-all overlaps the other half's attention
        swa_num_slots: int = None,  # hybrid-SWA: the sliding-layer
        # pool's slot count (kv_cache is {"kv", "swa"})
    ):
        """Returns (last_hidden [B, H], kv_cache) — or, with
        ``return_all_hidden``, (hidden [B*Lq, H], kv_cache) for
        speculative verify (logits needed at every position).  With
        ``capture_features`` a third value is returned: the PRE-final-norm
        last-layer hidden [B, Lq, H] (EAGLE draft features, reference
        speculative/eagle_worker_v2.py draft input)."""
        c = self.config
        B, Lq = batch.input_ids.shape
        ids_safe = jnp.maximum(batch.input_ids, 0)
        hidden = params["embed"][ids_safe]  # [B, Lq, H]
        if self.embed_scale != 1.0:
            # scale BEFORE the multimodal splice: vision-tower features
            # enter unscaled (HF Gemma3 scales only token embeddings)
            hidden = (hidden.astype(jnp.float32) * self.embed_scale).astype(
                hidden.dtype
            )
        ds_planes = None
        if input_embeds is not None:
            H0 = c.hidden_size
            if self.deepstack_layers and input_embeds.shape[-1] > H0:
                # Qwen3-VL DeepStack: the packed buffer carries
                # (1 + n) · H columns — H splice rows, then n per-layer
                # planes that ADD to the residual stream after layers
                # 0..n-1 (zeros at non-visual positions, so the add is
                # unconditional)
                n_ds = self.deepstack_layers
                ds_planes = jnp.moveaxis(
                    input_embeds[..., H0:].reshape(B, Lq, n_ds, H0), 2, 0
                )
                is_vis = (batch.input_ids < 0)[None, ..., None]
                ds_planes = jnp.where(is_vis, ds_planes, 0.0)
                input_embeds = input_embeds[..., :H0]
            # multimodal splice: negative prompt ids mark positions whose
            # embedding comes from the request's precomputed rows
            # (vision-tower outputs; reference multimodal embedding merge)
            is_emb = (batch.input_ids < 0)[..., None]
            hidden = jnp.where(
                is_emb, input_embeds.astype(hidden.dtype), hidden
            )
        if self.has_abs_pos:
            # learned absolute position embeddings (GPT-2/OPT; OPT's
            # table is offset by 2); pad rows gather junk that the
            # scheduler masks downstream
            pos = jnp.clip(
                batch.positions + self.pos_offset, 0,
                params["pos_embed"].shape[0] - 1,
            )
            hidden = (
                hidden.astype(jnp.float32) + params["pos_embed"][pos]
            ).astype(hidden.dtype)
        # With context_parallel the tokens of this chunk arrive in ZIGZAG
        # order and the Lq axis shards over the cp mesh axis; everything
        # but attention is token-order-independent, so only the attention
        # call and the sequence-axis sharding constraints change
        # (reference layers/cp/zigzag.py).
        seq_ax = AXIS_CP if context_parallel else None
        hidden = self._shard(hidden, AXIS_DP, seq_ax, None)

        hq, hkv, d = self.hq, self.hkv, self.hd
        rot_half = self.rot_dim // 2
        pos_f = batch.positions[..., None].astype(jnp.float32)  # [B, Lq, 1]

        if lora is not None:
            from sglang_tpu.lora.manager import lora_delta

            lora_tree, adapter_idx = lora
            lora_a, lora_b = lora_tree["a"], lora_tree["b"]
            lora_scaling = lora_tree["scaling"]
        else:
            lora_a, lora_b = {}, {}

        qc = c.quant_config
        proj_out = {k: v[2] for k, v in self._proj_dims().items()}
        # Quantized [L, ...] stacks stay OUT of the scan xs — a scan
        # slice would materialize a full per-layer copy of the packed
        # weights every step; the Pallas kernels index the stack by the
        # layer counter via scalar prefetch instead.
        quant_stacks = {
            k: v
            for k, v in params["layers"].items()
            if isinstance(v, dict) and "qw" in v
        }
        multi_dev = self.mesh_ctx is not None and not self.mesh_ctx.is_single_device
        quant_shard_infos = {
            k: self._quant_shard_info(k, seq_ax) for k in quant_stacks
        }
        quant_pack_blocks = {k: self._quant_pack_block(k) for k in quant_stacks}

        def make_proj(w, la, lb, li):
            def proj(x, name):
                if name in quant_stacks:
                    # quantized base weight (LoRA deltas still apply in
                    # bf16 on top — S-LoRA over a quantized base)
                    qs_over = self._quant_stack_override
                    si = quant_shard_infos[name]
                    be = c.quant_backend
                    if qs_over is not None:
                        # inside the manual-pp wavefront: the leaves are
                        # this stage's LOCAL [L/pp, ...] shards and the
                        # mesh machinery is off — the fused kernel runs
                        # per-rank directly, no QuantShardInfo needed
                        stacks, si = qs_over, None
                    else:
                        stacks = quant_stacks
                        if multi_dev and si is None:
                            be = "xla"  # no shard recipe → GSPMD dequant
                    y = quant_linear(
                        x, stacks[name], qc.method, be,
                        out_features=proj_out.get(name),
                        layer_idx=li,
                        shard_info=(
                            si if multi_dev and qs_over is None else None
                        ),
                        pack_block=quant_pack_blocks[name],
                    )
                else:
                    y = x @ w[name]
                if name in la:
                    y = y + lora_delta(
                        x, la[name], lb[name], adapter_idx, lora_scaling
                    ).astype(y.dtype)
                return y

            return proj

        def rope(x, cos, sin):
            return self._apply_rope(x, cos, sin, rot_half, d)

        fp8_kv = (
            not isinstance(kv_cache, dict)  # double-sparsity pytree
            and jnp.issubdtype(kv_cache.dtype, jnp.floating)
            and jnp.finfo(kv_cache.dtype).bits == 8
        )

        def make_layer_fn(batch, pos_f, num_slots_ov=None):
            # factory: the pp wavefront builds one per micro-batch
            # (sliced batch fields); the hybrid-SWA path builds one per
            # pool (full/swa tables + that pool's num_slots); serial
            # paths build it once
            ns = num_slots if num_slots_ov is None else num_slots_ov
            B, Lq = batch.input_ids.shape  # shadows the full-batch dims
            bidir_groups = self._bidir_groups(batch)
            def layer_fn(carry, xs):
                h, kv, li = carry
                w, inv_freq, window, kvs, la, lb = xs
                kv_scales = (kvs[0], kvs[1]) if fp8_kv else None
                proj = make_proj(w, la, lb, li)
                if getattr(self, "needs_mrope", False):
                    # M-RoPE (Qwen2-VL): section j of the rotary half-dim
                    # reads axis section_map[j] of the 3-axis positions;
                    # decode offsets all axes by the per-request delta
                    if batch.mrope_positions is not None:
                        p3 = batch.mrope_positions.astype(jnp.float32)
                        ang3 = p3[..., None] * inv_freq  # [3, B, Lq, r/2]
                        angles = jnp.zeros_like(ang3[0])
                        for a in range(3):
                            angles = angles + ang3[a] * (
                                self.mrope_section_map == a
                            )
                    else:
                        pr = pos_f
                        if batch.mrope_delta is not None:
                            pr = pr + batch.mrope_delta.astype(
                                jnp.float32
                            )[:, None, None]
                        angles = pr * inv_freq
                else:
                    angles = pos_f * inv_freq  # [B, Lq, rot/2]
                cos = jnp.cos(angles)[..., None, :] * self.rope_mscale
                sin = jnp.sin(angles)[..., None, :] * self.rope_mscale
                # --- attention block ---
                normed = (
                    self._norm(h, w["input_ln"], w.get("input_ln_b"))
                    if self.has_pre_norms
                    else h
                )
                attn_in = normed  # parallel_block: mlp shares this
                if "qkv_proj" in w:
                    # fused execution layout (see _exec_fusions): one
                    # MXU dot, split after; LoRA deltas still key by
                    # the per-projection names
                    QO, KO = hq * d, hkv * d
                    qkv = normed @ w["qkv_proj"]
                    q = qkv[..., :QO]
                    k = qkv[..., QO : QO + KO]
                    v = qkv[..., QO + KO :]
                    if la:
                        def _ld(y, nm):
                            if nm not in la:
                                return y
                            return y + lora_delta(
                                normed, la[nm], lb[nm], adapter_idx,
                                lora_scaling,
                            ).astype(y.dtype)

                        q = _ld(q, "q_proj")
                        k = _ld(k, "k_proj")
                        v = _ld(v, "v_proj")
                else:
                    q = proj(normed, "q_proj")
                    k = proj(normed, "k_proj")
                    v = proj(normed, "v_proj")
                if self.has_qkv_bias:
                    q = q + w["q_bias"]
                    k = k + w["k_bias"]
                    v = v + w["v_bias"]
                if self.has_qk_norm and self.qk_norm_full:
                    # OLMo2: one RMSNorm over the FLAT projection
                    q = self._norm(q, w["q_norm"])
                    k = self._norm(k, w["k_norm"])
                if self.clip_qkv is not None:
                    # OLMoE/DBRX: clamp activations (after the flat norm,
                    # matching HF's q_norm→clamp order)
                    cq = float(self.clip_qkv)
                    q = jnp.clip(q, -cq, cq)
                    k = jnp.clip(k, -cq, cq)
                    v = jnp.clip(v, -cq, cq)
                q = q.reshape(B, Lq, hq, d)
                k = k.reshape(B, Lq, hkv, d)
                v = v.reshape(B, Lq, hkv, d)
                if self.has_qk_norm and not self.qk_norm_full:
                    q = self._norm(q, w["q_norm"], w.get("q_norm_b"))
                    k = self._norm(k, w["k_norm"], w.get("k_norm_b"))
                head_ax = None if self._attn_replicated() else AXIS_TP
                q = self._shard(q, AXIS_DP, None, head_ax, None)
                k = self._shard(k, AXIS_DP, None, head_ax, None)
                v = self._shard(v, AXIS_DP, None, head_ax, None)
                q, k = rope(q, cos, sin), rope(k, cos, sin)
                q, k = self._post_rope(q, k, inv_freq, batch, pos_f)
                if (
                    tbo
                    and getattr(self, "_ds", None) is None
                    and getattr(self, "_nsa", None) is None
                    and not self._dcp()
                    and not context_parallel
                    and not self.parallel_block
                    and batch.swa_page_table is None
                    and B % 2 == 0
                ):
                    return self._tbo_attn_mlp_tail(
                        h, q, k, v, kv, w, li, batch, proj,
                        num_slots=num_slots, page_size=page_size,
                        attn_backend=attn_backend, window=window,
                        kv_scales=kv_scales, bidir_groups=bidir_groups,
                        seq_ax=seq_ax,
                        capture_expert_counts=capture_expert_counts,
                    )
                if getattr(self, "_ds", None) is not None:
                    # double-sparsity: label-cache write + top-K-page
                    # decode (ops/sparse_attention.py); prefill attends
                    # dense over the kv half of the cache pytree
                    from sglang_tpu.layers.attention import (
                        attention_xla,
                        gather_kv,
                        write_kv,
                    )
                    from sglang_tpu.ops.sparse_attention import (
                        fused_sparse_paged_decode,
                        select_top_pages,
                        sparse_paged_decode,
                        write_labels,
                    )

                    ds = self._ds
                    np_pages = num_slots // page_size
                    labels = write_labels(
                        kv["labels"], k, batch.out_slots, li, np_pages,
                        ds.channels,
                    )
                    use_sparse = (
                        Lq == 1
                        and batch.page_table.shape[1] > ds.top_pages
                    )
                    # fp8 KV keeps the XLA sparse path: the kernel's
                    # fused [2, HD] 1-byte write violates Mosaic tiling
                    ds_pallas = (
                        attn_backend == "pallas"
                        and jnp.dtype(kv["kv"].dtype).itemsize >= 2
                    )
                    if use_sparse and ds_pallas:
                        # fused kernel: selection in XLA (small label
                        # matmul + top_k), then selected-page DMAs + the
                        # KV write inside the kernel — no full-context
                        # gather, no XLA scatter on the big cache
                        from sglang_tpu.environ import envs

                        sel = select_top_pages(
                            q, labels, batch.page_table,
                            batch.seq_lens, li,
                            num_pages=np_pages, page_size=page_size,
                            channels=ds.channels,
                            top_pages=ds.top_pages, hkv=hkv,
                            sliding_window=window,
                        )
                        attn_out, kvbuf = fused_sparse_paged_decode(
                            q, k, v, kv["kv"], batch.page_table, sel,
                            batch.out_slots, batch.seq_lens, li,
                            num_slots=num_slots, page_size=page_size,
                            sm_scale=self.sm_scale,
                            sliding_window=window,
                            interpret=bool(
                                envs.SGLANG_TPU_INTERPRET_PALLAS.value
                            ),
                        )
                    else:
                        kvbuf = write_kv(
                            kv["kv"], k, v, batch.out_slots, li,
                            num_slots,
                        )
                        if use_sparse:
                            attn_out = sparse_paged_decode(
                                q, kvbuf, labels, batch.page_table,
                                batch.seq_lens, li,
                                num_pages=np_pages, page_size=page_size,
                                sm_scale=self.sm_scale,
                                channels=ds.channels,
                                top_pages=ds.top_pages,
                                sliding_window=window,
                            )
                        else:
                            kc, vc = gather_kv(
                                kvbuf, batch.page_table, li, num_slots,
                                page_size, d,
                            )
                            attn_out = attention_xla(
                                q, kc, vc, batch.positions,
                                batch.seq_lens, self.sm_scale,
                                logit_cap=c.attn_logit_softcap,
                                sliding_window=window,
                            )
                    kv = {"kv": kvbuf, "labels": labels}
                elif getattr(self, "_nsa", None) is not None:
                    # NSA / InfLLM-v2 block-sparse attention
                    # (ops/nsa_attention.py; reference nsa_backend.py +
                    # sgl-kernel/csrc/infllm_v2/): pages carry pooled-key
                    # summaries; decode reads only the top-K pages via
                    # the fused selected-page kernel, prefill runs
                    # per-query-tile block-sparse flash.
                    from sglang_tpu.environ import envs
                    from sglang_tpu.layers.attention import (
                        attention_xla,
                        gather_kv,
                        write_kv,
                    )
                    from sglang_tpu.ops.nsa_attention import (
                        nsa_prefill_attention,
                        nsa_select_decode,
                        nsa_select_prefill,
                        update_pooled,
                    )
                    from sglang_tpu.ops.sparse_attention import (
                        fused_sparse_paged_decode,
                    )

                    nsa = self._nsa
                    np_pages = num_slots // page_size
                    kvbuf = kv["kv"]
                    interp = bool(envs.SGLANG_TPU_INTERPRET_PALLAS.value)
                    nsa_pallas = attn_backend == "pallas" or interp
                    P_ = batch.page_table.shape[1]
                    if Lq == 1 and P_ > nsa.top_pages and nsa_pallas:
                        sel = nsa_select_decode(
                            q, kv["pooled"], batch.page_table,
                            batch.seq_lens, li,
                            num_pages=np_pages, page_size=page_size,
                            top_pages=nsa.top_pages,
                            sliding_window=window,
                        )
                        attn_out, kvbuf = fused_sparse_paged_decode(
                            q, k, v, kvbuf, batch.page_table, sel,
                            batch.out_slots, batch.seq_lens, li,
                            num_slots=num_slots, page_size=page_size,
                            sm_scale=self.sm_scale,
                            sliding_window=window, interpret=interp,
                        )
                    else:
                        kvbuf = write_kv(
                            kvbuf, k, v, batch.out_slots, li, num_slots
                        )
                        tile_q = min(nsa.tile_q, Lq)
                        while Lq % tile_q:
                            tile_q -= 1
                        ksel = min(
                            max(
                                nsa.top_pages,
                                tile_q // page_size + 2,
                            ),
                            P_,
                        )
                        if Lq > 1 and P_ > ksel and nsa_pallas:
                            # selection must see THIS chunk's keys
                            pooled_pre = update_pooled(
                                kv["pooled"], kvbuf, batch.page_table,
                                batch.positions, batch.seq_lens, li,
                                num_pages=np_pages, page_size=page_size,
                            )
                            new_lens = jnp.maximum(
                                batch.logits_idx
                                - np.arange(B, dtype=np.int32) * Lq
                                + 1,
                                0,
                            )
                            sel = nsa_select_prefill(
                                q, pooled_pre, batch.page_table,
                                batch.seq_lens, new_lens, li,
                                num_pages=np_pages, page_size=page_size,
                                top_pages=ksel, tile_q=tile_q,
                            )
                            attn_out = nsa_prefill_attention(
                                q, kvbuf, batch.page_table, sel,
                                batch.seq_lens, new_lens, li,
                                num_slots=num_slots,
                                page_size=page_size,
                                sm_scale=self.sm_scale,
                                logit_cap=c.attn_logit_softcap,
                                tile_q=tile_q,
                                backend=(
                                    "pallas"
                                    if attn_backend == "pallas" or interp
                                    else "xla"
                                ),
                                interpret=interp,
                            )
                        else:
                            # dense fallback: short contexts / xla
                            kc, vc = gather_kv(
                                kvbuf, batch.page_table, li, num_slots,
                                page_size, d,
                            )
                            attn_out = attention_xla(
                                q, kc, vc, batch.positions,
                                batch.seq_lens, self.sm_scale,
                                logit_cap=c.attn_logit_softcap,
                                sliding_window=window,
                            )
                    pooled = update_pooled(
                        kv["pooled"], kvbuf, batch.page_table,
                        batch.positions, batch.seq_lens, li,
                        num_pages=np_pages, page_size=page_size,
                    )
                    kv = {"kv": kvbuf, "pooled": pooled}
                elif self._dcp():
                    # decode context parallelism: pages sharded over tp,
                    # per-rank partials merge by LSE (layers/dcp/ role)
                    from sglang_tpu.layers.context_parallel import (
                        dcp_paged_attention,
                    )

                    attn_out, kv = dcp_paged_attention(
                        q, k, v, kv, batch, li,
                        num_layers=c.num_hidden_layers,
                        page_size=page_size,
                        sm_scale=self.sm_scale,
                        mesh=self.mesh_ctx.mesh,
                        logit_cap=c.attn_logit_softcap,
                        sliding_window=window,
                        axis=AXIS_TP,
                    )
                elif context_parallel:
                    # KV still lands in the pages (decode continues on the
                    # standard paged path afterwards); the chunk's attention
                    # runs sequence-sharded with the zigzag causal mask.
                    from sglang_tpu.layers.attention import (
                        gather_kv,
                        write_kv,
                    )
                    from sglang_tpu.layers.context_parallel import (
                        cp_prefill_attention,
                    )

                    kv = write_kv(
                        kv, k, v, batch.out_slots, li, num_slots,
                        kv_scales=kv_scales,
                    )
                    kc, vc = k, v
                    if hq != hkv:
                        rep = hq // hkv
                        kc = jnp.repeat(kc, rep, axis=2)
                        vc = jnp.repeat(vc, rep, axis=2)
                    prefix = None
                    if cp_prefix:
                        # cached prefix / earlier chunks: gather their
                        # paged KV (positions < cached_len) and fold it
                        # into the CP flash accumulators; invalid slots
                        # carry a huge position so the mask drops them
                        kp, vp = gather_kv(
                            kv, batch.page_table, li, num_slots,
                            page_size, d,
                        )
                        if hq != hkv:
                            kp = jnp.repeat(kp, hq // hkv, axis=2)
                            vp = jnp.repeat(vp, hq // hkv, axis=2)
                        new_lens = jnp.sum(
                            batch.positions < (1 << 29), axis=1
                        ).astype(jnp.int32)
                        pfx_lens = jnp.maximum(
                            batch.seq_lens - new_lens, 0
                        )
                        cpos = jnp.arange(kp.shape[1], dtype=jnp.int32)
                        pfx_pos = jnp.where(
                            cpos[None, :] < pfx_lens[:, None],
                            cpos[None, :],
                            1 << 30,
                        )
                        prefix = (kp, vp, pfx_pos)
                    attn_out = cp_prefill_attention(
                        q, kc, vc, batch.positions, self.sm_scale,
                        self.mesh_ctx.mesh, axis=AXIS_CP,
                        prefix=prefix,
                    )
                else:
                    attn_out, kv = paged_attention(
                        q,
                        k,
                        v,
                        kv,
                        batch,
                        li,
                        num_slots=ns,
                        page_size=page_size,
                        sm_scale=self.sm_scale,
                        logit_cap=c.attn_logit_softcap,
                        sliding_window=window,
                        backend=attn_backend,
                        kv_scales=kv_scales,
                        sinks=w.get("sinks"),
                        bidir_groups=bidir_groups,
                    )
                attn_out = attn_out.reshape(B, Lq, hq * d)
                attn_out = proj(attn_out, "o_proj")
                if self.has_o_bias:
                    attn_out = attn_out + w["o_bias"]
                if self.has_post_norms:
                    attn_out = self._norm(attn_out, w["post_attn_ln"])
                if self.residual_multiplier != 1.0:  # Granite
                    attn_out = attn_out * self.residual_multiplier
                if self.parallel_block:
                    # Cohere: h += attn(norm(h)) + mlp(norm(h)) — both
                    # branches read the SAME normed input
                    mlp_out = self._mlp_forward(w, attn_in, proj)
                    h = h + attn_out + mlp_out
                    h = self._shard(h, AXIS_DP, seq_ax, None)
                    aux = (
                        self.__dict__.pop("_moe_counts_stash", None)
                        if capture_expert_counts
                        else None
                    )
                    return (h, kv, li + 1), aux
                h = h + attn_out
                h = self._shard(h, AXIS_DP, seq_ax, None)
                # --- mlp block ---
                normed = (
                    self._norm(h, w["post_ln"], w.get("post_ln_b"))
                    if self.has_pre_norms
                    else h
                )
                mlp_out = self._mlp_forward(w, normed, proj)
                if self.has_post_norms:
                    mlp_out = self._norm(mlp_out, w["post_ffw_ln"])
                if self.residual_multiplier != 1.0:  # Granite
                    mlp_out = mlp_out * self.residual_multiplier
                h = h + mlp_out
                h = self._shard(h, AXIS_DP, seq_ax, None)
                # EPLB load signal: MoE _mlp_forward stashes this layer's
                # expert routing counts when capture is on (scan collects
                # them into [L, E]; None for dense models).
                aux = (
                    self.__dict__.pop("_moe_counts_stash", None)
                    if capture_expert_counts
                    else None
                )
                return (h, kv, li + 1), aux

            return layer_fn

        layer_fn = make_layer_fn(batch, pos_f)

        pp = (
            self.mesh_ctx.parallel.pp_size if self.mesh_ctx is not None else 1
        )
        scan_layers = {
            k: v
            for k, v in params["layers"].items()
            if not (isinstance(v, dict) and "qw" in v)
        }
        xs_all = (
            scan_layers,
            self.per_layer_inv_freq(),
            self.per_layer_window(),
            self.per_layer_kv_scales(),
            lora_a,
            lora_b,
        )
        self._ecounts_capture = capture_expert_counts
        ecounts = None
        aux_cat = None
        if isinstance(kv_cache, dict) and "swa" in kv_cache:
            # Hybrid-SWA split pools (reference mem_cache/allocator/
            # swa.py:20, swa_radix_cache.py): sliding-window layers page
            # into their own SMALL pool (freed behind the window by the
            # scheduler sweep) while full-attention layers keep the big
            # pool.  The per-layer pool choice must be static under jit,
            # so the scan runs over the model's WINDOW PATTERN PERIOD
            # (Gemma-2: [swa, full], Gemma-3: 5xswa + full) with the
            # choice unrolled inside the body; each class carries its
            # own local layer index for pool row addressing.
            pattern = self.hybrid_swa_pattern()
            assert pattern is not None and swa_num_slots is not None
            assert pp <= 1 and "dense_layers" not in params
            assert not capture_aux_layers and ds_planes is None
            assert not context_parallel and not capture_expert_counts
            import dataclasses as _dc

            batch_full = _dc.replace(
                batch, swa_page_table=None, swa_out_slots=None
            )
            batch_swa = _dc.replace(
                batch,
                page_table=batch.swa_page_table,
                out_slots=batch.swa_out_slots,
                swa_page_table=None,
                swa_out_slots=None,
            )
            lf_full = make_layer_fn(batch_full, pos_f)
            lf_swa = make_layer_fn(
                batch_swa, pos_f, num_slots_ov=swa_num_slots
            )
            pl = len(pattern)
            Lc = c.num_hidden_layers
            xs_p = jax.tree_util.tree_map(
                lambda x: x.reshape((Lc // pl, pl) + x.shape[1:]), xs_all
            )

            def period_fn(carry, xs_row):
                h, kvf, kvs, lif, lis = carry
                for j, is_sw in enumerate(pattern):
                    xs_j = jax.tree_util.tree_map(
                        lambda x, _j=j: x[_j], xs_row
                    )
                    if is_sw:
                        (h, kvs, lis), _ = lf_swa((h, kvs, lis), xs_j)
                    else:
                        (h, kvf, lif), _ = lf_full((h, kvf, lif), xs_j)
                return (h, kvf, kvs, lif, lis), None

            (hidden, kvf, kvs, _, _), _ = jax.lax.scan(
                period_fn,
                (
                    hidden,
                    kv_cache["kv"],
                    kv_cache["swa"],
                    np.int32(0),
                    np.int32(0),
                ),
                xs_p,
            )
            kv_cache = {"kv": kvf, "swa": kvs}
        elif "dense_layers" in params:
            # Dense-PREFIX stack (GLM4-MoE first_k_dense_replace /
            # DeepSeek-style): the first kd layers carry dense MLP
            # leaves, the remaining stack carries MoE leaves —
            # _mlp_forward dispatches on which leaves are present.
            assert pp <= 1 and lora is None and not capture_aux_layers
            assert ds_planes is None, "DeepStack + dense-prefix unsupported"
            dstack = {
                k: v
                for k, v in params["dense_layers"].items()
                if not (isinstance(v, dict) and "qw" in v)
            }
            kd = next(iter(dstack.values())).shape[0]
            # scan_layers is already the MoE-only stack ([L-kd] leading
            # dim); the per-layer arrays cover the FULL depth and split
            # at kd.
            _, inv_all, win_all, kvs_all, la_, lb_ = xs_all
            xs_d = (
                dstack, inv_all[:kd], win_all[:kd], kvs_all[:kd], la_, lb_
            )
            (hidden, kv_cache, _), _ = jax.lax.scan(
                layer_fn, (hidden, kv_cache, np.int32(0)), xs_d
            )
            xs_m = (
                scan_layers, inv_all[kd:], win_all[kd:], kvs_all[kd:],
                la_, lb_,
            )
            (hidden, kv_cache, _), ecounts = jax.lax.scan(
                layer_fn, (hidden, kv_cache, np.int32(kd)), xs_m
            )
        elif capture_aux_layers:
            # EAGLE3 aux capture (reference llama.py layers_to_capture):
            # the residual stream ENTERING each listed layer.  The scan
            # splits at the capture indices — static slices of the
            # stacked weights, so nothing rides the carry.
            assert pp <= 1, "EAGLE3 aux capture under pp is unsupported"
            assert ds_planes is None, "DeepStack + aux capture unsupported"
            ids = sorted(int(i) for i in capture_aux_layers)
            carry = (hidden, kv_cache, np.int32(0))
            aux_list = []
            ec_parts = []
            start = 0
            for idx in ids + [c.num_hidden_layers]:
                if idx > start:
                    xs_seg = jax.tree_util.tree_map(
                        lambda x, s=start, e=idx: x[s:e], xs_all
                    )
                    carry, ys = jax.lax.scan(layer_fn, carry, xs_seg)
                    if ys is not None:
                        ec_parts.append(ys)
                if idx < c.num_hidden_layers:
                    aux_list.append(carry[0])
                start = max(start, idx)
            hidden, kv_cache = carry[0], carry[1]
            aux_cat = jnp.concatenate(aux_list, axis=-1)
            if ec_parts:
                ecounts = jnp.concatenate(ec_parts, axis=0)
        elif ds_planes is not None:
            # DeepStack prefix: layers 0..n-1 run as length-1 scans so
            # each visual plane can add to the residual stream between
            # them; the remaining stack scans normally.
            assert pp <= 1, "DeepStack under pp is unsupported"
            n_ds = ds_planes.shape[0]
            carry = (hidden, kv_cache, np.int32(0))
            for j in range(n_ds):
                xs_j = jax.tree_util.tree_map(
                    lambda x, s=j: x[s : s + 1], xs_all
                )
                carry, _ = jax.lax.scan(layer_fn, carry, xs_j)
                h_j, kvc_j, li_j = carry
                carry = (
                    (h_j + ds_planes[j]).astype(h_j.dtype), kvc_j, li_j,
                )
            xs_rest = jax.tree_util.tree_map(lambda x: x[n_ds:], xs_all)
            (hidden, kv_cache, _), ecounts = jax.lax.scan(
                layer_fn, carry, xs_rest
            )
        elif pp <= 1:
            (hidden, kv_cache, _), ecounts = jax.lax.scan(
                layer_fn, (hidden, kv_cache, np.int32(0)), xs_all
            )
        else:
            # Pipeline parallelism (reference scheduler_pp_mixin.py:68
            # event_loop_pp).  Layer stacks + KV rows are sharded over the
            # pp mesh axis.  When eligible, the batch splits into M
            # micro-batches and runs as a GPipe wavefront: stage s
            # processes micro-batch t-s at tick t, hidden states hop
            # stages via ppermute — stages compute CONCURRENTLY on their
            # own devices inside one jitted program (the schedule is
            # compiled, not an event loop).  Exotic combos (quantized
            # stacks, LoRA, CP, MoE ecounts) fall back to serialized
            # stages, which buys pp's memory scaling but not throughput.
            L = c.num_hidden_layers
            assert L % pp == 0, (L, pp)
            Lpp = L // pp
            M = (
                self.mesh_ctx.parallel.pp_microbatches or pp
                if self.mesh_ctx is not None
                else pp
            )
            wavefront_ok = (
                M > 1
                and B % M == 0
                and lora is None
                and not context_parallel
                and not capture_expert_counts
                and self.supports_pp_wavefront
            )
            if wavefront_ok:
                # Quantized stacks ride the wavefront too (r05): each
                # stage gets its LOCAL [L/pp, ...] quant shards and runs
                # the fused per-rank kernels with local layer indices.
                hidden, kv_cache = self._pp_wavefront(
                    hidden, kv_cache, batch, xs_all, pp, M, make_layer_fn,
                    quant_stacks=quant_stacks,
                )
            else:
                stage_counts = []
                for s in range(pp):
                    xs_s = jax.tree_util.tree_map(
                        lambda x: x[s * Lpp : (s + 1) * Lpp], xs_all
                    )
                    (hidden, kv_cache, _), ys = jax.lax.scan(
                        layer_fn, (hidden, kv_cache, np.int32(s * Lpp)), xs_s
                    )
                    if ys is not None:
                        stage_counts.append(ys)
                if stage_counts:
                    ecounts = jnp.concatenate(stage_counts, axis=0)

        features = (
            aux_cat if aux_cat is not None else hidden
        )  # pre-final-norm last-layer output (EAGLE3: 3-layer aux concat)
        hidden = self._norm(
            hidden, params["final_ln"], params.get("final_ln_b")
        )
        flat = hidden.reshape(B * Lq, -1)
        extras = []
        if capture_features:
            extras.append(features)
        if capture_expert_counts:
            extras.append(
                ecounts
                if ecounts is not None
                else jnp.zeros((0, 0), jnp.int32)
            )
        if return_all_hidden:
            return (flat, kv_cache, *extras)
        # Gather the last real token of each request (logits positions).
        last_hidden = flat[batch.logits_idx]  # [B, H]
        return (last_hidden, kv_cache, *extras)

    def _mlp_forward(self, w, normed: jnp.ndarray, proj=None) -> jnp.ndarray:
        c = self.config
        if proj is None:
            proj = lambda x, name: x @ w[name]  # noqa: E731
        if self._dp_attention():
            # gather tokens across dp for the (dp, tp)-wide MLP; GSPMD
            # inserts the all-gather here and the reduce-scatter at the
            # residual (reference communicator.py:192 ScatterMode FULL)
            normed = self._shard(normed, None, None, None)
            gate = proj(normed, "gate_proj")
            up = proj(normed, "up_proj")
            inter = act_and_mul(c.hidden_act, gate, up)
            inter = self._shard(inter, None, None, (AXIS_DP, AXIS_TP))
            return proj(inter, "down_proj")
        gate = proj(normed, "gate_proj")
        up = proj(normed, "up_proj")
        inter = act_and_mul(c.hidden_act, gate, up)
        inter = self._shard(inter, AXIS_DP, None, AXIS_TP)
        return proj(inter, "down_proj")

    def compute_logits(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        """[B, H] → [B, V] float32 (reference: layers/logits_processor.py:326)."""
        w = params["embed"] if self.config.tie_word_embeddings else params["lm_head"]
        logits = jnp.einsum(
            "bh,vh->bv", hidden, w, preferred_element_type=jnp.float32
        )
        if self.config.final_logit_softcap:
            cap = self.config.final_logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        if self.logits_divisor != 1.0:  # Granite logits_scaling
            logits = logits / self.logits_divisor
        return logits


class MistralForCausalLM(LlamaForCausalLM):
    pass


class SmolLM3ForCausalLM(LlamaForCausalLM):
    """SmolLM3 (HF ``smollm3``): llama with NoPE layers — every
    ``no_rope_layers[i] == 0`` layer skips rotary entirely (its
    per-layer inv_freq rides the scan as zeros → identity rotation)."""

    def per_layer_inv_freq(self) -> np.ndarray:
        base = super().per_layer_inv_freq()
        hf = self.config.hf_config or {}
        L = self.config.num_hidden_layers
        nrl = hf.get("no_rope_layers")
        if not nrl:
            step = int(hf.get("no_rope_layer_interval", 4) or 4)
            nrl = [int((i + 1) % step != 0) for i in range(L)]
        return base * np.asarray(nrl, np.float32)[:, None]


class Qwen2ForCausalLM(LlamaForCausalLM):
    has_qkv_bias = True


class Qwen3ForCausalLM(LlamaForCausalLM):
    has_qkv_bias = False
    has_qk_norm = True


EntryClass = [
    LlamaForCausalLM,
    MistralForCausalLM,
    Qwen2ForCausalLM,
    Qwen3ForCausalLM,
    SmolLM3ForCausalLM,
]
