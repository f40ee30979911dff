"""ModelRunner: owns mesh, params, KV pool, and the jitted step functions.

Equivalent role to the reference's ``model_executor/model_runner.py:349``
(initialize :654, forward :3000, sample :3258) — with XLA's compile cache
playing the role of CUDA-graph capture (``runner_backend/``): every
(mode, B, L, P, K) shape bucket compiles once and replays from cache.

TPU-native step design (differs from the reference's per-token loop):

* **Fused extend**: one jit = forward + logits + sample for a prefill chunk.
* **Fused K-step decode**: one jit runs K decode iterations in a
  ``lax.scan`` — sampled tokens feed the next iteration **on device**, so
  the host pays one dispatch + one result fetch per K tokens instead of
  per token.  This is the TPU answer to the reference's overlap scheduler
  (``managers/overlap_utils.py:128``): instead of hiding per-step host
  latency behind CUDA streams, the loop simply never leaves the device.
* **Packed transfers**: the host sends ONE int32 buffer (batch metadata)
  and ONE f32 buffer (sampling params) per step — device-link round trips,
  not bytes, are the scarce resource.
"""

from __future__ import annotations

import functools
import threading
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.core.allocator import PageAllocator
from sglang_tpu.core.memory_pool import KVCachePool
from sglang_tpu.environ import envs
from sglang_tpu.layers.sampler import (
    apply_penalties,
    apply_vocab_mask,
    build_penalty_state,
    sample,
    suppress_eos,
    unpack_sampling_params,
    update_penalty_state,
)
from sglang_tpu.model_executor.forward_batch import (
    decode_packed_size,
    decode_step_batch,
    extend_packed_size,
    unpack_decode_batch,
    unpack_extend_batch,
)
from sglang_tpu.models.registry import get_model_class
from sglang_tpu.parallel.mesh import MeshContext, ParallelConfig
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import cdiv, get_logger, next_power_of_2

logger = get_logger(__name__)

DEFAULT_HBM_BYTES = 16 * (1 << 30)  # v5e

_compile_cache_enabled = False


def _enable_persistent_compile_cache():
    """Persist XLA executables across processes (CUDA-graph-cache analogue
    at the process level; first flagship compile is minutes over a
    tunneled link, subsequent launches replay from disk)."""
    global _compile_cache_enabled
    if _compile_cache_enabled:
        return
    _compile_cache_enabled = True
    import os

    cache_dir = os.environ.get(
        "SGLANG_TPU_COMPILE_CACHE", "/tmp/sglang_tpu_jit_cache"
    )
    if cache_dir.lower() in ("0", "off", "none"):
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # older jax without these flags
        pass


def _device_hbm_bytes(device) -> int:
    try:
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return DEFAULT_HBM_BYTES


def _params_bytes(params) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )


class ModelRunner:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config: Optional[ModelConfig] = None,
        devices=None,
    ):
        self.server_args = server_args
        _enable_persistent_compile_cache()
        if model_config is None:
            model_config = ModelConfig.from_model_path(
                server_args.model_path,
                dtype=server_args.dtype,
                context_length=server_args.context_length,
            )
        self.model_config = model_config

        # ---- mesh ----
        if devices is None:
            if server_args.device == "cpu":
                devices = jax.devices("cpu")
            else:
                devices = jax.devices()
        self.mesh_ctx = MeshContext(
            ParallelConfig(
                tp_size=server_args.tp_size,
                dp_size=server_args.dp_size,
                pp_size=server_args.pp_size,
                ep_size=server_args.ep_size,
                cp_size=getattr(server_args, "cp_size", 1),
                dp_attention=getattr(server_args, "enable_dp_attention", False),
                moe_a2a=getattr(server_args, "moe_a2a_backend", "none")
                != "none",
                pp_microbatches=getattr(server_args, "pp_microbatches", 0),
                dcp=getattr(server_args, "enable_dcp", False),
            ),
            devices=devices,
        )

        # ---- quant execution rewrite (before the model builds its
        # param schema): fp8 checkpoints can transcode to int8 exec ----
        qc = model_config.quant_config
        if (
            qc is not None
            and qc.method == "fp8"
            and server_args.quant_execution in ("int8", "auto")
        ):
            import dataclasses

            model_config.quant_config = dataclasses.replace(
                qc, method="w8a8_int8", src_fp8=True
            )
            logger.info("fp8 checkpoint will execute as per-channel int8")
        elif qc is not None and qc.method == "fp8_block":
            # Block-fp8 (DeepSeek-V3 style): block scales can't fold into
            # a runtime per-channel epilogue, so the loader dequantizes on
            # read; execution is then dense bf16 or (opt-in) requantized
            # per-channel int8 on the native MXU int8 path.
            if server_args.quant_execution in ("int8", "auto"):
                import dataclasses

                model_config.quant_config = dataclasses.replace(
                    qc, method="w8a8_int8", src_block_fp8=True
                )
                logger.info(
                    "block-fp8 checkpoint will execute as per-channel int8"
                )
            else:
                model_config.quant_config = None
                logger.info(
                    "block-fp8 checkpoint dequantizes at load "
                    "(dense %s execution)", model_config.dtype,
                )

        # ---- model + weights ----
        model_cls = get_model_class(model_config)
        self.model = model_cls(model_config, mesh_ctx=self.mesh_ctx)
        from sglang_tpu.model_loader.loader import load_model_weights

        t0 = time.monotonic()
        self.params = load_model_weights(
            self.model, model_config, server_args.load_format, self.mesh_ctx,
            seed_addr=getattr(
                server_args, "remote_instance_seed_addr", None
            ) or "",
        )
        logger.info(
            "Weights ready in %.1fs (%.2f GiB)",
            time.monotonic() - t0,
            _params_bytes(self.params) / (1 << 30),
        )
        if getattr(server_args, "enable_elastic_ep", False):
            self.init_elastic_ep()

        # ---- KV pool + allocator ----
        hbm_total = _device_hbm_bytes(devices[0]) * server_args.tp_size
        kv_budget = int(
            hbm_total * server_args.mem_fraction_static
            - _params_bytes(self.params)
        )
        kv_budget = max(kv_budget, 1 << 20)
        self.hybrid_swa = self._hybrid_swa_spec(server_args, model_config)
        self.swa_pool = None
        self.swa_page_allocator = None
        if self.hybrid_swa is not None:
            # Split pools (reference mem_cache/allocator/swa.py:20 —
            # SWATokenToKVPoolAllocator): sliding layers get a SMALL
            # pool whose pages recycle behind the window, so the full
            # layers' pool (and thus max servable context) grows for
            # the same HBM.  Sliding in-flight per request is bounded
            # by window + one unswept prefill chunk + the decode
            # lookahead.
            pattern, w = self.hybrid_swa
            n_swa_layers = sum(pattern) * (
                model_config.num_hidden_layers // len(pattern)
            )
            chunk = server_args.chunked_prefill_size
            if not chunk or chunk <= 0:  # chunked prefill disabled
                chunk = server_args.max_prefill_tokens
            per_req = cdiv(
                w
                + chunk
                + 2 * server_args.page_size
                + getattr(server_args, "decode_window_size", 16),
                server_args.page_size,
            )
            swa_tokens = (
                server_args.max_running_requests
                * per_req
                * server_args.page_size
            )
            self.swa_pool = KVCachePool(
                model_config,
                page_size=server_args.page_size,
                kv_cache_dtype=server_args.kv_cache_dtype,
                max_total_tokens=swa_tokens,
                sharding=self.mesh_ctx.kv_cache_sharding,
                num_kv_layers=n_swa_layers,
            )
            kv_budget = max(
                kv_budget - self.swa_pool.geometry.bytes_total, 1 << 20
            )
            self.swa_page_allocator = PageAllocator(
                self.swa_pool.geometry.num_pages, server_args.page_size
            )
            logger.info(
                "hybrid-SWA split pools: %d sliding layers (window %d), "
                "%d swa pages", n_swa_layers, w,
                self.swa_pool.geometry.num_pages,
            )
        self.kv_pool = KVCachePool(
            model_config,
            page_size=server_args.page_size,
            kv_cache_dtype=server_args.kv_cache_dtype,
            max_total_tokens=server_args.max_total_tokens,
            hbm_budget_bytes=kv_budget,
            # Always the named sharding (even on one device): jit outputs
            # carry NamedSharding, so a SingleDeviceSharding input would
            # re-key every program's SECOND call (one wasted compile per
            # bucket — and a warmup→serve cache miss).
            sharding=self.mesh_ctx.kv_cache_sharding,
            dcp_shards=(
                self.mesh_ctx.parallel.tp_size
                if self.mesh_ctx.parallel.dcp
                else 1
            ),
            # hybrid models (Qwen3-Next) page only their full-attention
            # layers; linear layers live in the state pool; hybrid-SWA
            # models page only their full layers here (sliding layers
            # ride self.swa_pool)
            num_kv_layers=(
                model_config.num_hidden_layers
                - self.swa_pool.geometry.num_layers
                if self.hybrid_swa is not None
                else getattr(self.model, "num_kv_layers", None)
            ),
        )
        self.kv_cache = self.kv_pool.kv_cache
        if self.hybrid_swa is not None:
            self.kv_cache = {
                "kv": self.kv_cache, "swa": self.swa_pool.kv_cache,
            }
            self.swa_pool.kv_cache = None  # release the duplicate ref
        if getattr(server_args, "enable_double_sparsity", False):
            # Double-sparsity decode (reference double_sparsity_backend):
            # the KV cache gains a LABEL sibling — r key channels per kv
            # head — that rides the same pytree through every jitted step
            from sglang_tpu.ops.sparse_attention import label_channels

            g = self.kv_pool.geometry
            if model_config.attention_arch.name == "MLA":
                raise ValueError(
                    "--enable-double-sparsity does not support MLA"
                )
            r = min(server_args.ds_channels, g.head_dim)
            ch = label_channels(g.head_dim, g.num_kv_heads, r)
            self.kv_cache = {
                "kv": self.kv_cache,
                "labels": jax.device_put(
                    jnp.zeros(
                        (
                            g.num_layers * g.num_pages,
                            g.page_size,
                            len(ch),
                        ),
                        g.dtype,
                    ),
                    self.mesh_ctx.replicated,
                ),
            }
            from types import SimpleNamespace

            self.model._ds = SimpleNamespace(
                channels=ch, top_pages=server_args.ds_top_pages,
            )
            logger.info(
                "double sparsity: %d label channels/head, top %d pages",
                r, server_args.ds_top_pages,
            )
        if getattr(server_args, "enable_nsa", False):
            # NSA / InfLLM-v2 block-sparse attention (ops/
            # nsa_attention.py; reference nsa_backend.py): every page
            # carries a pooled-key summary maintained in the write path
            from types import SimpleNamespace

            if getattr(server_args, "enable_double_sparsity", False):
                raise ValueError("--enable-nsa excludes double sparsity")
            if self.hybrid_swa is not None:
                raise ValueError("--enable-nsa excludes hybrid-SWA pools")
            if model_config.attention_arch.name == "MLA":
                raise ValueError("--enable-nsa does not support MLA")
            g = self.kv_pool.geometry
            self.kv_cache = {
                "kv": self.kv_cache,
                "pooled": jax.device_put(
                    jnp.zeros(
                        (
                            g.num_layers * g.num_pages,
                            g.num_kv_heads * g.head_dim,
                        ),
                        jnp.float32,
                    ),
                    self.mesh_ctx.replicated,
                ),
            }
            self.model._nsa = SimpleNamespace(
                top_pages=server_args.nsa_top_pages, tile_q=128,
            )
            logger.info(
                "NSA block-sparse attention: pooled-key summaries, "
                "top %d pages", server_args.nsa_top_pages,
            )
        if getattr(self.model, "is_stateful", False):
            # SSM families: a fixed-size recurrent STATE POOL replaces
            # the KV cache, slot-indexed by each request's first page id
            # (pages are unique per live request; garbage page 0 absorbs
            # padded rows).  It flows through the jitted steps as the
            # donated cache operand exactly like the KV pool.  HYBRID
            # models (Qwen3-Next) keep the paged pool for their
            # full-attention layers alongside the state pools.
            pools = jax.device_put(
                self.model.init_state_pool(
                    self.kv_pool.geometry.num_pages
                ),
                self.mesh_ctx.replicated,
            )
            if getattr(self.model, "hybrid_state", False):
                self.kv_cache = {"kv": self.kv_cache, **pools}
            else:
                self.kv_cache = pools
            self.kv_pool.kv_cache = None  # release the duplicate ref
            if getattr(self.model, "requires_disable_radix", False):
                if not server_args.disable_radix_cache:
                    server_args.disable_radix_cache = True
                    logger.info(
                        "SSM model: radix/prefix cache disabled (a "
                        "recurrent state cannot replay a prefix)"
                    )
        if getattr(self.model, "is_encoder_only", False):
            # encoders see the whole sequence at once — chunked prefill
            # cannot split an embedding forward
            mp = model_config.max_position_embeddings
            if (server_args.chunked_prefill_size or 0) < mp:
                server_args.chunked_prefill_size = mp
                server_args.max_prefill_tokens = max(
                    server_args.max_prefill_tokens, mp
                )
                logger.info(
                    "encoder-only model: chunked prefill disabled "
                    "(chunk=%d)", mp,
                )
        self.page_allocator = PageAllocator(
            self.kv_pool.geometry.num_pages, self.kv_pool.page_size
        )
        self.max_context_len = min(
            model_config.context_length,
            (self.kv_pool.geometry.num_pages - 1) * self.kv_pool.page_size,
        )
        self.max_pages_per_req = cdiv(self.max_context_len, self.kv_pool.page_size)

        # ---- attention backend ----
        self.attn_backend = self._pick_attn_backend(devices[0])
        logger.info("Attention backend: %s", self.attn_backend)

        # ---- quantized-GEMM backend (trace-time static on the config) ----
        if model_config.quant_config is not None:
            # Under a mesh the fused Pallas dequant GEMMs run per-shard via
            # shard_map (models build a QuantShardInfo per projection;
            # non-conforming projections fall back to XLA dequant).
            # SGLANG_TPU_INTERPRET_PALLAS exercises the same path on the
            # CPU test mesh through the Pallas interpreter.
            model_config.quant_backend = (
                "pallas"
                if devices[0].platform == "tpu"
                or envs.SGLANG_TPU_INTERPRET_PALLAS.value
                else "xla"
            )
            logger.info(
                "Quantization: %s (backend %s)",
                model_config.quant_config.method,
                model_config.quant_backend,
            )

        # ---- jitted step fns (cached per shape bucket) ----
        rng_dst = (
            devices[0]
            if self.mesh_ctx.is_single_device
            else self.mesh_ctx.replicated
        )
        self._base_rng = jax.device_put(
            jax.random.PRNGKey(server_args.random_seed), rng_dst
        )
        self._step_counter = 0
        self._dummy_args_cache: Dict[tuple, Any] = {}
        self._extend_fns: Dict[Tuple, Callable] = {}
        self.last_expert_counts: Optional[np.ndarray] = None
        self._decode_fns: Dict[Tuple, Callable] = {}
        self._verify_fns: Dict[Tuple, Callable] = {}
        self._score_fns: Dict[Tuple, Callable] = {}
        self._embed_fns: Dict[Tuple, Callable] = {}
        eos_mask = np.zeros((model_config.vocab_size,), bool)
        for t in model_config.eos_token_ids:
            if 0 <= t < model_config.vocab_size:
                eos_mask[t] = True
        self._eos_mask = eos_mask

        # Absorb the one-time device->host transfer setup cost at startup
        # (first fetch over a tunneled device link can take tens of seconds).
        np.asarray(jnp.zeros((8,), jnp.float32) + 1)

    # ------------------------------------------------------------- backends
    def _hybrid_swa_spec(self, server_args, model_config):
        """(pattern, window) when hybrid-SWA split pools should engage
        (reference mem_cache/allocator/swa.py:20): a mixed sliding/full
        stack (Gemma-2/3 class) with a periodic pattern, on the simple
        serving path — pages freed behind the window cannot back prefix
        sharing, draft KV, or cross-engine transfer."""
        sa = server_args
        if (
            not sa.disable_radix_cache
            or getattr(sa, "disable_hybrid_swa", False)
            or sa.speculative_algorithm
            or getattr(sa, "enable_dcp", False)
            or getattr(sa, "enable_double_sparsity", False)
            or getattr(sa, "enable_nsa", False)
            or getattr(sa, "enable_hierarchical_cache", False)
            or getattr(sa, "disaggregation_mode", "none") not in (None, "none")
            or getattr(sa, "enable_lora", False)
            or sa.pp_size > 1
            or getattr(sa, "cp_size", 1) > 1
            or model_config.quant_config is not None
        ):
            return None
        if getattr(self.model, "is_stateful", False) or getattr(
            self.model, "is_diffusion", False
        ):
            return None
        pattern_fn = getattr(self.model, "hybrid_swa_pattern", None)
        if pattern_fn is None:
            return None
        pattern = pattern_fn()
        if pattern is None:
            return None
        from sglang_tpu.core.memory_pool import resolve_kv_dtype

        if (
            jnp.dtype(
                resolve_kv_dtype(sa.kv_cache_dtype, model_config.dtype)
            ).itemsize
            < 2
        ):
            return None  # fp8 KV keeps the unified pool
        wins = self.model.per_layer_window()
        w = int(wins[wins > 0][0])
        return pattern, w

    def _pick_attn_backend(self, device) -> str:
        if envs.SGLANG_TPU_FORCE_XLA_ATTENTION.value:
            return "xla"
        if getattr(self.model, "force_xla_attention", False):
            # model-declared (Llama4: chunked-attention masks are not in
            # the pallas kernels yet)
            logger.info("Pallas attention disabled by the model family")
            return "xla"
        # double-sparsity rides the fused top-K-page kernel when the
        # standard pallas geometry checks below pass
        # (ops/sparse_attention.fused_sparse_paged_decode)
        if self.mesh_ctx.parallel.dcp:
            # DCP attention is its own shard_map path (page-sharded pool
            # + LSE merge, layers/context_parallel.py); the model bypasses
            # the pallas/xla dispatch entirely.
            if not getattr(self.model, "supports_dcp", False):
                raise ValueError(
                    f"{type(self.model).__name__} does not support "
                    "--enable-dcp (page-sharded KV attention)"
                )
            logger.info("DCP enabled: page-sharded KV, LSE-merge attention")
            return "xla"
        mc = self.model_config
        from sglang_tpu.configs.model_config import AttentionArch

        if mc.attention_arch == AttentionArch.MLA:
            # Absorbed-MLA decode runs the fused kernel as MQA over the
            # (128-padded) latent lane span; the pool pads for Mosaic.
            hd = self.kv_pool.geometry.padded_head_dim
        else:
            # Mosaic sliced HBM DMA requires a 128-aligned lane dim (Hkv*D).
            hd = (
                mc.num_key_value_heads
                // max(self.mesh_ctx.tp_size, 1)
                * mc.head_dim
            )
        if hd % 128 != 0:
            logger.info(
                "Pallas attention disabled: kv_heads*head_dim per shard "
                "= %d is not 128-aligned", hd,
            )
            return "xla"
        if jnp.dtype(self.kv_pool.geometry.dtype).itemsize < 2:
            # fp8 KV: REAL Mosaic rejects ANY [ps, 2, HD] 1-byte page
            # slice — the K/V axis (size 2) is sublane-padded to the fp8
            # packing (4) and slices along it must be 4-aligned
            # ("Slice shape along dimension 2 must be aligned to tiling
            # (4), but is 2", first hit by the r05 on-chip drive; the
            # interpret tests cannot see tiling).  Until the fp8 pool is
            # re-laid-out with the K/V axis folded into the sublane dim
            # ([L*NP, ps*2, HD]), fp8 serves on the XLA path on real
            # hardware; interpret mode keeps exercising the kernels.
            if not envs.SGLANG_TPU_INTERPRET_PALLAS.value:
                logger.info(
                    "Pallas attention disabled: fp8 KV page slices hit "
                    "the Mosaic 1-byte sublane-tiling rule → xla"
                )
                return "xla"
            if mc.attention_arch == AttentionArch.MLA:
                logger.info("Pallas attention disabled: fp8 MLA KV → xla")
                return "xla"
            if (self.kv_pool.page_size * 2) % 32 != 0:
                # page block [ps, 2, HD] starts at ps*2-row offsets; fp8
                # (1-byte) tiles are 32 sublanes
                logger.info(
                    "Pallas attention disabled: fp8 KV needs page_size "
                    "multiple of 16 (got %d)", self.kv_pool.page_size,
                )
                return "xla"
        if device.platform == "tpu" or envs.SGLANG_TPU_INTERPRET_PALLAS.value:
            # the interpret env exercises the kernels through the Pallas
            # interpreter on the CPU test mesh (same as the quant backend)
            try:
                import sglang_tpu.ops.paged_attention  # noqa: F401

                return "pallas"
            except ImportError:
                return "xla"
        return "xla"

    # ------------------------------------------------------------- impl fns
    def _forward_batch(self, params, kv_cache, batch, lora=None,
                       input_embeds=None, capture_expert_counts=False,
                       context_parallel=0, tbo=False):
        kw = {}
        if input_embeds is not None:
            kw["input_embeds"] = input_embeds
        if capture_expert_counts:
            kw["capture_expert_counts"] = True
        if tbo:
            kw["tbo"] = True
        if self.hybrid_swa is not None:
            kw["swa_num_slots"] = self.swa_pool.num_slots
        if context_parallel:
            kw["context_parallel"] = True
            if context_parallel == 2:  # cached prefix / later chunk
                kw["cp_prefix"] = True
        return self.model.forward(
            params,
            kv_cache,
            batch,
            **kw,
            num_slots=self.kv_pool.num_slots,
            page_size=self.kv_pool.page_size,
            attn_backend=self.attn_backend,
            lora=lora,
        )

    def _extend_impl(self, params, kv_cache, packed, st_packed, pen, vmask, lora_tree, adapter_idx, embeds, rng, step, *, B, L, P, all_greedy=False, use_pen=False, use_mask=False, use_lora=False, use_embeds=False, use_ecounts=False, use_cp=False, use_tbo=False, tl_k=0):
        """Prefill chunk: forward + logits + sample, one program."""
        batch = unpack_extend_batch(
            packed, B, L, P,
            mrope=getattr(self.model, "needs_mrope", False),
            swa=self.hybrid_swa is not None,
        )
        lora = (lora_tree, adapter_idx) if use_lora else None
        fwd = self._forward_batch(
            params, kv_cache, batch, lora,
            input_embeds=embeds if use_embeds else None,
            capture_expert_counts=use_ecounts,
            context_parallel=use_cp,
            tbo=use_tbo,
        )
        if use_ecounts:
            hidden, kv_cache, ecounts = fwd
        else:
            hidden, kv_cache = fwd
        logits = self.model.compute_logits(params, hidden)
        st = unpack_sampling_params(st_packed)
        if use_pen:
            counts, appeared = build_penalty_state(pen, logits.shape[-1])
            logits = apply_penalties(logits, counts, appeared, st)
        if use_mask:
            logits = apply_vocab_mask(logits, vmask)
        logits = suppress_eos(logits, st.min_new_remaining, self._eos_mask)
        tokens, logprobs = sample(
            logits, st, jax.random.fold_in(rng, step), all_greedy=all_greedy
        )
        # Single fetched result: [2(+2k), B] f32 (token ids are exact in f32
        # for vocab < 2^24); optional rows = top-k alternative logprobs.
        out = jnp.stack([tokens.astype(jnp.float32), logprobs])  # [2, B]
        if tl_k > 0:
            tv, ti = jax.lax.approx_max_k(logits, tl_k, recall_target=1.0)
            lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            out = jnp.concatenate(
                [out, (tv - lse).T, ti.astype(jnp.float32).T], axis=0
            )  # [2 + 2k, B]
        if use_ecounts:
            return out, kv_cache, ecounts
        return out, kv_cache

    def _decode_impl(self, params, kv_cache, packed, st_packed, pen, vmask, lora_tree, adapter_idx, chain_tokens, fsm_parts, fsm_state, rng, step, *, B, P, K, all_greedy=False, use_pen=False, use_mask=False, use_lora=False, use_chain=False, use_fsm=False, fsm_bucket=0, tl_k=0):
        """K fused decode steps; tokens chain on device via lax.scan.

        With ``use_chain`` the first input token comes from the PREVIOUS
        window's device-resident last-token array instead of the packed
        host buffer — windows chain device-to-device so the scheduler can
        dispatch window N+1 before fetching window N's result (the host
        fetch round-trip hides under device compute; reference overlap
        contract, overlap_utils.py:128).

        With ``use_fsm`` the grammar advances ON DEVICE each fused step:
        ``fsm_parts`` is a tuple of per-grammar (mask_bits [Si, W],
        next_state [Si, V]) tables (uploaded once, concatenated here with
        state offsets already applied by the host in ``fsm_state``);
        structured output keeps K>1 windows instead of one dispatch per
        token."""
        mrope = getattr(self.model, "needs_mrope", False)
        first_tokens, seq_lens0, page_table, mrope_delta, swa_table = (
            unpack_decode_batch(
                packed, B, P, mrope=mrope,
                swa=self.hybrid_swa is not None,
            )
        )
        if use_chain:
            first_tokens = chain_tokens
        st = unpack_sampling_params(st_packed)
        rng = jax.random.fold_in(rng, step)
        pen_state = None
        if use_pen:
            V = self.model_config.vocab_size
            pen_state = build_penalty_state(pen, V)
        if use_fsm:
            # combined table, padded to the bucket; the LAST row is the
            # free/sentinel state: all tokens allowed, self-loop.
            Sb = fsm_bucket
            masks = jnp.concatenate([m for m, _ in fsm_parts], axis=0)
            # Per-grammar next_state tables hold grammar-LOCAL indices;
            # rebase each by its row offset in the combined table (offsets
            # are static shapes, so this folds into the compiled program).
            # Negative entries (dead transitions) stay negative.
            rebased = []
            _off = 0
            for _, n in fsm_parts:
                rebased.append(jnp.where(n >= 0, n + _off, n))
                _off += n.shape[0]
            nexts = jnp.concatenate(rebased, axis=0)
            Sr = masks.shape[0]
            W = masks.shape[1]
            V = nexts.shape[1]
            mask_full = jnp.full((Sb, W), 0xFFFFFFFF, jnp.uint32)
            mask_full = mask_full.at[:Sr].set(masks)
            next_full = jnp.full((Sb, V), Sb - 1, jnp.int32)
            next_full = next_full.at[:Sr].set(nexts)

        lora = (lora_tree, adapter_idx) if use_lora else None

        def body(carry, k):
            kv, tokens, pstate, gstate = carry
            batch = decode_step_batch(
                tokens, seq_lens0, page_table, k, self.kv_pool.page_size,
                swa_page_table=swa_table,
            )
            if mrope:
                import dataclasses as _dc

                batch = _dc.replace(batch, mrope_delta=mrope_delta)
            hidden, kv = self._forward_batch(params, kv, batch, lora)
            logits = self.model.compute_logits(params, hidden)
            if use_pen:
                counts, appeared = pstate
                logits = apply_penalties(logits, counts, appeared, st)
            if use_fsm:
                logits = apply_vocab_mask(logits, mask_full[gstate])
            elif use_mask:
                # large-FSM grammar batches run K=1 windows (the mask
                # depends on the host-side FSM state after every token)
                logits = apply_vocab_mask(logits, vmask)
            logits = suppress_eos(
                logits, st.min_new_remaining - k, self._eos_mask
            )
            new_tokens, logprobs = sample(
                logits, st, jax.random.fold_in(rng, k), all_greedy=all_greedy
            )
            if use_pen:
                pstate = update_penalty_state(counts, appeared, new_tokens)
            if use_fsm:
                nxt = jnp.take_along_axis(
                    next_full[gstate], new_tokens[:, None], axis=-1
                )[:, 0]
                gstate = jnp.where(nxt < 0, fsm_bucket - 1, nxt)
            if tl_k > 0:
                tv, ti = jax.lax.approx_max_k(
                    logits, tl_k, recall_target=1.0
                )
                lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
                extra = (tv - lse, ti)
            else:
                extra = (jnp.zeros((B, 0)), jnp.zeros((B, 0), jnp.int32))
            return (kv, new_tokens, pstate, gstate), (new_tokens, logprobs, extra)

        g0 = fsm_state if use_fsm else jnp.zeros((B,), jnp.int32)
        (kv_cache, last_tokens, _, _), (all_tokens, all_logprobs, tl) = jax.lax.scan(
            body,
            (kv_cache, first_tokens, pen_state, g0),
            np.arange(K, dtype=np.int32),
        )
        out = jnp.stack(
            [all_tokens.astype(jnp.float32), all_logprobs]
        )  # [2, K, B]
        if tl_k > 0:
            # tl = (vals [K, B, k], ids [K, B, k])
            out = (out, tl[0], tl[1].astype(jnp.float32))
        return out, last_tokens.astype(jnp.int32), kv_cache

    def _verify_impl(self, params, kv_cache, packed, rng, step, *, B, L, P):
        """Speculative verify: one extend forward over [last_token, drafts],
        greedy logits at EVERY position (reference ForwardMode.TARGET_VERIFY,
        speculative/eagle_worker_v2.py:1538 — chain drafts, greedy accept)."""
        batch = unpack_extend_batch(
            packed, B, L, P, mrope=getattr(self.model, "needs_mrope", False)
        )
        hidden, kv_cache = self.model.forward(
            params,
            kv_cache,
            batch,
            num_slots=self.kv_pool.num_slots,
            page_size=self.kv_pool.page_size,
            attn_backend=self.attn_backend,
            return_all_hidden=True,
        )  # [B*L, H]
        logits = self.model.compute_logits(params, hidden)  # [B*L, V]
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        chosen = jnp.take_along_axis(
            logits, tokens[:, None], axis=-1
        ).squeeze(-1)
        out = jnp.stack(
            [tokens.astype(jnp.float32), chosen - lse]
        ).reshape(2, B, L)
        return out, kv_cache

    def _get_verify_fn(self, B, L, P):
        key = (B, L, P)
        fn = self._verify_fns.get(key)
        if fn is None:
            logger.info("compiling verify: B=%d L=%d P=%d", B, L, P)
            fn = jax.jit(
                functools.partial(self._verify_impl, B=B, L=L, P=P),
                donate_argnums=(1,),
            )
            self._verify_fns[key] = fn
        return fn

    def verify_step(
        self, packed: np.ndarray, B: int, L: int, P: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Greedy target tokens at every position: ([B, L] i64, [B, L] f32)."""
        self._step_counter += 1
        fn = self._get_verify_fn(B, L, P)
        out, self.kv_cache = fn(
            self.params,
            self.kv_cache,
            packed,
            self._base_rng,
            np.int32(self._step_counter),
        )
        out = np.asarray(out)
        return out[0].astype(np.int64), out[1]

    def _embed_impl(self, params, kv_cache, packed, *, B, L, P):
        """Embedding forward: last-token hidden state, L2-normalized
        (e5-mistral-style last-token pooling; reference: embedding models
        served via ``is_embedding`` + ``layers/pooler.py``).  Reward /
        classification models override ``compute_score`` and return raw
        score-head logits instead (reference reward-model classes)."""
        batch = unpack_extend_batch(
            packed, B, L, P,
            mrope=getattr(self.model, "needs_mrope", False),
            swa=self.hybrid_swa is not None,
        )
        if getattr(self.model, "is_encoder_only", False):
            # BERT-family encoders: one dense bidirectional forward (no
            # KV cache / paging — reference srt/models/bert.py family)
            emb = self.model.forward_dense_embed(
                params, batch.input_ids, batch.seq_lens
            )
            return emb.astype(jnp.float32), kv_cache
        hidden, kv_cache = self._forward_batch(params, kv_cache, batch)
        if hasattr(self.model, "compute_score"):
            return (
                self.model.compute_score(params, hidden).astype(jnp.float32),
                kv_cache,
            )
        hf = hidden.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(hf * hf, axis=-1, keepdims=True) + 1e-12)
        return hf / norm, kv_cache

    def _get_embed_fn(self, B, L, P):
        key = (B, L, P)
        fn = self._embed_fns.get(key)
        if fn is None:
            logger.info("compiling embed: B=%d L=%d P=%d", B, L, P)
            fn = jax.jit(
                functools.partial(self._embed_impl, B=B, L=L, P=P),
                donate_argnums=(1,),
            )
            self._embed_fns[key] = fn
        return fn

    def embed_step(
        self, packed: np.ndarray, B: int, L: int, P: int
    ) -> np.ndarray:
        """Normalized last-token embeddings [B, hidden] f32."""
        self._step_counter += 1
        fn = self._get_embed_fn(B, L, P)
        emb, self.kv_cache = fn(self.params, self.kv_cache, packed)
        return np.asarray(emb)

    def _score_impl(self, params, kv_cache, packed, targets, *, B, L, P):
        """Input-token logprobs: one extend forward; position j's logits
        score the GIVEN target token (the next input token) — used for
        prompt logprobs / echo and DSL select() choice scoring
        (reference: logprob_start_len / input_token_logprobs)."""
        batch = unpack_extend_batch(
            packed, B, L, P,
            mrope=getattr(self.model, "needs_mrope", False),
            swa=self.hybrid_swa is not None,
        )
        hidden, kv_cache = self.model.forward(
            params,
            kv_cache,
            batch,
            num_slots=self.kv_pool.num_slots,
            page_size=self.kv_pool.page_size,
            attn_backend=self.attn_backend,
            return_all_hidden=True,
        )  # [B*L, H]
        logits = self.model.compute_logits(params, hidden)  # [B*L, V]
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = targets.reshape(B * L)
        chosen = jnp.take_along_axis(
            logits, jnp.maximum(tgt, 0)[:, None], axis=-1
        ).squeeze(-1)
        lp = jnp.where(tgt >= 0, chosen - lse, 0.0)
        return lp.reshape(B, L), kv_cache

    def _get_score_fn(self, B, L, P):
        key = (B, L, P)
        fn = self._score_fns.get(key)
        if fn is None:
            logger.info("compiling score: B=%d L=%d P=%d", B, L, P)
            fn = jax.jit(
                functools.partial(self._score_impl, B=B, L=L, P=P),
                donate_argnums=(1,),
            )
            self._score_fns[key] = fn
        return fn

    def score_step(
        self, packed: np.ndarray, targets: np.ndarray, B: int, L: int, P: int
    ) -> np.ndarray:
        """Logprob of targets[b, j] under position j's logits; target -1
        entries return 0. Returns [B, L] f32."""
        self._step_counter += 1
        fn = self._get_score_fn(B, L, P)
        lp, self.kv_cache = fn(
            self.params, self.kv_cache, packed, targets.astype(np.int32)
        )
        return np.asarray(lp)

    # ------------------------------------------------------------ host API
    def _get_extend_fn(self, B, L, P, all_greedy, use_pen, use_mask, use_lora=False, use_embeds=False, tl_k=0, use_ecounts=False, use_cp=False, use_tbo=False):
        key = (B, L, P, all_greedy, use_pen, use_mask, use_lora, use_embeds, tl_k, use_ecounts, use_cp, use_tbo)
        fn = self._extend_fns.get(key)
        if fn is None:
            logger.info(
                "compiling extend: B=%d L=%d P=%d greedy=%s pen=%s mask=%s",
                B, L, P, all_greedy, use_pen, use_mask,
            )
            fn = jax.jit(
                functools.partial(
                    self._extend_impl,
                    B=B, L=L, P=P, all_greedy=all_greedy, use_pen=use_pen,
                    use_mask=use_mask, use_lora=use_lora,
                    use_embeds=use_embeds, tl_k=tl_k,
                    use_ecounts=use_ecounts, use_cp=use_cp,
                    use_tbo=use_tbo,
                ),
                donate_argnums=(1,),
            )
            self._extend_fns[key] = fn
        return fn

    def _get_decode_fn(self, B, P, K, all_greedy, use_pen, use_mask, use_lora=False, use_chain=False, use_fsm=False, fsm_bucket=0, n_fsm=0, tl_k=0):
        key = (B, P, K, all_greedy, use_pen, use_mask, use_lora, use_chain,
               use_fsm, fsm_bucket, n_fsm, tl_k)
        fn = self._decode_fns.get(key)
        if fn is None:
            logger.info(
                "compiling decode: B=%d P=%d K=%d greedy=%s pen=%s mask=%s chain=%s fsm=%s",
                B, P, K, all_greedy, use_pen, use_mask, use_chain, use_fsm,
            )
            fn = jax.jit(
                functools.partial(
                    self._decode_impl,
                    B=B, P=P, K=K, all_greedy=all_greedy, use_pen=use_pen,
                    use_mask=use_mask, use_lora=use_lora,
                    use_chain=use_chain, use_fsm=use_fsm,
                    fsm_bucket=fsm_bucket, tl_k=tl_k,
                ),
                donate_argnums=(1,),
            )
            self._decode_fns[key] = fn
        return fn

    def extend_step(
        self,
        packed: np.ndarray,
        st_packed: np.ndarray,
        B: int,
        L: int,
        P: int,
        pen: Optional[np.ndarray] = None,
        vmask: Optional[np.ndarray] = None,
        adapter_idx: Optional[np.ndarray] = None,
        embeds: Optional[np.ndarray] = None,
        tl_k: int = 0,
        capture_ecounts: bool = False,
        return_async: bool = False,
        use_cp: bool = False,
        use_tbo: bool = False,
    ):
        """Run a prefill chunk; returns (tokens [B] i64, logprobs [B] f32,
        top_logprobs or None).  With ``capture_ecounts`` the MoE expert
        routing counts [L_moe, E] land in ``self.last_expert_counts``
        (EPLB load signal; reference eplb/expert_distribution.py)."""
        self._step_counter += 1
        # Static greedy hint: padded rows have temperature 0 by construction.
        fn = self._get_extend_fn(
            B, L, P, bool((st_packed[:, 0] <= 0).all()), pen is not None,
            vmask is not None, adapter_idx is not None, embeds is not None,
            tl_k, capture_ecounts, use_cp, use_tbo,
        )
        res = fn(
            self.params,
            self.kv_cache,
            packed,
            st_packed,
            pen if pen is not None else np.zeros((B, 1, 2), np.int32),
            vmask if vmask is not None else np.zeros((B, 1), np.uint32),
            self._lora_tree() if adapter_idx is not None else {},
            adapter_idx if adapter_idx is not None else np.zeros((B,), np.int32),
            embeds if embeds is not None else np.zeros((B, 1, 1), np.float32),
            self._base_rng,
            np.int32(self._step_counter),
        )
        if capture_ecounts:
            out, self.kv_cache, ecounts = res
        else:
            out, self.kv_cache = res
            ecounts = None

        def finish():
            o = np.asarray(out)
            if ecounts is not None:
                self.last_expert_counts = np.asarray(ecounts)
            tokens, logprobs = o[0].astype(np.int64), o[1]
            toplp = None
            if tl_k > 0:
                toplp = (
                    o[2 + tl_k:].T.astype(np.int64),  # ids [B, k]
                    o[2: 2 + tl_k].T,  # vals [B, k]
                )
            return tokens, logprobs, toplp

        if return_async:
            # PD-multiplexing (reference multiplex/): the extend is
            # dispatched; the caller settles in-flight decode windows
            # under its device execution, then calls finish() — the
            # decode fetch round-trip hides under prefill compute.
            return finish
        return finish()

    def cp_for_extend(self, batch) -> int:
        """Zigzag prefill CP degree for this extend batch, or 1.
        Eligible when the mesh has a cp axis, the model supports the CP
        forward, and no window/softcap/multimodal features are in play
        (reference layers/cp/ engages on long-prompt prefill).  Cached
        prefixes and chunked-prefill continuations are supported: their
        earlier KV folds into the CP flash accumulators from the pages
        (cp_prefill_attention's ``prefix``)."""
        cp = self.mesh_ctx.parallel.cp_size if self.mesh_ctx else 1
        if cp <= 1:
            return 1
        if not getattr(self.model, "supports_cp", False):
            return 1
        c = self.model_config
        if c.hf_config.get("sliding_window") or getattr(
            c, "attn_logit_softcap", None
        ):
            return 1
        for r in batch.reqs:
            if r.input_embeds is not None:
                return 1
        return cp

    # --------------------------------------------------------- elastic EP
    expert_backup = None  # ExpertBackupManager when --enable-elastic-ep

    def init_elastic_ep(self):
        """DRAM-snapshot the stacked expert tensors for rank-fault
        recovery (reference expert_backup_manager.py)."""
        from sglang_tpu.eplb.elastic import ExpertBackupManager

        layer_key = (
            "moe_layers" if "moe_layers" in self.params else "layers"
        )
        mgr = ExpertBackupManager(layer_key=layer_key)
        host_view = {
            layer_key: {
                k: np.asarray(v)
                for k, v in self.params[layer_key].items()
                if k in ("moe_w1", "moe_w3", "moe_w2", "moe_gate",
                         "gate_bias", "moe_w1_scale", "moe_w3_scale",
                         "moe_w2_scale")
            }
        }
        if not host_view[layer_key]:
            raise ValueError("--enable-elastic-ep requires a MoE model")
        mgr.refresh(host_view)
        self.expert_backup = mgr

    def recover_expert_rank_fault(
        self, failed_ranks, counts: Optional[np.ndarray] = None
    ) -> dict:
        """Re-place every expert onto the surviving EP ranks from the
        DRAM backup (reference model_runner.py:3050
        _maybe_rebalance_after_rank_fault + elastic_ep/elastic_ep.py).

        The mesh (and XLA program shape) keeps all ranks — a degraded
        rank still participates in collectives — but its expert span is
        filled with DUPLICATE slots whose selection bias is -1e30, so
        routing never sends it a token and every real expert is served
        by a survivor.  Outputs are bit-identical: the permutation only
        relabels expert slots and masked duplicates are unreachable."""
        assert self.expert_backup is not None, "init_elastic_ep() first"
        from sglang_tpu.eplb.elastic import placement_for_rank_fault

        ep = self.mesh_ctx.parallel.tp_size
        bk = self.expert_backup.backup
        Lm, E = bk["moe_gate"].shape[0], bk["moe_gate"].shape[2]
        if counts is None:
            counts = np.ones((Lm, E), np.float64)
        failed = sorted(set(int(r) for r in failed_ranks))
        perm, survivors = placement_for_rank_fault(counts, ep, failed)
        per_rank = perm.shape[1] // survivors
        E_new = per_rank * ep

        perm_full = np.zeros((Lm, E_new), np.int64)
        active = np.zeros((Lm, E_new), bool)
        for layer in range(Lm):
            s = 0
            seen = set()
            for r in range(ep):
                span = slice(r * per_rank, (r + 1) * per_rank)
                if r in failed:
                    perm_full[layer, span] = 0  # inert duplicates
                else:
                    row = perm[layer, s * per_rank : (s + 1) * per_rank]
                    perm_full[layer, span] = row
                    for j, e in enumerate(row):
                        if int(e) not in seen:
                            seen.add(int(e))
                            active[layer, r * per_rank + j] = True
                    s += 1
            assert len(seen) == E, (layer, len(seen), E)

        layer_key = self.expert_backup.layer_key
        old_layers = self.params[layer_key]
        new_layers = dict(old_layers)
        idx = perm_full  # [Lm, E_new]
        for name in ("moe_w1", "moe_w3", "moe_w2",
                     "moe_w1_scale", "moe_w3_scale", "moe_w2_scale"):
            if name not in bk:
                continue
            src = bk[name]  # [Lm, E, ...]
            gathered = np.stack([src[l][idx[l]] for l in range(Lm)])
            new_layers[name] = jax.device_put(
                jnp.asarray(gathered), old_layers[name].sharding
            )
        gate = bk["moe_gate"]  # [Lm, H, E]
        new_gate = np.stack([gate[l][:, idx[l]] for l in range(Lm)])
        new_layers["moe_gate"] = jax.device_put(
            jnp.asarray(new_gate), old_layers["moe_gate"].sharding
        )
        bias_src = bk.get("gate_bias")
        bias = (
            np.stack([bias_src[l][idx[l]] for l in range(Lm)])
            if bias_src is not None
            else np.zeros((Lm, E_new), np.float32)
        ).astype(np.float32)
        bias[~active] = -1e30
        bias_sharding = (
            old_layers["gate_bias"].sharding
            if "gate_bias" in old_layers
            else self.mesh_ctx.replicated
        )
        new_layers["gate_bias"] = jax.device_put(
            jnp.asarray(bias), bias_sharding
        )
        params = dict(self.params)
        params[layer_key] = new_layers
        self.params = params
        if hasattr(self.model, "num_experts"):
            self.model.num_experts = E_new
        logger.info(
            "elastic EP: recovered from rank fault %s — %d experts "
            "re-placed over %d survivors (E %d -> %d slots)",
            failed, E, survivors, E, E_new,
        )
        return {
            "failed_ranks": failed,
            "survivors": survivors,
            "num_expert_slots": E_new,
        }

    def apply_expert_rebalance(self, perm: np.ndarray):
        """Permute stacked MoE expert weights (+ gate columns) by
        ``perm`` [L_moe, E] on device — outputs are identical, per-rank
        load under EP changes (reference eplb/expert_location_updater).
        Jitted step fns take params as an argument, so no recompile."""
        from sglang_tpu.eplb import apply_expert_permutation

        layer_key = (
            "moe_layers" if "moe_layers" in self.params else "layers"
        )
        old_params = self.params
        new_params = apply_expert_permutation(
            old_params, perm, layer_key=layer_key
        )
        # keep the original shardings (the gather may resolve replicated)
        self.params = jax.tree_util.tree_map(
            lambda n, o: jax.device_put(n, o.sharding)
            if hasattr(o, "sharding") and n is not o
            else n,
            new_params,
            old_params,
        )

    def decode_window_async(
        self,
        packed: np.ndarray,
        st_packed: np.ndarray,
        B: int,
        P: int,
        K: int,
        pen: Optional[np.ndarray] = None,
        vmask: Optional[np.ndarray] = None,
        adapter_idx: Optional[np.ndarray] = None,
        tl_k: int = 0,
        chain_tokens=None,  # device [B] i32 from the previous window
        fsm=None,  # (parts tuple, state0 [B] i32, S_bucket) — device FSM
    ):
        """Dispatch K fused decode steps WITHOUT fetching the result.

        JAX async dispatch returns device futures immediately; the
        scheduler overlaps host bookkeeping of the previous window with
        this window's device execution (the reference's overlap-scheduler
        contract, ``managers/overlap_utils.py:128``, without streams:
        the device is simply never waited on until the result is needed).
        With ``chain_tokens`` the window's first input token comes from
        the previous window's device-resident output, so it can be
        dispatched BEFORE that window's result is fetched.
        """
        self._step_counter += 1
        if chain_tokens is None:
            # First window of a chain: feed the packed first tokens
            # through the SAME chain program (device_put with the jit
            # output sharding so fresh and chained windows share one
            # compiled program — halves the decode bucket count).
            chain_tokens = jax.device_put(
                np.ascontiguousarray(packed[:B]).astype(np.int32),
                self._replicated_sharding,
            )
        use_chain = True
        use_fsm = fsm is not None
        fsm_parts, fsm_state, fsm_bucket = (
            fsm if use_fsm else ((), np.zeros((B,), np.int32), 0)
        )
        fn = self._get_decode_fn(
            B, P, K, bool((st_packed[:, 0] <= 0).all()), pen is not None,
            vmask is not None, adapter_idx is not None, use_chain,
            use_fsm, fsm_bucket, len(fsm_parts), tl_k,
        )
        out, last_tokens, self.kv_cache = fn(
            self.params,
            self.kv_cache,
            packed,
            st_packed,
            pen if pen is not None else self._dummy_arg("pen", (B, 1, 2), np.int32),
            vmask if vmask is not None else self._dummy_arg("vmask", (B, 1), np.uint32),
            self._lora_tree() if adapter_idx is not None else {},
            adapter_idx if adapter_idx is not None else self._dummy_arg("aidx", (B,), np.int32),
            chain_tokens,
            fsm_parts,
            fsm_state if use_fsm else self._dummy_arg("fsm0", (B,), np.int32),
            self._base_rng,
            np.int32(self._step_counter),
        )
        return (out, tl_k, last_tokens)

    def _dummy_arg(self, kind: str, shape: tuple, dtype):
        """Device-resident zero placeholder, cached per (kind, shape).

        Unused jit args (penalties off, no grammar mask, no LoRA) were
        fresh host zeros on EVERY window dispatch — each one an h2d
        upload over the tunnel whose latency lands between windows.
        One cached device buffer removes the transfer entirely."""
        key = (kind, shape)
        buf = self._dummy_args_cache.get(key)
        if buf is None:
            buf = jax.device_put(
                np.zeros(shape, dtype), self._replicated_sharding
            )
            self._dummy_args_cache[key] = buf
        return buf

    @staticmethod
    def decode_window_fetch(handle):
        """Block on a decode_window_async handle; returns (tokens [K, B],
        logprobs [K, B], top_logprobs or None)."""
        out, tl_k, _last = handle
        if tl_k > 0:
            out, tv, ti = out
            out = np.asarray(out)
            return (
                out[0].astype(np.int64),
                out[1],
                (np.asarray(ti).astype(np.int64), np.asarray(tv)),
            )
        out = np.asarray(out)
        return out[0].astype(np.int64), out[1], None

    def decode_window(self, *args, **kwargs):
        """Synchronous decode window (dispatch + fetch)."""
        return self.decode_window_fetch(
            self.decode_window_async(*args, **kwargs)
        )

    @property
    def _replicated_sharding(self):
        return self.mesh_ctx.sharding()

    # ------------------------------------------------------------- warmup
    # The reference captures CUDA graphs for every decode batch size at
    # startup (model_runner init_cuda_graphs; cuda_graph_runner.py) so
    # live traffic never stalls on graph capture.  The XLA analogue:
    # precompile the (mode, B, L, P, flags) jit buckets reachable for the
    # configured workload.  Phase 1 lowers+compiles in parallel threads
    # (populating the persistent XLA disk cache); phase 2 executes each
    # program once with all-padded dummy batches (seq_lens=0, writes land
    # in garbage page 0) to populate the in-process jit cache.

    def warmup_plan(
        self,
        bs_buckets,
        decode_window_size: int,
        chunked_prefill_size: int,
        ctx_len: Optional[int] = None,
        include_sampled: bool = True,
        use_ecounts: bool = False,
    ):
        """Enumerate the program specs a serving session will hit."""
        ps = self.kv_pool.page_size
        ctx = min(ctx_len or 4096, self.max_context_len)
        p_set = sorted(
            {
                self.page_bucket(cdiv(max(ctx // d, 1), ps))
                for d in (1, 2, 4)
            }
        )
        greedy_set = (True, False) if include_sampled else (True,)
        specs = []
        for greedy in greedy_set:
            for B in bs_buckets:
                for P in p_set:
                    specs.append(
                        ("decode", dict(B=B, P=P, K=decode_window_size,
                                        greedy=greedy))
                    )
        # Extend (TTFT path): single-request prefills dominate in steady
        # state; bursts hit the next buckets up.  L covers the chunk-size
        # bucket plus two sizes below (r05 on-chip BENCH_online: 512-token
        # prompts under an 8k chunk size hit L=512 = l_hi//16, and a
        # 32-concurrent burst packs B=16 — both compiled DURING traffic
        # and showed up directly in mean TTFT).
        l_hi = next_power_of_2(max(chunked_prefill_size, 1))
        l_set = sorted(
            {l_hi, max(l_hi // 4, 1), max(l_hi // 16, 64)}
        )
        b_ext = sorted(
            {b for b in bs_buckets if b <= 16} or {bs_buckets[0]}
        )
        for greedy in greedy_set:
            for B in b_ext:
                for L in l_set:
                    for P in p_set:
                        specs.append(
                            ("extend", dict(B=B, L=L, P=P, greedy=greedy,
                                            use_ecounts=use_ecounts))
                        )
        return specs

    def _warm_fn_args(self, kind: str, s: dict):
        """(jitted_fn, concrete dummy args) for one warmup spec — arg
        assembly mirrors decode_window_async / extend_step exactly so the
        live calls hit the same program."""
        B = s["B"]
        st = np.zeros((B, 8), np.float32)
        st[:, 1] = 1.0
        st[:, 2] = -1.0
        st[:, 6] = 1.0
        if not s["greedy"]:
            st[:, 0] = 0.7
        step = np.int32(0)
        mrope = getattr(self.model, "needs_mrope", False)
        if kind == "decode":
            P, K = s["P"], s["K"]
            fn = self._get_decode_fn(
                B, P, K, s["greedy"], False, False, False, True,
                False, 0, 0, 0,
            )
            args = (
                self.params,
                self.kv_cache,
                np.zeros(
                    decode_packed_size(
                        B, P, mrope=mrope, swa=self.hybrid_swa is not None
                    ),
                    np.int32,
                ),
                st,
                np.zeros((B, 1, 2), np.int32),
                np.zeros((B, 1), np.uint32),
                {},
                np.zeros((B,), np.int32),
                jax.device_put(
                    np.zeros((B,), np.int32), self._replicated_sharding
                ),
                (),
                np.zeros((B,), np.int32),
                self._base_rng,
                step,
            )
        else:
            L, P = s["L"], s["P"]
            fn = self._get_extend_fn(
                B, L, P, s["greedy"], False, False, False, False, 0,
                s.get("use_ecounts", False), False,
            )
            args = (
                self.params,
                self.kv_cache,
                np.zeros(
                    extend_packed_size(
                        B, L, P, mrope=mrope,
                        swa=self.hybrid_swa is not None,
                    ),
                    np.int32,
                ),
                st,
                np.zeros((B, 1, 2), np.int32),
                np.zeros((B, 1), np.uint32),
                {},
                np.zeros((B,), np.int32),
                np.zeros((B, 1, 1), np.float32),
                self._base_rng,
                step,
            )
        return fn, args

    def warmup_compile(self, specs, threads: int = 8, progress_cb=None):
        """Phase 1: lower + compile every spec in parallel (persistent
        XLA cache absorbs the work across processes).  Safe to run while
        the scheduler serves — nothing executes, nothing is donated."""
        import concurrent.futures as cf

        t0 = time.monotonic()
        done = [0]
        lock = threading.Lock()

        def one(spec):
            kind, s = spec
            try:
                fn, args = self._warm_fn_args(kind, s)
                fn.lower(*args).compile()
            except Exception:
                logger.exception("warmup compile failed for %s %s", kind, s)
            with lock:
                done[0] += 1
                if progress_cb is not None:
                    progress_cb(done[0], len(specs))

        with cf.ThreadPoolExecutor(max_workers=threads) as pool:
            list(pool.map(one, specs))
        dt = time.monotonic() - t0
        logger.info(
            "warmup: compiled %d programs in %.1fs", len(specs), dt
        )
        return dt

    def warmup_execute(self, specs):
        """Phase 2: run each program once on an all-padded dummy batch
        (populates the in-process jit executable cache; XLA compile is a
        disk-cache hit after phase 1).  Caller must hold the scheduler
        idle — the kv cache is donated through each call."""
        t0 = time.monotonic()
        for kind, s in specs:
            fn, args = self._warm_fn_args(kind, s)
            res = fn(*args)
            if kind == "decode":
                _, _, self.kv_cache = res
            else:
                if s.get("use_ecounts", False):
                    _, self.kv_cache, _ = res
                else:
                    _, self.kv_cache = res
        jax.block_until_ready(self.kv_cache)
        dt = time.monotonic() - t0
        logger.info(
            "warmup: executed %d programs in %.1fs", len(specs), dt
        )
        return dt

    # ---------------------------------------------------------------- lora
    lora_manager = None  # set by the engine when --enable-lora

    def _lora_tree(self):
        assert self.lora_manager is not None, "LoRA not enabled"
        return self.lora_manager.device_tree()

    # ------------------------------------------------------------- buckets
    def decode_bs_bucket(self, bs: int) -> int:
        buckets = self.server_args.decode_bs_buckets or [
            1, 2, 4, 8, 16, 32, 64, 128, 256,
        ]
        for b in buckets:
            if b >= bs:
                return min(b, max(self.server_args.max_running_requests, 1))
        return buckets[-1]

    def page_bucket(self, max_pages: int) -> int:
        p = next_power_of_2(max(max_pages, 1))
        return min(p, next_power_of_2(self.max_pages_per_req))

    # ------------------------------------------------------------- hicache
    def _page_rows(
        self, pages, pad_to: int, layer_lo: int = 0,
        n_layers: Optional[int] = None,
    ) -> np.ndarray:
        # Padding rows use a POSITIVE one-past-the-end sentinel: JAX
        # normalizes negative indices before the OOB check, so a -1
        # sentinel under .at[].set(mode="drop") would silently write the
        # last row of the pool instead of being dropped.
        g = self.kv_pool.geometry
        if n_layers is None:
            n_layers = g.num_layers
        oob = g.num_layers * g.num_pages
        arr = np.full((pad_to,), -1, np.int64)
        arr[: len(pages)] = pages
        layers = np.arange(layer_lo, layer_lo + n_layers)
        rows = np.where(
            arr[None, :] >= 0,
            layers[:, None] * g.num_pages + arr[None, :],
            oob,
        )
        return rows.ravel()  # [n_layers * pad_to], oob = padding

    def extract_pages(self, pages) -> np.ndarray:
        """Fetch whole pages (all layers) to host: [n, L, ps, 2, HD]."""
        assert self.kv_pool.geometry.dcp_shards == 1 and not isinstance(
            self.kv_cache, dict
        ), (
            "page extraction not supported with DCP-sharded or "
            "double-sparsity/stateful cache layouts yet"
        )
        from sglang_tpu.utils import next_power_of_2

        n = len(pages)
        pad = next_power_of_2(n)
        rows = self._page_rows(pages, pad)
        g0 = self.kv_pool.geometry
        safe_rows = np.minimum(rows, g0.num_layers * g0.num_pages - 1)
        data = np.asarray(self.kv_cache[jnp.asarray(safe_rows)])
        g = self.kv_pool.geometry
        data = data.reshape(g.num_layers, pad, *self.kv_cache.shape[1:])
        return data.transpose(1, 0, 2, 3, 4)[:n]

    def inject_pages(self, pages, data: np.ndarray, layer_lo: int = 0) -> None:
        """Write host page slabs into the device pool.

        ``data`` is ``[n, L, ps, 2, HD]`` for a whole-pool write, or a
        LAYER SLICE ``[n, l, ps, 2, HD]`` starting at ``layer_lo`` — the
        hicache layer-pipelined load_back (reference
        cache_controller.py:74 LayerDoneCounter) dispatches promotions
        as layer-chunk waves between decode windows, so each transfer is
        small and forward steps interleave instead of stalling behind
        one whole-pool scatter."""
        from sglang_tpu.utils import next_power_of_2

        n = len(pages)
        pad = next_power_of_2(n)
        g = self.kv_pool.geometry
        n_layers = data.shape[1]
        if pad != n:
            padding = np.zeros((pad - n,) + data.shape[1:], data.dtype)
            data = np.concatenate([data, padding], axis=0)
        rows = self._page_rows(pages, pad, layer_lo, n_layers)
        vals = data.transpose(1, 0, 2, 3, 4).reshape(
            n_layers * pad, *self.kv_cache.shape[1:]
        )
        key = ("inject", pad, n_layers)
        fn = self._extend_fns.get(key)
        if fn is None:
            fn = jax.jit(
                lambda kv, r, v: kv.at[r].set(
                    v.astype(kv.dtype), mode="drop"
                ),
                donate_argnums=(0,),
            )
            self._extend_fns[key] = fn
        self.kv_cache = fn(self.kv_cache, rows, vals)

    # ------------------------------------------------------------- weights
    def update_weights_from_disk(self, model_path: str) -> None:
        """Reload weights from a checkpoint directory without recompiling
        (reference model_runner.py:1840 update_weights_from_disk — RL /
        fine-tune refresh; shapes and shardings must match)."""
        import dataclasses

        from sglang_tpu.model_loader.loader import load_model_weights

        cfg = dataclasses.replace(self.model_config, model_path=model_path)
        new_params = load_model_weights(
            self.model, cfg, "safetensors", self.mesh_ctx
        )
        old = jax.tree_util.tree_leaves(self.params)
        new = jax.tree_util.tree_leaves(new_params)
        if [x.shape for x in old] != [x.shape for x in new]:
            raise ValueError("checkpoint shapes do not match the loaded model")
        self.params = new_params

    def save_sharded_state(self, path: str) -> None:
        """Write the live (device-sharded) param tree as an orbax
        checkpoint for fast sharded reload via
        ``--load-format sharded_state`` (reference
        ShardedStateLoader + save_sharded_state.py role)."""
        from sglang_tpu.model_loader.loader import save_sharded_state

        save_sharded_state(self.params, path)

    def serve_weights_bootstrap(self, port: int = 0,
                                host: str = "0.0.0.0"):
        """Seed side of remote-instance bootstrap (reference
        RemoteInstanceModelLoader + send-weights group): serve the LIVE
        exec-layout param tree, flattened by tree path, over the
        weight_sync TCP stream.  Returns (thread, bound_port)."""
        from sglang_tpu.model_loader.loader import _iter_paths
        from sglang_tpu.weight_sync import serve_weights

        def snapshot() -> Dict[str, np.ndarray]:
            return {
                p: np.asarray(jax.device_get(leaf))
                for p, leaf in _iter_paths(self.params)
            }

        return serve_weights(snapshot, port=port, host=host)

    def update_weights_from_tensor(self, named_tensors: Dict[str, np.ndarray]):
        """RL weight sync (reference model_runner.py:2160) — in-place swap of
        param leaves without recompilation (shapes/shardings must match)."""
        from sglang_tpu.model_loader.loader import _tree_get, _tree_set

        params = self.params
        for path, tensor in named_tensors.items():
            old = _tree_get(params, path)
            arr = jax.device_put(
                jnp.asarray(tensor, dtype=old.dtype), old.sharding
            )
            if arr.shape != old.shape:
                raise ValueError(
                    f"shape mismatch for {path}: {arr.shape} vs {old.shape}"
                )
            _tree_set(params, path, arr)

    # ------------------------------------------- distributed weight sync
    def init_weights_update_group(self, master_address: str,
                                  master_port: int) -> None:
        """Register the trainer's weight-broadcast endpoint (reference
        model_runner.py:2011 joins a temporary NCCL group; the TPU
        transport is a TCP pull — see weight_sync/)."""
        self._weight_sync_addr = (master_address, int(master_port))
        logger.info(
            "weight sync group: trainer at %s:%d", master_address, master_port
        )

    def update_weights_from_distributed(
        self, names: Optional[list] = None
    ) -> int:
        """Pull tensors from the registered trainer endpoint and apply
        them (reference model_runner.py:2070).  Names may be HF tensor
        names (mapped via the model's checkpoint mapping) or param tree
        paths.  Returns the number of tensors applied."""
        addr = getattr(self, "_weight_sync_addr", None)
        if addr is None:
            raise ValueError("call init_weights_update_group first")
        from sglang_tpu.weight_sync import WeightSyncClient

        client = WeightSyncClient(*addr)
        n = 0
        # Apply in ~256 MB buckets as tensors stream in, so the reader
        # thread's pipelining overlaps network pull with device upload and
        # peak host memory stays one bucket, not the whole checkpoint.
        bucket: Dict[str, np.ndarray] = {}
        bucket_bytes = 0
        BUCKET_CAP = 256 << 20
        for name, arr in client.iter_tensors(names):
            bucket[name] = arr
            bucket_bytes += arr.nbytes
            n += 1
            if bucket_bytes >= BUCKET_CAP:
                self.update_weights_from_hf_tensors(bucket)
                bucket, bucket_bytes = {}, 0
        if bucket:
            self.update_weights_from_hf_tensors(bucket)
        return n

    def update_weights_from_hf_tensors(
        self, named: Dict[str, np.ndarray]
    ) -> None:
        """Apply checkpoint-named tensors (HF names run through the
        model's weight mapping — transpose/repack transforms included —
        and per-layer tensors update their slice of the stacked leaf).
        Plain param-tree paths are accepted too."""
        from sglang_tpu.model_loader.loader import _tree_get, _tree_set

        mapping = self.model.hf_weight_mapping()
        # fused execution layout (models/llama.py _exec_fusions): writes
        # keyed by the loader path land in their out-column range
        fused_map = getattr(self.model, "exec_fused_map", lambda: {})()

        def apply_leaf(path, layer_idx, tensor):
            col = fused_map.get(path)
            if col is not None:
                path, off, width = col
            old = _tree_get(self.params, path)
            arr = jnp.asarray(tensor, dtype=old.dtype)
            if layer_idx is None:
                if col is None and arr.shape != old.shape:
                    raise ValueError(
                        f"shape mismatch for {path}: {arr.shape} vs {old.shape}"
                    )
                if col is None:
                    new = jax.device_put(arr, old.sharding)
                else:
                    new = jax.device_put(
                        old.at[..., off : off + width].set(arr), old.sharding
                    )
            else:
                idx = layer_idx if isinstance(layer_idx, tuple) else (layer_idx,)
                if col is None:
                    new = jax.device_put(old.at[idx].set(arr), old.sharding)
                else:
                    new = jax.device_put(
                        old.at[idx + (Ellipsis, slice(off, off + width))].set(
                            arr
                        ),
                        old.sharding,
                    )
            _tree_set(self.params, path, new)

        for name, tensor in named.items():
            try:  # direct param-tree path (update_weights_from_tensor style)
                _tree_get(self.params, name)
                is_path = True
            except (KeyError, TypeError):
                is_path = False
            if is_path:
                apply_leaf(name, None, tensor)
                continue
            m = mapping(name)
            if m is None:
                logger.warning("weight sync: no mapping for %r; skipped", name)
                continue
            path, layer_idx, transform = m
            if transform == "t":
                tensor = np.ascontiguousarray(np.asarray(tensor).T)
            elif callable(transform):
                tensor = transform(np.asarray(tensor))
            if isinstance(tensor, dict):  # multi-leaf quant transform
                for sub, arr in tensor.items():
                    apply_leaf(f"{path}.{sub}", layer_idx, arr)
            else:
                apply_leaf(path, layer_idx, tensor)

    # ------------------------------------------------------------- EAGLE
    # Chain-draft speculative decoding with device rejection sampling
    # (reference speculative/eagle_worker_v2.py:505 draft, :1538 verify,
    # reject_sampling.py). See speculative/eagle.py for the design.
    eagle = None  # EagleDraft after init_eagle()
    _eagle_aux_ids: tuple = ()  # EAGLE3 target aux-capture layer ids

    def init_eagle(self, k: int, spec_slots: int):
        assert not getattr(self.model, "needs_mrope", False), (
            "speculative decoding is not supported for M-RoPE models yet"
        )
        from sglang_tpu.speculative.eagle import EagleDraft

        self.eagle = EagleDraft(self.model_config)
        self.eagle_k = k
        dtype = self.model_config.dtype
        draft_path = self.server_args.speculative_draft_model_path
        self._eagle_aux_ids: tuple = ()
        if (
            self.server_args.speculative_algorithm or ""
        ).lower() == "eagle3":
            assert draft_path, "EAGLE3 needs --speculative-draft-model-path"
            self.eagle.init_eagle3(
                draft_path, self.model_config.vocab_size
            )
            self._eagle_aux_ids = self.eagle.aux_layer_ids
        self.eagle_params = self.eagle.load_params(draft_path, dtype)
        g = self.kv_pool.geometry
        # 1-layer paged KV over the SAME page table as the target pool.
        self.eagle_kv = jnp.zeros(
            (g.num_pages, g.page_size, 2, self.kv_cache.shape[-1]),
            self.kv_cache.dtype,
        )
        H = self.model_config.hidden_size
        # EAGLE3: the pool holds the target's num_aux-layer aux concat
        fw = H * (self.eagle.num_aux if self.eagle.is_eagle3 else 1)
        self.eagle_feats = jnp.zeros((spec_slots, k + 1, fw), dtype)
        self._eagle_extend_fns: Dict[Tuple, Callable] = {}
        self._eagle_draft_fns: Dict[Tuple, Callable] = {}
        self._eagle_verify_fns: Dict[Tuple, Callable] = {}
        self._eagle_tree_draft_fns: Dict[Tuple, Callable] = {}
        self._eagle_tree_verify_fns: Dict[Tuple, Callable] = {}
        logger.info("EAGLE enabled: k=%d, %d spec slots", k, spec_slots)

    def _head_logits(self, params, features):
        """lm_head(final_norm(features)) — draft/verify token dists.
        MTP/NextN drafts carry their own shared_head norm; EAGLE3
        drafts carry their OWN head over a draft vocab mapped into the
        target vocab (d2t)."""
        from sglang_tpu.layers.norm import rms_norm

        if getattr(self.eagle, "is_eagle3", False):
            return self.eagle.head_logits(self.eagle_params, features)
        w = (
            self.eagle_params["head_norm"]
            if getattr(self.eagle, "has_head_norm", False)
            else params["final_ln"]
        )
        normed = rms_norm(features, w, self.model_config.rms_norm_eps)
        return self.model.compute_logits(
            params, normed.reshape(-1, normed.shape[-1])
        ).reshape(*features.shape[:-1], -1)

    def _eagle_extend_impl(
        self, params, kv_cache, dparams, draft_kv, feats_pool,
        packed, st_packed, slot_idx, rng, step, *, B, L, P, all_greedy,
    ):
        """Prefill with feature capture + draft-KV prefill (the draft
        layer runs over the same chunk with target features shifted by
        one; reference eagle 'draft prefill')."""
        batch = unpack_extend_batch(packed, B, L, P)
        hidden, kv_cache, feats = self.model.forward(
            params, kv_cache, batch,
            num_slots=self.kv_pool.num_slots,
            page_size=self.kv_pool.page_size,
            attn_backend=self.attn_backend,
            capture_features=True,
            capture_aux_layers=self._eagle_aux_ids,
        )
        logits = self.model.compute_logits(params, hidden)
        st = unpack_sampling_params(st_packed)
        logits = suppress_eos(logits, st.min_new_remaining, self._eos_mask)
        tokens, logprobs = sample(
            logits, st, jax.random.fold_in(rng, step), all_greedy=all_greedy
        )
        out = jnp.stack([tokens.astype(jnp.float32), logprobs])

        # draft prefill: feat_prev[i] = target feature at i-1; the first
        # chunk token uses last chunk's stored feature (zeros at pos 0).
        f_carry = feats_pool[slot_idx, 0]  # [B, H]
        f_carry = jnp.where(
            (batch.positions[:, :1] == 0), 0.0, f_carry
        )
        feat_prev = jnp.concatenate(
            [f_carry[:, None], feats[:, :-1]], axis=1
        )
        _, draft_kv = self.eagle.forward(
            dparams, params["embed"], draft_kv, batch, feat_prev,
            num_slots=self.kv_pool.num_slots,
            page_size=self.kv_pool.page_size,
            attn_backend=self.attn_backend,
        )
        # store the feature at each req's last real position into row 0
        lr = batch.logits_idx  # [B] flat index into [B*L]
        f_last = feats.reshape(B * L, -1)[lr]
        S = feats_pool.shape[0]
        safe_slot = jnp.where(slot_idx >= 0, slot_idx, S)
        feats_pool = feats_pool.at[safe_slot, 0].set(
            f_last.astype(feats_pool.dtype), mode="drop"
        )
        return out, kv_cache, draft_kv, feats_pool

    def eagle_extend_step(
        self, packed, st_packed, slot_idx, B, L, P,
    ):
        key = (B, L, P, bool((st_packed[:, 0] <= 0).all()))
        fn = self._eagle_extend_fns.get(key)
        if fn is None:
            logger.info("compiling eagle extend: B=%d L=%d P=%d", B, L, P)
            fn = jax.jit(
                functools.partial(
                    self._eagle_extend_impl, B=B, L=L, P=P,
                    all_greedy=key[3],
                ),
                donate_argnums=(1, 3, 4),
            )
            self._eagle_extend_fns[key] = fn
        self._step_counter += 1
        out, self.kv_cache, self.eagle_kv, self.eagle_feats = fn(
            self.params, self.kv_cache, self.eagle_params, self.eagle_kv,
            self.eagle_feats, packed, st_packed,
            slot_idx.astype(np.int32), self._base_rng,
            np.int32(self._step_counter),
        )
        out = np.asarray(out)
        return out[0].astype(np.int64), out[1], None

    # Draft-window packed layout (int32):
    #   [B*A ext_tokens | B ext_lens | B base_pos | B slot_idx | B*P pages]
    def _eagle_draft_impl(
        self, params, dparams, draft_kv, feats_pool, dpacked, st_packed,
        rng, step, *, B, A, P, K,
    ):
        from sglang_tpu.model_executor.forward_batch import DeviceBatch

        ps = self.kv_pool.page_size
        o = 0
        ext_tokens = dpacked[o : o + B * A].reshape(B, A); o += B * A
        ext_lens = dpacked[o : o + B]; o += B
        base_pos = dpacked[o : o + B]; o += B
        slot_idx = dpacked[o : o + B]; o += B
        page_table = dpacked[o:].reshape(B, P)
        st = unpack_sampling_params(st_packed)
        rng = jax.random.fold_in(rng, step)

        # ---- phase 1: draft-extend over last round's emitted tokens with
        # TRUE target features (reference draft_extend :760) ----
        ji = np.arange(A, dtype=np.int32)[None, :]
        valid = ji < ext_lens[:, None]
        pos = jnp.where(valid, base_pos[:, None] + ji, 0)
        page = jnp.take_along_axis(page_table, pos // ps, axis=1)
        out_slots = jnp.where(valid, page * ps + pos % ps, 0)
        batch = DeviceBatch(
            input_ids=jnp.where(valid, ext_tokens, 0),
            positions=pos,
            seq_lens=jnp.where(ext_lens > 0, base_pos + ext_lens, 0),
            page_table=page_table,
            out_slots=out_slots,
            logits_idx=(
                np.arange(B, dtype=np.int32) * A
                + jnp.maximum(ext_lens - 1, 0)
            ),
        )
        feat_prev = feats_pool[slot_idx][:, :A]  # [B, A, H] rows j=f_{base+j-1}
        g, draft_kv = self.eagle.forward(
            dparams, params["embed"], draft_kv, batch, feat_prev,
            num_slots=self.kv_pool.num_slots, page_size=ps,
            attn_backend=self.attn_backend,
        )
        g_last = g.reshape(B * A, -1)[batch.logits_idx]  # [B, H] f̂_m

        # ---- phase 2: chain K draft steps ----
        greedy = st.temperature <= 0.0
        temp = jnp.where(greedy, 1.0, st.temperature)[:, None]

        def chain(carry, j):
            feat, dkv = carry
            q_logits = self._head_logits(params, feat[:, None])[:, 0]
            d = jnp.where(
                greedy,
                jnp.argmax(q_logits, axis=-1),
                jax.random.categorical(
                    jax.random.fold_in(rng, j),
                    q_logits.astype(jnp.float32) / temp,
                    axis=-1,
                ),
            ).astype(jnp.int32)
            # run the draft layer on (d, feat) at position m+j+1
            p1 = base_pos + ext_lens + j
            pg = jnp.take_along_axis(page_table, (p1 // ps)[:, None], axis=1)[:, 0]
            slot1 = jnp.where(ext_lens > 0, pg * ps + p1 % ps, 0)
            b1 = DeviceBatch(
                input_ids=d[:, None],
                positions=jnp.where(ext_lens > 0, p1, 0)[:, None],
                seq_lens=jnp.where(ext_lens > 0, p1 + 1, 0),
                page_table=page_table,
                out_slots=slot1[:, None],
                logits_idx=np.arange(B, dtype=np.int32),
            )
            feat2, dkv = self.eagle.forward(
                dparams, params["embed"], dkv, b1,
                feat[:, None],
                num_slots=self.kv_pool.num_slots, page_size=ps,
                attn_backend=self.attn_backend,
            )
            return (feat2[:, 0], dkv), (d, q_logits)

        (_, draft_kv), (drafts, q_logits) = jax.lax.scan(
            chain, (g_last, draft_kv), np.arange(K, dtype=np.int32)
        )
        # [K, B] → [B, K];  q_logits [K, B, V] → [B, K, V] stays on device
        return drafts.T, jnp.swapaxes(q_logits, 0, 1), draft_kv

    def eagle_draft_window(self, dpacked, st_packed, B, A, P, K=None):
        # K (chain depth) defaults to the configured depth; adaptive
        # spec (speculative/adaptive.py) passes smaller depths — each is
        # its own jitted bucket (the feature/KV pools are sized for the
        # configured maximum).
        K = self.eagle_k if K is None else K
        key = (B, A, P, K)
        fn = self._eagle_draft_fns.get(key)
        if fn is None:
            logger.info(
                "compiling eagle draft: B=%d A=%d P=%d K=%d", B, A, P, K
            )
            fn = jax.jit(
                functools.partial(
                    self._eagle_draft_impl, B=B, A=A, P=P, K=K
                ),
                donate_argnums=(2,),
            )
            self._eagle_draft_fns[key] = fn
        self._step_counter += 1
        drafts, q_logits, self.eagle_kv = fn(
            self.params, self.eagle_params, self.eagle_kv, self.eagle_feats,
            dpacked, st_packed, self._base_rng, np.int32(self._step_counter),
        )
        return np.asarray(drafts).astype(np.int64), q_logits

    def _eagle_verify_impl(
        self, params, kv_cache, feats_pool, packed, st_packed, q_logits,
        drafts, slot_idx, bootstrap, rng, step, *, B, L, P,
        use_trunc=False,
    ):
        """Target extend over [e, d_1..d_K] + device rejection sampling +
        feature-pool refresh (reference verify :1538 + reject_sampling)."""
        from sglang_tpu.speculative.eagle import chain_rejection_sample

        batch = unpack_extend_batch(packed, B, L, P)
        hidden, kv_cache, feats = self.model.forward(
            params, kv_cache, batch,
            num_slots=self.kv_pool.num_slots,
            page_size=self.kv_pool.page_size,
            attn_backend=self.attn_backend,
            return_all_hidden=True,
            capture_features=True,
            capture_aux_layers=self._eagle_aux_ids,
        )
        p_logits = self.model.compute_logits(params, hidden).reshape(B, L, -1)
        st = unpack_sampling_params(st_packed)
        tokens, accept_len, lp = chain_rejection_sample(
            p_logits, q_logits, drafts, st.temperature,
            jax.random.fold_in(rng, step), bootstrap=bootstrap > 0,
            trunc=(st.top_p, st.top_k, st.min_p) if use_trunc else None,
        )
        S = feats_pool.shape[0]
        safe_slot = jnp.where(slot_idx >= 0, slot_idx, S)
        if feats.shape[1] < feats_pool.shape[1]:
            # adaptive depth < configured max: pool rows are sized for
            # the max; the tail rows are never read (next round's
            # draft-extend covers at most accept+1 <= L positions)
            feats = jnp.pad(
                feats,
                ((0, 0), (0, feats_pool.shape[1] - feats.shape[1]), (0, 0)),
            )
        feats_pool = feats_pool.at[safe_slot].set(
            feats.astype(feats_pool.dtype), mode="drop"
        )
        out = jnp.concatenate(
            [
                tokens.astype(jnp.float32),
                accept_len[:, None].astype(jnp.float32),
                lp,
            ],
            axis=1,
        )  # [B, 2L+1]
        return out, kv_cache, feats_pool

    # -------------------------------------------------- EAGLE tree (top-b)
    # Tree speculation (reference speculative_eagle_topk).  TPU-native
    # tree mechanics: every branch gets a PRIVATE copy of the request's
    # tail page(s), so draft chaining and target verify stay fully
    # causal under the existing paged kernels (no tree attention
    # masks), KV writes never collide, and committing the winning
    # branch is a host-side page-pointer swap — no KV row compaction.
    #
    # Greedy batches run PER-DEPTH beam branching (reference
    # eagle_utils.select_top_k_tokens): at every depth each live branch
    # expands top-TB ways and the TB best cumulative-logprob paths
    # survive; a surviving branch whose parent differs adopts the
    # parent's private draft-KV pages (a TB-page copy per depth — the
    # draft is one layer, so this is cheap).  Sampled batches keep
    # root-branched i.i.d. chains: the tree rejection sampler's
    # exactness requires i.i.d. proposals per branch.

    def _eagle_tree_draft_impl(
        self, params, dparams, draft_kv, feats_pool, dpacked, st_packed,
        rng, step,
        *, B, A, P, K, TB, sampled=False,
    ):
        from sglang_tpu.model_executor.forward_batch import DeviceBatch

        ps = self.kv_pool.page_size
        NP = self.kv_pool.geometry.num_pages
        Bb = B * TB
        o = 0
        ext_tokens = dpacked[o : o + B * A].reshape(B, A); o += B * A
        ext_lens = dpacked[o : o + B]; o += B
        base_pos = dpacked[o : o + B]; o += B
        slot_idx = dpacked[o : o + B]; o += B
        src_page = dpacked[o : o + B]; o += B
        page_table = dpacked[o : o + B * P].reshape(B, P); o += B * P
        dst_pages = dpacked[o : o + Bb]; o += Bb
        branch_tables = dpacked[o:].reshape(Bb, P)

        # ---- phase 1: draft-extend over last round's accepted tokens
        # with TRUE target features (canonical page tables) ----
        ji = np.arange(A, dtype=np.int32)[None, :]
        valid = ji < ext_lens[:, None]
        pos = jnp.where(valid, base_pos[:, None] + ji, 0)
        page = jnp.take_along_axis(page_table, pos // ps, axis=1)
        out_slots = jnp.where(valid, page * ps + pos % ps, 0)
        batch = DeviceBatch(
            input_ids=jnp.where(valid, ext_tokens, 0),
            positions=pos,
            seq_lens=jnp.where(ext_lens > 0, base_pos + ext_lens, 0),
            page_table=page_table,
            out_slots=out_slots,
            logits_idx=(
                np.arange(B, dtype=np.int32) * A
                + jnp.maximum(ext_lens - 1, 0)
            ),
        )
        feat_prev = feats_pool[slot_idx][:, :A]
        g, draft_kv = self.eagle.forward(
            dparams, params["embed"], draft_kv, batch, feat_prev,
            num_slots=self.kv_pool.num_slots, page_size=ps,
            attn_backend=self.attn_backend,
        )
        g_last = g.reshape(B * A, -1)[batch.logits_idx]  # [B, H]

        # ---- clone the draft-KV boundary page into every branch page
        # (phase 1 wrote position cached_len into the canonical page;
        # branch chains must see it through their private tables) ----
        src_rep = jnp.clip(jnp.repeat(src_page, TB, axis=0), 0, NP - 1)
        draft_kv = draft_kv.at[dst_pages].set(
            draft_kv[src_rep], mode="drop"
        )

        # ---- phase 2: root branching, then chained draft steps ----
        # Greedy rows branch on the top-b root tokens; sampled rows draw
        # TB i.i.d. root candidates from q0 (the tree rejection sampler's
        # exactness requires i.i.d. proposals — reference
        # reject_sampling.py tree sampling contract) and SAMPLE their
        # chains, recording per-step q logits for chain rejection.
        q0 = self._head_logits(params, g_last[:, None])[:, 0]  # [B, V]
        lsm0 = jax.nn.log_softmax(q0.astype(jnp.float32), axis=-1)
        lp0, top = jax.lax.top_k(lsm0, TB)  # [B, TB]
        d0 = top.astype(jnp.int32)  # [B, TB]
        if sampled:
            st = unpack_sampling_params(st_packed)
            grd = st.temperature <= 0.0
            temp = jnp.where(grd, 1.0, st.temperature)
            rng = jax.random.fold_in(rng, step)
            r0, rng = jax.random.split(rng)
            samp0 = jax.random.categorical(
                r0, (q0.astype(jnp.float32) / temp[:, None])[:, None, :],
                axis=-1, shape=(B, TB),
            ).astype(jnp.int32)
            d0 = jnp.where(grd[:, None], d0, samp0)
            temp_b = jnp.repeat(temp, TB, axis=0)
            grd_b = jnp.repeat(grd, TB, axis=0)
        d0 = d0.reshape(Bb)
        feat0 = jnp.repeat(g_last, TB, axis=0)  # [Bb, H]
        pos0 = jnp.repeat(base_pos + ext_lens, TB, axis=0)  # cached_len+1
        active = jnp.repeat(ext_lens > 0, TB, axis=0)

        if not sampled:
            # ---- per-depth beam branching (greedy batches) ----
            bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
            col_k = jnp.arange(K, dtype=jnp.int32)[None, :]
            # private page ordinals a branch can touch: the boundary
            # page plus the tail pages the K draft positions span
            PRIV = (K + ps - 1) // ps + 1

            def beam(carry, t):
                d, feat, cum, paths, dkv = carry
                p1 = pos0 + t
                pg = jnp.take_along_axis(
                    branch_tables, (p1 // ps)[:, None], axis=1
                )[:, 0]
                slot1 = jnp.where(active, pg * ps + p1 % ps, 0)
                b1 = DeviceBatch(
                    input_ids=d[:, None],
                    positions=jnp.where(active, p1, 0)[:, None],
                    seq_lens=jnp.where(active, p1 + 1, 0),
                    page_table=branch_tables,
                    out_slots=slot1[:, None],
                    logits_idx=np.arange(Bb, dtype=np.int32),
                )
                feat2, dkv = self.eagle.forward(
                    dparams, params["embed"], dkv, b1, feat[:, None],
                    num_slots=self.kv_pool.num_slots, page_size=ps,
                    attn_backend=self.attn_backend,
                )
                feat2 = feat2[:, 0]
                ql = self._head_logits(params, feat2[:, None])[:, 0]
                # record the token this step consumed, then expand
                paths = jnp.where(col_k == t, d[:, None], paths)
                lsm = jax.nn.log_softmax(ql.astype(jnp.float32), axis=-1)
                top_lp, top_tok = jax.lax.top_k(lsm, TB)  # [Bb, TB]
                cand = (cum[:, None] + top_lp).reshape(B, TB * TB)
                # branch 0 stays the PURE GREEDY chain (flat index 0 =
                # parent 0's argmax): force it to rank first so the
                # perfect-draft → full-accept guarantee of chain
                # drafting survives beam pruning; its TRUE cumulative
                # logprob (not the ranking sentinel) carries forward.
                ranked = cand.at[:, 0].set(jnp.inf)
                _, idx = jax.lax.top_k(ranked, TB)  # [B, TB] desc
                val = jnp.take_along_axis(cand, idx, axis=1)
                parent = idx // TB
                rows_par = (bidx * TB + parent).reshape(Bb)
                nd = jnp.take_along_axis(
                    top_tok.reshape(B, TB * TB), idx, axis=1
                ).reshape(Bb).astype(jnp.int32)
                # surviving branches adopt their parent's state
                feat2 = feat2[rows_par]
                paths = paths[rows_par]
                cum = val.reshape(Bb)
                # ... and the parent's private draft-KV pages (shared
                # ordinals copy a page onto itself — a no-op)
                for i in range(PRIV):
                    o = jnp.clip(pos0 // ps + i, 0, P - 1)
                    child_pg = jnp.take_along_axis(
                        branch_tables, o[:, None], axis=1
                    )[:, 0]
                    dkv = dkv.at[child_pg].set(
                        dkv[child_pg[rows_par]], mode="drop"
                    )
                return (nd, feat2, cum, paths, dkv), None

            paths0 = jnp.zeros((Bb, K), jnp.int32)
            (_, _, _, paths, draft_kv), _ = jax.lax.scan(
                beam,
                (d0, feat0, lp0.reshape(Bb), paths0, draft_kv),
                np.arange(K, dtype=np.int32),
            )
            return paths.reshape(B, TB, K), draft_kv

        def chain(carry, t):
            d, feat, dkv, key = carry
            p1 = pos0 + t
            pg = jnp.take_along_axis(
                branch_tables, (p1 // ps)[:, None], axis=1
            )[:, 0]
            slot1 = jnp.where(active, pg * ps + p1 % ps, 0)
            b1 = DeviceBatch(
                input_ids=d[:, None],
                positions=jnp.where(active, p1, 0)[:, None],
                seq_lens=jnp.where(active, p1 + 1, 0),
                page_table=branch_tables,
                out_slots=slot1[:, None],
                logits_idx=np.arange(Bb, dtype=np.int32),
            )
            feat2, dkv = self.eagle.forward(
                dparams, params["embed"], dkv, b1, feat[:, None],
                num_slots=self.kv_pool.num_slots, page_size=ps,
                attn_backend=self.attn_backend,
            )
            feat2 = feat2[:, 0]
            ql = self._head_logits(params, feat2[:, None])[:, 0]  # [Bb, V]
            nd = jnp.argmax(ql, axis=-1).astype(jnp.int32)
            if sampled:
                key, sub = jax.random.split(key)
                samp = jax.random.categorical(
                    sub, ql.astype(jnp.float32) / temp_b[:, None], axis=-1
                ).astype(jnp.int32)
                nd = jnp.where(grd_b, nd, samp)
            return (nd, feat2, dkv, key), (d, ql if sampled else None)

        (_, _, draft_kv, _), ys = jax.lax.scan(
            chain, (d0, feat0, draft_kv, rng), np.arange(K, dtype=np.int32)
        )
        drafts, qls = ys
        drafts = drafts.T.reshape(B, TB, K)
        if sampled:
            # qls[t] is the q distribution AFTER consuming draft t, i.e.
            # the proposal for draft t+1 — chain rejection reads [:, 1:]
            qc = jnp.moveaxis(qls, 0, 2).reshape(B, TB, K, -1)
            qc = jnp.concatenate(
                [jnp.zeros_like(qc[:, :, :1]), qc[:, :, :-1]], axis=2
            )
            return drafts, q0, qc, draft_kv
        return drafts, draft_kv

    def eagle_tree_draft_window(self, dpacked, st_packed, B, A, P, TB,
                                sampled=False):
        key = (B, A, P, TB, sampled)
        fn = self._eagle_tree_draft_fns.get(key)
        if fn is None:
            logger.info(
                "compiling eagle tree draft: B=%d A=%d P=%d TB=%d sampled=%s",
                B, A, P, TB, sampled,
            )
            fn = jax.jit(
                functools.partial(
                    self._eagle_tree_draft_impl,
                    B=B, A=A, P=P, K=self.eagle_k, TB=TB, sampled=sampled,
                ),
                donate_argnums=(2,),
            )
            self._eagle_tree_draft_fns[key] = fn
        self._step_counter += 1
        res = fn(
            self.params, self.eagle_params, self.eagle_kv, self.eagle_feats,
            dpacked, st_packed, self._base_rng, np.int32(self._step_counter),
        )
        if sampled:
            drafts, q0, qc, self.eagle_kv = res
            return np.asarray(drafts).astype(np.int64), q0, qc
        drafts, self.eagle_kv = res
        return np.asarray(drafts).astype(np.int64), None, None

    def _eagle_tree_verify_impl(
        self, params, kv_cache, feats_pool, packed, src_page, dst_pages,
        slot_idx, st_packed, q0, qc, drafts, bootstrap, rng, step,
        *, B, TB, L, P, sampled=False, use_trunc=False,
    ):
        """Target extend over all branch rows + greedy argmax-prefix
        acceptance + per-request winner selection + feature refresh.
        The boundary page clones first so branch tables see the
        committed prefix KV."""
        NP = self.kv_pool.geometry.num_pages
        nl = self.model_config.num_hidden_layers
        Bb = B * TB
        src_rep = jnp.clip(jnp.repeat(src_page, TB, axis=0), 0, NP - 1)
        li = jnp.arange(nl, dtype=jnp.int32)[:, None]
        src_idx = (li * NP + src_rep[None, :]).reshape(-1)
        dst_idx = jnp.where(
            dst_pages[None, :] >= NP, nl * NP, li * NP + dst_pages[None, :]
        ).reshape(-1)
        kv_cache = kv_cache.at[dst_idx].set(
            kv_cache[src_idx], mode="drop"
        )
        batch = unpack_extend_batch(packed, Bb, L, P)
        hidden, kv_cache, feats = self.model.forward(
            params, kv_cache, batch,
            num_slots=self.kv_pool.num_slots,
            page_size=self.kv_pool.page_size,
            attn_backend=self.attn_backend,
            return_all_hidden=True,
            capture_features=True,
            capture_aux_layers=self._eagle_aux_ids,
        )
        logits = self.model.compute_logits(params, hidden).reshape(Bb, L, -1)
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tstar = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [Bb, L]
        lp = jnp.max(lsm, axis=-1)  # [Bb, L]
        ids = batch.input_ids.reshape(Bb, L)
        match = (tstar[:, :-1] == ids[:, 1:]).astype(jnp.int32)
        acc = jnp.cumprod(match, axis=1).sum(axis=1)  # [Bb]
        accB = acc.reshape(B, TB)
        # longest accept wins; ties prefer the most-likely branch (low j)
        score = accB * TB + (TB - 1 - jnp.arange(TB, dtype=jnp.int32))[None]
        winner = jnp.argmax(score, axis=1).astype(jnp.int32)  # [B]
        rows = jnp.arange(B, dtype=jnp.int32) * TB + winner
        w_tokens = tstar[rows]
        w_lp = lp[rows]
        w_acc = accB[jnp.arange(B), winner]
        if sampled:
            # mixed batch: greedy rows keep the argmax-prefix result;
            # sampled rows run tree rejection (root recursion + chain)
            from sglang_tpu.speculative.eagle import tree_rejection_sample

            st = unpack_sampling_params(st_packed)
            trunc = (st.top_p, st.top_k, st.min_p) if use_trunc else None
            s_tok, s_acc, s_win, s_lp = tree_rejection_sample(
                logits.reshape(B, TB, L, -1),
                q0,
                qc,
                drafts,
                st.temperature,
                jax.random.fold_in(jax.random.fold_in(rng, step), 7),
                bootstrap=bootstrap,
                trunc=trunc,
            )
            grd = st.temperature <= 0.0
            winner = jnp.where(grd, winner, s_win)
            rows = jnp.arange(B, dtype=jnp.int32) * TB + winner
            w_tokens = jnp.where(grd[:, None], tstar[rows], s_tok)
            w_lp = jnp.where(grd[:, None], lp[rows], s_lp)
            w_acc = jnp.where(grd, accB[jnp.arange(B), winner], s_acc)
        featsB = feats.reshape(Bb, L, -1)[rows]
        S = feats_pool.shape[0]
        safe_slot = jnp.where(slot_idx >= 0, slot_idx, S)
        feats_pool = feats_pool.at[safe_slot].set(
            featsB.astype(feats_pool.dtype), mode="drop"
        )
        out = jnp.concatenate(
            [
                w_tokens.astype(jnp.float32),
                w_acc[:, None].astype(jnp.float32),
                winner[:, None].astype(jnp.float32),
                w_lp,
            ],
            axis=1,
        )  # [B, 2L+2]
        return out, kv_cache, feats_pool

    def eagle_tree_verify_step(
        self, packed, src_page, dst_pages, slot_idx, B, TB, L, P,
        st_packed=None, q0=None, qc=None, drafts=None, bootstrap=None,
        sampled=False, use_trunc=False,
    ):
        key = (B, TB, L, P, sampled, use_trunc)
        fn = self._eagle_tree_verify_fns.get(key)
        if fn is None:
            logger.info(
                "compiling eagle tree verify: B=%d TB=%d L=%d P=%d sampled=%s",
                B, TB, L, P, sampled,
            )
            fn = jax.jit(
                functools.partial(
                    self._eagle_tree_verify_impl, B=B, TB=TB, L=L, P=P,
                    sampled=sampled, use_trunc=use_trunc,
                ),
                donate_argnums=(1, 2),
            )
            self._eagle_tree_verify_fns[key] = fn
        self._step_counter += 1
        out, self.kv_cache, self.eagle_feats = fn(
            self.params, self.kv_cache, self.eagle_feats, packed,
            src_page.astype(np.int32), dst_pages.astype(np.int32),
            slot_idx.astype(np.int32),
            st_packed
            if st_packed is not None
            else np.zeros((B, 8), np.float32),
            q0 if q0 is not None else np.zeros((1,), np.float32),
            qc if qc is not None else np.zeros((1,), np.float32),
            jnp.asarray(drafts.astype(np.int32))
            if drafts is not None
            else np.zeros((1,), np.int32),
            (bootstrap.astype(np.int32) > 0)
            if bootstrap is not None
            else np.zeros((B,), bool),
            self._base_rng,
            np.int32(self._step_counter),
        )
        out = np.asarray(out)
        tokens = out[:, :L].astype(np.int64)
        accept_len = out[:, L].astype(np.int64)
        winner = out[:, L + 1].astype(np.int64)
        lp = out[:, L + 2 :]
        return tokens, accept_len, winner, lp

    def eagle_verify_step(self, packed, st_packed, q_logits, drafts, slot_idx, bootstrap, B, L, P, use_trunc=False):
        key = (B, L, P, use_trunc)
        fn = self._eagle_verify_fns.get(key)
        if fn is None:
            logger.info(
                "compiling eagle verify: B=%d L=%d P=%d trunc=%s",
                B, L, P, use_trunc,
            )
            fn = jax.jit(
                functools.partial(
                    self._eagle_verify_impl, B=B, L=L, P=P,
                    use_trunc=use_trunc,
                ),
                donate_argnums=(1, 2),
            )
            self._eagle_verify_fns[key] = fn
        self._step_counter += 1
        out, self.kv_cache, self.eagle_feats = fn(
            self.params, self.kv_cache, self.eagle_feats, packed, st_packed,
            q_logits, jnp.asarray(drafts.astype(np.int32)),
            slot_idx.astype(np.int32), bootstrap.astype(np.int32),
            self._base_rng, np.int32(self._step_counter),
        )
        out = np.asarray(out)
        K = L - 1
        tokens = out[:, : K + 1].astype(np.int64)
        accept_len = out[:, K + 1].astype(np.int64)
        lp = out[:, K + 2 :]
        return tokens, accept_len, lp
