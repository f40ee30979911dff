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
    decode_step_batch,
    unpack_decode_batch,
    unpack_extend_batch,
)
from sglang_tpu.models.registry import get_model_class
from sglang_tpu.parallel.mesh import MeshContext, ParallelConfig
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import cdiv, get_logger, next_power_of_2

logger = get_logger(__name__)

DEFAULT_HBM_BYTES = 16 * (1 << 30)  # v5e


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
            ),
            devices=devices,
        )

        # ---- model + weights ----
        model_cls = get_model_class(model_config)
        self.model = model_cls(model_config, mesh_ctx=self.mesh_ctx)
        from sglang_tpu.model_loader.loader import load_model_weights

        t0 = time.monotonic()
        self.params = load_model_weights(
            self.model, model_config, server_args.load_format, self.mesh_ctx
        )
        logger.info(
            "Weights ready in %.1fs (%.2f GiB)",
            time.monotonic() - t0,
            _params_bytes(self.params) / (1 << 30),
        )

        # ---- KV pool + allocator ----
        hbm_total = _device_hbm_bytes(devices[0]) * server_args.tp_size
        kv_budget = int(
            hbm_total * server_args.mem_fraction_static
            - _params_bytes(self.params)
        )
        kv_budget = max(kv_budget, 1 << 20)
        self.kv_pool = KVCachePool(
            model_config,
            page_size=server_args.page_size,
            kv_cache_dtype=server_args.kv_cache_dtype,
            max_total_tokens=server_args.max_total_tokens,
            hbm_budget_bytes=kv_budget,
            sharding=self.mesh_ctx.kv_cache_sharding
            if not self.mesh_ctx.is_single_device
            else None,
        )
        self.kv_cache = self.kv_pool.kv_cache
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
            # The fused Pallas dequant GEMMs run single-device; under a
            # GSPMD mesh the XLA dequant path partitions correctly.
            model_config.quant_backend = (
                "pallas"
                if devices[0].platform == "tpu"
                and self.mesh_ctx.is_single_device
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
        self._extend_fns: Dict[Tuple, Callable] = {}
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
    def _pick_attn_backend(self, device) -> str:
        if envs.SGLANG_TPU_FORCE_XLA_ATTENTION.value:
            return "xla"
        mc = self.model_config
        from sglang_tpu.configs.model_config import AttentionArch

        if mc.attention_arch == AttentionArch.MLA:
            # MLA attends in latent space with different K/V dims; the
            # GQA kernels don't apply (absorbed-MLA kernel: next round).
            return "xla"
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
            # fp8 VMEM slices need 4-row sublane alignment, which the
            # kernel's [2, HD] K/V write blocks violate; fp8 KV runs on
            # the XLA path until the write kernel grows an fp8 layout.
            logger.info("Pallas attention disabled: fp8 KV cache → xla")
            return "xla"
        if device.platform == "tpu":
            try:
                import sglang_tpu.ops.paged_attention  # noqa: F401

                return "pallas"
            except ImportError:
                return "xla"
        return "xla"

    # ------------------------------------------------------------- impl fns
    def _forward_batch(self, params, kv_cache, batch, lora=None):
        return self.model.forward(
            params,
            kv_cache,
            batch,
            num_slots=self.kv_pool.num_slots,
            page_size=self.kv_pool.page_size,
            attn_backend=self.attn_backend,
            lora=lora,
        )

    def _extend_impl(self, params, kv_cache, packed, st_packed, pen, vmask, lora_tree, adapter_idx, rng, step, *, B, L, P, all_greedy=False, use_pen=False, use_mask=False, use_lora=False, tl_k=0):
        """Prefill chunk: forward + logits + sample, one program."""
        batch = unpack_extend_batch(packed, B, L, P)
        lora = (lora_tree, adapter_idx) if use_lora else None
        hidden, kv_cache = self._forward_batch(params, kv_cache, batch, lora)
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
        return out, kv_cache

    def _decode_impl(self, params, kv_cache, packed, st_packed, pen, vmask, lora_tree, adapter_idx, rng, step, *, B, P, K, all_greedy=False, use_pen=False, use_mask=False, use_lora=False, tl_k=0):
        """K fused decode steps; tokens chain on device via lax.scan."""
        first_tokens, seq_lens0, page_table = unpack_decode_batch(packed, B, P)
        st = unpack_sampling_params(st_packed)
        rng = jax.random.fold_in(rng, step)
        pen_state = None
        if use_pen:
            V = self.model_config.vocab_size
            pen_state = build_penalty_state(pen, V)

        lora = (lora_tree, adapter_idx) if use_lora else None

        def body(carry, k):
            kv, tokens, pstate = carry
            batch = decode_step_batch(
                tokens, seq_lens0, page_table, k, self.kv_pool.page_size
            )
            hidden, kv = self._forward_batch(params, kv, batch, lora)
            logits = self.model.compute_logits(params, hidden)
            if use_pen:
                counts, appeared = pstate
                logits = apply_penalties(logits, counts, appeared, st)
            if use_mask:
                # Grammar batches run K=1 windows (the mask depends on the
                # host-side FSM state after every token).
                logits = apply_vocab_mask(logits, vmask)
            logits = suppress_eos(
                logits, st.min_new_remaining - k, self._eos_mask
            )
            new_tokens, logprobs = sample(
                logits, st, jax.random.fold_in(rng, k), all_greedy=all_greedy
            )
            if use_pen:
                pstate = update_penalty_state(counts, appeared, new_tokens)
            if tl_k > 0:
                tv, ti = jax.lax.approx_max_k(
                    logits, tl_k, recall_target=1.0
                )
                lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
                extra = (tv - lse, ti)
            else:
                extra = (jnp.zeros((B, 0)), jnp.zeros((B, 0), jnp.int32))
            return (kv, new_tokens, pstate), (new_tokens, logprobs, extra)

        (kv_cache, _, _), (all_tokens, all_logprobs, tl) = jax.lax.scan(
            body,
            (kv_cache, first_tokens, pen_state),
            np.arange(K, dtype=np.int32),
        )
        out = jnp.stack(
            [all_tokens.astype(jnp.float32), all_logprobs]
        )  # [2, K, B]
        if tl_k > 0:
            # tl = (vals [K, B, k], ids [K, B, k])
            out = (out, tl[0], tl[1].astype(jnp.float32))
        return out, kv_cache

    def _verify_impl(self, params, kv_cache, packed, rng, step, *, B, L, P):
        """Speculative verify: one extend forward over [last_token, drafts],
        greedy logits at EVERY position (reference ForwardMode.TARGET_VERIFY,
        speculative/eagle_worker_v2.py:1538 — chain drafts, greedy accept)."""
        batch = unpack_extend_batch(packed, B, L, P)
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
        served via ``is_embedding`` + ``layers/pooler.py``)."""
        batch = unpack_extend_batch(packed, B, L, P)
        hidden, kv_cache = self._forward_batch(params, kv_cache, batch)
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
        batch = unpack_extend_batch(packed, B, L, P)
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
    def _get_extend_fn(self, B, L, P, all_greedy, use_pen, use_mask, use_lora=False, tl_k=0):
        key = (B, L, P, all_greedy, use_pen, use_mask, use_lora, tl_k)
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
                    use_mask=use_mask, use_lora=use_lora, tl_k=tl_k,
                ),
                donate_argnums=(1,),
            )
            self._extend_fns[key] = fn
        return fn

    def _get_decode_fn(self, B, P, K, all_greedy, use_pen, use_mask, use_lora=False, tl_k=0):
        key = (B, P, K, all_greedy, use_pen, use_mask, use_lora, tl_k)
        fn = self._decode_fns.get(key)
        if fn is None:
            logger.info(
                "compiling decode: B=%d P=%d K=%d greedy=%s pen=%s mask=%s",
                B, P, K, all_greedy, use_pen, use_mask,
            )
            fn = jax.jit(
                functools.partial(
                    self._decode_impl,
                    B=B, P=P, K=K, all_greedy=all_greedy, use_pen=use_pen,
                    use_mask=use_mask, use_lora=use_lora, tl_k=tl_k,
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
        tl_k: int = 0,
    ):
        """Run a prefill chunk; returns (tokens [B] i64, logprobs [B] f32,
        top_logprobs or None)."""
        self._step_counter += 1
        # Static greedy hint: padded rows have temperature 0 by construction.
        fn = self._get_extend_fn(
            B, L, P, bool((st_packed[:, 0] <= 0).all()), pen is not None,
            vmask is not None, adapter_idx is not None, tl_k,
        )
        out, self.kv_cache = fn(
            self.params,
            self.kv_cache,
            packed,
            st_packed,
            pen if pen is not None else np.zeros((B, 1, 2), np.int32),
            vmask if vmask is not None else np.zeros((B, 1), np.uint32),
            self._lora_tree() if adapter_idx is not None else {},
            adapter_idx if adapter_idx is not None else np.zeros((B,), np.int32),
            self._base_rng,
            np.int32(self._step_counter),
        )
        out = np.asarray(out)
        tokens, logprobs = out[0].astype(np.int64), out[1]
        toplp = None
        if tl_k > 0:
            toplp = (
                out[2 + tl_k:].T.astype(np.int64),  # ids [B, k]
                out[2: 2 + tl_k].T,  # vals [B, k]
            )
        return tokens, logprobs, toplp

    def decode_window(
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
    ):
        """Run K fused decode steps; returns (tokens [K, B],
        logprobs [K, B], top_logprobs or None)."""
        self._step_counter += 1
        fn = self._get_decode_fn(
            B, P, K, bool((st_packed[:, 0] <= 0).all()), pen is not None,
            vmask is not None, adapter_idx is not None, tl_k,
        )
        out, self.kv_cache = fn(
            self.params,
            self.kv_cache,
            packed,
            st_packed,
            pen if pen is not None else np.zeros((B, 1, 2), np.int32),
            vmask if vmask is not None else np.zeros((B, 1), np.uint32),
            self._lora_tree() if adapter_idx is not None else {},
            adapter_idx if adapter_idx is not None else np.zeros((B,), np.int32),
            self._base_rng,
            np.int32(self._step_counter),
        )
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
    def _page_rows(self, pages, pad_to: int) -> np.ndarray:
        # Padding rows use a POSITIVE one-past-the-end sentinel: JAX
        # normalizes negative indices before the OOB check, so a -1
        # sentinel under .at[].set(mode="drop") would silently write the
        # last row of the pool instead of being dropped.
        g = self.kv_pool.geometry
        oob = g.num_layers * g.num_pages
        arr = np.full((pad_to,), -1, np.int64)
        arr[: len(pages)] = pages
        rows = np.where(
            arr[None, :] >= 0,
            np.arange(g.num_layers)[:, None] * g.num_pages + arr[None, :],
            oob,
        )
        return rows.ravel()  # [L * pad_to], oob = padding

    def extract_pages(self, pages) -> np.ndarray:
        """Fetch whole pages (all layers) to host: [n, L, ps, 2, HD]."""
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

    def inject_pages(self, pages, data: np.ndarray) -> None:
        """Write host page slabs [n, L, ps, 2, HD] into the device pool."""
        from sglang_tpu.utils import next_power_of_2

        n = len(pages)
        pad = next_power_of_2(n)
        g = self.kv_pool.geometry
        if pad != n:
            padding = np.zeros((pad - n,) + data.shape[1:], data.dtype)
            data = np.concatenate([data, padding], axis=0)
        rows = self._page_rows(pages, pad)
        vals = data.transpose(1, 0, 2, 3, 4).reshape(
            g.num_layers * pad, *self.kv_cache.shape[1:]
        )
        key = ("inject", pad)
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
