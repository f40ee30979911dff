"""ModelRunner: owns mesh, params, KV pool, and the jitted step functions.

Equivalent role to the reference's ``model_executor/model_runner.py:349``
(initialize :654, forward :3000, sample :3258) — with XLA's compile cache
playing the role of CUDA-graph capture (``runner_backend/``): every
(mode, B, L, P) shape bucket compiles once and replays from cache, so the
scheduler pads batches to bucketed shapes exactly like CUDA-graph batch
sizes.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.core.allocator import PageAllocator
from sglang_tpu.core.memory_pool import KVCachePool
from sglang_tpu.environ import envs
from sglang_tpu.layers.sampler import SamplingTensors, sample
from sglang_tpu.model_executor.forward_batch import DeviceBatch
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
        # Cap context by pool capacity.
        self.max_context_len = min(
            model_config.context_length,
            (self.kv_pool.geometry.num_pages - 1) * self.kv_pool.page_size,
        )
        self.max_pages_per_req = cdiv(self.max_context_len, self.kv_pool.page_size)

        # ---- attention backend ----
        self.attn_backend = self._pick_attn_backend(devices[0])
        logger.info("Attention backend: %s", self.attn_backend)

        # ---- jitted step fns ----
        self._rng = jax.random.PRNGKey(server_args.random_seed)

        self._forward_jit = jax.jit(
            functools.partial(
                self._forward_impl,
                num_slots=self.kv_pool.num_slots,
                page_size=self.kv_pool.page_size,
                attn_backend=self.attn_backend,
            ),
            donate_argnums=(1,),
        )
        self._sample_jit = jax.jit(self._sample_impl)
        self._compiled_shapes = set()

    # ------------------------------------------------------------- backends
    def _pick_attn_backend(self, device) -> str:
        if envs.SGLANG_TPU_FORCE_XLA_ATTENTION.value:
            return "xla"
        if device.platform == "tpu":
            try:
                import sglang_tpu.ops.paged_attention  # noqa: F401

                return "pallas"
            except ImportError:
                return "xla"
        return "xla"

    # ------------------------------------------------------------- impl fns
    def _forward_impl(
        self, params, kv_cache, batch: DeviceBatch, *, num_slots, page_size, attn_backend
    ):
        return self.model.forward(
            params,
            kv_cache,
            batch,
            num_slots=num_slots,
            page_size=page_size,
            attn_backend=attn_backend,
        )

    def _sample_impl(self, params, hidden, st: SamplingTensors, rng):
        logits = self.model.compute_logits(params, hidden)
        tokens, logprobs = sample(logits, st, rng)
        return tokens, logprobs

    # ------------------------------------------------------------- stepping
    def forward(self, batch: DeviceBatch):
        """Run the model; returns last-token hidden states [B, H].

        The KV cache is donated and replaced (in-place on device).
        """
        key = (batch.input_ids.shape, batch.page_table.shape)
        if key not in self._compiled_shapes:
            self._compiled_shapes.add(key)
            logger.info(
                "compiling step: B=%d L=%d P=%d",
                batch.input_ids.shape[0],
                batch.input_ids.shape[1],
                batch.page_table.shape[1],
            )
        hidden, self.kv_cache = self._forward_jit(
            self.params, self.kv_cache, batch
        )
        return hidden

    def sample(self, hidden, st: SamplingTensors):
        self._rng, sub = jax.random.split(self._rng)
        return self._sample_jit(self.params, hidden, st, sub)

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

    # ------------------------------------------------------------- weights
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
