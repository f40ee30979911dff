"""Device KV cache pool.

Equivalent role to the reference's ``mem_cache/memory_pool.py``
(``ReqToTokenPool`` :242, ``MHATokenToKVPool`` :1291): owns the HBM-resident
KV buffer and its geometry.  TPU-native differences:

* One fused buffer ``[num_layers * num_pages, page_size, 2,
  kv_heads * head_dim]`` (K at index 0, V at index 1 of dim 2).  The head
  and head_dim axes are FOLDED into one lane axis on purpose: with
  head_dim 64 as a trailing dim, TPU tiled layouts pad the lane dim to
  128 (2x memory waste) and every reshape to a kernel-friendly view
  physically repacks the multi-GiB buffer.  The folded lane axis
  (kv_heads*head_dim, a multiple of 128) is tight, DMA-sliceable by the
  Pallas kernels, and TP-shardable (contiguous head blocks).
* ``req_to_token`` is not a device pool: page tables are assembled host-side
  per step (small [B, P] int32 transfers) — the reference builds the same
  CSR ``kv_indices`` on host for its triton backend
  (``layers/attention/triton_backend.py:682``).
* FP8 KV: buffer dtype float8_e4m3fn with a per-model scale (v1: scale 1.0;
  per-layer scales land with the quant stack).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.utils import cdiv, get_logger

logger = get_logger(__name__)


@dataclass(frozen=True)
class KVCacheGeometry:
    num_layers: int
    num_pages: int  # includes garbage page 0
    page_size: int
    num_kv_heads: int
    head_dim: int
    dtype: object
    # MLA (single latent "head"): the folded lane axis pads up to a
    # multiple of 128 so Mosaic DMA slicing works (e.g. DeepSeek's
    # 512+64=576 latent pads to 640); writers pad, readers slice.
    padded_head_dim: int = 0
    # Decode context parallelism (reference layers/dcp/): pool shape
    # grows a LEADING shard axis [dcp, L*NP/dcp, ps, 2, HD]; global page
    # p lives on shard p % dcp at local index p // dcp.
    dcp_shards: int = 1

    def __post_init__(self):
        if self.padded_head_dim == 0:
            object.__setattr__(self, "padded_head_dim", self.head_dim)

    @property
    def num_slots(self) -> int:
        return self.num_pages * self.page_size

    @property
    def bytes_total(self) -> int:
        itemsize = jnp.dtype(self.dtype).itemsize
        return (
            self.num_layers
            * self.num_slots
            * 2
            * self.num_kv_heads
            * self.padded_head_dim
            * itemsize
        )


def resolve_kv_dtype(kv_cache_dtype: str, model_dtype) -> object:
    if kv_cache_dtype in ("auto", None):
        return model_dtype
    from sglang_tpu.configs.model_config import parse_dtype

    return parse_dtype(kv_cache_dtype)


def compute_num_pages(
    config: ModelConfig,
    page_size: int,
    kv_dtype,
    max_total_tokens: Optional[int],
    hbm_budget_bytes: Optional[int],
    num_kv_layers: Optional[int] = None,
) -> int:
    """Pool sizing: explicit token count, or fill the HBM budget."""
    if max_total_tokens is not None:
        return max(2, cdiv(max_total_tokens, page_size) + 1)
    assert hbm_budget_bytes is not None
    bytes_per_token = (
        (num_kv_layers or config.num_hidden_layers)
        * 2
        * config.num_key_value_heads
        * config.head_dim
        * jnp.dtype(kv_dtype).itemsize
    )
    tokens = max(page_size * 2, hbm_budget_bytes // bytes_per_token)
    return max(2, tokens // page_size + 1)


class KVCachePool:
    def __init__(
        self,
        config: ModelConfig,
        page_size: int,
        kv_cache_dtype: str = "auto",
        max_total_tokens: Optional[int] = None,
        hbm_budget_bytes: Optional[int] = None,
        sharding=None,
        dcp_shards: int = 1,
        num_kv_layers: Optional[int] = None,  # hybrid models: full-attn only
    ):
        kv_dtype = resolve_kv_dtype(kv_cache_dtype, config.dtype)
        num_pages = compute_num_pages(
            config, page_size, kv_dtype, max_total_tokens,
            hbm_budget_bytes, num_kv_layers,
        )
        if dcp_shards > 1:
            num_pages = cdiv(num_pages, dcp_shards) * dcp_shards
        from sglang_tpu.configs.model_config import AttentionArch

        padded_hd = config.head_dim
        if (
            config.attention_arch == AttentionArch.MLA
            and config.num_key_value_heads == 1
        ):
            padded_hd = -(-config.head_dim // 128) * 128
        self.geometry = KVCacheGeometry(
            num_layers=num_kv_layers or config.num_hidden_layers,
            num_pages=num_pages,
            page_size=page_size,
            num_kv_heads=config.num_key_value_heads,
            head_dim=config.head_dim,
            dtype=kv_dtype,
            padded_head_dim=padded_hd,
            dcp_shards=dcp_shards,
        )
        g = self.geometry
        logger.info(
            "KV pool: %d pages x %d tokens (%d layers, %d kv heads, %.2f GiB, %s)",
            g.num_pages,
            g.page_size,
            g.num_layers,
            g.num_kv_heads,
            g.bytes_total / (1 << 30),
            jnp.dtype(g.dtype).name,
        )
        if g.dcp_shards > 1:
            shape = (
                g.dcp_shards,
                g.num_layers * (g.num_pages // g.dcp_shards),
                g.page_size,
                2,
                g.num_kv_heads * g.padded_head_dim,
            )
        else:
            shape = (
                g.num_layers * g.num_pages,
                g.page_size,
                2,
                g.num_kv_heads * g.padded_head_dim,
            )
        if sharding is not None:
            self.kv_cache = jax.device_put(
                jnp.zeros(shape, dtype=g.dtype), sharding
            )
        else:
            self.kv_cache = jnp.zeros(shape, dtype=g.dtype)

    @property
    def num_slots(self) -> int:
        return self.geometry.num_slots

    @property
    def page_size(self) -> int:
        return self.geometry.page_size

    @property
    def usable_pages(self) -> int:
        return self.geometry.num_pages - 1  # minus garbage page
