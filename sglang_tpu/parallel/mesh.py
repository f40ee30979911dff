"""Device mesh + named-axis parallelism context.

TPU-native replacement for the reference's ``distributed/parallel_state.py``
(``GroupCoordinator`` per parallel dim, ``initialize_model_parallel``
parallel_state.py:1979).  On TPU there are no process groups to manage:
a single :class:`jax.sharding.Mesh` with named axes ``(dp, pp, tp)`` (and
``ep`` folded over ``tp`` for MoE) expresses every parallel dimension, and
XLA inserts the collectives.  This module owns mesh construction and the
canonical :class:`~jax.sharding.PartitionSpec` vocabulary used by layers.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

# Canonical axis names.
AXIS_DP = "dp"  # data parallel (replica) — batch-sharded
AXIS_PP = "pp"  # pipeline parallel — layer-sharded (stage loops)
AXIS_CP = "cp"  # context parallel — prefill sequence-sharded (zigzag)
AXIS_TP = "tp"  # tensor parallel — head/feature-sharded; also EP axis for MoE


@dataclass(frozen=True)
class ParallelConfig:
    tp_size: int = 1
    dp_size: int = 1
    pp_size: int = 1
    ep_size: int = 1  # experts sharded over the tp axis (ep_size must divide tp*dp)
    # prefill context parallelism (reference layers/cp/ zigzag): long
    # prompts sequence-shard over a dedicated mesh axis
    cp_size: int = 1
    # DP-attention (reference layers/dp_attention.py:103): attention runs
    # data-parallel (weights replicated over tp, batch sharded over dp)
    # while the MLP is tensor-parallel over the FUSED (dp, tp) axes; GSPMD
    # inserts the gather/reduce-scatter at the layer boundary
    # (reference layers/communicator.py:192 ScatterMode transitions).
    dp_attention: bool = False
    # EP token dispatch via ragged all-to-all (reference
    # layers/moe/token_dispatcher/deepep.py) instead of replicate+psum
    moe_a2a: bool = False
    # Decode context parallelism (reference layers/dcp/): KV PAGES shard
    # over the tp axis (page p lives on rank p % tp), attention weights
    # replicate, each rank attends over its local pages and partials
    # merge by log-sum-exp.  Scales KV capacity per request past one
    # shard's HBM — the head axis can't shard below one kv head.
    dcp: bool = False
    # pp micro-batch wavefront count (0 = auto: pp_size); 1 serializes
    pp_microbatches: int = 0

    @property
    def world_size(self) -> int:
        return self.tp_size * self.dp_size * self.pp_size * self.cp_size


class MeshContext:
    """Holds the mesh and the canonical shardings for model/KV tensors."""

    def __init__(
        self,
        parallel: ParallelConfig,
        devices: Optional[Sequence[jax.Device]] = None,
    ):
        self.parallel = parallel
        if devices is None:
            devices = jax.devices()
        n_needed = parallel.world_size
        if len(devices) < n_needed:
            raise ValueError(
                f"Need {n_needed} devices for parallel config {parallel}, "
                f"have {len(devices)}"
            )
        dev_array = np.asarray(devices[:n_needed]).reshape(
            parallel.dp_size, parallel.pp_size, parallel.cp_size,
            parallel.tp_size,
        )
        self.mesh = Mesh(dev_array, (AXIS_DP, AXIS_PP, AXIS_CP, AXIS_TP))
        logger.info(
            "Mesh: dp=%d pp=%d cp=%d tp=%d over %d devices (%s)",
            parallel.dp_size,
            parallel.pp_size,
            parallel.cp_size,
            parallel.tp_size,
            n_needed,
            devices[0].platform,
        )

    # ---------------------------------------------------------------- specs
    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @cached_property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    # Weight shardings (Megatron-style TP; reference layers/linear.py:291,1339)
    @cached_property
    def col_parallel(self) -> NamedSharding:
        """[in, out] weight with out-features sharded (column parallel)."""
        return self.sharding(None, AXIS_TP)

    @cached_property
    def row_parallel(self) -> NamedSharding:
        """[in, out] weight with in-features sharded (row parallel)."""
        return self.sharding(AXIS_TP, None)

    @cached_property
    def vocab_parallel(self) -> NamedSharding:
        """[vocab, hidden] embedding sharded on vocab."""
        return self.sharding(AXIS_TP, None)

    # KV cache: [layers*pages, page_size, 2, kv_heads*head_dim] — the folded
    # lane axis shards into contiguous per-head blocks across tp.
    @cached_property
    def kv_cache_sharding(self) -> NamedSharding:
        if self.parallel.dcp:
            # DCP pool [tp, L*NP_local, ps, 2, Hkv*D]: the leading shard
            # axis maps page p -> rank p % tp (striped ownership, so an
            # in-order allocator balances pages across ranks for free).
            return self.sharding(AXIS_TP, None, None, None, None)
        # Under pp, the [L*NP, ...] row axis shards by stage (layer rows
        # are contiguous per layer, so stage boundaries are page-aligned).
        row_ax = AXIS_PP if self.parallel.pp_size > 1 else None
        return self.sharding(row_ax, None, None, AXIS_TP)

    # Activations: tokens replicated across tp, hidden replicated (GSPMD
    # decides intermediates); batch sharded over dp when dp>1.
    @cached_property
    def activation_sharding(self) -> NamedSharding:
        return self.sharding()

    @property
    def tp_size(self) -> int:
        return self.parallel.tp_size

    @property
    def is_single_device(self) -> bool:
        return self.parallel.world_size == 1


def build_mesh_context(
    tp_size: int = 1,
    dp_size: int = 1,
    pp_size: int = 1,
    ep_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshContext:
    return MeshContext(
        ParallelConfig(
            tp_size=tp_size, dp_size=dp_size, pp_size=pp_size, ep_size=ep_size
        ),
        devices=devices,
    )
