"""Elastic EP: expert DRAM backups + rank-fault re-placement.

Equivalent role to the reference's ``elastic_ep/elastic_ep.py`` +
``expert_backup_manager.py`` and ``model_runner.py:3050-3057``
(``_maybe_rebalance_after_rank_fault``): with expert parallelism, a
failed rank takes its expert shard with it.  Recovery needs (1) a host
(DRAM) copy of the expert weights to restore from, and (2) a new
placement of all E experts over the surviving ranks.

TPU-native notes: EP shards ride a mesh axis under GSPMD, so "losing a
rank" means re-building the mesh over the surviving devices and
re-``device_put``-ing the expert stacks — the backup manager provides
the host tensors, :func:`placement_for_rank_fault` the new layout.  The
placement keeps every expert exactly once (no replication) and balances
recorded load over ``ep - len(failed)`` survivor groups by greedy LPT.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

EXPERT_LEAVES = ("moe_w1", "moe_w3", "moe_w2", "moe_gate", "gate_bias",
                 "moe_w1_scale", "moe_w3_scale", "moe_w2_scale")


class ExpertBackupManager:
    """Host (DRAM) snapshot of the stacked MoE expert tensors
    (reference expert_backup_manager.py)."""

    def __init__(self, layer_key: str = "layers"):
        self.layer_key = layer_key
        self.backup: Dict[str, np.ndarray] = {}

    def refresh(self, params: Dict) -> int:
        """Snapshot the expert leaves to host memory; returns bytes."""
        layers = params.get(self.layer_key, {})
        total = 0
        for name in EXPERT_LEAVES:
            if name in layers:
                arr = np.asarray(layers[name])
                self.backup[name] = arr
                total += arr.nbytes
        logger.info(
            "expert backup: %d tensors, %.2f GiB host",
            len(self.backup), total / (1 << 30),
        )
        return total

    def restore(self, params: Dict) -> Dict:
        """Return params with the expert leaves replaced from backup
        (device placement is the caller's job — shardings depend on the
        post-fault mesh)."""
        import jax.numpy as jnp

        out = dict(params)
        layers = dict(out[self.layer_key])
        for name, arr in self.backup.items():
            layers[name] = jnp.asarray(arr)
        out[self.layer_key] = layers
        return out


def placement_for_rank_fault(
    counts: np.ndarray,  # [L, E] recorded per-expert load
    ep: int,
    failed_ranks: Sequence[int],
) -> tuple:
    """New expert placement after losing ``failed_ranks``: returns
    (perm [L, E'], ep') where E' pads E up to a multiple of ep'
    (padding entries repeat the lightest experts — they only pad the
    shard shape, routing never selects them twice) and ``perm`` lists
    experts grouped per survivor rank, balanced by greedy LPT."""
    L, E = counts.shape
    survivors = ep - len(set(failed_ranks))
    if survivors < 1:
        raise ValueError("no surviving ranks")
    per_rank = -(-E // survivors)
    Ep = per_rank * survivors
    perm = np.zeros((L, Ep), np.int64)
    for layer in range(L):
        order = np.argsort(-counts[layer])  # heaviest first
        loads = np.zeros(survivors, np.float64)
        fill: List[List[int]] = [[] for _ in range(survivors)]
        for e in order:
            # lightest rank with remaining capacity
            cand = sorted(
                (r for r in range(survivors) if len(fill[r]) < per_rank),
                key=lambda r: loads[r],
            )[0]
            fill[cand].append(int(e))
            loads[cand] += counts[layer][e]
        # pad short ranks by repeating their lightest expert (shape-only)
        flat: List[int] = []
        for r in range(survivors):
            row = fill[r]
            while len(row) < per_rank:
                row.append(row[-1] if row else 0)
            flat.extend(row)
        perm[layer] = flat
    return perm, survivors
