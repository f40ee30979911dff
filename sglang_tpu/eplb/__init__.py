"""Expert-placement load balancing (EPLB).

Equivalent role to the reference's ``eplb/`` (``eplb_manager.py:16``,
``expert_distribution.py`` routing-count recording,
``expert_location.py`` physical↔logical remap, ``eplb_algorithms/``):
with expert parallelism, hot experts should spread across ranks so each
shard sees similar load.

TPU-native mechanics: expert placement is a PERMUTATION of the stacked
expert weight tensors' expert axis plus the matching gate-column
permutation — applying it is a pure device reshuffle, and routing is
unchanged because the gate columns move with the weights.  Rebalancing
= greedy longest-processing-time assignment of experts to ranks by
recorded load (the reference's rebalance algorithms reduce to the same
core for the replication-free case).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class ExpertDistributionRecorder:
    """Accumulates per-layer expert routing counts
    (reference expert_distribution.py)."""

    def __init__(self, num_layers: int, num_experts: int):
        self.counts = np.zeros((num_layers, num_experts), np.int64)

    def record(self, layer: int, expert_counts: np.ndarray):
        self.counts[layer] += np.asarray(expert_counts, np.int64)

    def reset(self):
        self.counts[:] = 0


def balanced_placement(counts: np.ndarray, ep: int) -> np.ndarray:
    """Greedy LPT assignment: experts (sorted by load, heaviest first) go
    to the currently lightest rank; returns perm [L, E] such that
    ``weights[:, perm[l]]`` places experts contiguously per rank with
    balanced per-rank load (reference eplb_algorithms/deepseek.py core).
    """
    L, E = counts.shape
    assert E % ep == 0
    per_rank = E // ep
    perm = np.zeros((L, E), np.int64)
    for layer in range(L):
        order = np.argsort(-counts[layer], kind="stable")
        rank_load = np.zeros(ep, np.int64)
        rank_members: List[List[int]] = [[] for _ in range(ep)]
        for e in order:
            # lightest rank with room
            cand = sorted(
                (r for r in range(ep) if len(rank_members[r]) < per_rank),
                key=lambda r: (rank_load[r], r),
            )[0]
            rank_members[cand].append(int(e))
            rank_load[cand] += counts[layer, e]
        flat: List[int] = []
        for r in range(ep):
            flat.extend(rank_members[r])
        perm[layer] = np.asarray(flat)
    return perm


def placement_imbalance(counts: np.ndarray, perm: np.ndarray, ep: int) -> float:
    """max/mean per-rank load under a placement (1.0 = perfect)."""
    L, E = counts.shape
    per_rank = E // ep
    worst = 0.0
    for layer in range(L):
        loads = counts[layer][perm[layer]].reshape(ep, per_rank).sum(axis=1)
        mean = max(loads.mean(), 1e-9)
        worst = max(worst, float(loads.max() / mean))
    return worst


def apply_expert_permutation(params: Dict, perm: np.ndarray,
                             layer_key: str = "layers") -> Dict:
    """Permute stacked MoE params (moe_w1/w3/w2 expert axis + moe_gate
    columns + optional gate_bias) by ``perm`` [L, E]; outputs are
    IDENTICAL because the gate columns move with their experts
    (reference expert_location_updater)."""
    import jax.numpy as jnp

    def permute_tree(tree):
        out = dict(tree)
        layers = dict(tree[layer_key])
        p = jnp.asarray(perm)
        li = jnp.arange(p.shape[0])[:, None]
        for name in ("moe_w1", "moe_w3", "moe_w2",
                     "moe_w1_scale", "moe_w3_scale", "moe_w2_scale"):
            if name in layers:
                layers[name] = layers[name][li, p]
        if "moe_gate" in layers:  # [L, H, E] — permute columns
            layers["moe_gate"] = jnp.take_along_axis(
                layers["moe_gate"], p[:, None, :], axis=2
            )
        if "gate_bias" in layers:  # [L, E]
            layers["gate_bias"] = jnp.take_along_axis(
                layers["gate_bias"], p, axis=1
            )
        out[layer_key] = layers
        return out

    return permute_tree(params)
