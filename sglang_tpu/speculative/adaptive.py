"""Adaptive speculative draft depth.

Reference role: ``speculative/adaptive_spec_params.py`` +
``adaptive_runtime_state.py`` — tune the number of draft steps at
runtime from observed acceptance, per decode-batch-size tier: at small
batch the chip has idle FLOPs and deep drafting wins even at modest
acceptance; at large batch every rejected draft is wasted work, so the
depth steps down (to 0 = drafting disabled) unless acceptance stays
high.

TPU note: every candidate depth is its own jitted (draft, verify)
program bucket, so candidates should be FEW and are capped at the
engine's configured depth (the draft feature pools are sized for it at
init).  Depth changes land between rounds — no device state migrates.

Mechanics (mirrors the reference contract):
  * EMA over per-verify mean accepted-draft counts.
  * Re-decide every ``update_interval`` observations after a warmup.
  * Step DOWN one tier when the EMA drops below (lower_candidate - 0.5
    + down_hysteresis); step UP when it exceeds (current - 0.5 +
    up_hysteresis).  A 0-depth tier re-probes the smallest positive
    depth at each decision point.
"""

from __future__ import annotations

import bisect
import logging
from typing import Dict, List, Optional, Sequence

logger = logging.getLogger(__name__)

# batch-size tier -> candidate draft depths (subset <= configured k is
# used; see AdaptiveSpecParams.__init__)
DEFAULT_TIERS: Dict[int, List[int]] = {
    1: [1, 3, 7],
    8: [0, 1, 3],
    32: [0, 1],
    64: [0],
}


class _TierSlot:
    def __init__(self, k0: int, candidates: Sequence[int], *,
                 ema_alpha: float, update_interval: int,
                 warmup: int, up_hysteresis: float,
                 down_hysteresis: float):
        self.candidates = sorted(set(candidates))
        self.ema_alpha = ema_alpha
        self.update_interval = update_interval
        self.warmup = warmup
        self.up_hysteresis = up_hysteresis
        self.down_hysteresis = down_hysteresis
        self.k = (
            k0 if k0 in self.candidates
            else self.candidates[len(self.candidates) // 2]
        )
        self.ema = float(max(self.k - 1, 0))
        self.n = 0

    def observe(self, mean_accept: float) -> bool:
        """Feed one verify round's mean accept count; True if k changed."""
        if self.k > 0:
            self.ema = (
                (1 - self.ema_alpha) * self.ema
                + self.ema_alpha * mean_accept
            )
        self.n += 1
        if self.n <= self.warmup:
            return False
        if (self.n - self.warmup) % self.update_interval != 0:
            return False
        return self._decide()

    def _decide(self) -> bool:
        old = self.k
        idx = self.candidates.index(old)
        if old == 0:
            # a disabled tier has no acceptance signal: periodically
            # re-probe the smallest positive candidate
            idx = min(idx + 1, len(self.candidates) - 1)
            target = self.candidates[idx]
            if target > 0:
                self.ema = float(target - 1)
            return self._apply(target)
        while idx > 0:
            lower = self.candidates[idx - 1]
            drop_at = (0.5 if lower == 0 else lower - 0.5)
            drop_at += self.down_hysteresis
            if self.ema <= drop_at:
                idx -= 1
            else:
                break
        if self.candidates[idx] == old:  # didn't move down: try up
            while idx < len(self.candidates) - 1:
                if self.ema > self.candidates[idx] - 0.5 + self.up_hysteresis:
                    idx += 1
                else:
                    break
        return self._apply(self.candidates[idx])

    def _apply(self, target: int) -> bool:
        if target == self.k:
            return False
        logger.info(
            "adaptive spec: depth %d -> %d (ema_accept=%.2f)",
            self.k, target, self.ema,
        )
        self.k = target
        return True


class AdaptiveSpecParams:
    """Routes a decode batch size to its tier's current draft depth."""

    def __init__(self, k_max: int,
                 tiers: Optional[Dict[int, List[int]]] = None, *,
                 ema_alpha: float = 0.2, update_interval: int = 5,
                 warmup: int = 10, up_hysteresis: float = 0.0,
                 down_hysteresis: float = -0.25):
        tiers = tiers if tiers is not None else DEFAULT_TIERS
        self._bs: List[int] = sorted(tiers)
        self._slots: Dict[int, _TierSlot] = {}
        for bs in self._bs:
            cands = [min(c, k_max) for c in tiers[bs]]
            self._slots[bs] = _TierSlot(
                min(k_max, max(cands)), cands,
                ema_alpha=ema_alpha, update_interval=update_interval,
                warmup=warmup, up_hysteresis=up_hysteresis,
                down_hysteresis=down_hysteresis,
            )

    def _slot(self, batch_size: int) -> _TierSlot:
        i = bisect.bisect_right(self._bs, max(batch_size, self._bs[0])) - 1
        return self._slots[self._bs[i]]

    def k_for(self, batch_size: int) -> int:
        """Current draft depth for this batch size (0 = spec off)."""
        return self._slot(batch_size).k

    def observe(self, batch_size: int,
                accept_lens: Sequence[int]) -> bool:
        """Feed one verify round's per-request accepted-draft counts."""
        if not len(accept_lens):
            return False
        mean = float(sum(accept_lens)) / len(accept_lens)
        return self._slot(batch_size).observe(mean)
