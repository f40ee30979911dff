"""Waiting-queue ordering policies + prefill admission control.

Equivalent role to the reference's ``managers/schedule_policy.py``
(policies :139–151, LPM>128 fallback :230, ``PrefillAdder`` :433 with
admission math at :968–1006).
"""

from __future__ import annotations

import random
from typing import List, Optional

from sglang_tpu.core.radix_cache import RadixCache
from sglang_tpu.core.req import Req
from sglang_tpu.environ import envs
from sglang_tpu.utils import cdiv, get_logger

logger = get_logger(__name__)

# LPM degrades to FCFS beyond this queue depth (reference :230).
LPM_FALLBACK_THRESHOLD = 128


class SchedulePolicy:
    def __init__(
        self,
        policy: str,
        radix_cache: RadixCache,
        enable_priority: bool = False,
        low_values_first: bool = False,
    ):
        self.policy = policy
        self.radix_cache = radix_cache
        # reference schedule_policy.py:163-171 — priority orders the
        # queue FIRST; the base policy breaks ties (stable sort)
        self.enable_priority = enable_priority
        self.priority_sign = 1 if low_values_first else -1

    def calc_priority(self, waiting_queue: List[Req]):
        """Reorder the waiting queue in place; also refreshes each request's
        radix prefix match (cheap, host-side)."""
        policy = self.policy
        if policy in ("lpm", "dfs-weight") and len(waiting_queue) > LPM_FALLBACK_THRESHOLD:
            policy = "fcfs"

        if policy == "random":
            random.shuffle(waiting_queue)
        elif policy == "lof":  # longest output first
            waiting_queue.sort(
                key=lambda r: -r.sampling_params.max_new_tokens
            )
        elif policy in ("lpm", "dfs-weight"):
            prefix_lens = {}
            for r in waiting_queue:
                m = self.radix_cache.match_prefix(r.origin_input_ids)
                prefix_lens[r.rid] = m.matched_tokens
            waiting_queue.sort(key=lambda r: -prefix_lens[r.rid])
        elif policy != "fcfs":
            raise ValueError(f"Unknown policy {self.policy!r}")

        if self.enable_priority:
            # stable: equal priorities keep the base policy's order
            waiting_queue.sort(
                key=lambda r: self.priority_sign * (r.priority or 0)
            )


class NewTokenRatioTracker:
    """Expected decode-length fraction, decayed per step and bumped on
    retraction (reference scheduler_components/new_token_ratio_tracker.py:14)."""

    def __init__(self, conservativeness: float = 1.0):
        self.init_ratio = min(
            envs.SGLANG_TPU_INIT_NEW_TOKEN_RATIO.value * conservativeness, 1.0
        )
        self.min_ratio = (
            self.init_ratio * envs.SGLANG_TPU_MIN_NEW_TOKEN_RATIO_FACTOR.value
        )
        steps = envs.SGLANG_TPU_NEW_TOKEN_RATIO_DECAY_STEPS.value
        self.decay = (self.init_ratio - self.min_ratio) / max(steps, 1)
        self.ratio = self.init_ratio

    def step(self):
        self.ratio = max(self.ratio - self.decay, self.min_ratio)

    def on_retract(self):
        self.ratio = self.init_ratio


class PrefillAdder:
    """Admits waiting requests into a prefill batch under token/memory
    budgets; overflow becomes the chunked request (reference :433, :968)."""

    def __init__(
        self,
        page_size: int,
        free_tokens: int,  # allocator free + radix evictable (in tokens)
        running_reqs: List[Req],
        new_token_ratio: float,
        max_prefill_tokens: int,
        chunked_prefill_size: int,
        max_batch_size: int,
    ):
        self.page_size = page_size
        self.new_token_ratio = new_token_ratio
        self.rem_input_tokens = max_prefill_tokens
        self.chunked_prefill_size = chunked_prefill_size
        self.max_batch_size = max_batch_size
        clip = envs.SGLANG_TPU_CLIP_MAX_NEW_TOKENS.value
        # Budget the running batch's projected decode growth.
        running_growth = sum(
            min(r.remaining_new_tokens(), clip) * new_token_ratio
            for r in running_reqs
        )
        self.rem_total_tokens = free_tokens - running_growth
        self.can_run: List[Req] = []
        self.extend_lens: List[int] = []
        self.chunked_req: Optional[Req] = None

    def add_one_req(self, req: Req) -> bool:
        """Try to admit; returns False when budgets are exhausted
        (stop iterating the waiting queue)."""
        if len(self.can_run) >= self.max_batch_size:
            return False
        clip = envs.SGLANG_TPU_CLIP_MAX_NEW_TOKENS.value
        extend_len = req.extend_len
        chunk = extend_len
        if self.chunked_prefill_size > 0:
            chunk = min(chunk, self.chunked_prefill_size)
        chunk = min(chunk, self.rem_input_tokens)
        # Page-align chunks except the final one (so mid-prefill KV stays
        # cacheable at page granularity).
        if chunk < extend_len:
            chunk = chunk // self.page_size * self.page_size
        if chunk <= 0:
            return False

        is_chunked = chunk < extend_len
        projected = (
            chunk
            + (0 if is_chunked else min(req.remaining_new_tokens(), clip) * self.new_token_ratio)
            + self.page_size
        )
        if projected > self.rem_total_tokens:
            return False

        self.can_run.append(req)
        self.extend_lens.append(chunk)
        self.rem_input_tokens -= chunk
        self.rem_total_tokens -= projected
        if is_chunked:
            self.chunked_req = req
            return False  # chunked request closes the batch (reference :1006)
        return True
