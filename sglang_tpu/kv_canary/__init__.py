"""KV-corruption canary + scheduler memory-invariant checks.

Equivalent role to the reference's ``kv_canary/`` sanitizer
(``kv_canary/api.py:30`` install_canary — shadow canary buffers, a token
oracle recomputing expected writes, perturb kernels for self-test) and
the scheduler memory invariant checker
(``managers/scheduler_components/invariant_checker.py``).

TPU-native approach: instead of shadow buffers, the canary keeps a
device-computed **per-page checksum** of the paged KV pool.  Between two
checks, only pages the scheduler legitimately wrote (running requests'
tails, injected transfers) may change — any other changed page is
cross-request KV corruption, exactly the failure class the paged write
path can produce.  A perturb hook flips bits in an arbitrary page so
tests can prove the canary catches it.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class KVCanary:
    """Page-checksum sanitizer over a ModelRunner's paged KV pool."""

    def __init__(self, runner):
        self.runner = runner
        import functools

        import jax
        import jax.numpy as jnp

        @jax.jit
        def page_checksums(kv):
            # [L*NP, ps, 2, HD] → [L*NP] f32 sum (cheap, one pass)
            if isinstance(kv, dict):  # double-sparsity / hybrid-SWA
                kv = kv["kv"]
            return jnp.sum(
                kv.astype(jnp.float32), axis=(1, 2, 3)
            )

        self._checksum_fn = page_checksums
        self._baseline: Optional[np.ndarray] = None
        self.violations: List[dict] = []

    def snapshot(self) -> np.ndarray:
        return np.asarray(self._checksum_fn(self.runner.kv_cache))

    def arm(self):
        """Record the baseline checksums."""
        self._baseline = self.snapshot()

    def check(self, allowed_pages: Set[int]) -> List[dict]:
        """Compare against the baseline; pages outside ``allowed_pages``
        (page ids, layer-agnostic) whose checksum changed are violations.
        Re-arms on return."""
        assert self._baseline is not None, "arm() the canary first"
        now = self.snapshot()
        g = self.runner.kv_pool.geometry
        changed_rows = np.nonzero(now != self._baseline)[0]
        new = []
        for row in changed_rows:
            page = int(row % g.num_pages)
            layer = int(row // g.num_pages)
            if page in allowed_pages or page == 0:  # page 0 absorbs padding
                continue
            new.append({"layer": layer, "page": page})
        self.violations.extend(new)
        self._baseline = now
        return new

    def perturb(self, page: int, layer: int = 0, scale: float = 3.14):
        """Fault injection: corrupt one page (reference perturb kernels —
        the self-test proving the canary actually fires)."""
        import jax.numpy as jnp

        g = self.runner.kv_pool.geometry
        row = layer * g.num_pages + page
        kv = self.runner.kv_cache
        self.runner.kv_cache = kv.at[row].add(
            jnp.asarray(scale, kv.dtype)
        )


def scheduler_allowed_pages(scheduler) -> Set[int]:
    """Pages the scheduler may legitimately write right now: every page
    of every live request (tail writes land inside owned pages) plus
    free pages (garbage writes to freed pages are device-order-safe —
    see the chained-window design in core/scheduler.py)."""
    allowed: Set[int] = set()
    for req in scheduler.reqs_by_rid.values():
        allowed.update(req.pages)
    if scheduler.chunked_req is not None:
        allowed.update(scheduler.chunked_req.pages)
    allowed.update(scheduler.allocator.free_pages_view())
    return allowed


def check_memory_invariants(scheduler) -> List[str]:
    """Scheduler memory invariants (reference invariant_checker.py):
    no page owned by two live requests; every live page is allocated;
    allocator accounting is consistent.  Returns violation strings."""
    problems: List[str] = []
    owner: Dict[int, str] = {}
    live = list(scheduler.reqs_by_rid.values())
    if scheduler.chunked_req is not None and (
        scheduler.chunked_req not in live
    ):
        live.append(scheduler.chunked_req)
    free = set(scheduler.allocator.free_pages_view())
    for req in live:
        if req.finished:
            continue
        shared = req.prefix_pages_len  # radix-shared prefix may be shared
        for j, p in enumerate(req.pages):
            if j < getattr(req, "swa_freed", 0):
                # freed behind the sliding window: the stale table entry
                # is masked out of attention and no longer owned
                continue
            if p in free:
                problems.append(f"page {p} of {req.rid} is on the free list")
            if j >= shared:
                if p in owner:
                    problems.append(
                        f"page {p} owned by both {owner[p]} and {req.rid}"
                    )
                owner[p] = req.rid
    total = scheduler.allocator.num_pages
    if len(free) > total:
        problems.append(
            f"free list {len(free)} exceeds pool {total}"
        )
    return problems
