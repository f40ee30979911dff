"""Schedule simulator: replay a synthetic workload through the REAL
admission machinery with a device cost model — no TPU needed.

Equivalent role to the reference's scheduler simulation tooling
(``debug_utils``' schedule replay): answer "what do TTFT / retractions /
utilization look like under policy X with budgets Y" offline.  The
simulator drives the production :class:`PrefillAdder`,
:class:`SchedulePolicy` and :class:`NewTokenRatioTracker` — the same
decisions the serving scheduler makes — against a discrete-event clock
where prefill costs ``tokens / prefill_tok_s`` and a fused decode
window costs ``decode_base_s + K · decode_per_tok_s · f(B)``.

Usage::

    from sglang_tpu.debug_utils.sched_sim import Workload, simulate
    report = simulate(
        Workload.poisson(n=64, rate_rps=4.0, prompt_len=512,
                         output_len=128, seed=0),
        policy="lpm", max_total_tokens=64 * 800,
    )
    print(report.summary())
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from sglang_tpu.core.req import Req, ReqStatus
from sglang_tpu.core.sampling_params import SamplingParams
from sglang_tpu.core.schedule_policy import (
    NewTokenRatioTracker,
    PrefillAdder,
    SchedulePolicy,
)
from sglang_tpu.utils import cdiv


@dataclass
class SimRequest:
    arrival: float
    prompt_len: int
    output_len: int
    # filled by the simulation
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None
    retractions: int = 0


@dataclass
class Workload:
    requests: List[SimRequest]

    @staticmethod
    def poisson(n: int, rate_rps: float, prompt_len: int, output_len: int,
                seed: int = 0) -> "Workload":
        rng = np.random.RandomState(seed)
        gaps = rng.exponential(1.0 / rate_rps, size=n)
        t = np.cumsum(gaps)
        return Workload(
            [SimRequest(float(ti), prompt_len, output_len) for ti in t]
        )

    @staticmethod
    def burst(n: int, prompt_len: int, output_len: int) -> "Workload":
        return Workload([SimRequest(0.0, prompt_len, output_len)
                         for _ in range(n)])


@dataclass
class Report:
    ttft: np.ndarray
    e2e: np.ndarray
    retractions: int
    duration: float
    busy_time: float
    num_decode_windows: int
    num_prefill_steps: int

    def summary(self) -> dict:
        def pct(x, p):
            return float(np.percentile(x, p)) if len(x) else 0.0

        return {
            "median_ttft_s": pct(self.ttft, 50),
            "p99_ttft_s": pct(self.ttft, 99),
            "median_e2e_s": pct(self.e2e, 50),
            "duration_s": round(self.duration, 3),
            "utilization": round(
                self.busy_time / max(self.duration, 1e-9), 3
            ),
            "retractions": self.retractions,
            "decode_windows": self.num_decode_windows,
            "prefill_steps": self.num_prefill_steps,
        }


def simulate(
    workload: Workload,
    *,
    policy: str = "fcfs",
    page_size: int = 32,
    max_total_tokens: int = 65536,
    max_prefill_tokens: int = 8192,
    chunked_prefill_size: int = 8192,
    max_running_requests: int = 64,
    decode_window_size: int = 16,
    prefill_tok_s: float = 50_000.0,
    decode_base_s: float = 0.002,
    decode_per_tok_s: float = 0.004 / 64,  # per (K·B) token
    conservativeness: float = 1.0,
) -> Report:
    """Run the workload to completion; returns a :class:`Report`."""
    reqs = sorted(workload.requests, key=lambda r: r.arrival)
    sim_of = {}
    arrivals = []
    for i, sr in enumerate(reqs):
        r = Req(
            rid=f"sim{i}",
            input_ids=[1] * sr.prompt_len,
            sampling_params=SamplingParams(
                max_new_tokens=sr.output_len, ignore_eos=True
            ),
        )
        sim_of[r.rid] = sr
        arrivals.append((sr.arrival, i, r))
    heapq.heapify(arrivals)

    total_pages = cdiv(max_total_tokens, page_size)
    free_pages = total_pages
    waiting: List[Req] = []
    running: List[Req] = []
    chunked: Optional[Req] = None
    from sglang_tpu.core.radix_cache import RadixCache

    pol = SchedulePolicy(policy, radix_cache=RadixCache(page_size))
    tracker = NewTokenRatioTracker(conservativeness)
    now = 0.0
    busy = 0.0
    retractions = 0
    n_windows = 0
    n_prefills = 0

    def pages_of(r: Req) -> int:
        return cdiv(r.cached_len, page_size)

    def admit_arrivals():
        while arrivals and arrivals[0][0] <= now:
            _, _, r = heapq.heappop(arrivals)
            waiting.append(r)

    while arrivals or waiting or running or chunked is not None:
        admit_arrivals()
        if not waiting and not running and chunked is None:
            now = arrivals[0][0]
            continue

        # ---- prefill admission via the PRODUCTION adder ----
        pol.calc_priority(waiting)
        adder = PrefillAdder(
            page_size=page_size,
            free_tokens=free_pages * page_size,
            running_reqs=running,
            new_token_ratio=tracker.ratio,
            max_prefill_tokens=max_prefill_tokens,
            chunked_prefill_size=chunked_prefill_size,
            max_batch_size=max_running_requests - len(running),
        )
        if chunked is not None:
            c, chunked = chunked, None
            if not adder.add_one_req(c) and c not in adder.can_run:
                waiting.insert(0, c)
        for r in list(waiting):
            if adder.chunked_req is not None:
                break
            if not adder.add_one_req(r):
                break
        for r in adder.can_run:
            if r in waiting:
                waiting.remove(r)
        if adder.chunked_req is not None:
            chunked = adder.chunked_req

        if adder.can_run:
            n_new = sum(adder.extend_lens)
            for r, n in zip(adder.can_run, adder.extend_lens):
                before = pages_of(r)
                r.cached_len += n
                free_pages -= pages_of(r) - before
                if r.cached_len >= len(r.fill_ids) and r not in running:
                    r.status = ReqStatus.RUNNING
                    running.append(r)
                    sr = sim_of[r.rid]
                    if sr.first_token_time is None:
                        sr.first_token_time = now + n_new / prefill_tok_s
            dt = n_new / prefill_tok_s
            now += dt
            busy += dt
            n_prefills += 1
            tracker.step()
            continue

        # ---- decode window over the running batch ----
        if running:
            K = decode_window_size
            # memory check + retraction (youngest first), as production
            while True:
                need = sum(
                    max(0, cdiv(r.cached_len + K, page_size) - pages_of(r))
                    for r in running
                )
                if need <= free_pages:
                    break
                if len(running) == 1:
                    K = max(K // 2, 1)
                    if K == 1:
                        break
                    continue
                victim = running.pop()
                free_pages += pages_of(victim)
                victim.cached_len = 0
                sim_of[victim.rid].retractions += 1
                retractions += 1
                tracker.on_retract()
                waiting.insert(0, victim)
            for r in running:
                before = pages_of(r)
                r.cached_len += K
                free_pages -= pages_of(r) - before
            dt = decode_base_s + K * len(running) * decode_per_tok_s
            now += dt
            busy += dt
            n_windows += 1
            tracker.step()
            done = [
                r for r in running
                if r.cached_len
                >= len(r.fill_ids) + sim_of[r.rid].output_len
            ]
            for r in done:
                running.remove(r)
                free_pages += pages_of(r)
                sim_of[r.rid].finish_time = now
            continue

        # idle: jump to the next arrival
        if arrivals:
            now = max(now, arrivals[0][0])

    srs = [sim_of[f"sim{i}"] for i in range(len(reqs))]
    ttft = np.asarray(
        [s.first_token_time - s.arrival for s in srs], np.float64
    )
    e2e = np.asarray([s.finish_time - s.arrival for s in srs], np.float64)
    return Report(
        ttft=ttft, e2e=e2e, retractions=retractions, duration=now,
        busy_time=busy, num_decode_windows=n_windows,
        num_prefill_steps=n_prefills,
    )
