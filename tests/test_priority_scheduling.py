"""Priority scheduling + routing_key (reference schedule_policy.py:163-171,
scheduler._set_or_validate_priority, Req.priority / routing_key fields)."""

import threading

import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args

from sglang_tpu.core.radix_cache import RadixCache
from sglang_tpu.core.req import Req
from sglang_tpu.core.sampling_params import SamplingParams
from sglang_tpu.core.schedule_policy import SchedulePolicy


def _req(rid, priority=None):
    return Req(rid=rid, input_ids=[1, 2, 3],
               sampling_params=SamplingParams(), priority=priority)


def test_priority_orders_queue_high_first():
    pol = SchedulePolicy("fcfs", RadixCache(4), enable_priority=True)
    q = [_req("a", 1), _req("b", 5), _req("c"), _req("d", 5)]
    pol.calc_priority(q)
    # higher value = higher priority by default; ties keep FCFS order
    assert [r.rid for r in q] == ["b", "d", "a", "c"]


def test_priority_low_values_first():
    pol = SchedulePolicy("fcfs", RadixCache(4), enable_priority=True,
                         low_values_first=True)
    q = [_req("a", 3), _req("b", 1), _req("c", 2)]
    pol.calc_priority(q)
    assert [r.rid for r in q] == ["b", "c", "a"]


def test_priority_off_keeps_policy_order():
    pol = SchedulePolicy("fcfs", RadixCache(4))
    q = [_req("a", 1), _req("b", 9)]
    pol.calc_priority(q)
    assert [r.rid for r in q] == ["a", "b"]


def _engine(**overrides):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(**overrides)
    cfg = ModelConfig.from_hf_dict(
        TINY_HF_CONFIG, model_path="test://tiny", dtype="float32"
    )
    return Engine(
        server_args=args, model_runner=ModelRunner(args, model_config=cfg)
    )


def test_engine_rejects_priority_when_disabled():
    eng = _engine()
    try:
        with pytest.raises(ValueError, match="priority"):
            eng.generate(input_ids=[1, 2, 3], priority=3,
                         sampling_params={"max_new_tokens": 2})
    finally:
        eng.shutdown()


def test_engine_priority_decides_completion_order():
    """max_running_requests=1 => requests run one at a time; a
    higher-priority request submitted later overtakes the queue."""
    eng = _engine(enable_priority_scheduling=True, max_running_requests=1)
    order = []
    lock = threading.Lock()

    def run(tag, prio, n):
        eng.generate(
            input_ids=[7] * 8,
            sampling_params={"temperature": 0.0, "max_new_tokens": n,
                             "ignore_eos": True},
            priority=prio,
        )
        with lock:
            order.append(tag)

    try:
        # head request occupies the engine; low/high queue behind it
        threads = [threading.Thread(target=run, args=("head", 0, 48))]
        threads[0].start()
        import time

        time.sleep(0.3)  # head admitted
        for tag, prio in (("low", 1), ("mid", 2), ("high", 9)):
            threads.append(
                threading.Thread(target=run, args=(tag, prio, 4))
            )
            threads[-1].start()
            time.sleep(0.05)
        for t in threads:
            t.join(timeout=120)
        tail = [t for t in order if t != "head"]
        assert tail == ["high", "mid", "low"], order
    finally:
        eng.shutdown()


def test_dp_controller_routing_key_affinity():
    from sglang_tpu.managers.data_parallel_controller import (
        DataParallelController,
    )

    class _FakeEngine:
        def __init__(self, i):
            self.i = i

    ctl = DataParallelController.__new__(DataParallelController)
    ctl.engines = [_FakeEngine(i) for i in range(4)]
    ctl.policy = "round_robin"
    import itertools

    ctl._rr = itertools.count()
    picks = {ctl._pick(routing_key="user-42").i for _ in range(8)}
    assert len(picks) == 1  # same key -> same replica, always
    spread = {ctl._pick(routing_key=f"u{i}").i for i in range(64)}
    assert len(spread) > 1  # different keys spread out
    rr = [ctl._pick().i for _ in range(4)]
    assert rr == [0, 1, 2, 3]  # no key -> base policy
