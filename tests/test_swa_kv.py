"""SWA KV freeing (reference mem_cache/allocator/swa.py SWATokenToKVPool
role): pure sliding-window models free pages fully behind the window
mid-request, so long generations hold ~window KV instead of the whole
history — and outputs are bit-identical (those pages were masked)."""

import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args

SWA_HF = dict(TINY_HF_CONFIG, sliding_window=16)


def _engine(**overrides):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(**overrides)
    cfg = ModelConfig.from_hf_dict(
        SWA_HF, model_path="test://tiny", dtype="float32"
    )
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def test_swa_frees_pages_behind_window():
    eng = _engine(disable_radix_cache=True)
    try:
        sched = eng.scheduler
        assert sched._swa_window == 16
        free0 = sched.allocator.num_free_pages
        out = eng.generate(
            input_ids=[(7 * i) % 500 + 1 for i in range(8)],
            sampling_params={"temperature": 0.0, "max_new_tokens": 64,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 64
        # everything returned to the pool at finish (no double frees)
        assert sched.allocator.num_free_pages == free0
    finally:
        eng.shutdown()


def test_swa_peak_usage_bounded_and_output_identical():
    """Peak in-use pages stay near the window instead of the full
    context; disabling the radix is what arms freeing, so the reference
    engine keeps radix off too for identical scheduling."""
    import threading

    eng = _engine(disable_radix_cache=True)
    ref = _engine(disable_radix_cache=True)
    ref.scheduler._swa_window = 0  # freeing off -> full-history KV
    try:
        peak = {"swa": 0, "ref": 0}
        stop = threading.Event()

        def watch():
            a, b = eng.scheduler.allocator, ref.scheduler.allocator
            while not stop.is_set():
                peak["swa"] = max(
                    peak["swa"], a.num_pages - 1 - a.num_free_pages
                )
                peak["ref"] = max(
                    peak["ref"], b.num_pages - 1 - b.num_free_pages
                )

        t = threading.Thread(target=watch)
        t.start()
        prompt = [(3 * i) % 500 + 1 for i in range(8)]
        sp = {"temperature": 0.0, "max_new_tokens": 96, "ignore_eos": True}
        o1 = eng.generate(input_ids=list(prompt), sampling_params=dict(sp))
        o2 = ref.generate(input_ids=list(prompt), sampling_params=dict(sp))
        stop.set()
        t.join()
        assert o1["output_ids"] == o2["output_ids"]
        # 8+96 = 104 tokens -> ~26 pages full-history (the watcher thread
        # samples, so it can undercount slightly); window 16 + chained
        # decode-window slack keeps the SWA engine well below it
        assert peak["ref"] >= 16, peak
        assert peak["swa"] <= peak["ref"] - 4, peak
    finally:
        eng.shutdown()
        ref.shutdown()


def test_swa_not_armed_with_radix_or_mixed_windows():
    eng = _engine()  # radix on
    try:
        assert eng.scheduler._swa_window == 0
    finally:
        eng.shutdown()
