"""End-to-end engine tests with dummy weights + byte tokenizer.

Mirrors the reference's kit style (python/sglang/test/kits/
basic_decode_correctness_kit.py, cache_hit_kit.py): behavioral assertions
against a live engine, hermetic (no model downloads).
"""

import pytest

from sglang_tpu.core.sampling_params import SamplingParams


def test_greedy_determinism(tiny_engine):
    sp = {"temperature": 0.0, "max_new_tokens": 12, "ignore_eos": True}
    out1 = tiny_engine.generate(prompt="hello world", sampling_params=sp)
    out2 = tiny_engine.generate(prompt="hello world", sampling_params=sp)
    assert out1["output_ids"] == out2["output_ids"]
    assert len(out1["output_ids"]) == 12
    assert out1["meta_info"]["completion_tokens"] == 12
    assert out1["meta_info"]["finish_reason"]["type"] == "length"


def test_radix_cache_hit_on_second_request(tiny_engine):
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    prompt = "the quick brown fox jumps over the lazy dog"
    out1 = tiny_engine.generate(prompt=prompt, sampling_params=sp)
    assert out1["meta_info"]["cached_tokens"] == 0
    out2 = tiny_engine.generate(prompt=prompt, sampling_params=sp)
    # page_size=4; prompt is 43 bytes → at least 40 cached tokens
    assert out2["meta_info"]["cached_tokens"] >= 36
    assert out1["output_ids"] == out2["output_ids"]  # cache must not change results


def test_batch_generate(tiny_engine):
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    prompts = [f"prompt number {i}" for i in range(5)]
    outs = tiny_engine.generate(prompt=prompts, sampling_params=sp)
    assert len(outs) == 5
    for o in outs:
        assert len(o["output_ids"]) == 6
    # batched results equal solo results (continuous batching correctness)
    solo = tiny_engine.generate(prompt=prompts[3], sampling_params=sp)
    assert solo["output_ids"] == outs[3]["output_ids"]


def test_streaming(tiny_engine):
    sp = {"temperature": 0.0, "max_new_tokens": 10, "ignore_eos": True}
    chunks = list(
        tiny_engine.generate(prompt="stream me", sampling_params=sp, stream=True)
    )
    assert chunks[-1]["finished"]
    assert len(chunks[-1]["output_ids"]) == 10
    # output_ids grow monotonically
    lens = [len(c["output_ids"]) for c in chunks]
    assert lens == sorted(lens)


def test_stop_token(tiny_engine):
    sp0 = {"temperature": 0.0, "max_new_tokens": 12, "ignore_eos": True}
    base = tiny_engine.generate(prompt="abc", sampling_params=sp0)
    stop_tok = base["output_ids"][4]
    sp = {
        "temperature": 0.0,
        "max_new_tokens": 12,
        "ignore_eos": True,
        "stop_token_ids": [stop_tok],
    }
    out = tiny_engine.generate(prompt="abc", sampling_params=sp)
    assert out["output_ids"][-1] == stop_tok
    assert len(out["output_ids"]) <= 5 + 1
    assert out["meta_info"]["finish_reason"]["type"] == "stop"


def test_chunked_prefill_long_prompt(tiny_engine):
    # chunked_prefill_size=64 → a 300-byte prompt takes 5 chunks
    sp = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}
    long_prompt = "x" * 300
    out = tiny_engine.generate(prompt=long_prompt, sampling_params=sp)
    assert len(out["output_ids"]) == 4
    assert out["meta_info"]["prompt_tokens"] == 300
    # same result as the identical request again (which now hits the cache)
    out2 = tiny_engine.generate(prompt=long_prompt, sampling_params=sp)
    assert out2["output_ids"] == out["output_ids"]
    assert out2["meta_info"]["cached_tokens"] > 200


def test_concurrent_mixed_lengths(tiny_engine):
    import threading

    results = {}

    def worker(i):
        sp = {"temperature": 0.0, "max_new_tokens": 4 + i, "ignore_eos": True}
        results[i] = tiny_engine.generate(
            prompt=f"worker {i} " * (i + 1), sampling_params=sp
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):
        assert len(results[i]["output_ids"]) == 4 + i


def test_abort(tiny_engine):
    sp = {"temperature": 0.0, "max_new_tokens": 100000, "ignore_eos": True}
    it = tiny_engine.generate(
        prompt="never ending", sampling_params=sp, stream=True, rid="abort-me"
    )
    first = next(it)
    tiny_engine.abort_request("abort-me")
    chunks = list(it)
    assert chunks[-1]["finished"]


def test_scheduler_crash_does_not_hang(tiny_engine):
    """A crashed scheduler loop must abort in-flight requests, not hang
    callers (regression: a jit compile error left generate() blocked)."""
    import pytest

    eng = tiny_engine
    # Sanity: engine works.
    out = eng.generate(
        input_ids=[1, 2, 3],
        sampling_params={"temperature": 0.0, "max_new_tokens": 2, "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 2

    # Inject a fault into the runner: next window raises.
    real = eng.scheduler.runner.decode_window

    def boom(*a, **k):
        raise RuntimeError("injected fault")

    eng.scheduler.runner.decode_window = boom
    eng.scheduler.runner.extend_step = boom
    try:
        out = eng.generate(
            input_ids=[7, 8, 9],
            sampling_params={
                "temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True,
            },
        )
        # Request must come back aborted (not hang).
        assert out["meta_info"]["finish_reason"]["type"] == "abort"
        # Scheduler is now dead: new submissions raise.
        with pytest.raises(RuntimeError):
            eng.generate(input_ids=[1], sampling_params={"max_new_tokens": 1})
    finally:
        eng.scheduler.runner.decode_window = real


def test_inject_pages_non_power_of_2_does_not_corrupt_last_row(tiny_engine):
    """Regression: padding rows in inject_pages used a -1 sentinel, which
    JAX normalizes to the LAST row before the mode='drop' OOB check —
    silently zeroing the last page of the last layer on every
    non-power-of-2 injection (hicache promote / PD adopt)."""
    import numpy as np

    runner = tiny_engine.scheduler.runner
    g = runner.kv_pool.geometry
    # poison-mark the last row of the pool
    last = g.num_layers * g.num_pages - 1
    import jax.numpy as jnp
    runner.kv_cache = runner.kv_cache.at[last].set(7.0)
    before = np.asarray(runner.kv_cache[last]).copy()
    # inject 3 pages (pads to 4) into pages 1..3
    data = np.random.RandomState(0).randn(
        3, g.num_layers, *runner.kv_cache.shape[1:]
    ).astype(np.float32)
    runner.inject_pages([1, 2, 3], data)
    after = np.asarray(runner.kv_cache[last])
    np.testing.assert_array_equal(before, after)
    # and the real pages did land
    got = runner.extract_pages([1, 2, 3])
    np.testing.assert_allclose(got, data, rtol=1e-6)


def test_flush_cache_waits_for_idle(tiny_engine):
    """flush_cache must not reset radix/allocator while requests hold
    pages; it runs on the scheduler thread once idle."""
    import threading

    results = {}

    def gen():
        results["out"] = tiny_engine.generate(
            "a b c d e f g h", {"max_new_tokens": 12, "temperature": 0.0}
        )

    t = threading.Thread(target=gen)
    t.start()
    ok = tiny_engine.flush_cache(timeout=30.0)
    t.join(timeout=30.0)
    assert ok
    assert results["out"]["meta_info"]["finish_reason"] is not None
    # after flush the allocator is fully free
    sched = tiny_engine.scheduler
    assert not sched.running.reqs and not sched.waiting


def test_stream_holds_back_partial_stop_string(tiny_engine):
    """A stop string split across stream updates must never be partially
    surfaced: every streamed prefix must not contain any prefix of the
    stop string at its tail beyond the holdback window."""
    stop = "zzqq"
    chunks = []
    for out in tiny_engine.generate(
        "a b c", {"max_new_tokens": 8, "temperature": 0.0, "stop": [stop]},
        stream=True,
    ):
        chunks.append(out["text"])
    # cumulative text snapshots must be monotonically extending
    for a, b in zip(chunks, chunks[1:]):
        assert b.startswith(a)
    final = chunks[-1]
    assert stop not in final
    # unfinished snapshots are held back by len(stop)-1 chars
    for c, out_is_last in zip(chunks, [False] * (len(chunks) - 1) + [True]):
        if not out_is_last:
            assert len(c) <= max(0, len(final) + len(stop) - 1)


def test_input_embeds_splice_matches_token_embedding(tiny_engine):
    """Feeding a token's own embedding row through the multimodal splice
    path must reproduce the plain-token output exactly."""
    import numpy as np

    runner = tiny_engine.scheduler.runner
    embed = np.asarray(runner.params["embed"]).astype(np.float32)
    prompt = [5, 9, 2, 7, 1, 3]
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    base = tiny_engine.generate(input_ids=list(prompt), sampling_params=dict(sp))

    # replace tokens 2 and 4 with sentinel ids + their own embed rows
    from sglang_tpu.core.req import Req
    state = tiny_engine._make_req(None, list(prompt), dict(sp), False, None)
    req = state.req
    req.fill_ids[2] = -1
    req.fill_ids[4] = -2
    req.input_embeds = np.stack([embed[prompt[2]], embed[prompt[4]]])
    tiny_engine.scheduler.add_request(req)
    out = tiny_engine._wait_final(state)
    assert out["output_ids"] == base["output_ids"], (
        out["output_ids"], base["output_ids"])


def test_pdmux_prefill_overlaps_decode_windows(tiny_engine):
    """A request arriving mid-decode admits WITHOUT draining the
    in-flight decode windows first (PD multiplexing, reference
    multiplex/): the prefill extend dispatches behind the windows and
    both finish correctly."""
    import threading

    eng = tiny_engine
    results = {}

    def gen(name, prompt, n):
        results[name] = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": n, "temperature": 0.0,
                             "ignore_eos": True},
        )

    t1 = threading.Thread(
        target=gen, args=("long", [5, 9, 203, 17], 64)
    )
    t1.start()
    import time as _t

    _t.sleep(0.15)  # let decode windows get in flight
    t2 = threading.Thread(target=gen, args=("late", [7, 7, 7, 2], 8))
    t2.start()
    t1.join(timeout=60)
    t2.join(timeout=60)
    assert len(results["long"]["output_ids"]) == 64
    assert len(results["late"]["output_ids"]) == 8
    # determinism: same prompts solo give identical outputs
    solo = eng.generate(
        input_ids=[7, 7, 7, 2],
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert solo["output_ids"] == results["late"]["output_ids"]


def test_two_batch_overlap_exact():
    """--enable-two-batch-overlap: a prefill batch splits into two
    async-dispatched micro-batches; outputs match the unsplit engine
    token-for-token."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import TINY_HF_CONFIG, make_server_args

    def make(tbo):
        args = make_server_args(
            enable_two_batch_overlap=tbo, tbo_token_threshold=16,
            chunked_prefill_size=256, max_prefill_tokens=1024,
        )
        cfg = ModelConfig.from_hf_dict(
            TINY_HF_CONFIG, model_path="dummy://tiny", dtype="float32"
        )
        return Engine(
            server_args=args,
            model_runner=ModelRunner(args, model_config=cfg),
        )

    e0 = make(False)
    e1 = make(True)
    try:
        prompts = [list(range(3, 23)), list(range(40, 55)),
                   [7, 8, 9, 10], list(range(100, 130))]
        sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
        o0 = e0.generate(input_ids=prompts, sampling_params=sp)
        o1 = e1.generate(input_ids=prompts, sampling_params=sp)
        assert [o["output_ids"] for o in o0] == [
            o["output_ids"] for o in o1
        ]
        assert getattr(e1.scheduler, "num_tbo_splits", 0) >= 1
    finally:
        e0.shutdown()
        e1.shutdown()


def test_chained_window_depth_parity_long_generation():
    """Regression: with >=3 decode windows in flight over a generation,
    the surviving windows' depths must rebase after every fetch — stale
    depths made window N+2 dispatch with its position base one K-token
    block too far (skipping a block of KV), which only manifests past
    ~3 windows (short generations never caught it)."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import TINY_HF_CONFIG, make_server_args

    outs = {}
    for depth in (1, 3):
        args = make_server_args(disable_radix_cache=True)
        runner = ModelRunner(
            args,
            model_config=ModelConfig.from_hf_dict(
                TINY_HF_CONFIG, dtype="float32"
            ),
        )
        eng = Engine(server_args=args, model_runner=runner)
        eng.scheduler._chain_depth = depth
        try:
            outs[depth] = eng.generate(
                input_ids=[(3 * i) % 500 + 1 for i in range(8)],
                sampling_params={"temperature": 0.0, "max_new_tokens": 96,
                                 "ignore_eos": True},
            )["output_ids"]
        finally:
            eng.shutdown()
    assert outs[1] == outs[3]
