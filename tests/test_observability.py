"""Request tracing + profiler control."""

import numpy as np
import pytest

from tests.conftest import make_server_args, make_tiny_config


def test_request_spans_recorded():
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(enable_request_tracing=True)
    runner = ModelRunner(args, model_config=make_tiny_config())
    eng = Engine(server_args=args, model_runner=runner)
    try:
        out = eng.generate(
            input_ids=[1, 2, 3, 4],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0,
                             "ignore_eos": True},
            rid="traced-req",
        )
        spans = eng._tracer.export("traced-req")
        assert len(spans) == 1
        s = spans[0]
        assert s["name"] == "request"
        assert s["attributes"]["prompt_tokens"] == 4
        assert s["attributes"]["completion_tokens"] == 5
        assert s["duration_ms"] is not None and s["duration_ms"] > 0
    finally:
        eng.shutdown()


def test_profiler_controller(tmp_path, tiny_engine):
    prof = tiny_engine.profiler
    out = prof.start(output_dir=str(tmp_path / "prof"))
    assert prof.active
    tiny_engine.generate(
        input_ids=[5, 6, 7],
        sampling_params={"max_new_tokens": 3, "temperature": 0.0,
                         "ignore_eos": True},
    )
    prof.stop()
    assert not prof.active
    import os
    assert os.path.isdir(out)
    with pytest.raises(RuntimeError):
        prof.stop()
