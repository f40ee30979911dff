"""Speculative decoding: n-gram predictor + verify-path output equivalence."""

import pytest

from sglang_tpu.speculative.ngram import NgramPredictor


def test_ngram_predictor_basic():
    p = NgramPredictor(n=3)
    seq = [1, 2, 3, 1, 2, 3, 1, 2]
    p.update(seq)
    assert p.draft(seq, 4) == [3, 1, 2, 3]
    # incremental update sees new tokens
    seq2 = seq + [9, 9]
    p.update(seq2)
    assert p.draft(seq2, 2) == []  # (9, 9) unseen as (n-1)-gram prefix


def test_ngram_predictor_bigram():
    p = NgramPredictor(n=2)
    seq = [5, 6, 5, 6, 5]
    p.update(seq)
    assert p.draft(seq, 4) == [6, 5, 6, 5]


def _make_engine(spec: bool):
    from tests.conftest import TINY_HF_CONFIG

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path="dummy://tiny",
        tokenizer_path="test:byte",
        load_format="dummy",
        dtype="float32",
        page_size=8,
        max_total_tokens=8192,
        chunked_prefill_size=256,
        speculative_algorithm="NGRAM" if spec else None,
        speculative_num_draft_tokens=4,
    )
    runner = ModelRunner(
        args,
        model_config=ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32"),
    )
    return Engine(server_args=args, model_runner=runner)


def test_spec_outputs_match_baseline():
    """Greedy outputs with NGRAM spec must be IDENTICAL to the plain path
    (greedy verify is exact), with a nonzero acceptance rate on a
    repetitive prompt."""
    base = _make_engine(spec=False)
    spec = _make_engine(spec=True)
    try:
        # repetitive prompt → the dummy model tends to loop → drafts hit
        prompts = [
            [7, 8, 9] * 6,
            list(range(30, 50)),
            [1, 2, 1, 2, 1, 2, 1, 2, 1, 2],
        ]
        sp = {"temperature": 0.0, "max_new_tokens": 24, "ignore_eos": True}
        for ids in prompts:
            o1 = base.generate(input_ids=list(ids), sampling_params=dict(sp))
            o2 = spec.generate(input_ids=list(ids), sampling_params=dict(sp))
            assert o1["output_ids"] == o2["output_ids"], ids[:6]
        st = spec.scheduler.stats()
        assert st["num_spec_drafted"] > 0
        assert 0 < st["num_spec_accepted"] <= st["num_spec_drafted"]
    finally:
        base.shutdown()
        spec.shutdown()


def test_spec_falls_back_for_sampling():
    """temperature>0 requests bypass the verify path (greedy-exact only)."""
    eng = _make_engine(spec=True)
    try:
        out = eng.generate(
            input_ids=[3, 4, 5] * 4,
            sampling_params={
                "temperature": 0.8, "max_new_tokens": 12, "ignore_eos": True,
            },
        )
        assert len(out["output_ids"]) == 12
        assert eng.scheduler.stats()["num_spec_drafted"] == 0
    finally:
        eng.shutdown()
