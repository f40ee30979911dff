"""Hybrid-SWA split KV pools (Gemma-2/3-class mixed sliding/full stacks).

Sliding-window layers page into their own SMALL pool whose pages free
back to a dedicated allocator as the window moves past them, while
full-attention layers keep the whole history — so a long generation on
a hybrid model holds ~window KV for its sliding layers instead of the
entire context.  Reference: mem_cache/allocator/swa.py:20
(SWATokenToKVPoolAllocator), mem_cache/swa_radix_cache.py.
"""

import numpy as np
import pytest

# Gemma-2 convention: sliding window on EVEN layers (pattern period 2).
TINY_G2_HF = {
    "architectures": ["Gemma2ForCausalLM"],
    "model_type": "gemma2",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "sliding_window": 32,
    "query_pre_attn_scalar": 16,
    "attn_logit_softcapping": 50.0,
    "final_logit_softcapping": 30.0,
    "hidden_act": "gelu_pytorch_tanh",
    "bos_token_id": 256,
    "eos_token_id": 257,
    "tie_word_embeddings": True,
}


def _engine(**overrides):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import make_server_args

    kw = dict(
        model_path="dummy://tiny-g2",
        disable_radix_cache=True,
        page_size=4,
        max_total_tokens=2048,
        chunked_prefill_size=64,
        max_running_requests=4,
    )
    kw.update(overrides)
    args = make_server_args(**kw)
    cfg = ModelConfig.from_hf_dict(
        TINY_G2_HF, model_path="dummy://tiny-g2", dtype="float32"
    )
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def test_hybrid_swa_pattern_detection():
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.models.gemma import Gemma2ForCausalLM

    cfg = ModelConfig.from_hf_dict(TINY_G2_HF, dtype="float32")
    m = Gemma2ForCausalLM(cfg)
    assert m.hybrid_swa_pattern() == (True, False)


def test_hybrid_swa_engages_and_matches_unified():
    """Token + logprob exact vs the unified-pool engine (the split
    changes WHERE sliding layers' KV lives, not what attention sees)."""
    e_h = _engine()
    e_u = _engine(disable_hybrid_swa=True)
    try:
        assert e_h.scheduler.runner.hybrid_swa is not None
        assert e_h.scheduler._hybrid_swa
        assert isinstance(e_h.scheduler.runner.kv_cache, dict)
        assert "swa" in e_h.scheduler.runner.kv_cache
        # split pool covers only the sliding half of the stack
        g = e_h.scheduler.runner.swa_pool.geometry
        assert g.num_layers == 2
        assert e_h.scheduler.runner.kv_pool.geometry.num_layers == 2
        assert e_u.scheduler.runner.hybrid_swa is None

        rng = np.random.RandomState(0)
        prompt = rng.randint(1, 250, size=100).tolist()  # > chunk, > window
        sp = {
            "temperature": 0.0, "max_new_tokens": 48, "ignore_eos": True,
            "return_logprob": True,
        }
        oh = e_h.generate(input_ids=list(prompt), sampling_params=dict(sp))
        ou = e_u.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert oh["output_ids"] == ou["output_ids"], (
            oh["output_ids"], ou["output_ids"])
        lh = [t[0] for t in oh["meta_info"]["output_token_logprobs"]]
        lu = [t[0] for t in ou["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(lh, lu, rtol=2e-4, atol=2e-4)
    finally:
        e_h.shutdown()
        e_u.shutdown()


def test_hybrid_swa_frees_pages_mid_generation():
    """The r04 VERDICT done-criterion: swa pages return to the pool
    DURING a long hybrid-model generation (full pages stay owned)."""
    eng = _engine()
    sched = eng.scheduler
    try:
        freed_events = []
        orig_sweep = sched._swa_sweep

        def spy_sweep():
            before = sched.swa_allocator.num_free_pages
            orig_sweep()
            gained = sched.swa_allocator.num_free_pages - before
            if gained > 0:
                freed_events.append(gained)

        sched._swa_sweep = spy_sweep
        swa_total0 = sched.swa_allocator.num_free_pages
        main_total0 = sched.allocator.num_free_pages
        prompt = [(3 * i) % 250 + 1 for i in range(40)]
        out = eng.generate(
            input_ids=prompt,
            sampling_params={
                "temperature": 0.0, "max_new_tokens": 96,
                "ignore_eos": True,
            },
        )
        assert len(out["output_ids"]) == 96
        # window 32, page 4: ~ (40 + 96 - 32)/4 = 26 pages swept back
        # mid-run (chunk boundaries shift the exact count)
        assert sum(freed_events) >= 16, freed_events
        # everything returns to both pools at the end
        assert sched.swa_allocator.num_free_pages == swa_total0
        assert sched.allocator.num_free_pages == main_total0
    finally:
        eng.shutdown()


def test_hybrid_swa_batch_matches_unified():
    """Concurrent mixed-length requests through chunked prefill + the
    chained decode windows stay exact under the split pools."""
    e_h = _engine()
    e_u = _engine(disable_hybrid_swa=True)
    try:
        prompts = [
            [(7 * i + j) % 250 + 1 for j in range(20 + 37 * i)]
            for i in range(3)
        ]
        sp = {"temperature": 0.0, "max_new_tokens": 40, "ignore_eos": True}
        oh = e_h.generate(
            input_ids=[list(p) for p in prompts], sampling_params=dict(sp)
        )
        ou = e_u.generate(
            input_ids=[list(p) for p in prompts], sampling_params=dict(sp)
        )
        assert [o["output_ids"] for o in oh] == [
            o["output_ids"] for o in ou
        ]
    finally:
        e_h.shutdown()
        e_u.shutdown()
