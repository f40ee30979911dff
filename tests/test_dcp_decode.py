"""Decode context parallelism in the SERVING path (reference layers/dcp/).

KV pages shard over the tp axis — page p lives on rank p % tp — with
attention weights replicated and per-rank flash partials merged by LSE.
Long-context KV capacity then scales with the mesh instead of one
shard's HBM (the reference's motivation: MLA / few-kv-head models can't
shard the head axis below one head).
"""

import jax
import numpy as np
import pytest

from tests.conftest import make_server_args, make_tiny_config


def _engine(**overrides):
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(**overrides)
    runner = ModelRunner(args, model_config=make_tiny_config())
    return Engine(server_args=args, model_runner=runner)


@pytest.fixture(scope="module")
def dcp_engines():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    e_dcp = _engine(tp_size=4, enable_dcp=True)
    e_ref = _engine()
    yield e_dcp, e_ref
    e_dcp.shutdown()
    e_ref.shutdown()


def test_dcp_pool_is_page_sharded(dcp_engines):
    e_dcp, _ = dcp_engines
    runner = e_dcp.scheduler.runner
    g = runner.kv_pool.geometry
    assert g.dcp_shards == 4
    assert g.num_pages % 4 == 0
    # leading shard axis, one slice per tp rank
    assert runner.kv_cache.shape[0] == 4
    spec = runner.kv_cache.sharding.spec
    assert spec[0] == "tp", spec


def test_dcp_greedy_parity(dcp_engines):
    e_dcp, e_ref = dcp_engines
    prompt = [(7 * i) % 250 + 1 for i in range(57)]
    sp = {"temperature": 0.0, "max_new_tokens": 24, "ignore_eos": True,
          "return_logprob": True}
    od = e_dcp.generate(input_ids=prompt, sampling_params=sp)
    orf = e_ref.generate(input_ids=prompt, sampling_params=sp)
    assert od["output_ids"] == orf["output_ids"]
    ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
    lr = [t[0] for t in orf["meta_info"]["output_token_logprobs"]]
    np.testing.assert_allclose(ld, lr, rtol=1e-4, atol=1e-4)


def test_dcp_batch_and_chunked_prefill(dcp_engines):
    """Multiple requests with prompts spanning several pages (chunked
    prefill engages at 64 tokens) stay token-exact under DCP."""
    e_dcp, e_ref = dcp_engines
    prompts = [
        [(11 * i + j * 3) % 250 + 1 for j in range(90 + 13 * i)]
        for i in range(4)
    ]
    sp = {"temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True}
    od = e_dcp.generate(input_ids=prompts, sampling_params=sp)
    orf = e_ref.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(od, orf):
        assert a["output_ids"] == b["output_ids"]


def test_dcp_pages_stripe_across_ranks(dcp_engines):
    """An in-order allocation balances page ownership across ranks."""
    e_dcp, _ = dcp_engines
    sched = e_dcp.scheduler
    prompt = [(3 * i) % 250 + 1 for i in range(200)]
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    e_dcp.generate(input_ids=prompt, sampling_params=sp)
    m = sched.radix.match_prefix(prompt)
    owners = np.asarray([p % 4 for p in m.pages])
    # ~200/4=50 pages over 4 ranks: every rank owns some
    assert len(set(owners.tolist())) == 4, owners


def test_dcp_rejects_unsupported_combos():
    from sglang_tpu.server_args import ServerArgs

    with pytest.raises(ValueError):
        ServerArgs(model_path="x", tp_size=1, enable_dcp=True)
    with pytest.raises(ValueError):
        ServerArgs(model_path="x", tp_size=2, enable_dcp=True, pp_size=2)
    with pytest.raises(ValueError):
        ServerArgs(model_path="x", tp_size=2, enable_dcp=True,
                   kv_cache_dtype="float8_e4m3")


def test_dcp_pallas_partial_kernel_matches_xla(monkeypatch):
    """With 128-aligned KV lanes + SGLANG_TPU_INTERPRET_PALLAS, DCP
    decode runs the per-rank Pallas partial kernel (owner-predicated
    page DMAs, fused KV write, unnormalized (acc, m, l) merged by the
    LSE psum pair) — token-exact vs the XLA DCP path AND the plain
    engine."""
    from tests.conftest import make_server_args, make_tiny_config

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    def build(force_xla):
        if force_xla:
            monkeypatch.setenv("SGLANG_TPU_FORCE_XLA_ATTENTION", "1")
            monkeypatch.delenv("SGLANG_TPU_INTERPRET_PALLAS",
                               raising=False)
        else:
            monkeypatch.delenv("SGLANG_TPU_FORCE_XLA_ATTENTION",
                               raising=False)
            monkeypatch.setenv("SGLANG_TPU_INTERPRET_PALLAS", "1")
        args = make_server_args(tp_size=4, enable_dcp=True)
        cfg = make_tiny_config(head_dim=64, hidden_size=128)
        runner = ModelRunner(args, model_config=cfg)
        return Engine(server_args=args, model_runner=runner)

    prompt = [(7 * i) % 250 + 1 for i in range(57)]
    sp = {"temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True,
          "return_logprob": True}
    ep = build(force_xla=False)
    try:
        op = ep.generate(input_ids=list(prompt), sampling_params=dict(sp))
    finally:
        ep.shutdown()
    ex = build(force_xla=True)
    try:
        ox = ex.generate(input_ids=list(prompt), sampling_params=dict(sp))
    finally:
        ex.shutdown()
    assert op["output_ids"] == ox["output_ids"], (
        op["output_ids"], ox["output_ids"])
    lp = [t[0] for t in op["meta_info"]["output_token_logprobs"]]
    lx = [t[0] for t in ox["meta_info"]["output_token_logprobs"]]
    np.testing.assert_allclose(lp, lx, rtol=1e-3, atol=1e-3)
