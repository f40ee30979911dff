"""PP micro-batch wavefront (GPipe schedule in one jitted program).

Reference analogue: ``managers/scheduler_pp_mixin.py:68`` event_loop_pp —
stage s runs micro-batch t-s at tick t.  TPU-native: the schedule is a
``lax.scan`` over ticks inside a shard_map manual over the pp axis, with
``ppermute`` hops between stages (round-2 VERDICT missing #4: stages
previously ran serially, so pp bought memory but no throughput).
"""

import threading

import jax
import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args


def _engine(n_dev, **kw):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    cfg = ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32")
    args = make_server_args(**kw)
    runner = ModelRunner(args, model_config=cfg,
                         devices=jax.devices()[:n_dev])
    return Engine(server_args=args, model_runner=runner), runner


def _batch_generate(eng, prompts, sp):
    outs = [None] * len(prompts)

    def worker(i):
        outs[i] = eng.generate(input_ids=list(prompts[i]),
                               sampling_params=dict(sp))["output_ids"]

    ts = [threading.Thread(target=worker, args=(i,))
          for i in range(len(prompts))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return outs


@pytest.mark.parametrize("pp_kw,n_dev", [
    (dict(pp_size=2), 2),
    (dict(pp_size=2, tp_size=2), 4),
], ids=["pp2", "pp2tp2"])
def test_pp_wavefront_engine_parity(pp_kw, n_dev):
    """Concurrent requests (decode batch >= 2 -> micro-batches split):
    the wavefront path must engage and reproduce single-device output."""
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs {n_dev} virtual devices")
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    prompts = [[(11 * i + j * 3) % 250 + 1 for j in range(10 + i)]
               for i in range(4)]

    base, _ = _engine(1)
    try:
        refs = _batch_generate(base, prompts, sp)
    finally:
        base.shutdown()

    eng, runner = _engine(n_dev, **pp_kw)
    try:
        outs = _batch_generate(eng, prompts, sp)
        assert getattr(runner.model, "_pp_wavefront_engaged", False), (
            "wavefront path did not engage (fell back to serial stages)"
        )
    finally:
        eng.shutdown()
    assert outs == refs


def test_pp_wavefront_single_request_falls_back():
    """B=1 can't split into micro-batches: serialized stages, same
    output (the existing pp behavior is the safety net)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    prompt = [9, 8, 7, 6, 5]

    base, _ = _engine(1)
    try:
        ref = base.generate(input_ids=list(prompt),
                            sampling_params=dict(sp))["output_ids"]
    finally:
        base.shutdown()
    eng, _ = _engine(2, pp_size=2)
    try:
        out = eng.generate(input_ids=list(prompt),
                           sampling_params=dict(sp))["output_ids"]
    finally:
        eng.shutdown()
    assert out == ref


def test_pp_wavefront_program_has_stage_permutes():
    """Structural contract: the wavefront program moves hidden states
    between stages with collective-permute (not serialized stage scans),
    and runs M + pp - 1 ticks."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    cfg = ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32")
    args = make_server_args(pp_size=2)
    runner = ModelRunner(args, model_config=cfg,
                         devices=jax.devices()[:2])
    from sglang_tpu.model_executor.forward_batch import DeviceBatch
    import jax.numpy as jnp

    B, Lq, P = 4, 1, 4
    batch = DeviceBatch(
        input_ids=jnp.ones((B, Lq), jnp.int32),
        positions=jnp.zeros((B, Lq), jnp.int32),
        seq_lens=jnp.ones((B,), jnp.int32),
        page_table=jnp.ones((B, P), jnp.int32),
        out_slots=jnp.full((B, Lq), 8, jnp.int32),
        logits_idx=jnp.arange(B, dtype=jnp.int32) * Lq,
    )

    def run(params, kv):
        out, kv = runner.model.forward(
            params, kv, batch,
            num_slots=runner.kv_pool.num_slots,
            page_size=runner.kv_pool.page_size,
            attn_backend="xla",
        )
        return out

    text = jax.jit(run).lower(runner.params, runner.kv_cache).as_text()
    assert "collective_permute" in text
    assert runner.model._pp_wavefront_engaged


def test_pp_wavefront_quantized_awq(tmp_path, monkeypatch):
    """r05 (r04 VERDICT next #4): quantized stacks ride the wavefront —
    each stage holds its LOCAL [L/pp, ...] quant shards and runs the
    fused per-rank kernels with local layer indices.  pp=2 AWQ engine
    must ENGAGE the wavefront and match the single-device quant engine
    token-for-token."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    monkeypatch.setenv("SGLANG_TPU_INTERPRET_PALLAS", "1")
    import json
    import os

    from tests.test_quant_e2e import _quantize_awq, _save_st, _tiny_hf_state
    from tests.test_quant_e2e import GROUP

    st = _tiny_hf_state()
    awq = {}
    for name, w in st.items():
        if name.endswith(".weight") and (
            "self_attn" in name or "mlp." in name
        ):
            qw, qz, s, _ = _quantize_awq(w)
            base = name[: -len(".weight")]
            awq[base + ".qweight"] = qw
            awq[base + ".qzeros"] = qz
            awq[base + ".scales"] = s
        else:
            awq[name] = w
    d = str(tmp_path / "awq")
    os.makedirs(d)
    _save_st(d, awq)
    cfg = dict(TINY_HF_CONFIG)
    cfg["quantization_config"] = {
        "quant_method": "awq", "bits": 4, "group_size": GROUP,
        "version": "gemm", "zero_point": True,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    def _quant_engine(n_dev, **kw):
        from sglang_tpu.configs.model_config import ModelConfig
        from sglang_tpu.entrypoints.engine import Engine
        from sglang_tpu.model_executor.model_runner import ModelRunner

        args = make_server_args(
            model_path=d, load_format="safetensors", dtype="float32", **kw
        )
        mcfg = ModelConfig.from_model_path(d, dtype="float32")
        runner = ModelRunner(args, model_config=mcfg,
                             devices=jax.devices()[:n_dev])
        return Engine(server_args=args, model_runner=runner), runner

    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    prompts = [[(13 * i + j * 5) % 250 + 1 for j in range(8 + i)]
               for i in range(4)]

    base, _ = _quant_engine(1)
    try:
        refs = _batch_generate(base, prompts, sp)
    finally:
        base.shutdown()

    eng, runner = _quant_engine(2, pp_size=2)
    try:
        assert runner.model_config.quant_config.method == "awq"
        outs = _batch_generate(eng, prompts, sp)
        assert getattr(runner.model, "_pp_wavefront_engaged", False), (
            "quantized wavefront did not engage"
        )
    finally:
        eng.shutdown()
    assert outs == refs
