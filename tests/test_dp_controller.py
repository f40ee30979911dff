"""Data-parallel replica controller on the virtual CPU mesh."""

import jax
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args


def test_dp_controller_round_robin():
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.managers import DataParallelController

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    args = make_server_args(dp_size=2)
    cfg = ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32")
    ctl = DataParallelController(args, model_config=cfg,
                                 devices=jax.devices()[:2])
    try:
        sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
        outs = [
            ctl.generate(input_ids=[5, 6, 7, 8], sampling_params=dict(sp))
            for _ in range(4)
        ]
        # determinism across replicas (identical weights via seeded init)
        assert all(o["output_ids"] == outs[0]["output_ids"] for o in outs)
        # both replicas actually served traffic
        served = [s["num_generated_tokens"] for s in ctl.stats()]
        assert all(n > 0 for n in served), served
    finally:
        ctl.shutdown()


def test_tp2_engine_matches_tp1():
    """Tensor-parallel engine over 2 virtual devices reproduces the
    single-device outputs (GSPMD collectives on the mesh)."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    cfg = ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32")
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    prompt = [9, 8, 7, 6, 5]

    outs = {}
    for tp in (1, 2):
        args = make_server_args(tp_size=tp)
        runner = ModelRunner(args, model_config=cfg,
                             devices=jax.devices()[:tp])
        eng = Engine(server_args=args, model_runner=runner)
        outs[tp] = eng.generate(input_ids=list(prompt),
                                 sampling_params=dict(sp))
        eng.shutdown()
    assert outs[1]["output_ids"] == outs[2]["output_ids"]


def test_tp2_moe_engine():
    """MoE (ragged_dot) under tensor parallelism on the mesh."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_moe import TINY_MOE_HF

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    cfg = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    outs = {}
    for tp in (1, 2):
        args = make_server_args(tp_size=tp)
        runner = ModelRunner(args, model_config=cfg,
                             devices=jax.devices()[:tp])
        eng = Engine(server_args=args, model_runner=runner)
        outs[tp] = eng.generate(input_ids=[4, 5, 6, 7],
                                 sampling_params=dict(sp))
        eng.shutdown()
    assert outs[1]["output_ids"] == outs[2]["output_ids"]


def test_ep2_moe_engine_matches_tp1():
    """Expert parallelism (experts sharded over tp via shard_map
    all-to-all-free dispatch) reproduces single-device MoE outputs."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_moe import TINY_MOE_HF

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    cfg1 = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
    cfg2 = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    outs = {}
    for name, tp, ep, cfg in (
        ("base", 1, 1, cfg1), ("ep2", 2, 2, cfg2),
    ):
        args = make_server_args(tp_size=tp, ep_size=ep)
        runner = ModelRunner(args, model_config=cfg,
                             devices=jax.devices()[:tp])
        if name == "ep2":
            assert runner.model._expert_parallel()
        eng = Engine(server_args=args, model_runner=runner)
        outs[name] = eng.generate(input_ids=[4, 5, 6, 7],
                                  sampling_params=dict(sp))
        eng.shutdown()
    assert outs["base"]["output_ids"] == outs["ep2"]["output_ids"]


def test_ep2_a2a_moe_engine_matches_tp1():
    """EP with token dispatch (--moe-a2a-backend a2a: tokens move to
    their expert-owner rank via ragged all-to-all, gather-emulated on
    CPU) reproduces single-device MoE outputs through the full engine."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_moe import TINY_MOE_HF

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    outs = {}
    for name, kw in (
        ("base", dict(tp_size=1)),
        ("a2a", dict(tp_size=2, ep_size=2, moe_a2a_backend="a2a")),
    ):
        cfg = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
        args = make_server_args(**kw)
        runner = ModelRunner(args, model_config=cfg,
                             devices=jax.devices()[:kw["tp_size"]])
        if name == "a2a":
            assert runner.mesh_ctx.parallel.moe_a2a
        eng = Engine(server_args=args, model_runner=runner)
        outs[name] = eng.generate(input_ids=[4, 5, 6, 7],
                                  sampling_params=dict(sp))
        eng.shutdown()
    assert outs["base"]["output_ids"] == outs["a2a"]["output_ids"]


def test_dp_attention_engine_matches_tp():
    """DP-attention mode (attention data-parallel, MLP TP over the fused
    (dp, tp) axes) reproduces plain single-device outputs."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    prompts = [[9, 8, 7, 6, 5], [1, 2, 3], [4, 4, 4, 4, 4, 4, 4]]
    outs = {}
    for name, kw, n_dev in (
        ("base", dict(), 1),
        ("dpattn", dict(dp_size=2, tp_size=2, enable_dp_attention=True), 4),
    ):
        cfg = ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32")
        args = make_server_args(**kw)
        runner = ModelRunner(args, model_config=cfg,
                             devices=jax.devices()[:n_dev])
        eng = Engine(server_args=args, model_runner=runner)
        outs[name] = [
            o["output_ids"]
            for o in eng.generate(input_ids=[list(p) for p in prompts],
                                  sampling_params=dict(sp))
        ]
        eng.shutdown()
    assert outs["base"] == outs["dpattn"]


def test_pp2_engine_matches_tp1():
    """Pipeline parallelism: layer stacks sharded over 2 pp stages
    reproduce single-device outputs."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    prompt = [9, 8, 7, 6, 5]
    outs = {}
    for name, kw, n_dev in (
        ("base", dict(), 1),
        ("pp2", dict(pp_size=2), 2),
        ("pp2tp2", dict(pp_size=2, tp_size=2), 4),
    ):
        cfg = ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32")
        args = make_server_args(**kw)
        runner = ModelRunner(args, model_config=cfg,
                             devices=jax.devices()[:n_dev])
        eng = Engine(server_args=args, model_runner=runner)
        outs[name] = eng.generate(input_ids=list(prompt),
                                  sampling_params=dict(sp))["output_ids"]
        eng.shutdown()
    assert outs["base"] == outs["pp2"] == outs["pp2tp2"]
