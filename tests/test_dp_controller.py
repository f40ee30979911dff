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
