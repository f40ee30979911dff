"""Distributed weight sync: trainer serves tensors over TCP, inference
pulls and applies them mid-serving (reference weight_sync/ +
model_runner.py:2011/:2070 + checkpoint_engine/update.py)."""

import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args
from tests.test_quant_e2e import _tiny_hf_state


def _make_engine(dtype="float32"):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(dtype=dtype)
    cfg = ModelConfig.from_hf_dict(
        TINY_HF_CONFIG, model_path="dummy://tiny", dtype=dtype
    )
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def test_transport_roundtrip():
    import ml_dtypes

    from sglang_tpu.weight_sync import WeightSyncClient, serve_weights

    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.ones((2, 5), ml_dtypes.bfloat16),
    }
    th, port = serve_weights(tensors, max_requests=2)
    got = dict(WeightSyncClient("127.0.0.1", port).iter_tensors())
    assert set(got) == {"a", "b"}
    np.testing.assert_array_equal(got["a"], tensors["a"])
    assert got["b"].dtype == np.dtype(ml_dtypes.bfloat16)
    sub = dict(
        WeightSyncClient("127.0.0.1", port).iter_tensors(names=["a"])
    )
    assert set(sub) == {"a"}
    th.join(timeout=5)


def test_update_weights_from_distributed_e2e():
    """Engine pulls a full HF-named weight set from a 'trainer' server;
    generation afterwards matches an engine that loaded those weights
    from disk."""
    import json
    import os
    import tempfile

    from safetensors.numpy import save_file

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.weight_sync import serve_weights

    st = _tiny_hf_state(seed=7)
    _th, port = serve_weights(st, max_requests=1)

    eng = _make_engine()
    try:
        eng.init_weights_update_group("127.0.0.1", port)
        n = eng.update_weights_from_distributed()
        assert n == len(st)
        prompt = [5, 99, 203, 17, 42, 7, 310, 8]
        sp = {"max_new_tokens": 10, "temperature": 0.0,
              "return_logprob": True, "ignore_eos": True}
        o1 = eng.generate(input_ids=prompt, sampling_params=sp)
    finally:
        eng.shutdown()

    with tempfile.TemporaryDirectory() as d:
        save_file(
            {k: np.ascontiguousarray(v) for k, v in st.items()},
            os.path.join(d, "model.safetensors"),
        )
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(dict(TINY_HF_CONFIG), f)
        args = make_server_args(
            model_path=d, load_format="safetensors", dtype="float32"
        )
        cfg = ModelConfig.from_model_path(d, dtype="float32")
        runner = ModelRunner(args, model_config=cfg)
        e2 = Engine(server_args=args, model_runner=runner)
        try:
            o2 = e2.generate(input_ids=prompt, sampling_params=sp)
        finally:
            e2.shutdown()
    assert o1["output_ids"] == o2["output_ids"]
    l1 = [t[0] for t in o1["meta_info"]["output_token_logprobs"]]
    l2 = [t[0] for t in o2["meta_info"]["output_token_logprobs"]]
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)


def test_update_weights_from_tensor_partial():
    """Partial HF-named update (single per-layer tensor) changes outputs
    and updates exactly the targeted stacked-leaf slice."""
    eng = _make_engine()
    try:
        runner = eng.scheduler.runner
        prompt = [5, 9, 203, 17]
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
        o1 = eng.generate(input_ids=prompt, sampling_params=sp)
        H = TINY_HF_CONFIG["hidden_size"]
        hq = (
            TINY_HF_CONFIG["num_attention_heads"]
            * TINY_HF_CONFIG["head_dim"]
        )
        rng = np.random.RandomState(0)
        new_q = rng.randn(hq, H).astype(np.float32)

        def q_stack():
            lay = runner.params["layers"]
            if "qkv_proj" in lay:  # fused execution layout
                return np.asarray(lay["qkv_proj"][..., :hq])
            return np.asarray(lay["q_proj"])

        before = q_stack()[1]
        eng.update_weights_from_tensor(
            {"model.layers.0.self_attn.q_proj.weight": new_q}
        )
        after0 = q_stack()[0]
        after1 = q_stack()[1]
        np.testing.assert_allclose(after0, new_q.T, rtol=1e-6)
        np.testing.assert_array_equal(after1, before)  # other layer intact
        o2 = eng.generate(input_ids=prompt, sampling_params=sp)
        assert o1["output_ids"] != o2["output_ids"]
    finally:
        eng.shutdown()


def test_remote_instance_bootstrap():
    """--load-format remote_instance (reference loader.py:2196): a new
    engine pulls the seed's live exec-layout weights over TCP and
    produces token-identical greedy output."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    seed = _make_engine()
    th, port = seed.serve_weights_bootstrap(host="127.0.0.1")
    try:
        args = make_server_args(
            load_format="remote_instance",
            remote_instance_seed_addr=f"127.0.0.1:{port}",
        )
        cfg = ModelConfig.from_hf_dict(
            TINY_HF_CONFIG, model_path="dummy://tiny", dtype="float32"
        )
        boot = Engine(
            server_args=args,
            model_runner=ModelRunner(args, model_config=cfg),
        )
        try:
            prompt = [5, 9, 200, 31, 7]
            sp = {"temperature": 0.0, "max_new_tokens": 12,
                  "ignore_eos": True}
            o1 = seed.generate(input_ids=list(prompt),
                               sampling_params=dict(sp))
            o2 = boot.generate(input_ids=list(prompt),
                               sampling_params=dict(sp))
            assert o1["output_ids"] == o2["output_ids"], (
                o1["output_ids"], o2["output_ids"])
        finally:
            boot.shutdown()
    finally:
        seed.shutdown()
