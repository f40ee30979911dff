"""E2E: genuine AWQ / FP8 HF checkpoints load and serve, matching their
dequantized-dense equivalents (reference layers/quantization/ load paths)."""

import json
import os

import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args
from tests.test_quantization import pack_awq_int32

GROUP = 32


def _tiny_hf_state(seed=0):
    """Random float32 tensors in HF llama naming (no torch needed)."""
    rng = np.random.RandomState(seed)
    c = TINY_HF_CONFIG
    H, I = c["hidden_size"], c["intermediate_size"]
    hq = c["num_attention_heads"] * c["head_dim"]
    hkv = c["num_key_value_heads"] * c["head_dim"]
    V, L = c["vocab_size"], c["num_hidden_layers"]
    st = {
        "model.embed_tokens.weight": rng.randn(V, H).astype(np.float32) * 0.05,
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": rng.randn(V, H).astype(np.float32) * 0.05,
    }
    proj_shapes = {
        "self_attn.q_proj": (hq, H),
        "self_attn.k_proj": (hkv, H),
        "self_attn.v_proj": (hkv, H),
        "self_attn.o_proj": (H, hq),
        "mlp.gate_proj": (I, H),
        "mlp.up_proj": (I, H),
        "mlp.down_proj": (H, I),
    }
    for li in range(L):
        p = f"model.layers.{li}."
        st[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        st[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        for mod, (dout, din) in proj_shapes.items():
            st[p + mod + ".weight"] = (
                rng.randn(dout, din).astype(np.float32) / np.sqrt(din)
            )
    return st


def _quantize_awq(w, g=GROUP):
    """w [out, in] → (qweight, qzeros, scales) in AWQ wire format + the
    exactly-dequantized float weight [out, in]."""
    wt = np.ascontiguousarray(w.T)  # [in, out]
    K, N = wt.shape
    grp = wt.reshape(K // g, g, N)
    mx, mn = grp.max(1), grp.min(1)
    s = np.maximum((mx - mn) / 15.0, 1e-8).astype(np.float32)
    z = np.clip(np.round(-mn / s), 0, 15).astype(np.uint8)
    sr, zr = np.repeat(s, g, 0), np.repeat(z, g, 0).astype(np.float32)
    q = np.clip(np.round(wt / sr + zr), 0, 15).astype(np.uint8)
    wd = (q.astype(np.float32) - zr) * sr
    return pack_awq_int32(q), pack_awq_int32(z), s, np.ascontiguousarray(wd.T)


def _save_st(d, tensors):
    from safetensors.numpy import save_file

    save_file(
        {k: np.ascontiguousarray(v) for k, v in tensors.items()},
        os.path.join(d, "model.safetensors"),
    )


def _write_cfg(d, quantization_config=None):
    cfg = dict(TINY_HF_CONFIG)
    if quantization_config:
        cfg["quantization_config"] = quantization_config
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


@pytest.fixture(scope="module")
def awq_pair_dirs(tmp_path_factory):
    """(awq checkpoint dir, dense dir holding the dequantized weights)."""
    st = _tiny_hf_state()
    awq, dense = {}, {}
    for name, w in st.items():
        if name.endswith(".weight") and (
            "self_attn" in name or "mlp." in name
        ):
            qw, qz, s, wd = _quantize_awq(w)
            base = name[: -len(".weight")]
            awq[base + ".qweight"] = qw
            awq[base + ".qzeros"] = qz
            awq[base + ".scales"] = s
            dense[name] = wd
        else:
            awq[name] = w
            dense[name] = w
    da = str(tmp_path_factory.mktemp("awq"))
    dd = str(tmp_path_factory.mktemp("dense"))
    _save_st(da, awq)
    _save_st(dd, dense)
    _write_cfg(da, {"quant_method": "awq", "bits": 4, "group_size": GROUP,
                    "version": "gemm", "zero_point": True})
    _write_cfg(dd)
    return da, dd


def _make_engine(model_dir, quant_execution="auto"):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        model_path=model_dir, load_format="safetensors", dtype="float32",
        quant_execution=quant_execution,
    )
    cfg = ModelConfig.from_model_path(model_dir, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def test_awq_checkpoint_matches_dequantized_dense(awq_pair_dirs):
    da, dd = awq_pair_dirs
    ea = _make_engine(da)
    ed = _make_engine(dd)
    try:
        assert ea.scheduler.runner.model_config.quant_config.method == "awq"
        prompt = [5, 99, 203, 17, 42, 7, 310, 8]
        sp = {"max_new_tokens": 12, "temperature": 0.0, "return_logprob": True}
        oa = ea.generate(input_ids=prompt, sampling_params=sp)
        od = ed.generate(input_ids=prompt, sampling_params=sp)
        assert oa["output_ids"] == od["output_ids"]
        la = [t[0] for t in oa["meta_info"]["output_token_logprobs"]]
        ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(la, ld, rtol=1e-3, atol=1e-3)
    finally:
        ea.shutdown()
        ed.shutdown()


@pytest.fixture(scope="module")
def fp8_pair_dirs(tmp_path_factory):
    import ml_dtypes

    st = _tiny_hf_state(seed=1)
    fp8, dense = {}, {}
    for name, w in st.items():
        if name.endswith(".weight") and (
            "self_attn" in name or "mlp." in name
        ):
            # per-out-channel scale (neuralmagic dynamic scheme)
            s = (np.abs(w).max(axis=1, keepdims=True) / 448.0).astype(
                np.float32
            )
            qw = (w / s).astype(ml_dtypes.float8_e4m3fn)
            wd = qw.astype(np.float32) * s
            base = name[: -len(".weight")]
            fp8[name] = qw
            fp8[base + ".weight_scale"] = s.reshape(-1)
            dense[name] = wd
        else:
            fp8[name] = w
            dense[name] = w
    df = str(tmp_path_factory.mktemp("fp8"))
    dd = str(tmp_path_factory.mktemp("fp8dense"))
    _save_st(df, fp8)
    _save_st(dd, dense)
    _write_cfg(df, {"quant_method": "fp8", "activation_scheme": "dynamic"})
    _write_cfg(dd)
    return df, dd


def test_fp8_checkpoint_matches_dequantized_dense(fp8_pair_dirs):
    df, dd = fp8_pair_dirs
    ef = _make_engine(df, quant_execution="native")
    ed = _make_engine(dd)
    try:
        assert ef.scheduler.runner.model_config.quant_config.method == "fp8"
        prompt = [3, 1, 4, 1, 5, 9, 2, 6]
        sp = {"max_new_tokens": 10, "temperature": 0.0, "return_logprob": True}
        of = ef.generate(input_ids=prompt, sampling_params=sp)
        od = ed.generate(input_ids=prompt, sampling_params=sp)
        assert of["output_ids"] == od["output_ids"]
        lf = [t[0] for t in of["meta_info"]["output_token_logprobs"]]
        ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(lf, ld, rtol=1e-3, atol=1e-3)
    finally:
        ef.shutdown()
        ed.shutdown()


def test_dummy_quant_engine_serves(tmp_path):
    """Dummy-weight AWQ engine: full pipeline with the quant param tree."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    hf = dict(TINY_HF_CONFIG)
    hf["quantization_config"] = {
        "quant_method": "awq", "bits": 4, "group_size": GROUP,
    }
    cfg = ModelConfig.from_hf_dict(hf, model_path="test://tiny", dtype="float32")
    args = make_server_args()
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        out = eng.generate(
            input_ids=[1, 2, 3, 4], sampling_params={
                "max_new_tokens": 8, "temperature": 0.0}
        )
        assert len(out["output_ids"]) == 8
    finally:
        eng.shutdown()


def test_fp8_checkpoint_int8_execution(fp8_pair_dirs):
    """--quant-execution int8: the fp8 checkpoint transcodes to
    per-channel int8 at load; outputs must track the dense reference
    closely (requant noise only)."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    df, dd = fp8_pair_dirs
    args = make_server_args(
        model_path=df, load_format="safetensors", dtype="float32",
        quant_execution="int8",
    )
    cfg = ModelConfig.from_model_path(df, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    assert runner.model_config.quant_config.method == "w8a8_int8"
    assert runner.model_config.quant_config.src_fp8
    ei = Engine(server_args=args, model_runner=runner)
    ed = _make_engine(dd)
    try:
        prompt = [3, 1, 4, 1, 5, 9, 2, 6]
        sp = {"max_new_tokens": 8, "temperature": 0.0, "return_logprob": True}
        oi = ei.generate(input_ids=prompt, sampling_params=sp)
        od = ed.generate(input_ids=prompt, sampling_params=sp)
        li = [t[0] for t in oi["meta_info"]["output_token_logprobs"]]
        ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
        # int8 act+weight requant noise: greedy paths of a RANDOM tiny
        # model diverge once any near-tie flips, so compare the common
        # prefix (must be non-trivial) and its logprobs (must be close).
        import numpy as _np
        prefix = 0
        for a, b in zip(oi["output_ids"], od["output_ids"]):
            if a != b:
                break
            prefix += 1
        assert prefix >= 3, (oi["output_ids"], od["output_ids"])
        diff = _np.abs(_np.array(li[:prefix]) - _np.array(ld[:prefix]))
        assert diff.max() < 0.35, (li, ld)
    finally:
        ei.shutdown()
        ed.shutdown()


# ------------------------------------------------------------------ block-fp8
BLOCK = 16  # tiny stand-in for DeepSeek-V3's [128, 128] weight_block_size


def _quantize_block_fp8(w, b=BLOCK):
    """w [out, in] → (fp8 weight, weight_scale_inv [out/b, in/b], exact
    dequantized float weight)."""
    import ml_dtypes

    out_d, in_d = w.shape
    wb = w.reshape(out_d // b, b, in_d // b, b)
    s = np.maximum(np.abs(wb).max(axis=(1, 3)) / 448.0, 1e-12).astype(
        np.float32
    )
    se = np.repeat(np.repeat(s, b, 0), b, 1)
    qw = (w / se).astype(ml_dtypes.float8_e4m3fn)
    wd = qw.astype(np.float32) * se
    return qw, s, wd


@pytest.fixture(scope="module")
def block_fp8_pair_dirs(tmp_path_factory):
    st = _tiny_hf_state(seed=2)
    q, dense = {}, {}
    for name, w in st.items():
        if name.endswith(".weight") and (
            "self_attn" in name or "mlp." in name
        ):
            qw, s, wd = _quantize_block_fp8(w)
            q[name] = qw
            q[name + "_scale_inv"] = s
            dense[name] = wd
        else:
            q[name] = w
            dense[name] = w
    dq = str(tmp_path_factory.mktemp("blockfp8"))
    dd = str(tmp_path_factory.mktemp("blockdense"))
    _save_st(dq, q)
    _save_st(dd, dense)
    _write_cfg(dq, {"quant_method": "fp8", "activation_scheme": "dynamic",
                    "fmt": "e4m3", "weight_block_size": [BLOCK, BLOCK]})
    _write_cfg(dd)
    return dq, dd


def test_block_fp8_dense_exec_token_exact(block_fp8_pair_dirs):
    """DeepSeek-V3-style block-fp8 checkpoint: loader dequantizes on read
    (sibling weight_scale_inv), dense execution is bit-faithful to the
    dequantized-dense reference."""
    dq, dd = block_fp8_pair_dirs
    eq = _make_engine(dq, quant_execution="native")
    ed = _make_engine(dd)
    try:
        # fp8_block rewrites to dense execution (quant_config cleared)
        assert eq.scheduler.runner.model_config.quant_config is None
        prompt = [7, 5, 311, 42, 18, 9]
        sp = {"max_new_tokens": 12, "temperature": 0.0, "return_logprob": True}
        oq = eq.generate(input_ids=prompt, sampling_params=sp)
        od = ed.generate(input_ids=prompt, sampling_params=sp)
        assert oq["output_ids"] == od["output_ids"]
        lq = [t[0] for t in oq["meta_info"]["output_token_logprobs"]]
        ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(lq, ld, rtol=1e-4, atol=1e-4)
    finally:
        eq.shutdown()
        ed.shutdown()


def test_block_fp8_int8_execution(block_fp8_pair_dirs):
    """--quant-execution int8 on a block-fp8 checkpoint: dequant at load
    then per-channel int8 requant; outputs track the dense reference."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    dq, dd = block_fp8_pair_dirs
    args = make_server_args(
        model_path=dq, load_format="safetensors", dtype="float32",
        quant_execution="int8",
    )
    cfg = ModelConfig.from_model_path(dq, dtype="float32")
    assert cfg.quant_config.method == "fp8_block"
    runner = ModelRunner(args, model_config=cfg)
    assert runner.model_config.quant_config.method == "w8a8_int8"
    assert runner.model_config.quant_config.src_block_fp8
    ei = Engine(server_args=args, model_runner=runner)
    ed = _make_engine(dd)
    try:
        prompt = [7, 5, 311, 42, 18, 9]
        sp = {"max_new_tokens": 8, "temperature": 0.0, "return_logprob": True}
        oi = ei.generate(input_ids=prompt, sampling_params=sp)
        od = ed.generate(input_ids=prompt, sampling_params=sp)
        li = [t[0] for t in oi["meta_info"]["output_token_logprobs"]]
        ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
        prefix = 0
        for a, b in zip(oi["output_ids"], od["output_ids"]):
            if a != b:
                break
            prefix += 1
        assert prefix >= 3, (oi["output_ids"], od["output_ids"])
        diff = np.abs(np.array(li[:prefix]) - np.array(ld[:prefix]))
        assert diff.max() < 0.35, (li, ld)
    finally:
        ei.shutdown()
        ed.shutdown()


# -------------------------------------------------------- fp8 MoE experts
def _tiny_moe_hf_state(seed=3):
    from tests.test_moe import TINY_MOE_HF as c

    rng = np.random.RandomState(seed)
    H, I = c["hidden_size"], c["intermediate_size"]
    hq = c["num_attention_heads"] * c["head_dim"]
    hkv = c["num_key_value_heads"] * c["head_dim"]
    V, L, E = c["vocab_size"], c["num_hidden_layers"], c["num_local_experts"]
    st = {
        "model.embed_tokens.weight": rng.randn(V, H).astype(np.float32) * 0.05,
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": rng.randn(V, H).astype(np.float32) * 0.05,
    }
    for li in range(L):
        p = f"model.layers.{li}."
        st[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        st[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        for mod, (do, di) in {
            "self_attn.q_proj": (hq, H), "self_attn.k_proj": (hkv, H),
            "self_attn.v_proj": (hkv, H), "self_attn.o_proj": (H, hq),
        }.items():
            st[p + mod + ".weight"] = (
                rng.randn(do, di).astype(np.float32) / np.sqrt(di)
            )
        st[p + "block_sparse_moe.gate.weight"] = (
            rng.randn(E, H).astype(np.float32) * 0.1
        )
        for e in range(E):
            ep = p + f"block_sparse_moe.experts.{e}."
            st[ep + "w1.weight"] = rng.randn(I, H).astype(np.float32) / 8
            st[ep + "w3.weight"] = rng.randn(I, H).astype(np.float32) / 8
            st[ep + "w2.weight"] = rng.randn(H, I).astype(np.float32) / 8
    return st


@pytest.fixture(scope="module")
def moe_fp8_pair_dirs(tmp_path_factory):
    """(fp8-expert Mixtral checkpoint dir, dequantized-dense twin dir)."""
    import ml_dtypes

    from tests.test_moe import TINY_MOE_HF

    st = _tiny_moe_hf_state()
    q, dense = {}, {}
    for name, w in st.items():
        if ".experts." in name and name.endswith(".weight"):
            s = np.maximum(
                np.abs(w).max(axis=1, keepdims=True) / 448.0, 1e-12
            ).astype(np.float32)
            qw = (w / s).astype(ml_dtypes.float8_e4m3fn)
            q[name] = qw
            q[name + "_scale"] = s.reshape(-1)
            dense[name] = qw.astype(np.float32) * s
        else:
            q[name] = w
            dense[name] = w
    dq = str(tmp_path_factory.mktemp("moefp8"))
    dd = str(tmp_path_factory.mktemp("moedense"))
    _save_st(dq, q)
    _save_st(dd, dense)
    cfg_q = dict(TINY_MOE_HF)
    cfg_q["quantization_config"] = {
        "quant_method": "fp8", "activation_scheme": "dynamic",
        "modules_to_not_convert": ["proj"],  # experts only
    }
    with open(os.path.join(dq, "config.json"), "w") as f:
        json.dump(cfg_q, f)
    with open(os.path.join(dd, "config.json"), "w") as f:
        json.dump(dict(TINY_MOE_HF), f)
    return dq, dd


def test_mixtral_fp8_expert_weights(moe_fp8_pair_dirs):
    """Per-channel fp8 MoE expert weights (+ sibling weight_scale): the
    loader dequantizes expert tensors into the dense stacked buffers
    (reference fp8.py Fp8MoEMethod); generation matches the
    dequantized-dense checkpoint token-exactly."""
    dq, dd = moe_fp8_pair_dirs
    eq = _make_engine(dq, quant_execution="native")
    ed = _make_engine(dd)
    try:
        prompt = [11, 310, 42, 5, 99, 6]
        sp = {"max_new_tokens": 10, "temperature": 0.0, "return_logprob": True}
        oq = eq.generate(input_ids=prompt, sampling_params=sp)
        od = ed.generate(input_ids=prompt, sampling_params=sp)
        assert oq["output_ids"] == od["output_ids"]
        lq = [t[0] for t in oq["meta_info"]["output_token_logprobs"]]
        ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(lq, ld, rtol=1e-4, atol=1e-4)
    finally:
        eq.shutdown()
        ed.shutdown()


def test_mixtral_int8_resident_experts(moe_fp8_pair_dirs):
    """--quant-execution int8 on an fp8-expert Mixtral checkpoint: the
    stacked expert tensors stay INT8-RESIDENT in HBM with per-out-channel
    f32 scales (half the expert memory of the bf16-dequantized path;
    reference w8a8_int8.py MoE role). The loader folds the checkpoint's
    fp8 sibling weight_scale in BEFORE requantization (q8.wants_dequant),
    so generation tracks the dequantized-dense twin up to int8 requant
    noise."""
    import jax.numpy as jnp

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    dq, dd = moe_fp8_pair_dirs
    args = make_server_args(
        model_path=dq, load_format="safetensors", dtype="float32",
        quant_execution="int8",
    )
    cfg = ModelConfig.from_model_path(dq, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    assert runner.model_config.quant_config.method == "w8a8_int8"
    layers = runner.params["layers"]
    for n in ("moe_w1", "moe_w3", "moe_w2"):
        assert layers[n].dtype == jnp.int8, n
        assert layers[n + "_scale"].dtype == jnp.float32, n
    ei = Engine(server_args=args, model_runner=runner)
    ed = _make_engine(dd)
    try:
        prompt = [11, 310, 42, 5, 99, 6]
        sp = {"max_new_tokens": 10, "temperature": 0.0, "return_logprob": True}
        oi = ei.generate(input_ids=prompt, sampling_params=sp)
        od = ed.generate(input_ids=prompt, sampling_params=sp)
        li = [t[0] for t in oi["meta_info"]["output_token_logprobs"]]
        ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
        # int8 requant of a RANDOM tiny model: compare the common greedy
        # prefix (must be non-trivial) and its logprobs (must be close),
        # as in test_fp8_checkpoint_int8_execution.
        prefix = 0
        for a, b in zip(oi["output_ids"], od["output_ids"]):
            if a != b:
                break
            prefix += 1
        assert prefix >= 3, (oi["output_ids"], od["output_ids"])
        diff = np.abs(np.array(li[:prefix]) - np.array(ld[:prefix]))
        assert diff.max() < 0.35, (li, ld)
    finally:
        ei.shutdown()
        ed.shutdown()


def test_int8_resident_experts_ep_a2a():
    """INT8-RESIDENT experts under EP token dispatch (tp=2, ep=2,
    --moe-a2a-backend a2a): the int8 slabs and their per-out-channel
    scales shard over the expert axis and ride the ragged all-to-all
    path; outputs match the single-device int8 engine token-for-token
    (same quantization levels, expert-parallel execution)."""
    import jax
    import jax.numpy as jnp

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_moe import TINY_MOE_HF

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    hf = dict(TINY_MOE_HF)
    hf["quantization_config"] = {
        "quant_method": "w8a8_int8",
        "modules_to_not_convert": ["proj"],  # experts only
    }
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    outs = {}
    for name, kw in (
        ("base", dict(tp_size=1)),
        ("a2a", dict(tp_size=2, ep_size=2, moe_a2a_backend="a2a")),
    ):
        cfg = ModelConfig.from_hf_dict(hf, dtype="float32")
        args = make_server_args(**kw)
        runner = ModelRunner(args, model_config=cfg,
                             devices=jax.devices()[:kw["tp_size"]])
        assert runner.params["layers"]["moe_w1"].dtype == jnp.int8
        eng = Engine(server_args=args, model_runner=runner)
        outs[name] = eng.generate(input_ids=[4, 5, 6, 7],
                                  sampling_params=dict(sp))
        eng.shutdown()
    assert outs["base"]["output_ids"] == outs["a2a"]["output_ids"]
