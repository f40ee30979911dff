"""DeepSeek-V2 (MLA + MoE) numerics vs HF transformers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

TINY_DSV2 = dict(
    hidden_size=64,
    intermediate_size=128,
    moe_intermediate_size=48,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    kv_lora_rank=32,
    q_lora_rank=48,
    qk_nope_head_dim=32,
    qk_rope_head_dim=16,
    v_head_dim=32,
    n_routed_experts=4,
    n_shared_experts=1,
    num_experts_per_tok=2,
    first_k_dense_replace=1,
    moe_layer_freq=1,
    routed_scaling_factor=1.0,
    scoring_func="softmax",
    topk_method="greedy",
    norm_topk_prob=True,
    n_group=1,
    topk_group=1,
    vocab_size=512,
    max_position_embeddings=512,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    bos_token_id=256,
    eos_token_id=257,
    attention_bias=False,
)


@pytest.fixture(scope="module", params=["qlora", "noqlora"])
def hf_dsv2_dir(request, tmp_path_factory):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    kw = dict(TINY_DSV2)
    if request.param == "noqlora":
        kw["q_lora_rank"] = None
    cfg = DeepseekV2Config(**kw)
    torch.manual_seed(0)
    model = DeepseekV2ForCausalLM(cfg).float().eval()
    d = tmp_path_factory.mktemp(f"hf_dsv2_{request.param}")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_dsv2_greedy_matches_hf(hf_dsv2_dir):
    from transformers import DeepseekV2ForCausalLM as HFModel

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    hf_model = HFModel.from_pretrained(
        hf_dsv2_dir, torch_dtype=torch.float32, attn_implementation="eager"
    ).eval()
    args = ServerArgs(
        model_path=hf_dsv2_dir,
        tokenizer_path="test:byte",
        load_format="safetensors",
        dtype="float32",
        page_size=8,
        max_total_tokens=4096,
    )
    cfg = ModelConfig.from_model_path(hf_dsv2_dir, dtype="float32")
    assert cfg.num_key_value_heads == 1  # MLA latent pool
    assert cfg.head_dim == 32 + 16
    runner = ModelRunner(args, model_config=cfg)
    assert runner.attn_backend == "xla"
    eng = Engine(server_args=args, model_runner=runner)

    rng = np.random.RandomState(0)
    prompt_ids = rng.randint(1, 250, size=24).tolist()
    n_new = 10
    out = eng.generate(
        input_ids=list(prompt_ids),
        sampling_params={
            "temperature": 0.0, "max_new_tokens": n_new, "ignore_eos": True,
        },
    )
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt_ids]),
            max_new_tokens=n_new,
            do_sample=False,
            num_beams=1,
        )
    hf_new = hf_out[0][len(prompt_ids):].tolist()
    assert out["output_ids"] == hf_new
    # chunked prefill across the latent cache must agree too
    out2 = eng.generate(
        input_ids=list(prompt_ids),
        sampling_params={
            "temperature": 0.0, "max_new_tokens": n_new, "ignore_eos": True,
        },
    )
    assert out2["output_ids"] == hf_new
    eng.shutdown()


def test_dsv3_noaux_tc_matches_hf(tmp_path):
    """DeepSeek-V3 gating: sigmoid scores + e_score_correction_bias
    selection, group-limited top-k (trivial groups here)."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM as HFV3

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    kw = dict(TINY_DSV2)
    kw.pop("topk_method", None)
    kw.pop("scoring_func", None)
    cfg = DeepseekV3Config(
        **kw, scoring_func="sigmoid", topk_method="noaux_tc",
    )
    torch.manual_seed(1)
    model = HFV3(cfg).float().eval()
    with torch.no_grad():  # nonzero bias so selection differs from weights
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    d = tmp_path / "hf_dsv3"
    model.save_pretrained(d, safe_serialization=True)

    args = ServerArgs(
        model_path=str(d), tokenizer_path="test:byte",
        load_format="safetensors", dtype="float32", page_size=8,
        max_total_tokens=4096,
    )
    mc = ModelConfig.from_model_path(str(d), dtype="float32")
    runner = ModelRunner(args, model_config=mc)
    eng = Engine(server_args=args, model_runner=runner)
    rng = np.random.RandomState(3)
    prompt_ids = rng.randint(1, 250, size=20).tolist()
    out = eng.generate(
        input_ids=list(prompt_ids),
        sampling_params={
            "temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True,
        },
    )
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt_ids]), max_new_tokens=8,
            do_sample=False, num_beams=1,
        )
    assert out["output_ids"] == hf_out[0][len(prompt_ids):].tolist()
    eng.shutdown()


def test_dsv2_int8_resident_experts(tmp_path):
    """w8a8_int8 execution on DeepSeek MoE: the routed expert stacks
    stay INT8 in HBM with per-out-channel scales (reference
    w8a8_int8.py MoE role); generation tracks the dense engine up to
    int8 requant noise."""
    import json
    import shutil

    import jax.numpy as jnp
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    cfg = DeepseekV2Config(**TINY_DSV2)
    torch.manual_seed(1)
    model = DeepseekV2ForCausalLM(cfg).float().eval()
    d_dense = tmp_path / "dense"
    model.save_pretrained(d_dense, safe_serialization=True)
    d_q = tmp_path / "int8"
    shutil.copytree(d_dense, d_q)
    with open(d_q / "config.json") as f:
        hf = json.load(f)
    hf["quantization_config"] = {"quant_method": "w8a8_int8"}
    with open(d_q / "config.json", "w") as f:
        json.dump(hf, f)

    def make(d):
        args = ServerArgs(
            model_path=str(d), tokenizer_path="test:byte",
            load_format="safetensors", dtype="float32", page_size=8,
            max_total_tokens=4096,
        )
        mc = ModelConfig.from_model_path(str(d), dtype="float32")
        runner = ModelRunner(args, model_config=mc)
        return Engine(server_args=args, model_runner=runner), runner

    eq, rq = make(d_q)
    ed, _ = make(d_dense)
    try:
        moe = rq.params["moe_layers"]
        for nm in ("moe_w1", "moe_w3", "moe_w2"):
            assert moe[nm].dtype == jnp.int8, nm
            assert moe[nm + "_scale"].dtype == jnp.float32, nm
        prompt = [11, 310, 42, 5, 99, 6, 17, 204]
        sp = {"max_new_tokens": 10, "temperature": 0.0,
              "return_logprob": True}
        oq = eq.generate(input_ids=list(prompt), sampling_params=dict(sp))
        od = ed.generate(input_ids=list(prompt), sampling_params=dict(sp))
        lq = [t[0] for t in oq["meta_info"]["output_token_logprobs"]]
        ld = [t[0] for t in od["meta_info"]["output_token_logprobs"]]
        prefix = 0
        for a, b in zip(oq["output_ids"], od["output_ids"]):
            if a != b:
                break
            prefix += 1
        assert prefix >= 3, (oq["output_ids"], od["output_ids"])
        diff = np.abs(np.array(lq[:prefix]) - np.array(ld[:prefix]))
        assert diff.max() < 0.35, (lq, ld)
    finally:
        eq.shutdown()
        ed.shutdown()


def test_dsv2_ep_a2a_matches_tp1():
    """DeepSeek MoE under EP token dispatch (tp=2, ep=2,
    --moe-a2a-backend a2a) with INT8-RESIDENT experts: the expert stacks
    and scales shard over the expert axis (param_specs EP branch) and
    tokens ride the ragged all-to-all; outputs match the single-device
    int8 engine token-for-token."""
    import jax
    import jax.numpy as jnp

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import make_server_args

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    hf = dict(
        TINY_DSV2,
        architectures=["DeepseekV2ForCausalLM"],
        model_type="deepseek_v2",
        quantization_config={"quant_method": "w8a8_int8"},
    )
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
        moe = runner.params["moe_layers"]
        assert moe["moe_w1"].dtype == jnp.int8
        if name == "a2a":
            assert runner.mesh_ctx.parallel.moe_a2a
        eng = Engine(server_args=args, model_runner=runner)
        outs[name] = eng.generate(input_ids=[4, 5, 6, 7, 8, 9],
                                  sampling_params=dict(sp))
        eng.shutdown()
    assert outs["base"]["output_ids"] == outs["a2a"]["output_ids"]
