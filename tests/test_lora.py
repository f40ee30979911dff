"""Multi-LoRA serving: PEFT-format loading, exact parity vs merged weights,
mixed-adapter batches."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

from tests.conftest import TINY_HF_CONFIG  # noqa: E402


@pytest.fixture(scope="module")
def model_and_adapters(tmp_path_factory):
    """Tiny HF llama + two random LoRA adapters saved in PEFT format,
    plus merged-model reference outputs."""
    from peft import LoraConfig, get_peft_model
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=TINY_HF_CONFIG["hidden_size"],
        intermediate_size=TINY_HF_CONFIG["intermediate_size"],
        num_hidden_layers=TINY_HF_CONFIG["num_hidden_layers"],
        num_attention_heads=TINY_HF_CONFIG["num_attention_heads"],
        num_key_value_heads=TINY_HF_CONFIG["num_key_value_heads"],
        head_dim=TINY_HF_CONFIG["head_dim"],
        vocab_size=TINY_HF_CONFIG["vocab_size"],
        max_position_embeddings=TINY_HF_CONFIG["max_position_embeddings"],
        rms_norm_eps=TINY_HF_CONFIG["rms_norm_eps"],
        rope_theta=TINY_HF_CONFIG["rope_theta"],
        tie_word_embeddings=False,
        bos_token_id=256,
        eos_token_id=257,
    )
    torch.manual_seed(0)
    base = LlamaForCausalLM(cfg).float().eval()
    base_dir = tmp_path_factory.mktemp("lora_base")
    base.save_pretrained(base_dir, safe_serialization=True)

    adapters = {}
    merged = {}
    for i, name in enumerate(["adA", "adB"]):
        torch.manual_seed(10 + i)
        lcfg = LoraConfig(
            r=8,
            lora_alpha=16,
            target_modules=["q_proj", "v_proj", "gate_proj", "down_proj"],
            init_lora_weights=False,  # random A AND B → nonzero delta
            lora_dropout=0.0,
        )
        pm = get_peft_model(
            LlamaForCausalLM.from_pretrained(base_dir, torch_dtype=torch.float32),
            lcfg,
        ).eval()
        d = tmp_path_factory.mktemp(f"lora_{name}")
        pm.save_pretrained(d)
        adapters[name] = str(d)
        merged[name] = pm.merge_and_unload().eval()
    return str(base_dir), adapters, merged


def _make_engine(base_dir):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=base_dir,
        tokenizer_path="test:byte",
        load_format="safetensors",
        dtype="float32",
        page_size=8,
        max_total_tokens=8192,
        enable_lora=True,
        max_loras_per_batch=4,
        max_lora_rank=16,
    )
    runner = ModelRunner(
        args, model_config=ModelConfig.from_model_path(base_dir, dtype="float32")
    )
    return Engine(server_args=args, model_runner=runner)


def test_lora_parity_with_merged_hf(model_and_adapters):
    base_dir, adapters, merged = model_and_adapters
    eng = _make_engine(base_dir)
    try:
        for name in ("adA", "adB"):
            eng.load_lora_adapter(name, adapters[name])
        prompt = [5, 17, 33, 101, 9, 62, 77, 3]
        n_new = 10
        sp = {"temperature": 0.0, "max_new_tokens": n_new, "ignore_eos": True}

        base_out = eng.generate(input_ids=list(prompt), sampling_params=dict(sp))
        for name in ("adA", "adB"):
            ours = eng.generate(
                input_ids=list(prompt), sampling_params=dict(sp), lora_path=name
            )
            with torch.no_grad():
                ref = merged[name].generate(
                    torch.tensor([prompt]),
                    max_new_tokens=n_new,
                    do_sample=False,
                    num_beams=1,
                )
            ref_new = ref[0][len(prompt):].tolist()
            assert ours["output_ids"] == ref_new, name
            assert ours["output_ids"] != base_out["output_ids"], name
    finally:
        eng.shutdown()


def test_lora_mixed_batch_and_unload(model_and_adapters):
    base_dir, adapters, _ = model_and_adapters
    eng = _make_engine(base_dir)
    try:
        eng.load_lora_adapter("adA", adapters["adA"])
        prompt = [4, 4, 8, 15, 16, 23, 42, 42]
        sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}

        import threading

        results = {}

        def run(key, lora):
            results[key] = eng.generate(
                input_ids=list(prompt), sampling_params=dict(sp), lora_path=lora
            )

        ts = [
            threading.Thread(target=run, args=("with", "adA")),
            threading.Thread(target=run, args=("without", None)),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        assert results["with"]["output_ids"] != results["without"]["output_ids"]

        # solo runs must agree with the mixed batch (no cross-contamination)
        solo_with = eng.generate(
            input_ids=list(prompt), sampling_params=dict(sp), lora_path="adA"
        )
        solo_without = eng.generate(
            input_ids=list(prompt), sampling_params=dict(sp)
        )
        assert solo_with["output_ids"] == results["with"]["output_ids"]
        assert solo_without["output_ids"] == results["without"]["output_ids"]

        eng.unload_lora_adapter("adA")
        with pytest.raises(Exception):
            eng.generate(
                input_ids=list(prompt), sampling_params=dict(sp), lora_path="adA"
            )
    finally:
        eng.shutdown()


def test_lora_requests_bypass_radix_cache(model_and_adapters):
    """KV computed with adapter A must never be reused for base requests
    (the radix tree is keyed by tokens only)."""
    base_dir, adapters, _ = model_and_adapters
    eng = _make_engine(base_dir)
    try:
        eng.load_lora_adapter("adA", adapters["adA"])
        prompt = list(range(40, 72))
        sp = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}
        eng.generate(input_ids=list(prompt), sampling_params=dict(sp), lora_path="adA")
        out = eng.generate(input_ids=list(prompt), sampling_params=dict(sp))
        # base request must not see the adapter's KV as a cache hit
        assert out["meta_info"]["cached_tokens"] == 0
        # and a repeat base request MAY hit its own cached prefix
        out2 = eng.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert out2["output_ids"] == out["output_ids"]
    finally:
        eng.shutdown()
