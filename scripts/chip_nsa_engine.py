"""On-chip NSA engine drive: the full serving path with the block-sparse
kernels ENGAGED on real hardware.

1. top_pages >= every page => token-exact vs the dense engine (greedy).
2. long prompt + small top_pages => sparse decode AND sparse prefill
   programs run on the chip and serve sensible tokens.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/chip_nsa_engine.py
"""

from __future__ import annotations

import faulthandler

faulthandler.dump_traceback_later(360, repeat=True)

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.entrypoints.engine import Engine
from sglang_tpu.model_executor.model_runner import ModelRunner
from sglang_tpu.server_args import ServerArgs

HF = {
    "architectures": ["LlamaForCausalLM"], "hidden_size": 256,
    "intermediate_size": 512, "num_hidden_layers": 4,
    "num_attention_heads": 8, "num_key_value_heads": 2, "head_dim": 64,
    "vocab_size": 512, "max_position_embeddings": 4096,
    "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "tie_word_embeddings": False, "eos_token_id": 257,
    "model_type": "llama",
}


def _engine(**overrides):
    base = dict(
        model_path="dummy://tiny", tokenizer_path="test:byte",
        load_format="dummy", dtype="bfloat16", page_size=32,
        max_total_tokens=65536, chunked_prefill_size=512,
        watchdog_timeout=240, disable_radix_cache=True,
    )
    base.update(overrides)
    args = ServerArgs(**base)
    cfg = ModelConfig.from_hf_dict(
        HF, model_path="dummy://tiny", dtype="bfloat16"
    )
    return Engine(
        server_args=args, model_runner=ModelRunner(args, model_config=cfg)
    )


def main():
    prompt = [(3 * i) % 500 + 1 for i in range(200)]
    sp = {"temperature": 0.0, "max_new_tokens": 32, "ignore_eos": True}

    nsa = _engine(enable_nsa=True, nsa_top_pages=64)
    assert nsa.scheduler.runner.attn_backend == "pallas", (
        nsa.scheduler.runner.attn_backend
    )
    o1 = nsa.generate(input_ids=list(prompt), sampling_params=dict(sp))
    nsa.shutdown()
    print("nsa(top=all) out:", o1["output_ids"])

    ref = _engine()
    o2 = ref.generate(input_ids=list(prompt), sampling_params=dict(sp))
    ref.shutdown()
    print("dense      out:", o2["output_ids"])
    assert o1["output_ids"] == o2["output_ids"], "token-exact FAILED"
    print("PASS token-exact (top_pages covers all)")

    # long context, small top_pages: sparse decode + sparse prefill
    sparse = _engine(enable_nsa=True, nsa_top_pages=8)
    long_prompt = [(7 * i) % 500 + 1 for i in range(2048)]
    o3 = sparse.generate(
        input_ids=list(long_prompt), sampling_params=dict(sp)
    )
    sparse.shutdown()
    assert len(o3["output_ids"]) == 32
    assert all(0 <= t < 512 for t in o3["output_ids"])
    print("PASS sparse path served 32 tokens:", o3["output_ids"][:8], "...")


if __name__ == "__main__":
    main()
