"""Test environment: force JAX onto 8 virtual CPU devices (no TPU needed).

Multi-chip sharding tests run on this virtual mesh; the driver separately
dry-runs the multi-chip path (see __graft_entry__.py).
"""

import os

# Force, not setdefault: the session may export JAX_PLATFORMS=axon (the
# real-TPU tunnel), which must not leak into the hermetic CPU test mesh.
os.environ["JAX_NUM_CPU_DEVICES"] = "8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import pytest  # noqa: E402

from sglang_tpu.configs.model_config import ModelConfig  # noqa: E402
from sglang_tpu.server_args import ServerArgs  # noqa: E402


TINY_HF_CONFIG = {
    "architectures": ["LlamaForCausalLM"],
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 512,
    "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "bos_token_id": 256,
    "eos_token_id": 257,
    "model_type": "llama",
}


def make_tiny_config(dtype="float32", **overrides) -> ModelConfig:
    hf = dict(TINY_HF_CONFIG)
    hf.update(overrides)
    return ModelConfig.from_hf_dict(hf, model_path="test://tiny", dtype=dtype)


def make_server_args(**overrides) -> ServerArgs:
    defaults = dict(
        model_path="test://tiny",
        tokenizer_path="test:byte",
        load_format="dummy",
        device="cpu",
        dtype="float32",
        page_size=4,
        max_total_tokens=4096,
        chunked_prefill_size=64,
        max_prefill_tokens=512,
        max_running_requests=16,
        max_new_tokens_default=16,
    )
    defaults.update(overrides)
    return ServerArgs(**defaults)


@pytest.fixture(scope="session")
def tiny_config():
    return make_tiny_config()


@pytest.fixture(scope="session")
def tiny_runner():
    from sglang_tpu.model_executor.model_runner import ModelRunner

    return ModelRunner(make_server_args(), model_config=make_tiny_config())


@pytest.fixture()
def tiny_engine():
    """Fresh engine per test (own scheduler state), shared nothing."""
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args()
    runner = ModelRunner(args, model_config=make_tiny_config())
    eng = Engine(server_args=args, model_runner=runner)
    yield eng
    eng.shutdown()
