"""sglang-tpu: a TPU-native LLM serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SGLang
(reference: mickqian/sglang): continuous batching, RadixAttention prefix
caching over a paged HBM KV cache, OpenAI-compatible serving, tensor/data/
expert parallelism over TPU meshes.
"""

__version__ = "0.1.0"

from sglang_tpu.server_args import ServerArgs  # noqa: F401


def __getattr__(name):
    # Lazy imports keep `import sglang_tpu` light (no jax deps pulled in
    # until an Engine is actually constructed).
    if name == "Engine":
        from sglang_tpu.entrypoints.engine import Engine

        return Engine
    if name == "SamplingParams":
        from sglang_tpu.core.sampling_params import SamplingParams

        return SamplingParams
    raise AttributeError(f"module 'sglang_tpu' has no attribute {name!r}")
