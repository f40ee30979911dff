"""Activation functions.

Reference role: ``srt/layers/activation.py`` (+ ``silu_and_mul`` /
``gelu_*_and_mul`` CUDA kernels in ``sgl-kernel/csrc/elementwise/``).
XLA fuses gate*act(up) into the surrounding matmuls on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ACT = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
}


def get_act_fn(name: str):
    if name not in _ACT:
        raise ValueError(f"Unsupported activation {name!r}")
    return _ACT[name]


def act_and_mul(name: str, gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    return get_act_fn(name)(gate) * up
