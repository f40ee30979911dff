"""Normalization layers (RMSNorm).

Reference role: ``srt/layers/layernorm.py`` (+ fused CUDA rmsnorm in
``sgl-kernel/csrc/elementwise/``).  On TPU, XLA fuses the reduction +
rsqrt + scale into neighboring ops, so a plain jnp expression is already
the fused kernel; no Pallas needed.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp


def rms_norm(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float, offset: float = 0.0
) -> jnp.ndarray:
    """RMSNorm in f32 accumulation, output in x.dtype.

    ``offset`` shifts the scale weight: out = normed * (offset + w)
    (Gemma stores weights as w-1, so it passes offset=1).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    out = xf * (offset + weight.astype(jnp.float32))
    return out.astype(orig_dtype)
