"""Normalization layers (RMSNorm).

Reference role: ``srt/layers/layernorm.py`` (+ fused CUDA rmsnorm in
``sgl-kernel/csrc/elementwise/``).  On TPU, XLA fuses the reduction +
rsqrt + scale into neighboring ops, so a plain jnp expression is already
the fused kernel; no Pallas needed.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in f32 accumulation, output in x.dtype."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    out = xf * weight.astype(jnp.float32)
    return out.astype(orig_dtype)


def rms_norm_gemma(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Gemma-style RMSNorm: scale by (1 + weight)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    out = xf * (1.0 + weight.astype(jnp.float32))
    return out.astype(orig_dtype)
