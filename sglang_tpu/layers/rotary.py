"""Rotary position embeddings.

Reference role: ``srt/layers/rotary_embedding/`` (+ fused rope CUDA kernels).
Computed on the fly from positions — on TPU the sin/cos evaluation fuses into
the surrounding elementwise graph, and avoiding a precomputed [max_pos, D]
table keeps HBM traffic down for long contexts.

Supports: plain NTK theta, llama3-style scaling, "linear" and "dynamic"
scaling, partial rotary.  (HF config ``rope_scaling`` schema.)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def compute_inv_freq(
    head_dim: int,
    rope_theta: float,
    rope_scaling: Optional[Dict[str, Any]],
    partial_rotary_factor: float = 1.0,
) -> np.ndarray:
    """Return inv_freq [rot_dim/2] (numpy; baked into the jitted fn as const)."""
    rot_dim = int(head_dim * partial_rotary_factor)
    inv_freq = 1.0 / (
        rope_theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim)
    )
    if rope_scaling:
        rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
        if rtype == "llama3":
            # llama-3.1 frequency-dependent scaling
            factor = rope_scaling["factor"]
            low_freq_factor = rope_scaling["low_freq_factor"]
            high_freq_factor = rope_scaling["high_freq_factor"]
            old_ctx = rope_scaling["original_max_position_embeddings"]
            low_freq_wavelen = old_ctx / low_freq_factor
            high_freq_wavelen = old_ctx / high_freq_factor
            new_freqs = []
            for f in inv_freq:
                wavelen = 2 * math.pi / f
                if wavelen < high_freq_wavelen:
                    new_freqs.append(f)
                elif wavelen > low_freq_wavelen:
                    new_freqs.append(f / factor)
                else:
                    smooth = (old_ctx / wavelen - low_freq_factor) / (
                        high_freq_factor - low_freq_factor
                    )
                    new_freqs.append((1 - smooth) * f / factor + smooth * f)
            inv_freq = np.array(new_freqs, dtype=np.float64)
        elif rtype == "linear":
            inv_freq = inv_freq / rope_scaling["factor"]
        elif rtype == "yarn":
            # Exact YaRN (HF _compute_yarn_parameters): interpolate low
            # frequencies by 1/factor, keep high frequencies, with a
            # linear ramp between the beta_fast/beta_slow correction dims.
            factor = float(rope_scaling["factor"])
            orig = int(
                rope_scaling.get("original_max_position_embeddings", 4096)
            )
            beta_fast = float(rope_scaling.get("beta_fast", 32.0))
            beta_slow = float(rope_scaling.get("beta_slow", 1.0))

            def corr_dim(num_rot):
                return (
                    rot_dim
                    * math.log(orig / (num_rot * 2 * math.pi))
                    / (2 * math.log(rope_theta))
                )

            low = corr_dim(beta_fast)
            high = corr_dim(beta_slow)
            if not rope_scaling.get("truncate", True):
                pass  # gpt-oss: no floor/ceil truncation of the range
            else:
                low, high = math.floor(low), math.ceil(high)
            low = max(low, 0)
            high = min(high, rot_dim // 2 - 1)
            dims = np.arange(rot_dim // 2, dtype=np.float64)
            ramp = np.clip(
                (dims - low) / max(high - low, 0.001), 0.0, 1.0
            )
            extrap_mask = 1.0 - ramp
            inv_freq = (
                inv_freq / factor * (1.0 - extrap_mask)
                + inv_freq * extrap_mask
            )
        elif rtype in ("dynamic", "default", "", None):
            # dynamic-NTK: v1 approximates with the base freqs
            pass
    return inv_freq.astype(np.float32)


def rope_attention_factor(rope_scaling: Optional[Dict[str, Any]]) -> float:
    """YaRN attention scaling (``mscale``) multiplying cos/sin — HF
    ``attention_factor`` (default 0.1·ln(factor) + 1)."""
    if not rope_scaling:
        return 1.0
    rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
    if rtype != "yarn":
        return 1.0
    af = rope_scaling.get("attention_factor")
    if af is not None:
        return float(af)
    mscale = rope_scaling.get("mscale")
    if mscale is not None:
        return float(
            0.1 * float(mscale) * math.log(rope_scaling["factor"]) + 1.0
        )
    return float(0.1 * math.log(rope_scaling["factor"]) + 1.0)


def apply_rope(
    q: jnp.ndarray,  # [..., n_heads, head_dim]
    k: jnp.ndarray,  # [..., n_kv_heads, head_dim]
    positions: jnp.ndarray,  # broadcastable to q's leading dims: [...]
    inv_freq: jnp.ndarray,  # [rot_dim/2]
    rot_dim: Optional[int] = None,
    interleaved: bool = False,
):
    """Apply rotary embedding (HF 'half-split' layout by default)."""
    head_dim = q.shape[-1]
    rot_dim = rot_dim if rot_dim is not None else 2 * inv_freq.shape[0]

    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., rot/2]
    cos = jnp.cos(angles)[..., None, :]  # [..., 1, rot/2]
    sin = jnp.sin(angles)[..., None, :]

    def rotate(x):
        xf = x.astype(jnp.float32)
        if rot_dim < head_dim:
            x_rot, x_pass = xf[..., :rot_dim], xf[..., rot_dim:]
        else:
            x_rot, x_pass = xf, None
        if interleaved:
            x1 = x_rot[..., 0::2]
            x2 = x_rot[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.stack([o1, o2], axis=-1).reshape(x_rot.shape)
        else:
            half = rot_dim // 2
            x1 = x_rot[..., :half]
            x2 = x_rot[..., half:]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.concatenate([o1, o2], axis=-1)
        if x_pass is not None:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out.astype(x.dtype)

    return rotate(q), rotate(k)
