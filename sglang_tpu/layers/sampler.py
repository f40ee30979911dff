"""Batched on-device sampling.

Equivalent role to the reference's ``layers/sampler.py:69`` +
``sampling/sampling_batch_info.py``: per-request temperature / top-k /
top-p / min-p applied to a [B, V] logits batch, one fused jitted program.

Strategy: sort the vocab once (descending) and express top-k, top-p and
min-p as masks in sorted space, then sample a *rank* with the Gumbel trick
and map back through the sort permutation — one sort, no host sync.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e10


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SamplingTensors:
    """Per-request sampling knobs, padded to the batch bucket."""

    temperature: jnp.ndarray  # [B] f32; 0 = greedy
    top_p: jnp.ndarray  # [B] f32
    top_k: jnp.ndarray  # [B] i32; -1 = disabled
    min_p: jnp.ndarray  # [B] f32


def pack_sampling_params(reqs, B: int) -> np.ndarray:
    """Host-side: one [B, 4] f32 buffer (single transfer): temp/top_p/top_k/min_p."""
    buf = np.zeros((B, 4), np.float32)
    buf[:, 1] = 1.0  # top_p default
    buf[:, 2] = -1.0  # top_k disabled
    for i, r in enumerate(reqs):
        sp = r.sampling_params
        buf[i] = (sp.temperature, sp.top_p, float(sp.top_k), sp.min_p)
    return buf


def unpack_sampling_params(packed: jnp.ndarray) -> SamplingTensors:
    """In-jit: unpack the [B, 4] buffer."""
    return SamplingTensors(
        temperature=packed[:, 0],
        top_p=packed[:, 1],
        top_k=packed[:, 2].astype(jnp.int32),
        min_p=packed[:, 3],
    )


def sample(
    logits: jnp.ndarray,  # [B, V] f32
    st: SamplingTensors,
    rng: jax.Array,  # PRNG key
):
    """Returns (tokens [B] i32, chosen-token logprobs [B] f32)."""
    B, V = logits.shape
    greedy = st.temperature <= 0.0  # [B]
    temp = jnp.where(greedy, 1.0, st.temperature)[:, None]
    scaled = logits / temp

    # Sort descending once; all filters become rank-space masks.
    sorted_logits = -jnp.sort(-scaled, axis=-1)  # [B, V] desc
    sorted_idx = jnp.argsort(-scaled, axis=-1)  # [B, V]
    ranks = np.arange(V, dtype=np.int32)[None, :]  # np: avoid device const

    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)

    # top-k: keep ranks < k (k == -1 → all)
    k = jnp.where(st.top_k < 0, V, st.top_k)[:, None]
    keep = ranks < k
    # top-p: keep tokens while cumulative prob (exclusive) < top_p
    keep &= (cum - probs) < st.top_p[:, None]
    # min-p: prob >= min_p * p_max
    keep &= probs >= st.min_p[:, None] * probs[:, :1]
    keep = keep.at[:, 0].set(True)  # never mask the argmax

    masked = jnp.where(keep, sorted_logits, NEG_INF)
    sampled_rank = jax.random.categorical(rng, masked, axis=-1)  # [B]
    sampled_rank = jnp.where(greedy, 0, sampled_rank)
    tokens = jnp.take_along_axis(
        sorted_idx, sampled_rank[:, None], axis=-1
    ).squeeze(-1)

    # Logprob of the chosen token under the (temperature-scaled) distribution.
    logprobs_full = jax.nn.log_softmax(scaled, axis=-1)
    chosen_logprob = jnp.take_along_axis(
        logprobs_full, tokens[:, None], axis=-1
    ).squeeze(-1)
    return tokens.astype(jnp.int32), chosen_logprob


def apply_penalties(
    logits: jnp.ndarray,  # [B, V]
    output_counts: jnp.ndarray,  # [B, V] int32 counts of generated tokens
    presence_penalty: jnp.ndarray,  # [B]
    frequency_penalty: jnp.ndarray,  # [B]
    repetition_penalty: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """OpenAI-style presence/frequency + HF repetition penalties
    (reference: ``sampling/penaltylib/``)."""
    appeared = output_counts > 0
    logits = logits - st_cast(frequency_penalty)[:, None] * output_counts
    logits = logits - st_cast(presence_penalty)[:, None] * appeared
    rp = repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(appeared, penalized, logits)
    return logits


def st_cast(x):
    return x.astype(jnp.float32)
