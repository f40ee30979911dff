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

NEG_INF = -1e10


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SamplingTensors:
    """Per-request sampling knobs, padded to the batch bucket."""

    temperature: jnp.ndarray  # [B] f32; 0 = greedy
    top_p: jnp.ndarray  # [B] f32
    top_k: jnp.ndarray  # [B] i32; -1 = disabled
    min_p: jnp.ndarray  # [B] f32


def make_sampling_tensors(reqs, B: int) -> SamplingTensors:
    """Assemble from a list of host Req objects, padded to bucket B."""
    import numpy as np

    temp = np.zeros(B, np.float32)
    top_p = np.ones(B, np.float32)
    top_k = np.full(B, -1, np.int32)
    min_p = np.zeros(B, np.float32)
    for i, r in enumerate(reqs):
        sp = r.sampling_params
        temp[i] = sp.temperature
        top_p[i] = sp.top_p
        top_k[i] = sp.top_k
        min_p[i] = sp.min_p
    return SamplingTensors(
        temperature=jnp.asarray(temp),
        top_p=jnp.asarray(top_p),
        top_k=jnp.asarray(top_k),
        min_p=jnp.asarray(min_p),
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
    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]

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
