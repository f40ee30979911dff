"""Batched on-device sampling.

Equivalent role to the reference's ``layers/sampler.py:69`` +
``sampling/sampling_batch_info.py``: per-request temperature / top-k /
top-p / min-p applied to a [B, V] logits batch, one fused jitted program.

Strategy (TPU-tuned): a full [B, V] sort or categorical per step costs
~1.5 ms at V=128k (the categorical draws B*V gumbels), so sampling is
restricted to the top ``TOP_CAP`` logits via ``lax.top_k``, with top-k /
top-p / min-p expressed as masks over that subset using the FULL-vocab
logsumexp for exact probabilities.  Rows whose truncation boundary falls
within TOP_CAP (top_k <= cap, or top_p mass captured by the subset) are
sampled exactly; beyond it the tail is clipped — standard practice for
TPU serving samplers.  Reported logprobs are always exact (full-vocab
normalizer).
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


TOP_CAP = 64  # truncated-sampling window; boundary beyond this is clipped


def sample(
    logits: jnp.ndarray,  # [B, V] f32
    st: SamplingTensors,
    rng: jax.Array,  # PRNG key
    top_cap: int = TOP_CAP,
    all_greedy: bool = False,
):
    """Returns (tokens [B] i32, chosen-token logprobs [B] f32).

    ``all_greedy`` is a STATIC host-side hint (the scheduler knows every
    request's temperature): it compiles an argmax-only program with no
    top-k machinery at all.
    """
    B, V = logits.shape
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)  # [B, 1]
    if all_greedy:
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        chosen = jnp.take_along_axis(logits, tokens[:, None], axis=-1)
        return tokens, (chosen - lse).squeeze(-1)

    C = min(top_cap, V)
    greedy = st.temperature <= 0.0  # [B]
    temp = jnp.where(greedy, 1.0, st.temperature)[:, None]
    scaled = logits / temp
    lse_t = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)

    # Truncated path: top-C subset with exact full-vocab probabilities.
    # approx_max_k is the TPU-native PartialReduce — lax.top_k lowers to a
    # full [B, V] sort (~8 ms at V=128k, B=64); this is ~100x cheaper at
    # recall 0.95 over the tail (greedy rows below use an exact argmax).
    av, ai = jax.lax.approx_max_k(scaled, C, recall_target=0.95)
    order = jnp.argsort(-av, axis=-1)  # [B, C] — tiny sort
    top_vals = jnp.take_along_axis(av, order, axis=-1)
    top_idx = jnp.take_along_axis(ai, order, axis=-1)
    probs = jnp.exp(top_vals - lse_t)  # [B, C] true probs
    ranks = np.arange(C, dtype=np.int32)[None, :]  # np: avoid device const

    k = jnp.where(st.top_k < 0, C, st.top_k)[:, None]
    keep = ranks < k
    # top-p: keep tokens while cumulative prob (exclusive) < top_p
    cum = jnp.cumsum(probs, axis=-1)
    keep &= (cum - probs) < st.top_p[:, None]
    # min-p: prob >= min_p * p_max
    keep &= probs >= st.min_p[:, None] * probs[:, :1]
    keep = keep.at[:, 0].set(True)  # never mask the argmax

    masked = jnp.where(keep, top_vals, NEG_INF)
    sampled_rank = jax.random.categorical(rng, masked, axis=-1)  # [B]
    trunc_tokens = jnp.take_along_axis(
        top_idx, sampled_rank[:, None], axis=-1
    ).squeeze(-1)

    # Greedy rows take an EXACT argmax (approx_max_k could miss it).
    tokens = jnp.where(greedy, jnp.argmax(logits, axis=-1), trunc_tokens)

    # Logprob of the chosen token under the (temperature-scaled) distribution.
    chosen = jnp.take_along_axis(scaled, tokens[:, None], axis=-1)
    chosen_logprob = (chosen - lse_t).squeeze(-1)
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
