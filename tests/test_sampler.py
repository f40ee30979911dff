"""Unit tests: on-device sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.sampler import SamplingTensors, sample


def make_st(B, temperature=1.0, top_p=1.0, top_k=-1, min_p=0.0):
    return SamplingTensors(
        temperature=jnp.full((B,), temperature, jnp.float32),
        top_p=jnp.full((B,), top_p, jnp.float32),
        top_k=jnp.full((B,), top_k, jnp.int32),
        min_p=jnp.full((B,), min_p, jnp.float32),
        presence_penalty=jnp.zeros((B,), jnp.float32),
        frequency_penalty=jnp.zeros((B,), jnp.float32),
        repetition_penalty=jnp.ones((B,), jnp.float32),
        min_new_remaining=jnp.zeros((B,), jnp.int32),
    )


def test_greedy_is_argmax():
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (4, 100))
    tokens, logprobs = sample(logits, make_st(4, temperature=0.0), rng)
    np.testing.assert_array_equal(np.asarray(tokens), np.argmax(logits, -1))
    assert np.all(np.asarray(logprobs) <= 0)


def test_top_k_1_is_argmax():
    rng = jax.random.PRNGKey(1)
    logits = jax.random.normal(rng, (4, 50))
    tokens, _ = sample(logits, make_st(4, temperature=1.0, top_k=1), rng)
    np.testing.assert_array_equal(np.asarray(tokens), np.argmax(logits, -1))


def test_top_k_restricts_support():
    rng = jax.random.PRNGKey(2)
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 64) * 3)
    top5 = set(np.argsort(-np.asarray(logits)[0])[:5].tolist())
    for i in range(20):
        t, _ = sample(logits, make_st(1, top_k=5), jax.random.PRNGKey(i))
        assert int(t[0]) in top5


def test_top_p_restricts_support():
    # One dominant token (prob > 0.99) → top_p=0.5 must always pick it.
    logits = jnp.zeros((1, 32)).at[0, 7].set(20.0)
    for i in range(10):
        t, _ = sample(
            logits, make_st(1, temperature=1.0, top_p=0.5), jax.random.PRNGKey(i)
        )
        assert int(t[0]) == 7


def test_temperature_spreads():
    logits = jnp.asarray(np.random.RandomState(1).randn(1, 256))
    seen = set()
    for i in range(30):
        t, _ = sample(
            logits, make_st(1, temperature=2.0), jax.random.PRNGKey(i)
        )
        seen.add(int(t[0]))
    assert len(seen) > 3  # sampling is actually stochastic


def test_mixed_greedy_and_sampling_batch():
    rng = jax.random.PRNGKey(3)
    logits = jax.random.normal(rng, (2, 100))
    st = SamplingTensors(
        temperature=jnp.asarray([0.0, 1.0], jnp.float32),
        top_p=jnp.asarray([1.0, 1.0], jnp.float32),
        top_k=jnp.asarray([-1, -1], jnp.int32),
        min_p=jnp.asarray([0.0, 0.0], jnp.float32),
        presence_penalty=jnp.zeros((2,), jnp.float32),
        frequency_penalty=jnp.zeros((2,), jnp.float32),
        repetition_penalty=jnp.ones((2,), jnp.float32),
        min_new_remaining=jnp.zeros((2,), jnp.int32),
    )
    tokens, _ = sample(logits, st, rng)
    assert int(tokens[0]) == int(jnp.argmax(logits[0]))
