"""Penalty math (device fns) + engine-level effect of penalties."""

import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.sampler import (
    SamplingTensors,
    apply_penalties,
    build_penalty_state,
    needs_penalties,
    pack_penalty_table,
    pack_sampling_params,
    suppress_eos,
    unpack_sampling_params,
    update_penalty_state,
)


class _FakeReq:
    def __init__(self, sp, origin, out):
        from sglang_tpu.core.sampling_params import SamplingParams

        self.sampling_params = SamplingParams.from_dict(sp)
        self.origin_input_ids = origin
        self.output_ids = out


def _st(B, **kw):
    base = dict(
        temperature=jnp.ones((B,)),
        top_p=jnp.ones((B,)),
        top_k=jnp.full((B,), -1, jnp.int32),
        min_p=jnp.zeros((B,)),
        presence_penalty=jnp.zeros((B,)),
        frequency_penalty=jnp.zeros((B,)),
        repetition_penalty=jnp.ones((B,)),
        min_new_remaining=jnp.zeros((B,), jnp.int32),
    )
    base.update({k: jnp.asarray(v) for k, v in kw.items()})
    return SamplingTensors(**base)


def test_penalty_state_roundtrip():
    reqs = [
        _FakeReq({"frequency_penalty": 0.5}, origin=[1, 2, 2], out=[3, 3, 3, 4]),
        _FakeReq({}, origin=[7], out=[]),
    ]
    assert needs_penalties(reqs)
    table = pack_penalty_table(reqs, B=2)
    counts, appeared = build_penalty_state(jnp.asarray(table), V=16)
    counts, appeared = np.asarray(counts), np.asarray(appeared)
    assert counts[0, 3] == 3 and counts[0, 4] == 1
    assert counts[0, 1] == 0 and counts[0, 2] == 0  # prompt only
    assert appeared[0, 1] == 1 and appeared[0, 2] == 1 and appeared[0, 3] == 1
    assert appeared[1, 7] == 1 and counts[1].sum() == 0


def test_apply_penalties_math():
    B, V = 2, 8
    logits = jnp.zeros((B, V)) + 1.0
    counts = jnp.zeros((B, V)).at[0, 2].set(3.0)
    appeared = jnp.zeros((B, V)).at[0, 2].set(1.0).at[0, 3].set(1.0)
    st = _st(
        B,
        presence_penalty=np.array([0.5, 0.0], np.float32),
        frequency_penalty=np.array([0.25, 0.0], np.float32),
        repetition_penalty=np.array([2.0, 1.0], np.float32),
    )
    out = np.asarray(apply_penalties(logits, counts, appeared, st))
    # token 2: 1.0 - 0.25*3 - 0.5 = -0.25 → appeared → *2 (negative) = -0.5
    np.testing.assert_allclose(out[0, 2], -0.5, rtol=1e-6)
    # token 3: prompt-only → only repetition: 1.0 / 2 = 0.5
    np.testing.assert_allclose(out[0, 3], 0.5, rtol=1e-6)
    # untouched token and untouched row
    np.testing.assert_allclose(out[0, 4], 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-6)


def test_update_penalty_state():
    counts = jnp.zeros((2, 8))
    appeared = jnp.zeros((2, 8))
    counts, appeared = update_penalty_state(
        counts, appeared, jnp.asarray([5, 1], jnp.int32)
    )
    counts, appeared = update_penalty_state(
        counts, appeared, jnp.asarray([5, 2], jnp.int32)
    )
    assert np.asarray(counts)[0, 5] == 2
    assert np.asarray(appeared)[1, 1] == 1 and np.asarray(counts)[1, 2] == 1


def test_suppress_eos():
    logits = jnp.zeros((2, 8))
    eos_mask = np.zeros(8, bool)
    eos_mask[7] = True
    out = np.asarray(
        suppress_eos(logits, jnp.asarray([3, 0], jnp.int32), eos_mask)
    )
    assert out[0, 7] < -1e9 and out[1, 7] == 0.0


def test_pack_unpack_sampling_params():
    r = _FakeReq(
        {
            "temperature": 0.5,
            "top_p": 0.9,
            "top_k": 40,
            "presence_penalty": 0.1,
            "frequency_penalty": 0.2,
            "repetition_penalty": 1.3,
            "min_new_tokens": 4,
        },
        origin=[1],
        out=[2],
    )
    buf = pack_sampling_params([r], B=2)
    st = unpack_sampling_params(jnp.asarray(buf))
    assert float(st.temperature[0]) == 0.5
    assert int(st.top_k[0]) == 40
    assert abs(float(st.repetition_penalty[0]) - 1.3) < 1e-6
    assert int(st.min_new_remaining[0]) == 3  # 4 - 1 generated
    # padded row defaults: repetition 1, top_p 1
    assert float(st.repetition_penalty[1]) == 1.0


def test_engine_penalties_change_output(tiny_engine):
    """Greedy + strong repetition penalty must diverge from plain greedy."""
    eng = tiny_engine
    prompt = [5, 6, 7, 8, 9, 10]
    base = eng.generate(
        input_ids=prompt,
        sampling_params={
            "temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True,
        },
    )
    pen = eng.generate(
        input_ids=prompt,
        sampling_params={
            "temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True,
            "repetition_penalty": 5.0, "frequency_penalty": 2.0,
        },
    )
    assert base["output_ids"] != pen["output_ids"]
    # penalized output should repeat less
    assert len(set(pen["output_ids"])) >= len(set(base["output_ids"]))
