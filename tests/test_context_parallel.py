"""CP (zigzag prefill) + DCP (decode KV sharding, LSE merge) on the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sglang_tpu.layers.context_parallel import (
    cp_prefill_attention,
    dcp_attention,
    zigzag_merge,
    zigzag_split,
)


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.asarray(jax.devices()[:n]), ("tp",))


def _ref_attention(q, k, v, valid, scale):
    scores = np.einsum("bhd,bchd->bhc", q, k) * scale
    scores = np.where(valid[:, None, :], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = np.where(valid[:, None, :], p, 0.0)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhc,bchd->bhd", p, v)


def test_zigzag_split_roundtrip():
    order = zigzag_split(16, 2)
    inv = zigzag_merge(16, 2)
    x = np.arange(16)
    np.testing.assert_array_equal(x[order][inv], x)
    # rank 0 owns chunks 0 and 3; rank 1 owns 1 and 2
    np.testing.assert_array_equal(order[:8], [0, 1, 2, 3, 12, 13, 14, 15])


def test_dcp_attention_matches_dense():
    mesh = _mesh(4)
    rng = np.random.RandomState(0)
    B, C, H, D = 2, 32, 4, 16
    q = rng.randn(B, H, D).astype(np.float32) * 0.3
    k = rng.randn(B, C, H, D).astype(np.float32) * 0.3
    v = rng.randn(B, C, H, D).astype(np.float32) * 0.3
    valid = np.zeros((B, C), bool)
    valid[0, :19] = True
    valid[1, :5] = True
    out = dcp_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid),
        0.25, mesh,
    )
    ref = _ref_attention(q, k, v, valid, 0.25)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_cp_prefill_matches_dense_causal():
    mesh = _mesh(2)
    cp = 2
    rng = np.random.RandomState(1)
    B, L, H, D = 1, 16, 2, 8
    q = rng.randn(B, L, H, D).astype(np.float32) * 0.4
    k = rng.randn(B, L, H, D).astype(np.float32) * 0.4
    v = rng.randn(B, L, H, D).astype(np.float32) * 0.4
    # dense causal reference in original order
    scores = np.einsum("blhd,bchd->bhlc", q, k) * 0.35
    causal = np.tril(np.ones((L, L), bool))
    scores = np.where(causal[None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = np.where(causal[None, None], p, 0.0)
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhlc,bchd->blhd", p, v)

    order = zigzag_split(L, cp)
    inv = zigzag_merge(L, cp)
    pos = np.broadcast_to(order[None, :], (B, L)).astype(np.int32)
    out_z = cp_prefill_attention(
        jnp.asarray(q[:, order]), jnp.asarray(k[:, order]),
        jnp.asarray(v[:, order]), jnp.asarray(pos), 0.35, mesh,
    )
    out = np.asarray(out_z)[:, inv]
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("force_ring", [False, True])
def test_cp_prefill_ring_flash_matches_dense(monkeypatch, force_ring):
    """The ring+flash path (engaged past RING_THRESHOLD local tokens,
    forced here) must match the dense path bit-for-tolerance."""
    import sglang_tpu.layers.context_parallel as cpmod

    if force_ring:
        monkeypatch.setattr(cpmod, "RING_THRESHOLD", 1)
    mesh = _mesh(4)
    cp = 4
    rng = np.random.RandomState(7)
    B, L, H, D = 2, 64, 2, 16
    q = rng.randn(B, L, H, D).astype(np.float32) * 0.4
    k = rng.randn(B, L, H, D).astype(np.float32) * 0.4
    v = rng.randn(B, L, H, D).astype(np.float32) * 0.4
    scores = np.einsum("blhd,bchd->bhlc", q, k) * 0.3
    causal = np.tril(np.ones((L, L), bool))
    scores = np.where(causal[None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = np.where(causal[None, None], p, 0.0)
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhlc,bchd->blhd", p, v)

    order = zigzag_split(L, cp)
    inv = zigzag_merge(L, cp)
    pos = np.broadcast_to(order[None, :], (B, L)).astype(np.int32)
    out_z = cpmod.cp_prefill_attention(
        jnp.asarray(q[:, order]), jnp.asarray(k[:, order]),
        jnp.asarray(v[:, order]), jnp.asarray(pos), 0.3, mesh,
    )
    out = np.asarray(out_z)[:, inv]
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


def test_cp_prefill_ring_flash_long_shard():
    """A real >=RING_THRESHOLD-per-rank case (L=4096, cp=2): the ring
    path engages on its own and matches the allgather-dense compute."""
    import sglang_tpu.layers.context_parallel as cpmod

    mesh = _mesh(2)
    cp = 2
    rng = np.random.RandomState(3)
    B, L, H, D = 1, 4096, 1, 16
    q = (rng.randn(B, L, H, D) * 0.2).astype(np.float32)
    k = (rng.randn(B, L, H, D) * 0.2).astype(np.float32)
    v = (rng.randn(B, L, H, D) * 0.2).astype(np.float32)
    order = zigzag_split(L, cp)
    inv = zigzag_merge(L, cp)
    pos = np.broadcast_to(order[None, :], (B, L)).astype(np.int32)
    out_z = cpmod.cp_prefill_attention(
        jnp.asarray(q[:, order]), jnp.asarray(k[:, order]),
        jnp.asarray(v[:, order]), jnp.asarray(pos), 0.25, mesh,
    )
    out = np.asarray(out_z)[:, inv]
    # spot-check rows against a dense numpy reference (full L x L is
    # fine at 4096 in f64 numpy, but row-subset keeps the test fast)
    rows = [0, 1, 513, 2047, 4095]
    scores = np.einsum("lhd,chd->hlc", q[0, rows], k[0]) * 0.25
    mask = np.arange(L)[None, None, :] <= np.asarray(rows)[None, :, None]
    scores = np.where(mask, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = np.where(mask, p, 0.0)
    p /= p.sum(-1, keepdims=True)
    ref_rows = np.einsum("hlc,chd->lhd", p, v[0])
    np.testing.assert_allclose(out[0, rows], ref_rows, rtol=1e-4, atol=1e-4)


def test_cp_prefill_prefix_ring_and_dense():
    """Cached-prefix fold: CP attention over a chunk whose earlier KV
    (prefix) is passed replicated must match dense attention over
    prefix+chunk — on BOTH the dense path (short shard) and the ring
    path (>= RING_THRESHOLD per rank)."""
    import sglang_tpu.layers.context_parallel as cpmod

    mesh = _mesh(2)
    cp = 2
    for L, Cp in ((64, 48), (4096, 128)):  # dense; ring
        rng = np.random.RandomState(L)
        B, H, D = 1, 1, 16
        q = (rng.randn(B, L, H, D) * 0.2).astype(np.float32)
        k = (rng.randn(B, L, H, D) * 0.2).astype(np.float32)
        v = (rng.randn(B, L, H, D) * 0.2).astype(np.float32)
        # prefix buffer: Cp slots, only pfx_len valid (rest garbage)
        pfx_len = Cp - 5
        kp = (rng.randn(B, Cp, H, D) * 0.2).astype(np.float32)
        vp = (rng.randn(B, Cp, H, D) * 0.2).astype(np.float32)
        cpos = np.arange(Cp, dtype=np.int32)
        pfx_pos = np.where(cpos < pfx_len, cpos, 1 << 30)[None]
        order = zigzag_split(L, cp)
        inv = zigzag_merge(L, cp)
        # chunk positions start after the prefix
        pos = np.broadcast_to(
            (order + pfx_len)[None, :], (B, L)
        ).astype(np.int32)
        out_z = cpmod.cp_prefill_attention(
            jnp.asarray(q[:, order]), jnp.asarray(k[:, order]),
            jnp.asarray(v[:, order]), jnp.asarray(pos), 0.25, mesh,
            prefix=(
                jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(pfx_pos)
            ),
        )
        out = np.asarray(out_z)[:, inv]
        # dense reference over [valid prefix | chunk]
        k_all = np.concatenate([kp[:, :pfx_len], k], axis=1)
        v_all = np.concatenate([vp[:, :pfx_len], v], axis=1)
        rows = [0, 1, L // 2, L - 1]
        scores = np.einsum("lhd,chd->hlc", q[0, rows], k_all[0]) * 0.25
        kpos = np.arange(pfx_len + L)
        qpos = np.asarray(rows) + pfx_len
        mask = kpos[None, None, :] <= qpos[None, :, None]
        scores = np.where(mask, scores, -1e30)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p = np.where(mask, p, 0.0)
        p /= p.sum(-1, keepdims=True)
        ref_rows = np.einsum("hlc,chd->lhd", p, v_all[0])
        np.testing.assert_allclose(
            out[0, rows], ref_rows, rtol=3e-4, atol=3e-4,
            err_msg=f"L={L}",
        )


# -------------------------------------------------- serving-path wiring
def _cp_engine(cp_size):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import TINY_HF_CONFIG, make_server_args

    args = make_server_args(cp_size=cp_size, chunked_prefill_size=256)
    cfg = ModelConfig.from_hf_dict(
        TINY_HF_CONFIG, model_path="dummy://tiny", dtype="float32"
    )
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def test_cp_prefill_serving_path_matches_dense():
    """cp_size=2: full-prompt prefill runs sequence-sharded over the cp
    mesh axis with zigzag host packing; outputs (prefill sample AND the
    subsequent paged decode over the CP-written KV) must match the
    cp=1 engine token-for-token."""
    e1 = _cp_engine(1)
    e2 = _cp_engine(2)
    try:
        runner2 = e2.scheduler.runner
        assert runner2.mesh_ctx.parallel.cp_size == 2
        prompt = list(range(5, 5 + 40))  # long-ish single-chunk prompt
        sp = {"max_new_tokens": 12, "temperature": 0.0,
              "return_logprob": True, "ignore_eos": True}
        o1 = e1.generate(input_ids=prompt, sampling_params=sp)
        o2 = e2.generate(input_ids=prompt, sampling_params=sp)
        assert o1["output_ids"] == o2["output_ids"], (
            o1["output_ids"], o2["output_ids"])
        l1 = [t[0] for t in o1["meta_info"]["output_token_logprobs"]]
        l2 = [t[0] for t in o2["meta_info"]["output_token_logprobs"]]
        import numpy as np

        np.testing.assert_allclose(l1, l2, rtol=2e-4, atol=2e-4)
        # the CP variant actually compiled (an extend fn keyed use_cp)
        assert any(k[-2] for k in runner2._extend_fns), (  # use_cp slot
            runner2._extend_fns.keys())
        # a second turn reuses the radix prefix (cached_len > 0) → CP
        # now runs WITH the prefix folded from the pages (use_cp=2) and
        # must stay exact
        o3 = e2.generate(
            input_ids=prompt + o2["output_ids"] + [9, 9],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        o4 = e1.generate(
            input_ids=prompt + o1["output_ids"] + [9, 9],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert o3["output_ids"] == o4["output_ids"]
        assert any(k[-2] == 2 for k in runner2._extend_fns), (  # use_cp slot
            runner2._extend_fns.keys())
    finally:
        e1.shutdown()
        e2.shutdown()


def test_cp_prefill_chunked_prompt_matches_dense():
    """A prompt longer than chunked_prefill_size prefills in multiple
    chunks under cp=2: chunk 1 is prefix-free, later chunks fold the
    earlier chunks' paged KV into the CP accumulators (use_cp=2) —
    token-exact vs the cp=1 engine."""
    import numpy as np

    e1 = _cp_engine(1)
    e2 = _cp_engine(2)
    try:
        runner2 = e2.scheduler.runner
        prompt = [(11 * i) % 490 + 1 for i in range(300)]  # > 256 chunk
        sp = {"max_new_tokens": 8, "temperature": 0.0,
              "return_logprob": True, "ignore_eos": True}
        o1 = e1.generate(input_ids=list(prompt), sampling_params=dict(sp))
        o2 = e2.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert o1["output_ids"] == o2["output_ids"], (
            o1["output_ids"], o2["output_ids"])
        l1 = [t[0] for t in o1["meta_info"]["output_token_logprobs"]]
        l2 = [t[0] for t in o2["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(l1, l2, rtol=2e-4, atol=2e-4)
        assert any(k[-2] == 2 for k in runner2._extend_fns), (  # use_cp slot
            runner2._extend_fns.keys())
    finally:
        e1.shutdown()
        e2.shutdown()
