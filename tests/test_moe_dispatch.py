"""EP token dispatch (all-to-all) vs the dense MoE reference.

Reference analogue: ``layers/moe/token_dispatcher/deepep.py`` +
``ep_moe/layer.py`` — replaced the replicate+psum EP fallback (round-2
VERDICT missing #3).  Runs on the 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_tpu.layers.moe import ep_dispatch_mlp, moe_block
from sglang_tpu.parallel.mesh import MeshContext, ParallelConfig


E, H, I, TOPK = 8, 32, 64, 2


def _weights(rng, scale=0.1):
    gate_w = rng.randn(H, E).astype(np.float32) * scale
    w1 = rng.randn(E, H, I).astype(np.float32) * scale
    w3 = rng.randn(E, H, I).astype(np.float32) * scale
    w2 = rng.randn(E, I, H).astype(np.float32) * scale
    return gate_w, w1, w3, w2


def _dense_ref(x, gate_w, w1, w3, w2, **kw):
    out = moe_block(
        jnp.asarray(x)[None], jnp.asarray(gate_w), jnp.asarray(w1),
        jnp.asarray(w3), jnp.asarray(w2), top_k=TOPK, **kw,
    )
    return np.asarray(out[0])


@pytest.mark.parametrize("tp,dp", [(4, 1), (2, 2)], ids=["tp4", "dp2tp2"])
def test_dispatch_parity(tp, dp):
    mesh = MeshContext(ParallelConfig(tp_size=tp, dp_size=dp)).mesh
    rng = np.random.RandomState(0)
    T = 16
    gate_w, w1, w3, w2 = _weights(rng)
    x = rng.randn(T, H).astype(np.float32) * 0.5

    y = ep_dispatch_mlp(
        jnp.asarray(x), jnp.asarray(gate_w), jnp.asarray(w1),
        jnp.asarray(w3), jnp.asarray(w2), mesh, top_k=TOPK,
    )
    ref = _dense_ref(x, gate_w, w1, w3, w2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_dispatch_unbalanced_routing():
    """All tokens routed to expert 0 (one owner rank receives everything):
    exercises the lossless worst-case receive capacity + sentinel sort."""
    mesh = MeshContext(ParallelConfig(tp_size=4)).mesh
    rng = np.random.RandomState(1)
    T = 16
    gate_w, w1, w3, w2 = _weights(rng)
    gate_w[:, 0] = 5.0  # expert 0 dominates; second choice varies
    x = np.abs(rng.randn(T, H).astype(np.float32)) * 0.5

    y = ep_dispatch_mlp(
        jnp.asarray(x), jnp.asarray(gate_w), jnp.asarray(w1),
        jnp.asarray(w3), jnp.asarray(w2), mesh, top_k=TOPK,
    )
    ref = _dense_ref(x, gate_w, w1, w3, w2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_dispatch_counts_match_dense():
    mesh = MeshContext(ParallelConfig(tp_size=4)).mesh
    rng = np.random.RandomState(2)
    T = 32
    gate_w, w1, w3, w2 = _weights(rng)
    x = rng.randn(T, H).astype(np.float32) * 0.5

    y, counts = ep_dispatch_mlp(
        jnp.asarray(x), jnp.asarray(gate_w), jnp.asarray(w1),
        jnp.asarray(w3), jnp.asarray(w2), mesh, top_k=TOPK,
        return_counts=True,
    )
    ref_out, ref_counts = moe_block(
        jnp.asarray(x)[None], jnp.asarray(gate_w), jnp.asarray(w1),
        jnp.asarray(w3), jnp.asarray(w2), top_k=TOPK, return_counts=True,
    )
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref_out[0]), rtol=1e-4, atol=1e-4
    )
    assert int(np.asarray(counts).sum()) == T * TOPK


def test_dispatch_sigmoid_bias_routing():
    """DeepSeek-V3 style sigmoid scoring + selection bias through the
    dispatch path."""
    mesh = MeshContext(ParallelConfig(tp_size=4)).mesh
    rng = np.random.RandomState(3)
    T = 16
    gate_w, w1, w3, w2 = _weights(rng)
    bias = rng.randn(E).astype(np.float32) * 0.1
    x = rng.randn(T, H).astype(np.float32) * 0.5
    kw = dict(scoring="sigmoid", gate_bias=jnp.asarray(bias),
              routed_scaling_factor=1.5)

    y = ep_dispatch_mlp(
        jnp.asarray(x), jnp.asarray(gate_w), jnp.asarray(w1),
        jnp.asarray(w3), jnp.asarray(w2), mesh, top_k=TOPK, **kw,
    )
    ref = _dense_ref(x, gate_w, w1, w3, w2, **kw)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_dispatch_comm_is_all_to_all_not_psum():
    """Comm-volume contract (VERDICT #9 'done' criterion): the compiled
    program moves tokens with ragged all-to-all whose operand is the
    PER-RANK pair slab [T/ep*topk, H], and contains no [T*topk, H]-wide
    all-reduce (the old replicate+psum signature)."""
    mesh = MeshContext(ParallelConfig(tp_size=4)).mesh
    rng = np.random.RandomState(4)
    T = 64
    gate_w, w1, w3, w2 = _weights(rng)
    x = jnp.asarray(rng.randn(T, H).astype(np.float32))

    def run(x):
        # force the real collective (auto picks the gather emulation on
        # CPU, where XLA has no ragged-all-to-all thunk); lowering still
        # works on CPU, execution is TPU-only
        return ep_dispatch_mlp(
            x, jnp.asarray(gate_w), jnp.asarray(w1), jnp.asarray(w3),
            jnp.asarray(w2), mesh, top_k=TOPK, a2a_impl="ragged",
        )

    text = jax.jit(run).lower(x).as_text()  # StableHLO MLIR
    assert "ragged_all_to_all" in text
    # per-rank dispatch operand: 16 tokens * topk2 = 32 rows, not 128
    n_l = T // 4 * TOPK
    assert f"ragged_all_to_all(%" in text and f"tensor<{n_l}x{H}xf32>" in text
    # the old replicate+psum path all-reduced the full [T*topk, H] slab;
    # no all_reduce may touch a full-batch-sized activation now
    for line in text.splitlines():
        if "all_reduce" in line:
            assert f"{T * TOPK}x{H}xf32" not in line, line


def _quantize(w):
    """Per-out-channel int8 quantization over the contraction dim."""
    s = np.abs(w).max(axis=1, keepdims=True)
    s = np.maximum(s, 1e-8) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


@pytest.mark.parametrize(
    "mode", ["dense", "ep", "a2a"], ids=["dense", "ep-psum", "ep-a2a"]
)
def test_int8_resident_scales_parity(mode):
    """INT8-RESIDENT expert slabs with per-out-channel scales through all
    three grouped-MLP paths: the scale applies to the ragged-dot OUTPUT
    (gathered per row's expert), so results must match the dequantized
    dense reference while the weights stay int8."""
    rng = np.random.RandomState(7)
    T = 16
    gate_w, w1, w3, w2 = _weights(rng)
    q1, s1 = _quantize(w1)
    q3, s3 = _quantize(w3)
    q2, s2 = _quantize(w2)
    x = rng.randn(T, H).astype(np.float32) * 0.5

    ref = _dense_ref(
        x, gate_w,
        q1.astype(np.float32) * s1,
        q3.astype(np.float32) * s3,
        q2.astype(np.float32) * s2,
    )
    scales = (jnp.asarray(s1), jnp.asarray(s3), jnp.asarray(s2))
    if mode == "dense":
        y = moe_block(
            jnp.asarray(x)[None], jnp.asarray(gate_w), jnp.asarray(q1),
            jnp.asarray(q3), jnp.asarray(q2), top_k=TOPK, scales=scales,
        )[0]
    else:
        mesh = MeshContext(ParallelConfig(tp_size=4)).mesh
        y = moe_block(
            jnp.asarray(x)[None], jnp.asarray(gate_w), jnp.asarray(q1),
            jnp.asarray(q3), jnp.asarray(q2), top_k=TOPK, scales=scales,
            mesh=mesh, expert_parallel=True, a2a=(mode == "a2a"),
        )[0]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)
