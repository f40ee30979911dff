"""Quantization: HF format unpack, canonical repack, fused GEMM parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_tpu.layers.quantization import (
    AWQ_ORDER,
    PACK_BLOCK,
    QuantConfig,
    awq_repack_qweight,
    awq_unpack_qzeros,
    dequant_int4,
    gptq_repack_qweight,
    make_gptq_unpack_qzeros,
    pack_int4,
    pad_scales,
    quant_linear,
    unpack_awq_int32,
    unpack_gptq_qweight,
    unpack_int4,
)


def pack_awq_int32(q: np.ndarray) -> np.ndarray:
    """Produce genuine AutoAWQ packing (int32, interleaved nibble order)."""
    r, c = q.shape
    out = np.zeros((r, c // 8), np.uint32)
    for i in range(8):
        out |= (q[:, AWQ_ORDER[i]::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.astype(np.int32)


def pack_gptq_qweight(q: np.ndarray) -> np.ndarray:
    """Genuine GPTQ row packing (int32 along input dim, sequential)."""
    r, c = q.shape
    out = np.zeros((r // 8, c), np.uint32)
    for i in range(8):
        out |= (q[i::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.astype(np.int32)


def pack_gptq_qzeros(z: np.ndarray, v2=False) -> np.ndarray:
    zz = z if v2 else z - 1
    r, c = zz.shape
    out = np.zeros((r, c // 8), np.uint32)
    for i in range(8):
        out |= (zz[:, i::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.astype(np.int32)


def test_pack_int4_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randint(0, 16, (64, 2 * PACK_BLOCK), np.uint8)
    np.testing.assert_array_equal(unpack_int4(pack_int4(q)), q)


def test_awq_unpack_roundtrip():
    rng = np.random.RandomState(1)
    q = rng.randint(0, 16, (32, 64), np.uint8)
    np.testing.assert_array_equal(unpack_awq_int32(pack_awq_int32(q)), q)


def test_gptq_unpack_roundtrip():
    rng = np.random.RandomState(2)
    q = rng.randint(0, 16, (64, 32), np.uint8)
    np.testing.assert_array_equal(unpack_gptq_qweight(pack_gptq_qweight(q)), q)


def _make_ref_quant(rng, K, N, g):
    """Random group-quantized weight + its exact dequantized matrix."""
    q = rng.randint(0, 16, (K, N), np.uint8)
    scales = (rng.rand(K // g, N).astype(np.float32) + 0.5) * 0.02
    zeros = rng.randint(0, 16, (K // g, N), np.uint8)
    wd = (
        q.astype(np.float32) - np.repeat(zeros, g, 0).astype(np.float32)
    ) * np.repeat(scales, g, 0)
    return q, scales, zeros, wd


def test_awq_checkpoint_to_canonical_dequant():
    """AWQ wire tensors → canonical pack → dequant == direct dequant."""
    rng = np.random.RandomState(3)
    K, N, g = 128, PACK_BLOCK, 32
    q, scales, zeros, wd = _make_ref_quant(rng, K, N, g)
    qweight = pack_awq_int32(q)
    qzeros = pack_awq_int32(zeros)

    canon_qw = awq_repack_qweight(qweight)
    canon_z = awq_unpack_qzeros(qzeros)
    canon_s = pad_scales(scales)
    got = np.asarray(
        dequant_int4(
            jnp.asarray(canon_qw), jnp.asarray(canon_s), jnp.asarray(canon_z),
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, wd, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("v2", [False, True])
def test_gptq_checkpoint_to_canonical_dequant(v2):
    rng = np.random.RandomState(4)
    K, N, g = 128, PACK_BLOCK, 64
    q, scales, zeros, _ = _make_ref_quant(rng, K, N, g)
    zeros = np.clip(zeros, 1, 15)  # legacy format stores z-1 in 4 bits
    wd = (
        q.astype(np.float32) - np.repeat(zeros, g, 0).astype(np.float32)
    ) * np.repeat(scales, g, 0)
    canon_qw = gptq_repack_qweight(pack_gptq_qweight(q))
    canon_z = make_gptq_unpack_qzeros(v2)(pack_gptq_qzeros(zeros, v2))
    canon_s = pad_scales(scales)
    got = np.asarray(
        dequant_int4(
            jnp.asarray(canon_qw), jnp.asarray(canon_s), jnp.asarray(canon_z),
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, wd, rtol=1e-5, atol=1e-6)


def test_int4_matmul_kernel_parity():
    """Pallas fused int4 GEMM (interpret mode) == XLA dequant matmul."""
    from sglang_tpu.ops.quant_gemm import int4_matmul

    rng = np.random.RandomState(5)
    T, K, N, g = 24, 1024, 1024, 128
    q, scales, zeros, wd = _make_ref_quant(rng, K, N, g)
    x = rng.randn(T, K).astype(np.float32) * 0.1
    qw = pack_int4(q)
    got = np.asarray(
        int4_matmul(
            jnp.asarray(x, jnp.bfloat16),
            jnp.asarray(qw),
            jnp.asarray(scales),
            jnp.asarray(zeros.astype(np.float32)),
            interpret=True,
        )
    ).astype(np.float32)
    ref = x.astype(np.float32) @ wd
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_fp8_matmul_kernel_parity():
    from sglang_tpu.ops.quant_gemm import fp8_matmul

    rng = np.random.RandomState(6)
    T, K, N = 8, 512, 512
    w = rng.randn(K, N).astype(np.float32) * 0.05
    scale = np.abs(w).max(axis=0, keepdims=True) / 448.0
    qw = (w / scale).astype(jnp.float8_e4m3fn)
    x = rng.randn(T, K).astype(np.float32) * 0.1
    got = np.asarray(
        fp8_matmul(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
            jnp.asarray(scale), interpret=True,
        )
    ).astype(np.float32)
    ref = x @ (np.asarray(qw.astype(jnp.float32)) * scale)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_w8a8_int8_linear():
    rng = np.random.RandomState(7)
    K, N, T = 256, 128, 4
    w = rng.randn(K, N).astype(np.float32) * 0.05
    scale = np.abs(w).max(axis=0, keepdims=True) / 127.0
    qw = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    x = rng.randn(T, K).astype(np.float32)
    got = np.asarray(
        quant_linear(
            jnp.asarray(x),
            {"qw": jnp.asarray(qw), "scale": jnp.asarray(scale)},
            "w8a8_int8",
        )
    )
    ref = x @ (qw.astype(np.float32) * scale)
    # int8 act quant noise ~1/127 per element
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05 * np.abs(ref).max())


def test_quant_config_parsing():
    cfg = QuantConfig.from_hf(
        {"quantization_config": {"quant_method": "awq", "bits": 4,
                                 "group_size": 128, "version": "gemm"}}
    )
    assert cfg.method == "awq" and cfg.bits == 4 and cfg.group_size == 128
    cfg = QuantConfig.from_hf(
        {"quantization_config": {"quant_method": "gptq", "bits": 4,
                                 "group_size": 64, "sym": True,
                                 "checkpoint_format": "gptq_v2"}}
    )
    assert cfg.method == "gptq" and cfg.gptq_v2
    cfg = QuantConfig.from_hf(
        {"quantization_config": {"quant_method": "fp8",
                                 "activation_scheme": "dynamic"}}
    )
    assert cfg.method == "fp8"
    assert QuantConfig.from_hf({}) is None
