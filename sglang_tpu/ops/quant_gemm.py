"""Pallas fused dequant × matmul kernels (INT4 group-quant and FP8).

Equivalent role to the reference's quantized GEMMs
(``sgl-kernel/csrc/gemm/awq_kernel.cu``, ``fp8_gemm_kernel.cu``,
``int8_gemm_kernel.cu``) — TPU-native: decode-time linear layers are
weights-HBM-bandwidth bound, so the win is reading the PACKED weight from
HBM and dequantizing to bf16 in VMEM, fused into the MXU matmul.  The
bf16 weight copy never exists in HBM: INT4 moves 4x fewer weight bytes
than bf16, FP8 2x.

Layouts (see ``layers/quantization.py``):
* INT4: ``qw`` uint8 [K, N/2], two 4-bit output columns per byte in
  block-local split-half order with PACK_BLOCK=512 — each 512-wide output
  tile unpacks with two vector ops and ONE lane-dim concat (no
  cross-lane shuffles).  ``scale``/``zero`` f32 [K/g, N].
* FP8: ``qw`` float8_e4m3fn [K, N], ``scale`` f32 [1, N] (per-channel;
  per-tensor scales are broadcast to [1, N] at load).

Grid: (T-blocks, N-blocks, K-blocks), K innermost ("arbitrary") with an
f32 VMEM accumulator that persists across K steps; the output tile is
written on the last K step.  Pallas auto-pipelining double-buffers the
packed-weight DMAs, so the kernel streams at HBM speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_tpu.layers.quantization import PACK_BLOCK

BN = PACK_BLOCK  # default output tile (split-half unpack stays local)
BK = 512  # default fp8 reduction tile; int4 derives its own from group size


def _pick_tile(dim: int, candidates=(512, 256, 128)) -> int:
    """Largest Mosaic-friendly tile dividing ``dim`` (0 = none fits).

    Under tensor parallelism the per-shard K/N spans are the global dims
    divided by the mesh axis size and are often 128-aligned but not
    512-aligned (e.g. 14336/8 = 1792 = 7*256); the kernels adapt their
    tile rather than forcing callers onto the XLA dequant path."""
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def _int4_groups(KG: int) -> int:
    """Groups covered per K block: 8 rows (sublane tile) when the group
    axis is 8-divisible, else the WHOLE axis (a [KG, BN] block slice is
    sublane-legal only in those two forms)."""
    return 8 if KG % 8 == 0 else KG


def _int4_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_scr):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    bk = qw_ref.shape[0]
    n_groups = s_ref.shape[0]
    g = bk // n_groups

    @pl.when(ki == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Dequantization FACTORS OUT of the matmul:
    #   y[m,n] = Σ_g s[g,n]·(Σ_{k∈g} x[m,k]·q[k,n]) − Σ_g s[g,n]z[g,n]·xsum[m,g]
    # so the kernel matmuls the RAW 4-bit levels per group on the MXU and
    # applies (scale, scale·zero) in a tiny [BT, BN] epilogue — the VPU
    # only pays unpack+convert (~3 ops/weight vs ~6 for materialized
    # dequant), which dominated this bandwidth-bound GEMM.
    # (Mosaic supports uint8→int32 casts but not uint8→float or uint8
    # shifts; widen first, then unpack in int32.)
    w32 = qw_ref[...].astype(jnp.int32)  # [bk, BN/2]
    lo = w32 & 0xF
    hi = (w32 >> 4) & 0xF
    wq = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)  # [bk, BN]
    s = s_ref[...]  # [n_groups, BN] f32
    z = z_ref[...]
    x = x_ref[...].astype(jnp.bfloat16)  # [BT, bk]
    acc = acc_scr[...]
    for gi in range(n_groups):
        xg = x[:, gi * g : (gi + 1) * g]
        part = jnp.dot(
            xg, wq[gi * g : (gi + 1) * g, :],
            preferred_element_type=jnp.float32,
        )  # [BT, BN]
        xsum = jnp.sum(
            xg.astype(jnp.float32), axis=1, keepdims=True
        )  # [BT, 1]
        acc = acc + part * s[gi][None, :] - xsum * (s[gi] * z[gi])[None, :]
    acc_scr[...] = acc

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "pack_block"))
def int4_matmul(
    x: jnp.ndarray,  # [T, K]
    qw: jnp.ndarray,  # uint8 [K, N/2] canonical packed
    scale: jnp.ndarray,  # f32 [K/g, N]
    zero: jnp.ndarray,  # f32 [K/g, N]
    interpret: bool = False,
    pack_block: int = PACK_BLOCK,
) -> jnp.ndarray:
    T, K = x.shape
    N = qw.shape[1] * 2
    KG = scale.shape[0]
    g = K // KG
    BN = pack_block  # output tile == pack block: split-half unpack is local
    # The scale/zero block must be sublane-legal: either 8-row divisible
    # or the whole group axis.  Cover 8 group rows per K block (or all).
    n_groups = _int4_groups(KG)
    bk = n_groups * g
    if K % bk or N % BN or K != KG * g or bk > 8192:
        raise ValueError(f"int4_matmul: non-conforming shapes K={K} N={N} g={g}")

    BT = min(256, max(16, -(-T // 16) * 16))
    Tp = -(-T // BT) * BT
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))

    grid = (Tp // BT, N // BN, K // bk)
    out = pl.pallas_call(
        _int4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, bk), lambda t, n, k: (t, k)),
            pl.BlockSpec((bk, BN // 2), lambda t, n, k: (k, n)),
            pl.BlockSpec((n_groups, BN), lambda t, n, k: (k, n)),
            pl.BlockSpec((n_groups, BN), lambda t, n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((BT, BN), lambda t, n, k: (t, n)),
        out_shape=jax.ShapeDtypeStruct((Tp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BT, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * N,
            bytes_accessed=K * N // 2 + Tp * K * 2 + Tp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qw, scale, zero)
    return out[:T] if Tp != T else out


def _fp8_kernel(x_ref, qw_ref, s_ref, o_ref, acc_scr):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # The per-out-channel scale FACTORS OUT of the contraction:
    # y[m,n] = s[n]·Σ_k x·w8 — so the matmul runs on the raw fp8 levels
    # (one convert per weight, the only VPU touch) and the scale lands in
    # a [BT, BN] epilogue on the final K step.  Scaling each weight
    # in-kernel cost 3 VPU ops/elem and made fp8 SLOWER than bf16.
    wd = qw_ref[...].astype(jnp.bfloat16)
    acc_scr[...] += jnp.dot(
        x_ref[...].astype(jnp.bfloat16), wd,
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = (
            acc_scr[...] * s_ref[...].astype(jnp.float32)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fp8_matmul(
    x: jnp.ndarray,  # [T, K]
    qw: jnp.ndarray,  # fp8 [K, N]
    scale: jnp.ndarray,  # f32 [1, N]
    interpret: bool = False,
) -> jnp.ndarray:
    T, K = x.shape
    N = qw.shape[1]
    BK = _pick_tile(K)
    BN = _pick_tile(N)
    if not BK or not BN:
        raise ValueError(f"fp8_matmul: non-conforming shapes K={K} N={N}")

    BT = min(256, max(16, -(-T // 16) * 16))
    Tp = -(-T // BT) * BT
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))

    grid = (Tp // BT, N // BN, K // BK)
    out = pl.pallas_call(
        _fp8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, BK), lambda t, n, k: (t, k)),
            pl.BlockSpec((BK, BN), lambda t, n, k: (k, n)),
            pl.BlockSpec((1, BN), lambda t, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((BT, BN), lambda t, n, k: (t, n)),
        out_shape=jax.ShapeDtypeStruct((Tp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BT, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * N,
            bytes_accessed=K * N + Tp * K * 2 + Tp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qw, scale)
    return out[:T] if Tp != T else out


# ---------------------------------------------------------------------------
# Stacked-layer variants: the [L, ...] quantized weight stacks stay OUT of
# the lax.scan xs (scan's dynamic-slice would materialize a full copy of
# every layer's packed weights per step — profiler-verified ~30% of the
# 8B-AWQ decode step); the kernel indexes the layer via scalar prefetch.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("interpret", "pack_block"))
def int4_matmul_stacked(
    x: jnp.ndarray,  # [T, K]
    qw: jnp.ndarray,  # uint8 [L, K, N/2]
    scale: jnp.ndarray,  # f32 [L, K/g, N]
    zero: jnp.ndarray,  # f32 [L, K/g, N]
    layer_idx: jnp.ndarray,  # scalar int32
    interpret: bool = False,
    pack_block: int = PACK_BLOCK,
) -> jnp.ndarray:
    T, K = x.shape
    L, _, N2 = qw.shape
    N = N2 * 2
    KG = scale.shape[1]
    g = K // KG
    BN = pack_block
    n_groups = _int4_groups(KG)
    bk = n_groups * g
    if K % bk or N % BN or K != KG * g or bk > 8192:
        raise ValueError(f"int4_matmul: non-conforming shapes K={K} N={N} g={g}")

    BT = min(256, max(16, -(-T // 16) * 16))
    Tp = -(-T // BT) * BT
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))

    grid = (Tp // BT, N // BN, K // bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, bk), lambda t, n, k, li: (t, k)),
            pl.BlockSpec(
                (1, bk, BN // 2), lambda t, n, k, li: (li[0], k, n)
            ),
            pl.BlockSpec(
                (1, n_groups, BN), lambda t, n, k, li: (li[0], k, n)
            ),
            pl.BlockSpec(
                (1, n_groups, BN), lambda t, n, k, li: (li[0], k, n)
            ),
        ],
        out_specs=pl.BlockSpec((BT, BN), lambda t, n, k, li: (t, n)),
        scratch_shapes=[pltpu.VMEM((BT, BN), jnp.float32)],
    )

    def kern(li_ref, x_ref, qw_ref, s_ref, z_ref, o_ref, acc_scr):
        _int4_kernel(
            x_ref, qw_ref.at[0], s_ref.at[0], z_ref.at[0], o_ref, acc_scr
        )

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * N,
            bytes_accessed=K * N // 2 + Tp * K * 2 + Tp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_idx.reshape(1).astype(jnp.int32), x, qw, scale, zero)
    return out[:T] if Tp != T else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def fp8_matmul_stacked(
    x: jnp.ndarray,  # [T, K]
    qw: jnp.ndarray,  # fp8 [L, K, N]
    scale: jnp.ndarray,  # f32 [L, 1, N]
    layer_idx: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    T, K = x.shape
    L, _, N = qw.shape
    BK = _pick_tile(K)
    BN = _pick_tile(N)
    if not BK or not BN:
        raise ValueError(f"fp8_matmul: non-conforming shapes K={K} N={N}")

    BT = min(256, max(16, -(-T // 16) * 16))
    Tp = -(-T // BT) * BT
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))

    grid = (Tp // BT, N // BN, K // BK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, BK), lambda t, n, k, li: (t, k)),
            pl.BlockSpec((1, BK, BN), lambda t, n, k, li: (li[0], k, n)),
            pl.BlockSpec((1, 1, BN), lambda t, n, k, li: (li[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((BT, BN), lambda t, n, k, li: (t, n)),
        scratch_shapes=[pltpu.VMEM((BT, BN), jnp.float32)],
    )

    def kern(li_ref, x_ref, qw_ref, s_ref, o_ref, acc_scr):
        _fp8_kernel(x_ref, qw_ref.at[0], s_ref.at[0], o_ref, acc_scr)

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * N,
            bytes_accessed=K * N + Tp * K * 2 + Tp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_idx.reshape(1).astype(jnp.int32), x, qw, scale)
    return out[:T] if Tp != T else out
