"""On-chip timing of the SHIPPED decode-attention kernel at bench
geometry (flagship B=64, ctx ~192), over contiguous and shuffled page
tables.

History: the r05 sweep this script ran (before the losing variants were
removed) measured, per layer-call at B=64 ctx=192 ps=32:
  f32 batched dots (shipped)        100 us
  bf16-operand dots                 204 us
  bf16 QK / f32 PV                  303 us
  combined [RB*Hq, RB*T] 2D dot     334 us
Contiguous vs shuffled page tables were within noise (100 vs 103 us) —
the ranged-DMA path matters at larger ctx/page counts.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/pin_dot_mode.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

B, HQ, HKV, D = 64, 32, 8, 64
PS = 32
L = 1
CTX = 192
P = 8  # pages per request in the table
NP_ = B * P + 8
DT = jnp.bfloat16


def run(contig, iters=64):
    rng = np.random.default_rng(0)
    kv = jnp.zeros((L * NP_, PS, 2, HKV * D), DT)
    if contig:
        pt = np.arange(B * P, dtype=np.int32).reshape(B, P) + 4
    else:
        pt = rng.permutation(B * P).astype(np.int32).reshape(B, P) + 4
    pt = jnp.asarray(pt)
    seq = jnp.full((B,), CTX, jnp.int32)
    slots = jnp.asarray(
        (np.asarray(pt)[:, (CTX - 1) // PS] * PS + (CTX - 1) % PS)
    ).reshape(B, 1)
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)), DT)
    k = jnp.asarray(rng.standard_normal((B, 1, HKV, D)), DT)
    v = jnp.asarray(rng.standard_normal((B, 1, HKV, D)), DT)

    INNER = 16  # layers per dispatch — amortizes tunnel dispatch (~1.2 ms)

    @jax.jit
    def step(q, kv):
        for _ in range(INNER):
            out, kv = fused_paged_decode_attention(
                q, k, v, kv, pt, slots, seq, jnp.int32(0),
                num_slots=NP_ * PS, page_size=PS, sm_scale=0.125,
            )
            # chain q on out so layer calls serialize like the real scan
            q = q + 1e-6 * out.astype(q.dtype)
        return q, kv

    for _ in range(4):
        q, kv = step(q, kv)
    jax.block_until_ready(kv)
    t0 = time.perf_counter()
    for _ in range(iters):
        q, kv = step(q, kv)
    jax.block_until_ready(kv)
    us = (time.perf_counter() - t0) / iters / INNER * 1e6
    print(f"contig={contig}: {us:8.1f} us/layer-call", flush=True)
    return us


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for contig in (True, False):
        run(contig)
