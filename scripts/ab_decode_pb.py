"""A/B the decode attention kernel's group size (pages_per_block) at
bench geometry with CONTIGUOUS page tables (what the engine's run
allocator actually produces — the r04 "T=64 optimal" sweep used
shuffled tables, where every group pays per-page DMA issues; with
contiguous runs the ranged-DMA path fires and the tradeoff flips to
fewer, larger DMAs).

Times a scan over 16 layers (in-model-like: kernel-to-kernel cache
aliasing, no host round trips inside the loop).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_decode_pb.py [ctx...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HQ, HKV, D = 32, 8, 64
B = 64
PAGE = 32
L = 16
DT = jnp.bfloat16


def build(ctx, pb, contig, rb=None):
    from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

    key = jax.random.PRNGKey(0)
    P = max(2, -(-(ctx + 1) // PAGE) + 1)
    while P % max(1, pb) != 0:
        P += 1
    NP = B * P + 8
    num_slots = NP * PAGE
    kv_cache = jax.device_put(
        jax.random.normal(key, (L * NP, PAGE, 2, HKV * D), DT)
    )
    if contig:
        pt = (np.arange(B * P, dtype=np.int32).reshape(B, P)) + 1
    else:
        rng = np.random.RandomState(0)
        pt = (rng.permutation(NP - 1)[: B * P] + 1).reshape(B, P).astype(
            np.int32
        )
    page_table = jax.device_put(pt)
    seq_lens = jax.device_put(np.full((B,), ctx, np.int32))
    slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = ctx - 1
        slots[b, 0] = pt[b, pos // PAGE] * PAGE + pos % PAGE
    out_slots = jax.device_put(slots)
    knew = jax.device_put(jax.random.normal(key, (B, 1, HKV, D), DT))

    @jax.jit
    def attn16(q, kv):
        def body(kv, li):
            out, kv = fused_paged_decode_attention(
                q, knew, knew, kv, page_table, out_slots, seq_lens,
                li, num_slots=num_slots, page_size=PAGE, sm_scale=0.125,
                pages_per_block=pb, rows_per_block=rb,
            )
            return kv, out

        kv, outs = jax.lax.scan(body, kv, np.arange(L, dtype=np.int32))
        q2 = q + 1e-3 * outs[-1].reshape(B, 1, HQ, D).astype(q.dtype)
        return q2 / jnp.maximum(jnp.max(jnp.abs(q2)), 1.0), kv

    q0 = jax.device_put(jax.random.normal(key, (B, 1, HQ, D), DT))
    return attn16, q0, kv_cache


def run_one(ctx, pb, contig, iters=20, rb=None):
    try:
        attn16, q, kv = build(ctx, pb, contig, rb=rb)
        for _ in range(2):
            q, kv = attn16(q, kv)
        np.asarray(jax.device_get(q))
        t0 = time.perf_counter()
        for _ in range(iters):
            q, kv = attn16(q, kv)
        np.asarray(jax.device_get(q))
        wall = (time.perf_counter() - t0) / iters
        per_layer = wall / L * 1e6
        kb = B * ctx * 2 * HKV * D * jnp.dtype(DT).itemsize
        gbs = kb / (wall / L) / 1e9
        print(
            f"ctx={ctx:5d} pb={pb} rb={rb or 8} "
            f"{'contig  ' if contig else 'shuffled'} "
            f"{per_layer:8.1f} us/layer  {gbs:6.0f} GB/s",
            flush=True,
        )
    except Exception as e:
        print(f"ctx={ctx} pb={pb} rb={rb} FAILED: {type(e).__name__} {e}",
              flush=True)


def main():
    ctxs = [int(a) for a in sys.argv[1:]] or [192, 512, 1024]
    print(f"device: {jax.devices()[0]}  B={B} Hq={HQ} Hkv={HKV} D={D}",
          flush=True)
    for ctx in ctxs:
        for pb in (2, 4, 8, 16):
            if pb * PAGE > max(ctx + PAGE, 2 * PAGE) * 2:
                continue
            run_one(ctx, pb, True)
        run_one(ctx, 2, False)
        run_one(ctx, 8, False)


if __name__ == "__main__":
    main()
