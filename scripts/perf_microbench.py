"""Chained-dependency microbench for decode-step components (on chip).

Unlike scripts/perf_breakdown.py (dispatch-a-list, block at end), every
iteration here CONSUMES the previous iteration's output and the final
result is fetched to the host — no async-dispatch, RPC-batching, or
result-caching behavior of the device tunnel can shortcut the timing.

Usage: PYTHONPATH=/root/repo python scripts/perf_microbench.py [attn|mlp|all]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# flagship geometry (Llama-3.2-1B)
H, I, L = 2048, 8192, 16
HQ, HKV, D = 32, 8, 64
V = 128256
B = 64
CTX = 192
PAGE = 32
DT = jnp.bfloat16
HBM_GBPS = 819.0  # v5e nominal


def timeit_chained(step, x0, iters=32, warm=2):
    """step: x -> x (same shape/dtype). Returns ms/iter, verified serial."""
    x = x0
    for _ in range(warm):
        x = step(x)
    jax.block_until_ready(x)
    np.asarray(jax.device_get(x))  # force a real round trip
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    np.asarray(jax.device_get(x))  # host fetch: cannot be faked
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def report(name, ms, gbytes):
    bw = gbytes / (ms / 1e3)
    floor = gbytes / HBM_GBPS * 1e3
    print(
        f"{name:<34} {ms:8.3f} ms   traffic {gbytes*1e3:7.1f} MB   "
        f"{bw:6.0f} GB/s   floor {floor:6.3f} ms   waste {ms-floor:6.3f} ms",
        flush=True,
    )


def bench_mlp(key):
    wg = jax.device_put(jax.random.normal(key, (L, H, I), DT) * 0.02)
    wu = jax.device_put(jax.random.normal(key, (L, H, I), DT) * 0.02)
    wd = jax.device_put(jax.random.normal(key, (L, I, H), DT) * 0.02)

    @jax.jit
    def mlp_scan(x, wg, wu, wd):
        def body(h, w):
            g, u, d = w
            inter = jax.nn.silu(h @ g) * (h @ u)
            return (h + 1e-3 * (inter @ d)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wg, wu, wd))
        return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)

    x0 = jax.device_put(jax.random.normal(key, (B, H), DT))
    ms = timeit_chained(lambda x: mlp_scan(x, wg, wu, wd), x0)
    report("mlp_scan x16 (chained)", ms, L * 3 * H * I * 2 / 1e9)

    @jax.jit
    def mlp_one(x, g, u, d):
        inter = jax.nn.silu(x @ g) * (x @ u)
        h = x + 1e-3 * (inter @ d)
        return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)

    ms = timeit_chained(lambda x: mlp_one(x, wg[0], wu[0], wd[0]), x0)
    report("mlp_one_layer (chained)", ms, 3 * H * I * 2 / 1e9)


def bench_qkvo(key):
    wq = jax.device_put(jax.random.normal(key, (L, H, HQ * D), DT) * 0.02)
    wk = jax.device_put(jax.random.normal(key, (L, H, HKV * D), DT) * 0.02)
    wv = jax.device_put(jax.random.normal(key, (L, H, HKV * D), DT) * 0.02)
    wo = jax.device_put(jax.random.normal(key, (L, HQ * D, H), DT) * 0.02)

    @jax.jit
    def qkvo_scan(x, wq, wk, wv, wo):
        def body(h, w):
            q_, k_, v_, o_ = w
            q = h @ q_
            k = h @ k_
            v = h @ v_
            a = q + jnp.concatenate([k, v, k, v], axis=-1)[:, : HQ * D]
            return (h + 1e-3 * (a @ o_)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wq, wk, wv, wo))
        return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)

    x0 = jax.device_put(jax.random.normal(key, (B, H), DT))
    ms = timeit_chained(lambda x: qkvo_scan(x, wq, wk, wv, wo), x0)
    report(
        "qkvo_scan x16 (chained)", ms,
        L * (H * HQ * D + 2 * H * HKV * D + HQ * D * H) * 2 / 1e9,
    )


def bench_attn(key, label="",
               pages_per_block=None, rows_per_block=None, ctx=CTX,
               **attn_kwargs):
    from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

    pages_per_req = (ctx + PAGE) // PAGE + 1
    NP = B * pages_per_req + 8
    num_slots = NP * PAGE
    kv_cache = jax.device_put(
        jax.random.normal(key, (L * NP, PAGE, 2, HKV * D), DT)
    )
    page_table = jax.device_put(
        (np.arange(B * pages_per_req, dtype=np.int32) + 1).reshape(
            B, pages_per_req
        )
        % NP
    )
    seq_lens = jax.device_put(np.full((B,), ctx, np.int32))
    out_slots = jax.device_put(
        (((np.arange(B) * pages_per_req + (ctx - 1) // PAGE) * PAGE
          + (ctx - 1) % PAGE) % num_slots).astype(np.int32).reshape(B, 1)
    )
    knew = jax.device_put(jax.random.normal(key, (B, 1, HKV, D), DT))

    @functools.partial(jax.jit, donate_argnums=(1,))
    def attn16(q, kv):
        def body(kv, li):
            out, kv = fused_paged_decode_attention(
                q, knew, knew, kv, page_table, out_slots, seq_lens,
                li, num_slots=num_slots, page_size=PAGE, sm_scale=0.125,
                pages_per_block=pages_per_block,
                rows_per_block=rows_per_block,
                **attn_kwargs,
            )
            return kv, out

        kv, outs = jax.lax.scan(body, kv, np.arange(L, dtype=np.int32))
        # fold outputs back into q so iterations chain
        q2 = q + 1e-3 * outs[-1].reshape(B, 1, HQ, D).astype(q.dtype)
        return q2 / jnp.maximum(jnp.max(jnp.abs(q2)), 1.0), kv

    q0 = jax.device_put(jax.random.normal(key, (B, 1, HQ, D), DT))

    # chained timing over the (q, kv) pair; kv donated (no defensive copy)
    q, kv = q0, kv_cache
    for _ in range(2):
        q, kv = attn16(q, kv)
    np.asarray(jax.device_get(q))
    iters = 32
    t0 = time.perf_counter()
    for _ in range(iters):
        q, kv = attn16(q, kv)
    np.asarray(jax.device_get(q))
    ms = (time.perf_counter() - t0) / iters * 1e3
    kv_bytes = L * B * ctx * 2 * HKV * D * 2
    kw = " ".join(f"{k}={v}" for k, v in attn_kwargs.items())
    report(
        f"attn16 pb={pages_per_block}"
        f" rb={rows_per_block} ctx={ctx} {kw}{label}",
        ms, kv_bytes / 1e9,
    )


def _sweep3(key):
    # r05: group size vs per-group overhead at bench geometry
    bench_attn(key)  # baseline rb=8 pb=2 (T=64)
    bench_attn(key, pages_per_block=4)   # T=128
    bench_attn(key, pages_per_block=8)   # T=256: single group
    bench_attn(key, pages_per_block=4, rows_per_block=4)
    bench_attn(key, pages_per_block=2, rows_per_block=4)
    bench_attn(key, pages_per_block=1)   # T=32


def bench_lm_head(key):
    emb = jax.device_put(jax.random.normal(key, (V, H), DT) * 0.02)

    @jax.jit
    def lm_head(x, emb):
        logits = jnp.einsum(
            "bh,vh->bv", x, emb, preferred_element_type=jnp.float32
        )
        lse = jax.nn.logsumexp(logits, axis=-1)
        # fold back to x's shape so iterations chain
        x2 = x + 1e-6 * lse[:, None].astype(x.dtype)
        return x2 / jnp.maximum(jnp.max(jnp.abs(x2)), 1.0)

    x0 = jax.device_put(jax.random.normal(key, (B, H), DT))
    ms = timeit_chained(lambda x: lm_head(x, emb), x0)
    report("lm_head+lse (chained)", ms, V * H * 2 / 1e9)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    key = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    if which in ("mlp", "all"):
        bench_mlp(key)
    if which in ("qkvo", "all"):
        bench_qkvo(key)
    if which in ("attn", "all"):
        bench_attn(key)
        bench_attn(key, pages_per_block=2)
    if which == "sweep":
        for pb in (1, 2, 4):
            bench_attn(key, pages_per_block=pb)
        for pb in (2, 4):
            bench_attn(key, pages_per_block=pb, ctx=320)
    if which == "sweep2":
        # isolate the issue/latency terms (r04 roofline attack)
        bench_attn(key)  # baseline: rb=8 pb=2 dm=1
        bench_attn(key, fused_write=False)  # KV-write issue cost
        bench_attn(key, contig_mode=True)  # contig scalar-check cost
        bench_attn(key, rows_per_block=16)
        bench_attn(key, rows_per_block=16, contig_mode=True)
        bench_attn(key, rows_per_block=32)
        bench_attn(key, rows_per_block=16, pages_per_block=4,
                   contig_mode=True)
        bench_attn(key, rows_per_block=16, fused_write=False,
                   contig_mode=True)
    if which == "sweep3":
        _sweep3(key)
    if which in ("lm", "all"):
        bench_lm_head(key)
    wbytes = (
        L * (3 * H * I + H * HQ * D + 2 * H * HKV * D + HQ * D * H) + V * H
    ) * 2
    kv_bytes = L * B * CTX * 2 * HKV * D * 2
    print(
        f"full-step floor: weights {wbytes/1e6:.0f} MB + KV {kv_bytes/1e6:.0f}"
        f" MB -> {(wbytes + kv_bytes)/HBM_GBPS/1e6:.3f} ms"
        f" ({B/((wbytes+kv_bytes)/HBM_GBPS/1e9):.0f} tok/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()