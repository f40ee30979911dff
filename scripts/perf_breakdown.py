"""Decode-step component breakdown at flagship (Llama-3.2-1B) geometry.

Measures each HBM-bound component of one decode step separately on the
real chip, against its theoretical weights/KV byte traffic, to localize
the gap between the measured step time and the weights-bandwidth floor
(VERDICT r02 next-step #1).

Timing rules (memory: tpu-tunnel-quirks): vary one input per iteration,
dispatch the whole list, block at the end; warm twice; per-call times
below ~1 ms are amortized over iterations.

All weights are passed as jit ARGUMENTS — closed-over device arrays
would be inlined as HLO constants and shipped through the remote
compiler (minutes per GB).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# flagship geometry
H, I, L = 2048, 8192, 16
HQ, HKV, D = 32, 8, 64
V = 128256
B = 64
CTX = 192
PAGE = 32
DT = jnp.bfloat16
HBM_GBPS = 819.0  # v5e nominal


def timeit(fn, inputs, iters=32, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(inputs[0]))
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(fn(inputs[i % len(inputs)]))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3  # ms


def report(name, ms, gbytes):
    bw = gbytes / (ms / 1e3)
    floor = gbytes / HBM_GBPS * 1e3
    print(
        f"{name:<28} {ms:8.3f} ms   traffic {gbytes*1e3:7.1f} MB   "
        f"{bw:6.0f} GB/s   floor {floor:6.3f} ms   waste {ms-floor:6.3f} ms",
        flush=True,
    )


def main():
    key = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    xs = [
        jax.device_put(jax.random.normal(jax.random.fold_in(key, i), (B, H), DT))
        for i in range(8)
    ]

    # ---- MLP scan (current XLA formulation: x@gate, x@up, act, @down) ----
    wg = jax.device_put(jax.random.normal(key, (L, H, I), DT) * 0.02)
    wu = jax.device_put(jax.random.normal(key, (L, H, I), DT) * 0.02)
    wd = jax.device_put(jax.random.normal(key, (L, I, H), DT) * 0.02)

    @jax.jit
    def mlp_scan(x, wg, wu, wd):
        def body(h, w):
            g, u, d = w
            inter = jax.nn.silu(h @ g) * (h @ u)
            return (h + inter @ d).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wg, wu, wd))
        return h

    ms = timeit(lambda x: mlp_scan(x, wg, wu, wd), xs)
    report("mlp_scan (XLA)", ms, L * (2 * H * I + I * H) * 2 / 1e9)

    # ---- MLP single layer (no scan) ----
    @jax.jit
    def mlp_one(x, g, u, d):
        inter = jax.nn.silu(x @ g) * (x @ u)
        return x + inter @ d

    ms = timeit(lambda x: mlp_one(x, wg[0], wu[0], wd[0]), xs)
    report("mlp_one_layer (XLA)", ms, (2 * H * I + I * H) * 2 / 1e9)

    # ---- down_proj alone ----
    xis = [
        jax.device_put(jax.random.normal(jax.random.fold_in(key, i), (B, I), DT))
        for i in range(8)
    ]

    @jax.jit
    def down_only(xi, d):
        return xi @ d

    ms = timeit(lambda xi: down_only(xi, wd[0]), xis)
    report("down_proj alone", ms, I * H * 2 / 1e9)

    # ---- gate+up+act alone ----
    @jax.jit
    def gateup_only(x, g, u):
        return jax.nn.silu(x @ g) * (x @ u)

    ms = timeit(lambda x: gateup_only(x, wg[0], wu[0]), xs)
    report("gate+up+act alone", ms, 2 * H * I * 2 / 1e9)

    # ---- QKVO scan ----
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
            # stand-in for attention output (same shape as q)
            a = q + jnp.concatenate([k, v, k, v], axis=-1)[:, : HQ * D]
            return (h + a @ o_).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wq, wk, wv, wo))
        return h

    ms = timeit(lambda x: qkvo_scan(x, wq, wk, wv, wo), xs)
    report("qkvo_scan (no attn)", ms,
           L * (H * HQ * D + 2 * H * HKV * D + HQ * D * H) * 2 / 1e9)

    # ---- paged decode attention, 16 layers ----
    from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

    pages_per_req = (CTX + PAGE) // PAGE + 1
    NP = B * pages_per_req + 8
    num_slots = NP * PAGE
    kv_cache = jax.device_put(
        jax.random.normal(key, (L * NP, PAGE, 2, HKV * D), DT)
    )
    page_table = jax.device_put(
        np.arange(B * pages_per_req, dtype=np.int32).reshape(B, pages_per_req)
    )
    seq_lens = jax.device_put(np.full((B,), CTX, np.int32))
    out_slots = jax.device_put(
        ((np.arange(B) * pages_per_req + (CTX - 1) // PAGE) * PAGE
         + (CTX - 1) % PAGE).astype(np.int32).reshape(B, 1)
    )
    qs = [
        jax.device_put(
            jax.random.normal(jax.random.fold_in(key, i), (B, 1, HQ, D), DT)
        )
        for i in range(8)
    ]
    knew = jax.device_put(jax.random.normal(key, (B, 1, HKV, D), DT))

    @jax.jit
    def attn16(q, kv, knew, page_table, out_slots, seq_lens):
        def body(kv, li):
            out, kv = fused_paged_decode_attention(
                q, knew, knew, kv, page_table, out_slots, seq_lens,
                li, num_slots=num_slots, page_size=PAGE,
                sm_scale=0.125,
            )
            return kv, out

        kv, outs = jax.lax.scan(
            body, kv, np.arange(L, dtype=np.int32)
        )
        return outs

    msa = timeit(
        lambda q: attn16(q, kv_cache, knew, page_table, out_slots, seq_lens),
        qs, iters=16,
    )
    kv_bytes = L * B * CTX * 2 * HKV * D * 2
    report("attn16 (pallas paged)", msa, kv_bytes / 1e9)

    # ---- lm_head + logprob norm ----
    emb = jax.device_put(jax.random.normal(key, (V, H), DT) * 0.02)

    @jax.jit
    def lm_head(x, emb):
        logits = jnp.einsum("bh,vh->bv", x, emb,
                            preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tok = jnp.argmax(logits, axis=-1)
        return tok, lse

    ms = timeit(lambda x: lm_head(x, emb), xs)
    report("lm_head+argmax+lse", ms, V * H * 2 / 1e9)

    # ---- embed gather ----
    toks = [
        jax.device_put(
            jax.random.randint(jax.random.fold_in(key, i), (B,), 0, V)
        )
        for i in range(8)
    ]

    @jax.jit
    def embed(t, emb):
        return emb[t]

    ms = timeit(lambda t: embed(t, emb), toks)
    report("embed gather", ms, B * H * 2 / 1e9)

    # ---- full-step theory ----
    wbytes = (
        L * (2 * H * I + I * H + H * HQ * D + 2 * H * HKV * D + HQ * D * H)
        + V * H
    ) * 2
    print(f"\nweights+lm_head bytes: {wbytes/1e9:.3f} GB "
          f"-> floor {wbytes/HBM_GBPS*1e6/1e3:.3f} ms", flush=True)
    print(f"KV bytes at ctx={CTX}: {kv_bytes/1e9:.3f} GB "
          f"-> floor {kv_bytes/HBM_GBPS*1e6/1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
