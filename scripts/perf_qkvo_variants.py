"""Chained A/B microbench for the decode QKVO projection formulation.

The decode profile shows a per-layer [2048,2048] weight transpose-copy
into scoped VMEM (constant_dynamic-slice_fusion: ~12 us/layer) feeding
the q projection, plus small-dot inefficiency on k/v.  Variants:

  a) current: separate q/k/v/o dots, weights [L, in, out]
  b) fused qkv stack [L, in, 3H] (one dot, split after)
  c) q weight stored [L, out, in] (dot contracts the trailing axis)
  d) fused qkv + o, rope-less floor probe

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_qkvo_variants.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

H, L = 2048, 16
HQ, HKV, D = 32, 8, 64
B = 64
DT = jnp.bfloat16
HBM_GBPS = 819.0

QO = HQ * D
KO = HKV * D
WBYTES = L * (H * QO + 2 * H * KO + QO * H) * 2 / 1e9


def timeit_chained(step, x0, iters=32, warm=2):
    x = x0
    for _ in range(warm):
        x = step(x)
    np.asarray(jax.device_get(x))
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    np.asarray(jax.device_get(x))
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, ms, gbytes=WBYTES):
    bw = gbytes / (ms / 1e3)
    floor = gbytes / HBM_GBPS * 1e3
    print(
        f"{name:<40} {ms:8.3f} ms   {bw:6.0f} GB/s   floor {floor:6.3f}"
        f"   waste {ms-floor:6.3f}",
        flush=True,
    )


def attn_standin(q, k, v):
    # cheap stand-in for attention with the right shapes/dtypes
    a = q + jnp.concatenate([k, v, k, v], axis=-1)[:, :QO]
    return a


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    x0 = jax.device_put(jax.random.normal(key, (B, H), DT))

    wq = jax.device_put(jax.random.normal(key, (L, H, QO), DT) * 0.02)
    wk = jax.device_put(jax.random.normal(key, (L, H, KO), DT) * 0.02)
    wv = jax.device_put(jax.random.normal(key, (L, H, KO), DT) * 0.02)
    wo = jax.device_put(jax.random.normal(key, (L, QO, H), DT) * 0.02)

    @jax.jit
    def qkvo_a(x, wq, wk, wv, wo):
        def body(h, w):
            q_, k_, v_, o_ = w
            q = h @ q_
            k = h @ k_
            v = h @ v_
            # head reshape + f32 round trip as in the real layer
            q = q.reshape(B, HQ, D).astype(jnp.float32)
            q = q.astype(DT).reshape(B, QO)
            a = attn_standin(q, k, v)
            return (h + 1e-3 * (a @ o_)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wq, wk, wv, wo))
        return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)

    report("a) separate q/k/v/o", timeit_chained(
        lambda x: qkvo_a(x, wq, wk, wv, wo), x0))

    wqkv = jax.device_put(
        np.concatenate(
            [np.asarray(wq), np.asarray(wk), np.asarray(wv)], axis=-1
        )
    )

    @jax.jit
    def qkvo_b(x, wqkv, wo):
        def body(h, w):
            qkv_, o_ = w
            qkv = h @ qkv_
            q = qkv[:, :QO]
            k = qkv[:, QO:QO + KO]
            v = qkv[:, QO + KO:]
            q = q.reshape(B, HQ, D).astype(jnp.float32)
            q = q.astype(DT).reshape(B, QO)
            a = attn_standin(q, k, v)
            return (h + 1e-3 * (a @ o_)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wqkv, wo))
        return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)

    report("b) fused qkv stack", timeit_chained(
        lambda x: qkvo_b(x, wqkv, wo), x0))

    wq_t = jax.device_put(np.ascontiguousarray(
        np.swapaxes(np.asarray(wq), 1, 2)))  # [L, QO, H]

    @jax.jit
    def qkvo_c(x, wq_t, wk, wv, wo):
        def body(h, w):
            qt_, k_, v_, o_ = w
            q = jax.lax.dot_general(
                h, qt_, (((1,), (1,)), ((), ())),
            )  # [B, QO]
            k = h @ k_
            v = h @ v_
            q = q.reshape(B, HQ, D).astype(jnp.float32)
            q = q.astype(DT).reshape(B, QO)
            a = attn_standin(q, k, v)
            return (h + 1e-3 * (a @ o_)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wq_t, wk, wv, wo))
        return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)

    report("c) q weight [L,out,in]", timeit_chained(
        lambda x: qkvo_c(x, wq_t, wk, wv, wo), x0))

    @jax.jit
    def qkvo_d(x, wqkv, wo):
        # no head reshape / f32 round trip: floor probe
        def body(h, w):
            qkv_, o_ = w
            qkv = h @ qkv_
            a = attn_standin(
                qkv[:, :QO], qkv[:, QO:QO + KO], qkv[:, QO + KO:]
            )
            return (h + 1e-3 * (a @ o_)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wqkv, wo))
        return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)

    report("d) fused qkv, no reshape", timeit_chained(
        lambda x: qkvo_d(x, wqkv, wo), x0))


if __name__ == "__main__":
    main()
