"""A/B formulations of the decode MLP + QKVO scans (on chip).

Finds the XLA formulation whose 16-layer scan runs closest to the
weights-bandwidth floor — the down_proj double-read (r02 profile) and
per-dot issue overhead are the suspects.

Usage: PYTHONPATH=/root/repo:... python scripts/perf_mlp_variants.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

H, I, L = 2048, 8192, 16
HQ, HKV, D = 32, 8, 64
B = 64
DT = jnp.bfloat16
HBM_GBPS = 819.0


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


def report(name, ms, gbytes):
    bw = gbytes / (ms / 1e3)
    floor = gbytes / HBM_GBPS * 1e3
    print(
        f"{name:<36} {ms:8.3f} ms   {bw:6.0f} GB/s   floor {floor:6.3f} ms"
        f"   waste {ms-floor:6.3f} ms",
        flush=True,
    )


def norm(h):
    return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    x0 = jax.device_put(jax.random.normal(key, (B, H), DT))
    wbytes = L * 3 * H * I * 2 / 1e9

    # A) current: separate gate/up [L,H,I], down [L,I,H]
    wg = jax.device_put(jax.random.normal(key, (L, H, I), DT) * 0.02)
    wu = jax.device_put(jax.random.normal(key, (L, H, I), DT) * 0.02)
    wd = jax.device_put(jax.random.normal(key, (L, I, H), DT) * 0.02)

    @jax.jit
    def mlp_a(x, wg, wu, wd):
        def body(h, w):
            g, u, d = w
            inter = jax.nn.silu(h @ g) * (h @ u)
            return (h + 1e-3 * (inter @ d)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wg, wu, wd))
        return norm(h)

    report("A sep gate/up, down [L,I,H]",
           timeit_chained(lambda x: mlp_a(x, wg, wu, wd), x0), wbytes)

    # B) fused gate+up [L,H,2I], down [L,I,H]
    wgu = jax.device_put(jnp.concatenate([wg, wu], axis=-1))

    @jax.jit
    def mlp_b(x, wgu, wd):
        def body(h, w):
            gu, d = w
            t = h @ gu
            inter = jax.nn.silu(t[:, :I]) * (t[:, I:])
            return (h + 1e-3 * (inter @ d)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wgu, wd))
        return norm(h)

    report("B fused gate+up, down [L,I,H]",
           timeit_chained(lambda x: mlp_b(x, wgu, wd), x0), wbytes)

    # C) fused gate+up, down stored TRANSPOSED [L,H,I], contraction dim 1
    wdt = jax.device_put(jnp.swapaxes(wd, 1, 2))  # [L, H, I]

    @jax.jit
    def mlp_c(x, wgu, wdt):
        def body(h, w):
            gu, dt = w
            t = h @ gu
            inter = jax.nn.silu(t[:, :I]) * (t[:, I:])
            down = jax.lax.dot_general(
                inter, dt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            return (h + 1e-3 * down).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wgu, wdt))
        return norm(h)

    report("C fused gate+up, down.T [L,H,I]",
           timeit_chained(lambda x: mlp_c(x, wgu, wdt), x0), wbytes)

    # D) ONE stacked weight [L, H, 2I] + [L, I, H] but f32 accum epilogue
    @jax.jit
    def mlp_d(x, wgu, wd):
        def body(h, w):
            gu, d = w
            t = jax.lax.dot_general(
                h, gu, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            inter = (jax.nn.silu(t[:, :I]) * t[:, I:]).astype(h.dtype)
            down = jax.lax.dot_general(
                inter, d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (h + 1e-3 * down).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wgu, wd))
        return norm(h)

    report("D fused gate+up f32-accum",
           timeit_chained(lambda x: mlp_d(x, wgu, wd), x0), wbytes)

    # E) unrolled python loop (no lax.scan) — does scan slicing cost?
    wgs = [jax.device_put(np.asarray(wgu[i])) for i in range(L)]
    wds = [jax.device_put(np.asarray(wd[i])) for i in range(L)]

    @jax.jit
    def mlp_e(x, wgs, wds):
        h = x
        for g, d in zip(wgs, wds):
            t = h @ g
            inter = jax.nn.silu(t[:, :I]) * (t[:, I:])
            h = (h + 1e-3 * (inter @ d)).astype(h.dtype)
        return norm(h)

    report("E unrolled 16 layers",
           timeit_chained(lambda x: mlp_e(x, wgs, wds), x0), wbytes)

    # ---- QKVO variants ----
    qkvo_bytes = L * (H * HQ * D + 2 * H * HKV * D + HQ * D * H) * 2 / 1e9
    wq = jax.device_put(jax.random.normal(key, (L, H, HQ * D), DT) * 0.02)
    wk = jax.device_put(jax.random.normal(key, (L, H, HKV * D), DT) * 0.02)
    wv = jax.device_put(jax.random.normal(key, (L, H, HKV * D), DT) * 0.02)
    wo = jax.device_put(jax.random.normal(key, (L, HQ * D, H), DT) * 0.02)

    @jax.jit
    def qkvo_a(x, wq, wk, wv, wo):
        def body(h, w):
            q_, k_, v_, o_ = w
            q = h @ q_
            k = h @ k_
            v = h @ v_
            a = q + jnp.concatenate([k, v, k, v], axis=-1)[:, : HQ * D]
            return (h + 1e-3 * (a @ o_)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wq, wk, wv, wo))
        return norm(h)

    report("QKVO A separate",
           timeit_chained(lambda x: qkvo_a(x, wq, wk, wv, wo), x0),
           qkvo_bytes)

    wqkv = jax.device_put(jnp.concatenate([wq, wk, wv], axis=-1))

    @jax.jit
    def qkvo_b(x, wqkv, wo):
        def body(h, w):
            qkv, o_ = w
            t = h @ qkv
            q = t[:, : HQ * D]
            kv = t[:, HQ * D :]
            a = q + jnp.concatenate([kv, kv], axis=-1)[:, : HQ * D]
            return (h + 1e-3 * (a @ o_)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, (wqkv, wo))
        return norm(h)

    report("QKVO B fused qkv",
           timeit_chained(lambda x: qkvo_b(x, wqkv, wo), x0), qkvo_bytes)


if __name__ == "__main__":
    main()
