"""Peak-HBM + dot-bandwidth probes at decode geometry (on chip).

Questions (round-5 roofline recalibration):
  1. What copy/reduce bandwidth does this v5e actually reach?
  2. What GB/s does a lone [B,H]@[H,I] bf16 dot reach at B=64/128/256?
  3. Does the logits matmul pay for the [V,H] (gather) layout, i.e. is
     einsum bh,vh->bv slower than bh,hv->bv on a pre-transposed table?

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_hbm_peak.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

H, I, L = 2048, 8192, 16
V = 128256
DT = jnp.bfloat16


def timeit_chained(step, x0, iters=32, warm=2):
    x = x0
    for _ in range(warm):
        x = step(x)
    np.asarray(jax.device_get(jax.tree.leaves(x)[0]))
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    np.asarray(jax.device_get(jax.tree.leaves(x)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, ms, gbytes):
    print(f"{name:<44} {ms:8.3f} ms   {gbytes / (ms / 1e3):6.0f} GB/s",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # 1) pure-copy bandwidth: y = x * a (read N + write N bytes)
    N = 512 * (1 << 20)  # 512 M bf16 elements = 1 GiB
    big = jax.device_put(jnp.ones((N,), DT))

    @jax.jit
    def copy_step(s, big):
        return s + 1.0, big * s

    s = jnp.float32(1.0)

    def step1(carry):
        s, _ = carry
        return copy_step(s, big)

    ms = timeit_chained(step1, (s, big), iters=16)
    report("copy 1GiB (r+w)", ms, 2 * N * 2 / 1e9)

    # 2) reduce bandwidth: sum(x) (read N bytes)
    @jax.jit
    def red_step(s, big):
        return s + jnp.sum(big.astype(jnp.float32) * s)

    ms = timeit_chained(lambda s: red_step(s, big), jnp.float32(0), iters=16)
    report("reduce 1GiB (r)", ms, N * 2 / 1e9)

    del big

    # 3) lone chained dot at B=64/128/256 over 16 distinct weights
    ws = jax.device_put(
        jax.random.normal(key, (L, H, I), DT) * 0.02
    )
    for B in (64, 128, 256):
        x0 = jax.device_put(jax.random.normal(key, (B, H), DT))

        @jax.jit
        def dots(x, ws):
            def body(h, w):
                y = h @ w  # [B, I]
                return (y[:, :H] + 1e-3 * h).astype(h.dtype), None

            h, _ = jax.lax.scan(body, x, ws)
            return h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)

        ms = timeit_chained(lambda x: dots(x, ws), x0)
        report(f"16x dot [{B},{H}]@[{H},{I}]", ms, L * H * I * 2 / 1e9)

    # 4) logits: [V,H] gather layout vs [H,V] matmul layout
    B = 64
    wvh = jax.device_put(jax.random.normal(key, (V, H), DT) * 0.02)
    x0 = jax.device_put(jax.random.normal(key, (B, H), DT))

    @jax.jit
    def logits_vh(x, w):
        lg = jnp.einsum("bh,vh->bv", x, w,
                        preferred_element_type=jnp.float32)
        nxt = (lg[:, :H] / jnp.maximum(jnp.max(jnp.abs(lg)), 1.0))
        return nxt.astype(DT)

    ms = timeit_chained(lambda x: logits_vh(x, wvh), x0)
    report("logits einsum bh,vh->bv ([V,H] table)", ms, V * H * 2 / 1e9)

    whv = jax.device_put(jnp.asarray(np.asarray(wvh, np.float32).T, DT))

    @jax.jit
    def logits_hv(x, w):
        lg = jnp.einsum("bh,hv->bv", x, w,
                        preferred_element_type=jnp.float32)
        nxt = (lg[:, :H] / jnp.maximum(jnp.max(jnp.abs(lg)), 1.0))
        return nxt.astype(DT)

    ms = timeit_chained(lambda x: logits_hv(x, whv), x0)
    report("logits einsum bh,hv->bv ([H,V] table)", ms, V * H * 2 / 1e9)


if __name__ == "__main__":
    main()
