"""In-kernel attribution of the fused decode attention kernel via
ablation + trace parsing: runs the 16-layer attention scan on chip for
each ablation mode and reports the kernel's DEVICE time (trace-summed),
immune to dispatch/harness overhead.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_attn_ablate.py [ctx]
"""

from __future__ import annotations

import functools
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, L = 2048, 16
HQ, HKV, D = 32, 8, 64
B = 64
PAGE = 32
DT = jnp.bfloat16
HBM_GBPS = 819.0


def device_kernel_ms(tdir, match="fused_paged_decode_attention"):
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return None, None
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    total = 0.0
    all_dev = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        all_dev += e["dur"]
        if match in e.get("name", ""):
            total += e["dur"]
    return total / 1e3, all_dev / 1e3


def run_variant(ablate, ctx, iters=8, **kwargs):
    from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

    key = jax.random.PRNGKey(0)
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
                ablate=ablate, **kwargs,
            )
            return kv, out

        kv, outs = jax.lax.scan(body, kv, np.arange(L, dtype=np.int32))
        q2 = q + 1e-3 * outs[-1].reshape(B, 1, HQ, D).astype(q.dtype)
        return q2 / jnp.maximum(jnp.max(jnp.abs(q2)), 1.0), kv

    q0 = jax.device_put(jax.random.normal(key, (B, 1, HQ, D), DT))
    q, kv = q0, kv_cache
    for _ in range(2):
        q, kv = attn16(q, kv)
    np.asarray(jax.device_get(q))

    tdir = f"/tmp/attnprof_{ablate}_{ctx}"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    for _ in range(iters):
        q, kv = attn16(q, kv)
    np.asarray(jax.device_get(q))
    wall = (time.perf_counter() - t0) / iters
    jax.profiler.stop_trace()

    kms, allms = device_kernel_ms(tdir)
    kv_bytes = L * B * ctx * 2 * HKV * D * 2
    floor = kv_bytes / HBM_GBPS / 1e6
    kper = kms / iters if kms else float("nan")
    print(
        f"ablate={str(ablate):<8} ctx={ctx} {' '.join(f'{k}={v}' for k, v in kwargs.items()):<24}"
        f" kernel {kper:7.3f} ms ({kper/L*1e3:5.1f} us/layer)"
        f"  wall {wall*1e3:7.3f}  floor {floor:.3f}",
        flush=True,
    )


def main():
    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    print(f"device: {jax.devices()[0]}", flush=True)
    run_variant(None, ctx)
    run_variant("no_attn", ctx)     # write DMAs + grid only
    run_variant("no_dma", ctx)      # compute only (stale buffers)
    run_variant("no_dots", ctx)     # DMAs + write, no MXU
    run_variant("no_vpu", ctx)      # DMAs + dots, no softmax/mask
    run_variant(None, ctx, fused_write=False)
    run_variant(None, ctx, dot_mode=0)   # bf16 q@k, bf16 p@v
    run_variant(None, ctx, dot_mode=2)   # f32 q@k, bf16 p@v
    run_variant(None, ctx, dot_mode=3)   # bf16 q@k, f32 p@v
    run_variant(None, ctx, dot_mode=4)   # combined 2D single dots
    run_variant("no_dots", ctx)


if __name__ == "__main__":
    main()
