"""Capture a jax.profiler trace of the decode attention kernel A/B and
print the top device ops by total duration.

Usage: PYTHONPATH=... python scripts/profile_attn.py [sg0|sg1|both]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, I, L = 2048, 8192, 16
HQ, HKV, D = 32, 8, 64
B = 64
CTX = 192
PAGE = 32
DT = jnp.bfloat16


def build(single_group):
    from sglang_tpu.ops.paged_attention import fused_paged_decode_attention

    key = jax.random.PRNGKey(0)
    pages_per_req = (CTX + PAGE) // PAGE + 1
    NP = B * pages_per_req + 8
    num_slots = NP * PAGE
    kv_cache = jax.device_put(
        jax.random.normal(key, (L * NP, PAGE, 2, HKV * D), DT)
    )
    page_table = jax.device_put(
        ((np.arange(B * pages_per_req, dtype=np.int32) + 1) % NP).reshape(
            B, pages_per_req
        )
    )
    seq_lens = jax.device_put(np.full((B,), CTX, np.int32))
    out_slots = jax.device_put(
        ((((np.arange(B) * pages_per_req + (CTX - 1) // PAGE) * PAGE
           + (CTX - 1) % PAGE)) % num_slots).astype(np.int32).reshape(B, 1)
    )
    knew = jax.device_put(jax.random.normal(key, (B, 1, HKV, D), DT))

    @jax.jit
    def attn16(q, kv):
        def body(kv, li):
            out, kv = fused_paged_decode_attention(
                q, knew, knew, kv, page_table, out_slots, seq_lens,
                li, num_slots=num_slots, page_size=PAGE, sm_scale=0.125,
                pages_per_block=(2 if single_group else None),
            )
            return kv, out

        kv, outs = jax.lax.scan(body, kv, np.arange(L, dtype=np.int32))
        q2 = q + 1e-3 * outs[-1].reshape(B, 1, HQ, D).astype(q.dtype)
        return q2 / jnp.maximum(jnp.max(jnp.abs(q2)), 1.0), kv

    q0 = jax.device_put(jax.random.normal(key, (B, 1, HQ, D), DT))
    return attn16, q0, kv_cache


def profile_one(tag, single_group, iters=8):
    attn16, q, kv = build(single_group)
    for _ in range(2):
        q, kv = attn16(q, kv)
    np.asarray(jax.device_get(q))
    tdir = f"/tmp/attnprof_{tag}"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    for _ in range(iters):
        q, kv = attn16(q, kv)
    np.asarray(jax.device_get(q))
    wall = (time.perf_counter() - t0) / iters * 1e3
    jax.profiler.stop_trace()
    print(f"--- {tag}: wall {wall:.3f} ms/iter", flush=True)
    parse(tdir, iters)


def parse(tdir, iters):
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", tdir, flush=True)
        return
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid/tid named via metadata; just take
    # events with 'dur' and an args.long_name or a TPU pid
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    totals = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e["dur"]
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    for name, us in top:
        print(f"  {us/1e3/iters:9.3f} ms/iter  {name[:110]}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"device: {jax.devices()[0]}", flush=True)
    if which in ("sg0", "both"):
        profile_one("sg0", False)
    if which in ("sg1", "both"):
        profile_one("sg1", True)


if __name__ == "__main__":
    main()
