"""Profile one fused decode window (K steps) of the flagship engine on
chip and print the per-op device-time breakdown.

Usage: PYTHONPATH=... python scripts/profile_decode.py [B] [K] [ctx]
"""

from __future__ import annotations

import functools
import glob
import gzip
import json
import os
import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ctx = int(sys.argv[3]) if len(sys.argv) > 3 else 192

    import jax

    from __graft_entry__ import FLAGSHIP_HF, _build_runner, _make_decode_buffers

    runner = _build_runner(FLAGSHIP_HF, max_total_tokens=B * 512 + 2048)
    packed, st_packed, P = _make_decode_buffers(runner, B, ctx_len=ctx, K=K)
    print(f"B={B} K={K} ctx={ctx} P={P}", flush=True)
    # warm (compile) via the real serving entry
    toks, lps, _ = runner.decode_window(packed, st_packed, B, P, K)
    toks, lps, _ = runner.decode_window(packed, st_packed, B, P, K)

    # untraced timing first (the profiler adds per-op overhead)
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        toks, lps, _ = runner.decode_window(packed, st_packed, B, P, K)
    wall = (time.perf_counter() - t0) / iters
    print(
        f"UNTRACED window wall {wall*1e3:.2f} ms = {wall/K*1e3:.3f} ms/step"
        f" -> {B*K/wall:.0f} tok/s",
        flush=True,
    )
    tdir = "/tmp/decprof"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    for i in range(iters):
        toks, lps, _ = runner.decode_window(packed, st_packed, B, P, K)
    wall = (time.perf_counter() - t0) / iters
    jax.profiler.stop_trace()
    print(
        f"window wall {wall*1e3:.2f} ms = {wall/K*1e3:.3f} ms/step"
        f" -> {B*K/wall:.0f} tok/s",
        flush=True,
    )

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found", flush=True)
        return
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    totals = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e["dur"]
    top = sorted(totals.items(), key=lambda kv_: -kv_[1])[:30]
    print(f"top device ops (ms per window of {K} steps):", flush=True)
    for name, us in top:
        print(f"  {us/1e3/iters:9.3f}  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
