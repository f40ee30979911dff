"""Measure dispatch/fetch phase costs of the fused decode window over
the tunnel, sync vs chained (dispatch N+1 before fetching N).

If the chained steady state approaches device time, the engine's
scheduler should too — otherwise the tunnel itself serializes.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ctx = int(sys.argv[3]) if len(sys.argv) > 3 else 192

    from __graft_entry__ import FLAGSHIP_HF, _build_runner, _make_decode_buffers

    runner = _build_runner(FLAGSHIP_HF, max_total_tokens=B * 512 + 2048)
    packed, st_packed, P = _make_decode_buffers(runner, B, ctx_len=ctx, K=K)
    print(f"B={B} K={K} ctx={ctx} P={P}", flush=True)

    # warm
    for _ in range(2):
        runner.decode_window(packed, st_packed, B, P, K)

    # --- sync loop with phase timing
    n = 8
    td = tf = 0.0
    t0 = time.perf_counter()
    for _ in range(n):
        t1 = time.perf_counter()
        h = runner.decode_window_async(packed, st_packed, B, P, K)
        t2 = time.perf_counter()
        runner.decode_window_fetch(h)
        t3 = time.perf_counter()
        td += t2 - t1
        tf += t3 - t2
    total = time.perf_counter() - t0
    print(
        f"sync: {total/n*1e3:.2f} ms/window  dispatch {td/n*1e3:.2f}"
        f"  fetch {tf/n*1e3:.2f}",
        flush=True,
    )

    # --- chained loop (depth-2): dispatch N+1 using N's device tokens
    for _ in range(2):
        runner.decode_window(packed, st_packed, B, P, K)
    n = 16
    h_prev = runner.decode_window_async(packed, st_packed, B, P, K)
    t0 = time.perf_counter()
    for _ in range(n):
        h_next = runner.decode_window_async(
            packed, st_packed, B, P, K, chain_tokens=h_prev[2]
        )
        runner.decode_window_fetch(h_prev)
        h_prev = h_next
    runner.decode_window_fetch(h_prev)
    total = time.perf_counter() - t0
    print(
        f"chained: {total/n*1e3:.2f} ms/window = {total/n/K*1e3:.3f} ms/step"
        f" -> {B*K*n/total:.0f} tok/s",
        flush=True,
    )

    # --- no-fetch ceiling: dispatch a chain of windows, fetch only last
    n = 16
    h_prev = runner.decode_window_async(packed, st_packed, B, P, K)
    t0 = time.perf_counter()
    for _ in range(n):
        h_prev = runner.decode_window_async(
            packed, st_packed, B, P, K, chain_tokens=h_prev[2]
        )
    runner.decode_window_fetch(h_prev)
    total = time.perf_counter() - t0
    print(
        f"nofetch: {total/n*1e3:.2f} ms/window = {total/n/K*1e3:.3f} ms/step"
        f" -> {B*K*n/total:.0f} tok/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
