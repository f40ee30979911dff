"""Dump the optimized HLO of the fused decode-window program so trace
fusion names (e.g. bitcast_add_fusion.2) can be mapped back to model ops.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/dump_decode_hlo.py [B] [K] [ctx] [out]
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ctx = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/decode_hlo.txt"

    from __graft_entry__ import FLAGSHIP_HF, _build_runner, _make_decode_buffers

    runner = _build_runner(FLAGSHIP_HF, max_total_tokens=B * 512 + 2048)
    packed, st_packed, P = _make_decode_buffers(runner, B, ctx_len=ctx, K=K)
    fn = runner._get_decode_fn(B, P, K, True, False, False,
                               use_chain=True)
    import jax

    chain_tokens = np.ascontiguousarray(packed[:B]).astype(np.int32)
    lowered = fn.lower(
        runner.params, runner.kv_cache, packed, st_packed,
        np.zeros((B, 1, 2), np.int32), np.zeros((B, 1), np.uint32),
        {}, np.zeros((B,), np.int32), chain_tokens,
        (), np.zeros((B,), np.int32),
        runner._base_rng, np.int32(1),
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}", flush=True)


if __name__ == "__main__":
    main()
