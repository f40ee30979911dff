"""On-chip parity: fused_paged_decode_attention vs the XLA reference.

Interpret-mode tests execute DMAs synchronously, so they cannot catch
real-hardware races (e.g. the r05 VMEM-splice that decouples the
new-token HBM write from the page reads).  This drives the REAL Mosaic
kernel on the chip across geometries that exercise: single-group
(ctx <= T, splice in the first/staged group), multi-group, sliding
window, contiguous + shuffled page tables, cross-block prefetch.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/chip_parity_decode.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.attention import attention_xla, gather_kv, write_kv
from sglang_tpu.ops.paged_attention import fused_paged_decode_attention


def check(name, B, P, ps, Hq, Hkv, D, ctx, window=None, contig=False,
          seed=0, sinks=False, ds=False):
    rng = np.random.RandomState(seed)
    num_pages = P * B + 8
    num_slots = num_pages * ps
    L = 2
    kv_cache = (rng.randn(L * num_pages, ps, 2, Hkv * D) * 0.3).astype(
        np.float32
    )
    if contig:
        pt = np.arange(B * P, dtype=np.int32).reshape(B, P) + 1
    else:
        pt = (rng.permutation(num_pages - 1)[: B * P] + 1).reshape(
            B, P
        ).astype(np.int32)
    seq = np.full((B,), ctx, np.int32)
    # stagger some rows (incl. a 1-token row: splice in group 0)
    if B >= 4:
        seq[1] = max(1, ctx // 2)
        seq[2] = 1
    slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        pos = seq[b] - 1
        slots[b, 0] = pt[b, pos // ps] * ps + pos % ps
    q = (rng.randn(B, 1, Hq, D) * 0.5).astype(np.float32)
    kn = (rng.randn(B, 1, Hkv, D) * 0.5).astype(np.float32)
    vn = (rng.randn(B, 1, Hkv, D) * 0.5).astype(np.float32)
    dt = jnp.bfloat16
    args = [jnp.asarray(a, dt) for a in (q, kn, vn, kv_cache)]
    pt_j, slots_j, seq_j = map(jnp.asarray, (pt, slots, seq))
    li = jnp.int32(1)
    sm = D ** -0.5

    sink_logits = (
        jnp.asarray(rng.randn(Hq).astype(np.float32) * 2.0) if sinks
        else None
    )
    if ds:
        from sglang_tpu.ops.sparse_attention import fused_sparse_paged_decode

        # selection covering every page (shuffled order) == dense oracle
        sel_np = np.stack(
            [rng.permutation(P).astype(np.int32) for _ in range(B)]
        )
        out, kv_out = fused_sparse_paged_decode(
            args[0], args[1], args[2], args[3], pt_j,
            jnp.asarray(sel_np), slots_j, seq_j, li,
            num_slots=num_slots, page_size=ps, sm_scale=sm,
            sliding_window=window,
        )
    else:
        out, kv_out = fused_paged_decode_attention(
            args[0], args[1], args[2], args[3], pt_j, slots_j, seq_j, li,
            num_slots=num_slots, page_size=ps, sm_scale=sm,
            sliding_window=window, sinks=sink_logits,
        )
    kv_ref = write_kv(args[3], args[1], args[2], slots_j, li, num_slots)
    kc, vc = gather_kv(kv_ref, pt_j, li, num_slots, ps, D)
    ref = attention_xla(
        args[0], kc, vc, (seq_j - 1)[:, None], seq_j, sm,
        sliding_window=window, sinks=sink_logits,
    )
    o, r = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    live = seq > 0
    err = np.abs(o[live] - r[live]).max()
    kerr = np.abs(
        np.asarray(kv_out, np.float32) - np.asarray(kv_ref, np.float32)
    ).max()
    ok = err < 3e-2 and kerr == 0.0
    print(f"{name:<44} out_err={err:.4f} kv_err={kerr:.4f} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    ok = True
    # single group per row (ctx <= T=64): splice lands in the STAGED slot
    ok &= check("1-group shuffled B=16", 16, 2, 32, 32, 8, 64, ctx=48)
    ok &= check("1-group contig B=16", 16, 2, 32, 32, 8, 64, ctx=48,
                contig=True)
    # multi-group: bench geometry
    ok &= check("3-group shuffled B=64", 64, 8, 32, 32, 8, 64, ctx=192)
    ok &= check("3-group contig B=64", 64, 8, 32, 32, 8, 64, ctx=192,
                contig=True)
    # deeper context + window (first_group > 0)
    ok &= check("window ctx=512 B=16", 16, 16, 32, 32, 8, 64, ctx=512,
                window=160)
    ok &= check("window ctx=512 contig", 16, 16, 32, 32, 8, 64, ctx=512,
                window=160, contig=True)
    # MQA-ish + small heads
    ok &= check("hkv=2 ctx=96", 8, 4, 32, 8, 2, 64, ctx=96)
    # attention sinks (GPT-OSS class), alone and with a window
    ok &= check("sinks ctx=96", 8, 4, 32, 8, 2, 64, ctx=96, sinks=True)
    ok &= check("sinks window ctx=512", 16, 16, 32, 32, 8, 64, ctx=512,
                window=160, sinks=True)
    # GPT-OSS serving geometry (ps=8, hkv=2, D=64)
    ok &= check("sinks oss-geom ps=8", 8, 8, 8, 4, 2, 64, ctx=40,
                window=16, sinks=True)
    # double-sparsity selected-page kernel, full coverage == dense
    ok &= check("ds full-cover ctx=192", 16, 8, 32, 32, 8, 64, ctx=192,
                ds=True)
    ok &= check("ds full-cover ps=8", 8, 8, 8, 8, 2, 64, ctx=56, ds=True)
    print("PARITY", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
