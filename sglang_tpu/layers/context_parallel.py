"""Long-context sequence parallelism: prefill CP and decode CP (DCP).

Equivalent role to the reference's ``layers/cp/`` (zigzag prefill
context parallelism, ``cp/zigzag.py:15–29``: the sequence splits into
2·cp blocks and rank i owns block i and block 2cp−1−i, balancing causal
work) and ``layers/dcp/`` (decode context parallelism,
``dcp/comm.py`` ``cp_lse_ag_out_rs_mha``: KV sharded across ranks, each
rank computes partial attention over its shard, partials merge by
log-sum-exp correction).

TPU-native: both are shard_map programs over the ``tp`` mesh axis with
XLA collectives riding ICI — no custom comm kernels:

* :func:`zigzag_split` / :func:`zigzag_merge` — host/device index maps
  for the balanced split (pure layout; the reference's exact scheme).
* :func:`dcp_attention` — query replicated, context sharded on the
  sequence axis; per-shard flash-style partials (m, l, acc) merge with
  one ``psum`` after LSE renormalization.  This is the decode-side
  primitive; chunked-prefill reuse follows the same contract with
  per-query-block masks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30

# CP prefill: local token count at which the dense (allgather + full
# score matrix) path gives way to the ring + blockwise-flash path.
RING_THRESHOLD = 1024


def _cp_block(ll: int) -> int:
    """Flash tile size for a local shard of ``ll`` tokens (divides ll)."""
    b = 512
    while ll % b:
        b //= 2
    return max(b, 1)


# ------------------------------------------------------------- zigzag maps
def zigzag_split(seq_len: int, cp: int) -> np.ndarray:
    """Position permutation for the zigzag split: returns ``order`` such
    that ``x[order]`` lists rank 0's tokens first, then rank 1's, …
    Rank i owns chunk i and chunk 2cp-1-i of the 2cp-chunked sequence
    (reference cp/zigzag.py:15 — balances causal attention FLOPs)."""
    assert seq_len % (2 * cp) == 0, (seq_len, cp)
    chunk = seq_len // (2 * cp)
    order = []
    for r in range(cp):
        order.extend(range(r * chunk, (r + 1) * chunk))
        hi = 2 * cp - 1 - r
        order.extend(range(hi * chunk, (hi + 1) * chunk))
    return np.asarray(order, np.int32)


def zigzag_merge(seq_len: int, cp: int) -> np.ndarray:
    """Inverse permutation of :func:`zigzag_split`."""
    order = zigzag_split(seq_len, cp)
    inv = np.empty_like(order)
    inv[order] = np.arange(seq_len, dtype=np.int32)
    return inv


# --------------------------------------------------------- DCP attention
def _partial_attention(q, k, v, mask, sm_scale):
    """Flash-style partial: returns (acc [.., D], m, l) for LSE merge."""
    scores = jnp.einsum(
        "bhd,bchd->bhc", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    scores = jnp.where(mask[:, None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)  # [B, H, 1]
    m_safe = jnp.maximum(m, -1e20)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(mask[:, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bhc,bchd->bhd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return acc, m_safe, l


def dcp_attention(
    q: jnp.ndarray,  # [B, H, D] one query per request (decode)
    k_ctx: jnp.ndarray,  # [B, C, H, D] context, sharded on C over `axis`
    v_ctx: jnp.ndarray,  # [B, C, H, D]
    ctx_valid: jnp.ndarray,  # [B, C] bool validity (sharded with C)
    sm_scale: float,
    mesh,
    axis: str = "tp",
) -> jnp.ndarray:
    """Decode attention with the KV context sharded across ``axis``.

    Each shard computes a flash partial over its C/cp slice; partials
    combine exactly via the log-sum-exp correction
    (``sum_i exp(m_i - m*) * acc_i / sum_i exp(m_i - m*) * l_i``) with
    ``psum`` collectives — the reference's allgather-LSE + reduce-scatter
    merge (dcp/comm.py) expressed as two psums over ICI."""
    from jax.sharding import PartitionSpec as P

    def fn(q, k, v, valid):
        acc, m, l = _partial_attention(q, k, v, valid, sm_scale)
        m_star = jax.lax.pmax(m, axis)  # global row max
        scale = jnp.exp(m - m_star)
        num = jax.lax.psum(acc * scale, axis)
        den = jax.lax.psum(l * scale, axis)
        den = jnp.where(den == 0.0, 1.0, den)
        return (num / den).astype(q.dtype)

    other = frozenset(n for n in mesh.axis_names if n != axis)
    del other
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis)),
        out_specs=P(),
        axis_names={axis},
        check_vma=False,
    )(q, k_ctx, v_ctx, ctx_valid)


def dcp_paged_attention(
    q: jnp.ndarray,  # [B, Lq, Hq, D] replicated
    k_new: jnp.ndarray,  # [B, Lq, Hkv, D]
    v_new: jnp.ndarray,  # [B, Lq, Hkv, D]
    kv_cache: jnp.ndarray,  # [dcp, L*NPl, ps, 2, Hkv*D] sharded on axis 0
    batch,  # DeviceBatch (out_slots/page_table/positions/seq_lens)
    layer_idx: jnp.ndarray,
    *,
    num_layers: int,
    page_size: int,
    sm_scale: float,
    mesh,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    axis: str = "tp",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paged attention with the KV PAGES sharded over ``axis`` (decode
    context parallelism; reference ``layers/dcp/comm.py``
    ``cp_lse_ag_out_rs_mha`` + ``planner.py`` round-robin page placement).

    Global page ``p`` lives on rank ``p % dcp`` at local page ``p // dcp``
    — striped ownership, so an in-order page allocator balances a long
    sequence's pages across ranks for free.  Each rank scatters the new
    rows it owns (OOB rows drop), gathers only its local pages, computes
    a flash-style partial over them, and the partials merge exactly with
    one log-sum-exp-corrected ``psum`` pair over ICI.  Works for both
    decode (Lq=1) and extend (causal over positions).  Per-request KV
    capacity now scales with the mesh instead of one shard's HBM."""
    from jax.sharding import PartitionSpec as P

    from sglang_tpu.environ import envs

    dcp = kv_cache.shape[0]
    R = kv_cache.shape[1]
    NPl = R // num_layers
    ps = page_size
    B, Lq, Hq, D = q.shape
    Hkv = k_new.shape[2]
    HD = kv_cache.shape[-1]
    C = batch.page_table.shape[1] * ps

    # pages per flash chunk: bounds the gathered activation transient to
    # O(B · PB · ps) instead of the full context length
    n_pt = int(batch.page_table.shape[1])
    PB = min(n_pt, 64)
    n_chunks = -(-n_pt // PB)

    # Pallas per-rank partial kernel (owner-predicated page DMAs — each
    # rank reads only its 1/dcp of the context, no gather buffer, fused
    # KV write): decode-only, standard lane/dtype constraints.
    interpret = bool(envs.SGLANG_TPU_INTERPRET_PALLAS.value)
    use_pallas = (
        Lq == 1
        and HD % 128 == 0
        and jnp.dtype(kv_cache.dtype).itemsize >= 2
        and not envs.SGLANG_TPU_FORCE_XLA_ATTENTION.value
        and sliding_window is None
        and (interpret or jax.devices()[0].platform == "tpu")
    )

    def fn_pallas(kv_local, q, k_new, v_new, out_slots, page_table,
                  positions, seq_lens, li):
        from sglang_tpu.ops.paged_attention import fused_dcp_partial_decode

        me = jax.lax.axis_index(axis)
        meta = jnp.stack([
            li * NPl,
            jnp.asarray(0, jnp.int32),
            me.astype(jnp.int32),
            jnp.asarray(dcp, jnp.int32),
        ])
        acc, m, l, kv_out = fused_dcp_partial_decode(
            q, k_new, v_new, kv_local[0], page_table, out_slots,
            seq_lens, meta, page_size=ps, sm_scale=sm_scale,
            logit_cap=logit_cap, interpret=interpret,
        )
        # exact LSE merge across ranks (reference cp_lse_ag_out_rs_mha)
        m_star = jax.lax.pmax(m, axis)
        scale = jnp.exp(m - m_star)
        num = jax.lax.psum(acc * scale, axis)
        den = jax.lax.psum(l * scale, axis)
        den = jnp.where(den == 0.0, 1.0, den)
        out = (num / den).astype(q.dtype)  # [B, Hq, D]
        return out[:, None], kv_out[None]

    def fn(kv_local, q, k_new, v_new, out_slots, page_table, positions,
           seq_lens, li):
        me = jax.lax.axis_index(axis)
        # ---- owner-masked scatter of the new rows (mode=drop) ----
        fs = out_slots.reshape(-1)  # [B*Lq] global slots
        g = fs // ps
        local_row = li * NPl + g // dcp
        rows = jnp.where(g % dcp == me, local_row, R)  # OOB -> dropped
        vals = jnp.stack(
            [k_new.reshape(-1, HD), v_new.reshape(-1, HD)], axis=1
        ).astype(kv_local.dtype)  # [B*Lq, 2, HD]
        kv_local = kv_local.at[0, rows, fs % ps].set(
            vals, mode="drop", unique_indices=True
        )
        qpos = positions  # [B, Lq]
        win = (
            jnp.asarray(sliding_window, jnp.int32)
            if sliding_window is not None
            else None
        )

        # ---- flash accumulation over page CHUNKS of this rank's slice
        # (peak gathered context = PB pages, not the full length) ----
        def chunk_step(carry, ci):
            m, l, acc = carry
            pg0 = ci * PB
            pages_c = jax.lax.dynamic_slice(
                page_table, (0, pg0), (B, PB)
            )  # [B, PB] global pages
            cpos = (
                pg0 * ps
                + jnp.arange(PB * ps, dtype=jnp.int32)
            )  # positions covered by this chunk
            pages = jnp.repeat(pages_c, ps, axis=1)  # [B, PB*ps]
            owned = (pages % dcp) == me
            lrow = jnp.where(owned, li * NPl + pages // dcp, 0)
            inpage = jnp.broadcast_to(
                jnp.tile(jnp.arange(ps, dtype=jnp.int32), PB)[None],
                (B, PB * ps),
            )
            kv_ctx = kv_local[0][lrow, inpage]  # [B, PB*ps, 2, HD]
            k_ctx = kv_ctx[:, :, 0].reshape(B, PB * ps, Hkv, D)
            v_ctx = kv_ctx[:, :, 1].reshape(B, PB * ps, Hkv, D)
            if Hq != Hkv:
                rep = Hq // Hkv
                k_ctx = jnp.repeat(k_ctx, rep, axis=2)
                v_ctx = jnp.repeat(v_ctx, rep, axis=2)
            s = jnp.einsum(
                "blhd,bchd->bhlc", q, k_ctx,
                preferred_element_type=jnp.float32,
            ) * sm_scale
            if logit_cap:
                s = logit_cap * jnp.tanh(s / logit_cap)
            causal = cpos[None, None, :] <= qpos[:, :, None]
            valid = owned[:, None, :] & causal
            valid = valid & (cpos[None, None, :] < seq_lens[:, None, None])
            if win is not None:
                in_win = cpos[None, None, :] > (qpos[:, :, None] - win)
                valid = valid & (in_win | (win <= 0))
            valid = valid[:, None]  # [B, 1, Lq, PB*ps]
            s = jnp.where(valid, s, NEG_INF)
            m_new = jnp.maximum(
                m, jnp.max(s, axis=-1, keepdims=True)
            )
            corr = jnp.exp(m - m_new)
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.einsum(
                "bhlc,bchd->bhld", p, v_ctx.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return (m_new, l, acc), None

        m0 = jnp.full((B, Hq, Lq, 1), -1e20, jnp.float32)
        l0 = jnp.zeros((B, Hq, Lq, 1), jnp.float32)
        a0 = jnp.zeros((B, Hq, Lq, D), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(
            chunk_step, (m0, l0, a0),
            jnp.arange(n_chunks, dtype=jnp.int32),
        )
        # ---- exact LSE merge across ranks ----
        m_star = jax.lax.pmax(m, axis)
        scale = jnp.exp(m - m_star)
        num = jax.lax.psum(acc * scale, axis)
        den = jax.lax.psum(l * scale, axis)
        den = jnp.where(den == 0.0, 1.0, den)
        out = (num / den).astype(q.dtype)  # [B, H, Lq, D]
        return jnp.transpose(out, (0, 2, 1, 3)), kv_local

    out, kv_cache = jax.shard_map(
        fn_pallas if use_pallas else fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(axis)),
        axis_names={axis},
        check_vma=False,
    )(
        kv_cache, q, k_new, v_new, batch.out_slots, batch.page_table,
        batch.positions, batch.seq_lens, layer_idx,
    )
    return out, kv_cache


def cp_prefill_attention(
    q: jnp.ndarray,  # [B, L, H, D] queries in ZIGZAG order, sharded on L
    k: jnp.ndarray,  # [B, L, H, D] keys in zigzag order, sharded on L
    v: jnp.ndarray,
    positions: jnp.ndarray,  # [B, L] ORIGINAL positions (zigzag order)
    sm_scale: float,
    mesh,
    axis: str = "tp",
    prefix: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Causal self-attention with the sequence zigzag-sharded over
    ``axis`` (prefill CP).

    Short shards take the dense path (one allgather + full score
    matrix).  Past ``RING_THRESHOLD`` local tokens the RING + FLASH
    path engages: K/V blocks rotate around the cp ring via ``ppermute``
    (one hop per step — ICI neighbour traffic, never a full allgather)
    while each rank folds the visiting block into running flash
    accumulators (m, l, acc) with blockwise tiling, so peak memory is
    O(L/cp · block) instead of O((L/cp) · L) scores + O(L) gathered
    K/V.  The zigzag layout balances the causal FLOPs across ranks
    (reference cp/zigzag.py; ring schedule = reference's distributed
    flash decode over cp).

    ``prefix`` = (k_pfx, v_pfx, pfx_pos), each replicated across the cp
    ranks: cached-prefix / earlier-chunk KV gathered from the pages.
    ``pfx_pos`` holds each slot's TRUE position, with invalid slots set
    to a huge sentinel so the causal mask drops them — the prefix folds
    into the same flash accumulators before the ring (reference
    cp four_one.py attends cached prefixes the same way)."""
    from jax.sharding import PartitionSpec as P

    cp = mesh.shape[axis]
    Ll = q.shape[1] // cp  # local tokens per rank (inside the shard_map)

    def dense_fn(q, k, v, pos, *pfx):
        k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        pos_full = jax.lax.all_gather(pos, axis, axis=1, tiled=True)
        if pfx:
            k_full = jnp.concatenate([pfx[0], k_full], axis=1)
            v_full = jnp.concatenate([pfx[1], v_full], axis=1)
            pos_full = jnp.concatenate([pfx[2], pos_full], axis=1)
        scores = jnp.einsum(
            "blhd,bchd->bhlc", q, k_full,
            preferred_element_type=jnp.float32,
        ) * sm_scale
        causal = pos_full[:, None, None, :] <= pos[:, None, :, None]
        scores = jnp.where(causal, scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        p = jnp.where(jnp.isnan(p), 0.0, p)
        out = jnp.einsum(
            "bhlc,bchd->blhd", p, v_full.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return out.astype(q.dtype)

    def ring_fn(q, k, v, pos, *pfx):
        B, ll, H, D = q.shape
        assert ll == Ll, (ll, Ll)
        qb = _cp_block(Ll)
        nq = Ll // qb
        qs = q.reshape(B, nq, qb, H, D)
        qpos = pos.reshape(B, nq, qb)
        perm = [(i, (i + 1) % cp) for i in range(cp)]

        def fold(fcarry, qi, qp, kbj, vbj, pbj):
            """One flash fold of a KV block into one q block's stats."""
            mi, li, ai = fcarry
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", qi, kbj,
                preferred_element_type=jnp.float32,
            ) * sm_scale
            causal = pbj[:, None, None, :] <= qp[:, None, :, None]
            s = jnp.where(causal, s, NEG_INF)
            m_new = jnp.maximum(mi, jnp.max(s, axis=-1, keepdims=True))
            corr = jnp.exp(mi - m_new)
            p = jnp.exp(s - m_new)
            p = jnp.where(causal, p, 0.0)
            li = li * corr + jnp.sum(p, axis=-1, keepdims=True)
            ai = ai * corr + jnp.einsum(
                "bhqk,bkhd->bhqd", p, vbj.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return m_new, li, ai

        def fold_chunked(m, l, acc, K_, V_, P_, bs):
            """Fold [B, C, ...] KV into every q block, C // bs blocks."""
            nb = K_.shape[1] // bs

            def outer(carry, ks):
                kbj, vbj, pbj = ks
                m, l, acc = carry
                m2, l2, a2 = [], [], []
                for j in range(nq):
                    mj, lj, aj = fold(
                        (m[:, :, j], l[:, :, j], acc[:, :, j]),
                        qs[:, j], qpos[:, j], kbj, vbj, pbj,
                    )
                    m2.append(mj)
                    l2.append(lj)
                    a2.append(aj)
                return (
                    jnp.stack(m2, 2), jnp.stack(l2, 2), jnp.stack(a2, 2),
                ), None

            (m, l, acc), _ = jax.lax.scan(
                outer,
                (m, l, acc),
                (
                    K_.reshape(B, nb, bs, H, D).swapaxes(0, 1),
                    V_.reshape(B, nb, bs, H, D).swapaxes(0, 1),
                    P_.reshape(B, nb, bs).swapaxes(0, 1),
                ),
            )
            return m, l, acc

        m = jnp.full((B, H, nq, qb, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((B, H, nq, qb, 1), jnp.float32)
        acc = jnp.zeros((B, H, nq, qb, D), jnp.float32)
        if pfx:
            m, l, acc = fold_chunked(
                m, l, acc, pfx[0], pfx[1], pfx[2],
                _cp_block(pfx[0].shape[1]),
            )

        def ring_step(carry, _):
            kb, vb, pb, m, l, acc = carry
            m, l, acc = fold_chunked(m, l, acc, kb, vb, pb, _cp_block(Ll))
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            pb = jax.lax.ppermute(pb, axis, perm)
            return (kb, vb, pb, m, l, acc), None

        (_, _, _, m, l, acc), _ = jax.lax.scan(
            ring_step, (k, v, pos, m, l, acc), None, length=cp
        )
        l = jnp.where(l == 0.0, 1.0, l)
        out = (acc / l).astype(q.dtype)  # [B, H, nq, qb, D]
        return jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(B, Ll, H, D)

    fn = ring_fn if Ll >= RING_THRESHOLD else dense_fn
    in_specs = [
        P(None, axis, None, None), P(None, axis, None, None),
        P(None, axis, None, None), P(None, axis),
    ]
    args = [q, k, v, positions]
    if prefix is not None:
        in_specs += [
            P(None, None, None, None), P(None, None, None, None),
            P(None, None),
        ]
        args += list(prefix)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, axis, None, None),
        axis_names={axis},
        check_vma=False,
    )(*args)
