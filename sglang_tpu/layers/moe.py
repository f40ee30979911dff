"""Sparse Mixture-of-Experts block.

Equivalent role to the reference's ``layers/moe/`` stack (``topk.py``
softmax top-k gating, ``fused_moe_triton/layer.py:139`` FusedMoE,
``moe_runner/``) — TPU-native:

* Gating, sort-by-expert, and combine are plain XLA ops on static shapes
  (T*topk tokens).
* The grouped expert GEMM uses ``jax.lax.ragged_dot`` — XLA's native
  ragged grouped matmul (the analogue of the reference's grouped-GEMM
  kernels, ``sgl-kernel/csrc/moe/``) which tiles each expert's row-group
  onto the MXU without materializing per-expert padding.
* TP sharding: expert weights shard on the ffn dim over the ``tp`` axis
  exactly like the dense MLP; XLA inserts the allreduce after w2.
  Expert-parallel (experts sharded over devices with all_to_all dispatch)
  lands with the multi-host work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.activation import get_act_fn


def moe_topk(
    gate_logits: jnp.ndarray,  # [T, E] f32
    top_k: int,
    norm_topk_prob: bool = True,
    gate_bias: Optional[jnp.ndarray] = None,  # [E] (deepseek e-score bias)
    scoring: str = "softmax",  # softmax (Mixtral/Qwen/DSv2) | sigmoid (DSv3)
    n_group: int = 1,  # DeepSeek group-limited routing (config n_group)
    topk_group: int = 1,  # groups a token may route into (config topk_group)
    jitter_eps: float = 0.01,  # sparsemixer threshold (PhiMoE)
):
    """Gating → (weights [T, k] f32, expert ids [T, k] i32).

    Reference: ``layers/moe/topk.py`` — softmax top-k (Mixtral/Qwen/DSv2
    'greedy') and sigmoid + selection-bias top-k (DeepSeek-V3 'noaux_tc':
    the bias affects SELECTION only; weights come from unbiased scores).
    Group-limited routing (DeepSeek n_group/topk_group): experts are split
    into n_group equal groups; the top topk_group groups are selected first
    (group score = sum of the group's top-2 biased scores on the sigmoid
    path, max score on the softmax path) and experts outside them are
    masked to -inf before the final per-token top-k.
    """
    gl = gate_logits.astype(jnp.float32)
    if scoring == "sparsemixer":
        # PhiMoE sparsemixer (arXiv:2409.12136) at INFERENCE: two greedy
        # argmax rounds; each weight is the softmax of the round's
        # logits MASKED to the near-max set ((max − s)/max(|s|, max) ≤
        # 2·jitter_eps) — no renormalization across the pair.
        assert top_k == 2, "sparsemixer is defined for top-2 routing"
        E = gl.shape[-1]

        def pick(scores, masked_src):
            idx = jnp.argmax(masked_src, axis=-1, keepdims=True)
            m = jnp.take_along_axis(masked_src, idx, axis=-1)
            factor = jnp.maximum(jnp.abs(gl), m)
            drop = (m - gl) / factor > 2 * jitter_eps
            gates = jnp.where(drop, -jnp.inf, masked_src)
            w = jnp.take_along_axis(
                jax.nn.softmax(gates, axis=-1), idx, axis=-1
            )
            return w, idx

        w1, e1 = pick(gl, gl)
        masked = jnp.where(
            jax.nn.one_hot(e1[:, 0], E, dtype=bool), -jnp.inf, gl
        )
        w2, e2 = pick(gl, masked)
        return (
            jnp.concatenate([w1, w2], axis=-1),
            jnp.concatenate([e1, e2], axis=-1).astype(jnp.int32),
        )
    if scoring == "sigmoid":
        probs = jax.nn.sigmoid(gl)
    elif scoring == "llama4":
        # Llama4Router: top-k on the RAW logits; the selected weights are
        # sigmoid of the top logits (no renormalization)
        _, idx = jax.lax.top_k(gl, top_k)
        w = jax.nn.sigmoid(jnp.take_along_axis(gl, idx, axis=-1))
        return w, idx.astype(jnp.int32)
    else:
        probs = jax.nn.softmax(gl, axis=-1)
    select = probs if gate_bias is None else probs + gate_bias
    if n_group > 1 and topk_group < n_group:
        T, E = select.shape
        sg = select.reshape(T, n_group, E // n_group)
        if scoring == "sigmoid":
            g_scores = jnp.sum(jax.lax.top_k(sg, 2)[0], axis=-1)  # [T, G]
        else:
            g_scores = jnp.max(sg, axis=-1)
        _, g_idx = jax.lax.top_k(g_scores, topk_group)  # [T, topk_group]
        g_mask = (
            jnp.zeros((T, n_group), bool).at[
                jnp.arange(T)[:, None], g_idx
            ].set(True)
        )
        select = jnp.where(
            jnp.repeat(g_mask, E // n_group, axis=-1), select, -jnp.inf
        )
    _, idx = jax.lax.top_k(select, top_k)  # E is small; exact top_k is cheap
    w = jnp.take_along_axis(probs, idx, axis=-1)
    if norm_topk_prob:
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
    return w, idx.astype(jnp.int32)


def _grouped_mlp(xs, w1, w3, w2, group_sizes, act, scales=None, e_row=None):
    """Grouped expert MLP over expert-sorted rows.

    With ``scales`` (int8-RESIDENT experts, reference ``w8a8_int8.py``
    MoE role): the per-out-channel scale applies to the ragged-dot
    OUTPUT, gathered per row's expert (``e_row``) — mathematically equal
    to dequantizing the weight (the scale doesn't touch the contraction
    dim) but the int8 slab stays resident in HBM: the int8→dtype convert
    fuses into the dot's operand read instead of materializing a bf16
    copy of every expert."""
    if scales is None:
        h1 = jax.lax.ragged_dot(xs, w1, group_sizes)  # [N, I]
        h3 = jax.lax.ragged_dot(xs, w3, group_sizes)
        inter = act(h1) * h3
        return jax.lax.ragged_dot(
            inter.astype(w2.dtype), w2, group_sizes
        )  # [N, H]
    s1, s3, s2 = scales  # [E, 1, I] / [E, 1, I] / [E, 1, H] f32
    dt = xs.dtype
    f32 = jnp.float32
    h1 = jax.lax.ragged_dot(
        xs, w1.astype(dt), group_sizes, preferred_element_type=f32
    ) * s1[e_row, 0]
    h3 = jax.lax.ragged_dot(
        xs, w3.astype(dt), group_sizes, preferred_element_type=f32
    ) * s3[e_row, 0]
    inter = (act(h1) * h3).astype(dt)
    return jax.lax.ragged_dot(
        inter, w2.astype(dt), group_sizes, preferred_element_type=f32
    ) * s2[e_row, 0]


def moe_block(
    hidden: jnp.ndarray,  # [B, L, H]
    gate_w: jnp.ndarray,  # [H, E]
    w1: jnp.ndarray,  # [E, H, I]  (gate proj per expert)
    w3: jnp.ndarray,  # [E, H, I]  (up proj per expert)
    w2: jnp.ndarray,  # [E, I, H]  (down proj per expert)
    *,
    top_k: int,
    norm_topk_prob: bool = True,
    hidden_act: str = "silu",
    gate_bias: Optional[jnp.ndarray] = None,
    scoring: str = "softmax",
    routed_scaling_factor: float = 1.0,
    n_group: int = 1,
    topk_group: int = 1,
    mesh=None,
    expert_parallel: bool = False,
    return_counts: bool = False,
    a2a: bool = False,
    weight_on_input: bool = False,  # Llama4: score scales the expert INPUT
    scales=None,  # (w1_s, w3_s, w2_s) per-out-channel f32 — int8 experts
    jitter_eps: float = 0.01,  # sparsemixer threshold (PhiMoE)
) -> jnp.ndarray:
    """Token-choice sparse MoE forward (Mixtral/Qwen/DeepSeek families).

    With ``expert_parallel`` (and a mesh), the grouped GEMMs run
    expert-sharded over the tp axis (see :func:`ep_grouped_mlp`); with
    ``a2a`` on top, tokens dispatch to their expert-owner ranks via
    ragged all-to-all (:func:`ep_dispatch_mlp`) instead of
    replicate+psum."""
    B, L, H = hidden.shape
    E = gate_w.shape[-1]
    T = B * L
    x = hidden.reshape(T, H)

    if weight_on_input:
        assert not a2a, "weight_on_input not wired through the a2a path"
    if expert_parallel and mesh is not None and a2a:
        from sglang_tpu.parallel.mesh import AXIS_TP

        ep = mesh.shape[AXIS_TP]
        Tp = -(-T // ep) * ep  # pad to an ep multiple (static under jit)
        xp = jnp.pad(x, ((0, Tp - T), (0, 0))) if Tp != T else x
        out = ep_dispatch_mlp(
            xp, gate_w, w1, w3, w2, mesh,
            top_k=top_k, hidden_act=hidden_act,
            norm_topk_prob=norm_topk_prob, gate_bias=gate_bias,
            scoring=scoring, routed_scaling_factor=routed_scaling_factor,
            n_group=n_group, topk_group=topk_group,
            return_counts=return_counts, scales=scales,
            jitter_eps=jitter_eps,
        )
        if return_counts:
            out, counts = out
        out = out[:T].reshape(B, L, H).astype(hidden.dtype)
        return (out, counts) if return_counts else out

    gate_logits = jnp.einsum(
        "th,he->te", x, gate_w, preferred_element_type=jnp.float32
    )
    weights, expert_idx = moe_topk(
        gate_logits, top_k, norm_topk_prob, gate_bias, scoring,
        n_group=n_group, topk_group=topk_group, jitter_eps=jitter_eps,
    )
    if routed_scaling_factor != 1.0:
        weights = weights * routed_scaling_factor

    # Flatten (token, slot) pairs and sort by expert for the grouped GEMM.
    flat_expert = expert_idx.reshape(T * top_k)  # [N]
    flat_token = jnp.repeat(
        jnp.arange(T, dtype=jnp.int32)[:, None], top_k, axis=1
    ).reshape(T * top_k)
    flat_w = weights.reshape(T * top_k)
    order = jnp.argsort(flat_expert)  # stable; N = T*top_k is small
    sorted_token = flat_token[order]
    group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)

    xs = x[sorted_token]  # [N, H]
    if weight_on_input:
        # Llama4TextMoe: the router score scales the expert INPUT (the
        # nonlinearity sees the scaled activation), not the output
        xs = (
            xs.astype(jnp.float32) * flat_w[order][:, None]
        ).astype(xs.dtype)
    if expert_parallel and mesh is not None:
        out_s = ep_grouped_mlp(
            xs, w1, w3, w2, group_sizes, mesh, hidden_act, scales=scales
        )  # [N, H]
    else:
        out_s = _grouped_mlp(
            xs, w1, w3, w2, group_sizes, get_act_fn(hidden_act),
            scales=scales, e_row=flat_expert[order],
        )  # [N, H]

    out_s = out_s.astype(jnp.float32)
    if not weight_on_input:
        out_s = out_s * flat_w[order][:, None]
    out = jnp.zeros((T, H), jnp.float32).at[sorted_token].add(out_s)
    out = out.reshape(B, L, H).astype(hidden.dtype)
    if return_counts:
        # per-(physical-)expert routed-token counts — EPLB's load signal
        # (reference eplb/expert_distribution.py); group_sizes is already
        # the bincount used by the grouped GEMM, so this is free.
        return out, group_sizes
    return out


# --------------------------------------------------------------------------
# Expert parallelism (experts sharded over the tp mesh axis)
# --------------------------------------------------------------------------

def ep_grouped_mlp(
    xs: jnp.ndarray,  # [N, H] tokens sorted by expert (replicated over tp)
    w1: jnp.ndarray,  # [E, H, I] sharded on E over tp
    w3: jnp.ndarray,
    w2: jnp.ndarray,  # [E, I, H]
    group_sizes: jnp.ndarray,  # [E] i32 (replicated)
    mesh,
    hidden_act: str,
    scales=None,  # (s1, s3, s2) [E, 1, D] f32, sharded on E like w
) -> jnp.ndarray:
    """Expert-parallel grouped MLP via shard_map (reference
    ``layers/moe/ep_moe/layer.py`` + ``token_dispatcher/``, TPU-native):

    Each shard owns a contiguous expert range.  Tokens are already sorted
    by expert, so a shard's tokens form one contiguous span — a roll
    brings them to row 0, the local ragged grouped GEMM runs over just
    that span, and a psum combines shard outputs (lossless: no capacity
    cap / token dropping; the all-to-all of the CUDA reference becomes
    replicate + psum, the right trade at inference token counts).
    """
    from jax.sharding import PartitionSpec as P

    from sglang_tpu.parallel.mesh import AXIS_TP

    E = group_sizes.shape[0]
    ep = mesh.shape[AXIS_TP]
    assert E % ep == 0, (E, ep)
    E_local = E // ep
    act = get_act_fn(hidden_act)

    def fn(xs, gs, w1l, w3l, w2l, *sc):
        r = jax.lax.axis_index(AXIS_TP)
        start = r * E_local
        csum = jnp.cumsum(gs)
        offset = jnp.where(start == 0, 0, csum[jnp.maximum(start - 1, 0)])
        xl = jnp.roll(xs, -offset, axis=0)
        gsl = jax.lax.dynamic_slice(gs, (start,), (E_local,))
        e_row = None
        if sc:
            # per-row LOCAL expert ordinal (rows beyond the shard's span
            # get an arbitrary in-range id; they're masked to 0 below)
            rows1 = jnp.arange(xs.shape[0], dtype=jnp.int32)
            e_row = jnp.clip(
                jnp.searchsorted(jnp.cumsum(gsl), rows1, side="right"),
                0, E_local - 1,
            )
        out = _grouped_mlp(
            xl, w1l, w3l, w2l, gsl, act, scales=sc or None, e_row=e_row
        )
        n_local = jnp.sum(gsl)
        rows = jnp.arange(xs.shape[0], dtype=jnp.int32)[:, None]
        out = jnp.where(rows < n_local, out, 0.0)
        out = jnp.roll(out, offset, axis=0)
        # psum in f32: XLA-CPU's AllReducePromotion pass crashes on the
        # bf16 collective this otherwise produces, and f32 accumulation
        # is numerically right anyway.
        return jax.lax.psum(out.astype(jnp.float32), AXIS_TP)

    args = [xs, group_sizes, w1, w3, w2]
    in_specs = [P(), P(), P(AXIS_TP), P(AXIS_TP), P(AXIS_TP)]
    if scales is not None:
        args.extend(scales)
        in_specs.extend([P(AXIS_TP)] * 3)
    sm = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(),
        axis_names={AXIS_TP},  # manual over tp only; dp/pp stay automatic
        check_vma=False,
    )
    # jit wrapper: the eager dispatch path of partial-manual shard_map
    # with check_vma=False hits a jax 0.9 bug (see ep_dispatch_mlp); in
    # the serving path this nests inside the model jit and inlines free.
    return jax.jit(sm)(*args)


# --------------------------------------------------------------------------
# Expert parallelism with token dispatch (all-to-all)
# --------------------------------------------------------------------------

def _ragged_a2a(
    operand, output, input_offsets, send_sizes, output_offsets, recv_sizes,
    *, axis: str, impl: str,
):
    """``jax.lax.ragged_all_to_all`` with a gather-based emulation.

    ``impl='ragged'`` is the real collective (TPU: per-pair DMA, comm
    volume = actual routed rows).  ``impl='gather'`` reproduces the exact
    semantics — including "rows not written keep ``output``'s value" —
    via one all_gather + vectorized chunk select; XLA:CPU has no
    ragged-all-to-all thunk, so tests and the driver's virtual-mesh
    dryrun take this path.  Comm volume is O(ep) worse; never used on TPU.
    """
    if impl == "ragged":
        return jax.lax.ragged_all_to_all(
            operand, output, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis_name=axis,
        )
    me = jax.lax.axis_index(axis)
    G = jax.lax.all_gather(operand, axis)  # [ep, N_send, ...]
    IO = jax.lax.all_gather(input_offsets, axis)  # [ep_src, ep_dst]
    SS = jax.lax.all_gather(send_sizes, axis)
    OO = jax.lax.all_gather(output_offsets, axis)
    cap = output.shape[0]
    r = jnp.arange(cap, dtype=jnp.int32)
    starts = OO[:, me][:, None]  # where src s's chunk lands in my buffer
    sizes = SS[:, me][:, None]
    covers = (r[None, :] >= starts) & (r[None, :] < starts + sizes)  # [ep, cap]
    src = jnp.argmax(covers, axis=0).astype(jnp.int32)
    covered = jnp.any(covers, axis=0)
    src_row = IO[src, me] + (r - OO[src, me])
    got = G[src, jnp.clip(src_row, 0, operand.shape[0] - 1)]
    mask = covered.reshape((cap,) + (1,) * (output.ndim - 1))
    return jnp.where(mask, got, output)


def ep_dispatch_mlp(
    x: jnp.ndarray,  # [T, H] tokens, sharded over `axis` on dim 0
    gate_w: jnp.ndarray,  # [H, E] replicated
    w1: jnp.ndarray,  # [E, H, I] sharded on E over `axis`
    w3: jnp.ndarray,
    w2: jnp.ndarray,  # [E, I, H]
    mesh,
    *,
    top_k: int,
    hidden_act: str = "silu",
    norm_topk_prob: bool = True,
    gate_bias: Optional[jnp.ndarray] = None,
    scoring: str = "softmax",
    routed_scaling_factor: float = 1.0,
    n_group: int = 1,
    topk_group: int = 1,
    return_counts: bool = False,
    a2a_impl: str = "auto",
    scales=None,  # (s1, s3, s2) [E, 1, D] f32, sharded on E like w
    jitter_eps: float = 0.01,
):
    """Expert-parallel MoE with REAL token dispatch — the TPU-native
    analogue of the reference's DeepEP dispatch/combine
    (``layers/moe/token_dispatcher/deepep.py``, ``ep_moe/``), replacing
    the replicate+psum fallback of :func:`ep_grouped_mlp`:

    1. each rank gates its LOCAL token shard and sorts the (token, slot)
       pairs by global expert id — pairs destined to the same owner rank
       become one contiguous chunk (ranks own contiguous expert spans);
    2. one ``jax.lax.ragged_all_to_all`` moves exactly the routed rows to
       their owner ranks (variable per-pair sizes — no GShard capacity
       cropping, no dropped tokens; the chunk-size matrix comes from one
       [ep]-int all_gather);
    3. the owner runs the local ragged grouped GEMM over its experts;
    4. a reverse ragged all-to-all returns the rows in original send
       order, and the home rank combines with the routing weights.

    Per-rank comm volume is ~2 * (T/ep) * top_k * H — proportional to
    the rank's own tokens, NOT to the global batch (the psum path moves
    the full [T*top_k, H] through every rank).  Receive buffers are
    sized T_local*top_k*ep rows (lossless worst case: every pair lands
    on one rank) — HBM cost equal to the replicated path's, but only
    actual rows travel.

    Returns [T, H] sharded like ``x`` (plus global per-expert counts
    [E] when ``return_counts`` — EPLB's load signal).
    """
    from jax.sharding import PartitionSpec as P

    from sglang_tpu.parallel.mesh import AXIS_TP

    E = gate_w.shape[-1]
    ep = mesh.shape[AXIS_TP]
    assert E % ep == 0, (E, ep)
    E_local = E // ep
    act = get_act_fn(hidden_act)
    T = x.shape[0]
    assert T % ep == 0, (T, ep)
    Tl = T // ep
    N_l = Tl * top_k  # local (token, slot) pairs
    CAP = N_l * ep  # lossless receive capacity
    if a2a_impl == "auto":
        # XLA:CPU has no ragged-all-to-all thunk — emulate there (tests,
        # driver virtual-mesh dryrun); real collective everywhere else.
        a2a_impl = "gather" if jax.default_backend() == "cpu" else "ragged"

    def fn(xl, gw, gb, w1l, w3l, w2l, *sc):
        me = jax.lax.axis_index(AXIS_TP)
        # ---- local gating ----
        gl = jnp.einsum(
            "th,he->te", xl, gw, preferred_element_type=jnp.float32
        )
        weights, eidx = moe_topk(
            gl, top_k, norm_topk_prob, gb, scoring,
            n_group=n_group, topk_group=topk_group, jitter_eps=jitter_eps,
        )
        if routed_scaling_factor != 1.0:
            weights = weights * routed_scaling_factor
        flat_e = eidx.reshape(N_l)
        flat_t = jnp.repeat(
            jnp.arange(Tl, dtype=jnp.int32)[:, None], top_k, axis=1
        ).reshape(N_l)
        flat_w = weights.reshape(N_l)
        # sort by global expert id: owner-rank chunks become contiguous
        order = jnp.argsort(flat_e, stable=True)
        xs_send = xl[flat_t[order]]  # [N_l, H]
        e_send = flat_e[order].astype(jnp.int32)
        counts_e = jnp.bincount(flat_e, length=E).astype(jnp.int32)
        send_sizes = counts_e.reshape(ep, E_local).sum(-1)  # [ep]
        input_offsets = jnp.cumsum(send_sizes) - send_sizes
        # ---- chunk-size matrix S[src, dst] via one tiny all_gather ----
        S = jax.lax.all_gather(send_sizes, AXIS_TP)  # [ep, ep]
        recv_sizes = S[:, me]  # from each src
        # where my chunk to dst d starts in d's buffer: sum_{s<me} S[s, d]
        output_offsets = (jnp.cumsum(S, axis=0) - S)[me, :]
        # ---- dispatch: tokens + their expert ids ----
        recv_x = _ragged_a2a(
            xs_send,
            jnp.zeros((CAP, xl.shape[1]), xs_send.dtype),
            input_offsets, send_sizes, output_offsets, recv_sizes,
            axis=AXIS_TP, impl=a2a_impl,
        )
        recv_e = _ragged_a2a(
            e_send,
            jnp.full((CAP,), E, jnp.int32),  # sentinel sorts last
            input_offsets, send_sizes, output_offsets, recv_sizes,
            axis=AXIS_TP, impl=a2a_impl,
        )
        total_recv = jnp.sum(recv_sizes)
        # ---- local grouped GEMM over my experts ----
        order2 = jnp.argsort(recv_e, stable=True)
        xr = recv_x[order2]
        le = recv_e[order2] - me * E_local
        valid = recv_e[order2] < E
        gs_local = jnp.bincount(
            jnp.where(valid, le, E_local), length=E_local + 1
        ).astype(jnp.int32)[:E_local]
        out_r = _grouped_mlp(
            xr, w1l, w3l, w2l, gs_local, act, scales=sc or None,
            e_row=jnp.clip(le, 0, E_local - 1) if sc else None,
        )
        rows = jnp.arange(CAP, dtype=jnp.int32)
        out_r = jnp.where((rows < total_recv)[:, None], out_r, 0.0)
        # unsort back to arrival (src-chunk) order
        out_arrival = jnp.zeros_like(out_r).at[order2].set(out_r)
        # ---- combine: reverse ragged all-to-all ----
        roff = jnp.cumsum(recv_sizes) - recv_sizes  # my arrival offsets
        # my chunk back to src s lands at s's original input offset for me
        back_offsets = (jnp.cumsum(S, axis=1) - S)[:, me]
        out_back = _ragged_a2a(
            out_arrival,
            jnp.zeros((N_l, xl.shape[1]), out_arrival.dtype),
            roff, recv_sizes, back_offsets, send_sizes,
            axis=AXIS_TP, impl=a2a_impl,
        )  # rows align with xs_send order
        y = (
            jnp.zeros((Tl, xl.shape[1]), jnp.float32)
            .at[flat_t[order]]
            .add(out_back.astype(jnp.float32) * flat_w[order][:, None])
        )
        if return_counts:
            return y, jax.lax.psum(counts_e, AXIS_TP)
        return y

    gb = gate_bias if gate_bias is not None else jnp.zeros((E,), jnp.float32)
    args = [x, gate_w, gb, w1, w3, w2]
    in_specs = [P(AXIS_TP), P(), P(), P(AXIS_TP), P(AXIS_TP), P(AXIS_TP)]
    if scales is not None:
        args.extend(scales)
        in_specs.extend([P(AXIS_TP)] * 3)
    sm = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(AXIS_TP), P()) if return_counts else P(AXIS_TP),
        axis_names={AXIS_TP},
        check_vma=False,
    )
    # jit wrapper: the eager dispatch path of partial-manual shard_map with
    # check_vma=False hits a jax 0.9 bug (_unmatch builds P(mesh.axis_names),
    # referring to non-manual axes); under jit the path isn't taken.  In the
    # serving path this is nested inside the model jit and inlines for free.
    return jax.jit(sm)(*args)
