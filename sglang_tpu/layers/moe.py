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
    if scoring == "sigmoid":
        probs = jax.nn.sigmoid(gl)
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
) -> jnp.ndarray:
    """Token-choice sparse MoE forward (Mixtral/Qwen/DeepSeek families).

    With ``expert_parallel`` (and a mesh), the grouped GEMMs run
    expert-sharded over the tp axis (see :func:`ep_grouped_mlp`)."""
    B, L, H = hidden.shape
    E = gate_w.shape[-1]
    T = B * L
    x = hidden.reshape(T, H)

    gate_logits = jnp.einsum(
        "th,he->te", x, gate_w, preferred_element_type=jnp.float32
    )
    weights, expert_idx = moe_topk(
        gate_logits, top_k, norm_topk_prob, gate_bias, scoring,
        n_group=n_group, topk_group=topk_group,
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
    if expert_parallel and mesh is not None:
        out_s = ep_grouped_mlp(
            xs, w1, w3, w2, group_sizes, mesh, hidden_act
        )  # [N, H]
    else:
        h1 = jax.lax.ragged_dot(xs, w1, group_sizes)  # [N, I]
        h3 = jax.lax.ragged_dot(xs, w3, group_sizes)
        inter = get_act_fn(hidden_act)(h1) * h3
        out_s = jax.lax.ragged_dot(
            inter.astype(w2.dtype), w2, group_sizes
        )  # [N, H]

    out_s = out_s.astype(jnp.float32) * flat_w[order][:, None]
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

    def fn(xs, gs, w1l, w3l, w2l):
        r = jax.lax.axis_index(AXIS_TP)
        start = r * E_local
        csum = jnp.cumsum(gs)
        offset = jnp.where(start == 0, 0, csum[jnp.maximum(start - 1, 0)])
        xl = jnp.roll(xs, -offset, axis=0)
        gsl = jax.lax.dynamic_slice(gs, (start,), (E_local,))
        h1 = jax.lax.ragged_dot(xl, w1l, gsl)
        h3 = jax.lax.ragged_dot(xl, w3l, gsl)
        inter = act(h1) * h3
        out = jax.lax.ragged_dot(inter.astype(w2l.dtype), w2l, gsl)
        n_local = jnp.sum(gsl)
        rows = jnp.arange(xs.shape[0], dtype=jnp.int32)[:, None]
        out = jnp.where(rows < n_local, out, 0.0)
        out = jnp.roll(out, offset, axis=0)
        # psum in f32: XLA-CPU's AllReducePromotion pass crashes on the
        # bf16 collective this otherwise produces, and f32 accumulation
        # is numerically right anyway.
        return jax.lax.psum(out.astype(jnp.float32), AXIS_TP)

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS_TP), P(AXIS_TP), P(AXIS_TP)),
        out_specs=P(),
        axis_names={AXIS_TP},  # manual over tp only; dp/pp stay automatic
        check_vma=False,
    )(xs, group_sizes, w1, w3, w2)
