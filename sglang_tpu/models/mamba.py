"""Mamba2 (selective state space) model family.

Equivalent role to the reference's SSM/hybrid support (SURVEY §2.2 row
"Mamba kernels": ``srt/models/mamba2.py`` family + causal-conv /
selective-scan kernels, ``mamba_ssm``).  TPU-native design:

* **State pool instead of KV pages**: an SSM carries a fixed-size
  recurrent state, not a growing KV cache.  The pool is
  ``{conv:  [L, NP, conv_dim, k-1],  ssm: [L, NP, H, P, N]}`` indexed
  by each request's FIRST page id — pages are unique per live request,
  so the existing page allocator doubles as the state-slot allocator
  and the garbage page 0 absorbs padded rows.  The pool flows through
  the jitted step functions as the (donated) cache operand, exactly
  like the KV pool does for attention models.
* **Chunked prefill carries state**: each chunk scans from the stored
  state and writes the updated state back, so arbitrarily long prompts
  stream through the normal chunked-prefill scheduler path.
* **One forward for prefill AND decode**: the fused K-step decode
  window calls the same scan with L=1 — the state recurrence IS the
  decode step.  ``lax.scan`` over time keeps everything compiled; the
  chunked SSD formulation (MXU-blocked) is the planned upgrade for
  long-prompt throughput.

Numerics mirror HF ``Mamba2ForCausalLM`` (transformers naive path):
in_proj → [z | xBC | dt], causal depthwise conv+SiLU over xBC,
dt = softplus(dt + bias), A = -exp(A_log), per-head recurrence
``state = exp(dt·A)·state + dt·x⊗B``, ``y = C·state + D·x``, gated
RMSNorm ``norm(y · silu(z))``, out_proj; residual blocks with RMSNorm.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.norm import rms_norm


def fresh_state_rows(batch):
    """[B] bool: rows whose FIRST chunk this forward is (cached_len 0).

    State slots are recycled page ids — a fresh request whose slot was
    used by an earlier (finished) request would otherwise READ that
    request's dirty conv/SSM/recurrent state as its initial state
    (reference: mamba cache zeroes state on request allocation,
    ``mamba_cache_manager``).  Every pool read in the SSM/hybrid
    families must zero-mask these rows."""
    return batch.positions[:, 0] == 0


def _chunked_ssd(x, dt, A, Bh, Ch, state0, chunk: int = 64):
    """Chunked state-space-duality scan (Mamba2 SSD; the MXU-blocked
    formulation the mamba_ssm CUDA kernels implement).

    Shapes: x [B, L, H, P], dt [B, L, H], A [H], B/C [B, L, H, N],
    state0 [B, H, P, N].  Within a chunk the output is a masked
    attention-like product ``(C B^T ∘ decay) · (dt·x)``; across chunks
    the state carries as ``h' = exp(Σa)·h + Σ decay_j (dt_j x_j ⊗ B_j)``.
    Exactly equals the per-step recurrence (verified in tests)."""
    Bsz, L, H, Pd = x.shape
    Q = min(chunk, L)
    while L % Q:
        Q //= 2
    nC = L // Q

    a = dt * A  # [B, L, H] log-decay per step
    xw = x * dt[..., None]  # dt-weighted inputs
    # chunked views: [B, nC, Q, ...], scan over nC
    def cview(t):
        return jnp.moveaxis(
            t.reshape(Bsz, nC, Q, *t.shape[2:]), 1, 0
        )  # [nC, B, Q, ...]

    def chunk_step(h, ops):
        xc, ac, bc, cc = ops  # [B, Q, H, P] / [B, Q, H] / [B, Q, H, N] x2
        cum = jnp.cumsum(ac, axis=1)  # [B, Q, H]
        total = cum[:, -1]  # [B, H]
        # intra-chunk: scores[i, j] = (C_i · B_j) exp(cum_i - cum_j), i >= j
        scores = jnp.einsum("bqhn,bkhn->bhqk", cc, bc)
        decay = cum[:, :, None] - cum[:, None, :]  # [B, Q(i), Q(j), H]
        decay = jnp.transpose(decay, (0, 3, 1, 2))  # [B, H, Q, Q]
        causal = jnp.tril(jnp.ones((Q, Q), bool))
        gate = jnp.where(causal, jnp.exp(decay), 0.0)
        y_intra = jnp.einsum("bhqk,bkhp->bqhp", scores * gate, xc)
        # inter-chunk: contribution of the carried state
        y_inter = jnp.einsum(
            "bqhn,bhpn->bqhp", cc * jnp.exp(cum)[..., None], h
        )
        # state update: h' = exp(total)·h + Σ_j exp(total - cum_j) x_j ⊗ B_j
        w = jnp.exp(total[:, None] - cum)  # [B, Q, H]
        h_new = h * jnp.exp(total)[:, :, None, None] + jnp.einsum(
            "bqhp,bqhn->bhpn", xc * w[..., None], bc
        )
        return h_new, y_intra + y_inter

    state, ys = jax.lax.scan(
        chunk_step, state0, (cview(xw), cview(a), cview(Bh), cview(Ch))
    )
    y = jnp.moveaxis(ys, 0, 1).reshape(Bsz, L, H, Pd)
    return y, state


class Mamba2ForCausalLM:
    """Pure-SSM causal LM (HF ``mamba2`` architecture)."""

    is_stateful = True  # state pool replaces the KV cache
    # prefix caching cannot replay an SSM state; the runner forces the
    # radix cache off (reference disables prefix cache for mamba too)
    requires_disable_radix = True
    supports_cp = False
    supports_dcp = False

    def __init__(self, config, mesh_ctx=None):
        self.config = config
        self.mesh_ctx = mesh_ctx
        hf = config.hf_config or {}
        H = config.hidden_size
        self.d_inner = int(hf.get("expand", 2)) * H
        self.n_heads = int(hf.get("num_heads", self.d_inner // 64))
        self.headdim = int(hf.get("head_dim", self.d_inner // self.n_heads))
        self.d_state = int(hf.get("state_size", 128))
        self.n_groups = int(hf.get("n_groups", 1))
        self.conv_k = int(hf.get("conv_kernel", 4))
        self.conv_dim = (
            self.d_inner + 2 * self.n_groups * self.d_state
        )
        self.d_in_proj = (
            2 * self.d_inner
            + 2 * self.n_groups * self.d_state
            + self.n_heads
        )
        self.eps = float(hf.get("layer_norm_epsilon", 1e-5))

    # ------------------------------------------------------------ schema
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_hidden_layers, c.hidden_size
        layers = {
            "norm": (L, H),
            "in_proj": (L, H, self.d_in_proj),
            "conv_w": (L, self.conv_dim, self.conv_k),
            "conv_b": (L, self.conv_dim),
            "dt_bias": (L, self.n_heads),
            "A_log": (L, self.n_heads),
            "D": (L, self.n_heads),
            "gnorm": (L, self.d_inner),
            "out_proj": (L, self.d_inner, H),
        }
        shapes = {
            "embed": (c.vocab_size, H),
            "layers": layers,
            "final_ln": (H,),
        }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (c.vocab_size, H)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        from sglang_tpu.parallel.mesh import AXIS_TP

        layers = {
            "norm": P(None, None),
            "in_proj": P(None, None, AXIS_TP),
            "conv_w": P(None, None, None),
            "conv_b": P(None, None),
            "dt_bias": P(None, None),
            "A_log": P(None, None),
            "D": P(None, None),
            "gnorm": P(None, None),
            "out_proj": P(None, AXIS_TP, None),
        }
        specs = {
            "embed": P(None, None),
            "layers": layers,
            "final_ln": P(None),
        }
        if not self.config.tie_word_embeddings:
            specs["lm_head"] = P(None, None)
        return specs

    def hf_weight_mapping(self):
        def mapping(name: str):
            name = name.removeprefix("backbone.")
            if name == "embeddings.weight":
                return ("embed", None, None)
            if name == "norm_f.weight":
                return ("final_ln", None, None)
            if name == "lm_head.weight":
                if self.config.tie_word_embeddings:
                    return None
                return ("lm_head", None, None)
            parts = name.split(".")
            if parts[0] != "layers":
                return None
            li = int(parts[1])
            tail = ".".join(parts[2:])
            table = {
                "norm.weight": ("layers.norm", None),
                "mixer.in_proj.weight": ("layers.in_proj", "t"),
                "mixer.conv1d.weight": (
                    "layers.conv_w",
                    lambda t: np.asarray(t)[:, 0, :],  # [C,1,k] -> [C,k]
                ),
                "mixer.conv1d.bias": ("layers.conv_b", None),
                "mixer.dt_bias": ("layers.dt_bias", None),
                "mixer.A_log": ("layers.A_log", None),
                "mixer.D": ("layers.D", None),
                "mixer.norm.weight": ("layers.gnorm", None),
                "mixer.out_proj.weight": ("layers.out_proj", "t"),
            }
            if tail in table:
                path, tf = table[tail]
                return (path, li, tf)
            return None

        return mapping

    # --------------------------------------------------------- state pool
    def init_state_pool(self, num_pages: int, dtype=jnp.float32):
        """Zeros state pool, slot-indexed by a request's first page id."""
        c = self.config
        L = c.num_hidden_layers
        return {
            "conv": jnp.zeros(
                (L, num_pages, self.conv_k - 1, self.conv_dim), dtype
            ),
            "ssm": jnp.zeros(
                (L, num_pages, self.n_heads, self.headdim, self.d_state),
                dtype,
            ),
        }

    def state_pool_bytes_per_slot(self) -> int:
        c = self.config
        return 4 * c.num_hidden_layers * (
            (self.conv_k - 1) * self.conv_dim
            + self.n_heads * self.headdim * self.d_state
        )

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params,
        kv_cache,  # the state pool dict
        batch,
        *,
        num_slots,
        page_size,
        attn_backend="xla",
        return_all_hidden=False,
        capture_features=False,
        lora=None,
        context_parallel=False,
        capture_expert_counts=False,
        quant_stacks=None,
    ):
        del num_slots, page_size, attn_backend, lora, context_parallel
        del capture_expert_counts, quant_stacks
        c = self.config
        B, Lq = batch.input_ids.shape
        nh, hd, ns, ng = (
            self.n_heads, self.headdim, self.d_state, self.n_groups,
        )
        di, k = self.d_inner, self.conv_k
        slot = batch.page_table[:, 0]  # [B] state slot = first page id
        fresh = fresh_state_rows(batch)
        # valid new-token count per row (pad rows: seq_lens 0 -> 0)
        n_new = jnp.maximum(
            batch.seq_lens - batch.positions[:, 0], 0
        )  # [B]
        tmask = (
            jnp.arange(Lq, dtype=jnp.int32)[None, :] < n_new[:, None]
        )  # [B, Lq]

        hidden = params["embed"][batch.input_ids]  # [B, Lq, H]

        def layer_fn(carry, w):
            h, pool_conv, pool_ssm, li = carry
            normed = rms_norm(h, w["norm"], self.eps)
            zxbcdt = normed @ w["in_proj"]  # [B, Lq, d_in_proj]
            z = zxbcdt[..., :di]
            xBC = zxbcdt[..., di : di + self.conv_dim]
            dt_raw = zxbcdt[..., di + self.conv_dim :]  # [B, Lq, nh]

            # ---- causal depthwise conv with carried state ----
            xBC = jnp.where(tmask[..., None], xBC, 0.0)
            cstate = jnp.where(
                fresh[:, None, None], 0.0, pool_conv[li][slot]
            )  # [B, k-1, conv_dim]; fresh rows start from zero state
            ext = jnp.concatenate([cstate, xBC], axis=1)  # [B, k-1+Lq, C]
            conv = sum(
                ext[:, i : i + Lq] * w["conv_w"][:, i]
                for i in range(k)
            ) + w["conv_b"]
            xBC = jax.nn.silu(conv)
            # next conv state: last k-1 VALID inputs per row
            gidx = (
                n_new[:, None] + jnp.arange(k - 1, dtype=jnp.int32)[None]
            )  # ext rows [n_new, n_new+k-2] == last k-1 valid
            new_cstate = jnp.take_along_axis(
                ext, gidx[..., None], axis=1
            )
            pool_conv = pool_conv.at[li, slot].set(
                new_cstate.astype(pool_conv.dtype)
            )

            x = xBC[..., :di].reshape(B, Lq, nh, hd)
            Bmat = xBC[..., di : di + ng * ns].reshape(B, Lq, ng, ns)
            Cmat = xBC[..., di + ng * ns :].reshape(B, Lq, ng, ns)
            rep = nh // ng
            Bh = jnp.repeat(Bmat, rep, axis=2)  # [B, Lq, nh, ns]
            Ch = jnp.repeat(Cmat, rep, axis=2)
            dt = jax.nn.softplus(
                dt_raw.astype(jnp.float32) + w["dt_bias"]
            )
            dt = jnp.where(tmask[..., None], dt, 0.0)  # pads: no-op
            A = -jnp.exp(w["A_log"].astype(jnp.float32))  # [nh]

            sstate = jnp.where(
                fresh[:, None, None, None],
                0.0,
                pool_ssm[li][slot].astype(jnp.float32),
            )

            if Lq == 1:
                # decode: one recurrence step
                dA = jnp.exp(dt[:, 0] * A)  # [B, nh]
                upd = (
                    dt[:, 0, :, None, None]
                    * x[:, 0, :, :, None].astype(jnp.float32)
                    * Bh[:, 0, :, None, :].astype(jnp.float32)
                )
                sstate = sstate * dA[:, :, None, None] + upd
                y = jnp.einsum(
                    "bhpn,bhn->bhp", sstate,
                    Ch[:, 0].astype(jnp.float32),
                )[:, None]  # [B, 1, nh, hd]
            else:
                # prefill: chunked SSD (Mamba2 state-space duality) —
                # within-chunk attention-like [Q, Q] matmuls (MXU) +
                # inter-chunk state recurrence, exactly equal to the
                # per-step scan
                y, sstate = _chunked_ssd(
                    x.astype(jnp.float32),
                    dt,
                    A,
                    Bh.astype(jnp.float32),
                    Ch.astype(jnp.float32),
                    sstate,
                )
            pool_ssm = pool_ssm.at[li, slot].set(
                sstate.astype(pool_ssm.dtype)
            )
            y = y + w["D"][:, None] * x.astype(jnp.float32)
            y = y.reshape(B, Lq, di)
            # gated RMSNorm: norm(y * silu(z))
            y = y * jax.nn.silu(z.astype(jnp.float32))
            y = rms_norm(y, w["gnorm"], self.eps)
            h = h + (y.astype(h.dtype) @ w["out_proj"])
            return (h, pool_conv, pool_ssm, li + 1), None

        (hidden, pc, ps_, _), _ = jax.lax.scan(
            layer_fn,
            (hidden, kv_cache["conv"], kv_cache["ssm"], jnp.int32(0)),
            params["layers"],
        )
        kv_cache = {"conv": pc, "ssm": ps_}
        hidden = rms_norm(hidden, params["final_ln"], self.eps)
        flat = hidden.reshape(B * Lq, -1)
        extras = []
        if capture_features:
            extras.append(hidden)
        if return_all_hidden:
            return (flat, kv_cache, *extras)
        return (flat[batch.logits_idx], kv_cache, *extras)

    def compute_logits(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        w = (
            params["embed"]
            if self.config.tie_word_embeddings
            else params["lm_head"]
        )
        return jnp.einsum(
            "bh,vh->bv", hidden, w, preferred_element_type=jnp.float32
        )

    def per_layer_window(self) -> np.ndarray:
        return np.zeros((self.config.num_hidden_layers,), np.int32)


class MambaForCausalLM(Mamba2ForCausalLM):
    pass


EntryClass = [Mamba2ForCausalLM, MambaForCausalLM]
