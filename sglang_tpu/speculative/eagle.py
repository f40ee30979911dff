"""EAGLE speculative decoding (chain drafts, device rejection sampling).

Equivalent role to the reference's EAGLE stack
(``speculative/eagle_worker_v2.py`` — draft :505, verify :1538;
``reject_sampling.py``; draft models ``models/llama_eagle.py``) —
TPU-native design:

* The draft model is ONE llama-style decoder layer plus an ``fc`` that
  fuses [token embedding, target feature] → hidden (EAGLE-1 topology).
  Embedding / final norm / lm_head are shared with the target.
* "Features" are the target's PRE-final-norm last-layer hiddens.  A
  device-resident **feature pool** [S, K+1, H] (S = spec slots, one per
  running request) carries them between rounds — they never cross the
  host link.
* The draft keeps its OWN 1-layer paged KV cache over the SAME page
  table as the target (same page geometry, so no extra allocator).
* Per round, two fused device programs run:
    1. ``draft window``: draft-extend over last round's accepted tokens
       with TRUE target features (the reference's draft_extend, :760),
       then chain k draft steps sampling with the request temperature.
       Draft q-logits stay on device for the verifier.
    2. ``verify``: one target extend over [last_token, drafts] +
       **device rejection sampling** (accept d_i w.p. min(1, p_i/q_i),
       residual-sample on first reject, bonus-sample if all accepted —
       reference speculative_sampling.cu semantics), and feature-pool
       refresh.  Greedy rows use exact argmax-prefix acceptance.

Checkpoint mapping follows HF EAGLE draft releases: ``fc.weight``
(+optional bias), ``layers.0.*`` decoder tensors, optional
``embed_tokens.weight`` (else the target's embedding is shared), and an
optional ``layers.0.input_layernorm`` (EAGLE-1 omits it — identity).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import act_and_mul
from sglang_tpu.layers.attention import paged_attention
from sglang_tpu.layers.norm import rms_norm
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.model_executor.forward_batch import DeviceBatch
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

NEG_INF = -1e30


class EagleDraft:
    """Draft-model definition: params schema + one-layer forward."""

    has_eh_norms = False
    has_head_norm = False
    # EAGLE3 (reference models/llama_eagle3.py): the draft fuses the
    # target's aux hidden states from `num_aux` layers via fc (3H→H),
    # its decoder layer reads cat(ln(embeds), hidden_norm(hidden)) (2H
    # qkv in-dim), and it carries its OWN lm_head over a DRAFT vocab
    # with a d2t offset map into the target vocab.
    is_eagle3 = False
    num_aux = 3
    aux_layer_ids: tuple = ()
    draft_vocab = 0

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.hq = c.num_attention_heads
        self.hkv = c.num_key_value_heads
        self.hd = c.head_dim
        self.sm_scale = 1.0 / float(np.sqrt(c.head_dim))
        self.inv_freq = compute_inv_freq(
            c.head_dim, c.rope_theta, c.rope_scaling, c.partial_rotary_factor
        )
        self.rot_half = int(self.inv_freq.shape[0])

    # ------------------------------------------------------------- params
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        hq, hkv, d = self.hq, self.hkv, self.hd
        return {
            "fc": (2 * H, H),
            "fc_bias": (H,),
            # MTP/NextN drafts (DeepSeek-V3 MTP module, llama_nextn):
            # enorm/hnorm RMS-normalize the [embed, feature] halves
            # before eh_proj, and shared_head.norm replaces the target's
            # final norm ahead of the (shared) lm_head.  All identity
            # when absent (plain EAGLE-1 geometry).
            "enorm": (H,),
            "hnorm": (H,),
            "head_norm": (H,),
            "input_ln": (H,),  # identity (ones) when absent from ckpt
            "q_proj": (H, hq * d),
            "k_proj": (H, hkv * d),
            "v_proj": (H, hkv * d),
            "o_proj": (hq * d, H),
            "post_ln": (H,),
            "gate_proj": (H, I),
            "up_proj": (H, I),
            "down_proj": (I, H),
        }

    def param_specs(self) -> Dict[str, Any]:
        from jax.sharding import PartitionSpec as P

        from sglang_tpu.parallel.mesh import AXIS_TP

        col, row = P(None, AXIS_TP), P(AXIS_TP, None)
        return {
            "fc": P(None, None),
            "fc_bias": P(None),
            "enorm": P(None),
            "hnorm": P(None),
            "head_norm": P(None),
            "input_ln": P(None),
            "q_proj": col,
            "k_proj": col,
            "v_proj": col,
            "o_proj": row,
            "post_ln": P(None),
            "gate_proj": col,
            "up_proj": col,
            "down_proj": row,
        }

    def hf_weight_mapping(self):
        """EAGLE draft checkpoint names → our paths (input_ln/fc_bias are
        optional in released checkpoints; absent → identity/zero).

        MTP/NextN checkpoints (reference models/llama_nextn.py family,
        deepseek_nextn.py) embed the draft as an extra decoder layer at
        ANY index, with ``eh_proj`` instead of ``fc`` and enorm/hnorm/
        shared_head.norm around it — the layer index is stripped and the
        MTP names alias onto the same schema."""
        import re as _re

        layer_re = _re.compile(r"^layers\.\d+\.(.*)$")

        def mapping(name: str):
            name = name.removeprefix("model.")
            m = layer_re.match(name)
            tail = m.group(1) if m else name
            table = {
                "fc.weight": ("fc", "t"),
                "fc.bias": ("fc_bias", None),
                # ---- MTP / NextN names ----
                "eh_proj.weight": ("fc", "t"),
                "enorm.weight": ("enorm", None),
                "hnorm.weight": ("hnorm", None),
                "shared_head.norm.weight": ("head_norm", None),
                "final_layernorm.weight": ("head_norm", None),
                # ---- decoder-layer names (index stripped) ----
                "input_layernorm.weight": ("input_ln", None),
                "self_attn.q_proj.weight": ("q_proj", "t"),
                "self_attn.k_proj.weight": ("k_proj", "t"),
                "self_attn.v_proj.weight": ("v_proj", "t"),
                "self_attn.o_proj.weight": ("o_proj", "t"),
                "post_attention_layernorm.weight": ("post_ln", None),
                "mlp.gate_proj.weight": ("gate_proj", "t"),
                "mlp.up_proj.weight": ("up_proj", "t"),
                "mlp.down_proj.weight": ("down_proj", "t"),
            }
            if tail in table:
                path, tf = table[tail]
                return (path, None, tf)
            return None

        return mapping

    # -------------------------------------------------------------- EAGLE3
    def init_eagle3(self, draft_path: str, target_vocab: int):
        """Switch to the EAGLE3 geometry; reads the draft's config.json
        for the aux-capture layer ids (defaults to the reference's
        [2, L//2, L-3] over the TARGET depth)."""
        import json
        import os

        self.is_eagle3 = True
        cfgp = os.path.join(draft_path, "config.json")
        dcfg = {}
        if os.path.exists(cfgp):
            with open(cfgp) as f:
                dcfg = json.load(f)
        ec = dcfg.get("eagle_config") or {}
        ids = ec.get("eagle_aux_hidden_state_layer_ids")
        Lt = self.config.num_hidden_layers
        self.aux_layer_ids = tuple(
            int(i) for i in (ids or (2, Lt // 2, Lt - 3))
        )
        self.num_aux = len(self.aux_layer_ids)
        self.draft_vocab = int(
            dcfg.get("draft_vocab_size", dcfg.get("vocab_size", 0))
            or target_vocab
        )
        self.target_vocab = target_vocab

    def _eagle3_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        hq, hkv, d = self.hq, self.hkv, self.hd
        from sglang_tpu.layers.quantization import ParamShape

        return {
            "fc": (self.num_aux * H, H),
            "fc_bias": (H,),
            "embed_ln": (H,),  # input_layernorm (applies to EMBEDS)
            "hidden_norm": (H,),
            "q_proj": (2 * H, hq * d),
            "k_proj": (2 * H, hkv * d),
            "v_proj": (2 * H, hkv * d),
            "o_proj": (hq * d, H),
            "post_ln": (H,),
            "gate_proj": (H, I),
            "up_proj": (H, I),
            "down_proj": (I, H),
            "d_norm": (H,),  # draft final norm before the draft head
            "d_head": (H, self.draft_vocab),
            "d2t": ParamShape((self.draft_vocab,), jnp.int32),
        }

    def head_logits(self, dp: Dict[str, Any], g: jnp.ndarray) -> jnp.ndarray:
        """EAGLE3 draft head: rms(g) @ d_head over the DRAFT vocab,
        scattered into the target vocab via the d2t offset map
        (target_id = draft_idx + d2t[draft_idx]); non-draft target ids
        get -inf so their probability is exactly 0."""
        c = self.config
        normed = rms_norm(g, dp["d_norm"], c.rms_norm_eps)
        dl = jnp.einsum(
            "...h,hv->...v", normed, dp["d_head"],
            preferred_element_type=jnp.float32,
        )  # [..., Vd]
        tmap = dp["d2t"] + jnp.arange(self.draft_vocab, dtype=jnp.int32)
        out = jnp.full((*dl.shape[:-1], self.target_vocab), NEG_INF,
                       jnp.float32)
        return out.at[..., tmap].set(dl)

    def load_params(self, draft_path: Optional[str], dtype) -> Dict[str, Any]:
        """Load from a draft checkpoint dir; dummy random when absent."""
        if self.is_eagle3:
            return self._load_eagle3(draft_path, dtype)
        shapes = self.param_shapes()
        if draft_path:
            import glob
            import os

            from sglang_tpu.model_loader.loader import SafetensorsFile

            host = {
                k: np.zeros(v, np.float32) for k, v in shapes.items()
            }
            for nm in ("input_ln", "enorm", "hnorm", "head_norm"):
                host[nm][:] = 1.0  # identity default
            mapping = self.hf_weight_mapping()
            n = 0
            seen = set()
            for f in sorted(
                glob.glob(os.path.join(draft_path, "*.safetensors"))
            ):
                st = SafetensorsFile(f)
                for name in st.keys():
                    m = mapping(name)
                    if m is None:
                        continue
                    path, _, tf = m
                    t = st.get_tensor(name)
                    if tf == "t":
                        t = t.T
                    np.copyto(host[path], t.astype(np.float32))
                    seen.add(path)
                    n += 1
            if n == 0:
                raise ValueError(f"no EAGLE draft tensors in {draft_path}")
            # MTP geometry flags decide the forward's norm placement
            self.has_eh_norms = "enorm" in seen or "hnorm" in seen
            self.has_head_norm = "head_norm" in seen
            logger.info(
                "EAGLE draft: loaded %d tensors%s", n,
                " (MTP/NextN geometry)" if self.has_eh_norms else "",
            )
            return {k: jnp.asarray(v, dtype) for k, v in host.items()}
        # dummy: random per-leaf (norms = 1)
        rng = np.random.RandomState(1234)
        out = {}
        for k, shape in shapes.items():
            if k.endswith("_ln"):
                out[k] = jnp.ones(shape, dtype)
            elif k == "fc_bias":
                out[k] = jnp.zeros(shape, dtype)
            else:
                out[k] = jnp.asarray(
                    rng.randn(*shape) / np.sqrt(shape[0]), dtype
                )
        return out

    def _load_eagle3(self, draft_path: Optional[str], dtype):
        """EAGLE3 checkpoint names: top-level fc/d2t/norm/lm_head (+
        optional embed_tokens) and the decoder layer under ``midlayer.``
        or ``layers.0.`` — reference llama_eagle3.py load_weights."""
        import glob
        import os

        shapes = self._eagle3_shapes()
        host = {
            k: np.zeros(
                v.shape if hasattr(v, "shape") else v,
                np.int32 if k == "d2t" else np.float32,
            )
            for k, v in shapes.items()
        }
        for nm in ("embed_ln", "hidden_norm", "post_ln", "d_norm"):
            host[nm][:] = 1.0
        table = {
            "fc.weight": ("fc", "t"),
            "fc.bias": ("fc_bias", None),
            "d2t": ("d2t", None),
            "norm.weight": ("d_norm", None),
            "lm_head.weight": ("d_head", "t"),
            "input_layernorm.weight": ("embed_ln", None),
            "hidden_norm.weight": ("hidden_norm", None),
            "self_attn.q_proj.weight": ("q_proj", "t"),
            "self_attn.k_proj.weight": ("k_proj", "t"),
            "self_attn.v_proj.weight": ("v_proj", "t"),
            "self_attn.o_proj.weight": ("o_proj", "t"),
            "post_attention_layernorm.weight": ("post_ln", None),
            "mlp.gate_proj.weight": ("gate_proj", "t"),
            "mlp.up_proj.weight": ("up_proj", "t"),
            "mlp.down_proj.weight": ("down_proj", "t"),
        }
        n = 0
        embed_d = None
        if draft_path:
            from sglang_tpu.model_loader.loader import SafetensorsFile

            for f in sorted(
                glob.glob(os.path.join(draft_path, "*.safetensors"))
            ):
                st = SafetensorsFile(f)
                for name in st.keys():
                    tail = name.removeprefix("model.")
                    for pre in ("midlayer.", "layers.0."):
                        tail = tail.removeprefix(pre)
                    if tail == "embed_tokens.weight":
                        embed_d = np.asarray(
                            st.get_tensor(name), np.float32
                        )
                        n += 1
                        continue
                    ent = table.get(tail)
                    if ent is None:
                        continue
                    path, tf = ent
                    t = st.get_tensor(name)
                    if tf == "t":
                        t = t.T
                    np.copyto(
                        host[path],
                        np.asarray(
                            t, np.int32 if path == "d2t" else np.float32
                        ),
                    )
                    n += 1
            if n == 0:
                raise ValueError(f"no EAGLE3 draft tensors in {draft_path}")
            logger.info("EAGLE3 draft: loaded %d tensors", n)
        out = {
            k: jnp.asarray(v, jnp.int32 if k == "d2t" else dtype)
            for k, v in host.items()
        }
        out["d2t"] = out["d2t"].astype(jnp.int32)
        out["d_norm"] = out["d_norm"].astype(dtype)
        if embed_d is not None:
            out["embed_d"] = jnp.asarray(embed_d, dtype)
        return out

    def _forward_eagle3(self, dp, embed, draft_kv, batch, feat_prev, *,
                        num_slots, page_size, attn_backend):
        """EAGLE3 layer (reference llama_eagle3.LlamaDecoderLayer): when
        the incoming features are aux-width (num_aux*H — fresh from the
        target), fc fuses them to H first; chain steps feed the draft's
        own H-wide aux output and skip fc."""
        c = self.config
        B, L = batch.input_ids.shape
        hq, hkv, d = self.hq, self.hkv, self.hd
        H = c.hidden_size

        emb = dp.get("embed_d", embed)
        x_emb = emb[jnp.maximum(batch.input_ids, 0)]
        hid = feat_prev.astype(x_emb.dtype)
        if hid.shape[-1] != H:  # aux-width → fuse
            hid = (hid @ dp["fc"] + dp["fc_bias"]).astype(x_emb.dtype)
        residual = hid
        x = jnp.concatenate(
            [
                rms_norm(x_emb, dp["embed_ln"], c.rms_norm_eps),
                rms_norm(hid, dp["hidden_norm"], c.rms_norm_eps),
            ],
            axis=-1,
        )  # [B, L, 2H]
        q = (x @ dp["q_proj"]).reshape(B, L, hq, d)
        k = (x @ dp["k_proj"]).reshape(B, L, hkv, d)
        v = (x @ dp["v_proj"]).reshape(B, L, hkv, d)
        q = self._rope(q, batch.positions)
        k = self._rope(k, batch.positions)
        attn_out, draft_kv = paged_attention(
            q, k, v, draft_kv, batch, jnp.int32(0),
            num_slots=num_slots, page_size=page_size,
            sm_scale=self.sm_scale, backend=attn_backend,
        )
        h = residual + (attn_out.reshape(B, L, hq * d) @ dp["o_proj"])
        normed2 = rms_norm(h, dp["post_ln"], c.rms_norm_eps)
        inter = act_and_mul(
            c.hidden_act, normed2 @ dp["gate_proj"], normed2 @ dp["up_proj"]
        )
        h = h + inter @ dp["down_proj"]
        return h, draft_kv

    # ------------------------------------------------------------ forward
    def _rope(self, x, positions):
        half = self.rot_half
        angles = (
            positions[..., None].astype(jnp.float32) * self.inv_freq
        )  # [B, L, rot/2]
        cos = jnp.cos(angles)[..., None, :]
        sin = jnp.sin(angles)[..., None, :]
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :half], xf[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    def forward(
        self,
        dp: Dict[str, Any],  # draft params
        embed: jnp.ndarray,  # target embedding [V, H]
        draft_kv: jnp.ndarray,  # [NP, ps, 2, Hkv*D] (1-layer pool)
        batch: DeviceBatch,
        feat_prev: jnp.ndarray,  # [B, L, H] feature of the PREVIOUS position
        *,
        num_slots: int,
        page_size: int,
        attn_backend: str = "xla",
    ):
        """One draft-layer forward; returns (features [B, L, H], draft_kv)."""
        if self.is_eagle3:
            return self._forward_eagle3(
                dp, embed, draft_kv, batch, feat_prev,
                num_slots=num_slots, page_size=page_size,
                attn_backend=attn_backend,
            )
        c = self.config
        B, L = batch.input_ids.shape
        hq, hkv, d = self.hq, self.hkv, self.hd

        x_emb = embed[batch.input_ids]  # [B, L, H]
        feat = feat_prev.astype(x_emb.dtype)
        if self.has_eh_norms:
            # MTP/NextN: normalize both halves before eh_proj
            x_emb = rms_norm(x_emb, dp["enorm"], c.rms_norm_eps)
            feat = rms_norm(feat, dp["hnorm"], c.rms_norm_eps)
        h = jnp.concatenate(
            [x_emb, feat], axis=-1
        ) @ dp["fc"] + dp["fc_bias"]
        residual = h
        normed = rms_norm(h, dp["input_ln"], c.rms_norm_eps)
        q = (normed @ dp["q_proj"]).reshape(B, L, hq, d)
        k = (normed @ dp["k_proj"]).reshape(B, L, hkv, d)
        v = (normed @ dp["v_proj"]).reshape(B, L, hkv, d)
        q = self._rope(q, batch.positions)
        k = self._rope(k, batch.positions)
        attn_out, draft_kv = paged_attention(
            q, k, v, draft_kv, batch, jnp.int32(0),
            num_slots=num_slots, page_size=page_size,
            sm_scale=self.sm_scale, backend=attn_backend,
        )
        h = residual + (attn_out.reshape(B, L, hq * d) @ dp["o_proj"])
        normed2 = rms_norm(h, dp["post_ln"], c.rms_norm_eps)
        inter = act_and_mul(
            c.hidden_act, normed2 @ dp["gate_proj"], normed2 @ dp["up_proj"]
        )
        h = h + inter @ dp["down_proj"]
        return h, draft_kv


def chain_rejection_sample(
    p_logits: jnp.ndarray,  # [B, K+1, V] target logits (pos m..m+K)
    q_logits: jnp.ndarray,  # [B, K, V] draft logits for d_1..d_K
    drafts: jnp.ndarray,  # [B, K] int32 draft tokens
    temperature: jnp.ndarray,  # [B] f32 (0 = greedy)
    rng: jax.Array,
    bootstrap: Optional[jnp.ndarray] = None,  # [B] bool: ignore drafts
    trunc: Optional[tuple] = None,  # (top_p [B], top_k [B], min_p [B])
):
    """Vectorized chain speculative sampling (speculative_sampling.cu).

    Returns (tokens [B, K+1], accept_len [B], logprobs [B, K+1]):
    accept_len a = number of accepted drafts; emitted tokens are
    tokens[:, :a+1] (accepted drafts + residual/bonus sample).
    Greedy rows (temperature 0) take exact argmax-prefix acceptance.
    ``bootstrap`` rows reject everything and sample straight from p_0
    (exact plain decode — used when the draft state is stale).
    """
    B, K1, V = p_logits.shape
    K = K1 - 1
    greedy = temperature <= 0.0
    temp = jnp.where(greedy, 1.0, temperature)[:, None, None]
    p = jax.nn.softmax(p_logits.astype(jnp.float32) / temp, axis=-1)
    q = jax.nn.softmax(q_logits.astype(jnp.float32) / temp, axis=-1)

    if trunc is not None:
        # Truncate+renormalize the TARGET distribution (top-p/top-k/min-p)
        # so accepted tokens match the normal decode path's distribution.
        # The proposal q stays as the draft sampler's true distribution —
        # rejection sampling is exact for any proposal: accept w.p.
        # min(1, p'(d)/q(d)), residual ∝ max(p' - q, 0).  Greedy rows keep
        # the untruncated p (argmax path; logprobs match plain decode).
        from sglang_tpu.layers.sampler import truncate_probs

        top_p, top_k, min_p = trunc
        p_trunc = truncate_probs(
            p.reshape(B * K1, V),
            jnp.repeat(top_p, K1),
            jnp.repeat(top_k, K1),
            jnp.repeat(min_p, K1),
        ).reshape(B, K1, V)
        p = jnp.where(greedy[:, None, None], p, p_trunc)

    p_d = jnp.take_along_axis(
        p[:, :K], drafts[..., None], axis=-1
    ).squeeze(-1)  # [B, K] p_i(d_i)
    q_d = jnp.take_along_axis(q, drafts[..., None], axis=-1).squeeze(-1)

    r_accept, r_resid, r_bonus = jax.random.split(rng, 3)
    u = jax.random.uniform(r_accept, (B, K))
    ok_sample = u * q_d < p_d  # accept w.p. min(1, p/q)
    argmax_p = jnp.argmax(p_logits, axis=-1).astype(jnp.int32)  # [B, K+1]
    ok_greedy = argmax_p[:, :K] == drafts
    ok = jnp.where(greedy[:, None], ok_greedy, ok_sample)
    if bootstrap is not None:
        ok = jnp.logical_and(ok, jnp.logical_not(bootstrap)[:, None])

    # accept_len = index of first False (K if none)
    not_ok = jnp.logical_not(ok)
    any_rej = jnp.any(not_ok, axis=-1)
    first_rej = jnp.argmax(not_ok, axis=-1)  # 0 if none rejected
    a = jnp.where(any_rej, first_rej, K)  # [B]

    # Correction token: residual max(p - q, 0) at the reject position, or
    # bonus from p_K when everything was accepted.
    pos = jnp.minimum(a, K - 1) if K > 0 else jnp.zeros_like(a)
    p_at = jnp.take_along_axis(p, pos[:, None, None], axis=1)[:, 0]  # [B, V]
    q_at = jnp.take_along_axis(q, pos[:, None, None], axis=1)[:, 0] if K > 0 else jnp.zeros_like(p_at)
    resid = jnp.maximum(p_at - q_at, 0.0)
    resid_sum = jnp.sum(resid, axis=-1, keepdims=True)
    # degenerate (p==q): fall back to p
    resid = jnp.where(resid_sum > 1e-9, resid, p_at)
    if bootstrap is not None:
        resid = jnp.where(bootstrap[:, None], p_at, resid)
    resid_tok = jax.random.categorical(
        r_resid, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1
    ).astype(jnp.int32)
    bonus_tok = jax.random.categorical(
        r_bonus, jnp.log(jnp.maximum(p[:, K], 1e-30)), axis=-1
    ).astype(jnp.int32)
    correction = jnp.where(any_rej, resid_tok, bonus_tok)
    correction = jnp.where(
        greedy,
        jnp.take_along_axis(argmax_p, a[:, None], axis=1)[:, 0],
        correction,
    )

    # tokens[:, j] = draft j for j < a, correction at j == a
    tokens = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, K1), 1) < a[:, None],
        jnp.pad(drafts, ((0, 0), (0, 1))),
        correction[:, None],
    )
    # logprob of each emitted token under (temperature-scaled) p
    lp_all = jnp.log(
        jnp.maximum(
            jnp.take_along_axis(p, tokens[..., None], axis=-1).squeeze(-1),
            1e-30,
        )
    )
    return tokens, a.astype(jnp.int32), lp_all


def tree_rejection_sample(
    p_logits: jnp.ndarray,  # [B, TB, K+1, V] target logits per branch row
    q0_logits: jnp.ndarray,  # [B, V] root draft logits
    qc_logits: jnp.ndarray,  # [B, TB, K, V] chain draft logits (d_1..d_K-1 at [:, :, 1:])
    drafts: jnp.ndarray,  # [B, TB, K] draft tokens (root at [:, :, 0])
    temperature: jnp.ndarray,  # [B]
    rng: jax.Array,
    bootstrap: Optional[jnp.ndarray] = None,  # [B] bool
    trunc: Optional[tuple] = None,
):
    """Sampled-mode TREE speculative sampling (reference
    ``reject_sampling.py`` tree_speculative_sampling + SpecInfer
    recursive rejection).

    Root: the TB branch candidates are drawn i.i.d. from the draft's
    root distribution q0; recursive rejection tries them in order —
    accept c_j w.p. min(1, p(c_j)/q0(c_j)), on rejection the target
    residual updates p ← norm(max(p − q0, 0)) — which reproduces the
    target distribution exactly.  After a root acceptance, the winning
    branch's chain verifies with :func:`chain_rejection_sample`; a full
    root rejection emits one sample from the final residual.

    Returns (tokens [B, K+1], accept_len [B], winner [B], lp [B, K+1])
    with the same contract as the greedy tree verify: ``accept_len + 1``
    tokens are emitted and ``winner`` names the branch whose private
    pages hold the accepted KV.
    """
    B, TB, K1, V = p_logits.shape
    K = K1 - 1
    greedy = temperature <= 0.0
    temp = jnp.where(greedy, 1.0, temperature)
    boot = (
        bootstrap.astype(bool)
        if bootstrap is not None
        else jnp.zeros((B,), bool)
    )
    r_root, r_resid, r_chain = jax.random.split(rng, 3)

    # ---- root distributions ----
    p_root_logits = p_logits[:, 0, 0]  # identical across branches
    p_root = jax.nn.softmax(
        p_root_logits.astype(jnp.float32) / temp[:, None], axis=-1
    )
    if trunc is not None:
        from sglang_tpu.layers.sampler import truncate_probs

        top_p, top_k, min_p = trunc
        p_root = jnp.where(
            greedy[:, None],
            p_root,
            truncate_probs(p_root, top_p, top_k, min_p),
        )
    q_root = jax.nn.softmax(
        q0_logits.astype(jnp.float32) / temp[:, None], axis=-1
    )

    arange = jnp.arange(B)
    accepted = jnp.zeros((B,), bool)
    j_star = jnp.zeros((B,), jnp.int32)
    root_tok = jnp.zeros((B,), jnp.int32)
    p_cur = p_root
    u = jax.random.uniform(r_root, (B, TB))
    for j in range(TB):
        c = drafts[:, j, 0]
        pc = p_cur[arange, c]
        qc = q_root[arange, c]
        ok = (u[:, j] * qc < pc) & ~accepted & ~boot
        j_star = jnp.where(ok, j, j_star)
        root_tok = jnp.where(ok, c, root_tok)
        accepted = accepted | ok
        resid = jnp.maximum(p_cur - q_root, 0.0)
        rs = jnp.sum(resid, axis=-1, keepdims=True)
        resid = jnp.where(rs > 1e-9, resid / jnp.maximum(rs, 1e-9), p_cur)
        p_cur = jnp.where(
            (accepted | boot)[:, None], p_cur, resid
        )
    resid_tok = jax.random.categorical(
        r_resid, jnp.log(jnp.maximum(p_cur, 1e-30)), axis=-1
    ).astype(jnp.int32)
    root_tok = jnp.where(accepted, root_tok, resid_tok)

    # ---- winning branch's chain (K-1 drafts + bonus) ----
    rows_p = p_logits[arange, j_star]  # [B, K+1, V]
    if K > 1:
        tok_c, a_c, lp_c = chain_rejection_sample(
            rows_p[:, 1:],  # [B, K, V] = K-1 drafts + bonus row
            qc_logits[arange, j_star][:, 1:],  # [B, K-1, V]
            drafts[arange, j_star][:, 1:],  # [B, K-1]
            temperature,
            r_chain,
            trunc=trunc,
        )
    else:
        lp_b = jnp.log(
            jnp.maximum(
                jax.nn.softmax(
                    rows_p[:, 1].astype(jnp.float32) / temp[:, None], -1
                ),
                1e-30,
            )
        )
        tok_c = jax.random.categorical(r_chain, lp_b, axis=-1).astype(
            jnp.int32
        )[:, None]
        a_c = jnp.zeros((B,), jnp.int32)
        lp_c = jnp.take_along_axis(lp_b, tok_c, axis=-1)

    accept_len = jnp.where(accepted, 1 + a_c, 0).astype(jnp.int32)
    tokens = jnp.concatenate([root_tok[:, None], tok_c], axis=1)[:, :K1]
    lp_root = jnp.log(
        jnp.maximum(p_root[arange, root_tok], 1e-30)
    )
    lp = jnp.concatenate([lp_root[:, None], lp_c], axis=1)[:, :K1]
    winner = jnp.where(accepted, j_star, 0).astype(jnp.int32)
    return tokens, accept_len, winner, lp
