"""BERT-family text encoders (e5 / bge / gte embedding models).

Equivalent role to the reference's encoder embedding models
(``srt/models/bert.py`` BertModel / Contriever,  ``roberta.py``
XLMRobertaModel — served via ``is_embedding`` + ``layers/pooler.py``).
TPU-native: the whole encoder is one dense bidirectional forward (no KV
cache, no paging — encoders see the full sequence once), which maps
straight onto the MXU as large batched matmuls.

Post-LN transformer (attention → add&LN → FFN → add&LN), learned
position + token-type embeddings, mean pooling over valid tokens by
default (e5 convention; ``pooling_mode: cls`` in config.json switches
to CLS — bge convention), L2-normalized output.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


class BertEmbeddingModel:
    """Bidirectional encoder served through the embedding path."""

    is_encoder_only = True
    # Roberta-style checkpoints offset position ids by pad_token_id+1
    pos_offset = 0

    def __init__(self, config, mesh_ctx=None):
        self.config = config
        self.mesh_ctx = mesh_ctx
        hf = config.hf_config or {}
        self.num_layers = config.num_hidden_layers
        self.hidden = config.hidden_size
        self.heads = config.num_attention_heads
        self.head_dim = self.hidden // self.heads
        self.inter = hf.get("intermediate_size", 4 * self.hidden)
        self.max_pos = hf.get("max_position_embeddings", 512)
        self.type_vocab = hf.get("type_vocab_size", 2)
        self.ln_eps = float(hf.get("layer_norm_eps", 1e-12))
        self.act = hf.get("hidden_act", "gelu")
        self.pool_mode = hf.get("pooling_mode", "mean")  # mean | cls

    # ------------------------------------------------------------ schema
    def param_shapes(self) -> Dict[str, Any]:
        L, H, I = self.num_layers, self.hidden, self.inter
        layers = {
            "q": (L, H, H), "q_b": (L, H),
            "k": (L, H, H), "k_b": (L, H),
            "v": (L, H, H), "v_b": (L, H),
            "attn_out": (L, H, H), "attn_out_b": (L, H),
            "attn_ln_w": (L, H), "attn_ln_b": (L, H),
            "inter": (L, H, I), "inter_b": (L, I),
            "out": (L, I, H), "out_b": (L, H),
            "out_ln_w": (L, H), "out_ln_b": (L, H),
        }
        return {
            "embed_word": (self.config.vocab_size, H),
            "embed_pos": (self.max_pos, H),
            "embed_type": (self.type_vocab, H),
            "emb_ln_w": (H,),
            "emb_ln_b": (H,),
            "layers": layers,
        }

    def param_specs(self) -> Dict[str, Any]:
        from sglang_tpu.parallel.mesh import AXIS_TP

        layers = {
            "q": P(None, None, AXIS_TP), "q_b": P(None, AXIS_TP),
            "k": P(None, None, AXIS_TP), "k_b": P(None, AXIS_TP),
            "v": P(None, None, AXIS_TP), "v_b": P(None, AXIS_TP),
            "attn_out": P(None, AXIS_TP, None), "attn_out_b": P(None, None),
            "attn_ln_w": P(None, None), "attn_ln_b": P(None, None),
            "inter": P(None, None, AXIS_TP), "inter_b": P(None, AXIS_TP),
            "out": P(None, AXIS_TP, None), "out_b": P(None, None),
            "out_ln_w": P(None, None), "out_ln_b": P(None, None),
        }
        return {
            "embed_word": P(None, None),
            "embed_pos": P(None, None),
            "embed_type": P(None, None),
            "emb_ln_w": P(None),
            "emb_ln_b": P(None),
            "layers": layers,
        }

    def hf_weight_mapping(self):
        # strip the "bert."/"roberta." prefix HF uses on task models
        table = {
            "embeddings.word_embeddings.weight": ("embed_word", None),
            "embeddings.position_embeddings.weight": ("embed_pos", None),
            "embeddings.token_type_embeddings.weight": ("embed_type", None),
            "embeddings.LayerNorm.weight": ("emb_ln_w", None),
            "embeddings.LayerNorm.bias": ("emb_ln_b", None),
        }
        layer_table = {
            "attention.self.query.weight": ("layers.q", "t"),
            "attention.self.query.bias": ("layers.q_b", None),
            "attention.self.key.weight": ("layers.k", "t"),
            "attention.self.key.bias": ("layers.k_b", None),
            "attention.self.value.weight": ("layers.v", "t"),
            "attention.self.value.bias": ("layers.v_b", None),
            "attention.output.dense.weight": ("layers.attn_out", "t"),
            "attention.output.dense.bias": ("layers.attn_out_b", None),
            "attention.output.LayerNorm.weight": ("layers.attn_ln_w", None),
            "attention.output.LayerNorm.bias": ("layers.attn_ln_b", None),
            "intermediate.dense.weight": ("layers.inter", "t"),
            "intermediate.dense.bias": ("layers.inter_b", None),
            "output.dense.weight": ("layers.out", "t"),
            "output.dense.bias": ("layers.out_b", None),
            "output.LayerNorm.weight": ("layers.out_ln_w", None),
            "output.LayerNorm.bias": ("layers.out_ln_b", None),
        }

        def mapping(name: str):
            for pre in ("bert.", "roberta.", ""):
                if name.startswith(pre):
                    n = name[len(pre):]
                    break
            if n in table:
                path, tf = table[n]
                return (path, None, tf)
            parts = n.split(".")
            if len(parts) > 3 and parts[0] == "encoder" and parts[1] == "layer":
                li = int(parts[2])
                tail = ".".join(parts[3:])
                if tail in layer_table:
                    path, tf = layer_table[tail]
                    return (path, li, tf)
            return None  # pooler.dense / cls head: unused

        return mapping

    # ----------------------------------------------------------- forward
    def _ln(self, x, w, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + self.ln_eps) * w + b).astype(
            x.dtype
        )

    def _act(self, x):
        if self.act in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
            approx = self.act != "gelu"
            return jax.nn.gelu(x, approximate=approx)
        return jax.nn.relu(x)

    def forward_dense_embed(
        self,
        params: Dict[str, Any],
        input_ids: jnp.ndarray,  # [B, L] right-padded with 0
        seq_lens: jnp.ndarray,  # [B] valid lengths
    ) -> jnp.ndarray:
        """→ pooled, L2-normalized embeddings [B, H] f32."""
        B, L = input_ids.shape
        Hn, D = self.heads, self.head_dim
        pos = jnp.arange(L, dtype=jnp.int32)[None, :] + self.pos_offset
        pos = jnp.minimum(pos, self.max_pos - 1)
        h = (
            params["embed_word"][input_ids]
            + params["embed_pos"][pos]
            + params["embed_type"][jnp.zeros_like(input_ids)]
        )
        h = self._ln(h, params["emb_ln_w"], params["emb_ln_b"])
        valid = jnp.arange(L)[None, :] < seq_lens[:, None]  # [B, L]

        def layer_fn(h, w):
            q = (h @ w["q"] + w["q_b"]).reshape(B, L, Hn, D)
            k = (h @ w["k"] + w["k_b"]).reshape(B, L, Hn, D)
            v = (h @ w["v"] + w["v_b"]).reshape(B, L, Hn, D)
            scores = jnp.einsum(
                "blhd,bmhd->bhlm", q, k,
                preferred_element_type=jnp.float32,
            ) * (D ** -0.5)
            scores = jnp.where(valid[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum(
                "bhlm,bmhd->blhd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(h.dtype).reshape(B, L, Hn * D)
            h = self._ln(
                h + (att @ w["attn_out"] + w["attn_out_b"]).astype(h.dtype),
                w["attn_ln_w"], w["attn_ln_b"],
            )
            ff = self._act(h @ w["inter"] + w["inter_b"])
            h = self._ln(
                h + (ff @ w["out"] + w["out_b"]).astype(h.dtype),
                w["out_ln_w"], w["out_ln_b"],
            )
            return h, None

        h, _ = jax.lax.scan(layer_fn, h, params["layers"])
        hf = h.astype(jnp.float32)
        if self.pool_mode == "cls":
            pooled = hf[:, 0]
        else:
            m = valid.astype(jnp.float32)[:, :, None]
            pooled = jnp.sum(hf * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
        norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True)
                        + 1e-12)
        return pooled / norm


class BertModel(BertEmbeddingModel):
    pass


class BertForMaskedLM(BertEmbeddingModel):
    pass


class XLMRobertaModel(BertEmbeddingModel):
    """Roberta/XLM-R encoders (multilingual-e5): position ids offset by
    pad_token_id + 1 and no token-type embeddings in practice."""

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        hf = config.hf_config or {}
        self.pos_offset = int(hf.get("pad_token_id", 1)) + 1


class RobertaModel(XLMRobertaModel):
    pass


EntryClass = [BertModel, BertForMaskedLM, BertEmbeddingModel,
              XLMRobertaModel, RobertaModel]
