"""Idefics3 / SmolVLM multimodal: SigLIP tower + pixel-shuffle
connector over a Llama text trunk.

Equivalent role to the reference's ``srt/models/idefics2.py`` lineage:
the tower is the shared SigLIP forward (multimodal/gemma3.py); the
connector pixel-shuffles by ``scale_factor`` (the same fold as
InternVL's) and projects with a single bias-free linear.  Serves the
single global-image mode (``do_image_splitting=False``); the multi-crop
splitting mode adds sub-image tiles around the same path."""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.multimodal.gemma3 import siglip_forward, siglip_preprocess


def idefics3_pos_ids(side: int) -> np.ndarray:
    """HF Idefics3VisionEmbeddings bucketized position ids for a full
    square grid: fractional coords scaled by (1 − 1e-6) bucket as
    count(boundaries ≤ x), yielding [0, 0, 1, 2, ...] per axis — NOT
    arange."""
    b = np.arange(1, side, dtype=np.float64) / side
    frac = np.arange(side, dtype=np.float64) / side * (1 - 1e-6)
    bucket = np.searchsorted(b, frac, side="right")
    return (bucket[:, None] * side + bucket[None, :]).reshape(-1)


def idefics3_connect(
    params: Dict[str, Any], feats: jnp.ndarray, scale: int,
) -> jnp.ndarray:
    """Pixel shuffle by ``scale`` then the modality projection."""
    S, E = feats.shape
    side = int(S ** 0.5)
    g = feats.reshape(side, side // scale, E * scale)
    g = g.transpose(1, 0, 2)
    g = g.reshape(side // scale, side // scale, E * scale * scale)
    g = g.transpose(1, 0, 2)
    flat = g.reshape(-1, E * scale * scale)
    return flat @ params["proj_w"]


def load_idefics3_vision_params(model_path: str) -> Dict[str, Any]:
    import glob
    import os

    from sglang_tpu.model_loader.loader import SafetensorsFile

    t: Dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(os.path.join(model_path, "*.safetensors"))):
        st = SafetensorsFile(f)
        for name in st.keys():
            for pre in ("model.vision_model.", "vision_model.",
                        "model.connector.", "connector."):
                if name.startswith(pre):
                    key = name[len(pre):]
                    if ".connector." in f".{name}":
                        key = "conn." + key
                    t[key] = np.asarray(st.get_tensor(name), np.float32)
                    break
    if not t:
        raise ValueError(f"no idefics3 vision tower in {model_path}")
    E = t["embeddings.patch_embedding.weight"].shape[0]
    n = 0
    while f"encoder.layers.{n}.layer_norm1.weight" in t:
        n += 1

    def stack(fmt, tr=False):
        arrs = [t[fmt.format(i)] for i in range(n)]
        if tr:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    B = "encoder.layers.{}."
    return {
        "patch_w": jnp.asarray(
            t["embeddings.patch_embedding.weight"].reshape(E, -1).T
        ),
        "patch_b": jnp.asarray(t["embeddings.patch_embedding.bias"]),
        "pos_emb": jnp.asarray(t["embeddings.position_embedding.weight"]),
        "blocks": {
            "ln1_w": stack(B + "layer_norm1.weight"),
            "ln1_b": stack(B + "layer_norm1.bias"),
            "q_w": stack(B + "self_attn.q_proj.weight", tr=True),
            "q_b": stack(B + "self_attn.q_proj.bias"),
            "k_w": stack(B + "self_attn.k_proj.weight", tr=True),
            "k_b": stack(B + "self_attn.k_proj.bias"),
            "v_w": stack(B + "self_attn.v_proj.weight", tr=True),
            "v_b": stack(B + "self_attn.v_proj.bias"),
            "o_w": stack(B + "self_attn.out_proj.weight", tr=True),
            "o_b": stack(B + "self_attn.out_proj.bias"),
            "ln2_w": stack(B + "layer_norm2.weight"),
            "ln2_b": stack(B + "layer_norm2.bias"),
            "fc1_w": stack(B + "mlp.fc1.weight", tr=True),
            "fc1_b": stack(B + "mlp.fc1.bias"),
            "fc2_w": stack(B + "mlp.fc2.weight", tr=True),
            "fc2_b": stack(B + "mlp.fc2.bias"),
        },
        "post_ln_w": jnp.asarray(t["post_layernorm.weight"]),
        "post_ln_b": jnp.asarray(t["post_layernorm.bias"]),
        "proj_w": jnp.asarray(
            t["conn.modality_projection.proj.weight"].T
        ),
    }


class Idefics3Processor:
    """Idefics3/SmolVLM images → text-space features (fixed count)."""

    def __init__(self, hf_config: Dict[str, Any], model_path: str):
        vcfg = hf_config.get("vision_config") or {}
        self.image_size = int(vcfg.get("image_size", 364))
        self.patch = int(vcfg.get("patch_size", 14))
        self.num_heads = int(vcfg.get("num_attention_heads", 16))
        self.eps = float(vcfg.get("layer_norm_eps", 1e-6))
        self.scale = int(hf_config.get("scale_factor", 2))
        side = self.image_size // self.patch
        self.n_patches = (side // self.scale) ** 2
        self.image_token_id = int(hf_config.get("image_token_id", 128257))
        self.params = load_idefics3_vision_params(model_path)
        # pre-gather the bucketized position embeddings for the full grid
        self.params = dict(
            self.params,
            pos_emb=self.params["pos_emb"][
                jnp.asarray(idefics3_pos_ids(side))
            ],
        )

        def fwd(params, pixels):
            feats = siglip_forward(
                params, pixels, num_heads=self.num_heads,
                patch=self.patch, eps=self.eps,
            )
            return idefics3_connect(params, feats, self.scale)

        self._fwd = jax.jit(fwd)

    def encode_images(self, images: List[Any]) -> np.ndarray:
        rows = [
            np.asarray(
                self._fwd(
                    self.params,
                    jnp.asarray(siglip_preprocess(im, self.image_size)),
                ),
                np.float32,
            )
            for im in images
        ]
        return np.concatenate(rows, axis=0)

    def expand_prompt(self, input_ids: List[int], n_images: int) -> List[int]:
        out: List[int] = []
        next_row = 0
        seen = 0
        for t in input_ids:
            if t == self.image_token_id:
                for _ in range(self.n_patches):
                    out.append(-(next_row + 1))
                    next_row += 1
                seen += 1
            else:
                out.append(t)
        if seen != n_images:
            raise ValueError(
                f"prompt has {seen} image tokens but {n_images} images"
            )
        return out
