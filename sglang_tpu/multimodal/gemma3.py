"""Gemma 3 multimodal: SigLIP vision tower + avg-pool projector.

Equivalent role to the reference's ``srt/models/gemma3_mm.py`` +
SigLIP tower (``srt/models/siglip.py``): fixed-resolution SigLIP ViT
(learned position embeddings, pre-LN blocks with biased projections,
gelu-tanh MLP, final post-LN), then the Gemma3 projector — a 2D avg
pool down to ``mm_tokens_per_image`` tokens, a zero-centered RMSNorm,
and a plain matmul into the text width.  Features splice into the
prompt through the negative-sentinel input_embeds path; the text model
grants image-token spans BIDIRECTIONAL attention (see
``models/gemma3_mm.py``)."""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

SIGLIP_MEAN = 0.5
SIGLIP_STD = 0.5


def siglip_preprocess(image, image_size: int) -> np.ndarray:
    """PIL/array image → [S, C*ps*ps] is done later; here → [C, H, W]."""
    import PIL.Image

    if not isinstance(image, PIL.Image.Image):
        image = PIL.Image.fromarray(np.asarray(image))
    image = image.convert("RGB").resize(
        (image_size, image_size), PIL.Image.BILINEAR
    )
    arr = np.asarray(image, np.float32) / 255.0
    arr = (arr - SIGLIP_MEAN) / SIGLIP_STD
    return arr.transpose(2, 0, 1)


def siglip_forward(
    params: Dict[str, Any],
    pixels: jnp.ndarray,  # [C, H, W]
    *,
    num_heads: int,
    patch: int,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """→ patch features [S, E] (S = (H/ps)²), HF SiglipVisionModel."""
    C, H, W = pixels.shape
    gh, gw = H // patch, W // patch
    p = pixels.reshape(C, gh, patch, gw, patch)
    p = p.transpose(1, 3, 0, 2, 4).reshape(gh * gw, C * patch * patch)
    x = p @ params["patch_w"] + params["patch_b"]  # [S, E]
    x = x + params["pos_emb"]
    E = x.shape[-1]
    hd = E // num_heads

    def ln(v, w, b):
        vf = v.astype(jnp.float32)
        mu = vf.mean(-1, keepdims=True)
        var = vf.var(-1, keepdims=True)
        return (vf - mu) * jax.lax.rsqrt(var + eps) * w + b

    L = params["blocks"]["ln1_w"].shape[0]
    for i in range(L):
        w = {k: v[i] for k, v in params["blocks"].items()}
        h = ln(x, w["ln1_w"], w["ln1_b"])
        q = (h @ w["q_w"] + w["q_b"]).reshape(-1, num_heads, hd)
        k = (h @ w["k_w"] + w["k_b"]).reshape(-1, num_heads, hd)
        v = (h @ w["v_w"] + w["v_b"]).reshape(-1, num_heads, hd)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("hqk,khd->qhd", probs, v).reshape(-1, E)
        x = x + (att @ w["o_w"] + w["o_b"])
        h = ln(x, w["ln2_w"], w["ln2_b"])
        h = h @ w["fc1_w"] + w["fc1_b"]
        h = jax.nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
        x = x + (h @ w["fc2_w"] + w["fc2_b"])
    return ln(x, params["post_ln_w"], params["post_ln_b"])


def gemma3_project(
    params: Dict[str, Any],
    feats: jnp.ndarray,  # [S, E] (S = patches_per_image²)
    *,
    patches_per_side: int,
    tokens_per_side: int,
    eps: float,
) -> jnp.ndarray:
    """Gemma3MultiModalProjector: avg-pool the patch grid down to
    tokens_per_side², zero-centered RMSNorm, matmul to text width."""
    E = feats.shape[-1]
    pp, ts = patches_per_side, tokens_per_side
    ks = pp // ts
    grid = feats.reshape(pp, pp, E)
    pooled = grid.reshape(ts, ks, ts, ks, E).mean(axis=(1, 3))
    pooled = pooled.reshape(ts * ts, E).astype(jnp.float32)
    var = jnp.mean(pooled * pooled, axis=-1, keepdims=True)
    normed = pooled * jax.lax.rsqrt(var + eps)
    normed = normed * (1.0 + params["soft_norm"].astype(jnp.float32))
    return normed @ params["proj_w"]


def load_gemma3_vision_params(model_path: str) -> Dict[str, Any]:
    import glob
    import os

    from sglang_tpu.model_loader.loader import SafetensorsFile

    t: Dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(os.path.join(model_path, "*.safetensors"))):
        st = SafetensorsFile(f)
        for name in st.keys():
            for pre in ("model.vision_tower.vision_model.",
                        "vision_tower.vision_model.",
                        "model.multi_modal_projector.",
                        "multi_modal_projector."):
                if name.startswith(pre):
                    t[name[len(pre):]] = np.asarray(
                        st.get_tensor(name), np.float32
                    )
                    break
    if not t:
        raise ValueError(f"no gemma3 vision tower in {model_path}")
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
        "soft_norm": jnp.asarray(t["mm_soft_emb_norm.weight"]),
        "proj_w": jnp.asarray(t["mm_input_projection_weight"]),
    }


class Gemma3Processor:
    """Gemma 3 images → text-space features (fixed token count)."""

    def __init__(self, hf_config: Dict[str, Any], model_path: str):
        vcfg = hf_config.get("vision_config") or {}
        self.image_size = int(vcfg.get("image_size", 896))
        self.patch = int(vcfg.get("patch_size", 14))
        self.num_heads = int(vcfg.get("num_attention_heads", 16))
        self.ln_eps = float(vcfg.get("layer_norm_eps", 1e-6))
        self.n_patches = int(hf_config.get("mm_tokens_per_image", 256))
        self.tokens_per_side = int(self.n_patches ** 0.5)
        self.patches_per_side = self.image_size // self.patch
        self.image_token_id = int(
            hf_config.get("image_token_index",
                          hf_config.get("image_token_id", 262144))
        )
        txt = hf_config.get("text_config") or {}
        self.rms_eps = float(txt.get("rms_norm_eps", 1e-6))
        self.params = load_gemma3_vision_params(model_path)

        def fwd(params, pixels):
            feats = siglip_forward(
                params, pixels, num_heads=self.num_heads,
                patch=self.patch, eps=self.ln_eps,
            )
            return gemma3_project(
                params, feats,
                patches_per_side=self.patches_per_side,
                tokens_per_side=self.tokens_per_side,
                eps=self.rms_eps,
            )

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
