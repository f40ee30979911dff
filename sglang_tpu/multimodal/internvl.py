"""InternVL 3 multimodal: BEiT-style vision tower + pixel-shuffle
projector over a Qwen/Llama text trunk.

Equivalent role to the reference's ``srt/models/internvl.py``: the
tower is a CLS-token ViT with layer-scale (λ) residuals and pre-norm
blocks (LayerNorm or RMSNorm by ``norm_type``); features drop the CLS,
pixel-shuffle downsample by ``downsample_ratio`` (folding space into
channels), and project via LN → linear → act → linear.  Image tokens
splice through the negative-sentinel input_embeds path; attention
stays fully causal (no special masks)."""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def internvl_preprocess(image, image_size: int) -> np.ndarray:
    import PIL.Image

    if not isinstance(image, PIL.Image.Image):
        image = PIL.Image.fromarray(np.asarray(image))
    image = image.convert("RGB").resize(
        (image_size, image_size), PIL.Image.BICUBIC
    )
    arr = np.asarray(image, np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr.transpose(2, 0, 1)


def internvl_vision_forward(
    params: Dict[str, Any],
    pixels: jnp.ndarray,  # [C, H, W]
    *,
    num_heads: int,
    patch: int,
    norm_type: str = "layer_norm",
    eps: float = 1e-6,
    qk_norm: bool = False,
) -> jnp.ndarray:
    """→ [1 + S, E] hidden states (CLS first), HF InternVLVisionModel
    (use_mean_pooling geometry: no final norm)."""
    C, H, W = pixels.shape
    gh, gw = H // patch, W // patch
    p = pixels.reshape(C, gh, patch, gw, patch)
    p = p.transpose(1, 3, 0, 2, 4).reshape(gh * gw, C * patch * patch)
    x = p @ params["patch_w"] + params["patch_b"]
    x = jnp.concatenate([params["cls"], x], axis=0)  # [1+S, E]
    if "pos_emb" in params:
        x = x + params["pos_emb"]
    E = x.shape[-1]
    hd = E // num_heads

    def norm(v, w, b):
        vf = v.astype(jnp.float32)
        if norm_type == "rms_norm":
            var = jnp.mean(vf * vf, -1, keepdims=True)
            return vf * jax.lax.rsqrt(var + eps) * w
        mu = vf.mean(-1, keepdims=True)
        var = vf.var(-1, keepdims=True)
        return (vf - mu) * jax.lax.rsqrt(var + eps) * w + b

    def rms_full(v, w):
        vf = v.astype(jnp.float32)
        var = jnp.mean(vf * vf, -1, keepdims=True)
        return vf * jax.lax.rsqrt(var + 1e-6) * w

    L = params["blocks"]["ln1_w"].shape[0]
    for i in range(L):
        w = {k: v[i] for k, v in params["blocks"].items()}
        h = norm(x, w["ln1_w"], w.get("ln1_b", 0.0))
        q = h @ w["q_w"] + w.get("q_b", 0.0)
        k = h @ w["k_w"] + w.get("k_b", 0.0)
        v = h @ w["v_w"] + w.get("v_b", 0.0)
        if qk_norm:  # full-width RMS over the flat projection
            q = rms_full(q, w["qn_w"])
            k = rms_full(k, w["kn_w"])
        S = q.shape[0]
        q = q.reshape(S, num_heads, hd)
        k = k.reshape(S, num_heads, hd)
        v = v.reshape(S, num_heads, hd)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("hqk,khd->qhd", probs, v).reshape(S, E)
        att = att @ w["proj_w"] + w["proj_b"]
        x = x + w["lam1"] * att  # layer-scale residual
        h = norm(x, w["ln2_w"], w.get("ln2_b", 0.0))
        h = h @ w["fc1_w"] + w["fc1_b"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ w["fc2_w"] + w["fc2_b"]
        x = x + w["lam2"] * h
    return x


def internvl_project(
    params: Dict[str, Any],
    feats: jnp.ndarray,  # [1 + S, E] (CLS first)
    *,
    downsample_ratio: float,
    act: str = "gelu",
) -> jnp.ndarray:
    """Drop CLS → pixel-shuffle by downsample_ratio → LN + MLP."""
    f = feats[1:]  # [S, E]
    S, E = f.shape
    side = int(S ** 0.5)
    r = downsample_ratio
    grid = f.reshape(side, side, E)
    # HF pixel_shuffle: fold (1/r) rows/cols into channels
    w2, c2 = int(side * r), int(E / r)
    grid = grid.reshape(side, w2, c2)
    grid = grid.transpose(1, 0, 2)
    grid = grid.reshape(w2, w2, int(E / (r * r)))
    grid = grid.transpose(1, 0, 2)
    flat = grid.reshape(-1, int(E / (r * r))).astype(jnp.float32)
    mu = flat.mean(-1, keepdims=True)
    var = flat.var(-1, keepdims=True)
    h = (flat - mu) * jax.lax.rsqrt(var + 1e-5)
    h = h * params["pln_w"] + params["pln_b"]
    h = h @ params["l1_w"] + params["l1_b"]
    h = jax.nn.gelu(h, approximate=False) if act == "gelu" else h
    return h @ params["l2_w"] + params["l2_b"]


def load_internvl_vision_params(model_path: str) -> Dict[str, Any]:
    import glob
    import os

    from sglang_tpu.model_loader.loader import SafetensorsFile

    t: Dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(os.path.join(model_path, "*.safetensors"))):
        st = SafetensorsFile(f)
        for name in st.keys():
            for pre in ("model.vision_tower.", "vision_tower.",
                        "model.multi_modal_projector.",
                        "multi_modal_projector."):
                if name.startswith(pre):
                    key = name[len(pre):]
                    if name.startswith(
                        ("model.multi_modal_projector.",
                         "multi_modal_projector.")
                    ):
                        key = "proj." + key
                    t[key] = np.asarray(st.get_tensor(name), np.float32)
                    break
    if not t:
        raise ValueError(f"no internvl vision tower in {model_path}")
    E = t["embeddings.patch_embeddings.projection.weight"].shape[0]
    n = 0
    while f"encoder.layer.{n}.lambda_1" in t:
        n += 1

    def stack(fmt, tr=False, optional=False):
        if optional and fmt.format(0) not in t:
            return None
        arrs = [t[fmt.format(i)] for i in range(n)]
        if tr:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    B = "encoder.layer.{}."
    blocks = {
        "ln1_w": stack(B + "layernorm_before.weight"),
        "q_w": stack(B + "attention.q_proj.weight", tr=True),
        "k_w": stack(B + "attention.k_proj.weight", tr=True),
        "v_w": stack(B + "attention.v_proj.weight", tr=True),
        "proj_w": stack(B + "attention.projection_layer.weight", tr=True),
        "proj_b": stack(B + "attention.projection_layer.bias"),
        "ln2_w": stack(B + "layernorm_after.weight"),
        "fc1_w": stack(B + "mlp.fc1.weight", tr=True),
        "fc1_b": stack(B + "mlp.fc1.bias"),
        "fc2_w": stack(B + "mlp.fc2.weight", tr=True),
        "fc2_b": stack(B + "mlp.fc2.bias"),
        "lam1": stack(B + "lambda_1"),
        "lam2": stack(B + "lambda_2"),
    }
    for opt, fmt in (
        ("ln1_b", B + "layernorm_before.bias"),
        ("ln2_b", B + "layernorm_after.bias"),
        ("q_b", B + "attention.q_proj.bias"),
        ("k_b", B + "attention.k_proj.bias"),
        ("v_b", B + "attention.v_proj.bias"),
        ("qn_w", B + "attention.q_norm.weight"),
        ("kn_w", B + "attention.k_norm.weight"),
    ):
        arr = stack(fmt, optional=True)
        if arr is not None:
            blocks[opt] = arr
    out = {
        "patch_w": jnp.asarray(
            t["embeddings.patch_embeddings.projection.weight"]
            .reshape(E, -1).T
        ),
        "patch_b": jnp.asarray(
            t["embeddings.patch_embeddings.projection.bias"]
        ),
        "cls": jnp.asarray(t["embeddings.cls_token"][0]),
        "blocks": blocks,
        "pln_w": jnp.asarray(t["proj.layer_norm.weight"]),
        "pln_b": jnp.asarray(t["proj.layer_norm.bias"]),
        "l1_w": jnp.asarray(t["proj.linear_1.weight"].T),
        "l1_b": jnp.asarray(t["proj.linear_1.bias"]),
        "l2_w": jnp.asarray(t["proj.linear_2.weight"].T),
        "l2_b": jnp.asarray(t["proj.linear_2.bias"]),
    }
    if "embeddings.position_embeddings" in t:
        out["pos_emb"] = jnp.asarray(
            t["embeddings.position_embeddings"][0]
        )
    return out


class InternVLProcessor:
    """InternVL images → text-space features (fixed token count)."""

    def __init__(self, hf_config: Dict[str, Any], model_path: str):
        vcfg = hf_config.get("vision_config") or {}
        self.image_size = int(
            (vcfg.get("image_size") or [448])[0]
            if isinstance(vcfg.get("image_size"), (list, tuple))
            else vcfg.get("image_size", 448)
        )
        self.patch = int(
            (vcfg.get("patch_size") or [14])[0]
            if isinstance(vcfg.get("patch_size"), (list, tuple))
            else vcfg.get("patch_size", 14)
        )
        self.num_heads = int(vcfg.get("num_attention_heads", 16))
        self.norm_type = vcfg.get("norm_type", "layer_norm")
        self.ln_eps = float(vcfg.get("layer_norm_eps", 1e-6))
        self.qk_norm = bool(vcfg.get("use_qk_norm", False))
        self.ratio = float(hf_config.get("downsample_ratio", 0.5))
        side = self.image_size // self.patch
        self.n_patches = int((side * self.ratio) ** 2)
        self.image_token_id = int(
            hf_config.get("image_token_id",
                          hf_config.get("image_token_index", 151667))
        )
        self.params = load_internvl_vision_params(model_path)

        def fwd(params, pixels):
            feats = internvl_vision_forward(
                params, pixels, num_heads=self.num_heads,
                patch=self.patch, norm_type=self.norm_type,
                eps=self.ln_eps, qk_norm=self.qk_norm,
            )
            return internvl_project(
                params, feats, downsample_ratio=self.ratio,
            )

        self._fwd = jax.jit(fwd)

    def encode_images(self, images: List[Any]) -> np.ndarray:
        rows = [
            np.asarray(
                self._fwd(
                    self.params,
                    jnp.asarray(
                        internvl_preprocess(im, self.image_size)
                    ),
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
