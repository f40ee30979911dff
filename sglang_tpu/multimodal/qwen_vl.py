"""Qwen2-VL vision tower + processor (dynamic-resolution ViT, 2D rotary,
2×2 spatial merger) and the M-RoPE position builder.

Equivalent role to the reference's qwen2_vl vision path
(``srt/models/qwen2_vl.py`` Qwen2VisionTransformer +
``multimodal/processors/qwen_vl.py``).  The tower is a dense JAX
forward (like the CLIP tower); merged features splice into the prompt
through the negative-sentinel input_embeds path, and
:meth:`QwenVLProcessor.mrope_positions` reproduces HF
``get_rope_index`` for the text model's 3-axis rotary.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

OPENAI_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def smart_resize(
    height: int, width: int, factor: int = 28,
    min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280,
) -> Tuple[int, int]:
    """HF qwen2-vl smart_resize: round to multiples of ``factor`` inside
    the pixel budget, preserving aspect ratio."""
    h = max(factor, round(height / factor) * factor)
    w = max(factor, round(width / factor) * factor)
    if h * w > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h = math.floor(height / beta / factor) * factor
        w = math.floor(width / beta / factor) * factor
    elif h * w < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h = math.ceil(height * beta / factor) * factor
        w = math.ceil(width * beta / factor) * factor
    return max(h, factor), max(w, factor)


def qwen_patchify(
    image, patch_size: int = 14, merge: int = 2, temporal: int = 2,
    min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """PIL/array image → (flatten_patches [S, C·T·ps·ps], grid_thw) with
    the HF patch ordering (merge groups contiguous)."""
    import PIL.Image

    if not isinstance(image, PIL.Image.Image):
        image = PIL.Image.fromarray(np.asarray(image))
    image = image.convert("RGB")
    H, W = smart_resize(
        image.size[1], image.size[0], factor=patch_size * merge,
        min_pixels=min_pixels, max_pixels=max_pixels,
    )
    arr = np.asarray(
        image.resize((W, H), PIL.Image.BICUBIC), np.float32
    ) / 255.0
    arr = (arr - OPENAI_MEAN) / OPENAI_STD
    arr = arr.transpose(2, 0, 1)  # [C, H, W]
    # a single image duplicates along the temporal patch dim
    patches = np.tile(arr[None], (temporal, 1, 1, 1))  # [T, C, H, W]
    gt, gh, gw = 1, H // patch_size, W // patch_size
    C, ps = 3, patch_size
    p = patches.reshape(
        gt, temporal, C, gh // merge, merge, ps, gw // merge, merge, ps
    )
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = p.reshape(gt * gh * gw, C * temporal * ps * ps)
    return flat.astype(np.float32), (gt, gh, gw)


def _vision_rot_angles(grid, head_dim: int, merge: int) -> np.ndarray:
    """[S, head_dim/2] rotary angles: h-frequencies then w-frequencies,
    positions in the merge-grouped patch order (HF rot_pos_emb)."""
    gt, gh, gw = grid
    hpos = np.arange(gh)[:, None] * np.ones((1, gw), np.int64)
    wpos = np.ones((gh, 1), np.int64) * np.arange(gw)[None, :]

    def regroup(x):
        x = x.reshape(gh // merge, merge, gw // merge, merge)
        return x.transpose(0, 2, 1, 3).reshape(-1)

    hpos, wpos = regroup(hpos), regroup(wpos)
    dim = head_dim // 2  # rotary dim; freqs per axis = dim/2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ang = np.concatenate(
        [hpos[:, None] * inv[None], wpos[:, None] * inv[None]], axis=1
    )  # [S, dim]
    return np.tile(ang, (gt, 1)).astype(np.float32)


def qwen_vision_forward(
    params: Dict[str, Any],
    patches: jnp.ndarray,  # [S, C·T·ps·ps]
    grid: Tuple[int, int, int],
    *,
    num_heads: int,
    merge: int = 2,
) -> jnp.ndarray:
    """→ merged features [S / merge², hidden_size_text]."""
    x = patches @ params["patch_w"]  # [S, E]
    E = x.shape[-1]
    hd = E // num_heads
    ang = jnp.asarray(_vision_rot_angles(grid, hd, merge))  # [S, hd/2]
    cos = jnp.cos(jnp.concatenate([ang, ang], axis=-1))  # [S, hd]
    sin = jnp.sin(jnp.concatenate([ang, ang], axis=-1))

    def rope(t):  # [S, H, hd]
        tf = t.astype(jnp.float32)
        half = tf.shape[-1] // 2
        rot = jnp.concatenate([-tf[..., half:], tf[..., :half]], axis=-1)
        return tf * cos[:, None, :] + rot * sin[:, None, :]

    def ln(v, w, b):
        vf = v.astype(jnp.float32)
        mu = vf.mean(-1, keepdims=True)
        var = vf.var(-1, keepdims=True)
        return (vf - mu) * jax.lax.rsqrt(var + 1e-6) * w + b

    L = params["blocks"]["norm1_w"].shape[0]
    for i in range(L):
        w = {k: v[i] for k, v in params["blocks"].items()}
        h = ln(x, w["norm1_w"], w["norm1_b"])
        qkv = h @ w["qkv_w"] + w["qkv_b"]  # [S, 3E]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        S = q.shape[0]
        q = rope(q.reshape(S, num_heads, hd))
        k = rope(k.reshape(S, num_heads, hd))
        v = v.reshape(S, num_heads, hd).astype(jnp.float32)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("hqk,khd->qhd", probs, v).reshape(S, E)
        x = x + (att @ w["proj_w"] + w["proj_b"])
        h = ln(x, w["norm2_w"], w["norm2_b"])
        h = h @ w["fc1_w"] + w["fc1_b"]
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        x = x + (h @ w["fc2_w"] + w["fc2_b"])

    # merger: LN then 2x2 groups -> MLP
    x = ln(x, params["ln_q_w"], params["ln_q_b"])
    x = x.reshape(-1, E * merge * merge)
    x = x @ params["m0_w"] + params["m0_b"]
    x = jax.nn.gelu(x, approximate=False)
    return x @ params["m2_w"] + params["m2_b"]


def load_qwen_vl_vision_params(model_path: str) -> Dict[str, Any]:
    import glob
    import os

    from sglang_tpu.model_loader.loader import SafetensorsFile

    t: Dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(os.path.join(model_path, "*.safetensors"))):
        st = SafetensorsFile(f)
        for name in st.keys():
            for pre in ("model.visual.", "visual."):
                if name.startswith(pre):
                    t[name[len(pre):]] = np.asarray(
                        st.get_tensor(name), np.float32
                    )
                    break
    if not t:
        raise ValueError(f"no qwen-vl vision tower in {model_path}")
    E = t["patch_embed.proj.weight"].shape[0]
    n = 0
    while f"blocks.{n}.norm1.weight" in t:
        n += 1

    def stack(fmt, tr=False):
        arrs = [t[fmt.format(i)] for i in range(n)]
        if tr:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    B = "blocks.{}."
    return {
        "patch_w": jnp.asarray(
            t["patch_embed.proj.weight"].reshape(E, -1).T
        ),
        "blocks": {
            "norm1_w": stack(B + "norm1.weight"),
            "norm1_b": stack(B + "norm1.bias"),
            "qkv_w": stack(B + "attn.qkv.weight", tr=True),
            "qkv_b": stack(B + "attn.qkv.bias"),
            "proj_w": stack(B + "attn.proj.weight", tr=True),
            "proj_b": stack(B + "attn.proj.bias"),
            "norm2_w": stack(B + "norm2.weight"),
            "norm2_b": stack(B + "norm2.bias"),
            "fc1_w": stack(B + "mlp.fc1.weight", tr=True),
            "fc1_b": stack(B + "mlp.fc1.bias"),
            "fc2_w": stack(B + "mlp.fc2.weight", tr=True),
            "fc2_b": stack(B + "mlp.fc2.bias"),
        },
        "ln_q_w": jnp.asarray(t["merger.ln_q.weight"]),
        "ln_q_b": jnp.asarray(t["merger.ln_q.bias"]),
        "m0_w": jnp.asarray(t["merger.mlp.0.weight"].T),
        "m0_b": jnp.asarray(t["merger.mlp.0.bias"]),
        "m2_w": jnp.asarray(t["merger.mlp.2.weight"].T),
        "m2_b": jnp.asarray(t["merger.mlp.2.bias"]),
    }


class QwenVLProcessor:
    """Qwen2-VL image → text-space features + M-RoPE positions."""

    needs_mrope = True

    def __init__(self, hf_config: Dict[str, Any], model_path: str):
        vcfg = hf_config.get("vision_config") or {}
        self.patch_size = int(vcfg.get("patch_size", 14))
        self.merge = int(vcfg.get("spatial_merge_size", 2))
        self.temporal = int(vcfg.get("temporal_patch_size", 2))
        self.num_heads = int(vcfg.get("num_heads", 16))
        self.image_token_id = int(hf_config.get("image_token_id", 151655))
        self.n_patches = 0  # variable; last_counts carries per-image
        self.last_counts: List[int] = []
        self.last_grids: List[Tuple[int, int, int]] = []
        self.params = load_qwen_vl_vision_params(model_path)
        self._fwd = jax.jit(
            qwen_vision_forward,
            static_argnames=("num_heads", "merge", "grid"),
        )

    def encode_images(self, images: List[Any]) -> np.ndarray:
        rows = []
        self.last_counts = []
        self.last_grids = []
        for im in images:
            patches, grid = qwen_patchify(
                im, self.patch_size, self.merge, self.temporal
            )
            feats = np.asarray(
                self._fwd(
                    self.params, jnp.asarray(patches), grid,
                    num_heads=self.num_heads, merge=self.merge,
                ),
                np.float32,
            )
            rows.append(feats)
            self.last_counts.append(feats.shape[0])
            self.last_grids.append(grid)
        return np.concatenate(rows, axis=0)

    def expand_prompt(self, input_ids: List[int], n_images: int) -> List[int]:
        counts = self.last_counts
        assert len(counts) == n_images, (len(counts), n_images)
        out: List[int] = []
        next_row = 0
        seen = 0
        for t in input_ids:
            if t == self.image_token_id:
                for _ in range(counts[seen]):
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

    def mrope_positions(
        self, expanded_ids: List[int]
    ) -> Tuple[np.ndarray, int]:
        """HF ``get_rope_index``: (positions [3, n], decode delta).
        Image blocks (negative sentinel runs, in last_grids order) get
        (t=st, h=st+row, w=st+col); text advances all axes together."""
        n = len(expanded_ids)
        pos = np.zeros((3, n), np.int32)
        st = 0
        i = 0
        img = 0
        while i < n:
            if expanded_ids[i] < 0:
                gt, gh, gw = self.last_grids[img]
                lh, lw = gh // self.merge, gw // self.merge
                count = gt * lh * lw
                idx = np.arange(count)
                pos[0, i : i + count] = st + idx // (lh * lw)
                pos[1, i : i + count] = st + (idx % (lh * lw)) // lw
                pos[2, i : i + count] = st + idx % lw
                st = st + max(gt, lh, lw)
                i += count
                img += 1
            else:
                pos[:, i] = st
                st += 1
                i += 1
        delta = int(pos.max()) + 1 - n
        return pos, delta
