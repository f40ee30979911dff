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


def qwen_patchify_video(
    frames, patch_size: int = 14, merge: int = 2, temporal: int = 2,
    min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Video frames ([F, H, W, 3] array or list of PIL/array frames) →
    (flatten_patches [gt·gh·gw, C·T·ps·ps], grid_thw).  Frames resize to
    one smart_resize target and group by ``temporal`` (the last frame
    repeats when F is odd) — HF Qwen2VLVideoProcessor contract."""
    import PIL.Image

    frames = [
        f if isinstance(f, PIL.Image.Image)
        else PIL.Image.fromarray(np.asarray(f))
        for f in (frames if isinstance(frames, (list, tuple)) else list(frames))
    ]
    H, W = smart_resize(
        frames[0].size[1], frames[0].size[0], factor=patch_size * merge,
        min_pixels=min_pixels, max_pixels=max_pixels,
    )
    arrs = []
    for f in frames:
        a = np.asarray(
            f.convert("RGB").resize((W, H), PIL.Image.BICUBIC), np.float32
        ) / 255.0
        a = (a - OPENAI_MEAN) / OPENAI_STD
        arrs.append(a.transpose(2, 0, 1))  # [C, H, W]
    while len(arrs) % temporal:
        arrs.append(arrs[-1])
    patches = np.stack(arrs)  # [F, C, H, W]
    F = patches.shape[0]
    gt, gh, gw = F // temporal, H // patch_size, W // patch_size
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
        self.video_token_id = int(hf_config.get("video_token_id", 151656))
        self.n_patches = 0  # variable; last_counts carries per-image
        self.last_counts: List[int] = []
        self.last_grids: List[Tuple[int, int, int]] = []
        self.last_kinds: List[str] = []  # "image" | "video" per media
        self.params = load_qwen_vl_vision_params(model_path)
        self._fwd = jax.jit(
            qwen_vision_forward,
            static_argnames=("num_heads", "merge", "grid"),
        )

    def _tower(self, patches: np.ndarray, grid) -> np.ndarray:
        return np.asarray(
            self._fwd(
                self.params, jnp.asarray(patches), grid,
                num_heads=self.num_heads, merge=self.merge,
            ),
            np.float32,
        )

    def encode_images(self, images: List[Any]) -> np.ndarray:
        rows = []
        self.last_counts = []
        self.last_grids = []
        self.last_kinds = []
        for im in images:
            patches, grid = qwen_patchify(
                im, self.patch_size, self.merge, self.temporal
            )
            feats = self._tower(patches, grid)
            rows.append(feats)
            self.last_counts.append(feats.shape[0])
            self.last_grids.append(grid)
            self.last_kinds.append("image")
        return np.concatenate(rows, axis=0)

    def encode_videos(self, videos: List[Any]) -> np.ndarray:
        """Each video: [F, H, W, 3] array or list of PIL/array frames.
        Frames group by temporal_patch_size into a gt>1 grid; the same
        tower handles it (rot angles / window order tile over gt)."""
        rows = []
        self.last_counts = []
        self.last_grids = []
        self.last_kinds = []
        for vid in videos:
            patches, grid = qwen_patchify_video(
                vid, self.patch_size, self.merge, self.temporal
            )
            feats = self._tower(patches, grid)
            rows.append(feats)
            self.last_counts.append(feats.shape[0])
            self.last_grids.append(grid)
            self.last_kinds.append("video")
        return np.concatenate(rows, axis=0)

    def expand_prompt(self, input_ids: List[int], n_media: int) -> List[int]:
        counts = self.last_counts
        assert len(counts) == n_media, (len(counts), n_media)
        out: List[int] = []
        next_row = 0
        seen = 0
        for t in input_ids:
            if t in (self.image_token_id, self.video_token_id):
                want = (
                    self.image_token_id
                    if self.last_kinds[seen] == "image"
                    else self.video_token_id
                )
                if t != want:
                    raise ValueError(
                        "prompt media token order does not match the "
                        "provided images/videos"
                    )
                for _ in range(counts[seen]):
                    out.append(-(next_row + 1))
                    next_row += 1
                seen += 1
            else:
                out.append(t)
        if seen != n_media:
            raise ValueError(
                f"prompt has {seen} media tokens but {n_media} media inputs"
            )
        return out

    def _t_index(self, kind: str, gt: int) -> np.ndarray:
        """Temporal rotary indices of one media block's gt groups.
        Qwen2-VL: consecutive integers for images and videos alike."""
        del kind
        return np.arange(gt, dtype=np.int64)

    def mrope_positions(
        self, expanded_ids: List[int]
    ) -> Tuple[np.ndarray, int]:
        """HF ``get_rope_index``: (positions [3, n], decode delta).
        Media blocks (negative sentinel runs, in last_grids order) get
        (t=st+t_index, h=st+row, w=st+col); text advances all axes
        together; the next block starts past the max position so far."""
        n = len(expanded_ids)
        pos = np.zeros((3, n), np.int32)
        st = 0
        i = 0
        media = 0
        while i < n:
            if expanded_ids[i] < 0:
                gt, gh, gw = self.last_grids[media]
                kind = self.last_kinds[media] if self.last_kinds else "image"
                lh, lw = gh // self.merge, gw // self.merge
                count = gt * lh * lw
                idx = np.arange(count)
                tvals = self._t_index(kind, gt)
                pos[0, i : i + count] = st + np.repeat(tvals, lh * lw)
                pos[1, i : i + count] = st + (idx % (lh * lw)) // lw
                pos[2, i : i + count] = st + idx % lw
                st = st + max(int(tvals[-1]) + 1, lh, lw)
                i += count
                media += 1
            else:
                pos[:, i] = st
                st += 1
                i += 1
        delta = int(pos.max()) + 1 - n
        return pos, delta


# ---------------------------------------------------------------------------
# Qwen2.5-VL (reference srt/models/qwen2_5_vl.py): RMSNorm blocks, SwiGLU
# MLP, windowed attention with the HF window_index reorder
# ---------------------------------------------------------------------------

def qwen25_window_order(
    grid: Tuple[int, int, int], merge: int, window_size: int,
    patch_size: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """HF ``get_window_index`` for one image: returns
    (window_index [S/mu] merge-unit reorder, window segment id per token
    [S] in the REORDERED order, full-attention segment id per token [S]
    — the frame index, since full attention is per-frame)."""
    gt, gh, gw = grid
    lh, lw = gh // merge, gw // merge
    mu = merge * merge
    vmw = window_size // merge // patch_size
    idx = np.arange(gt * lh * lw).reshape(gt, lh, lw)
    # NOTE: HF pads by vmw - (dim % vmw) even when the dim is already a
    # multiple (a full extra -100 band) — keep the exact semantics.
    pad_h = vmw - lh % vmw
    pad_w = vmw - lw % vmw
    nh, nw = (lh + pad_h) // vmw, (lw + pad_w) // vmw
    ip = np.full((gt, lh + pad_h, lw + pad_w), -100, np.int64)
    ip[:, :lh, :lw] = idx
    ip = (
        ip.reshape(gt, nh, vmw, nw, vmw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(gt, nh * nw, vmw, vmw)
    )
    seqlens = (ip != -100).sum(axis=(2, 3)).reshape(-1)
    flat = ip.reshape(-1)
    window_index = flat[flat != -100]  # [gt*lh*lw]
    cu = np.concatenate([[0], np.cumsum(seqlens) * mu]).astype(np.int64)
    cu = np.unique(cu)  # nondecreasing → == unique_consecutive
    S = gt * gh * gw
    seg_w = np.zeros(S, np.int32)
    for i in range(len(cu) - 1):
        seg_w[cu[i]: cu[i + 1]] = i
    frame = (window_index // (lh * lw)).astype(np.int32)
    seg_f = np.repeat(frame, mu)
    return window_index.astype(np.int64), seg_w, seg_f


def qwen25_vision_forward(
    params: Dict[str, Any],
    patches: jnp.ndarray,  # [S, C·T·ps·ps]
    grid: Tuple[int, int, int],
    *,
    num_heads: int,
    merge: int = 2,
    window_size: int = 112,
    patch_size: int = 14,
    fullatt_blocks: Tuple[int, ...] = (7, 15, 23, 31),
) -> jnp.ndarray:
    """→ merged features [S / merge², out_hidden_size].

    Qwen2.5-VL vision semantics (HF Qwen2_5_VisionTransformer): tokens
    are reordered into window groups at merge-unit granularity; most
    blocks attend within their window segment, ``fullatt_blocks``
    attend per-frame; RMSNorm + SwiGLU; the merger output is restored
    to the original merge-unit order."""
    x = patches @ params["patch_w"]  # [S, E]
    E = x.shape[-1]
    hd = E // num_heads
    S = x.shape[0]
    mu = merge * merge

    ang_np = _vision_rot_angles(grid, hd, merge)  # [S, hd/2]
    win_idx, seg_w, seg_f = qwen25_window_order(
        grid, merge, window_size, patch_size
    )
    # reorder tokens (and their rotary angles) into window groups
    x = x.reshape(S // mu, mu, E)[win_idx].reshape(S, E)
    ang = jnp.asarray(
        ang_np.reshape(S // mu, mu, -1)[win_idx].reshape(S, -1)
    )
    cos = jnp.cos(jnp.concatenate([ang, ang], axis=-1))  # [S, hd]
    sin = jnp.sin(jnp.concatenate([ang, ang], axis=-1))
    mask_w = jnp.asarray(seg_w[:, None] == seg_w[None, :])  # [S, S]
    mask_f = jnp.asarray(seg_f[:, None] == seg_f[None, :])

    def rope(t):  # [S, H, hd]
        tf = t.astype(jnp.float32)
        half = tf.shape[-1] // 2
        rot = jnp.concatenate([-tf[..., half:], tf[..., :half]], axis=-1)
        return tf * cos[:, None, :] + rot * sin[:, None, :]

    def rms(v, w):
        vf = v.astype(jnp.float32)
        return vf * jax.lax.rsqrt(
            (vf * vf).mean(-1, keepdims=True) + 1e-6
        ) * w

    L = params["blocks"]["norm1_w"].shape[0]
    for i in range(L):
        w = {k: v[i] for k, v in params["blocks"].items()}
        mask = mask_f if i in fullatt_blocks else mask_w
        h = rms(x, w["norm1_w"])
        qkv = h @ w["qkv_w"] + w["qkv_b"]  # [S, 3E]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rope(q.reshape(S, num_heads, hd))
        k = rope(k.reshape(S, num_heads, hd))
        v = v.reshape(S, num_heads, hd).astype(jnp.float32)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
        scores = jnp.where(mask[None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("hqk,khd->qhd", probs, v).reshape(S, E)
        x = x + (att @ w["proj_w"] + w["proj_b"])
        h = rms(x, w["norm2_w"])
        g = h @ w["gate_w"] + w["gate_b"]
        u = h @ w["up_w"] + w["up_b"]
        x = x + ((jax.nn.silu(g) * u) @ w["down_w"] + w["down_b"])

    # merger: RMSNorm then merge-unit groups -> MLP
    x = rms(x, params["ln_q_w"])
    x = x.reshape(-1, E * mu)
    x = x @ params["m0_w"] + params["m0_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["m2_w"] + params["m2_b"]
    # restore the original merge-unit order
    rev = jnp.asarray(np.argsort(win_idx))
    return x[rev]


def load_qwen25_vl_vision_params(model_path: str) -> Dict[str, Any]:
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
        raise ValueError(f"no qwen2.5-vl vision tower in {model_path}")
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
            "qkv_w": stack(B + "attn.qkv.weight", tr=True),
            "qkv_b": stack(B + "attn.qkv.bias"),
            "proj_w": stack(B + "attn.proj.weight", tr=True),
            "proj_b": stack(B + "attn.proj.bias"),
            "norm2_w": stack(B + "norm2.weight"),
            "gate_w": stack(B + "mlp.gate_proj.weight", tr=True),
            "gate_b": stack(B + "mlp.gate_proj.bias"),
            "up_w": stack(B + "mlp.up_proj.weight", tr=True),
            "up_b": stack(B + "mlp.up_proj.bias"),
            "down_w": stack(B + "mlp.down_proj.weight", tr=True),
            "down_b": stack(B + "mlp.down_proj.bias"),
        },
        "ln_q_w": jnp.asarray(t["merger.ln_q.weight"]),
        "m0_w": jnp.asarray(t["merger.mlp.0.weight"].T),
        "m0_b": jnp.asarray(t["merger.mlp.0.bias"]),
        "m2_w": jnp.asarray(t["merger.mlp.2.weight"].T),
        "m2_b": jnp.asarray(t["merger.mlp.2.bias"]),
    }


class Qwen25VLProcessor(QwenVLProcessor):
    """Qwen2.5-VL image → text-space features + M-RoPE positions.

    Same dynamic-resolution tiling and ``get_rope_index`` as Qwen2-VL;
    the tower differs (RMSNorm, SwiGLU, windowed attention)."""

    def __init__(self, hf_config: Dict[str, Any], model_path: str):
        vcfg = hf_config.get("vision_config") or {}
        self.patch_size = int(vcfg.get("patch_size", 14))
        self.merge = int(vcfg.get("spatial_merge_size", 2))
        self.temporal = int(vcfg.get("temporal_patch_size", 2))
        self.num_heads = int(vcfg.get("num_heads", 16))
        self.window_size = int(vcfg.get("window_size", 112))
        self.fullatt_blocks = tuple(
            vcfg.get("fullatt_block_indexes") or (7, 15, 23, 31)
        )
        self.image_token_id = int(hf_config.get("image_token_id", 151655))
        self.video_token_id = int(hf_config.get("video_token_id", 151656))
        # video temporal rotary scale (HF get_rope_index:
        # t = floor(group * second_per_grid_ts * tokens_per_second);
        # second_per_grid_ts defaults to 1.0 when the caller gives none)
        self.tokens_per_second = float(vcfg.get("tokens_per_second", 2))
        self.second_per_grid_ts = 1.0
        self.n_patches = 0
        self.last_counts: List[int] = []
        self.last_grids: List[Tuple[int, int, int]] = []
        self.last_kinds: List[str] = []
        self.params = load_qwen25_vl_vision_params(model_path)
        self._fwd = jax.jit(
            qwen25_vision_forward,
            static_argnames=(
                "num_heads", "merge", "grid", "window_size",
                "patch_size", "fullatt_blocks",
            ),
        )

    def _tower(self, patches: np.ndarray, grid) -> np.ndarray:
        return np.asarray(
            self._fwd(
                self.params, jnp.asarray(patches), grid,
                num_heads=self.num_heads, merge=self.merge,
                window_size=self.window_size,
                patch_size=self.patch_size,
                fullatt_blocks=self.fullatt_blocks,
            ),
            np.float32,
        )

    def _t_index(self, kind: str, gt: int) -> np.ndarray:
        if kind != "video":
            return np.arange(gt, dtype=np.int64)
        return np.floor(
            np.arange(gt, dtype=np.float64)
            * self.second_per_grid_ts
            * self.tokens_per_second
        ).astype(np.int64)


# ---------------------------------------------------------------------------
# Qwen3-VL (reference srt/models/qwen3_vl.py): learned pos-embed ViT with
# bilinear grid interpolation, LN blocks, 2D rotary, and DEEPSTACK — the
# listed vision blocks' hidden states merge separately and ADD into the
# text model's first layers at the visual token positions
# (DeepStack, arXiv:2406.04334)
# ---------------------------------------------------------------------------

def _qwen3vl_pos_embed_order(grid, side: int, merge: int):
    """Host-side bilinear interpolation plan for one grid: returns
    (idx [4, S], w [4, S]) into the [side*side] pos-embed table, already
    PERMUTED to the merge-window patch order (HF
    fast_pos_embed_interpolate)."""
    gt, gh, gw = grid
    h_idxs = np.linspace(0, side - 1, gh)
    w_idxs = np.linspace(0, side - 1, gw)
    hf_, wf_ = h_idxs.astype(np.int64), w_idxs.astype(np.int64)
    hc = np.clip(hf_ + 1, None, side - 1)
    wc = np.clip(wf_ + 1, None, side - 1)
    dh, dw = h_idxs - hf_, w_idxs - wf_
    idx = np.stack(
        [
            (hf_[:, None] * side + wf_[None, :]).reshape(-1),
            (hf_[:, None] * side + wc[None, :]).reshape(-1),
            (hc[:, None] * side + wf_[None, :]).reshape(-1),
            (hc[:, None] * side + wc[None, :]).reshape(-1),
        ]
    )
    wgt = np.stack(
        [
            ((1 - dh)[:, None] * (1 - dw)[None, :]).reshape(-1),
            ((1 - dh)[:, None] * dw[None, :]).reshape(-1),
            (dh[:, None] * (1 - dw)[None, :]).reshape(-1),
            (dh[:, None] * dw[None, :]).reshape(-1),
        ]
    ).astype(np.float32)

    # raster → merge-window order, tiled over gt frames
    def regroup(x):  # [gh*gw] raster → window order
        x = x.reshape(gh // merge, merge, gw // merge, merge)
        return x.transpose(0, 2, 1, 3).reshape(-1)

    order = regroup(np.arange(gh * gw))
    idx = np.tile(idx[:, order], (1, gt))
    wgt = np.tile(wgt[:, order], (1, gt))
    return idx, wgt


def qwen3vl_vision_forward(
    params: Dict[str, Any],
    patches: jnp.ndarray,  # [S, C·T·ps·ps] in merge-window order
    grid: Tuple[int, int, int],
    *,
    num_heads: int,
    merge: int = 2,
    deepstack_idx: Tuple[int, ...] = (),
):
    """→ (merged features [S/merge², out_hidden], deepstack features
    [n_deepstack, S/merge², out_hidden])."""
    x = patches @ params["patch_w"] + params["patch_b"]  # [S, E]
    E = x.shape[-1]
    hd = E // num_heads
    side = int(round(float(np.sqrt(params["pos_emb"].shape[0]))))
    pidx, pwgt = _qwen3vl_pos_embed_order(grid, side, merge)
    pe = jnp.einsum(
        "ksd,ks->sd", params["pos_emb"][jnp.asarray(pidx)],
        jnp.asarray(pwgt),
    )
    x = x + pe
    ang = jnp.asarray(_vision_rot_angles(grid, hd, merge))  # [S, hd/2]
    cos = jnp.cos(jnp.concatenate([ang, ang], axis=-1))
    sin = jnp.sin(jnp.concatenate([ang, ang], axis=-1))

    def rope(t):  # [S, H, hd]
        tf = t.astype(jnp.float32)
        half = tf.shape[-1] // 2
        rot = jnp.concatenate([-tf[..., half:], tf[..., :half]], axis=-1)
        return tf * cos[:, None, :] + rot * sin[:, None, :]

    def ln(v, w, b, eps=1e-6):
        vf = v.astype(jnp.float32)
        mu = vf.mean(-1, keepdims=True)
        var = vf.var(-1, keepdims=True)
        return (vf - mu) * jax.lax.rsqrt(var + eps) * w + b

    def merger(h, pfx, postshuffle):
        if not postshuffle:
            h = ln(h, params[pfx + "n_w"], params[pfx + "n_b"])
        h = h.reshape(-1, E * merge * merge)
        if postshuffle:
            h = ln(h, params[pfx + "n_w"], params[pfx + "n_b"])
        h = h @ params[pfx + "fc1_w"] + params[pfx + "fc1_b"]
        h = jax.nn.gelu(h, approximate=False)  # nn.GELU exact
        return h @ params[pfx + "fc2_w"] + params[pfx + "fc2_b"]

    ds_out = []
    L = params["blocks"]["norm1_w"].shape[0]
    for i in range(L):
        w = {k: v[i] for k, v in params["blocks"].items()}
        h = ln(x, w["norm1_w"], w["norm1_b"])
        qkv = h @ w["qkv_w"] + w["qkv_b"]  # [S, 3E]
        S = qkv.shape[0]
        # HF reshape(S, 3, heads, hd): per-head q/k/v interleaved
        qkv = qkv.reshape(S, 3, num_heads, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = rope(q), rope(k)
        v = v.astype(jnp.float32)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("hqk,khd->qhd", probs, v).reshape(S, E)
        x = x + (att @ w["proj_w"] + w["proj_b"])
        h = ln(x, w["norm2_w"], w["norm2_b"])
        h = h @ w["fc1_w"] + w["fc1_b"]
        h = jax.nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
        x = x + (h @ w["fc2_w"] + w["fc2_b"])
        if i in deepstack_idx:
            j = deepstack_idx.index(i)
            ds_out.append(merger(x, f"ds{j}_", postshuffle=True))

    main = merger(x, "m_", postshuffle=False)
    return main, jnp.stack(ds_out) if ds_out else jnp.zeros((0,) + main.shape)


def load_qwen3vl_vision_params(model_path: str) -> Dict[str, Any]:
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
        raise ValueError(f"no qwen3-vl vision tower in {model_path}")
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
    out = {
        "patch_w": jnp.asarray(
            t["patch_embed.proj.weight"].reshape(E, -1).T
        ),
        "patch_b": jnp.asarray(t["patch_embed.proj.bias"]),
        "pos_emb": jnp.asarray(t["pos_embed.weight"]),
        "blocks": {
            "norm1_w": stack(B + "norm1.weight"),
            "norm1_b": stack(B + "norm1.bias"),
            "qkv_w": stack(B + "attn.qkv.weight", tr=True),
            "qkv_b": stack(B + "attn.qkv.bias"),
            "proj_w": stack(B + "attn.proj.weight", tr=True),
            "proj_b": stack(B + "attn.proj.bias"),
            "norm2_w": stack(B + "norm2.weight"),
            "norm2_b": stack(B + "norm2.bias"),
            "fc1_w": stack(B + "mlp.linear_fc1.weight", tr=True),
            "fc1_b": stack(B + "mlp.linear_fc1.bias"),
            "fc2_w": stack(B + "mlp.linear_fc2.weight", tr=True),
            "fc2_b": stack(B + "mlp.linear_fc2.bias"),
        },
        "m_n_w": jnp.asarray(t["merger.norm.weight"]),
        "m_n_b": jnp.asarray(t["merger.norm.bias"]),
        "m_fc1_w": jnp.asarray(t["merger.linear_fc1.weight"].T),
        "m_fc1_b": jnp.asarray(t["merger.linear_fc1.bias"]),
        "m_fc2_w": jnp.asarray(t["merger.linear_fc2.weight"].T),
        "m_fc2_b": jnp.asarray(t["merger.linear_fc2.bias"]),
    }
    j = 0
    while f"deepstack_merger_list.{j}.norm.weight" in t:
        D = f"deepstack_merger_list.{j}."
        out[f"ds{j}_n_w"] = jnp.asarray(t[D + "norm.weight"])
        out[f"ds{j}_n_b"] = jnp.asarray(t[D + "norm.bias"])
        out[f"ds{j}_fc1_w"] = jnp.asarray(t[D + "linear_fc1.weight"].T)
        out[f"ds{j}_fc1_b"] = jnp.asarray(t[D + "linear_fc1.bias"])
        out[f"ds{j}_fc2_w"] = jnp.asarray(t[D + "linear_fc2.weight"].T)
        out[f"ds{j}_fc2_b"] = jnp.asarray(t[D + "linear_fc2.bias"])
        j += 1
    return out


class Qwen3VLProcessor(QwenVLProcessor):
    """Qwen3-VL images → text-space features + DEEPSTACK planes.

    ``encode_images`` returns [n_tokens, (1 + n_deepstack) · H_text]:
    the first H columns splice as embeddings; each following H-wide
    slab ADDS to the residual stream after text layer j at the visual
    positions (models/llama.py deepstack injection).  Videos use
    timestamp text tokens in Qwen3-VL's chat template and are not wired
    yet."""

    def __init__(self, hf_config: Dict[str, Any], model_path: str):
        vcfg = hf_config.get("vision_config") or {}
        self.patch_size = int(vcfg.get("patch_size", 16))
        self.merge = int(vcfg.get("spatial_merge_size", 2))
        self.temporal = int(vcfg.get("temporal_patch_size", 2))
        self.num_heads = int(vcfg.get("num_heads", 16))
        self.deepstack_idx = tuple(
            vcfg.get("deepstack_visual_indexes") or ()
        )
        self.deepstack_layers = len(self.deepstack_idx)
        self.image_token_id = int(hf_config.get("image_token_id", 151655))
        self.video_token_id = int(hf_config.get("video_token_id", 151656))
        self.n_patches = 0
        self.last_counts: List[int] = []
        self.last_grids: List[Tuple[int, int, int]] = []
        self.last_kinds: List[str] = []
        self.params = load_qwen3vl_vision_params(model_path)
        self._fwd = jax.jit(
            qwen3vl_vision_forward,
            static_argnames=("num_heads", "merge", "grid", "deepstack_idx"),
        )

    def _tower(self, patches: np.ndarray, grid) -> np.ndarray:
        main, ds = self._fwd(
            self.params, jnp.asarray(patches), grid,
            num_heads=self.num_heads, merge=self.merge,
            deepstack_idx=self.deepstack_idx,
        )
        main = np.asarray(main, np.float32)
        ds = np.asarray(ds, np.float32)  # [n, rows, H]
        if ds.shape[0]:
            main = np.concatenate(
                [main] + [ds[j] for j in range(ds.shape[0])], axis=-1
            )
        return main

    def encode_videos(self, videos):
        raise NotImplementedError(
            "Qwen3-VL video inputs (timestamp-token template) not wired"
        )
