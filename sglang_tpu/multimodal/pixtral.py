"""Mistral 3 multimodal: Pixtral vision tower + 2×2 patch-merger
projector over a Mistral text trunk.

Equivalent role to the reference's ``srt/models/mistral_large_3.py`` /
pixtral support: the tower is a variable-resolution RMSNorm ViT with 2D
rotary (h-positions read the even-index frequencies, w-positions the
odd ones) and gated-SiLU MLPs; the projector RMS-norms, unfolds 2×2
patch blocks channel-major into the merging layer, then a bias-free
GELU MLP into text space.  Image tokens splice through the
negative-sentinel input_embeds path (standard positions, no M-RoPE)."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OPENAI_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def pixtral_preprocess(
    image, patch: int, merge: int, image_size: int,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """→ ([C, H, W] normalized pixels, (gh, gw) patch grid).  Longest
    side capped at ``image_size``, dims rounded up to patch·merge
    multiples (HF PixtralImageProcessor contract)."""
    import math

    import PIL.Image

    if not isinstance(image, PIL.Image.Image):
        image = PIL.Image.fromarray(np.asarray(image))
    image = image.convert("RGB")
    W0, H0 = image.size
    ratio = max(H0 / image_size, W0 / image_size)
    if ratio > 1:
        H0, W0 = H0 / ratio, W0 / ratio
    f = patch * merge
    H = max(f, math.ceil(H0 / f) * f)
    W = max(f, math.ceil(W0 / f) * f)
    arr = np.asarray(
        image.resize((W, H), PIL.Image.BICUBIC), np.float32
    ) / 255.0
    arr = (arr - OPENAI_MEAN) / OPENAI_STD
    return arr.transpose(2, 0, 1), (H // patch, W // patch)


def _pixtral_angles(grid, head_dim: int, theta: float, side: int):
    """[S, head_dim/2] rotary angles in raster order: h positions use
    the even-index frequencies, w the odd (HF PixtralRotaryEmbedding)."""
    gh, gw = grid
    freqs = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    h = np.arange(gh)[:, None] * freqs[::2][None]  # [gh, hd/4]
    w = np.arange(gw)[:, None] * freqs[1::2][None]
    ang = np.concatenate(
        [
            np.broadcast_to(h[:, None], (gh, gw, h.shape[1])),
            np.broadcast_to(w[None, :], (gh, gw, w.shape[1])),
        ],
        axis=-1,
    ).reshape(gh * gw, head_dim // 2)
    del side  # table indexing collapses to direct position math
    return ang.astype(np.float32)


def pixtral_vision_forward(
    params: Dict[str, Any],
    pixels: jnp.ndarray,  # [C, H, W]
    grid: Tuple[int, int],
    *,
    num_heads: int,
    theta: float = 10000.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """→ [gh·gw, E] tower hidden states (pre-projector)."""
    C, H, W = pixels.shape
    gh, gw = grid
    ps = H // gh
    p = pixels.reshape(C, gh, ps, gw, ps)
    p = p.transpose(1, 3, 0, 2, 4).reshape(gh * gw, C * ps * ps)
    x = p @ params["patch_w"]  # conv == per-patch linear (no bias)
    E = x.shape[-1]
    hd = E // num_heads

    def rms(v, w):
        vf = v.astype(jnp.float32)
        var = jnp.mean(vf * vf, -1, keepdims=True)
        return vf * jax.lax.rsqrt(var + eps) * w

    x = rms(x, params["ln_pre"]).astype(jnp.float32)
    ang = jnp.asarray(_pixtral_angles(grid, hd, theta, 0))
    cos = jnp.cos(jnp.concatenate([ang, ang], axis=-1))  # [S, hd]
    sin = jnp.sin(jnp.concatenate([ang, ang], axis=-1))

    def rope(t):  # [S, H, hd]
        tf = t.astype(jnp.float32)
        half = hd // 2
        rot = jnp.concatenate([-tf[..., half:], tf[..., :half]], axis=-1)
        return tf * cos[:, None, :] + rot * sin[:, None, :]

    L = params["blocks"]["attn_ln"].shape[0]
    S = x.shape[0]
    for i in range(L):
        w = {k: v[i] for k, v in params["blocks"].items()}
        h = rms(x, w["attn_ln"])
        q = rope((h @ w["q_w"]).reshape(S, num_heads, hd))
        k = rope((h @ w["k_w"]).reshape(S, num_heads, hd))
        v = (h @ w["v_w"]).reshape(S, num_heads, hd)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("hqk,khd->qhd", probs, v).reshape(S, E)
        x = x + att @ w["o_w"]
        h = rms(x, w["ffn_ln"])
        inter = jax.nn.silu(h @ w["gate_w"]) * (h @ w["up_w"])
        x = x + inter @ w["down_w"]
    return x


def pixtral_project(
    params: Dict[str, Any],
    feats: jnp.ndarray,  # [gh·gw, E]
    grid: Tuple[int, int],
    *,
    merge: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """RMS norm → channel-major 2×2 unfold → merging layer → GELU MLP."""
    gh, gw = grid
    E = feats.shape[-1]
    f = feats.astype(jnp.float32)
    var = jnp.mean(f * f, -1, keepdims=True)
    f = f * jax.lax.rsqrt(var + eps) * params["pnorm"]
    g = f.reshape(gh // merge, merge, gw // merge, merge, E)
    # torch unfold layout: channel OUTER, kernel positions inner
    g = g.transpose(0, 2, 4, 1, 3).reshape(-1, E * merge * merge)
    h = g @ params["merge_w"]
    h = h @ params["l1_w"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["l2_w"]


def load_pixtral_vision_params(model_path: str) -> Dict[str, Any]:
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
                    if "multi_modal_projector." in name:
                        key = "proj." + key
                    t[key] = np.asarray(st.get_tensor(name), np.float32)
                    break
    if not t:
        raise ValueError(f"no pixtral vision tower in {model_path}")
    E = t["patch_conv.weight"].shape[0]
    n = 0
    while f"transformer.layers.{n}.attention_norm.weight" in t:
        n += 1

    def stack(fmt, tr=False):
        arrs = [t[fmt.format(i)] for i in range(n)]
        if tr:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    B = "transformer.layers.{}."
    return {
        "patch_w": jnp.asarray(t["patch_conv.weight"].reshape(E, -1).T),
        "ln_pre": jnp.asarray(t["ln_pre.weight"]),
        "blocks": {
            "attn_ln": stack(B + "attention_norm.weight"),
            "q_w": stack(B + "attention.q_proj.weight", tr=True),
            "k_w": stack(B + "attention.k_proj.weight", tr=True),
            "v_w": stack(B + "attention.v_proj.weight", tr=True),
            "o_w": stack(B + "attention.o_proj.weight", tr=True),
            "ffn_ln": stack(B + "ffn_norm.weight"),
            "gate_w": stack(B + "feed_forward.gate_proj.weight", tr=True),
            "up_w": stack(B + "feed_forward.up_proj.weight", tr=True),
            "down_w": stack(B + "feed_forward.down_proj.weight", tr=True),
        },
        "pnorm": jnp.asarray(t["proj.norm.weight"]),
        "merge_w": jnp.asarray(
            t["proj.patch_merger.merging_layer.weight"].T
        ),
        "l1_w": jnp.asarray(t["proj.linear_1.weight"].T),
        "l2_w": jnp.asarray(t["proj.linear_2.weight"].T),
    }


class Mistral3Processor:
    """Mistral 3 images → text-space features (variable token count)."""

    def __init__(self, hf_config: Dict[str, Any], model_path: str):
        vcfg = hf_config.get("vision_config") or {}
        self.patch = int(vcfg.get("patch_size", 16))
        self.image_size = int(vcfg.get("image_size", 1540))
        self.num_heads = int(vcfg.get("num_attention_heads", 16))
        self.theta = float(vcfg.get("rope_theta", 10000.0))
        self.merge = int(hf_config.get("spatial_merge_size", 2))
        self.image_token_id = int(
            hf_config.get("image_token_index",
                          hf_config.get("image_token_id", 10))
        )
        self.n_patches = 0
        self.last_counts: List[int] = []
        self.params = load_pixtral_vision_params(model_path)

        def fwd(params, pixels, grid):
            feats = pixtral_vision_forward(
                params, pixels, grid, num_heads=self.num_heads,
                theta=self.theta,
            )
            return pixtral_project(
                params, feats, grid, merge=self.merge,
            )

        self._fwd = jax.jit(fwd, static_argnames=("grid",))

    def encode_images(self, images: List[Any]) -> np.ndarray:
        rows = []
        self.last_counts = []
        for im in images:
            px, grid = pixtral_preprocess(
                im, self.patch, self.merge, self.image_size,
            )
            feats = np.asarray(
                self._fwd(self.params, jnp.asarray(px), grid), np.float32,
            )
            rows.append(feats)
            self.last_counts.append(feats.shape[0])
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
