"""Multimodal input path: CLIP vision tower + LLaVA-style projection.

Equivalent role to the reference's ``srt/multimodal/`` +
``managers/multimodal_processor.py`` + the ViT encoders in the model zoo
(``models/llava.py``): images preprocess on host, encode through a
JAX CLIP-ViT, project into the text embedding space, and splice into the
prompt via the engine's input_embeds path (negative sentinel ids — see
``core/req.py``).  The vision forward runs as its own jit once per
request batch; the text engine never changes shape.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

# CLIP normalization constants (openai/clip-vit defaults)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(image, image_size: int) -> np.ndarray:
    """PIL image | [H, W, 3] uint8/float array → [3, S, S] f32 CLIP-normed."""
    try:
        from PIL import Image

        if isinstance(image, Image.Image):
            img = image.convert("RGB").resize(
                (image_size, image_size), Image.BICUBIC
            )
            arr = np.asarray(img, np.float32) / 255.0
        else:
            raise TypeError
    except TypeError:
        arr = np.asarray(image, np.float32)
        if arr.max() > 2.0:
            arr = arr / 255.0
        if arr.shape[:2] != (image_size, image_size):
            from PIL import Image

            img = Image.fromarray(
                (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            ).resize((image_size, image_size), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)


def _layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_vision_forward(
    params: Dict[str, Any],
    pixel_values: jnp.ndarray,  # [N, 3, S, S]
    *,
    num_heads: int,
    feature_layer: int = -2,
    drop_cls: bool = True,
) -> jnp.ndarray:
    """CLIP-ViT forward to ``feature_layer`` (HF CLIPVisionModel semantics:
    -2 = output of the second-to-last encoder layer, LLaVA's default).
    Returns [N, P(+1), H] patch features (CLS dropped when drop_cls)."""
    emb = params["embeddings"]
    N = pixel_values.shape[0]
    H = emb["class_embedding"].shape[-1]
    patch_w = emb["patch_embedding"]  # [H, 3, p, p]
    p = patch_w.shape[-1]
    # patch conv (stride=p, no bias) as an unfold + matmul
    S = pixel_values.shape[-1]
    g = S // p
    x = pixel_values.reshape(N, 3, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * p * p)
    wflat = patch_w.reshape(H, 3 * p * p).T  # [3pp, H]
    x = jnp.einsum("npc,ch->nph", x, wflat)
    cls = jnp.broadcast_to(emb["class_embedding"], (N, 1, H))
    x = jnp.concatenate([cls, x], axis=1)  # [N, P+1, H]
    x = x + emb["position_embedding"][None]
    x = _layer_norm(x, params["pre_ln"]["w"], params["pre_ln"]["b"])

    layers = params["layers"]
    n_layers = layers["ln1_w"].shape[0]
    stop = n_layers + 1 + feature_layer if feature_layer < 0 else feature_layer
    hd = H // num_heads
    for li in range(stop):
        w = {k: v[li] for k, v in layers.items()}
        res = x
        h = _layer_norm(x, w["ln1_w"], w["ln1_b"])
        q = (h @ w["q_w"] + w["q_b"]).reshape(N, -1, num_heads, hd)
        k = (h @ w["k_w"] + w["k_b"]).reshape(N, -1, num_heads, hd)
        v = (h @ w["v_w"] + w["v_b"]).reshape(N, -1, num_heads, hd)
        scores = jnp.einsum(
            "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum(
            "nhqk,nkhd->nqhd", probs.astype(v.dtype), v
        ).reshape(N, -1, H)
        x = res + (att @ w["o_w"] + w["o_b"])
        res = x
        h = _layer_norm(x, w["ln2_w"], w["ln2_b"])
        h = _quick_gelu(h @ w["fc1_w"] + w["fc1_b"])
        x = res + (h @ w["fc2_w"] + w["fc2_b"])
    if drop_cls:
        x = x[:, 1:]
    return x


def llava_project(params: Dict[str, Any], feats: jnp.ndarray) -> jnp.ndarray:
    """multi_modal_projector: linear → gelu → linear."""
    h = feats @ params["l1_w"] + params["l1_b"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["l2_w"] + params["l2_b"]


def load_llava_vision_params(model_path: str) -> Dict[str, Any]:
    """Vision tower + projector tensors from a LLaVA checkpoint
    (handles both the legacy ``vision_tower.`` and new ``model.vision_tower.``
    HF prefixes)."""
    import glob
    import os

    from sglang_tpu.model_loader.loader import SafetensorsFile

    tensors: Dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(os.path.join(model_path, "*.safetensors"))):
        st = SafetensorsFile(f)
        for name in st.keys():
            n = name
            for prefix in ("model.", ""):
                vt = prefix + "vision_tower.vision_model."
                mp = prefix + "multi_modal_projector."
                if name.startswith(vt):
                    n = "vt." + name[len(vt):]
                    break
                if name.startswith(mp):
                    n = "mp." + name[len(mp):]
                    break
            else:
                # llava-next anyres newline separator embedding
                if name in ("image_newline", "model.image_newline"):
                    tensors["image_newline"] = np.asarray(
                        st.get_tensor(name), np.float32
                    )
                continue
            tensors[n] = np.asarray(st.get_tensor(name), np.float32)

    def t(name):
        return tensors[name]

    n_layers = 0
    while f"vt.encoder.layers.{n_layers}.layer_norm1.weight" in tensors:
        n_layers += 1
    if n_layers == 0:
        raise ValueError(f"no CLIP vision tower found in {model_path}")

    def stack(fmt, transpose=False):
        arrs = [t(fmt.format(i)) for i in range(n_layers)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    L = "vt.encoder.layers.{}."
    params = {
        "embeddings": {
            "class_embedding": jnp.asarray(t("vt.embeddings.class_embedding")),
            "patch_embedding": jnp.asarray(
                t("vt.embeddings.patch_embedding.weight")
            ),
            "position_embedding": jnp.asarray(
                t("vt.embeddings.position_embedding.weight")
            ),
        },
        "pre_ln": {
            "w": jnp.asarray(t("vt.pre_layrnorm.weight")),
            "b": jnp.asarray(t("vt.pre_layrnorm.bias")),
        },
        "layers": {
            "ln1_w": stack(L + "layer_norm1.weight"),
            "ln1_b": stack(L + "layer_norm1.bias"),
            "q_w": stack(L + "self_attn.q_proj.weight", transpose=True),
            "q_b": stack(L + "self_attn.q_proj.bias"),
            "k_w": stack(L + "self_attn.k_proj.weight", transpose=True),
            "k_b": stack(L + "self_attn.k_proj.bias"),
            "v_w": stack(L + "self_attn.v_proj.weight", transpose=True),
            "v_b": stack(L + "self_attn.v_proj.bias"),
            "o_w": stack(L + "self_attn.out_proj.weight", transpose=True),
            "o_b": stack(L + "self_attn.out_proj.bias"),
            "ln2_w": stack(L + "layer_norm2.weight"),
            "ln2_b": stack(L + "layer_norm2.bias"),
            "fc1_w": stack(L + "mlp.fc1.weight", transpose=True),
            "fc1_b": stack(L + "mlp.fc1.bias"),
            "fc2_w": stack(L + "mlp.fc2.weight", transpose=True),
            "fc2_b": stack(L + "mlp.fc2.bias"),
        },
        "projector": {
            "l1_w": jnp.asarray(t("mp.linear_1.weight").T),
            "l1_b": jnp.asarray(t("mp.linear_1.bias")),
            "l2_w": jnp.asarray(t("mp.linear_2.weight").T),
            "l2_b": jnp.asarray(t("mp.linear_2.bias")),
        },
    }
    if "image_newline" in tensors:
        params["image_newline"] = tensors["image_newline"]
    return params


class MultimodalProcessor:
    """Image → projected text-space embeddings + prompt expansion
    (reference managers/multimodal_processor.py)."""

    def __init__(self, hf_config: Dict[str, Any], model_path: str):
        vcfg = hf_config.get("vision_config") or {}
        self.image_size = int(vcfg.get("image_size", 336))
        self.patch_size = int(vcfg.get("patch_size", 14))
        self.num_heads = int(vcfg.get("num_attention_heads", 16))
        self.feature_layer = int(hf_config.get("vision_feature_layer", -2))
        self.image_token_id = int(hf_config.get("image_token_index", 32000))
        self.n_patches = (self.image_size // self.patch_size) ** 2
        # LLaVA-NeXT anyres tiling (reference llava anyres processing,
        # srt/models/llava.py + mm_utils): high-resolution images split
        # into a grid of base-size tiles picked from image_grid_pinpoints
        # plus a global thumbnail; per-image token counts then vary
        # (``last_counts`` feeds prompt expansion).
        self.grid_pinpoints = hf_config.get("image_grid_pinpoints") or []
        self.anyres = bool(self.grid_pinpoints)
        self.last_counts: List[int] = []
        self.params = load_llava_vision_params(model_path)

        @jax.jit
        def encode(params, pixel_values):
            feats = clip_vision_forward(
                params["tower"], pixel_values,
                num_heads=self.num_heads,
                feature_layer=self.feature_layer,
            )
            return llava_project(params["projector"], feats)

        self._encode = encode
        self._jit_params = {
            "tower": {k: v for k, v in self.params.items()
                      if k != "projector"},
            "projector": self.params["projector"],
        }

    # ------------------------------------------------------------ anyres
    @staticmethod
    def select_best_resolution(orig, pinpoints):
        """HF ``select_best_resolution``: maximize effective resolution,
        break ties by minimum wasted area."""
        ow, oh = orig
        best, best_eff, best_waste = None, -1, None
        for h, w in pinpoints:
            scale = min(w / ow, h / oh)
            dw, dh = int(ow * scale), int(oh * scale)
            eff = min(dw * dh, ow * oh)
            waste = w * h - eff
            if eff > best_eff or (
                eff == best_eff and waste < best_waste
            ):
                best, best_eff, best_waste = (h, w), eff, waste
        return best

    def _anyres_pixels(self, image) -> np.ndarray:
        """[1 + gh*gw, S, S, 3] CHW-preprocessed thumbnail + tiles, plus
        records (gh, gw) for newline placement."""
        import PIL.Image

        if not isinstance(image, PIL.Image.Image):
            image = PIL.Image.fromarray(np.asarray(image))
        S = self.image_size
        H, W = self.select_best_resolution(image.size, self.grid_pinpoints)
        # resize preserving aspect into (H, W), pad with zeros
        scale = min(W / image.size[0], H / image.size[1])
        nw, nh = max(int(image.size[0] * scale), 1), max(
            int(image.size[1] * scale), 1
        )
        resized = image.resize((nw, nh))
        canvas = PIL.Image.new("RGB", (W, H))
        canvas.paste(resized, ((W - nw) // 2, (H - nh) // 2))
        gh, gw = H // S, W // S
        tiles = [preprocess_image(image, S)]  # global thumbnail first
        for r in range(gh):
            for ccol in range(gw):
                tiles.append(
                    preprocess_image(
                        canvas.crop(
                            (ccol * S, r * S, (ccol + 1) * S, (r + 1) * S)
                        ),
                        S,
                    )
                )
        self._last_grid = (gh, gw)
        return np.stack(tiles)

    def encode_images(self, images: List[Any]) -> np.ndarray:
        """→ [sum(counts), H_text] f32 embedding rows; per-image row
        counts land in ``last_counts`` (anyres images vary)."""
        if not self.anyres:
            pixels = np.stack(
                [preprocess_image(im, self.image_size) for im in images]
            )
            out = self._encode(self._jit_params, jnp.asarray(pixels))
            self.last_counts = [self.n_patches] * len(images)
            return np.asarray(out, np.float32).reshape(-1, out.shape[-1])
        rows = []
        self.last_counts = []
        newline = self.params.get("image_newline")
        for im in images:
            pixels = self._anyres_pixels(im)
            gh, gw = self._last_grid
            feats = np.asarray(
                self._encode(self._jit_params, jnp.asarray(pixels)),
                np.float32,
            )  # [1+gh*gw, P, H]
            parts = [feats[0]]  # global thumbnail
            P = feats.shape[1]
            for r in range(gh):
                row_feats = feats[1 + r * gw : 1 + (r + 1) * gw].reshape(
                    gw * P, -1
                )
                parts.append(row_feats)
                if newline is not None:
                    parts.append(
                        np.asarray(newline, np.float32)[None, :]
                    )
            img_rows = np.concatenate(parts, axis=0)
            rows.append(img_rows)
            self.last_counts.append(img_rows.shape[0])
        return np.concatenate(rows, axis=0)

    def expand_prompt(
        self, input_ids: List[int], n_images: int
    ) -> List[int]:
        """Each image token expands to that image's row count of
        NEGATIVE sentinel ids indexing the embedding rows in order."""
        counts = (
            self.last_counts
            if len(self.last_counts) == n_images
            else [self.n_patches] * n_images
        )
        out: List[int] = []
        next_row = 0
        seen = 0
        for t in input_ids:
            if t == self.image_token_id:
                for _ in range(counts[min(seen, n_images - 1)]):
                    out.append(-(next_row + 1))
                    next_row += 1
                seen += 1
            else:
                out.append(t)
        if seen != n_images:
            raise ValueError(
                f"prompt has {seen} image tokens but {n_images} images given"
            )
        return out
