"""BitsAndBytes 4-bit checkpoint support (pure numpy, no CUDA).

Equivalent role to the reference's ``model_loader/loader.py:1610``
``BitsAndBytesModelLoader`` (pre-quantized path): checkpoints produced by
HF ``bitsandbytes`` 4-bit serialization carry, per quantized weight W:

  W                                  uint8 [numel/2, 1] packed nibbles
  W.absmax                           per-block scales (uint8 if nested)
  W.quant_map                        16-entry nf4/fp4 codebook
  W.nested_absmax / W.nested_quant_map   double-quant tensors
  W.quant_state.bitsandbytes__nf4|fp4    JSON metadata (shape/blocksize)

TPU-native choice: dequantize to dense floats AT LOAD (the MXU wants
bf16 operands; nf4 has no TPU kernel tier and bnb checkpoints are small
by construction).  Runtime-requantization to the repo's fused int4 path
is the AWQ/GPTQ loaders' job; bnb's value here is checkpoint
compatibility.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np

# canonical NF4 codebook (bitsandbytes functional.py create_normal_map) —
# used only as a fallback when a checkpoint omits quant_map
NF4_CODE = np.asarray(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367,
        -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
        -0.09105003625154495, 0.0, 0.07958029955625534,
        0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
        0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
    ],
    np.float32,
)

_STATE_SUFFIXES = (
    ".absmax", ".quant_map", ".nested_absmax", ".nested_quant_map",
)


def is_bnb_sidecar(name: str) -> bool:
    return ".quant_state.bitsandbytes__" in name or name.endswith(
        _STATE_SUFFIXES
    )


def collect_bnb_states(files) -> Dict[str, Dict[str, Any]]:
    """Scan reader files for bnb 4-bit quant states.

    Returns {weight_name: state} where state holds the parsed JSON
    metadata plus the sidecar arrays needed by :func:`dequant_bnb_4bit`.
    """
    states: Dict[str, Dict[str, Any]] = {}
    for f in files:
        for nm in f.keys():
            if ".quant_state.bitsandbytes__" not in nm:
                continue
            wname, qtag = nm.split(".quant_state.bitsandbytes__")
            raw = np.asarray(f.get_tensor(nm), np.uint8)
            meta = json.loads(bytes(raw.tobytes()).decode("utf-8"))
            st: Dict[str, Any] = {"quant_type": qtag, "meta": meta}
            for suf in _STATE_SUFFIXES:
                key = wname + suf
                for g in files:
                    if key in g.keys():
                        st[suf[1:]] = np.asarray(g.get_tensor(key))
                        break
            states[wname] = st
    return states


def _dequant_absmax(st: Dict[str, Any]) -> np.ndarray:
    """Resolve per-block absmax, undoing double quantization if present."""
    absmax = st["absmax"]
    meta = st["meta"]
    nested = meta.get("nested_blocksize") or (
        "nested_absmax" in st and absmax.dtype == np.uint8
    )
    if not nested:
        return np.asarray(absmax, np.float32).reshape(-1)
    nb = int(meta.get("nested_blocksize", 256))
    offset = np.float32(meta.get("nested_offset", 0.0))
    codes = np.asarray(absmax, np.uint8).reshape(-1)
    qmap = np.asarray(st["nested_quant_map"], np.float32).reshape(-1)
    nmax = np.asarray(st["nested_absmax"], np.float32).reshape(-1)
    vals = qmap[codes]
    n = codes.size
    pad = -n % nb
    if pad:
        vals = np.pad(vals, (0, pad))
    vals = vals.reshape(-1, nb) * nmax[: vals.size // nb, None]
    return vals.reshape(-1)[:n] + offset


def dequant_bnb_4bit(packed: np.ndarray, st: Dict[str, Any]) -> np.ndarray:
    """Unpack + dequantize one bnb 4-bit weight to float32 [*shape]."""
    meta = st["meta"]
    shape = tuple(meta["shape"])
    blocksize = int(meta.get("blocksize", 64))
    numel = int(np.prod(shape))
    qmap = np.asarray(
        st.get("quant_map", NF4_CODE), np.float32
    ).reshape(-1)
    bytes_ = np.asarray(packed, np.uint8).reshape(-1)[: (numel + 1) // 2]
    nibbles = np.empty(bytes_.size * 2, np.uint8)
    nibbles[0::2] = bytes_ >> 4  # high nibble first (bnb layout)
    nibbles[1::2] = bytes_ & 0x0F
    vals = qmap[nibbles[:numel]]
    absmax = _dequant_absmax(st)
    pad = -numel % blocksize
    if pad:
        vals = np.pad(vals, (0, pad))
    vals = vals.reshape(-1, blocksize) * absmax[
        : vals.size // blocksize, None
    ]
    return vals.reshape(-1)[:numel].reshape(shape).astype(np.float32)


# --------------------------------------------------------------------------
# writer (tests + on-the-fly conversion): float -> bnb nf4 tensors
# --------------------------------------------------------------------------

def quantize_bnb_4bit(
    w: np.ndarray, name: str, *, blocksize: int = 64,
    nested: bool = True, nested_blocksize: int = 256,
) -> Dict[str, np.ndarray]:
    """Quantize a float weight into the bnb nf4 serialized tensor set.

    Inverse of :func:`dequant_bnb_4bit`; used by tests to build tiny
    pre-quantized checkpoints without the CUDA bitsandbytes package."""
    shape = list(w.shape)
    flat = np.asarray(w, np.float32).reshape(-1)
    numel = flat.size
    pad = -numel % blocksize
    if pad:
        flat = np.pad(flat, (0, pad))
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1).astype(np.float32)
    scaled = blocks / np.where(absmax[:, None] == 0, 1, absmax[:, None])
    codes = np.abs(
        scaled[:, :, None] - NF4_CODE[None, None, :]
    ).argmin(axis=2).astype(np.uint8)
    nib = codes.reshape(-1)[:numel]
    if numel % 2:
        nib = np.pad(nib, (0, 1))
    packed = ((nib[0::2] << 4) | nib[1::2]).astype(np.uint8)

    out = {
        name: packed.reshape(-1, 1),
        f"{name}.quant_map": NF4_CODE.copy(),
    }
    meta = {
        "blocksize": blocksize,
        "quant_type": "nf4",
        "shape": shape,
        "dtype": "bfloat16",
    }
    if nested:
        offset = np.float32(absmax.mean())
        centered = absmax - offset
        npad = -centered.size % nested_blocksize
        cb = np.pad(centered, (0, npad)).reshape(-1, nested_blocksize)
        nmax = np.abs(cb).max(axis=1).astype(np.float32)
        nscaled = cb / np.where(nmax[:, None] == 0, 1, nmax[:, None])
        # 8-bit linear codebook (bnb uses a dynamic map; a linear one is
        # a valid codebook choice — the map itself ships in the tensors)
        nmap = np.linspace(-1, 1, 256).astype(np.float32)
        ncodes = np.abs(
            nscaled[:, :, None] - nmap[None, None, :]
        ).argmin(axis=2).astype(np.uint8)
        out[f"{name}.absmax"] = ncodes.reshape(-1)[: absmax.size]
        out[f"{name}.nested_absmax"] = nmax
        out[f"{name}.nested_quant_map"] = nmap
        meta["nested_blocksize"] = nested_blocksize
        meta["nested_offset"] = float(offset)
    else:
        out[f"{name}.absmax"] = absmax
    out[f"{name}.quant_state.bitsandbytes__nf4"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), np.uint8
    ).copy()
    return out
