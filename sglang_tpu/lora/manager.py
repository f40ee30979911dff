"""Multi-LoRA batched serving (S-LoRA style).

Equivalent role to the reference's ``srt/lora/`` (``lora_manager.py:57``,
GPU pool ``mem_pool.py``, SGMV triton kernels) — TPU-native: adapters live
in fixed-shape stacked device arrays ``A [L, S, in, r] / B [L, S, r, out]``
(S = adapter slots, r padded to ``--max-lora-rank``), so one gather by the
per-request slot index + two einsums apply every adapter in the batch in
one program — no recompilation on load/unload (same shapes, new values).

Slot 0 is the reserved zero adapter (scaling 0) for requests without LoRA;
XLA's gather handles mixed batches natively.

PEFT checkpoint format: ``adapter_config.json`` (r, lora_alpha,
target_modules) + ``adapter_model.safetensors`` with
``...layers.<l>.<module>.lora_A.weight [r, in]`` / ``lora_B.weight
[out, r]``.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

LORA_MODULES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj",
)


class LoRAManager:
    def __init__(
        self,
        model_config,
        max_slots: int = 8,
        max_rank: int = 16,
        dtype=jnp.bfloat16,
    ):
        c = model_config
        self.config = c
        self.max_slots = max_slots + 1  # slot 0 = zero adapter
        self.max_rank = max_rank
        self.dtype = dtype
        H, I = c.hidden_size, c.intermediate_size
        hq, hkv, d = (
            c.num_attention_heads, c.num_key_value_heads, c.head_dim,
        )
        self.module_dims: Dict[str, Tuple[int, int]] = {
            "q_proj": (H, hq * d),
            "k_proj": (H, hkv * d),
            "v_proj": (H, hkv * d),
            "o_proj": (hq * d, H),
            "gate_proj": (H, I),
            "up_proj": (H, I),
            "down_proj": (I, H),
        }
        L, S, r = c.num_hidden_layers, self.max_slots, self.max_rank
        self._host_a = {
            m: np.zeros((L, S, din, r), np.float32)
            for m, (din, dout) in self.module_dims.items()
        }
        self._host_b = {
            m: np.zeros((L, S, r, dout), np.float32)
            for m, (din, dout) in self.module_dims.items()
        }
        self._scaling = np.zeros((S,), np.float32)
        self._names: Dict[str, int] = {}
        self._lock = threading.Lock()
        self._device_tree = None  # rebuilt lazily

    # ------------------------------------------------------------- loading
    def load_adapter(self, name: str, path: str) -> int:
        """Load a PEFT checkpoint into a free slot; returns the slot id."""
        from safetensors import safe_open

        with self._lock:
            if name in self._names:
                return self._names[name]
            slot = next(
                (
                    s
                    for s in range(1, self.max_slots)
                    if s not in self._names.values()
                ),
                None,
            )
            if slot is None:
                raise RuntimeError(
                    f"no free LoRA slots (max {self.max_slots - 1})"
                )
            # Reserve the slot under the lock BEFORE the slow unlocked
            # safetensors load: two concurrent loads must not pick the
            # same free slot and overwrite each other's weights.
            self._names[name] = slot

        try:
            with open(os.path.join(path, "adapter_config.json")) as f:
                cfg = json.load(f)
            r = int(cfg["r"])
            if r > self.max_rank:
                raise ValueError(
                    f"adapter rank {r} exceeds --max-lora-rank {self.max_rank}"
                )
            scaling = float(cfg.get("lora_alpha", r)) / r

            st_path = os.path.join(path, "adapter_model.safetensors")
            n_loaded = 0
            with safe_open(st_path, framework="numpy") as f:
                for key in f.keys():
                    parts = key.split(".")
                    if "layers" not in parts:
                        continue
                    li = int(parts[parts.index("layers") + 1])
                    mod = next((m for m in LORA_MODULES if m in parts), None)
                    if mod is None:
                        continue
                    tensor = f.get_tensor(key).astype(np.float32)
                    if "lora_A" in key:  # [r, in] → [in, r]
                        self._host_a[mod][li, slot, :, : tensor.shape[0]] = (
                            tensor.T
                        )
                        n_loaded += 1
                    elif "lora_B" in key:  # [out, r] → [r, out]
                        self._host_b[mod][li, slot, : tensor.shape[1], :] = (
                            tensor.T
                        )
                        n_loaded += 1
            if n_loaded == 0:
                raise ValueError(f"no LoRA tensors found in {st_path}")
        except Exception:
            with self._lock:
                if self._names.get(name) == slot:
                    del self._names[name]
                for m in LORA_MODULES:
                    self._host_a[m][:, slot] = 0
                    self._host_b[m][:, slot] = 0
            raise
        with self._lock:
            self._scaling[slot] = scaling
            self._device_tree = None
        logger.info(
            "Loaded LoRA %r (rank %d, scaling %.2f, %d tensors) → slot %d",
            name, r, scaling, n_loaded, slot,
        )
        return slot

    def unload_adapter(self, name: str):
        with self._lock:
            slot = self._names.pop(name, None)
            if slot is None:
                return
            for m in LORA_MODULES:
                self._host_a[m][:, slot] = 0
                self._host_b[m][:, slot] = 0
            self._scaling[slot] = 0.0
            self._device_tree = None

    def slot_of(self, name: Optional[str]) -> int:
        if not name:
            return 0
        slot = self._names.get(name)
        if slot is None:
            raise ValueError(f"LoRA adapter {name!r} is not loaded")
        return slot

    @property
    def loaded(self) -> List[str]:
        return sorted(self._names)

    # -------------------------------------------------------------- device
    def device_tree(self):
        """{'a': {mod: [L,S,in,r]}, 'b': {...}, 'scaling': [S]} on device."""
        with self._lock:
            if self._device_tree is None:
                self._device_tree = {
                    "a": {
                        m: jnp.asarray(v, self.dtype)
                        for m, v in self._host_a.items()
                    },
                    "b": {
                        m: jnp.asarray(v, self.dtype)
                        for m, v in self._host_b.items()
                    },
                    "scaling": jnp.asarray(self._scaling),
                }
            return self._device_tree


def lora_delta(x, A, B, idx, scaling):
    """x [B, Lq, din] · A[idx] [B, din, r] · B[idx] [B, r, dout] · scale.

    One gather per module + two MXU einsums — the whole mixed-adapter
    batch in a single program (reference: SGMV kernels, lora/triton_ops/).
    """
    A_sel = A[idx]  # [B, din, r]
    B_sel = B[idx]  # [B, r, dout]
    xa = jnp.einsum(
        "bli,bir->blr", x, A_sel, preferred_element_type=jnp.float32
    )
    d = jnp.einsum(
        "blr,bro->blo", xa.astype(B_sel.dtype), B_sel,
        preferred_element_type=jnp.float32,
    )
    return d * scaling[idx][:, None, None]
