"""Typed environment-variable registry.

Equivalent role to the reference's ``python/sglang/srt/environ.py`` (descriptor
based ``EnvBool/EnvInt/EnvStr/EnvFloat`` fields, ~435 vars): every env var the
runtime reads is declared here once, typed, with a default — so flags are
discoverable and typo-proof.  Access pattern: ``envs.SGLANG_TPU_LOG_LEVEL.get()``
or simply ``envs.SGLANG_TPU_LOG_LEVEL.value``.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Generic, TypeVar

T = TypeVar("T")


class EnvField(Generic[T]):
    def __init__(self, default: T, parse: Callable[[str], T]):
        self.default = default
        self.parse = parse
        self.name: str = ""  # set by __set_name__

    def __set_name__(self, owner, name):
        self.name = name

    def get(self) -> T:
        raw = os.environ.get(self.name)
        if raw is None:
            return self.default
        try:
            return self.parse(raw)
        except (ValueError, TypeError):
            raise ValueError(
                f"Invalid value {raw!r} for env var {self.name}"
            ) from None

    @property
    def value(self) -> T:
        return self.get()

    def is_set(self) -> bool:
        return self.name in os.environ

    def set(self, value: Any) -> None:
        os.environ[self.name] = str(value)

    def clear(self) -> None:
        os.environ.pop(self.name, None)


def _parse_bool(raw: str) -> bool:
    return raw.strip().lower() in ("1", "true", "yes", "on")


def EnvBool(default: bool) -> EnvField[bool]:
    return EnvField(default, _parse_bool)


def EnvInt(default: int) -> EnvField[int]:
    return EnvField(default, int)


def EnvFloat(default: float) -> EnvField[float]:
    return EnvField(default, float)


def EnvStr(default: str) -> EnvField[str]:
    return EnvField(default, str)


class Envs:
    # --- logging / debug ---
    SGLANG_TPU_LOG_LEVEL = EnvStr("INFO")
    SGLANG_TPU_DEBUG_SCHEDULER = EnvBool(False)
    SGLANG_TPU_STRICT_MEM_CHECK = EnvBool(False)  # scheduler memory invariants

    # --- scheduling knobs (reference: SGLANG_INIT_NEW_TOKEN_RATIO etc.) ---
    SGLANG_TPU_INIT_NEW_TOKEN_RATIO = EnvFloat(0.7)
    SGLANG_TPU_MIN_NEW_TOKEN_RATIO_FACTOR = EnvFloat(0.14)
    SGLANG_TPU_NEW_TOKEN_RATIO_DECAY_STEPS = EnvFloat(600)
    SGLANG_TPU_RETRACT_DECODE_STEPS = EnvInt(20)
    SGLANG_TPU_CLIP_MAX_NEW_TOKENS = EnvInt(4096)

    # --- runtime ---
    SGLANG_TPU_DISABLE_JIT_CACHE_WARMUP = EnvBool(False)
    SGLANG_TPU_COMPILE_LOG = EnvBool(False)
    SGLANG_TPU_FORCE_XLA_ATTENTION = EnvBool(False)  # disable Pallas kernels
    SGLANG_TPU_INTERPRET_PALLAS = EnvBool(False)  # pallas interpreter mode
    # keep the HF per-projection weight stacks at execution time instead
    # of fusing q/k/v into one [L, H, (hq+2hkv)*d] dot (debug escape hatch)
    SGLANG_TPU_NO_FUSED_EXEC = EnvBool(False)

    # --- testing ---
    SGLANG_TPU_TEST_NUM_CPU_DEVICES = EnvInt(8)

    def all_fields(self) -> dict[str, EnvField]:
        return {
            k: v for k, v in type(self).__dict__.items() if isinstance(v, EnvField)
        }


envs = Envs()
