"""Small shared utilities (logging, math helpers)."""

from __future__ import annotations

import logging
import os
import random
import sys

import numpy as np

_LOG_FORMAT = "[%(asctime)s %(levelname)s %(name)s] %(message)s"
_configured = False


def _configure_root():
    global _configured
    if _configured:
        return
    level = os.environ.get("SGLANG_TPU_LOG_LEVEL", "INFO").upper()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_LOG_FORMAT, datefmt="%H:%M:%S"))
    root = logging.getLogger("sglang_tpu")
    root.setLevel(level)
    root.addHandler(handler)
    root.propagate = False
    _configured = True


def get_logger(name: str) -> logging.Logger:
    _configure_root()
    if not name.startswith("sglang_tpu"):
        name = f"sglang_tpu.{name}"
    return logging.getLogger(name)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed & 0xFFFFFFFF)


def pick_bucket(x: int, buckets: list[int]) -> int:
    """Smallest bucket >= x; buckets must be sorted ascending."""
    for b in buckets:
        if b >= x:
            return b
    return buckets[-1]
