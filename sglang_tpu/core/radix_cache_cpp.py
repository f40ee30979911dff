"""ctypes binding for the native radix tree (csrc/radix_tree.cpp).

Equivalent role to the reference's ``mem_cache/radix_cache_cpp.py`` over
``cpp_radix_tree/tree_v2_binding.cpp`` — drop-in for
:class:`sglang_tpu.core.radix_cache.RadixCache` (same MatchResult/evict
contract), selected with ``--radix-cache-backend cpp``.

The shared library builds on first use with the system g++ (no pybind11 in
the image); the artifact is cached next to the source keyed by its hash.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Callable, List, Optional

import numpy as np

from sglang_tpu.core.radix_cache import MatchResult
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "radix_tree.cpp")
_LIB = None
_LIB_LOCK = threading.Lock()


def _build_and_load() -> ctypes.CDLL:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.abspath(_SRC)
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        build_dir = os.path.join(os.path.dirname(src), "build")
        os.makedirs(build_dir, exist_ok=True)
        so_path = os.path.join(build_dir, f"radix_tree_{digest}.so")
        if not os.path.exists(so_path):
            cmd = [
                "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                src, "-o", so_path,
            ]
            logger.info("building native radix tree: %s", " ".join(cmd))
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        c = ctypes.c_void_p
        i64 = ctypes.c_int64
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.rt_new.restype = c
        lib.rt_new.argtypes = [i64]
        lib.rt_delete.argtypes = [c]
        lib.rt_reset.argtypes = [c]
        lib.rt_match_prefix.restype = i64
        lib.rt_match_prefix.argtypes = [c, i32p, i64, i32p, i64, ctypes.POINTER(c)]
        lib.rt_insert.restype = i64
        lib.rt_insert.argtypes = [c, i32p, i64, i32p, i64]
        lib.rt_lock.argtypes = [c, c]
        lib.rt_unlock.argtypes = [c, c]
        lib.rt_evict.restype = i64
        lib.rt_evict.argtypes = [c, i64, i32p, i64]
        lib.rt_evictable.restype = i64
        lib.rt_evictable.argtypes = [c]
        lib.rt_protected.restype = i64
        lib.rt_protected.argtypes = [c]
        _LIB = lib
        return lib


def native_radix_available() -> bool:
    try:
        _build_and_load()
        return True
    except Exception as e:  # noqa: BLE001 — no compiler / build failure
        logger.warning("native radix tree unavailable: %s", e)
        return False


class RadixCacheCpp:
    """Same interface as core.radix_cache.RadixCache (node handles are
    opaque ints instead of TreeNode objects)."""

    def __init__(self, page_size: int = 1, disable: bool = False):
        self.lib = _build_and_load()
        self.page_size = page_size
        self.disable = disable
        self._tree = self.lib.rt_new(page_size)

    def __del__(self):
        try:
            if getattr(self, "_tree", None):
                self.lib.rt_delete(self._tree)
                self._tree = None
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    def reset(self):
        self.lib.rt_reset(self._tree)

    # ------------------------------------------------------------------ api
    def match_prefix(self, key: List[int]) -> MatchResult:
        if self.disable or not key:
            return MatchResult([], 0, None)
        arr = np.asarray(key, np.int32)
        cap = len(key) // self.page_size + 1
        out = np.empty((cap,), np.int32)
        node = ctypes.c_void_p()
        n = self.lib.rt_match_prefix(
            self._tree, arr, len(arr), out, cap, ctypes.byref(node)
        )
        return MatchResult(
            out[:n].tolist(), int(n) * self.page_size, node.value
        )

    def insert(self, key: List[int], pages: List[int]) -> int:
        if self.disable:
            return 0
        arr = np.asarray(key, np.int32)
        parr = np.asarray(pages, np.int32)
        matched = self.lib.rt_insert(self._tree, arr, len(arr), parr, len(parr))
        if matched < 0:
            raise AssertionError("child key collision with zero match")
        return int(matched)

    def inc_lock_ref(self, node: Optional[int]):
        if node:
            self.lib.rt_lock(self._tree, node)

    def dec_lock_ref(self, node: Optional[int]):
        if node:
            self.lib.rt_unlock(self._tree, node)

    def evict(self, num_pages: int, free_fn: Callable[[List[int]], None]) -> int:
        if self.disable:
            return 0
        cap = max(int(self.lib.rt_evictable(self._tree)), 1)
        out = np.empty((cap,), np.int32)
        n = self.lib.rt_evict(self._tree, num_pages, out, cap)
        if n > 0:
            free_fn(out[:n].tolist())
        return int(n)

    def evictable_size(self) -> int:
        return int(self.lib.rt_evictable(self._tree))

    def protected_size(self) -> int:
        return int(self.lib.rt_protected(self._tree))

    def total_cached_pages(self) -> int:
        return self.evictable_size() + self.protected_size()
