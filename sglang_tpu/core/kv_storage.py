"""KV storage tier backends (3rd cache level under device + host RAM).

Equivalent role to the reference's ``mem_cache/storage/`` backend zoo
(mooncake_store, nixl, hf3fs, lmcache, file, …) behind the
``HiCacheStorage`` interface, with the reference's async write-back
(``managers/cache_controller.py`` — storage IO must never block the
scheduler loop).

Backends here:
* :class:`FileKVStorage` — one file per page-run under a directory
  (the reference's ``storage/file`` backend; works over any shared FS,
  which is also the multi-host story: every host mounts the same path).
* :class:`AsyncStorageWriter` — background thread draining a put queue;
  the scheduler enqueues host-RAM page copies and moves on.
"""

from __future__ import annotations

import hashlib
import os
import queue
import threading
from typing import List, Optional

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def prefix_key(tokens: List[int]) -> str:
    """Stable content key for a token prefix."""
    h = hashlib.sha256(np.asarray(tokens, np.int64).tobytes()).hexdigest()
    return h[:32]


class KVStorageBackend:
    def put(self, key: str, data: np.ndarray) -> None:
        raise NotImplementedError

    def get(self, key: str) -> Optional[np.ndarray]:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError


class FileKVStorage(KVStorageBackend):
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key + ".npy")

    def put(self, key: str, data: np.ndarray) -> None:
        tmp = self._path(key) + ".tmp"
        np.save(tmp, data)
        os.replace(tmp + ".npy" if os.path.exists(tmp + ".npy") else tmp,
                   self._path(key))

    def get(self, key: str) -> Optional[np.ndarray]:
        p = self._path(key)
        if not os.path.exists(p):
            return None
        try:
            return np.load(p)
        except Exception:
            return None

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def delete(self, key: str) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass


class AsyncStorageWriter:
    """Write-behind queue: puts run on a daemon thread (reference
    HiCacheController's write threads, cache_controller.py:209)."""

    def __init__(self, backend: KVStorageBackend, max_queue: int = 64):
        self.backend = backend
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._pending = set()
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            key, data = item
            try:
                self.backend.put(key, data)
            except Exception:
                logger.exception("storage put failed for %s", key)
            finally:
                with self._lock:
                    self._pending.discard(key)

    def put_async(self, key: str, data: np.ndarray) -> bool:
        """False when the queue is full (caller skips the backup)."""
        with self._lock:
            if key in self._pending:
                return True
            self._pending.add(key)
        try:
            self._q.put_nowait((key, data))
            return True
        except queue.Full:
            with self._lock:
                self._pending.discard(key)
            return False

    def in_flight(self, key: str) -> bool:
        with self._lock:
            return key in self._pending

    def flush(self, timeout: float = 10.0):
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                if not self._pending:
                    return
            time.sleep(0.005)

    def close(self):
        self._q.put(None)
