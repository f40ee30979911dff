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


class HTTPKVStorage(KVStorageBackend):
    """Remote KV-pool client over plain HTTP (the role of the
    reference's mooncake_store / lmcache / nixl connectors: a shared
    cache cluster that outlives any one engine).  Wire format: raw
    little-endian float bytes with dtype/shape in headers; stdlib
    urllib only.  Pair with :class:`KVStorageServer` or any object
    store speaking PUT/GET/HEAD/DELETE."""

    def __init__(self, base_url: str, timeout: float = 5.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def _url(self, key: str) -> str:
        return f"{self.base}/kv/{key}"

    def put(self, key: str, data: np.ndarray) -> None:
        import urllib.request

        data = np.ascontiguousarray(data)
        req = urllib.request.Request(
            self._url(key), data=data.tobytes(), method="PUT",
            headers={
                "X-Dtype": str(data.dtype),
                "X-Shape": ",".join(str(d) for d in data.shape),
            },
        )
        urllib.request.urlopen(req, timeout=self.timeout).read()

    def get(self, key: str) -> Optional[np.ndarray]:
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(
                urllib.request.Request(self._url(key)),
                timeout=self.timeout,
            ) as r:
                dtype = np.dtype(r.headers["X-Dtype"])
                shape = tuple(
                    int(x) for x in r.headers["X-Shape"].split(",") if x
                )
                return np.frombuffer(r.read(), dtype).reshape(shape)
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise
        except OSError:
            return None

    def exists(self, key: str) -> bool:
        import urllib.error
        import urllib.request

        try:
            urllib.request.urlopen(
                urllib.request.Request(self._url(key), method="HEAD"),
                timeout=self.timeout,
            ).read()
            return True
        except urllib.error.HTTPError:
            return False
        except OSError:
            return False

    def delete(self, key: str) -> None:
        import urllib.error
        import urllib.request

        try:
            urllib.request.urlopen(
                urllib.request.Request(self._url(key), method="DELETE"),
                timeout=self.timeout,
            ).read()
        except (urllib.error.HTTPError, OSError):
            pass


class KVStorageServer:
    """In-memory KV-pool server for :class:`HTTPKVStorage` — the
    standalone "remote cache cluster" process (run:
    ``python -m sglang_tpu.core.kv_storage --port N``)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        import http.server

        store = self.store = {}

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _key(self):
                return self.path.rsplit("/", 1)[-1]

            def do_PUT(self):
                n = int(self.headers.get("Content-Length", 0))
                store[self._key()] = (
                    self.rfile.read(n),
                    self.headers.get("X-Dtype", "uint8"),
                    self.headers.get("X-Shape", ""),
                )
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def _found(self, head_only: bool):
                ent = store.get(self._key())
                if ent is None:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body, dtype, shape = ent
                self.send_response(200)
                self.send_header("X-Dtype", dtype)
                self.send_header("X-Shape", shape)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if not head_only:
                    self.wfile.write(body)

            def do_GET(self):
                self._found(False)

            def do_HEAD(self):
                self._found(True)

            def do_DELETE(self):
                store.pop(self._key(), None)
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        import socketserver

        class Srv(socketserver.ThreadingMixIn, http.server.HTTPServer):
            daemon_threads = True

        self.httpd = Srv((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def close(self):
        self.httpd.shutdown()


def make_storage_backend(spec: str) -> KVStorageBackend:
    """Backend factory: ``http://host:port`` → HTTPKVStorage, anything
    else → FileKVStorage directory (reference backend registry role)."""
    if spec.startswith(("http://", "https://")):
        return HTTPKVStorage(spec)
    return FileKVStorage(spec)


if __name__ == "__main__":
    import argparse
    import time as _time

    ap = argparse.ArgumentParser(description="standalone KV-pool server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=30100)
    a = ap.parse_args()
    srv = KVStorageServer(a.host, a.port)
    print(f"kv storage server on {a.host}:{srv.port}", flush=True)
    while True:
        _time.sleep(60)
