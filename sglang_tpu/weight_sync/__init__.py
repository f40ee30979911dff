"""Distributed weight sync: online trainer → inference weight updates.

Equivalent role to the reference's ``weight_sync/tensor_bucket.py`` +
``ModelRunner.init_weights_update_group`` (model_runner.py:2011) /
``update_weights_from_distributed`` (:2070) and the fleet orchestration
in ``checkpoint_engine/update.py:137`` — TPU-native transport:

The reference joins a temporary NCCL group with the trainer and receives
bucketed broadcasts.  There is no NCCL on TPU pods and the trainer is
usually a separate JAX/torch job, so the wire here is a plain TCP stream
(DCN): the trainer serves its current weights (:func:`serve_weights`),
and each inference replica pulls the tensors it wants
(:class:`WeightSyncClient`), applying them bucket-by-bucket while the
socket keeps streaming (reader-thread pipelining — the analogue of the
reference's bucketed broadcast overlap).

Wire protocol (little-endian):
    request : one JSON line  ``{"names": [...] | null}``  (null = all)
    records : u32 header_len | header JSON
              ``{"name", "dtype", "shape", "nbytes"}`` | raw bytes
    end     : header ``{"name": null}``
"""

from __future__ import annotations

import json
import queue
import socket
import struct
import threading
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

# flush boundary for the apply pipeline (reference tensor_bucket.py
# buckets broadcasts at ~512MB; the TCP stream has no hard boundary, the
# client just applies at this granularity while the socket reads ahead)
DEFAULT_BUCKET_BYTES = 256 << 20


def _send_record(sock: socket.socket, name: Optional[str],
                 arr: Optional[np.ndarray]) -> None:
    if name is None:
        hdr = json.dumps({"name": None}).encode()
        sock.sendall(struct.pack("<I", len(hdr)) + hdr)
        return
    arr = np.ascontiguousarray(arr)
    hdr = json.dumps(
        {
            "name": name,
            "dtype": arr.dtype.name,
            "shape": list(arr.shape),
            "nbytes": int(arr.nbytes),
        }
    ).encode()
    sock.sendall(struct.pack("<I", len(hdr)) + hdr)
    # byte view (ml_dtypes like bfloat16 reject the buffer protocol)
    sock.sendall(arr.reshape(-1).view(np.uint8))


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:], n - got)
        if r == 0:
            raise ConnectionError("weight sync peer closed mid-stream")
        got += r
    return bytes(buf)


def _recv_record(
    sock: socket.socket,
) -> Tuple[Optional[str], Optional[np.ndarray]]:
    (hlen,) = struct.unpack("<I", _recv_exact(sock, 4))
    hdr = json.loads(_recv_exact(sock, hlen))
    if hdr["name"] is None:
        return None, None
    import ml_dtypes  # noqa: F401 — registers bfloat16/fp8 numpy dtypes

    arr = np.frombuffer(
        _recv_exact(sock, hdr["nbytes"]), dtype=np.dtype(hdr["dtype"])
    ).reshape(hdr["shape"])
    return hdr["name"], arr


def serve_weights(
    tensors: "Dict[str, np.ndarray] | Callable[[], Dict[str, np.ndarray]]",
    port: int = 0,
    host: str = "127.0.0.1",
    max_requests: Optional[int] = None,
) -> Tuple[threading.Thread, int]:
    """Trainer-side broadcast server: serve the named tensors to any
    number of pulling inference replicas.  ``tensors`` may be a callable
    re-evaluated per request (live trainer state).  Returns the server
    thread and the bound port."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    bound_port = srv.getsockname()[1]

    def run():
        served = 0
        srv.settimeout(1.0)
        while max_requests is None or served < max_requests:
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                if max_requests is not None:
                    continue
                break
            except OSError:
                break
            try:
                req = json.loads(conn.makefile("rb").readline())
                current = tensors() if callable(tensors) else tensors
                names = req.get("names") or list(current.keys())
                for name in names:
                    _send_record(conn, name, np.asarray(current[name]))
                _send_record(conn, None, None)
            except Exception as e:
                logger.warning("weight sync serve error: %s", e)
            finally:
                conn.close()
                served += 1
        srv.close()

    th = threading.Thread(target=run, name="weight-sync-server", daemon=True)
    th.start()
    return th, bound_port


class WeightSyncClient:
    """Inference-side puller with reader-thread pipelining: the socket
    keeps streaming the next tensors while the caller applies the
    current ones to the device."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self.host, self.port, self.timeout = host, int(port), timeout

    def iter_tensors(
        self, names: Optional[List[str]] = None
    ) -> Iterable[Tuple[str, np.ndarray]]:
        sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout
        )
        sock.sendall((json.dumps({"names": names}) + "\n").encode())
        q: "queue.Queue" = queue.Queue(maxsize=8)

        def reader():
            try:
                while True:
                    name, arr = _recv_record(sock)
                    q.put((name, arr))
                    if name is None:
                        break
            except Exception as e:
                q.put(("__error__", e))
            finally:
                sock.close()

        th = threading.Thread(target=reader, daemon=True)
        th.start()
        while True:
            name, arr = q.get()
            if name is None:
                return
            if name == "__error__":
                raise arr
            yield name, arr
