"""KV transfer backends for prefill/decode disaggregation.

Equivalent role to the reference's ``disaggregation/base/conn.py`` ABC
(:87–219) with its backend zoo (mooncake RDMA, nixl, mori, **fake**).
On TPU pods the production transport is DCN device-to-device transfers
between slices; this module defines the interface plus:

* ``LocalKVTransfer`` — in-process handoff (the reference's
  ``fake/conn.py``: lets the full PD flow run on one host for tests and
  for colocated prefill/decode engines).
"""

from __future__ import annotations

import threading
import uuid
from typing import Dict, Optional

import numpy as np


class KVTransferBackend:
    """Sender side registers page payloads under a room id; the receiver
    polls and claims them (reference bootstrap-room rendezvous)."""

    def send(self, room: str, payload: dict) -> None:
        raise NotImplementedError

    def poll(self, room: str) -> Optional[dict]:
        raise NotImplementedError


class LocalKVTransfer(KVTransferBackend):
    def __init__(self):
        self._rooms: Dict[str, dict] = {}
        self._lock = threading.Lock()

    def send(self, room: str, payload: dict) -> None:
        with self._lock:
            self._rooms[room] = payload

    def poll(self, room: str) -> Optional[dict]:
        with self._lock:
            return self._rooms.pop(room, None)

    def poll_meta(self, room: str) -> Optional[dict]:
        with self._lock:
            p = self._rooms.get(room)
            return dict(p) if p is not None else None


def new_room() -> str:
    return uuid.uuid4().hex


# ---------------------------------------------------------------------------
# Real transport: TCP bootstrap server + chunk-pipelined sender
# (reference disaggregation/mooncake/conn.py — MooncakeKVSender/Receiver
# :153/:1715/:1814 over RDMA with the MooncakeKVBootstrapServer :1958
# rendezvous; on TPU pods the production link is DCN, modeled here as a
# byte-stream socket with the same room/bootstrap protocol.)
# ---------------------------------------------------------------------------

import json as _json
import socket
import struct


def _send_msg(sock: socket.socket, header: dict, blobs) -> None:
    h = _json.dumps(header).encode()
    sock.sendall(struct.pack("<I", len(h)))
    sock.sendall(h)
    for b in blobs:
        sock.sendall(struct.pack("<Q", len(b)))
        sock.sendall(b)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("peer closed during transfer")
        buf += chunk
    return bytes(buf)


def _recv_msg(sock: socket.socket):
    (hlen,) = struct.unpack("<I", _recv_exact(sock, 4))
    header = _json.loads(_recv_exact(sock, hlen))
    blobs = []
    for _ in range(header.get("n_blobs", 0)):
        (blen,) = struct.unpack("<Q", _recv_exact(sock, 8))
        blobs.append(_recv_exact(sock, blen))
    return header, blobs


class KVBootstrapServer:
    """Decode-side rendezvous: accepts prefill connections, reassembles
    chunked page payloads per room (reference bootstrap server :1958)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.host, self.port = self._sock.getsockname()
        self._rooms: Dict[str, dict] = {}
        self._partial: Dict[str, dict] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _serve_conn(self, conn: socket.socket):
        try:
            with conn:
                while True:
                    try:
                        header, blobs = _recv_msg(conn)
                    except ConnectionError:
                        return
                    self._handle(header, blobs)
        except Exception:
            pass

    def _handle(self, header: dict, blobs):
        room = header["room"]
        kind = header["kind"]
        with self._lock:
            if kind == "meta":
                self._partial[room] = {
                    "meta": header["meta"],
                    "n_chunks": header["n_chunks"],
                    "chunks": {},
                }
            elif kind == "chunk":
                part = self._partial[room]
                arr = None
                if blobs:
                    arr = np.frombuffer(
                        blobs[0], dtype=np.dtype(header["dtype"])
                    ).reshape(header["shape"])
                part["chunks"][header["index"]] = arr
            if room in self._partial:
                part = self._partial[room]
                if len(part["chunks"]) == part["n_chunks"]:
                    payload = dict(part["meta"])
                    if part["n_chunks"] > 0:
                        payload["page_data"] = np.concatenate(
                            [part["chunks"][i] for i in range(part["n_chunks"])]
                        )
                    else:
                        payload["page_data"] = None
                    self._rooms[room] = payload
                    del self._partial[room]

    # receiver-side poll (KVTransferBackend surface)
    def poll(self, room: str) -> Optional[dict]:
        with self._lock:
            return self._rooms.pop(room, None)

    def poll_meta(self, room: str) -> Optional[dict]:
        """Room metadata as soon as the META frame lands (chunks may still
        be streaming) — lets the decode scheduler PREALLOCATE pages while
        the transfer is in flight (reference decode.py PreallocQueue)."""
        with self._lock:
            part = self._partial.get(room)
            if part is not None:
                return dict(part["meta"])
            done = self._rooms.get(room)
            return dict(done) if done is not None else None

    def wait(self, room: str, timeout: float = 60.0) -> Optional[dict]:
        import time as _time

        deadline = _time.monotonic() + timeout
        while _time.monotonic() < deadline:
            p = self.poll(room)
            if p is not None:
                return p
            _time.sleep(0.005)
        return None

    def close(self):
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass


class TcpKVTransfer(KVTransferBackend):
    """Prefill-side sender streaming to a KVBootstrapServer.

    ``send_pipelined`` ships page slabs in chunks: while chunk i streams
    over the socket, chunk i+1 is being extracted from the device —
    transfer overlaps the device→host reads (the reference's
    layer-overlapped send, scheduler.py:3231, adapted to page-slab
    granularity)."""

    def __init__(self, host: str, port: int, chunk_pages: int = 8):
        self.addr = (host, port)
        self.chunk_pages = chunk_pages
        self._sock = None
        self._lock = threading.Lock()

    def _conn(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection(self.addr, timeout=30)
        return self._sock

    def send(self, room: str, payload: dict) -> None:
        payload = dict(payload)
        data = payload.pop("page_data", None)
        with self._lock:
            s = self._conn()
            chunks = []
            if data is not None and len(data):
                cp = max(self.chunk_pages, 1)
                chunks = [data[i : i + cp] for i in range(0, len(data), cp)]
            _send_msg(s, {"room": room, "kind": "meta", "meta": payload,
                          "n_chunks": len(chunks), "n_blobs": 0}, [])
            for i, c in enumerate(chunks):
                c = np.ascontiguousarray(c)
                _send_msg(s, {
                    "room": room, "kind": "chunk", "index": i,
                    "dtype": c.dtype.name, "shape": list(c.shape),
                    "n_blobs": 1,
                }, [memoryview(c).cast("B")])

    def send_pipelined(self, room: str, meta: dict, extract_chunk, n_pages: int) -> None:
        """Stream chunks produced by ``extract_chunk(start, count)`` —
        extraction of chunk i+1 overlaps the socket send of chunk i."""
        cp = max(self.chunk_pages, 1)
        starts = list(range(0, n_pages, cp))
        with self._lock:
            s = self._conn()
            _send_msg(s, {"room": room, "kind": "meta", "meta": meta,
                          "n_chunks": len(starts), "n_blobs": 0}, [])
            import concurrent.futures as _f

            with _f.ThreadPoolExecutor(max_workers=1) as pool:
                nxt = pool.submit(extract_chunk, starts[0],
                                  min(cp, n_pages - starts[0])) if starts else None
                for i, st in enumerate(starts):
                    c = nxt.result()
                    if i + 1 < len(starts):
                        st2 = starts[i + 1]
                        nxt = pool.submit(
                            extract_chunk, st2, min(cp, n_pages - st2)
                        )
                    c = np.ascontiguousarray(c)
                    _send_msg(s, {
                        "room": room, "kind": "chunk", "index": i,
                        "dtype": c.dtype.name, "shape": list(c.shape),
                        "n_blobs": 1,
                    }, [memoryview(c).cast("B")])

    def poll(self, room: str) -> Optional[dict]:
        raise RuntimeError("TcpKVTransfer is sender-side; poll the bootstrap")

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None


class RemoteKVTransfer(KVTransferBackend):
    """Paired sender+receiver for a coordinator that owns both ends
    (single-process tests / colocated engines over real sockets)."""

    def __init__(self, bootstrap: KVBootstrapServer, chunk_pages: int = 8):
        self.bootstrap = bootstrap
        self.sender = TcpKVTransfer(
            bootstrap.host, bootstrap.port, chunk_pages
        )

    def send(self, room: str, payload: dict) -> None:
        self.sender.send(room, payload)

    def send_pipelined(self, *a, **k):
        self.sender.send_pipelined(*a, **k)

    def poll(self, room: str) -> Optional[dict]:
        return self.bootstrap.wait(room, timeout=60.0)

    def poll_meta(self, room: str) -> Optional[dict]:
        return self.bootstrap.poll_meta(room)
