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


def new_room() -> str:
    return uuid.uuid4().hex
