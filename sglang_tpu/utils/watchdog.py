"""Forward-progress watchdog.

Equivalent role to the reference's ``utils/watchdog.py:24`` (soft watchdog
thread monitoring scheduler forward progress; hookup at scheduler.py:324).
Soft mode logs a stack dump of all threads; hard mode kills the process
(the reference's default when a TPU program wedges — a hung device program
never returns, so only the host can break the deadlock).
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class Watchdog:
    """Fires if ``heartbeat()`` isn't called for ``timeout`` seconds while
    work is in flight (``set_busy(True)``)."""

    def __init__(self, timeout: float = 300.0, hard: bool = True, name: str = "scheduler"):
        self.timeout = timeout
        self.hard = hard
        self.name = name
        self._last_beat = time.monotonic()
        self._busy = False
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self):
        if self.timeout <= 0:
            return
        self._thread = threading.Thread(
            target=self._run, name=f"watchdog-{self.name}", daemon=True
        )
        self._thread.start()

    def stop(self):
        self._stop.set()

    def heartbeat(self):
        self._last_beat = time.monotonic()

    def set_busy(self, busy: bool):
        self._busy = busy
        self._last_beat = time.monotonic()

    def _run(self):
        while not self._stop.wait(min(self.timeout / 4, 10.0)):
            if not self._busy:
                continue
            stall = time.monotonic() - self._last_beat
            if stall > self.timeout:
                logger.error(
                    "Watchdog %s: no forward progress for %.0fs "
                    "(timeout %.0fs) — dumping stacks",
                    self.name,
                    stall,
                    self.timeout,
                )
                faulthandler.dump_traceback(file=sys.stderr)
                if self.hard:
                    logger.error("Watchdog %s: killing process", self.name)
                    os._exit(1)
                self._last_beat = time.monotonic()  # soft: rearm
