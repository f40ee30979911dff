"""Ray-mode process topology: the engine as a (Ray) actor.

Equivalent role to the reference's ``ray/`` (``scheduler_actor.py``,
actor-based ``http_server.py``): instead of owning the engine in the
serving process, requests go through an actor handle — Ray schedules
the actor onto a node with the accelerator, and any number of
lightweight frontends talk to it.

This module degrades gracefully: with ``ray`` installed the actor is a
real ``@ray.remote``; without it (this image has no ray) the same
interface is served by a thread-backed local actor, so the topology —
handle + futures, engine isolated behind message passing — is
preserved and testable.  ``create_engine_actor`` picks the backend.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

try:
    import ray  # noqa: F401

    HAS_RAY = True
except ImportError:
    HAS_RAY = False


class _EngineCore:
    """The actor body: owns the Engine (built lazily inside the actor
    process/thread so device init happens actor-side, as with Ray)."""

    def __init__(self, server_args=None, engine_factory=None):
        if engine_factory is not None:
            self.engine = engine_factory()
        else:
            from sglang_tpu.entrypoints.engine import Engine

            self.engine = Engine(server_args=server_args)

    def generate(self, **kw) -> Any:
        return self.engine.generate(**kw)

    def encode(self, *a, **kw) -> Any:
        return self.engine.encode(*a, **kw)

    def flush_cache(self) -> bool:
        return self.engine.flush_cache()

    def get_server_info(self) -> Dict:
        sched = self.engine.scheduler
        return {
            "num_steps": sched.num_steps,
            "num_generated_tokens": sched.num_generated_tokens,
        }

    def shutdown(self) -> None:
        self.engine.shutdown()


class LocalActorHandle:
    """Thread-backed stand-in for a Ray actor handle: every method call
    returns a Future resolved by the actor thread (same call discipline
    as ``handle.method.remote(...)``)."""

    def __init__(self, server_args=None, engine_factory=None):
        self._calls: "queue.Queue" = queue.Queue()
        self._ready = threading.Event()
        self._init_error: Optional[BaseException] = None

        def run():
            try:
                core = _EngineCore(server_args, engine_factory)
            except BaseException as e:  # surface to the creator
                self._init_error = e
                self._ready.set()
                return
            self._ready.set()
            while True:
                item = self._calls.get()
                if item is None:
                    break
                fut, name, args, kw = item
                try:
                    fut.set_result(getattr(core, name)(*args, **kw))
                except BaseException as e:
                    fut.set_exception(e)
                if name == "shutdown":
                    break

        self._thread = threading.Thread(
            target=run, name="engine-actor", daemon=True
        )
        self._thread.start()
        self._ready.wait()
        if self._init_error is not None:
            raise self._init_error

    def call(self, name: str, *args, **kw) -> Future:
        fut: Future = Future()
        self._calls.put((fut, name, args, kw))
        return fut

    # ray-handle-style sugar: handle.generate.remote(...)
    def __getattr__(self, name):
        class _Method:
            def __init__(self, handle, name):
                self._h, self._n = handle, name

            def remote(self, *a, **kw):
                return self._h.call(self._n, *a, **kw)

        return _Method(self, name)


def create_engine_actor(server_args=None, engine_factory=None,
                        prefer_ray: bool = True):
    """→ (handle, get) where ``handle.<method>.remote(...)`` returns a
    future and ``get(future)`` resolves it — identical call shape for
    the Ray and local backends."""
    if prefer_ray and HAS_RAY:
        import ray

        if not ray.is_initialized():
            ray.init(ignore_reinit_error=True)
        actor_cls = ray.remote(_EngineCore)
        handle = actor_cls.options(num_cpus=1).remote(
            server_args, engine_factory
        )
        return handle, ray.get
    if prefer_ray and not HAS_RAY:
        logger.info("ray not installed; using thread-backed local actor")
    handle = LocalActorHandle(server_args, engine_factory)
    return handle, lambda fut: fut.result(timeout=600)
