"""Data-parallel replica controller.

Equivalent role to the reference's ``managers/data_parallel_controller.py``
(:715 — dispatches requests across ``dp_size`` replica schedulers,
round-robin or shortest-queue).  TPU-native: each replica is an in-process
Engine over a disjoint device slice of the same host (one JAX process
drives all local chips), so dispatch is a method call instead of ZMQ.
"""

from __future__ import annotations

import itertools
from typing import List, Optional

import jax

from sglang_tpu.entrypoints.engine import Engine
from sglang_tpu.model_executor.model_runner import ModelRunner
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class DataParallelController:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config=None,
        devices: Optional[List] = None,
        policy: str = "round_robin",  # round_robin | shortest_queue
    ):
        assert policy in ("round_robin", "shortest_queue")
        self.policy = policy
        dp = server_args.dp_size
        devices = list(devices if devices is not None else jax.devices())
        per = len(devices) // dp
        assert per >= server_args.tp_size * server_args.pp_size, (
            f"need {dp}x{server_args.tp_size * server_args.pp_size} devices, "
            f"have {len(devices)}"
        )
        self.engines: List[Engine] = []
        for r in range(dp):
            import dataclasses

            rep_args = dataclasses.replace(server_args, dp_size=1)
            runner = ModelRunner(
                rep_args,
                model_config=model_config,
                devices=devices[r * per : (r + 1) * per],
            )
            self.engines.append(
                Engine(server_args=rep_args, model_runner=runner)
            )
        self._rr = itertools.count()
        logger.info("DP controller: %d replicas x %d devices", dp, per)

    # ----------------------------------------------------------- dispatch
    def _pick(self, routing_key=None) -> Engine:
        if routing_key:
            # routing affinity (reference Req.routing_key): a stable
            # hash pins same-key requests to one replica so their radix
            # prefixes co-locate
            import zlib

            h = zlib.crc32(str(routing_key).encode())
            return self.engines[h % len(self.engines)]
        if self.policy == "round_robin":
            return self.engines[next(self._rr) % len(self.engines)]
        # shortest queue: waiting + running (reference shortest-queue mode)
        def load(e: Engine) -> int:
            st = e.scheduler.stats()
            return st["num_waiting"] + st["num_running"]

        return min(self.engines, key=load)

    def generate(self, *args, **kwargs):
        return self._pick(kwargs.get("routing_key")).generate(
            *args, **kwargs
        )

    async def async_generate(self, *args, **kwargs):
        return await self._pick(kwargs.get("routing_key")).async_generate(
            *args, **kwargs
        )

    def encode(self, *args, **kwargs):
        return self._pick().encode(*args, **kwargs)

    def stats(self) -> List[dict]:
        return [e.scheduler.stats() for e in self.engines]

    def shutdown(self):
        for e in self.engines:
            e.shutdown()
