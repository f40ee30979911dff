"""Multi-host execution: leader/follower lockstep over jax.distributed.

Equivalent role to the reference's multi-node topology
(``entrypoints/engine.py:838`` — node_rank 0 runs the frontend, other
nodes run schedulers that must take IDENTICAL per-step batch decisions;
the reference broadcasts batch metadata over shm/ZMQ,
``scheduler_components/request_receiver.py:73``).

TPU-native version: every host joins one ``jax.distributed`` job and owns
a slice of the global mesh.  Under GSPMD, every process must enter the
SAME jitted computation each step, so:

* the LEADER (node 0) runs the full engine; its :class:`LeaderRunner`
  broadcasts a fixed-shape step descriptor + the packed host buffers
  before invoking each jitted step;
* FOLLOWERS run :func:`follower_loop`, reconstructing each call from the
  broadcast and invoking the same jit — the collective inserted by GSPMD
  pairs up across hosts.

``jax.experimental.multihost_utils.broadcast_one_to_all`` carries the
metadata (it requires identical pytree shapes on all hosts — descriptor
fields are fixed-size, buffer shapes derive from the descriptor).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

# step kinds
K_EXTEND, K_DECODE, K_VERIFY, K_SCORE, K_EMBED, K_STOP = range(6)
DESC_LEN = 12  # kind, B, L_or_K, P, all_greedy, use_pen, use_mask, tl_k, penW, spare…


def maybe_init_distributed(server_args) -> bool:
    """Join the jax.distributed job when running multi-node."""
    if server_args.nnodes <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=server_args.dist_init_addr,
        num_processes=server_args.nnodes,
        process_id=server_args.node_rank,
    )
    logger.info(
        "jax.distributed up: rank %d/%d, %d local / %d global devices",
        server_args.node_rank,
        server_args.nnodes,
        len(jax.local_devices()),
        len(jax.devices()),
    )
    return True


def _bcast(value, is_source: bool):
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(value, is_source=is_source)


class LeaderRunner:
    """ModelRunner proxy for node 0: broadcast, then execute."""

    def __init__(self, runner):
        self.runner = runner

    def __getattr__(self, name):  # passthrough for non-step attrs
        return getattr(self.runner, name)

    def _send(self, desc: np.ndarray, bufs):
        _bcast(desc.astype(np.int32), True)
        for b in bufs:
            _bcast(b, True)

    def extend_step(self, packed, st_packed, B, L, P, pen=None, vmask=None,
                    adapter_idx=None, tl_k=0):
        assert pen is None and vmask is None and adapter_idx is None, (
            "multi-host v1 broadcasts the base step set; penalties/grammar/"
            "LoRA buffers land with the follower protocol v2"
        )
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:8] = (K_EXTEND, B, L, P, 0, 0, 0, tl_k)
        self._send(desc, [packed.astype(np.int32), st_packed])
        return self.runner.extend_step(packed, st_packed, B, L, P, tl_k=tl_k)

    def decode_window(self, packed, st_packed, B, P, K, pen=None, vmask=None,
                      adapter_idx=None, tl_k=0):
        assert pen is None and vmask is None and adapter_idx is None
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:8] = (K_DECODE, B, K, P, 0, 0, 0, tl_k)
        self._send(desc, [packed.astype(np.int32), st_packed])
        return self.runner.decode_window(packed, st_packed, B, P, K, tl_k=tl_k)

    def verify_step(self, packed, B, L, P):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:8] = (K_VERIFY, B, L, P, 0, 0, 0, 0)
        self._send(desc, [packed.astype(np.int32)])
        return self.runner.verify_step(packed, B, L, P)

    def score_step(self, packed, targets, B, L, P):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:8] = (K_SCORE, B, L, P, 0, 0, 0, 0)
        self._send(desc, [packed.astype(np.int32), targets.astype(np.int32)])
        return self.runner.score_step(packed, targets, B, L, P)

    def embed_step(self, packed, B, L, P):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:8] = (K_EMBED, B, L, P, 0, 0, 0, 0)
        self._send(desc, [packed.astype(np.int32)])
        return self.runner.embed_step(packed, B, L, P)

    def stop_followers(self):
        _bcast(np.full(DESC_LEN, K_STOP, np.int32), True)


def follower_loop(runner):
    """Node rank > 0: replay the leader's step stream forever."""
    from sglang_tpu.layers.sampler import ST_COLS
    from sglang_tpu.model_executor.forward_batch import (
        decode_packed_size,
        extend_packed_size,
    )

    logger.info("follower loop started")
    while True:
        desc = np.asarray(_bcast(np.zeros(DESC_LEN, np.int32), False))
        kind, B, LK, P, _ag, _up, _um, tl_k = (int(x) for x in desc[:8])
        if kind == K_STOP:
            logger.info("follower loop stopping")
            return
        if kind == K_EXTEND:
            packed = np.asarray(_bcast(
                np.zeros(extend_packed_size(B, LK, P), np.int32), False))
            st = np.asarray(_bcast(np.zeros((B, ST_COLS), np.float32), False))
            runner.extend_step(packed, st, B, LK, P, tl_k=tl_k)
        elif kind == K_DECODE:
            packed = np.asarray(_bcast(
                np.zeros(decode_packed_size(B, P), np.int32), False))
            st = np.asarray(_bcast(np.zeros((B, ST_COLS), np.float32), False))
            runner.decode_window(packed, st, B, P, LK, tl_k=tl_k)
        elif kind == K_VERIFY:
            packed = np.asarray(_bcast(
                np.zeros(extend_packed_size(B, LK, P), np.int32), False))
            runner.verify_step(packed, B, LK, P)
        elif kind == K_SCORE:
            packed = np.asarray(_bcast(
                np.zeros(extend_packed_size(B, LK, P), np.int32), False))
            targets = np.asarray(_bcast(np.zeros((B, LK), np.int32), False))
            runner.score_step(packed, targets, B, LK, P)
        elif kind == K_EMBED:
            packed = np.asarray(_bcast(
                np.zeros(extend_packed_size(B, LK, P), np.int32), False))
            runner.embed_step(packed, B, LK, P)
        else:
            raise RuntimeError(f"unknown step kind {kind}")


def run_node(server_args, model_config=None):
    """Multi-node entry: leader returns an Engine; followers never return
    (reference engine.py:838 — non-zero node_rank blocks in the scheduler).
    """
    import jax

    maybe_init_distributed(server_args)
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    runner = ModelRunner(
        server_args, model_config=model_config, devices=jax.devices()
    )
    if server_args.node_rank == 0:
        if server_args.nnodes > 1:
            runner_proxy = LeaderRunner(runner)
        else:
            runner_proxy = runner
        return Engine(server_args=server_args, model_runner=runner_proxy)
    follower_loop(runner)
    return None
