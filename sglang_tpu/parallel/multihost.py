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

Protocol v2 broadcasts the FULL step argument set: penalty state,
grammar vocab bitmasks, LoRA adapter indices (+ adapter load/unload
control messages), and the chained-decode flag — every single-host
feature works identically across hosts.  Chained decode windows work
per-host: sampling is deterministic given the shared seed, so each
host's device-resident chain tokens are identical by construction.

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
(
    K_EXTEND, K_DECODE, K_VERIFY, K_SCORE, K_EMBED, K_STOP,
    K_LORA_LOAD, K_LORA_UNLOAD, K_DECODE_ASYNC, K_EPLB,
    K_EAGLE_EXTEND, K_EAGLE_DRAFT, K_EAGLE_VERIFY,
    K_EAGLE_TREE_DRAFT, K_EAGLE_TREE_VERIFY,
) = range(15)
DESC_LEN = 12  # kind, B, L_or_K, P, use_pen+penW, use_mask, use_lora, tl_k, use_chain, …
NAME_LEN = 256  # fixed-size utf-8 buffer for lora name/path broadcasts


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


def _encode_str(s: str) -> np.ndarray:
    b = s.encode()[: NAME_LEN - 1]
    arr = np.zeros(NAME_LEN, np.uint8)
    arr[: len(b)] = np.frombuffer(b, np.uint8)
    return arr


def _decode_str(arr: np.ndarray) -> str:
    b = bytes(arr.astype(np.uint8))
    return b.split(b"\x00", 1)[0].decode()


def _mask_width(runner) -> int:
    return (runner.model_config.vocab_size + 31) // 32


class LeaderRunner:
    """ModelRunner proxy for node 0: broadcast, then execute."""

    is_multihost_leader = True

    def __init__(self, runner):
        self.runner = runner

    def __getattr__(self, name):  # passthrough for non-step attrs
        return getattr(self.runner, name)

    def _send(self, desc: np.ndarray, bufs):
        _bcast(desc.astype(np.int32), True)
        for b in bufs:
            _bcast(b, True)

    def _opt_bufs(self, B, pen, vmask, adapter_idx):
        """Optional v2 buffers in a fixed order (desc flags tell the
        follower which to expect; pen width rides the descriptor)."""
        bufs = []
        if pen is not None:
            bufs.append(pen.astype(np.int32))
        if vmask is not None:
            bufs.append(vmask.astype(np.uint32))
        if adapter_idx is not None:
            bufs.append(adapter_idx.astype(np.int32))
        return bufs

    @staticmethod
    def _flags(pen, vmask, adapter_idx, tl_k, use_chain=0):
        pen_w = 0 if pen is None else pen.shape[1]
        return (
            (1 if pen is not None else 0) + (pen_w << 1),
            1 if vmask is not None else 0,
            1 if adapter_idx is not None else 0,
            tl_k,
            use_chain,
        )

    def extend_step(self, packed, st_packed, B, L, P, pen=None, vmask=None,
                    adapter_idx=None, embeds=None, tl_k=0,
                    capture_ecounts=False, return_async=False,
                    use_cp=False, use_tbo=False):
        # capture_ecounts broadcasts in the vmask flag's bit 1 so every
        # host compiles/executes the same extend variant; multimodal
        # embed rows broadcast as one [B, L, H] f32 buffer (the vision
        # tower runs only on the leader — protocol v3); use_tbo rides
        # bit 3 (in-program two-batch overlap is a compiled variant)
        desc = np.zeros(DESC_LEN, np.int32)
        # the use_chain flag slot carries use_cp for K_EXTEND (decode-only
        # vs extend-only flags share the wire slot; 2 = cp with a cached
        # prefix — a distinct compiled variant)
        flags = list(self._flags(pen, vmask, adapter_idx, tl_k,
                                 use_chain=int(use_cp)))
        flags[1] |= (1 if capture_ecounts else 0) << 1
        flags[1] |= (1 if embeds is not None else 0) << 2
        flags[1] |= (1 if use_tbo else 0) << 3
        desc[:9] = (K_EXTEND, B, L, P, *flags)
        bufs = [packed.astype(np.int32), st_packed] + self._opt_bufs(
            B, pen, vmask, adapter_idx
        )
        if embeds is not None:
            bufs.append(np.ascontiguousarray(embeds, np.float32))
        self._send(desc, bufs)
        return self.runner.extend_step(
            packed, st_packed, B, L, P, pen=pen, vmask=vmask,
            adapter_idx=adapter_idx, embeds=embeds, tl_k=tl_k,
            use_cp=use_cp, use_tbo=use_tbo,
            capture_ecounts=capture_ecounts, return_async=return_async,
        )

    def decode_window_async(self, packed, st_packed, B, P, K, pen=None,
                            vmask=None, adapter_idx=None, tl_k=0,
                            chain_tokens=None, fsm=None):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:9] = (K_DECODE_ASYNC, B, K, P,
                    *self._flags(pen, vmask, adapter_idx, tl_k,
                                 use_chain=1 if chain_tokens is not None else 0))
        bufs = [packed.astype(np.int32), st_packed] + self._opt_bufs(
            B, pen, vmask, adapter_idx
        )
        if fsm is not None:
            # device-FSM grammar tables (protocol v3): per-grammar
            # (mask_bits [Si, W], next_state [Si, V]) + state0 + bucket;
            # Si rides a length vector, W/V derive from the vocab
            parts, state0, bucket = fsm
            desc[9] = len(parts)
            desc[10] = bucket
            bufs.append(
                np.asarray([m.shape[0] for m, _ in parts], np.int32)
            )
            for m, nx in parts:
                bufs.append(np.asarray(m, np.uint32))
                bufs.append(np.asarray(nx, np.int32))
            bufs.append(np.asarray(state0, np.int32))
        self._send(desc, bufs)
        return self.runner.decode_window_async(
            packed, st_packed, B, P, K, pen=pen, vmask=vmask,
            adapter_idx=adapter_idx, tl_k=tl_k, chain_tokens=chain_tokens,
            fsm=fsm,
        )

    def decode_window_fetch(self, handle):
        return self.runner.decode_window_fetch(handle)

    def decode_window(self, *args, **kwargs):
        return self.decode_window_fetch(
            self.decode_window_async(*args, **kwargs)
        )

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

    # ---- LoRA control plane (adapters must load on every host; the
    # checkpoint path must exist on all nodes — shared FS, as in the
    # reference's multi-node LoRA) ----
    def broadcast_lora_load(self, name: str, path: str):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[0] = K_LORA_LOAD
        self._send(desc, [_encode_str(name), _encode_str(path)])

    def broadcast_lora_unload(self, name: str):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[0] = K_LORA_UNLOAD
        self._send(desc, [_encode_str(name)])

    def apply_expert_rebalance(self, perm: np.ndarray):
        """Coordinated EPLB rebalance (reference eplb_manager under EP):
        the permutation broadcasts so every host applies the identical
        expert reshuffle to its params shard."""
        desc = np.zeros(DESC_LEN, np.int32)
        desc[0] = K_EPLB
        desc[1:3] = perm.shape
        self._send(desc, [perm.astype(np.int32)])
        return self.runner.apply_expert_rebalance(perm)

    # ---- EAGLE speculative decoding (protocol v3). Draft RESULTS are
    # never broadcast: followers run the identical draft program on the
    # identical broadcast inputs with the shared seed, so their drafts /
    # q logits match the leader's bit-for-bit; each follower caches its
    # own last draft output and feeds it to the next verify.
    def eagle_extend_step(self, packed, st_packed, slot_idx, B, L, P):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:4] = (K_EAGLE_EXTEND, B, L, P)
        self._send(desc, [packed.astype(np.int32), st_packed,
                          slot_idx.astype(np.int32)])
        return self.runner.eagle_extend_step(
            packed, st_packed, slot_idx, B, L, P
        )

    def eagle_draft_window(self, dpacked, st_packed, B, A, P, K=None):
        # adaptive spec passes a per-round chain depth K (its own jit
        # bucket); 0 on the wire means "configured default"
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:5] = (K_EAGLE_DRAFT, B, A, P, 0 if K is None else K)
        self._send(desc, [dpacked.astype(np.int32), st_packed])
        return self.runner.eagle_draft_window(
            dpacked, st_packed, B, A, P, K=K
        )

    def eagle_verify_step(self, packed, st_packed, q_logits, drafts,
                          slot_idx, bootstrap, B, L, P, use_trunc=False):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:5] = (K_EAGLE_VERIFY, B, L, P, 1 if use_trunc else 0)
        self._send(desc, [packed.astype(np.int32), st_packed,
                          slot_idx.astype(np.int32),
                          bootstrap.astype(np.int32)])
        return self.runner.eagle_verify_step(
            packed, st_packed, q_logits, drafts, slot_idx, bootstrap,
            B, L, P, use_trunc=use_trunc,
        )

    def eagle_tree_draft_window(self, dpacked, st_packed, B, A, P, TB,
                                sampled=False):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:6] = (K_EAGLE_TREE_DRAFT, B, A, P, TB,
                    1 if sampled else 0)
        self._send(desc, [dpacked.astype(np.int32), st_packed])
        return self.runner.eagle_tree_draft_window(
            dpacked, st_packed, B, A, P, TB, sampled=sampled
        )

    def eagle_tree_verify_step(self, packed, src_page, dst_pages, slot_idx,
                               B, TB, L, P, st_packed=None, q0=None,
                               qc=None, drafts=None, bootstrap=None,
                               sampled=False, use_trunc=False):
        desc = np.zeros(DESC_LEN, np.int32)
        desc[:7] = (K_EAGLE_TREE_VERIFY, B, L, P, TB,
                    1 if sampled else 0, 1 if use_trunc else 0)
        bufs = [packed.astype(np.int32), src_page.astype(np.int32),
                dst_pages.astype(np.int32), slot_idx.astype(np.int32)]
        if st_packed is not None:
            bufs.append(st_packed)
        else:
            bufs.append(np.zeros((B, 8), np.float32))
        bufs.append(
            bootstrap.astype(np.int32)
            if bootstrap is not None
            else np.zeros((B,), np.int32)
        )
        self._send(desc, bufs)
        return self.runner.eagle_tree_verify_step(
            packed, src_page, dst_pages, slot_idx, B, TB, L, P,
            st_packed=st_packed, q0=q0, qc=qc, drafts=drafts,
            bootstrap=bootstrap, sampled=sampled, use_trunc=use_trunc,
        )

    def stop_followers(self):
        _bcast(np.full(DESC_LEN, K_STOP, np.int32), True)


def follower_loop(runner):
    """Node rank > 0: replay the leader's step stream forever."""
    from sglang_tpu.layers.sampler import ST_COLS
    from sglang_tpu.model_executor.forward_batch import (
        decode_packed_size,
        extend_packed_size,
    )

    logger.info("follower loop started (protocol v3)")
    mask_w = _mask_width(runner)
    last_handle = None
    last_draft = None  # (drafts, q_logits) from this host's chain draft
    last_tree = None  # (drafts, q0, qc) from this host's tree draft
    while True:
        desc = np.asarray(_bcast(np.zeros(DESC_LEN, np.int32), False))
        kind, B, LK, P, penf, um, ul, tl_k, uc = (int(x) for x in desc[:9])
        use_pen, pen_w = penf & 1, penf >> 1
        use_tbo = (um >> 3) & 1
        use_embeds = (um >> 2) & 1
        use_ecounts, um = (um >> 1) & 1, um & 1
        if kind == K_STOP:
            logger.info("follower loop stopping")
            return

        if kind in (K_EXTEND, K_DECODE, K_DECODE_ASYNC):
            _mr = getattr(runner.model, "needs_mrope", False)
            # hybrid-SWA arms identically on every host (same server
            # args + model), so the swa sections' presence agrees
            _swa = getattr(runner, "hybrid_swa", None) is not None
            size = (
                extend_packed_size(B, LK, P, mrope=_mr, swa=_swa)
                if kind == K_EXTEND
                else decode_packed_size(B, P, mrope=_mr, swa=_swa)
            )
            packed = np.asarray(_bcast(np.zeros(size, np.int32), False))
            st = np.asarray(_bcast(np.zeros((B, ST_COLS), np.float32), False))
            pen = vmask = adapter_idx = None
            if use_pen:
                pen = np.asarray(_bcast(
                    np.zeros((B, pen_w, 2), np.int32), False))
            if um:
                vmask = np.asarray(_bcast(
                    np.zeros((B, mask_w), np.uint32), False))
            if ul:
                adapter_idx = np.asarray(_bcast(np.zeros((B,), np.int32), False))
            embeds = None
            if kind == K_EXTEND and use_embeds:
                H = runner.model_config.hidden_size
                embeds = np.asarray(_bcast(
                    np.zeros((B, LK, H), np.float32), False))
            if kind == K_EXTEND:
                runner.extend_step(
                    packed, st, B, LK, P, pen=pen, vmask=vmask,
                    adapter_idx=adapter_idx, embeds=embeds, tl_k=tl_k,
                    use_cp=int(uc), use_tbo=bool(use_tbo),
                    capture_ecounts=bool(use_ecounts),
                )
            else:
                chain = (
                    last_handle[2] if (uc and last_handle is not None) else None
                )
                fsm = None
                n_fsm, fsm_bucket = int(desc[9]), int(desc[10])
                if n_fsm > 0:
                    V = runner.model_config.vocab_size
                    sizes = np.asarray(_bcast(
                        np.zeros((n_fsm,), np.int32), False))
                    parts = []
                    for si in sizes:
                        m = np.asarray(_bcast(
                            np.zeros((int(si), mask_w), np.uint32), False))
                        nx = np.asarray(_bcast(
                            np.zeros((int(si), V), np.int32), False))
                        parts.append((m, nx))
                    state0 = np.asarray(_bcast(
                        np.zeros((B,), np.int32), False))
                    fsm = (tuple(parts), state0, fsm_bucket)
                last_handle = runner.decode_window_async(
                    packed, st, B, P, LK, pen=pen, vmask=vmask,
                    adapter_idx=adapter_idx, tl_k=tl_k, chain_tokens=chain,
                    fsm=fsm,
                )
        elif kind == K_EAGLE_EXTEND:
            packed = np.asarray(_bcast(
                np.zeros(extend_packed_size(B, LK, P), np.int32), False))
            st = np.asarray(_bcast(np.zeros((B, ST_COLS), np.float32), False))
            slot_idx = np.asarray(_bcast(np.zeros((B,), np.int32), False))
            runner.eagle_extend_step(packed, st, slot_idx, B, LK, P)
        elif kind == K_EAGLE_DRAFT:
            size = B * LK + 3 * B + B * P
            dpacked = np.asarray(_bcast(np.zeros(size, np.int32), False))
            st = np.asarray(_bcast(np.zeros((B, ST_COLS), np.float32), False))
            last_draft = runner.eagle_draft_window(
                dpacked, st, B, LK, P, K=penf or None
            )
        elif kind == K_EAGLE_VERIFY:
            use_trunc = bool(penf)
            packed = np.asarray(_bcast(
                np.zeros(extend_packed_size(B, LK, P), np.int32), False))
            st = np.asarray(_bcast(np.zeros((B, ST_COLS), np.float32), False))
            slot_idx = np.asarray(_bcast(np.zeros((B,), np.int32), False))
            bootstrap = np.asarray(_bcast(np.zeros((B,), np.int32), False))
            drafts, q_logits = last_draft
            runner.eagle_verify_step(
                packed, st, q_logits, drafts, slot_idx, bootstrap,
                B, LK, P, use_trunc=use_trunc,
            )
        elif kind == K_EAGLE_TREE_DRAFT:
            TB, sampled = penf, bool(um)
            Bb = B * TB
            size = B * LK + 4 * B + B * P + Bb + Bb * P
            dpacked = np.asarray(_bcast(np.zeros(size, np.int32), False))
            st = np.asarray(_bcast(np.zeros((B, ST_COLS), np.float32), False))
            last_tree = runner.eagle_tree_draft_window(
                dpacked, st, B, LK, P, TB, sampled=sampled
            )
        elif kind == K_EAGLE_TREE_VERIFY:
            TB, sampled, use_trunc = penf, bool(um), bool(ul)
            Bb = B * TB
            packed = np.asarray(_bcast(
                np.zeros(extend_packed_size(Bb, LK, P), np.int32), False))
            src_page = np.asarray(_bcast(np.zeros((B,), np.int32), False))
            dst_pages = np.asarray(_bcast(np.zeros((Bb,), np.int32), False))
            slot_idx = np.asarray(_bcast(np.zeros((B,), np.int32), False))
            st = np.asarray(_bcast(np.zeros((B, ST_COLS), np.float32), False))
            bootstrap = np.asarray(_bcast(np.zeros((B,), np.int32), False))
            drafts, q0, qc = last_tree
            runner.eagle_tree_verify_step(
                packed, src_page, dst_pages, slot_idx, B, TB, LK, P,
                st_packed=st, q0=q0, qc=qc, drafts=drafts,
                bootstrap=bootstrap, sampled=sampled, use_trunc=use_trunc,
            )
        elif kind == K_EPLB:
            perm = np.asarray(_bcast(np.zeros((B, LK), np.int32), False))
            runner.apply_expert_rebalance(perm)
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
        elif kind == K_LORA_LOAD:
            name = _decode_str(np.asarray(_bcast(np.zeros(NAME_LEN, np.uint8), False)))
            path = _decode_str(np.asarray(_bcast(np.zeros(NAME_LEN, np.uint8), False)))
            runner.lora_manager.load_adapter(name, path)
        elif kind == K_LORA_UNLOAD:
            name = _decode_str(np.asarray(_bcast(np.zeros(NAME_LEN, np.uint8), False)))
            runner.lora_manager.unload_adapter(name)
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
    if (server_args.speculative_algorithm or "").lower() == "eagle":
        # mirror the leader scheduler's slot sizing so the EAGLE feature
        # pool / programs match across hosts (protocol v3 eagle steps)
        buckets = server_args.decode_bs_buckets or [
            1, 2, 4, 8, 16, 32, 64, 128, 256,
        ]
        buckets = [
            b for b in buckets
            if b <= max(server_args.max_running_requests, 1)
        ] or [server_args.max_running_requests]
        runner.init_eagle(
            server_args.speculative_num_draft_tokens,
            max(max(buckets), server_args.max_running_requests),
        )
    follower_loop(runner)
    return None
