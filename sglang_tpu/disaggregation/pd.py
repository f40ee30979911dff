"""Prefill/decode disaggregation coordinator.

Equivalent role to the reference's ``disaggregation/prefill.py`` +
``decode.py`` request lifecycle (bootstrap → prefill → KV transfer →
decode prealloc → decode loop; prefill.py:1–18) — v1 on one host:

* The PREFILL engine runs the prompt with ``max_new_tokens=1``, then
  extracts the request's KV pages (whole-page slabs, all layers) and
  ships them + the first token through a :class:`KVTransferBackend`.
* The DECODE engine preallocates pages, injects the slabs, and adopts the
  request directly into its running batch (``Scheduler.adopt_prefilled``).

Multi-host TPU: the same flow with a DCN transfer backend between pod
slices replaces ``LocalKVTransfer`` (the reference uses RDMA/mooncake).
"""

from __future__ import annotations

import time
from typing import List, Optional

from sglang_tpu.disaggregation.conn import (
    KVTransferBackend,
    LocalKVTransfer,
    new_room,
)
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class PDCoordinator:
    """Routes generate() across a prefill engine and a decode engine."""

    def __init__(self, prefill_engine, decode_engine,
                 transfer: Optional[KVTransferBackend] = None):
        self.prefill = prefill_engine
        self.decode = decode_engine
        self.transfer = transfer or LocalKVTransfer()
        self.num_transferred_pages = 0

    def generate(self, prompt=None, input_ids=None, sampling_params=None):
        sp = dict(sampling_params or {})
        if input_ids is None:
            input_ids = self.prefill.tokenizer.encode(prompt)

        # ---- phase 1: prefill engine computes the prompt + first token
        p_sp = dict(sp)
        p_sp["max_new_tokens"] = 1
        p_sp["ignore_eos"] = True
        first = self.prefill.generate(input_ids=list(input_ids),
                                      sampling_params=p_sp)
        first_token = first["output_ids"][0]

        # ---- phase 2: extract this prompt's KV pages and ship them.
        # With a pipelining-capable transport, chunk i+1's device→host
        # extraction overlaps chunk i's network send (reference
        # layer-overlapped KV send, scheduler.py:3231).
        sched = self.prefill.scheduler
        m = sched.radix.match_prefix(list(input_ids) + [first_token])
        n_tokens = m.matched_tokens
        pages = m.pages
        room = new_room()
        meta = {
            "input_ids": list(input_ids),
            "first_token": int(first_token),
            "kv_tokens": int(n_tokens),
        }
        if pages and hasattr(self.transfer, "send_pipelined"):
            self.transfer.send_pipelined(
                room, meta,
                lambda start, count: sched.runner.extract_pages(
                    pages[start : start + count]
                ),
                len(pages),
            )
        else:
            payload = dict(meta)
            payload["page_data"] = (
                sched.runner.extract_pages(pages) if pages else None
            )
            self.transfer.send(room, payload)
        self.num_transferred_pages += len(pages)

        # ---- phase 3: decode engine receives and continues
        payload = self.transfer.poll(room)
        assert payload is not None, "transfer rendezvous failed"
        # The transferred first token counts toward the decode request's
        # output_ids, so max_new_tokens carries over unchanged.
        return self.decode_from_transfer(payload, dict(sp))

    def decode_from_transfer(self, payload: dict, sampling_params: dict):
        """Decode-side: inject KV, adopt the request mid-stream."""
        from sglang_tpu.core.req import Req
        from sglang_tpu.core.sampling_params import SamplingParams

        eng = self.decode
        sp = SamplingParams.from_dict(sampling_params)
        input_ids = payload["input_ids"]
        first_token = payload["first_token"]

        state = eng._make_req(None, list(input_ids), sp, False, None)
        req = state.req
        req.append_output_token(first_token)
        eng.scheduler.add_transferred_request(
            req, payload["kv_tokens"], payload["page_data"]
        )
        return eng._wait_final(state)
