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
    """Routes generate() across a prefill engine and a decode engine.

    Lifecycle (reference ``disaggregation/prefill.py`` bootstrap/inflight
    queues + ``decode.py`` prealloc/transfer queues):

    * ``submit()`` registers the request with the DECODE scheduler first —
      its step loop polls the transfer (non-blocking), preallocates pages
      as soon as the meta frame lands, and adopts on completion — then
      kicks the prefill asynchronously.  The prefill scheduler's
      background sender streams page slabs while its loop keeps
      prefilling other requests, so many requests flow through PD
      concurrently and decode starts before the prefill engine drains.
    * ``generate()`` = submit + collect (the original synchronous API).
    """

    def __init__(self, prefill_engine, decode_engine,
                 transfer: Optional[KVTransferBackend] = None,
                 max_concurrent_prefills: int = 8):
        self.prefill = prefill_engine
        self.decode = decode_engine
        self.transfer = transfer or LocalKVTransfer()
        import concurrent.futures as _f

        self._pool = _f.ThreadPoolExecutor(
            max_workers=max_concurrent_prefills,
            thread_name_prefix="pd-prefill",
        )

    # -------------------------------------------------- async lifecycle
    def submit(self, prompt=None, input_ids=None, sampling_params=None):
        """Enqueue one request through the PD pipeline; returns a handle
        for :meth:`collect`.  Non-blocking past tokenization."""
        from sglang_tpu.core.sampling_params import SamplingParams

        sp = dict(sampling_params or {})
        if input_ids is None:
            input_ids = self.prefill.tokenizer.encode(prompt)
        input_ids = list(input_ids)
        room = new_room()

        # decode side first: registration precedes the transfer, so page
        # PREALLOCATION overlaps the network transfer (decode.py :1–18)
        state = self.decode._make_req(
            None, list(input_ids), SamplingParams.from_dict(dict(sp)),
            False, None,
        )
        receiver = getattr(self.transfer, "bootstrap", self.transfer)
        self.decode.scheduler.register_pd_incoming(state.req, room, receiver)

        def _prefill_and_send():
            p_sp = dict(sp)
            p_sp["max_new_tokens"] = 1
            p_sp["ignore_eos"] = True
            first = self.prefill.generate(
                input_ids=list(input_ids), sampling_params=p_sp
            )
            ft = int(first["output_ids"][0])
            meta = {"input_ids": list(input_ids), "first_token": ft}
            # radix lock + page list resolve on the prefill scheduler
            # thread; the slabs stream from its background sender
            self.prefill.scheduler.queue_pd_send(
                input_ids + [ft], room, self.transfer, meta
            )

        fut = self._pool.submit(_prefill_and_send)
        return {"state": state, "future": fut, "room": room}

    def collect(self, handle) -> dict:
        handle["future"].result()  # surface prefill-side errors
        return self.decode._wait_final(handle["state"])

    def generate(self, prompt=None, input_ids=None, sampling_params=None):
        return self.collect(
            self.submit(prompt=prompt, input_ids=input_ids,
                        sampling_params=sampling_params)
        )

    def shutdown(self):
        self._pool.shutdown(wait=False)

    @property
    def num_transferred_pages(self) -> int:
        return getattr(self.prefill.scheduler, "num_pd_pages_sent", 0)

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
