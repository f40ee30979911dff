"""Request lifecycle object.

Equivalent role to the reference's ``managers/schedule_batch.py:666`` (Req):
origin ids, output ids, radix prefix handle, per-request KV page list,
finish state.  Token bookkeeping invariant:

* ``fill_ids``     = prompt tokens + generated tokens (KV targets)
* ``cached_len``   = tokens whose KV is already materialized (page-aligned
                     after a radix match; grows by chunk during chunked
                     prefill, by 1 per decode step)
* ``pages``        = page ids covering fill_ids[:ceil] — the prefix part is
                     shared/locked in the radix tree, the tail is owned by
                     this request until cached on finish.
"""

from __future__ import annotations

import enum
import time
from typing import Any, Dict, List, Optional

from sglang_tpu.core.sampling_params import SamplingParams


class ReqStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"
    ABORTED = "aborted"


class FinishReason(enum.Enum):
    NONE = None
    EOS = "stop"  # matched eos / stop token / stop string
    LENGTH = "length"  # hit max_new_tokens or context limit
    ABORT = "abort"


class Req:
    def __init__(
        self,
        rid: str,
        input_ids: List[int],
        sampling_params: SamplingParams,
        stream: bool = False,
        arrival_time: Optional[float] = None,
        lora_id: Optional[str] = None,
        return_logprob: bool = False,
        priority: Optional[int] = None,
        routing_key: Optional[str] = None,
    ):
        self.rid = rid
        self.origin_input_ids = list(input_ids)
        self.sampling_params = sampling_params
        self.stream = stream
        self.lora_id = lora_id  # adapter name
        self.lora_slot = 0  # resolved slot (0 = none)
        self.return_logprob = return_logprob or sampling_params.return_logprob
        # scheduling priority (reference schedule_batch.py Req.priority +
        # scheduler._set_or_validate_priority): only meaningful with
        # --enable-priority-scheduling; sign convention picked by
        # --schedule-low-priority-values-first
        self.priority = priority
        # DP / gateway routing affinity key (reference routing_key field):
        # requests with the same key land on the same replica so their
        # radix prefixes co-locate
        self.routing_key = routing_key

        # token state
        self.output_ids: List[int] = []
        self.fill_ids: List[int] = list(input_ids)
        self.cached_len = 0  # tokens with KV materialized
        self.output_logprobs: List[float] = []
        self.output_top_logprobs = (
            [] if sampling_params.top_logprobs_num > 0 else None
        )

        # KV / radix state
        self.pages: List[int] = []  # all pages in token order
        self.prefix_pages_len = 0  # leading pages that belong to the radix tree
        self.swa_freed = 0  # leading pages freed behind the sliding window
        # hybrid-SWA models: sliding layers' parallel page list (its own
        # id space; entries < swa_freed are back in the swa allocator)
        self.swa_pages: List[int] = []
        self.last_node = None  # radix lock handle
        self.cache_hit_tokens: Optional[int] = None  # prefix reuse at admission

        # lifecycle
        self.status = ReqStatus.WAITING
        self.finish_reason: FinishReason = FinishReason.NONE
        self.matched_stop: Optional[Any] = None

        # metrics
        self.arrival_time = arrival_time or time.monotonic()
        self.first_token_time: Optional[float] = None
        self.finish_time: Optional[float] = None
        self.retract_count = 0

        # constrained decoding state (constrained/token_fsm.GrammarState)
        self.grammar = None
        # speculative drafting state (speculative/ngram.NgramPredictor)
        self.spec_state = None
        # EAGLE per-request state (speculative/eagle.py): device feature
        # slot, tokens emitted last round but not yet draft-extended, and
        # whether the feature pool rows are fresh (False → bootstrap).
        self.spec_slot = -1
        self.spec_pending: List[int] = []
        self.spec_valid = False
        # scoring mode: max_new_tokens == 0 + return_logprob → input-token
        # logprobs only (reference: logprob_start_len / input_token_logprobs)
        self.input_logprobs = (
            [None] * len(self.fill_ids) if self.is_scoring else None
        )
        # embedding request (Engine.encode): pooled vector lands here
        self.is_embedding = False
        self.embedding = None
        # Diffusion-LM request (served block-wise by the scheduler's
        # dllm loop instead of the paged autoregressive path)
        self.is_diffusion = False
        self.dllm_canvas = None  # Optional[np.ndarray [L]] denoise state
        # multimodal: rows for sentinel prompt positions (fill_ids[j] < 0
        # means "use input_embeds[-fill_ids[j] - 1]" instead of the token
        # embedding; reference Req.input_embeds / multimodal inputs)
        self.input_embeds = None  # Optional[np.ndarray [n_embeds, H]]
        # M-RoPE (Qwen2-VL): 3-axis rotary positions for the prompt and
        # the decode offset (max prompt rope position + 1 - prompt len)
        self.mrope_positions = None  # Optional[np.ndarray [3, n_prompt]]
        self.mrope_delta = 0

        # streaming bookkeeping (tokens already sent to detokenizer)
        self.sent_output_len = 0

    # ------------------------------------------------------------- derived
    @property
    def seq_len(self) -> int:
        return len(self.fill_ids)

    @property
    def extend_len(self) -> int:
        """Tokens still needing KV materialization."""
        return len(self.fill_ids) - self.cached_len

    @property
    def is_prefill_done(self) -> bool:
        return self.cached_len >= len(self.origin_input_ids)

    @property
    def prefill_kind(self) -> str:
        if self.is_embedding:
            return "embed"
        if self.is_scoring:
            return "score"
        if self.is_diffusion:
            return "diffusion"
        return "generate"

    @property
    def is_scoring(self) -> bool:
        return (
            self.sampling_params.max_new_tokens == 0 and self.return_logprob
        )

    @property
    def finished(self) -> bool:
        return self.status in (ReqStatus.FINISHED, ReqStatus.ABORTED)

    def remaining_new_tokens(self) -> int:
        return self.sampling_params.max_new_tokens - len(self.output_ids)

    # ------------------------------------------------------------- actions
    def append_output_token(self, token_id: int, logprob: Optional[float] = None):
        self.output_ids.append(token_id)
        self.fill_ids.append(token_id)
        if logprob is not None:
            self.output_logprobs.append(logprob)
        if self.first_token_time is None:
            self.first_token_time = time.monotonic()

    def check_finished(self, eos_token_ids, context_limit: int) -> bool:
        """Stop-condition check after a decode step (token-level; stop
        strings are checked by the detokenizer side)."""
        if self.finished:
            return True
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self._finish(FinishReason.LENGTH)
            return True
        if self.seq_len >= context_limit:
            self._finish(FinishReason.LENGTH)
            return True
        if len(self.output_ids) < sp.min_new_tokens:
            return False
        last = self.output_ids[-1] if self.output_ids else None
        if last is not None:
            if not sp.ignore_eos and last in eos_token_ids:
                self._finish(FinishReason.EOS)
                self.matched_stop = last
                return True
            if last in sp.stop_token_ids_set:
                self._finish(FinishReason.EOS)
                self.matched_stop = last
                return True
        return False

    def _finish(self, reason: FinishReason):
        self.status = ReqStatus.FINISHED
        self.finish_reason = reason
        self.finish_time = time.monotonic()

    def abort(self):
        self.status = ReqStatus.ABORTED
        self.finish_reason = FinishReason.ABORT
        self.finish_time = time.monotonic()

    def reset_for_retract(self):
        """Return to the waiting queue after a decode-OOM retraction
        (reference schedule_batch.py:2473)."""
        self.status = ReqStatus.WAITING
        self.cached_len = 0
        self.pages = []
        self.swa_pages = []
        self.prefix_pages_len = 0
        self.last_node = None
        self.swa_freed = 0
        self.retract_count += 1

    def __repr__(self):
        return (
            f"Req({self.rid}, in={len(self.origin_input_ids)}, "
            f"out={len(self.output_ids)}, cached={self.cached_len}, "
            f"status={self.status.value})"
        )
