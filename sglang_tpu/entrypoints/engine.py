"""Engine: the in-process serving API.

Equivalent role to the reference's ``entrypoints/engine.py:183`` (Engine) +
``managers/tokenizer_manager.py`` (tokenize → schedule → demux streamed
outputs back to per-request queues).

TPU-native topology: one JAX process drives every chip of the replica
(single controller), so the tokenizer frontend, scheduler, and detokenizer
run as threads of one process — the scheduler thread owns the device; the
ZMQ multi-process split of the reference (engine.py:763) only matters for
multi-host, which coordinates via jax.distributed instead.
"""

from __future__ import annotations

import asyncio
import queue
import threading
import time
import uuid

import numpy as np
from typing import Any, AsyncIterator, Dict, Iterator, List, Optional, Union

from sglang_tpu.core.req import Req
from sglang_tpu.core.sampling_params import SamplingParams
from sglang_tpu.core.scheduler import Scheduler
from sglang_tpu.model_executor.model_runner import ModelRunner
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.tokenizer_utils import (
    IncrementalDetokenizer,
    StopStringChecker,
    get_tokenizer,
)
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class _ReqState:
    def __init__(self, req: Req, tokenizer, sp: SamplingParams):
        self.req = req
        self.detok = (
            IncrementalDetokenizer(
                tokenizer, skip_special_tokens=sp.skip_special_tokens
            )
            if tokenizer is not None
            else None
        )
        self.stop_checker = StopStringChecker(sp.stop_strs)
        self.queue: "queue.Queue" = queue.Queue()
        self.async_queue: Optional[asyncio.Queue] = None
        self.loop: Optional[asyncio.AbstractEventLoop] = None
        self.finished = False
        self.text = ""

    def push(self, item: dict):
        if self.async_queue is not None and self.loop is not None:
            self.loop.call_soon_threadsafe(self.async_queue.put_nowait, item)
        else:
            self.queue.put(item)


class Engine:
    def __init__(
        self,
        server_args: Optional[ServerArgs] = None,
        model_runner: Optional[ModelRunner] = None,
        tokenizer=None,
        **kwargs,
    ):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        self.server_args = server_args
        from sglang_tpu.plugins import load_plugins

        load_plugins(server_args)  # reference entrypoints/engine.py:212

        if tokenizer is not None:
            self.tokenizer = tokenizer
        elif server_args.tokenizer_path:
            self.tokenizer = get_tokenizer(
                server_args.tokenizer_path, server_args.trust_remote_code
            )
        else:
            self.tokenizer = None

        # multimodal: vision tower + projector for VLM checkpoints
        # (reference multimodal_processor.py); built after the scheduler
        # exposes the model config — safetensors loads only
        self.mm_processor = None

        from sglang_tpu.constrained import GrammarManager

        self.grammar_manager = (
            GrammarManager(self.tokenizer) if self.tokenizer is not None else None
        )
        self.lora_manager = None
        self.scheduler = Scheduler(
            server_args,
            model_runner=model_runner,
            output_callback=self._on_scheduler_updates,
        )
        self._states: Dict[str, _ReqState] = {}
        self._states_lock = threading.Lock()
        # request tracing + /start_profile → jax.profiler bridge
        # (reference observability/trace.py, profiler_manager.py)
        self._tracer = None
        if server_args.enable_request_tracing:
            from sglang_tpu.observability.trace import get_tracer

            self._tracer = get_tracer()
        from sglang_tpu.observability.trace import ProfilerController

        self.profiler = ProfilerController()
        # multi-turn sessions: sid → token history (KV reuse comes from the
        # radix cache; reference session_controller keeps KV explicitly)
        self._sessions: Dict[str, List[int]] = {}

        if server_args.enable_lora:
            from sglang_tpu.lora import LoRAManager

            self.lora_manager = LoRAManager(
                self.scheduler.runner.model_config,
                max_slots=server_args.max_loras_per_batch,
                max_rank=server_args.max_lora_rank,
                dtype=self.scheduler.runner.model_config.dtype,
            )
            self.scheduler.runner.lora_manager = self.lora_manager

        cfg = self.scheduler.runner.model_config
        if any("Llava" in a for a in cfg.architectures) and (
            server_args.load_format in ("auto", "safetensors")
        ):
            from sglang_tpu.multimodal import MultimodalProcessor

            self.mm_processor = MultimodalProcessor(
                cfg.hf_config, server_args.model_path
            )
            logger.info(
                "Multimodal processor ready (%d patches per image)",
                self.mm_processor.n_patches,
            )
        elif any(
            "Qwen3VL" in a for a in cfg.architectures
        ) and server_args.load_format in ("auto", "safetensors"):
            from sglang_tpu.multimodal.qwen_vl import Qwen3VLProcessor

            self.mm_processor = Qwen3VLProcessor(
                cfg.hf_config, server_args.model_path
            )
            logger.info(
                "Qwen3-VL processor ready (deepstack x%d)",
                self.mm_processor.deepstack_layers,
            )
        elif any(
            "Qwen2VL" in a or "Qwen2_5_VL" in a for a in cfg.architectures
        ) and server_args.load_format in ("auto", "safetensors"):
            if any("Qwen2_5_VL" in a for a in cfg.architectures):
                from sglang_tpu.multimodal.qwen_vl import Qwen25VLProcessor

                self.mm_processor = Qwen25VLProcessor(
                    cfg.hf_config, server_args.model_path
                )
            else:
                from sglang_tpu.multimodal.qwen_vl import QwenVLProcessor

                self.mm_processor = QwenVLProcessor(
                    cfg.hf_config, server_args.model_path
                )
            logger.info("Qwen-VL processor ready (dynamic resolution)")
        elif any(
            "Gemma3ForConditionalGeneration" in a
            for a in cfg.architectures
        ) and server_args.load_format in ("auto", "safetensors"):
            from sglang_tpu.multimodal.gemma3 import Gemma3Processor

            self.mm_processor = Gemma3Processor(
                cfg.hf_config, server_args.model_path
            )
            logger.info(
                "Gemma3 processor ready (%d tokens per image)",
                self.mm_processor.n_patches,
            )
        elif any(
            "Mistral3" in a for a in cfg.architectures
        ) and server_args.load_format in ("auto", "safetensors"):
            from sglang_tpu.multimodal.pixtral import Mistral3Processor

            self.mm_processor = Mistral3Processor(
                cfg.hf_config, server_args.model_path
            )
            logger.info("Mistral3/Pixtral processor ready")
        elif any(
            "Idefics3" in a or "SmolVLM" in a for a in cfg.architectures
        ) and server_args.load_format in ("auto", "safetensors"):
            from sglang_tpu.multimodal.idefics3 import Idefics3Processor

            self.mm_processor = Idefics3Processor(
                cfg.hf_config, server_args.model_path
            )
            logger.info(
                "Idefics3/SmolVLM processor ready (%d tokens per image)",
                self.mm_processor.n_patches,
            )
        elif any(
            "InternVL" in a for a in cfg.architectures
        ) and server_args.load_format in ("auto", "safetensors"):
            from sglang_tpu.multimodal.internvl import InternVLProcessor

            self.mm_processor = InternVLProcessor(
                cfg.hf_config, server_args.model_path
            )
            logger.info(
                "InternVL processor ready (%d tokens per image)",
                self.mm_processor.n_patches,
            )

        # PD-over-HTTP roles (reference --disaggregation-mode): the
        # decode engine hosts the KV bootstrap rendezvous; prefill
        # engines stream page slabs to it per bootstrap_room.
        self.pd_bootstrap = None
        self._pd_transfers: Dict[str, Any] = {}
        if server_args.disaggregation_mode == "decode":
            from sglang_tpu.disaggregation.conn import KVBootstrapServer

            self.pd_bootstrap = KVBootstrapServer(
                host=server_args.host, port=server_args.pd_bootstrap_port
            )
            logger.info(
                "PD decode role: KV bootstrap on %s:%d",
                self.pd_bootstrap.host, self.pd_bootstrap.port,
            )

        self._sched_thread = threading.Thread(
            target=self.scheduler.event_loop, name="scheduler", daemon=True
        )
        self._sched_thread.start()
        logger.info("Engine ready (model=%s)", server_args.model_path)

    # ------------------------------------------------------- PD over HTTP
    def pd_prefill_request(
        self, input_ids, sampling_params, room: str, bootstrap_addr: str
    ) -> dict:
        """Prefill role: compute the prompt + first token, then stream
        the KV pages to the decode engine's bootstrap server (the
        scheduler's background sender overlaps further prefills)."""
        sp = dict(sampling_params or {})
        sp["max_new_tokens"] = 1
        sp["ignore_eos"] = True
        first = self.generate(input_ids=list(input_ids), sampling_params=sp)
        ft = int(first["output_ids"][0])
        host, port = bootstrap_addr.rsplit(":", 1)
        key = bootstrap_addr
        transfer = self._pd_transfers.get(key)
        if transfer is None:
            from sglang_tpu.disaggregation.conn import TcpKVTransfer

            transfer = TcpKVTransfer(host, int(port), chunk_pages=8)
            self._pd_transfers[key] = transfer
        self.scheduler.queue_pd_send(
            list(input_ids) + [ft], room, transfer,
            {"input_ids": list(input_ids), "first_token": ft},
        )
        return {"first_token": ft, "bootstrap_room": room}

    def pd_decode_request(
        self, prompt, input_ids, sampling_params, room: str,
        stream: bool = False, rid=None,
    ):
        """Decode role: register the incoming transfer with the
        scheduler (pages prealloc on the meta frame, adoption on
        completion) and serve like a normal request."""
        assert self.pd_bootstrap is not None, "not a PD decode engine"
        state = self._make_req(
            prompt, input_ids, sampling_params, stream, rid
        )
        self.scheduler.register_pd_incoming(
            state.req, room, self.pd_bootstrap
        )
        if stream:
            return self._stream_iter(state)
        return self._wait_final(state)

    # ----------------------------------------------------------- lifecycle
    def shutdown(self):
        self.scheduler.shutdown()
        self._sched_thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    # ------------------------------------------------------------- helpers
    def _make_req(
        self,
        prompt: Optional[str],
        input_ids: Optional[List[int]],
        sampling_params: Union[None, dict, SamplingParams],
        stream: bool,
        rid: Optional[str],
        lora_path: Optional[str] = None,
        images=None,
        videos=None,
        priority: Optional[int] = None,
        routing_key: Optional[str] = None,
    ) -> _ReqState:
        if (
            priority is not None
            and not self.server_args.enable_priority_scheduling
        ):
            # reference scheduler._set_or_validate_priority: a priority
            # on a server without priority scheduling is an error, not
            # a silent no-op
            raise ValueError(
                "request has a priority but --enable-priority-scheduling "
                "is off"
            )
        if isinstance(sampling_params, SamplingParams):
            sp = sampling_params
        else:
            sp = SamplingParams.from_dict(sampling_params)
        if input_ids is None:
            assert prompt is not None, "need prompt or input_ids"
            assert self.tokenizer is not None, "no tokenizer configured"
            input_ids = self.tokenizer.encode(prompt)
        input_embeds = None
        if images or videos:
            if self.mm_processor is None:
                raise ValueError(
                    "media given but the model has no vision tower"
                )
            if videos and images:
                raise NotImplementedError(
                    "mixed images + videos in one request"
                )
            if videos:
                if not hasattr(self.mm_processor, "encode_videos"):
                    raise ValueError(
                        "videos given but the processor has no video path"
                    )
                input_embeds = self.mm_processor.encode_videos(videos)
                n_media = len(videos)
            else:
                input_embeds = self.mm_processor.encode_images(images)
                n_media = len(images)
            input_ids = self.mm_processor.expand_prompt(
                list(input_ids), n_media
            )
        if len(input_ids) == 0:
            raise ValueError("input must contain at least one token")
        if self.scheduler.dead:
            raise RuntimeError(
                "engine scheduler has crashed; see logs for the traceback"
            )
        rid = rid or uuid.uuid4().hex
        req = Req(
            rid=rid,
            input_ids=input_ids,
            sampling_params=sp,
            stream=stream,
            return_logprob=sp.return_logprob,
            lora_id=lora_path,
            priority=priority,
            routing_key=routing_key,
        )
        if lora_path:
            if self.lora_manager is None:
                raise ValueError("lora_path given but --enable-lora is off")
            req.lora_slot = self.lora_manager.slot_of(lora_path)
        if (
            getattr(self.scheduler.runner.model, "is_diffusion", False)
            and sp.max_new_tokens > 0
        ):
            # diffusion LMs serve through the scheduler's block-wise
            # denoise loop instead of the paged autoregressive path
            req.is_diffusion = True
        if getattr(self.scheduler.runner.model, "is_encoder_only", False):
            # BERT-family encoders only embed — every request routes
            # through the embedding path regardless of entrypoint
            req.is_embedding = True
        if input_embeds is not None:
            req.input_embeds = input_embeds
            if getattr(self.mm_processor, "needs_mrope", False):
                # Qwen2-VL: 3-axis rotary positions for the expanded
                # prompt + the decode offset (HF get_rope_index)
                req.mrope_positions, req.mrope_delta = (
                    self.mm_processor.mrope_positions(list(input_ids))
                )
        if sp.regex or sp.json_schema or sp.ebnf:
            if self.grammar_manager is None:
                raise ValueError("constrained decoding requires a tokenizer")
            req.grammar = self.grammar_manager.create_state(sp)
        state = _ReqState(req, self.tokenizer, sp)
        if self._tracer is not None:
            state.span = self._tracer.start_span(
                "request", trace_id=rid,
                prompt_tokens=len(req.origin_input_ids),
            )
        with self._states_lock:
            self._states[rid] = state
        return state

    def _on_scheduler_updates(self, updates: List[dict]):
        for upd in updates:
            rid = upd["rid"]
            with self._states_lock:
                state = self._states.get(rid)
            if state is None or state.finished:
                continue
            finished = upd["finished"]
            if state.detok is not None:
                if finished:
                    state.detok.update(upd["output_ids"])
                    state.detok.flush()
                else:
                    state.detok.update(upd["output_ids"])
                state.text = state.detok.text
                # stop-string check
                hit = state.stop_checker.check(state.text)
                if hit is not None:
                    pos, matched = hit
                    state.text = state.text[:pos]
                    upd = dict(upd)
                    upd["finished"] = True
                    upd["finish_reason"] = "stop"
                    upd["matched_stop"] = matched
                    finished = True
                    self.scheduler.abort_request(rid)
            out = self._format_output(state, upd)
            state.finished = finished
            state.push(out)
            if finished:
                if self._tracer is not None and getattr(state, "span", None):
                    self._tracer.end_span(
                        state.span,
                        completion_tokens=upd.get("completion_tokens", 0),
                        finish_reason=upd.get("finish_reason"),
                    )
                with self._states_lock:
                    self._states.pop(rid, None)

    def _format_output(self, state: _ReqState, upd: dict) -> dict:
        finish_reason = None
        if upd["finished"]:
            finish_reason = {"type": upd["finish_reason"] or "abort"}
            if upd.get("matched_stop") is not None:
                finish_reason["matched"] = upd["matched_stop"]
        meta = {
            "id": upd["rid"],
            "finish_reason": finish_reason,
            "prompt_tokens": upd["prompt_tokens"],
            "completion_tokens": upd["completion_tokens"],
            "cached_tokens": upd["cached_tokens"],
        }
        if upd.get("embedding") is not None:
            meta["embedding"] = upd["embedding"]
        if upd.get("input_logprobs") is not None:
            ids = state.req.origin_input_ids
            meta["input_token_logprobs"] = [
                (lp, tid, None)
                for lp, tid in zip(upd["input_logprobs"], ids)
            ]
        if upd.get("output_logprobs") is not None:
            meta["output_token_logprobs"] = [
                (lp, tid, None)
                for lp, tid in zip(upd["output_logprobs"], upd["output_ids"])
            ]
        if upd.get("output_top_logprobs") is not None:
            meta["output_top_logprobs"] = [
                [(lp, tid, None) for lp, tid in step]
                for step in upd["output_top_logprobs"]
            ]
        # While streaming (unfinished), hold back len(longest stop)-1 chars
        # so a stop string split across two updates is never partially
        # surfaced to the client (reference detokenizer holdback).
        text = state.text
        if not upd["finished"] and state.stop_checker.max_len > 1:
            text = text[: max(0, len(text) - (state.stop_checker.max_len - 1))]
        return {
            "text": text,
            "output_ids": upd["output_ids"],
            "meta_info": meta,
            "finished": upd["finished"],
        }

    # ------------------------------------------------------------ sync API
    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Union[None, dict, SamplingParams] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        stream: bool = False,
        rid: Optional[str] = None,
        lora_path: Optional[str] = None,
        images=None,  # list of PIL images / [H, W, 3] arrays (VLMs)
        videos=None,  # list of videos ([F, H, W, 3] or frame lists)
        priority: Optional[int] = None,
        routing_key: Optional[str] = None,
    ):
        """Synchronous generation (reference Engine.generate,
        entrypoints/engine.py:247). Accepts a single prompt or a batch."""
        # Batch mode
        if isinstance(prompt, list) or (
            input_ids is not None
            and input_ids
            and isinstance(input_ids[0], list)
        ):
            prompts = prompt if prompt is not None else [None] * len(input_ids)
            ids_list = input_ids if input_ids is not None else [None] * len(prompts)
            states = [
                self._make_req(p, ids, sampling_params, False, None, lora_path,
                               priority=priority, routing_key=routing_key)
                for p, ids in zip(prompts, ids_list)
            ]
            for s in states:
                self.scheduler.add_request(s.req)
            return [self._wait_final(s) for s in states]

        state = self._make_req(
            prompt, input_ids, sampling_params, stream, rid, lora_path,
            images=images, videos=videos, priority=priority,
            routing_key=routing_key,
        )
        self.scheduler.add_request(state.req)
        if stream:
            return self._stream_iter(state)
        return self._wait_final(state)

    def _wait_final(self, state: _ReqState) -> dict:
        while True:
            out = state.queue.get()
            if out["finished"]:
                return out

    def _stream_iter(self, state: _ReqState) -> Iterator[dict]:
        while True:
            out = state.queue.get()
            yield out
            if out["finished"]:
                return

    # ----------------------------------------------------------- async API
    async def async_generate(
        self,
        prompt: Optional[str] = None,
        sampling_params: Union[None, dict, SamplingParams] = None,
        input_ids: Optional[List[int]] = None,
        stream: bool = False,
        rid: Optional[str] = None,
        lora_path: Optional[str] = None,
        images=None,
        videos=None,
        priority: Optional[int] = None,
        routing_key: Optional[str] = None,
    ):
        state = self._make_req(
            prompt, input_ids, sampling_params, stream, rid, lora_path,
            images=images, videos=videos, priority=priority,
            routing_key=routing_key,
        )
        state.loop = asyncio.get_running_loop()
        state.async_queue = asyncio.Queue()
        self.scheduler.add_request(state.req)
        if stream:
            return self._astream_iter(state)
        while True:
            out = await state.async_queue.get()
            if out["finished"]:
                return out

    async def _astream_iter(self, state: _ReqState) -> AsyncIterator[dict]:
        while True:
            out = await state.async_queue.get()
            yield out
            if out["finished"]:
                return

    # ----------------------------------------------------------- encode
    def encode(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
    ):
        """Embedding API (reference Engine.encode / /v1/embeddings):
        last-token pooled, L2-normalized hidden state."""
        if isinstance(prompt, list) or (
            input_ids is not None and input_ids and isinstance(input_ids[0], list)
        ):
            prompts = prompt if prompt is not None else [None] * len(input_ids)
            ids_list = input_ids if input_ids is not None else [None] * len(prompts)
            states = []
            for p, ids in zip(prompts, ids_list):
                st = self._make_req(p, ids, {"max_new_tokens": 0}, False, None)
                st.req.is_embedding = True
                self.scheduler.add_request(st.req)
                states.append(st)
            return [self._wait_final(s) for s in states]
        state = self._make_req(prompt, input_ids, {"max_new_tokens": 0}, False, None)
        state.req.is_embedding = True
        self.scheduler.add_request(state.req)
        return self._wait_final(state)

    # ------------------------------------------------------------ sessions
    def open_session(self, session_id: Optional[str] = None) -> str:
        """Reference /open_session (http_server.py:1465)."""
        sid = session_id or uuid.uuid4().hex
        if sid in self._sessions:
            raise ValueError(f"session {sid!r} already open")
        self._sessions[sid] = []
        return sid

    def close_session(self, session_id: str):
        self._sessions.pop(session_id, None)

    def generate_in_session(
        self,
        session_id: str,
        prompt: Optional[str] = None,
        input_ids: Optional[List[int]] = None,
        sampling_params=None,
    ) -> dict:
        """Append a turn to the session; the accumulated history is the
        prompt, so the radix cache serves all prior turns' KV."""
        history = self._sessions.get(session_id)
        if history is None:
            raise ValueError(f"unknown session {session_id!r}")
        if input_ids is None:
            assert prompt is not None and self.tokenizer is not None
            input_ids = self.tokenizer.encode(prompt)
        full = history + list(input_ids)
        out = self.generate(input_ids=full, sampling_params=sampling_params)
        self._sessions[session_id] = full + out["output_ids"]
        return out

    # ----------------------------------------------------------- diffusion
    def diffusion_generate(
        self,
        prompt=None,
        input_ids=None,
        gen_len: int = 64,
        steps=None,
        temperature: float = 0.0,
        block_len=None,
        seed: int = 0,
    ):
        """LLaDA-style masked-diffusion generation (reference dllm/):
        the whole denoise loop runs as one device program; runs on the
        scheduler thread so it never races paged serving steps."""
        runner = self.scheduler.runner
        if not getattr(runner.model, "is_diffusion", False):
            raise ValueError("model is not a diffusion LM")
        if getattr(self, "_dllm", None) is None:
            from sglang_tpu.dllm import DllmAlgorithm

            self._dllm = DllmAlgorithm(runner)
        if input_ids is None:
            assert prompt is not None and self.tokenizer is not None
            prompts = [prompt] if isinstance(prompt, str) else prompt
            input_ids = [self.tokenizer.encode(p) for p in prompts]
        single = bool(input_ids) and isinstance(input_ids[0], int)
        out = self._run_when_idle(
            lambda: self._dllm.generate(
                input_ids, gen_len, steps=steps, temperature=temperature,
                block_len=block_len, seed=seed,
            )
        )
        results = [{"output_ids": ids, "meta_info": {}} for ids in out]
        return results[0] if single else results

    # --------------------------------------------------------------- admin
    def _run_when_idle(self, fn, timeout: float = 300.0):
        """Run on the scheduler thread between batches — weight swaps
        must not race in-flight device steps."""
        holder, done = self.scheduler.request_idle_call(fn)
        if not done.wait(timeout):
            raise TimeoutError("scheduler did not go idle for weight update")
        if "error" in holder:
            raise holder["error"]
        return holder.get("result")

    def warmup(
        self,
        ctx_len: Optional[int] = None,
        include_sampled: bool = True,
        threads: int = 8,
        execute: bool = True,
    ) -> dict:
        """Precompile the jit program buckets a serving session will hit
        (the reference captures CUDA graphs for every decode batch size at
        startup — cuda_graph_runner.py).  Phase 1 compiles in parallel
        into the persistent XLA cache; phase 2 executes each program once
        on the scheduler thread so live traffic never waits on a compile."""
        runner = self.scheduler.runner
        if getattr(runner, "is_multihost_leader", False):
            # warmup executions are not part of the broadcast step stream;
            # followers would never join the collectives (and the shared
            # step counter would diverge)
            return {"num_programs": 0, "skipped": "multihost"}
        specs = runner.warmup_plan(
            self.scheduler.decode_bs_buckets,
            self.server_args.decode_window_size,
            self.server_args.chunked_prefill_size,
            ctx_len=ctx_len or self.server_args.warmup_ctx_len,
            include_sampled=include_sampled,
            use_ecounts=self.scheduler.eplb_recorder is not None,
        )
        compile_s = runner.warmup_compile(specs, threads=threads)
        exec_s = 0.0
        if execute:
            exec_s = self._run_when_idle(
                lambda: runner.warmup_execute(specs), timeout=1800.0
            )
        return {
            "num_programs": len(specs),
            "compile_seconds": round(compile_s, 1),
            "execute_seconds": round(float(exec_s or 0.0), 1),
        }

    def recover_expert_fault(self, failed_ranks, counts=None) -> dict:
        """Elastic-EP recovery (reference model_runner.py:3050): re-place
        every expert onto surviving EP ranks from the DRAM backup; runs
        idle-barriered so it never races in-flight steps."""
        runner = self.scheduler.runner
        eplb_counts = counts
        if eplb_counts is None and self.scheduler.eplb_recorder is not None:
            rec = self.scheduler.eplb_recorder
            if getattr(rec, "counts", None) is not None and rec.counts.sum():
                eplb_counts = np.asarray(rec.counts, np.float64)
        return self._run_when_idle(
            lambda: runner.recover_expert_rank_fault(
                failed_ranks, counts=eplb_counts
            )
        )

    def update_weights_from_disk(self, model_path: str):
        """Reference /update_weights_from_disk (http_server.py:1286 family)."""
        runner = self.scheduler.runner
        return self._run_when_idle(
            lambda: runner.update_weights_from_disk(model_path)
        )

    def save_sharded_state(self, path: str):
        """Persist the live sharded params for fast multi-rank reload
        (reference save_sharded_state.py + ShardedStateLoader)."""
        runner = self.scheduler.runner
        return self._run_when_idle(lambda: runner.save_sharded_state(path))

    def init_weights_update_group(self, master_address: str, master_port: int):
        """Register the trainer's weight endpoint (reference
        /init_weights_update_group, model_runner.py:2011)."""
        self.scheduler.runner.init_weights_update_group(
            master_address, master_port
        )

    def update_weights_from_distributed(self, names=None) -> int:
        """Pull + apply weights from the registered trainer (reference
        /update_weights_from_distributed, model_runner.py:2070)."""
        runner = self.scheduler.runner
        return self._run_when_idle(
            lambda: runner.update_weights_from_distributed(names)
        )

    def update_weights_from_tensor(self, named_tensors) -> None:
        """In-process weight swap, HF names or param paths (reference
        model_runner.py:2160 — colocated RL trainer path)."""
        runner = self.scheduler.runner
        return self._run_when_idle(
            lambda: runner.update_weights_from_hf_tensors(named_tensors)
        )

    def load_lora_adapter(self, lora_name: str, lora_path: str) -> int:
        """Dynamic adapter load (reference http_server.py:1431)."""
        if self.lora_manager is None:
            raise ValueError("--enable-lora is off")
        runner = self.scheduler.runner
        if hasattr(runner, "broadcast_lora_load"):  # multi-host leader
            runner.broadcast_lora_load(lora_name, lora_path)
        return self.lora_manager.load_adapter(lora_name, lora_path)

    def unload_lora_adapter(self, lora_name: str):
        if self.lora_manager is None:
            raise ValueError("--enable-lora is off")
        runner = self.scheduler.runner
        if hasattr(runner, "broadcast_lora_unload"):
            runner.broadcast_lora_unload(lora_name)
        self.lora_manager.unload_adapter(lora_name)

    def serve_weights_bootstrap(self, port: int = 0,
                                host: str = "0.0.0.0"):
        """Seed side of --load-format remote_instance (reference
        RemoteInstanceModelLoader): serve this instance's live weights
        to bootstrapping replicas.  Returns (thread, bound_port)."""
        return self.scheduler.runner.serve_weights_bootstrap(
            port=port, host=host
        )

    def abort_request(self, rid: str):
        self.scheduler.abort_request(rid)

    def flush_cache(self, timeout: float = 30.0) -> bool:
        """Reset the radix cache + page allocator. The reset runs on the
        scheduler thread only once no live request holds pages (an unfenced
        reset under load corrupts paged KV state). Returns False if the
        scheduler did not go idle within `timeout`."""
        done = self.scheduler.request_flush_cache()
        return done.wait(timeout)

    def get_server_info(self) -> dict:
        info = {
            "model_path": self.server_args.model_path,
            "tokenizer_path": self.server_args.tokenizer_path,
            "version": __import__("sglang_tpu").__version__,
            "disaggregation_mode": self.server_args.disaggregation_mode,
            **self.scheduler.stats(),
        }
        if self.pd_bootstrap is not None:
            info["pd_bootstrap"] = (
                f"{self.pd_bootstrap.host}:{self.pd_bootstrap.port}"
            )
        return info
