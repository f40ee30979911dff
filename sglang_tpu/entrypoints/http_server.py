"""HTTP API server (aiohttp).

Equivalent role to the reference's ``entrypoints/http_server.py`` (FastAPI,
``launch_server`` :2479, ``generate_request`` :790) and
``entrypoints/openai/serving_{completions,chat}.py`` — rebuilt on aiohttp
(the image ships no fastapi/uvicorn).

Routes:
  GET  /health, /health_generate, /get_model_info, /get_server_info,
       /v1/models, /metrics (with --enable-metrics)
  POST /generate (native API, SSE streaming), /v1/completions,
       /v1/chat/completions, /flush_cache, /abort_request
"""

from __future__ import annotations

import asyncio
import hmac
import json
import time
import uuid
from typing import Any, AsyncIterator, Dict, List, Optional

from aiohttp import web

from sglang_tpu.entrypoints.chat_template import apply_chat_template
from sglang_tpu.entrypoints.engine import Engine
from sglang_tpu.entrypoints.protocol import (
    ChatCompletionChoice,
    EmbeddingObject,
    EmbeddingRequest,
    EmbeddingResponse,
    ChatCompletionChunk,
    ChatCompletionChunkChoice,
    ChatCompletionRequest,
    ChatCompletionResponse,
    ChatMessage,
    CompletionChoice,
    CompletionRequest,
    CompletionResponse,
    DeltaMessage,
    ErrorResponse,
    LogProbs,
    ModelCard,
    ModelList,
    UsageInfo,
)
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def _error(msg: str, status: int = 400) -> web.Response:
    body = ErrorResponse(message=msg, code=status).model_dump()
    return web.json_response(body, status=status)


def _usage(metas: List[dict]) -> UsageInfo:
    pt = sum(m.get("prompt_tokens", 0) for m in metas)
    ct = sum(m.get("completion_tokens", 0) for m in metas)
    cached = sum(m.get("cached_tokens", 0) for m in metas)
    return UsageInfo(
        prompt_tokens=pt,
        completion_tokens=ct,
        total_tokens=pt + ct,
        prompt_tokens_details={"cached_tokens": cached} if cached else None,
    )


def _finish_reason(meta: dict) -> Optional[str]:
    fr = meta.get("finish_reason")
    if fr is None:
        return None
    t = fr.get("type")
    return {"eos": "stop", "stop": "stop", "length": "length", "abort": "abort"}.get(
        t, t
    )


def _completion_logprobs(out: dict, tokenizer) -> LogProbs:
    lps = out["meta_info"].get("output_token_logprobs") or []
    lp = LogProbs()
    for logprob, tid, _ in lps:
        lp.token_logprobs.append(logprob)
        lp.tokens.append(
            tokenizer.convert_ids_to_tokens([tid])[0]
            if tokenizer is not None
            else str(tid)
        )
        lp.top_logprobs.append(None)
    return lp


class HttpServer:
    def __init__(self, engine: Engine, server_args: ServerArgs):
        self.engine = engine
        self.server_args = server_args
        self.tokenizer = engine.tokenizer
        self.model_name = server_args.served_model_name or server_args.model_path
        self.app = web.Application(middlewares=[self._auth_middleware])
        self._add_routes()
        self._start_time = time.time()

    # ------------------------------------------------------------ middleware
    @web.middleware
    async def _auth_middleware(self, request: web.Request, handler):
        # With --api-key set, EVERY route except liveness/metrics requires
        # Bearer auth (reference add_api_key_middleware protects all
        # endpoints — /generate, weight-update and LoRA-load routes would
        # otherwise allow unauthenticated arbitrary-path file reads).
        api_key = self.server_args.api_key
        if api_key and request.path not in ("/health", "/metrics"):
            auth = request.headers.get("Authorization", "")
            if not hmac.compare_digest(auth, f"Bearer {api_key}"):
                return _error("Invalid API key", 401)
        try:
            return await handler(request)
        except web.HTTPException:
            raise
        except (ValueError, json.JSONDecodeError) as e:
            return _error(str(e), 400)
        except Exception as e:  # noqa: BLE001 — last-resort request guard
            logger.exception("request failed")
            return _error(f"internal error: {e}", 500)

    def _add_routes(self):
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/get_model_info", self.get_model_info)
        r.add_get("/get_server_info", self.get_server_info)
        r.add_get("/v1/models", self.list_models)
        r.add_post("/generate", self.generate)
        r.add_post("/v1/completions", self.completions)
        r.add_post("/v1/chat/completions", self.chat_completions)
        r.add_post("/v1/embeddings", self.embeddings)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_post("/open_session", self.open_session)
        r.add_post("/close_session", self.close_session)
        r.add_post("/update_weights_from_disk", self.update_weights_from_disk)
        r.add_post("/save_sharded_state", self.save_sharded_state)
        r.add_post(
            "/init_weights_update_group", self.init_weights_update_group
        )
        r.add_post(
            "/update_weights_from_distributed",
            self.update_weights_from_distributed,
        )
        r.add_post("/load_lora_adapter", self.load_lora_adapter)
        r.add_post("/unload_lora_adapter", self.unload_lora_adapter)
        r.add_post("/abort_request", self.abort_request)
        r.add_post("/recover_expert_fault", self.recover_expert_fault)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_get("/get_trace", self.get_trace)
        # Anthropic-compatible messages API (reference entrypoints/anthropic/)
        r.add_post("/v1/messages", self.anthropic_messages)
        # OpenAI Responses API (reference /v1/responses route)
        r.add_post("/v1/responses", self.openai_responses)
        # Ollama emulation (reference entrypoints/ollama/)
        r.add_post("/api/generate", self.ollama_generate)
        r.add_post("/api/chat", self.ollama_chat)
        r.add_get("/api/tags", self.ollama_tags)
        r.add_post("/api/show", self.ollama_show)
        r.add_get("/api/version", self.ollama_version)
        if self.server_args.enable_metrics:
            r.add_get("/metrics", self.metrics)

    # --------------------------------------------------------------- helpers
    async def _collect(self, gen) -> dict:
        final = None
        async for out in gen:
            final = out
        return final

    def _sse(self, request: web.Request) -> web.StreamResponse:
        resp = web.StreamResponse(
            status=200,
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
            },
        )
        return resp

    async def _write_sse(self, resp: web.StreamResponse, data: Any):
        if isinstance(data, str):
            payload = data
        else:
            payload = json.dumps(data, separators=(",", ":"))
        await resp.write(f"data: {payload}\n\n".encode())

    # ---------------------------------------------------------------- routes
    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="ok")

    async def health_generate(self, request: web.Request) -> web.Response:
        out = await self.engine.async_generate(
            input_ids=[1],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                             "ignore_eos": True},
        )
        ok = bool(out and out["meta_info"]["completion_tokens"] >= 1)
        return web.Response(text="ok" if ok else "fail", status=200 if ok else 503)

    async def get_model_info(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "model_path": self.server_args.model_path,
                "tokenizer_path": self.server_args.tokenizer_path,
                "served_model_name": self.model_name,
                "is_generation": True,
            }
        )

    async def get_server_info(self, request: web.Request) -> web.Response:
        info = self.engine.get_server_info()
        info["uptime"] = time.time() - self._start_time
        info.update(self.server_args.to_dict())
        return web.json_response(info)

    async def list_models(self, request: web.Request) -> web.Response:
        return web.json_response(
            ModelList(data=[ModelCard(id=self.model_name)]).model_dump()
        )

    async def flush_cache(self, request: web.Request) -> web.Response:
        self.engine.flush_cache()
        return web.Response(text="Cache flushed.")

    async def open_session(self, request: web.Request) -> web.Response:
        body = await request.json() if request.can_read_body else {}
        sid = self.engine.open_session(body.get("session_id"))
        return web.json_response({"session_id": sid})

    async def close_session(self, request: web.Request) -> web.Response:
        body = await request.json()
        self.engine.close_session(body["session_id"])
        return web.Response(text="ok")

    async def init_weights_update_group(
        self, request: web.Request
    ) -> web.Response:
        body = await request.json()
        self.engine.init_weights_update_group(
            body["master_address"], int(body["master_port"])
        )
        return web.json_response({"success": True})

    async def update_weights_from_distributed(
        self, request: web.Request
    ) -> web.Response:
        body = await request.json() if request.can_read_body else {}
        loop = asyncio.get_event_loop()
        n = await loop.run_in_executor(
            None,
            self.engine.update_weights_from_distributed,
            body.get("names"),
        )
        return web.json_response({"success": True, "num_tensors": n})

    async def update_weights_from_disk(self, request: web.Request) -> web.Response:
        body = await request.json()
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(
            None, self.engine.update_weights_from_disk, body["model_path"]
        )
        return web.json_response({"success": True})

    async def save_sharded_state(self, request: web.Request) -> web.Response:
        """Reference save_sharded_state.py role: persist the live
        sharded params for fast --load-format sharded_state reload."""
        body = await request.json()
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(
            None, self.engine.save_sharded_state, body["path"]
        )
        return web.json_response({"success": True})

    async def load_lora_adapter(self, request: web.Request) -> web.Response:
        body = await request.json()
        self.engine.load_lora_adapter(body["lora_name"], body["lora_path"])
        return web.json_response({"success": True})

    async def unload_lora_adapter(self, request: web.Request) -> web.Response:
        body = await request.json()
        self.engine.unload_lora_adapter(body["lora_name"])
        return web.json_response({"success": True})

    async def abort_request(self, request: web.Request) -> web.Response:
        body = await request.json()
        self.engine.abort_request(body.get("rid", ""))
        return web.Response(text="ok")

    async def recover_expert_fault(self, request: web.Request) -> web.Response:
        """Elastic-EP recovery: {"failed_ranks": [r, ...]} — re-place
        experts onto survivors from the DRAM backup (reference
        elastic_ep controller surface)."""
        body = await request.json()
        loop = asyncio.get_running_loop()
        info = await loop.run_in_executor(
            None,
            lambda: self.engine.recover_expert_fault(
                body.get("failed_ranks", [])
            ),
        )
        return web.json_response({"success": True, **info})

    async def start_profile(self, request: web.Request) -> web.Response:
        """Start a jax.profiler trace (reference /start_profile →
        profiler_manager.py:63)."""
        body = {}
        if request.can_read_body:
            try:
                body = await request.json()
            except Exception:
                body = {}
        out = self.engine.profiler.start(
            output_dir=body.get("output_dir"),
            duration_s=body.get("duration_s"),
        )
        return web.json_response({"success": True, "output_dir": out})

    async def stop_profile(self, request: web.Request) -> web.Response:
        self.engine.profiler.stop()
        return web.json_response({"success": True})

    async def get_trace(self, request: web.Request) -> web.Response:
        """Export recorded request spans (OTel span model as JSON)."""
        if self.engine._tracer is None:
            return _error("request tracing is off (--enable-request-tracing)")
        return web.json_response(
            {"spans": self.engine._tracer.export(
                request.query.get("trace_id"))}
        )

    async def metrics(self, request: web.Request) -> web.Response:
        from prometheus_client import generate_latest

        return web.Response(
            body=generate_latest(),
            content_type="text/plain",
        )

    # ---------------------------------------------------------- /generate
    async def generate(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        stream = bool(body.get("stream", False))
        # PD-over-HTTP roles (reference disaggregation bootstrap_room):
        # the gateway duplicates the request to the prefill and decode
        # servers with matching bootstrap_room ids
        pd_role = body.get("pd_role")
        if pd_role == "prefill":
            loop = asyncio.get_running_loop()
            ids = body.get("input_ids")
            if ids is None:
                ids = self.tokenizer.encode(
                    body.get("text", body.get("prompt"))
                )
            out = await loop.run_in_executor(
                None,
                lambda: self.engine.pd_prefill_request(
                    ids, body.get("sampling_params"),
                    body["bootstrap_room"], body["pd_bootstrap"],
                ),
            )
            return web.json_response(out)
        if pd_role == "decode":
            if not stream:
                loop = asyncio.get_running_loop()
                out = await loop.run_in_executor(
                    None,
                    lambda: self.engine.pd_decode_request(
                        body.get("text", body.get("prompt")),
                        body.get("input_ids"),
                        body.get("sampling_params"),
                        body["bootstrap_room"],
                        rid=body.get("rid"),
                    ),
                )
                return web.json_response(out)
            loop = asyncio.get_running_loop()
            it = await loop.run_in_executor(
                None,
                lambda: self.engine.pd_decode_request(
                    body.get("text", body.get("prompt")),
                    body.get("input_ids"),
                    body.get("sampling_params"),
                    body["bootstrap_room"],
                    stream=True,
                    rid=body.get("rid"),
                ),
            )
            resp = self._sse(request)
            await resp.prepare(request)
            while True:
                out = await loop.run_in_executor(None, lambda: next(it, None))
                if out is None:
                    break
                await self._write_sse(resp, out)
            await self._write_sse(resp, "[DONE]")
            await resp.write_eof()
            return resp
        kwargs = dict(
            prompt=body.get("text", body.get("prompt")),
            input_ids=body.get("input_ids"),
            sampling_params=body.get("sampling_params"),
            rid=body.get("rid"),
            stream=stream,
            lora_path=body.get("lora_path"),
            priority=body.get("priority"),
            routing_key=body.get("routing_key"),
        )
        # reference /generate multimodal fields: image_data = data-URL
        # (or list of them); video_data = data-URL of a multi-frame
        # image (GIF etc.; frames extracted) or a list of frame URLs
        # forming ONE video
        if body.get("image_data"):
            urls = body["image_data"]
            if isinstance(urls, str):
                urls = [urls]
            kwargs["images"] = [_decode_data_url_image(u) for u in urls]
        if body.get("video_data"):
            vd = body["video_data"]
            if isinstance(vd, str):
                vd = [vd]
            if vd and vd[0].startswith("data:image/gif"):
                kwargs["videos"] = [_decode_data_url_frames(u) for u in vd]
            else:  # a list of frame data-URLs = one video
                kwargs["videos"] = [
                    [_decode_data_url_image(u) for u in vd]
                ]
        if not stream:
            # batch or single
            texts = kwargs["prompt"]
            ids = kwargs["input_ids"]
            is_batch = isinstance(texts, list) or (
                ids is not None and ids and isinstance(ids[0], list)
            )
            if is_batch:
                loop = asyncio.get_running_loop()
                out = await loop.run_in_executor(
                    None,
                    lambda: self.engine.generate(
                        prompt=texts,
                        input_ids=ids,
                        sampling_params=kwargs["sampling_params"],
                        lora_path=kwargs["lora_path"],
                    ),
                )
                return web.json_response(out)
            out = await self.engine.async_generate(**kwargs)
            return web.json_response(out)

        gen = await self.engine.async_generate(**kwargs)
        resp = self._sse(request)
        await resp.prepare(request)
        async for out in gen:
            await self._write_sse(resp, out)
        await self._write_sse(resp, "[DONE]")
        await resp.write_eof()
        return resp

    # ------------------------------------------------------ /v1/completions
    async def completions(self, request: web.Request) -> web.StreamResponse:
        req = CompletionRequest(**await request.json())
        sp = req.to_sampling_dict(self.server_args.max_new_tokens_default)
        if req.logprobs is not None:
            sp["return_logprob"] = True

        # Normalize prompt(s) → list of (prompt_text | None, input_ids | None)
        prompts: List[tuple] = []
        p = req.prompt
        if isinstance(p, str):
            prompts = [(p, None)]
        elif isinstance(p, list) and p and isinstance(p[0], int):
            prompts = [(None, p)]
        elif isinstance(p, list) and p and isinstance(p[0], str):
            prompts = [(t, None) for t in p]
        elif isinstance(p, list) and p and isinstance(p[0], list):
            prompts = [(None, ids) for ids in p]
        else:
            return _error("prompt must be a string or a non-empty list")
        if req.n > 1:
            prompts = [pp for pp in prompts for _ in range(req.n)]

        if req.stream:
            if len(prompts) != 1:
                return _error("streaming supports a single prompt with n=1")
            gen = await self.engine.async_generate(
                prompt=prompts[0][0], input_ids=prompts[0][1],
                sampling_params=sp, stream=True,
            )
            resp = self._sse(request)
            await resp.prepare(request)
            cid = CompletionResponse().id
            sent = 0
            last_meta = {}
            async for out in gen:
                text = out["text"]
                delta, sent = text[sent:], len(text)
                last_meta = out["meta_info"]
                chunk = CompletionResponse(
                    id=cid,
                    model=self.model_name,
                    choices=[
                        CompletionChoice(
                            index=0,
                            text=delta,
                            finish_reason=_finish_reason(out["meta_info"]),
                        )
                    ],
                )
                await self._write_sse(resp, chunk.model_dump(exclude_none=True))
            usage = _usage([last_meta])
            await self._write_sse(
                resp,
                CompletionResponse(
                    id=cid, model=self.model_name, choices=[], usage=usage
                ).model_dump(exclude_none=True),
            )
            await self._write_sse(resp, "[DONE]")
            await resp.write_eof()
            return resp

        outs = await asyncio.gather(
            *[
                self.engine.async_generate(
                    prompt=pt, input_ids=ids, sampling_params=dict(sp)
                )
                for pt, ids in prompts
            ]
        )
        prompt_lps = [None] * len(prompts)
        if req.echo and req.logprobs is not None:
            # score the prompts for input-token logprobs (reference
            # echo+logprobs path: input_token_logprobs)
            score_sp = {"max_new_tokens": 0, "return_logprob": True}
            scores = await asyncio.gather(
                *[
                    self.engine.async_generate(
                        prompt=pt, input_ids=ids,
                        sampling_params=dict(score_sp),
                    )
                    for pt, ids in prompts
                ]
            )
            prompt_lps = [
                s["meta_info"].get("input_token_logprobs") for s in scores
            ]
        choices = []
        for i, out in enumerate(outs):
            echo_text = ""
            if req.echo and prompts[i][0] is not None:
                echo_text = prompts[i][0]
            lp = None
            if req.logprobs is not None:
                lp = _completion_logprobs(out, self.tokenizer)
                if prompt_lps[i]:
                    pre = LogProbs()
                    for logprob, tid, _ in prompt_lps[i]:
                        pre.token_logprobs.append(logprob)
                        pre.tokens.append(
                            self.tokenizer.convert_ids_to_tokens([tid])[0]
                            if self.tokenizer is not None
                            else str(tid)
                        )
                        pre.top_logprobs.append(None)
                    lp = LogProbs(
                        token_logprobs=pre.token_logprobs + lp.token_logprobs,
                        tokens=pre.tokens + lp.tokens,
                        top_logprobs=pre.top_logprobs + lp.top_logprobs,
                    )
            choices.append(
                CompletionChoice(
                    index=i,
                    text=echo_text + out["text"],
                    finish_reason=_finish_reason(out["meta_info"]) or "length",
                    matched_stop=out["meta_info"].get("finish_reason", {}).get("matched")
                    if out["meta_info"].get("finish_reason")
                    else None,
                    logprobs=lp,
                )
            )
        resp_obj = CompletionResponse(
            model=self.model_name,
            choices=choices,
            usage=_usage([o["meta_info"] for o in outs]),
        )
        return web.json_response(resp_obj.model_dump(exclude_none=True))

    # ---------------------------------------------------- /v1/embeddings
    async def embeddings(self, request: web.Request) -> web.Response:
        req = EmbeddingRequest(**await request.json())
        inp = req.input
        if isinstance(inp, str):
            items = [(inp, None)]
        elif inp and isinstance(inp[0], int):
            items = [(None, inp)]
        elif inp and isinstance(inp[0], str):
            items = [(t, None) for t in inp]
        elif inp and isinstance(inp[0], list):
            items = [(None, ids) for ids in inp]
        else:
            return _error("input must be a string or non-empty list")
        loop = asyncio.get_running_loop()
        outs = await asyncio.gather(
            *[
                loop.run_in_executor(
                    None,
                    lambda p=p, ids=ids: self.engine.encode(
                        prompt=p, input_ids=ids
                    ),
                )
                for p, ids in items
            ]
        )
        data = [
            EmbeddingObject(embedding=o["meta_info"]["embedding"], index=i)
            for i, o in enumerate(outs)
        ]
        pt = sum(o["meta_info"]["prompt_tokens"] for o in outs)
        return web.json_response(
            EmbeddingResponse(
                data=data,
                model=self.model_name,
                usage=UsageInfo(prompt_tokens=pt, total_tokens=pt),
            ).model_dump()
        )

    # ------------------------------------------------- /v1/chat/completions
    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        req = ChatCompletionRequest(**await request.json())
        if not req.messages:
            return _error("messages must be non-empty")
        sp = req.to_sampling_dict(self.server_args.max_new_tokens_default)
        images, videos = _extract_media(
            [m.model_dump() if hasattr(m, "model_dump") else m
             for m in req.messages]
        )
        images, videos = images or None, videos or None
        prompt = apply_chat_template(
            self.tokenizer, req.messages, self.server_args.chat_template,
            tools=req.tools,
        )

        if req.stream:
            gen = await self.engine.async_generate(
                prompt=prompt, sampling_params=sp, stream=True,
                images=images, videos=videos,
            )
            resp = self._sse(request)
            await resp.prepare(request)
            cid = ChatCompletionResponse().id
            first = ChatCompletionChunk(
                id=cid,
                model=self.model_name,
                choices=[
                    ChatCompletionChunkChoice(
                        index=0, delta=DeltaMessage(role="assistant", content="")
                    )
                ],
            )
            await self._write_sse(resp, first.model_dump(exclude_none=True))
            # streaming tool-call extraction (reference function_call/
            # parse_streaming_increment): marker text is held back and
            # tool_calls deltas stream OpenAI-style (name first, then
            # partial argument-JSON chunks)
            tool_parser = None
            if req.tools and req.tool_choice != "none":
                from sglang_tpu.parsers import StreamingFunctionCallParser

                fmt = self.server_args.tool_call_parser
                tool_parser = StreamingFunctionCallParser(
                    req.tools, fmt,
                    model_type=(
                        self.engine.scheduler.runner.model_config.hf_config
                        or {}
                    ).get("model_type"),
                )

            async def emit_tool_events(events, fr=None):
                for ev in events:
                    if ev["type"] == "name":
                        d = {"index": ev["index"],
                             "id": f"call_{cid[-6:]}_{ev['index']}",
                             "type": "function",
                             "function": {"name": ev["name"],
                                          "arguments": ""}}
                    elif ev["type"] == "args":
                        d = {"index": ev["index"],
                             "function": {"arguments": ev["delta"]}}
                    else:
                        continue
                    chunk = ChatCompletionChunk(
                        id=cid, model=self.model_name,
                        choices=[ChatCompletionChunkChoice(
                            index=0,
                            delta=DeltaMessage(tool_calls=[d]),
                            finish_reason=fr,
                        )],
                    )
                    await self._write_sse(
                        resp, chunk.model_dump(exclude_none=True)
                    )

            sent = 0
            last_meta = {}
            async for out in gen:
                text = out["text"]
                delta, sent = text[sent:], len(text)
                last_meta = out["meta_info"]
                fr = _finish_reason(out["meta_info"])
                events = []
                if tool_parser is not None:
                    delta, events = tool_parser.push(delta)
                    if fr is not None:
                        tail, ev2, calls = tool_parser.finish()
                        delta += tail
                        events = events + ev2
                        if calls:
                            fr = "tool_calls"
                if events:
                    await emit_tool_events(events)
                if delta or fr is not None:
                    chunk = ChatCompletionChunk(
                        id=cid,
                        model=self.model_name,
                        choices=[
                            ChatCompletionChunkChoice(
                                index=0,
                                delta=DeltaMessage(content=delta or None),
                                finish_reason=fr,
                            )
                        ],
                    )
                    await self._write_sse(
                        resp, chunk.model_dump(exclude_none=True)
                    )
            usage = _usage([last_meta])
            await self._write_sse(
                resp,
                ChatCompletionChunk(
                    id=cid, model=self.model_name, choices=[], usage=usage
                ).model_dump(exclude_none=True),
            )
            await self._write_sse(resp, "[DONE]")
            await resp.write_eof()
            return resp

        n = max(req.n, 1)
        outs = await asyncio.gather(
            *[
                self.engine.async_generate(
                    prompt=prompt, sampling_params=dict(sp), images=images,
                    videos=videos,
                )
                for _ in range(n)
            ]
        )
        from sglang_tpu.parsers import FunctionCallParser, ReasoningParser

        choices = []
        for i, out in enumerate(outs):
            text = out["text"]
            reasoning = None
            if self.server_args.reasoning_parser:
                from sglang_tpu.parsers.reasoning import (
                    reasoning_parser_for,
                )

                reasoning, text = reasoning_parser_for(
                    self.server_args.reasoning_parser
                ).parse(text)
                reasoning = reasoning or None
            tool_calls = None
            finish_override = None
            if req.tools and req.tool_choice != "none":
                normal, calls = FunctionCallParser(
                    req.tools, self.server_args.tool_call_parser
                ).parse(text)
                if calls:
                    text = normal or None
                    finish_override = "tool_calls"
                    tool_calls = [
                        {
                            "id": f"call_{i}_{c.tool_index}",
                            "type": "function",
                            "function": {
                                "name": c.name,
                                "arguments": c.arguments,
                            },
                        }
                        for c in calls
                    ]
            lp = None
            if req.logprobs:
                lps = out["meta_info"].get("output_token_logprobs") or []
                tops = out["meta_info"].get("output_top_logprobs") or [None] * len(lps)

                def tok_str(tid):
                    return (
                        self.tokenizer.convert_ids_to_tokens([tid])[0]
                        if self.tokenizer is not None
                        else str(tid)
                    )

                lp = {
                    "content": [
                        {
                            "token": tok_str(tid),
                            "logprob": logprob,
                            "bytes": None,
                            "top_logprobs": [
                                {
                                    "token": tok_str(t2),
                                    "logprob": lp2,
                                    "bytes": None,
                                }
                                for lp2, t2, _ in (top or [])
                            ],
                        }
                        for (logprob, tid, _), top in zip(lps, tops)
                    ]
                }
            choices.append(
                ChatCompletionChoice(
                    index=i,
                    message=ChatMessage(
                        role="assistant",
                        content=text,
                        tool_calls=tool_calls,
                        reasoning_content=reasoning,
                    ),
                    finish_reason=finish_override
                    or _finish_reason(out["meta_info"])
                    or "length",
                    logprobs=lp,
                )
            )
        resp_obj = ChatCompletionResponse(
            model=self.model_name,
            choices=choices,
            usage=_usage([o["meta_info"] for o in outs]),
        )
        return web.json_response(resp_obj.model_dump(exclude_none=True))


def build_app(engine: Engine, server_args: ServerArgs) -> web.Application:
    return HttpServer(engine, server_args).app


def launch_server(server_args: ServerArgs, engine: Optional[Engine] = None):
    """Blocking server entry (reference http_server.py:2479)."""
    if engine is None:
        engine = Engine(server_args=server_args)
    if not server_args.skip_server_warmup:
        # Precompile the serving program buckets before accepting traffic
        # (reference warmup + CUDA-graph capture before /health goes ok).
        logger.info("Warming up jit program buckets ...")
        info = engine.warmup()
        logger.info("Warmup done: %s", info)
    if server_args.grpc_port:
        from sglang_tpu.grpc import SglangGrpcServer

        SglangGrpcServer(engine, server_args).start()
    app = build_app(engine, server_args)
    logger.info(
        "HTTP server listening on http://%s:%d",
        server_args.host,
        server_args.port,
    )
    web.run_app(
        app, host=server_args.host, port=server_args.port, print=None,
        access_log=logger if server_args.log_requests else None,
    )


# ---------------------------------------------------------------------------
# Anthropic / OpenAI-Responses / Ollama protocol adapters
# ---------------------------------------------------------------------------

def _anthropic_stop_reason(meta) -> str:
    fr = meta.get("finish_reason") or {}
    t = fr.get("type") if isinstance(fr, dict) else None
    if t == "length":
        return "max_tokens"
    if t == "stop" and isinstance(fr, dict) and fr.get("matched") is not None:
        return "stop_sequence"
    return "end_turn"


def _decode_data_url_image(url: str):
    """data-URL → PIL image (single frame)."""
    import base64
    import io

    from PIL import Image

    assert url.startswith("data:"), url[:32]
    b64 = url.split(",", 1)[1]
    return Image.open(io.BytesIO(base64.b64decode(b64)))


def _decode_data_url_frames(url: str) -> list:
    """data-URL of a multi-frame image (GIF) → list of RGB frames."""
    from PIL import ImageSequence

    im = _decode_data_url_image(url)
    return [f.convert("RGB").copy() for f in ImageSequence.Iterator(im)]


def _extract_images(messages) -> list:
    """Decode data-URL image_url content parts (reference multimodal
    chat inputs) → list of PIL images; text parts stay in the message."""
    return _extract_media(messages)[0]


def _extract_media(messages):
    """→ (images, videos): data-URL image_url parts and video_url parts
    (a multi-frame GIF data-URL = one video) of list-typed contents."""
    images, videos = [], []
    for m in messages:
        content = m.content if hasattr(m, "content") else m.get("content")
        if not isinstance(content, list):
            continue
        for part in content:
            if not isinstance(part, dict):
                continue
            if part.get("type") == "image_url":
                url = (part.get("image_url") or {}).get("url", "")
                if url.startswith("data:"):
                    images.append(_decode_data_url_image(url))
            elif part.get("type") == "video_url":
                url = (part.get("video_url") or {}).get("url", "")
                if url.startswith("data:"):
                    videos.append(_decode_data_url_frames(url))
    return images, videos


def _chat_msgs(dicts):
    """dict messages → protocol ChatMessage objects for the template."""
    return [
        ChatMessage(role=m["role"], content=m.get("content", ""))
        for m in dicts
    ]


def _content_to_text(content) -> str:
    """Anthropic content blocks | plain string → text."""
    if isinstance(content, str):
        return content
    parts = []
    for block in content or []:
        if isinstance(block, dict) and block.get("type") == "text":
            parts.append(block.get("text", ""))
        elif isinstance(block, str):
            parts.append(block)
    return "".join(parts)


class _ProtocolAdapters:
    """Mixed into HttpServer: alternative wire protocols over the same
    engine (reference entrypoints/anthropic/, entrypoints/ollama/, and the
    /v1/responses route of http_server.py)."""

    async def anthropic_messages(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        messages = [
            {"role": m["role"], "content": _content_to_text(m.get("content"))}
            for m in body.get("messages", [])
        ]
        if body.get("system"):
            messages.insert(
                0, {"role": "system",
                    "content": _content_to_text(body["system"])}
            )
        sp = {
            "max_new_tokens": body.get("max_tokens",
                                       self.server_args.max_new_tokens_default),
            "temperature": body.get("temperature", 1.0),
            "top_p": body.get("top_p", 1.0),
            "top_k": body.get("top_k", -1),
            "stop": body.get("stop_sequences") or [],
        }
        prompt = apply_chat_template(
            self.tokenizer, _chat_msgs(messages), self.server_args.chat_template
        )
        mid = f"msg_{uuid.uuid4().hex[:24]}"

        if body.get("stream"):
            gen = await self.engine.async_generate(
                prompt=prompt, sampling_params=sp, stream=True
            )
            resp = self._sse(request)
            await resp.prepare(request)

            async def ev(event, data):
                payload = json.dumps({"type": event, **data})
                await resp.write(
                    f"event: {event}\ndata: {payload}\n\n".encode()
                )

            await ev("message_start", {"message": {
                "id": mid, "type": "message", "role": "assistant",
                "model": self.model_name, "content": [],
                "usage": {"input_tokens": 0, "output_tokens": 0}}})
            await ev("content_block_start", {
                "index": 0, "content_block": {"type": "text", "text": ""}})
            sent = 0
            last_meta = {}
            async for out in gen:
                text = out["text"]
                delta, sent = text[sent:], len(text)
                last_meta = out["meta_info"]
                if delta:
                    await ev("content_block_delta", {
                        "index": 0,
                        "delta": {"type": "text_delta", "text": delta}})
            await ev("content_block_stop", {"index": 0})
            await ev("message_delta", {
                "delta": {"stop_reason": _anthropic_stop_reason(last_meta)},
                "usage": {
                    "output_tokens": last_meta.get("completion_tokens", 0)}})
            await ev("message_stop", {})
            await resp.write_eof()
            return resp

        out = await self.engine.async_generate(prompt=prompt, sampling_params=sp)
        meta = out["meta_info"]
        return web.json_response({
            "id": mid,
            "type": "message",
            "role": "assistant",
            "model": self.model_name,
            "content": [{"type": "text", "text": out["text"]}],
            "stop_reason": _anthropic_stop_reason(meta),
            "stop_sequence": (meta.get("finish_reason") or {}).get("matched"),
            "usage": {
                "input_tokens": meta.get("prompt_tokens", 0),
                "output_tokens": meta.get("completion_tokens", 0),
            },
        })

    async def openai_responses(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        inp = body.get("input", "")
        messages = []
        if body.get("instructions"):
            messages.append({"role": "system", "content": body["instructions"]})
        if isinstance(inp, str):
            messages.append({"role": "user", "content": inp})
        else:
            for m in inp:
                messages.append({
                    "role": m.get("role", "user"),
                    "content": _content_to_text(m.get("content")),
                })
        sp = {
            "max_new_tokens": body.get(
                "max_output_tokens", self.server_args.max_new_tokens_default),
            "temperature": body.get("temperature", 1.0),
            "top_p": body.get("top_p", 1.0),
        }
        prompt = apply_chat_template(
            self.tokenizer, _chat_msgs(messages), self.server_args.chat_template
        )
        rid = f"resp_{uuid.uuid4().hex[:24]}"
        msg_id = f"msg_{uuid.uuid4().hex[:24]}"

        if body.get("stream"):
            gen = await self.engine.async_generate(
                prompt=prompt, sampling_params=sp, stream=True
            )
            resp = self._sse(request)
            await resp.prepare(request)
            await self._write_sse(resp, {
                "type": "response.created",
                "response": {"id": rid, "object": "response",
                             "status": "in_progress"}})
            sent = 0
            last_meta = {}
            full = ""
            async for out in gen:
                text = out["text"]
                delta, sent = text[sent:], len(text)
                full = text
                last_meta = out["meta_info"]
                if delta:
                    await self._write_sse(resp, {
                        "type": "response.output_text.delta",
                        "item_id": msg_id, "output_index": 0,
                        "content_index": 0, "delta": delta})
            await self._write_sse(resp, {
                "type": "response.completed",
                "response": {
                    "id": rid, "object": "response", "status": "completed",
                    "output": [{
                        "type": "message", "id": msg_id, "role": "assistant",
                        "content": [{"type": "output_text", "text": full}]}],
                    "usage": {
                        "input_tokens": last_meta.get("prompt_tokens", 0),
                        "output_tokens": last_meta.get("completion_tokens", 0),
                        "total_tokens": last_meta.get("prompt_tokens", 0)
                        + last_meta.get("completion_tokens", 0)}}})
            await resp.write_eof()
            return resp

        out = await self.engine.async_generate(prompt=prompt, sampling_params=sp)
        meta = out["meta_info"]
        return web.json_response({
            "id": rid,
            "object": "response",
            "status": "completed",
            "model": self.model_name,
            "output": [{
                "type": "message", "id": msg_id, "role": "assistant",
                "content": [{"type": "output_text", "text": out["text"]}],
            }],
            "output_text": out["text"],
            "usage": {
                "input_tokens": meta.get("prompt_tokens", 0),
                "output_tokens": meta.get("completion_tokens", 0),
                "total_tokens": meta.get("prompt_tokens", 0)
                + meta.get("completion_tokens", 0),
            },
        })

    # ------------------------------------------------------------- ollama
    def _ollama_sp(self, body) -> dict:
        opts = body.get("options") or {}
        return {
            "max_new_tokens": opts.get(
                "num_predict", self.server_args.max_new_tokens_default),
            "temperature": opts.get("temperature", 0.8),
            "top_p": opts.get("top_p", 0.9),
            "top_k": opts.get("top_k", -1),
            "stop": opts.get("stop") or [],
        }

    async def _ollama_stream(self, request, gen, wrap):
        resp = web.StreamResponse(
            headers={"Content-Type": "application/x-ndjson"}
        )
        await resp.prepare(request)
        sent = 0
        last_meta = {}
        async for out in gen:
            text = out["text"]
            delta, sent = text[sent:], len(text)
            last_meta = out["meta_info"]
            if delta:
                await resp.write(
                    (json.dumps(wrap(delta, False, last_meta)) + "\n").encode()
                )
        await resp.write(
            (json.dumps(wrap("", True, last_meta)) + "\n").encode()
        )
        await resp.write_eof()
        return resp

    async def ollama_generate(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        sp = self._ollama_sp(body)
        prompt = body.get("prompt", "")
        stream = body.get("stream", True)

        def wrap(delta, done, meta):
            d = {"model": self.model_name, "response": delta, "done": done}
            if done:
                d.update(
                    prompt_eval_count=meta.get("prompt_tokens", 0),
                    eval_count=meta.get("completion_tokens", 0),
                    done_reason="stop",
                )
            return d

        if stream:
            gen = await self.engine.async_generate(
                prompt=prompt, sampling_params=sp, stream=True
            )
            return await self._ollama_stream(request, gen, wrap)
        out = await self.engine.async_generate(prompt=prompt, sampling_params=sp)
        d = wrap(out["text"], True, out["meta_info"])
        d["response"] = out["text"]
        return web.json_response(d)

    async def ollama_chat(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        sp = self._ollama_sp(body)
        messages = [
            {"role": m["role"], "content": _content_to_text(m.get("content"))}
            for m in body.get("messages", [])
        ]
        prompt = apply_chat_template(
            self.tokenizer, _chat_msgs(messages), self.server_args.chat_template
        )
        stream = body.get("stream", True)

        def wrap(delta, done, meta):
            d = {
                "model": self.model_name,
                "message": {"role": "assistant", "content": delta},
                "done": done,
            }
            if done:
                d.update(
                    prompt_eval_count=meta.get("prompt_tokens", 0),
                    eval_count=meta.get("completion_tokens", 0),
                    done_reason="stop",
                )
            return d

        if stream:
            gen = await self.engine.async_generate(
                prompt=prompt, sampling_params=sp, stream=True
            )
            return await self._ollama_stream(request, gen, wrap)
        out = await self.engine.async_generate(prompt=prompt, sampling_params=sp)
        d = wrap(out["text"], True, out["meta_info"])
        return web.json_response(d)

    async def ollama_tags(self, request: web.Request) -> web.Response:
        return web.json_response({
            "models": [{
                "name": self.model_name, "model": self.model_name,
                "details": {"family": "sglang-tpu"}}]})

    async def ollama_show(self, request: web.Request) -> web.Response:
        cfg = self.engine.scheduler.runner.model_config
        return web.json_response({
            "details": {"family": "sglang-tpu"},
            "model_info": {
                "general.architecture": (cfg.architectures or [""])[0],
                "context_length": cfg.context_length,
                "vocab_size": cfg.vocab_size,
            },
        })

    async def ollama_version(self, request: web.Request) -> web.Response:
        import sglang_tpu

        return web.json_response({"version": sglang_tpu.__version__})


# graft the adapters onto HttpServer
for _name in (
    "anthropic_messages", "openai_responses", "ollama_generate",
    "ollama_chat", "ollama_tags", "ollama_show", "ollama_version",
    "_ollama_sp", "_ollama_stream",
):
    setattr(HttpServer, _name, getattr(_ProtocolAdapters, _name))
