"""gRPC server for the sglang.runtime.v1 service.

Equivalent role to the reference's in-process Rust gRPC server
(``rust/sglang-grpc/src/server.rs`` serving
``proto/sglang/runtime/v1/sglang.proto``) — the proto surface is the
public wire contract; this server is a hand-rolled Python grpc
implementation (no grpc_tools codegen in the image: messages come from
``protoc --python_out``, service handlers are registered via
``grpc.method_handlers_generic_handler``).
"""

from __future__ import annotations

import json
import queue
from concurrent import futures
from typing import Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

_SERVICE = "sglang.runtime.v1.SglangService"


def _pb2():
    from sglang_tpu.grpc import sglang_runtime_pb2 as pb

    return pb


def _sp_dict(sp, default_max: int) -> dict:
    """proto SamplingParams → engine sampling dict."""
    d = {"max_new_tokens": default_max}
    if sp is None:
        return d
    for field in (
        "temperature", "top_p", "top_k", "min_p", "frequency_penalty",
        "presence_penalty", "repetition_penalty", "max_new_tokens",
        "min_new_tokens", "ignore_eos", "json_schema", "regex",
    ):
        if sp.HasField(field):
            d[field] = getattr(sp, field)
    if sp.stop:
        d["stop"] = list(sp.stop)
    if sp.stop_token_ids:
        d["stop_token_ids"] = list(sp.stop_token_ids)
    return d


def _meta_map(meta: dict) -> dict:
    out = {}
    for k, v in (meta or {}).items():
        if v is None:
            continue
        out[k] = v if isinstance(v, str) else json.dumps(v)
    return out


class SglangGrpcServer:
    """Serves the reference's SglangService proto over a local Engine."""

    def __init__(self, engine, server_args, port: Optional[int] = None):
        self.engine = engine
        self.server_args = server_args
        self.port = port or getattr(server_args, "grpc_port", None) or 20000
        self._server = None

    # ------------------------------------------------------------ handlers
    def _gen_stream(self, prompt=None, input_ids=None, req=None, text_out=True):
        pb = _pb2()
        sp = _sp_dict(
            req.sampling_params if req.HasField("sampling_params") else None,
            self.server_args.max_new_tokens_default,
        )
        kwargs = dict(
            sampling_params=sp,
            rid=req.rid or None,
            lora_path=req.lora_path or None,
        )
        if req.return_logprob:
            sp["return_logprob"] = True
        if req.top_logprobs_num:
            sp["top_logprobs_num"] = req.top_logprobs_num
        out_q: "queue.Queue" = queue.Queue()

        def consume():
            try:
                for out in self.engine.generate(
                    prompt=prompt, input_ids=input_ids, stream=True, **kwargs
                ):
                    out_q.put(out)
            except Exception as e:  # surfaced as an aborted stream
                out_q.put(e)
            out_q.put(None)

        import threading

        threading.Thread(target=consume, daemon=True).start()
        while True:
            item = out_q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            meta = _meta_map(item.get("meta_info"))
            if text_out:
                yield pb.TextGenerateResponse(
                    text=item["text"], meta_info=meta,
                    finished=item["finished"],
                )
            else:
                yield pb.GenerateResponse(
                    output_ids=item["output_ids"], meta_info=meta,
                    finished=item["finished"],
                )

    def _text_generate(self, req, ctx):
        yield from self._gen_stream(prompt=req.text, req=req, text_out=True)

    def _generate(self, req, ctx):
        yield from self._gen_stream(
            input_ids=list(req.input_ids), req=req, text_out=False
        )

    def _text_embed(self, req, ctx):
        pb = _pb2()
        out = self.engine.encode(prompt=req.text)
        meta = dict(out.get("meta_info") or {})
        emb = meta.pop("embedding", [])
        return pb.TextEmbedResponse(embedding=emb, meta_info=_meta_map(meta))

    def _embed(self, req, ctx):
        pb = _pb2()
        out = self.engine.encode(input_ids=list(req.input_ids))
        meta = dict(out.get("meta_info") or {})
        emb = meta.pop("embedding", [])
        return pb.EmbedResponse(embedding=emb, meta_info=_meta_map(meta))

    def _tokenize(self, req, ctx):
        pb = _pb2()
        toks = self.engine.tokenizer.encode(req.text)
        return pb.TokenizeResponse(
            tokens=toks,
            count=len(toks),
            max_model_len=self.engine.scheduler.runner.max_context_len,
            input_text=req.text,
        )

    def _detokenize(self, req, ctx):
        pb = _pb2()
        return pb.DetokenizeResponse(
            text=self.engine.tokenizer.decode(list(req.tokens))
        )

    def _health(self, req, ctx):
        return _pb2().HealthCheckResponse(
            healthy=not self.engine.scheduler.dead
        )

    def _model_info(self, req, ctx):
        cfg = self.engine.scheduler.runner.model_config
        return _pb2().GetModelInfoResponse(
            model_path=self.server_args.model_path,
            json_info=json.dumps({
                "architectures": cfg.architectures,
                "context_length": cfg.context_length,
                "vocab_size": cfg.vocab_size,
            }),
        )

    def _server_info(self, req, ctx):
        return _pb2().GetServerInfoResponse(
            json_info=json.dumps(self.engine.get_server_info())
        )

    def _list_models(self, req, ctx):
        pb = _pb2()
        name = self.server_args.served_model_name or self.server_args.model_path
        return pb.ListModelsResponse(models=[
            pb.ModelCard(
                id=name, root=self.server_args.model_path,
                max_model_len=self.engine.scheduler.runner.max_context_len,
            )
        ])

    def _abort(self, req, ctx):
        self.engine.abort_request(req.rid)
        return _pb2().AbortResponse(success=True)

    def _flush_cache(self, req, ctx):
        ok = self.engine.flush_cache()
        return _pb2().FlushCacheResponse(
            success=ok, message="" if ok else "timed out waiting for idle"
        )

    def _update_weights(self, req, ctx):
        try:
            self.engine.update_weights_from_disk(req.model_path)
            return _pb2().UpdateWeightsResponse(success=True)
        except Exception as e:
            return _pb2().UpdateWeightsResponse(success=False, message=str(e))

    # ------------------------------------------------------------ lifecycle
    def start(self) -> int:
        import grpc

        pb = _pb2()

        def uu(fn, req_cls):  # unary-unary
            return grpc.unary_unary_rpc_method_handler(
                fn,
                request_deserializer=req_cls.FromString,
                response_serializer=lambda m: m.SerializeToString(),
            )

        def us(fn, req_cls):  # unary-stream
            return grpc.unary_stream_rpc_method_handler(
                fn,
                request_deserializer=req_cls.FromString,
                response_serializer=lambda m: m.SerializeToString(),
            )

        handlers = {
            "TextGenerate": us(self._text_generate, pb.TextGenerateRequest),
            "Generate": us(self._generate, pb.GenerateRequest),
            "TextEmbed": uu(self._text_embed, pb.TextEmbedRequest),
            "Embed": uu(self._embed, pb.EmbedRequest),
            "Tokenize": uu(self._tokenize, pb.TokenizeRequest),
            "Detokenize": uu(self._detokenize, pb.DetokenizeRequest),
            "HealthCheck": uu(self._health, pb.HealthCheckRequest),
            "GetModelInfo": uu(self._model_info, pb.GetModelInfoRequest),
            "GetServerInfo": uu(self._server_info, pb.GetServerInfoRequest),
            "ListModels": uu(self._list_models, pb.ListModelsRequest),
            "Abort": uu(self._abort, pb.AbortRequest),
            "FlushCache": uu(self._flush_cache, pb.FlushCacheRequest),
            "UpdateWeightsFromDisk": uu(
                self._update_weights, pb.UpdateWeightsRequest),
        }
        self._server = grpc.server(futures.ThreadPoolExecutor(max_workers=16))
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(_SERVICE, handlers),)
        )
        bound = self._server.add_insecure_port(f"[::]:{self.port}")
        self._server.start()
        logger.info("gRPC server on port %d (%s)", bound, _SERVICE)
        self.port = bound
        return bound

    def stop(self, grace: float = 1.0):
        if self._server is not None:
            self._server.stop(grace)
            self._server = None
