"""gRPC server: sglang.runtime.v1 service over a local engine."""

import json

import grpc
import pytest

from tests.conftest import make_server_args, make_tiny_config


@pytest.fixture(scope="module")
def grpc_stack():
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.grpc import SglangGrpcServer, _pb2
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args()
    runner = ModelRunner(args, model_config=make_tiny_config())
    eng = Engine(server_args=args, model_runner=runner)
    srv = SglangGrpcServer(eng, args, port=0)
    port = srv.start()
    chan = grpc.insecure_channel(f"127.0.0.1:{port}")
    yield chan, _pb2()
    chan.close()
    srv.stop()
    eng.shutdown()


def _uu(chan, pb, name, req_cls, resp_cls, req):
    call = chan.unary_unary(
        f"/sglang.runtime.v1.SglangService/{name}",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=resp_cls.FromString,
    )
    return call(req, timeout=60)


def test_health_and_info(grpc_stack):
    chan, pb = grpc_stack
    r = _uu(chan, pb, "HealthCheck", pb.HealthCheckRequest,
            pb.HealthCheckResponse, pb.HealthCheckRequest())
    assert r.healthy
    r = _uu(chan, pb, "GetModelInfo", pb.GetModelInfoRequest,
            pb.GetModelInfoResponse, pb.GetModelInfoRequest())
    info = json.loads(r.json_info)
    assert info["vocab_size"] == 512
    r = _uu(chan, pb, "ListModels", pb.ListModelsRequest,
            pb.ListModelsResponse, pb.ListModelsRequest())
    assert len(r.models) == 1


def test_text_generate_stream(grpc_stack):
    chan, pb = grpc_stack
    call = chan.unary_stream(
        "/sglang.runtime.v1.SglangService/TextGenerate",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=pb.TextGenerateResponse.FromString,
    )
    req = pb.TextGenerateRequest(
        text="hello",
        sampling_params=pb.SamplingParams(
            temperature=0.0, max_new_tokens=8, ignore_eos=True
        ),
        stream=True,
    )
    chunks = list(call(req, timeout=120))
    assert chunks, "no stream chunks"
    assert chunks[-1].finished
    assert chunks[-1].text


def test_generate_token_ids(grpc_stack):
    chan, pb = grpc_stack
    call = chan.unary_stream(
        "/sglang.runtime.v1.SglangService/Generate",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=pb.GenerateResponse.FromString,
    )
    req = pb.GenerateRequest(
        input_ids=[5, 6, 7, 8],
        sampling_params=pb.SamplingParams(
            temperature=0.0, max_new_tokens=6, ignore_eos=True
        ),
    )
    chunks = list(call(req, timeout=120))
    assert chunks[-1].finished
    assert len(chunks[-1].output_ids) == 6


def test_tokenize_roundtrip(grpc_stack):
    chan, pb = grpc_stack
    r = _uu(chan, pb, "Tokenize", pb.TokenizeRequest, pb.TokenizeResponse,
            pb.TokenizeRequest(text="abc"))
    assert r.count == len(r.tokens) > 0
    r2 = _uu(chan, pb, "Detokenize", pb.DetokenizeRequest,
             pb.DetokenizeResponse, pb.DetokenizeRequest(tokens=r.tokens))
    assert r2.text == "abc"


def test_embed(grpc_stack):
    chan, pb = grpc_stack
    r = _uu(chan, pb, "TextEmbed", pb.TextEmbedRequest, pb.TextEmbedResponse,
            pb.TextEmbedRequest(text="hello"))
    assert len(r.embedding) > 0


def test_flush_cache_rpc(grpc_stack):
    chan, pb = grpc_stack
    r = _uu(chan, pb, "FlushCache", pb.FlushCacheRequest,
            pb.FlushCacheResponse, pb.FlushCacheRequest())
    assert r.success
