"""HTTP API integration: native /generate + OpenAI completions/chat, SSE."""

import asyncio
import json
import socket
import threading
import time

import httpx
import pytest

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.entrypoints.engine import Engine
from sglang_tpu.entrypoints.http_server import build_app
from sglang_tpu.model_executor.model_runner import ModelRunner
from sglang_tpu.server_args import ServerArgs

TINY_HF = {
    "architectures": ["LlamaForCausalLM"],
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 8,
    "num_key_value_heads": 8,
    "head_dim": 16,
    "vocab_size": 512,
    "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "eos_token_id": 257,
    "model_type": "llama",
}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server():
    from aiohttp import web

    args = ServerArgs(
        model_path="dummy://tiny",
        tokenizer_path="test:byte",
        load_format="dummy",
        dtype="bfloat16",
        page_size=8,
        max_total_tokens=8192,
        chunked_prefill_size=128,
        host="127.0.0.1",
        port=_free_port(),
        served_model_name="tiny-test",
    )
    runner = ModelRunner(
        args, model_config=ModelConfig.from_hf_dict(TINY_HF, dtype="bfloat16")
    )
    eng = Engine(server_args=args, model_runner=runner)
    app = build_app(eng, args)

    loop = asyncio.new_event_loop()
    started = threading.Event()
    runner_ref = {}

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            r = web.AppRunner(app)
            await r.setup()
            site = web.TCPSite(r, args.host, args.port)
            await site.start()
            runner_ref["runner"] = r
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(timeout=30)
    base = f"http://{args.host}:{args.port}"
    # wait until responsive
    for _ in range(50):
        try:
            if httpx.get(base + "/health", timeout=2).status_code == 200:
                break
        except Exception:
            time.sleep(0.2)
    yield base
    loop.call_soon_threadsafe(loop.stop)
    eng.shutdown()


def test_health_and_info(server):
    assert httpx.get(server + "/health").text == "ok"
    info = httpx.get(server + "/get_model_info").json()
    assert info["served_model_name"] == "tiny-test"
    models = httpx.get(server + "/v1/models").json()
    assert models["data"][0]["id"] == "tiny-test"
    sinfo = httpx.get(server + "/get_server_info").json()
    assert "num_running" in sinfo


def test_native_generate(server):
    r = httpx.post(
        server + "/generate",
        json={
            "text": "hello world",
            "sampling_params": {
                "temperature": 0,
                "max_new_tokens": 8,
                "ignore_eos": True,
            },
        },
        timeout=120,
    )
    out = r.json()
    assert len(out["output_ids"]) == 8
    assert out["meta_info"]["completion_tokens"] == 8


def test_native_generate_stream(server):
    with httpx.stream(
        "POST",
        server + "/generate",
        json={
            "text": "hello",
            "stream": True,
            "sampling_params": {
                "temperature": 0,
                "max_new_tokens": 6,
                "ignore_eos": True,
            },
        },
        timeout=120,
    ) as r:
        events = []
        for line in r.iter_lines():
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    final = json.loads(events[-2])
    assert final["meta_info"]["completion_tokens"] == 6


def test_openai_completions(server):
    r = httpx.post(
        server + "/v1/completions",
        json={
            "model": "tiny-test",
            "prompt": "abc",
            "max_tokens": 5,
            "temperature": 0,
            "ignore_eos": True,
            "n": 2,
        },
        timeout=120,
    )
    out = r.json()
    assert out["object"] == "text_completion"
    assert len(out["choices"]) == 2
    assert out["usage"]["completion_tokens"] == 10


def test_openai_completions_token_ids_and_logprobs(server):
    r = httpx.post(
        server + "/v1/completions",
        json={
            "model": "tiny-test",
            "prompt": [3, 4, 5, 6],
            "max_tokens": 4,
            "temperature": 0,
            "ignore_eos": True,
            "logprobs": 1,
        },
        timeout=120,
    )
    out = r.json()
    lp = out["choices"][0]["logprobs"]
    assert len(lp["token_logprobs"]) == 4
    assert all(isinstance(x, float) for x in lp["token_logprobs"])


def test_openai_chat(server):
    r = httpx.post(
        server + "/v1/chat/completions",
        json={
            "model": "tiny-test",
            "messages": [
                {"role": "system", "content": "be brief"},
                {"role": "user", "content": "hi"},
            ],
            "max_tokens": 5,
            "temperature": 0.7,
            "top_p": 0.9,
            "ignore_eos": True,
        },
        timeout=120,
    )
    out = r.json()
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"
    assert out["usage"]["completion_tokens"] == 5


def test_openai_chat_stream(server):
    with httpx.stream(
        "POST",
        server + "/v1/chat/completions",
        json={
            "model": "tiny-test",
            "messages": [{"role": "user", "content": "count"}],
            "max_tokens": 6,
            "temperature": 0,
            "ignore_eos": True,
            "stream": True,
        },
        timeout=120,
    ) as r:
        events = []
        for line in r.iter_lines():
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    first = json.loads(events[0])
    assert first["choices"][0]["delta"]["role"] == "assistant"
    usage_chunk = json.loads(events[-2])
    assert usage_chunk["usage"]["completion_tokens"] == 6


def test_abort_and_flush(server):
    assert httpx.post(server + "/flush_cache").status_code == 200
    assert (
        httpx.post(server + "/abort_request", json={"rid": "nope"}).status_code
        == 200
    )


def test_bench_serving_client(server):
    """The load-gen client measures TTFT/ITL against the live test server."""
    from sglang_tpu.bench_serving import main as bench_main

    metrics = bench_main(
        [
            "--base-url", server,
            "--num-prompts", "8",
            "--concurrency", "4",
            "--input-len", "16",
            "--output-len", "8",
        ]
    )
    assert metrics["completed"] == 8
    assert metrics["failed"] == 0
    assert metrics["output_token_throughput_tok_s"] > 0
    assert metrics["mean_ttft_ms"] > 0


def test_engine_metrics_observe():
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.sampling_params import SamplingParams
    from sglang_tpu.observability.metrics import get_metrics

    m = get_metrics("tiny-test")
    req = Req(rid="x", input_ids=[1, 2, 3], sampling_params=SamplingParams())
    req.append_output_token(5)
    req.append_output_token(6)
    req._finish(__import__("sglang_tpu.core.req", fromlist=["FinishReason"]).FinishReason.EOS)
    m.observe_finished(req)
    m.set_queue_state(2, 1, 0.5)
    from prometheus_client import generate_latest

    text = generate_latest().decode()
    assert "sglang_tpu_generation_tokens_total" in text
    assert "sglang_tpu_time_to_first_token_seconds" in text


def test_openai_chat_response_format_json_schema(server):
    schema = {
        "type": "object",
        "properties": {"x": {"type": "integer"}},
        "required": ["x"],
    }
    r = httpx.post(
        server + "/v1/chat/completions",
        json={
            "model": "tiny-test",
            "messages": [{"role": "user", "content": "json please"}],
            "max_tokens": 40,
            "temperature": 1.0,
            "top_k": 30,
            "response_format": {
                "type": "json_schema",
                "json_schema": {"name": "t", "schema": schema},
            },
        },
        timeout=180,
    )
    content = r.json()["choices"][0]["message"]["content"]
    obj = json.loads(content)
    assert isinstance(obj["x"], int)


def test_openai_completions_echo_with_prompt_logprobs(server):
    r = httpx.post(
        server + "/v1/completions",
        json={
            "model": "tiny-test",
            "prompt": "abcdef",
            "max_tokens": 3,
            "temperature": 0,
            "ignore_eos": True,
            "echo": True,
            "logprobs": 1,
        },
        timeout=180,
    )
    out = r.json()
    ch = out["choices"][0]
    assert ch["text"].startswith("abcdef")
    lp = ch["logprobs"]
    # 6 prompt tokens (first has null logprob) + 3 generated
    assert len(lp["token_logprobs"]) == 9
    assert lp["token_logprobs"][0] is None
    assert all(isinstance(x, float) for x in lp["token_logprobs"][1:])


def test_anthropic_messages(server):
    r = httpx.post(server + "/v1/messages", json={
        "model": "m", "max_tokens": 8,
        "messages": [{"role": "user", "content": "hi"}],
        "temperature": 0.0,
    }, timeout=60)
    assert r.status_code == 200
    d = r.json()
    assert d["type"] == "message" and d["role"] == "assistant"
    assert d["content"][0]["type"] == "text"
    assert d["usage"]["output_tokens"] > 0
    assert d["stop_reason"] in ("end_turn", "max_tokens", "stop_sequence")


def test_anthropic_messages_stream(server):
    r = httpx.post(server + "/v1/messages", json={
        "model": "m", "max_tokens": 8, "stream": True,
        "messages": [{"role": "user",
                      "content": [{"type": "text", "text": "hello"}]}],
        "temperature": 0.0,
    }, timeout=60)
    assert r.status_code == 200
    body = r.text
    assert "event: message_start" in body
    assert "content_block_delta" in body
    assert "event: message_stop" in body


def test_openai_responses(server):
    r = httpx.post(server + "/v1/responses", json={
        "model": "m", "input": "hello", "max_output_tokens": 8,
        "temperature": 0.0,
    }, timeout=60)
    assert r.status_code == 200
    d = r.json()
    assert d["object"] == "response" and d["status"] == "completed"
    assert d["output"][0]["content"][0]["type"] == "output_text"
    assert d["usage"]["total_tokens"] > 0


def test_openai_responses_stream(server):
    r = httpx.post(server + "/v1/responses", json={
        "model": "m", "input": "hello", "max_output_tokens": 6,
        "temperature": 0.0, "stream": True,
    }, timeout=60)
    assert r.status_code == 200
    assert "response.created" in r.text
    assert "response.completed" in r.text


def test_ollama_generate_and_chat(server):
    r = httpx.post(server + "/api/generate", json={
        "model": "m", "prompt": "hi", "stream": False,
        "options": {"num_predict": 6, "temperature": 0.0},
    }, timeout=60)
    assert r.status_code == 200
    d = r.json()
    assert d["done"] is True and "response" in d

    r = httpx.post(server + "/api/chat", json={
        "model": "m", "messages": [{"role": "user", "content": "hi"}],
        "options": {"num_predict": 6, "temperature": 0.0},
    }, timeout=60)
    assert r.status_code == 200
    lines = [json.loads(x) for x in r.text.splitlines() if x.strip()]
    assert lines[-1]["done"] is True

    assert httpx.get(server + "/api/tags", timeout=30).json()["models"]
    assert "version" in httpx.get(server + "/api/version", timeout=30).json()
