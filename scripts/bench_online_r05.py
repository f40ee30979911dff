"""On-chip ONLINE serving benchmark (BENCH_online_r05.json).

Flagship (Llama-3.2-1B geometry, bf16, dummy weights) engine served
over HTTP in-process, warmup() precompiles every bucket BEFORE traffic
(the r03 TTFT fix — this is its first on-chip measurement), then the
standard bench_serving client drives the reference workload shape
(128 prompts, concurrency 32, 512 in / 128 out).

Reference floors (BASELINE.md, Llama-3.1-8B on one H100):
median TTFT < 86 ms, median ITL < 10 ms, median e2e < 11 s.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_online_r05.py [out.json]
"""

from __future__ import annotations

import asyncio
import json
import sys
import threading
import time


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_online_r05.json"

    from aiohttp import web

    from __graft_entry__ import FLAGSHIP_HF
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.entrypoints.http_server import build_app
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    B = 64
    args = ServerArgs(
        model_path="dummy://flagship",
        tokenizer_path="test:byte",
        load_format="dummy",
        dtype="bfloat16",
        page_size=32,
        max_total_tokens=B * (512 + 128 + 64) + 4096,
        max_prefill_tokens=8192,
        chunked_prefill_size=8192,
        max_running_requests=B,
        host="127.0.0.1",
        port=30399,
    )
    runner = ModelRunner(
        args,
        model_config=ModelConfig.from_hf_dict(FLAGSHIP_HF, dtype="bfloat16"),
    )
    eng = Engine(server_args=args, model_runner=runner)
    print("warmup...", flush=True)
    t0 = time.time()
    eng.warmup(ctx_len=512 + 128 + 64, threads=8)
    print(f"warmup done in {time.time() - t0:.1f}s", flush=True)

    app = build_app(eng, args)
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            r = web.AppRunner(app)
            await r.setup()
            await web.TCPSite(r, args.host, args.port).start()
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(30)

    from sglang_tpu import bench_serving

    res = bench_serving.main([
        "--base-url", f"http://{args.host}:{args.port}",
        "--num-prompts", "128",
        "--concurrency", "32",
        "--input-len", "512",
        "--output-len", "128",
    ])
    if isinstance(res, dict):
        with open(out_path, "w") as f:
            json.dump(res, f, indent=2)
        print("wrote", out_path, flush=True)
    loop.call_soon_threadsafe(loop.stop)
    eng.shutdown()


if __name__ == "__main__":
    main()
