"""Online serving benchmark client.

Equivalent role to the reference's ``python/sglang/benchmark/serving.py``
(metrics contract at SURVEY §8.10): measures TTFT (first SSE chunk),
per-token ITL, output/request throughput, mean/median/p99 over a
concurrent stream of requests against a live server.

Usage:
  python -m sglang_tpu.bench_serving --base-url http://127.0.0.1:30000 \
      --num-prompts 128 --concurrency 32 --input-len 512 --output-len 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import time
from dataclasses import dataclass, field
from typing import List, Optional

import aiohttp
import numpy as np


@dataclass
class ReqResult:
    ok: bool = False
    ttft: float = 0.0
    itl: List[float] = field(default_factory=list)
    latency: float = 0.0
    output_tokens: int = 0
    prompt_tokens: int = 0
    error: str = ""


def _gen_prompt(rng: random.Random, n_tokens: int) -> List[int]:
    return [rng.randint(0, 255) for _ in range(n_tokens)]


async def _one_request(
    session: aiohttp.ClientSession,
    base_url: str,
    input_ids: List[int],
    output_len: int,
    sem: asyncio.Semaphore,
) -> ReqResult:
    res = ReqResult(prompt_tokens=len(input_ids))
    payload = {
        "input_ids": input_ids,
        "stream": True,
        "sampling_params": {
            "temperature": 0.0,
            "max_new_tokens": output_len,
            "ignore_eos": True,
        },
    }
    async with sem:
        t0 = time.monotonic()
        last = t0
        try:
            async with session.post(
                base_url + "/generate", json=payload
            ) as resp:
                resp.raise_for_status()
                n_tokens = 0
                async for raw in resp.content:
                    line = raw.decode().strip()
                    if not line.startswith("data: "):
                        continue
                    data = line[len("data: "):]
                    if data == "[DONE]":
                        break
                    out = json.loads(data)
                    now = time.monotonic()
                    new_n = out["meta_info"]["completion_tokens"]
                    if n_tokens == 0 and new_n > 0:
                        res.ttft = now - t0
                    elif new_n > n_tokens:
                        # interval covers (new_n - n_tokens) tokens
                        step = (now - last) / (new_n - n_tokens)
                        res.itl.extend([step] * (new_n - n_tokens))
                    n_tokens = new_n
                    last = now
                res.output_tokens = n_tokens
                res.latency = time.monotonic() - t0
                res.ok = n_tokens > 0
        except Exception as e:  # noqa: BLE001 — record per-request failure
            res.error = str(e)
    return res


async def run_benchmark(args) -> dict:
    rng = random.Random(args.seed)
    prompts = [
        _gen_prompt(rng, args.input_len) for _ in range(args.num_prompts)
    ]
    sem = asyncio.Semaphore(args.concurrency)
    timeout = aiohttp.ClientTimeout(total=args.timeout)
    t0 = time.monotonic()
    async with aiohttp.ClientSession(timeout=timeout) as session:
        results = await asyncio.gather(
            *[
                _one_request(session, args.base_url, p, args.output_len, sem)
                for p in prompts
            ]
        )
    wall = time.monotonic() - t0

    ok = [r for r in results if r.ok]
    if not ok:
        raise RuntimeError(
            f"all requests failed; first error: {results[0].error}"
        )
    ttfts = np.array([r.ttft for r in ok])
    itls = np.array([x for r in ok for x in r.itl]) if any(r.itl for r in ok) else np.array([0.0])
    e2e = np.array([r.latency for r in ok])
    out_tokens = sum(r.output_tokens for r in ok)
    in_tokens = sum(r.prompt_tokens for r in ok)

    metrics = {
        "completed": len(ok),
        "failed": len(results) - len(ok),
        "duration_s": round(wall, 2),
        "request_throughput_rps": round(len(ok) / wall, 3),
        "input_token_throughput_tok_s": round(in_tokens / wall, 1),
        "output_token_throughput_tok_s": round(out_tokens / wall, 1),
        "mean_ttft_ms": round(float(ttfts.mean()) * 1e3, 1),
        "median_ttft_ms": round(float(np.median(ttfts)) * 1e3, 1),
        "p99_ttft_ms": round(float(np.percentile(ttfts, 99)) * 1e3, 1),
        "mean_itl_ms": round(float(itls.mean()) * 1e3, 2),
        "median_itl_ms": round(float(np.median(itls)) * 1e3, 2),
        "p99_itl_ms": round(float(np.percentile(itls, 99)) * 1e3, 2),
        "mean_e2e_ms": round(float(e2e.mean()) * 1e3, 1),
        "median_e2e_ms": round(float(np.median(e2e)) * 1e3, 1),
        "concurrency": args.concurrency,
        "input_len": args.input_len,
        "output_len": args.output_len,
    }
    return metrics


def main(argv: Optional[List[str]] = None):
    ap = argparse.ArgumentParser(description="sglang-tpu serving benchmark")
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--num-prompts", type=int, default=128)
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--output-len", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args(argv)
    metrics = asyncio.run(run_benchmark(args))
    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main()
