"""Offline one-batch latency benchmark.

Equivalent role to the reference's ``python/sglang/benchmark/one_batch.py``
(``sglang.bench_one_batch``): measures prefill latency/throughput and
per-step decode latency for a single (batch, input_len, output_len)
configuration against an in-process engine.

Usage:
  python -m sglang_tpu.bench_one_batch --model-path … \
      --batch-size 8 --input-len 512 --output-len 64
"""

from __future__ import annotations

import argparse
import json
import time
from typing import List, Optional

import numpy as np


def run_bench(engine, batch_size: int, input_len: int, output_len: int,
              rounds: int = 3) -> dict:
    rng = np.random.RandomState(0)

    def prompts():
        return [
            rng.randint(0, 250, size=input_len).tolist()
            for _ in range(batch_size)
        ]

    # Warmup compiles all shape buckets (both phases).
    for warm_out in (1, output_len):
        engine.generate(
            input_ids=prompts(),
            sampling_params={
                "temperature": 0.0, "max_new_tokens": warm_out,
                "ignore_eos": True,
            },
        )

    prefill_times, total_times = [], []
    for _ in range(rounds):
        ids = prompts()
        t0 = time.monotonic()
        engine.generate(
            input_ids=ids,
            sampling_params={
                "temperature": 0.0, "max_new_tokens": 1, "ignore_eos": True,
            },
        )
        prefill_times.append(time.monotonic() - t0)
        ids = prompts()
        t0 = time.monotonic()
        engine.generate(
            input_ids=ids,
            sampling_params={
                "temperature": 0.0, "max_new_tokens": output_len,
                "ignore_eos": True,
            },
        )
        total_times.append(time.monotonic() - t0)

    prefill = float(np.median(prefill_times))
    total = float(np.median(total_times))
    decode = max(total - prefill, 1e-9)
    n_dec = batch_size * (output_len - 1)
    return {
        "batch_size": batch_size,
        "input_len": input_len,
        "output_len": output_len,
        "prefill_latency_s": round(prefill, 4),
        "prefill_throughput_tok_s": round(batch_size * input_len / prefill, 1),
        "decode_latency_per_token_ms": round(decode / max(output_len - 1, 1) * 1e3, 3),
        "decode_throughput_tok_s": round(n_dec / decode, 1),
        "total_latency_s": round(total, 4),
    }


def main(argv: Optional[List[str]] = None):
    ap = argparse.ArgumentParser(description="sglang-tpu one-batch benchmark")
    from sglang_tpu.server_args import ServerArgs

    ServerArgs.add_cli_args(ap)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--output-len", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args(argv)
    server_args = ServerArgs.from_cli_args(args)

    from sglang_tpu.entrypoints.engine import Engine

    engine = Engine(server_args=server_args)
    try:
        result = run_bench(
            engine, args.batch_size, args.input_len, args.output_len,
            args.rounds,
        )
    finally:
        engine.shutdown()
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
