"""Few-shot GSM8K accuracy evaluation.

Equivalent role to the reference's ``python/sglang/test/few_shot_gsm8k.py``
/ ``simple_eval_gsm8k.py`` and the CI accuracy floors
(``test/registered/eval/test_text_models_gsm8k_eval.py:28``: reported
score − 5%, FP8 held to the SAME floor as BF16).

The dataset is a local ``.jsonl`` with ``{"question": …, "answer": …}``
rows (GSM8K format; the trailing ``#### <number>`` marks the label) — no
hub access is assumed.

Usage:
  python -m sglang_tpu.eval.gsm8k --model-path … --data-path test.jsonl \
      --num-questions 200 --num-shots 5
"""

from __future__ import annotations

import argparse
import json
import re
from typing import List, Optional

INVALID = -9999999

_NUM_RE = re.compile(r"-?[\d,]*\.?\d+")


def extract_answer(text: str) -> float:
    """Last number in the text (reference few_shot_gsm8k convention)."""
    if "####" in text:
        text = text.split("####")[-1]
    matches = _NUM_RE.findall(text.replace("$", ""))
    if not matches:
        return INVALID
    try:
        return float(matches[-1].replace(",", ""))
    except ValueError:
        return INVALID


def build_prompt(shots: List[dict], question: str) -> str:
    parts = []
    for s in shots:
        parts.append(f"Question: {s['question']}\nAnswer: {s['answer']}\n")
    parts.append(f"Question: {question}\nAnswer:")
    return "\n".join(parts)


def evaluate_gsm8k(
    generate_fn,  # (prompt: str) -> completion text
    dataset: List[dict],
    num_questions: int = 200,
    num_shots: int = 5,
) -> dict:
    """Returns {'accuracy': float, 'invalid_rate': float, 'n': int}."""
    shots = dataset[:num_shots]
    eval_set = dataset[num_shots : num_shots + num_questions]
    correct = invalid = 0
    for row in eval_set:
        prompt = build_prompt(shots, row["question"])
        completion = generate_fn(prompt)
        pred = extract_answer(completion)
        label = extract_answer(row["answer"])
        if pred == INVALID:
            invalid += 1
        if pred == label:
            correct += 1
    n = max(len(eval_set), 1)
    return {
        "accuracy": correct / n,
        "invalid_rate": invalid / n,
        "n": len(eval_set),
    }


def main(argv: Optional[List[str]] = None):
    ap = argparse.ArgumentParser(description="sglang-tpu GSM8K eval")
    from sglang_tpu.server_args import ServerArgs

    ServerArgs.add_cli_args(ap)
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--num-questions", type=int, default=200)
    ap.add_argument("--num-shots", type=int, default=5)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    args = ap.parse_args(argv)
    server_args = ServerArgs.from_cli_args(args)

    dataset = []
    with open(args.data_path) as f:
        for line in f:
            if line.strip():
                dataset.append(json.loads(line))

    from sglang_tpu.entrypoints.engine import Engine

    engine = Engine(server_args=server_args)

    def generate_fn(prompt: str) -> str:
        out = engine.generate(
            prompt=prompt,
            sampling_params={
                "temperature": 0.0,
                "max_new_tokens": args.max_new_tokens,
                "stop": ["Question:", "\n\n"],
            },
        )
        return out["text"]

    try:
        result = evaluate_gsm8k(
            generate_fn, dataset, args.num_questions, args.num_shots
        )
    finally:
        engine.shutdown()
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
