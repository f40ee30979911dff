from sglang_tpu.eval.gsm8k import evaluate_gsm8k, extract_answer  # noqa: F401
