from sglang_tpu.speculative.ngram import NgramPredictor  # noqa: F401
