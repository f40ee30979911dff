from sglang_tpu.tokenizer_utils.tokenizer import get_tokenizer  # noqa: F401
from sglang_tpu.tokenizer_utils.detokenizer import (  # noqa: F401
    IncrementalDetokenizer,
    StopStringChecker,
)
