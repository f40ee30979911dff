from sglang_tpu.parsers.function_call import (  # noqa: F401
    FunctionCallParser,
    StreamingFunctionCallParser,
    ToolCallItem,
    detector_for_model,
)
from sglang_tpu.parsers.reasoning import ReasoningParser  # noqa: F401
