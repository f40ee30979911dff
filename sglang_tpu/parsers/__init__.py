from sglang_tpu.parsers.function_call import (  # noqa: F401
    FunctionCallParser,
    ToolCallItem,
)
from sglang_tpu.parsers.reasoning import ReasoningParser  # noqa: F401
