from sglang_tpu.constrained.manager import (  # noqa: F401
    GrammarManager,
    compile_grammar,
)
