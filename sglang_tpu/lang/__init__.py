from sglang_tpu.lang.api import (  # noqa: F401
    EngineBackend,
    assistant,
    function,
    gen,
    select,
    set_default_backend,
    system,
    user,
)
