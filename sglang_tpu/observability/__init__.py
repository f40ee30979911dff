from sglang_tpu.observability.metrics import (  # noqa: F401
    EngineMetrics,
    get_metrics,
)
