from sglang_tpu.managers.data_parallel_controller import (  # noqa: F401
    DataParallelController,
)
