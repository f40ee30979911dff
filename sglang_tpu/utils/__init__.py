from sglang_tpu.utils.common import (  # noqa: F401
    cdiv,
    get_logger,
    next_power_of_2,
    round_up,
    set_random_seed,
)
