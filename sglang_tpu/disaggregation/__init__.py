from sglang_tpu.disaggregation.conn import (  # noqa: F401
    KVTransferBackend,
    LocalKVTransfer,
)
from sglang_tpu.disaggregation.pd import PDCoordinator  # noqa: F401
