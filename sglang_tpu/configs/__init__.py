from sglang_tpu.configs.model_config import ModelConfig  # noqa: F401
