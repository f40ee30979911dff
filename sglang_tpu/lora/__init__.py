from sglang_tpu.lora.manager import LoRAManager  # noqa: F401
