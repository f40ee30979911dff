"""Plugin loading: custom model registration via a plugin module
(reference plugins/ + load_plugins at entrypoints/engine.py:212)."""

import sys
import types


def test_plugin_registers_custom_model(tmp_path, monkeypatch):
    from sglang_tpu.plugins import load_plugins

    mod = types.ModuleType("my_test_plugin")

    def register(ctx):
        from sglang_tpu.models.llama import LlamaForCausalLM

        class MyCustomArch(LlamaForCausalLM):
            pass

        ctx.register_model(MyCustomArch, name="MyCustomArchForCausalLM")

    mod.register = register
    sys.modules["my_test_plugin"] = mod
    try:
        monkeypatch.setenv("SGLANG_TPU_PLUGINS", "my_test_plugin")
        loaded = load_plugins()
        assert "my_test_plugin" in loaded

        from sglang_tpu.configs.model_config import ModelConfig
        from sglang_tpu.models.registry import get_model_class
        from tests.conftest import TINY_HF_CONFIG

        hf = dict(TINY_HF_CONFIG)
        hf["architectures"] = ["MyCustomArchForCausalLM"]
        cfg = ModelConfig.from_hf_dict(hf, dtype="float32")
        cls = get_model_class(cfg)
        assert cls.__name__ == "MyCustomArch"
    finally:
        sys.modules.pop("my_test_plugin", None)


def test_plugin_failure_is_nonfatal(monkeypatch):
    from sglang_tpu.plugins import load_plugins

    monkeypatch.setenv("SGLANG_TPU_PLUGINS", "definitely_not_a_module")
    loaded = load_plugins()
    assert "definitely_not_a_module" not in loaded
