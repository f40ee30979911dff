"""Model registry: HF ``architectures`` string → model class.

Equivalent role to the reference's ``srt/models/registry.py:111`` (imports
every module under ``models/`` and collects ``EntryClass``).
"""

from __future__ import annotations

import importlib
import pkgutil
from typing import Dict, List, Type

import sglang_tpu.models as models_pkg
from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

_REGISTRY: Dict[str, type] = {}
_LOADED = False


def _load_all():
    global _LOADED
    if _LOADED:
        return
    for mod_info in pkgutil.iter_modules(models_pkg.__path__):
        if mod_info.name.startswith("_") or mod_info.name == "registry":
            continue
        mod = importlib.import_module(f"sglang_tpu.models.{mod_info.name}")
        entry = getattr(mod, "EntryClass", None)
        if entry is None:
            continue
        classes: List[type] = entry if isinstance(entry, list) else [entry]
        for cls in classes:
            _REGISTRY[cls.__name__] = cls
    _LOADED = True


def register_model(cls: type, name: str = None) -> type:
    """Register an out-of-tree model class (plugin hook; reference
    plugins/ + ModelRegistry extension).  Usable as a decorator."""
    _load_all()
    _REGISTRY[name or cls.__name__] = cls
    return cls


def get_model_class(config: ModelConfig) -> Type:
    _load_all()
    for arch in config.architectures:
        if arch in _REGISTRY:
            return _REGISTRY[arch]
    raise ValueError(
        f"None of architectures {config.architectures} supported. "
        f"Known: {sorted(_REGISTRY)}"
    )


def list_supported_architectures() -> List[str]:
    _load_all()
    return sorted(_REGISTRY)
