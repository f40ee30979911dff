"""Plugin system: out-of-tree extensions loaded at engine startup.

Equivalent role to the reference's ``plugins/`` (``load_plugins()``
called from ``entrypoints/engine.py:212``): private forks register
custom models, speculative algorithms, or server-arg mutations without
patching the tree.

Discovery, in order:
1. Python entry points in group ``sglang_tpu.plugins`` (installed
   packages).
2. ``SGLANG_TPU_PLUGINS`` env var / ``ServerArgs.plugins`` — a
   comma-separated list of module paths.

A plugin module either exposes ``register(ctx)`` (called with a
:class:`PluginContext`) or simply performs registrations at import time
(e.g. calling ``sglang_tpu.models.registry.register_model``).
"""

from __future__ import annotations

import importlib
import os
from dataclasses import dataclass
from typing import Any, List, Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

_LOADED_PLUGINS: List[str] = []


@dataclass
class PluginContext:
    """What a plugin may extend."""

    server_args: Any = None

    def register_model(self, cls, name: Optional[str] = None):
        from sglang_tpu.models.registry import register_model

        return register_model(cls, name)


def load_plugins(server_args=None) -> List[str]:
    """Discover + import plugins; returns all loaded names.  Idempotent
    per module path."""
    ctx = PluginContext(server_args=server_args)
    modules: List[str] = []

    try:  # installed-package entry points
        from importlib import metadata

        for ep in metadata.entry_points(group="sglang_tpu.plugins"):
            modules.append(ep.value.split(":")[0])
    except Exception:
        pass

    env = os.environ.get("SGLANG_TPU_PLUGINS", "")
    modules += [m.strip() for m in env.split(",") if m.strip()]
    if server_args is not None:
        modules += list(getattr(server_args, "plugins", None) or [])

    for mod_path in modules:
        if mod_path in _LOADED_PLUGINS:
            continue
        try:
            mod = importlib.import_module(mod_path)
        except Exception as e:
            logger.warning("plugin %s failed to import: %s", mod_path, e)
            continue
        reg = getattr(mod, "register", None)
        if callable(reg):
            try:
                reg(ctx)
            except Exception as e:
                logger.warning("plugin %s register() failed: %s", mod_path, e)
                continue
        _LOADED_PLUGINS.append(mod_path)
        logger.info("loaded plugin: %s", mod_path)
    return list(_LOADED_PLUGINS)
