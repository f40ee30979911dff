"""Model weight loading.

Equivalent role to the reference's ``model_loader/loader.py``
(``DefaultModelLoader`` :354 — safetensors streaming with per-layer TP
sharding via weight_loader attrs; ``DummyModelLoader`` :1373 — random
weights for topology/perf tests).

TPU-native approach: tensors stream from safetensors into host numpy
buffers shaped for our stacked-[L, ...] param tree, then a single
``jax.device_put`` per param places them with their NamedSharding (XLA
splits the host buffer across devices; no per-rank loader processes).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def _tree_get(tree: Dict[str, Any], path: str):
    node = tree
    for part in path.split("."):
        node = node[part]
    return node


def _tree_set(tree: Dict[str, Any], path: str, value):
    parts = path.split(".")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def _iter_paths(tree: Dict[str, Any], prefix=""):
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            yield from _iter_paths(v, p)
        else:
            yield p, v


def load_dummy_weights(model, mesh_ctx=None, seed: int = 0):
    """Random weights generated ON DEVICE, sharded at creation.

    Reference role: ``model_loader/loader.py:1373`` (DummyModelLoader).
    TPU note: host→device over a tunneled link can be ~10 MiB/s, so
    uploading GBs of dummy weights would take minutes; a jitted init
    renders them directly in HBM in milliseconds.
    """
    import math
    import zlib

    shapes = model.param_shapes()
    specs = model.param_specs()
    dtype = model.config.dtype

    def is_norm(path: str) -> bool:
        leaf = path.split(".")[-1]
        return "ln" in leaf or "norm" in leaf

    def init(key):
        def build(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                p = f"{prefix}.{k}" if prefix else k
                if isinstance(v, dict):
                    out[k] = build(v, p)
                elif is_norm(p):
                    out[k] = jnp.ones(v, dtype=dtype)
                else:
                    sub = jax.random.fold_in(key, zlib.crc32(p.encode()))
                    scale = 1.0 / math.sqrt(v[-1]) if len(v) > 1 else 1.0
                    out[k] = scale * jax.random.normal(sub, v, dtype=dtype)
            return out

        return build(shapes)

    out_shardings = None
    if mesh_ctx is not None:
        out_shardings = jax.tree_util.tree_map(
            lambda spec: mesh_ctx.sharding(*spec),
            specs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
        )
    fn = jax.jit(init, out_shardings=out_shardings)
    return fn(jax.random.PRNGKey(seed))


def load_safetensors_weights(model, config: ModelConfig, mesh_ctx=None):
    """Stream safetensors → stacked host buffers → sharded device arrays."""
    files = sorted(glob.glob(os.path.join(config.model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(
            f"No *.safetensors under {config.model_path!r}"
        )
    from safetensors import safe_open

    shapes = model.param_shapes()
    np_dtype = np.dtype(jnp.dtype(config.dtype).name) if jnp.dtype(
        config.dtype
    ) != jnp.bfloat16 else None  # bf16 handled via jnp view below

    # Host staging buffers (use jnp-compatible ml_dtypes via numpy view).
    import ml_dtypes

    host_dtype = np.dtype(
        {"bfloat16": ml_dtypes.bfloat16}.get(
            jnp.dtype(config.dtype).name, jnp.dtype(config.dtype).name
        )
    )

    host: Dict[str, Any] = {}

    def build(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = build(v, p)
            else:
                out[k] = np.zeros(v, dtype=host_dtype)
        return out

    host = build(shapes)
    mapping = model.hf_weight_mapping()
    seen = set()

    n_loaded = 0
    for file in files:
        with safe_open(file, framework="numpy") as f:
            for name in f.keys():
                m = mapping(name)
                if m is None:
                    continue
                path, layer_idx, transform = m
                tensor = f.get_tensor(name)
                if transform == "t":
                    tensor = tensor.T
                dest = _tree_get(host, path)
                if layer_idx is None:
                    np.copyto(dest, tensor.astype(host_dtype, copy=False))
                elif isinstance(layer_idx, tuple):  # (layer, expert) etc.
                    sub = dest
                    for ix in layer_idx[:-1]:
                        sub = sub[ix]
                    np.copyto(
                        sub[layer_idx[-1]],
                        tensor.astype(host_dtype, copy=False),
                    )
                else:
                    np.copyto(
                        dest[layer_idx], tensor.astype(host_dtype, copy=False)
                    )
                seen.add(
                    (
                        path,
                        layer_idx[0]
                        if isinstance(layer_idx, tuple)
                        else layer_idx,
                    )
                )
                n_loaded += 1
    logger.info("Loaded %d tensors from %d safetensors files", n_loaded, len(files))

    # Sanity: every param got at least one write.  Any top-level subtree
    # named *layers* is a stacked per-layer dict (leading dim = depth).
    expected = set()
    for p, shape in _iter_paths(shapes):
        top = p.split(".", 1)[0]
        if top.endswith("layers") and "." in p:
            for li in range(shape[0]):
                expected.add((p, li))
        else:
            expected.add((p, None))
    missing = expected - seen
    if missing:
        raise RuntimeError(f"Missing weights for: {sorted(missing)[:10]} ...")

    return _place_params(model, host, mesh_ctx)


def _place_params(model, host_params, mesh_ctx):
    specs = model.param_specs()

    def place(path_tree, spec_tree):
        out = {}
        for k, v in path_tree.items():
            if isinstance(v, dict):
                out[k] = place(v, spec_tree[k])
            else:
                arr = jnp.asarray(v, dtype=model.config.dtype)
                if mesh_ctx is not None:
                    arr = jax.device_put(arr, mesh_ctx.sharding(*spec_tree[k]))
                out[k] = arr
        return out

    return place(host_params, specs)


def load_model_weights(model, config: ModelConfig, load_format: str, mesh_ctx=None):
    if load_format == "dummy":
        return load_dummy_weights(model, mesh_ctx)
    if load_format in ("auto", "safetensors"):
        return load_safetensors_weights(model, config, mesh_ctx)
    raise ValueError(f"Unknown load_format {load_format!r}")
