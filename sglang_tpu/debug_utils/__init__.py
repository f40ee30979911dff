"""Debug utilities: tensor dumping + cross-run dump comparison.

Equivalent role to the reference's ``debug_utils/`` (``dumper.py`` tensor
dump hooks, ``dump_comparator.py`` cross-run diffing) — used to bisect
numerical divergence between two configurations (backends, dtypes,
parallelism layouts) by dumping per-step arrays and diffing them.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class TensorDumper:
    """Writes named arrays to ``<dir>/<step:06d>_<name>.npy``."""

    def __init__(self, dump_dir: str):
        self.dump_dir = dump_dir
        os.makedirs(dump_dir, exist_ok=True)
        self.step = 0

    def dump(self, name: str, value: Any):
        arr = np.asarray(value)
        path = os.path.join(self.dump_dir, f"{self.step:06d}_{name}.npy")
        np.save(path, arr)

    def next_step(self):
        self.step += 1

    @staticmethod
    def attach(runner, dump_dir: str) -> "TensorDumper":
        """Wrap the runner's step functions to dump their outputs
        (reference dumper.py hook installation)."""
        dumper = TensorDumper(dump_dir)

        orig_extend = runner.extend_step
        orig_fetch = runner.decode_window_fetch

        def extend_step(*a, **k):
            out = orig_extend(*a, **k)
            if callable(out):  # return_async=True → wrap the finisher
                orig_finish = out

                def finish():
                    res = orig_finish()
                    dumper.dump("extend_tokens", res[0])
                    dumper.dump("extend_logprobs", res[1])
                    dumper.next_step()
                    return res

                return finish
            dumper.dump("extend_tokens", out[0])
            dumper.dump("extend_logprobs", out[1])
            dumper.next_step()
            return out

        def decode_window_fetch(handle):
            out = orig_fetch(handle)
            dumper.dump("decode_tokens", out[0])
            dumper.dump("decode_logprobs", out[1])
            dumper.next_step()
            return out

        runner.extend_step = extend_step
        runner.decode_window_fetch = decode_window_fetch
        return dumper


def compare_dumps(
    dir_a: str, dir_b: str, rtol: float = 1e-4, atol: float = 1e-5
) -> List[Dict[str, Any]]:
    """Diff two dump directories by file name; returns per-file reports
    (reference dump_comparator.py)."""
    names_a = {os.path.basename(p) for p in glob.glob(os.path.join(dir_a, "*.npy"))}
    names_b = {os.path.basename(p) for p in glob.glob(os.path.join(dir_b, "*.npy"))}
    reports: List[Dict[str, Any]] = []
    for name in sorted(names_a | names_b):
        rep: Dict[str, Any] = {"name": name}
        if name not in names_a or name not in names_b:
            rep["status"] = "missing_in_" + ("a" if name not in names_a else "b")
            reports.append(rep)
            continue
        a = np.load(os.path.join(dir_a, name))
        b = np.load(os.path.join(dir_b, name))
        if a.shape != b.shape:
            rep["status"] = "shape_mismatch"
            rep["shapes"] = (list(a.shape), list(b.shape))
        else:
            diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
            ok = np.allclose(a, b, rtol=rtol, atol=atol)
            rep["status"] = "match" if ok else "mismatch"
            rep["max_abs_diff"] = float(diff.max()) if diff.size else 0.0
            rep["mean_abs_diff"] = float(diff.mean()) if diff.size else 0.0
        reports.append(rep)
    return reports
