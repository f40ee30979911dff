"""C++ model gateway: build + launch helper.

Equivalent role to the reference's ``sgl-model-gateway`` (Rust) launch
path — the data plane lives in ``gateway.cpp`` (cache-aware LB over an
approximate prefix tree, worker registry, HTTP/SSE relay); this module
compiles it with the system g++ on first use and manages the process.

Usage:
    python -m sglang_tpu.gateway --port 8080 \
        --worker 127.0.0.1:9001 --worker 127.0.0.1:9002
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
from typing import List, Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def build_gateway() -> str:
    """Compile gateway.cpp (cached by source digest); returns binary path."""
    src = os.path.join(os.path.dirname(__file__), "gateway.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    # Build into a user cache dir, NOT the installed package directory
    # (which may be read-only and must never accumulate binaries).
    cache_root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    try:
        build_dir = os.path.join(cache_root, "sglang_tpu", "gateway")
        os.makedirs(build_dir, exist_ok=True)
    except OSError:
        import tempfile

        build_dir = os.path.join(tempfile.gettempdir(), "sglang_tpu_gateway")
        os.makedirs(build_dir, exist_ok=True)
    binary = os.path.join(build_dir, f"gateway_{digest}")
    if not os.path.exists(binary):
        cmd = ["g++", "-O2", "-std=c++17", "-pthread", "-o", binary, src]
        logger.info("building gateway: %s", " ".join(cmd))
        subprocess.run(cmd, check=True)
    return binary


class GatewayProcess:
    """Owns a running gateway subprocess (tests / embedded launch)."""

    def __init__(self, port: int, workers: List[str],
                 policy: str = "cache_aware",
                 cache_threshold: float = 0.5,
                 max_retries: int = 2,
                 health_interval_ms: int = 2000,
                 pd_prefill=None,  # str or list of "host:port"
                 pd_decode=None,  # str or list of "host:port[=bootstrap]"
                 pd_bootstrap: Optional[str] = None,
                 discovery_file: Optional[str] = None,
                 discovery_interval_ms: int = 1000,
                 rate: Optional[str] = None,  # "R[:BURST]" per worker
                 cb_failures: Optional[int] = None,
                 cb_cooldown_ms: Optional[int] = None,
                 max_conn_threads: Optional[int] = None,
                 conn_queue: Optional[int] = None):
        binary = build_gateway()
        args = [binary, "--port", str(port), "--policy", policy,
                "--cache-threshold", str(cache_threshold),
                "--max-retries", str(max_retries),
                "--health-interval-ms", str(health_interval_ms)]
        if rate is not None:
            args += ["--rate", str(rate)]
        if cb_failures is not None:
            args += ["--cb-failures", str(cb_failures)]
        if cb_cooldown_ms is not None:
            args += ["--cb-cooldown-ms", str(cb_cooldown_ms)]
        if max_conn_threads is not None:
            args += ["--max-conn-threads", str(max_conn_threads)]
        if conn_queue is not None:
            args += ["--conn-queue", str(conn_queue)]
        for w in workers:
            args += ["--worker", w]
        if isinstance(pd_prefill, str):
            pd_prefill = [pd_prefill]
        if isinstance(pd_decode, str):
            pd_decode = [pd_decode]
        for p in pd_prefill or []:
            args += ["--pd-prefill", p]
        for d in pd_decode or []:
            args += ["--pd-decode", d]
        if pd_bootstrap:
            args += ["--pd-bootstrap", pd_bootstrap]
        if discovery_file:
            args += ["--discovery-file", discovery_file,
                     "--discovery-interval-ms", str(discovery_interval_ms)]
        self.proc = subprocess.Popen(
            args, stderr=subprocess.PIPE, text=True
        )
        # wait for the listen banner (also captures the bound port);
        # other startup banners (PD routing etc.) may precede it
        for _ in range(10):
            line = self.proc.stderr.readline()
            if "listening on port" in line:
                self.port = int(line.split("port")[1].split()[0])
                break
            if not line:
                raise RuntimeError("gateway exited before listening")
        else:
            raise RuntimeError("gateway never printed the listen banner")

    def stop(self):
        self.proc.terminate()
        try:
            self.proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            self.proc.kill()


def main(argv: Optional[List[str]] = None):
    import argparse

    ap = argparse.ArgumentParser(description="sglang-tpu model gateway")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--worker", action="append", default=[],
                    help="host:port of an engine HTTP server (repeat)")
    ap.add_argument("--policy", default="cache_aware",
                    choices=["cache_aware", "round_robin", "shortest_queue"])
    ap.add_argument("--cache-threshold", type=float, default=0.5)
    args = ap.parse_args(argv)
    binary = build_gateway()
    cmd = [binary, "--port", str(args.port), "--policy", args.policy,
           "--cache-threshold", str(args.cache_threshold)]
    for w in args.worker:
        cmd += ["--worker", w]
    os.execv(binary, cmd)


if __name__ == "__main__":
    main()
