"""On-chip quant bench matrix (BENCH_quant_r05.json): run bench.py's
engine loop for each quantized config sequentially and collect the
JSON lines.  (r04 VERDICT next #2 — these were stale at r02.)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_quant_r05.py
"""

from __future__ import annotations

import json
import subprocess
import sys

CONFIGS = [
    ("flagship", "Llama-3.2-1B geometry bf16"),
    ("1b-int8", "Llama-3.2-1B geometry W8A8-INT8"),
    ("8b-int8", "Llama-3.1-8B geometry W8A8-INT8"),
    ("8b-awq", "Llama-3.1-8B geometry INT4-AWQ"),
]


def main():
    out = {"configs": []}
    for model, desc in CONFIGS:
        print(f"=== {model} ===", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, "bench.py", "--model", model],
                capture_output=True, text=True, timeout=2400,
                cwd="/root/repo",
            )
            line = [
                ln for ln in p.stdout.splitlines()
                if ln.startswith("{")
            ]
            if line:
                row = json.loads(line[-1])
                row["model"] = desc
                out["configs"].append(row)
                print(json.dumps(row), flush=True)
            else:
                out["configs"].append(
                    {"model": desc, "error": p.stderr[-800:]}
                )
                print("NO RESULT", p.stderr[-400:], flush=True)
        except subprocess.TimeoutExpired:
            out["configs"].append({"model": desc, "error": "timeout"})
            print("TIMEOUT", flush=True)
        with open("/root/repo/BENCH_quant_r05.json", "w") as f:
            json.dump(out, f, indent=2)
    print("wrote BENCH_quant_r05.json", flush=True)


if __name__ == "__main__":
    main()
