"""Scaling-efficiency protocol (BASELINE.md): run the identical bench at
local[N] and local[4N] on the same input, compute throughput scaling
efficiency eff = (T_N * N) / (T_4N * 4N) for the encode and decode
stages, and write the evidence to BENCH_SCALING.json.

Usage: python tools/bench_scaling.py [N]   (default N=8 -> 8 vs 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run([sys.executable, str(ROOT / "bench.py")],
                         env=env, capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    lo = run(n)
    hi = run(4 * n)

    def eff(key: str) -> float:
        t_lo = lo["queries"][key]
        t_hi = hi["queries"][key]
        return round((t_lo * n) / (t_hi * 4 * n), 3)

    report = {
        "n": n,
        "4n": 4 * n,
        "encode_sec": {str(n): lo["queries"]["encode_synthetic"],
                       str(4 * n): hi["queries"]["encode_synthetic"]},
        "decode_sec": {str(n): lo["queries"]["decode_synthetic"],
                       str(4 * n): hi["queries"]["decode_synthetic"]},
        "encode_GBps": {str(n): lo["extra"]["encode_GBps"],
                        str(4 * n): hi["extra"]["encode_GBps"]},
        "decode_GBps": {str(n): lo["extra"]["decode_GBps"],
                        str(4 * n): hi["extra"]["decode_GBps"]},
        "encode_scaling_efficiency": eff("encode_synthetic"),
        "decode_scaling_efficiency": eff("decode_synthetic"),
        "full": {"lo": lo, "hi": hi},
    }
    (ROOT / "BENCH_SCALING.json").write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != "full"}))


if __name__ == "__main__":
    main()
