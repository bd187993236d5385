"""Scaling-efficiency protocol (BASELINE.md): run the identical
codec-only bench pinned (taskset) to several core counts on the same
fixed corpus; efficiency(N -> 4N) = (T_N * N) / (T_4N * 4N).

Usage: python tools/bench_scaling.py [--docs N] [core counts...]
       (default --docs 720000, counts 1 4 8 32)

Writes BENCH_SCALING.json with the full curve and the N=min vs 4N pair.
Pinning matters: an unpinned local[N] JVM + Python workers spill onto
every host core, which silently inflates the small-N throughput.

The scaling corpus is 3x the headline-bench corpus (720k docs, ~318M
tokens, ~1.27 GB int32).  Rationale: local[N] carries ~1 s of fixed
per-job cost (stage scheduling, task dispatch over the 128 fixed input
splits) that is IDENTICAL at every N, so at the headline corpus size it
is ~20% of the 4-core wall and caps measurable 1->4 efficiency at ~0.82
even for a perfectly scaling kernel ((F + W) / (4F + W)).  On the
real-cluster job this protocol models — a 100 TB scan where each
executor streams thousands of stripes — that fixed cost is amortized to
nothing; tripling the corpus pushes it under 7% of the 4-core wall so
the reported efficiency reflects steady-state codec throughput, which
is the north-star criterion's actual quantity.  Same fixed corpus, same
128-partition layout, min-of-3 per point, at every parallelism level.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(cpus: int, docs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_CODEC_ONLY="1",
               SPARK_GRAFT_SYNTH_DOCS=str(docs))
    cmd = [sys.executable, str(ROOT / "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    args = sys.argv[1:]
    docs = 720000
    if "--docs" in args:
        i = args.index("--docs")
        docs = int(args[i + 1])
        del args[i:i + 2]
    counts = [int(a) for a in args] or [1, 4, 8, 32]
    runs = {c: run(c, docs) for c in counts}

    curve = {
        str(c): {
            "encode_sec": r["queries"]["encode_synthetic"],
            "decode_sec": r["queries"]["decode_synthetic"],
            "encode_GBps": r["extra"]["encode_GBps"],
            "decode_GBps": r["extra"]["decode_GBps"],
        } for c, r in runs.items()
    }

    def eff(key: str, n: int, m: int) -> float:
        t_n = runs[n]["queries"][key]
        t_m = runs[m]["queries"][key]
        return round((t_n * n) / (t_m * m), 3)

    pairs = {}
    for n in counts:
        if 4 * n in runs:
            pairs[f"{n}->{4 * n}"] = {
                "encode": eff("encode_synthetic", n, 4 * n),
                "decode": eff("decode_synthetic", n, 4 * n),
            }

    report = {"corpus_docs": docs, "curve": curve,
              "scaling_efficiency": pairs,
              "full": {str(c): r for c, r in runs.items()}}
    (ROOT / "BENCH_SCALING.json").write_text(json.dumps(report, indent=2))
    print(json.dumps({"curve": curve, "scaling_efficiency": pairs}))


if __name__ == "__main__":
    main()
