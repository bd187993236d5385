"""Two-cluster-size scaling, executor-granular (the closest sandbox
emulation of "N vs 4N executors" the north rule asks for):

- 1 executor  = one pinned 4-core local[4] Spark JVM encoding the WHOLE
  corpus.
- 4 executors = four simultaneous pinned 4-core local[4] JVMs on
  disjoint core sets, each encoding a disjoint quarter of the same
  corpus (files split round-robin).

Every executor warms up, signals ready, and waits for a shared go-flag,
so the timed window covers steady-state encode only — exactly what adds
executors to a cluster changes.  efficiency = T_1exec / (4 * T_4exec).

Usage: python tools/bench_multiexec.py  -> writes BENCH_MULTIEXEC.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
CORES_PER_EXEC = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "150000"))
CORPUS = os.environ.get("SPARK_GRAFT_CORPUS_DIR",
                        f"/tmp/tokencoder_corpus_{N_DOCS}")

_WORKER = r"""
import glob, json, os, sys, time
sys.path.insert(0, {root!r})
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
cores, idx, n_execs, ready, go, result = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
    sys.argv[4], sys.argv[5], sys.argv[6])
spark = (SparkSession.builder.master(f"local[{{cores}}]")
         .config("spark.sql.shuffle.partitions", str(cores))
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from orc_rust_spark.sources.parquet_arrow import scan_encode_parquet
files = sorted(glob.glob(os.path.join({corpus!r}, "*.parquet")))[idx::n_execs]
# full-pass warmup: a Python worker's first real encode costs 5-10x CPU
# (allocator arena growth + first-touch faults on ~100 MB of numpy
# temporaries), so every worker must see a real-sized stripe before the
# timed window or the measurement includes cold-start, not throughput
scan_encode_parquet(spark, files, stripe_tokens=1 << 21) \
    .agg(F.sum("output_bytes")).collect()
open(ready, "w").write("1")
while not os.path.exists(go):
    time.sleep(0.02)
t0 = time.monotonic()
r = scan_encode_parquet(spark, files, stripe_tokens=1 << 21) \
    .agg(F.sum("output_bytes"), F.sum("n_tokens")).collect()[0]
dt = time.monotonic() - t0
json.dump({{"sec": dt, "out_bytes": int(r[0]), "n_tokens": int(r[1])}},
          open(result, "w"))
spark.stop()
"""


def run_cluster(n_execs: int, tmp: str) -> dict:
    procs = []
    readies, results = [], []
    go = os.path.join(tmp, f"go_{n_execs}")
    script = os.path.join(tmp, "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER.format(root=str(ROOT), corpus=CORPUS))
    for i in range(n_execs):
        ready = os.path.join(tmp, f"ready_{n_execs}_{i}")
        result = os.path.join(tmp, f"result_{n_execs}_{i}")
        readies.append(ready)
        results.append(result)
        lo = i * CORES_PER_EXEC
        mask = f"{lo}-{lo + CORES_PER_EXEC - 1}"
        procs.append(subprocess.Popen(
            ["taskset", "-c", mask, sys.executable, script,
             str(CORES_PER_EXEC), str(i), str(n_execs), ready, go, result],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    while not all(os.path.exists(r) for r in readies):
        time.sleep(0.1)
        if any(p.poll() not in (None, 0) for p in procs):
            raise RuntimeError("executor died during warmup")
    t0 = time.monotonic()
    open(go, "w").write("1")
    for p in procs:
        p.wait(timeout=1800)
    wall = time.monotonic() - t0
    outs = [json.load(open(r)) for r in results]
    return {"wall_sec": round(wall, 3),
            "exec_sec": [o["sec"] for o in outs],
            "n_tokens": sum(o["n_tokens"] for o in outs),
            "out_bytes": sum(o["out_bytes"] for o in outs)}


def main() -> None:
    # ensure corpus exists (reuse bench.py's generator via a quick session)
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        env = dict(os.environ, SPARK_GRAFT_CPUS="32", SPARK_GRAFT_CODEC_ONLY="1",
                   SPARK_GRAFT_SYNTH_DOCS=str(N_DOCS))
        subprocess.run([sys.executable, str(ROOT / "bench.py")], env=env,
                       capture_output=True, timeout=3600)
    # run configs back-to-back in alternating PAIRS and compute the
    # efficiency within each pair: the host is a shared VM whose
    # identical runs vary 2-3x, and taking independent minima biases
    # efficiency downward (the 1-exec min catches the quietest window
    # while the 4-exec wall is already a max over its executors).
    # Pairing holds background load approximately equal across the two
    # configs being compared; all pairs are reported.
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    pairs = []
    for _ in range(reps):
        with tempfile.TemporaryDirectory() as tmp:
            a = run_cluster(1, tmp)
            b = run_cluster(4, tmp)
        thr1 = a["n_tokens"] * 4 / a["wall_sec"] / 1e9
        thr4 = b["n_tokens"] * 4 / b["wall_sec"] / 1e9
        pairs.append({
            "one_executor": a, "four_executors": b,
            "encode_GBps": {"1_exec": round(thr1, 4), "4_execs": round(thr4, 4)},
            "efficiency": round(thr4 / (4 * thr1), 3),
        })
    effs = sorted(p["efficiency"] for p in pairs)
    m = len(effs)
    median = effs[m // 2] if m % 2 else round((effs[m // 2 - 1]
                                               + effs[m // 2]) / 2, 3)
    # the HEADLINE is the median: max-of-pairs would reintroduce
    # selection bias (upward) on a host whose runs vary 2-3x — the
    # mirror image of the min-selection bias pairing removed
    report = {
        "cores_per_executor": CORES_PER_EXEC,
        "protocol": "alternating pairs; efficiency computed within each "
                    "pair at equal background load; headline = median",
        "pair_efficiencies": effs,
        "encode_scaling_efficiency_1_to_4_executors": median,
        "best_pair_efficiency": effs[-1],
        "pairs": pairs,
    }
    (ROOT / "BENCH_MULTIEXEC.json").write_text(json.dumps(report, indent=2))
    print(json.dumps({k: report[k] for k in
                      ("cores_per_executor", "pair_efficiencies",
                       "encode_scaling_efficiency_1_to_4_executors",
                       "best_pair_efficiency")}))


if __name__ == "__main__":
    main()
