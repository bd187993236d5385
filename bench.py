"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "extra": {...}}

Headline set = the engine's hot paths: token encode+decode (synthetic
corpus for a stable GB/s figure + documents-derived pipeline at the SF
dir), full-table codec round-trip, and the scale-path training-data ops
(MinHash-LSH dedup, SimHash, cosine top-k).

Scaling protocol (BASELINE.md): run `SPARK_GRAFT_CPUS=8 python bench.py`
vs `SPARK_GRAFT_CPUS=32 python bench.py` on the same input; efficiency =
(T_8 x 8) / (T_32 x 32) on the encode_synthetic throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "60000"))


def main() -> None:
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("tokencoder-bench")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
             .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from orc_rust_spark.functions.tokens import TOKEN_SCHEMA, synthesize_tokens
    from orc_rust_spark.operators.decode import decode_pass
    from orc_rust_spark.operators.encode import encode_pass
    from orc_rust_spark import queries as reg

    # warm the reused Python workers (numpy/pyarrow imports, allocator
    # pages) so timings measure steady-state throughput, not process spawn
    warm = synthesize_tokens(spark, 2 * CPUS, seed=7, partitions=CPUS)
    decode_pass(encode_pass(warm, stripe_tokens=1 << 18), TOKEN_SCHEMA).count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name: str, fn, reps: int = 1):
        best = None
        out = None
        for _ in range(reps):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # --- synthetic token corpus: the stable GB/s measurement -------------
    # partition layout is FIXED (not a function of CPUS) so every
    # parallelism level encodes the identical corpus — required by the
    # two-cluster-size scaling protocol (BASELINE.md)
    synth = synthesize_tokens(spark, N_SYNTH_DOCS, seed=42,
                              partitions=int(os.environ.get(
                                  "SPARK_GRAFT_SYNTH_PARTS", "128")))
    synth = synth.persist()
    n_docs, n_tokens = timed(
        "synth_materialize",
        lambda: tuple(synth.agg(F.count("*"), F.sum("n_tok")).collect()[0]))
    input_bytes = int(n_tokens) * 4  # int32 payload

    timed("encode_synthetic",
          lambda: encode_pass(synth, stripe_tokens=1 << 21)
          .agg(F.sum("output_bytes")).collect(), reps=2)
    stripes = encode_pass(synth, stripe_tokens=1 << 21).persist()
    out_bytes, n_stripes = tuple(
        stripes.agg(F.sum("output_bytes"), F.count("*")).collect()[0])
    extra["encode_GBps"] = round(input_bytes / timings["encode_synthetic"] / 1e9, 3)
    extra["bytes_per_token"] = round(int(out_bytes) / int(n_tokens), 3)
    extra["n_tokens"] = int(n_tokens)
    extra["n_stripes"] = int(n_stripes)
    extra["compression_ratio"] = round(input_bytes / int(out_bytes), 3)

    decoded_tokens = timed(
        "decode_synthetic",
        lambda: decode_pass(stripes, TOKEN_SCHEMA).agg(F.sum("n_tok")).collect()[0][0],
        reps=2)
    assert int(decoded_tokens) == int(n_tokens), "decode token-count mismatch"
    extra["decode_GBps"] = round(input_bytes / timings["decode_synthetic"] / 1e9, 3)
    stripes.unpersist()
    synth.unpersist()

    # --- SF-dir pipeline + training-data ops ----------------------------
    q = reg.queries()
    for name in ["roundtrip_tokens", "roundtrip_lineitem", "minhash_lsh_pairs",
                 "simhash", "embedding_topk", "exact_dedup", "lineitem_agg"]:
        timed(name, lambda name=name: q[name](spark, SF_DIR).count(), reps=2)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "extra": extra,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
