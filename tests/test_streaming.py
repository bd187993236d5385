"""Structured Streaming encode: drain-with-availableNow, per-row token
round-trip, and checkpointed resume (new files only after restart)."""

import os

import pyspark.sql.functions as F

from orc_rust_spark.functions.tokens import TOKEN_SCHEMA, synthesize_tokens
from orc_rust_spark.operators.decode import decode_pass
from orc_rust_spark.streaming.encode_stream import encode_stream


def _write_input(spark, n_docs, seed, path):
    synthesize_tokens(spark, n_docs, seed=seed, partitions=4) \
        .write.mode("append").parquet(path)


def test_streaming_encode_and_resume(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp, out, ckpt = (str(base / d) for d in ("in", "out", "ckpt"))
    _write_input(spark, 120, 1, inp)

    q = encode_stream(spark, inp, out, ckpt, stripe_tokens=1 << 16,
                      available_now=True)
    q.awaitTermination(120)

    stripes = spark.read.parquet(out)
    assert stripes.count() >= 1
    decoded = decode_pass(stripes, TOKEN_SCHEMA)
    src = spark.read.parquet(inp)
    joined = (src.select("doc_id", F.col("tokens").alias("a"))
              .join(decoded.select("doc_id", F.col("tokens").alias("b")), "doc_id"))
    n = src.count()
    assert joined.filter(F.col("a").eqNullSafe(F.col("b"))).count() == n

    # restart with NEW input files: checkpoint must skip the old ones
    _write_input(spark, 40, 2, inp)
    q2 = encode_stream(spark, inp, out, ckpt, stripe_tokens=1 << 16,
                       available_now=True)
    q2.awaitTermination(120)
    total = spark.read.parquet(inp).count()
    assert total == 160
    decoded2 = decode_pass(spark.read.parquet(out), TOKEN_SCHEMA)
    # every input row decoded exactly once (no duplicates from replay);
    # token mass matches the input exactly
    assert decoded2.count() == total
    in_mass = spark.read.parquet(inp).agg(F.sum("n_tok")).collect()[0][0]
    out_mass = decoded2.agg(F.sum("n_tok")).collect()[0][0]
    assert in_mass == out_mass
