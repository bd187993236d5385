"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship end-to-end run — tokenize sf0.001
  documents, stripe-encode through the columnar engine, decode, join
  back to the input, and return a per-source summary proving the
  per-row token-array round-trip invariant (BASELINE input_hint).
- ``queries()`` / ``oracle_sql()``: the full operator registry lives in
  ``orc_rust_spark.queries`` — codec round-trips over every testdata
  table, the token pipeline (projection, stripe pruning), and
  training-data ops (dedup, MinHash-LSH, SimHash, Jaccard, lang-id,
  quality, fingerprints, cosine top-k) with DuckDB oracles.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from orc_rust_spark import queries as _registry  # noqa: E402
from orc_rust_spark.functions.tokens import TOKEN_SCHEMA, tokens_from_documents  # noqa: E402
from orc_rust_spark.operators.decode import decode_pass  # noqa: E402
from orc_rust_spark.operators.encode import encode_pass  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize -> encode -> decode -> verify -> summarize."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    tok = tokens_from_documents(docs)
    parts = min(spark.sparkContext.defaultParallelism, 8)
    ranged = tok.repartitionByRange(parts, "doc_id").sortWithinPartitions("doc_id")
    stripes = encode_pass(ranged, stripe_tokens=1 << 16)
    decoded = decode_pass(stripes, TOKEN_SCHEMA)
    left = tok.select("doc_id", F.col("tokens").alias("t_in"),
                      F.col("source").alias("src"))
    right = decoded.select("doc_id", F.col("tokens").alias("t_out"))
    joined = left.join(right, "doc_id", "left")
    return (joined
            .groupBy("src")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.size("t_in")).alias("n_tokens"),
                 F.sum(F.when(F.col("t_in").eqNullSafe(F.col("t_out")), 1)
                       .otherwise(0)).alias("n_roundtrip_exact"))
            .orderBy("src"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
