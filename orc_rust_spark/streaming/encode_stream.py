"""Structured Streaming encode: continuously ingest token parquet files
and emit stripe blobs + manifest rows, exactly-once per micro-batch.

The reference has no streaming surface (SURVEY §2.6); this is the
Spark-native extension of the batch pipeline: `readStream` over a token
parquet directory -> the same `encode_pass` (mapInArrow works unchanged
on streaming DataFrames via foreachBatch) -> append-mode parquet sink.
The streaming checkpoint is the resume mechanism here (micro-batch
replay is idempotent because stripe bytes are a pure function of the
batch rows), complementing the batch pipeline's wave checkpoints.

Stripe ids are prefixed with the micro-batch id so lineage stays unique
across restarts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..functions.tokens import TOKEN_SCHEMA
from ..operators.encode import encode_pass
from ..stripes import ColumnPlan


def encode_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    stripe_tokens: int = 1 << 21,
    plans: dict[str, ColumnPlan] | None = None,
    max_files_per_trigger: int = 16,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the streaming encode; returns the query (await with
    `awaitTermination`).  With ``available_now`` the stream drains the
    current input and stops — the batch-catchup trigger."""
    src = (spark.readStream.schema(TOKEN_SCHEMA)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .parquet(input_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        stripes = encode_pass(batch_df, stripe_tokens, plans)
        (stripes.withColumn(
            "stripe_id", F.concat(F.lit(f"b{batch_id:08d}-"), F.col("stripe_id")))
            .write.mode("append").parquet(out_dir))

    writer = (src.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
