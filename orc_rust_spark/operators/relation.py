"""Generic relation <-> stripes: encode ANY supported Spark DataFrame
through the columnar engine and decode it back.

This is the engine's general-purpose sink/source pair — the analog of
the reference's `ArrowWriter`/`ArrowReader` over arbitrary schemas
(`src/arrow_writer.rs:90-155`, `src/arrow_reader.rs:233-347`), not just
the token table.  Everything runs in ``mapInArrow`` (whole Arrow
batches, zero per-row Python); one task buffers its partition's batches
to the stripe row budget and emits (manifest columns + blob) rows.

Used by the correctness gate: every `/root/testdata` table round-trips
through ``roundtrip_relation`` and is compared value-by-value against a
DuckDB identity query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark import TaskContext
from pyspark.sql import DataFrame
import pyspark.sql.types as T

from ..stripes import ColumnPlan, decode_stripe, encode_stripe

RELATION_STRIPE_SCHEMA = T.StructType([
    T.StructField("stripe_id", T.StringType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("input_bytes", T.LongType(), False),
    T.StructField("output_bytes", T.LongType(), False),
    T.StructField("blob", T.BinaryType(), False),
])

_RELATION_PA_SCHEMA = pa.schema([
    ("stripe_id", pa.string()), ("n_rows", pa.int64()),
    ("input_bytes", pa.int64()), ("output_bytes", pa.int64()),
    ("blob", pa.binary()),
])


def encode_relation(df: DataFrame, stripe_rows: int = 65536,
                    plans: dict[str, ColumnPlan] | None = None) -> DataFrame:
    """Encode an arbitrary DataFrame into stripe rows (one blob per
    ~stripe_rows input rows, per partition)."""

    def encode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else 0
        seq = 0
        pending: list[pa.RecordBatch] = []
        pending_rows = 0

        def flush() -> pa.RecordBatch:
            nonlocal seq, pending, pending_rows
            tbl = pa.Table.from_batches(pending).combine_chunks()
            batch = tbl.to_batches()[0]
            blob = encode_stripe(batch, plans)
            row = {
                "stripe_id": f"r{part_id:06d}-{seq:05d}",
                "n_rows": tbl.num_rows,
                "input_bytes": tbl.nbytes,
                "output_bytes": len(blob),
                "blob": blob,
            }
            seq += 1
            pending, pending_rows = [], 0
            return pa.RecordBatch.from_pylist([row], schema=_RELATION_PA_SCHEMA)

        for batch in batches:
            if batch.num_rows == 0:
                continue
            pending.append(batch)
            pending_rows += batch.num_rows
            if pending_rows >= stripe_rows:
                yield flush()
        if pending:
            yield flush()

    return df.mapInArrow(encode_partition, RELATION_STRIPE_SCHEMA)


def decode_relation(stripes: DataFrame, out_schema: T.StructType,
                    columns: list[str] | None = None) -> DataFrame:
    """Decode stripe rows back to relation rows, optionally projecting."""
    blob_df = stripes.select("blob")

    def decode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            col = batch.column("blob")
            for i in range(batch.num_rows):
                yield decode_stripe(col[i].as_buffer(), columns=columns)

    return blob_df.mapInArrow(decode_partition, out_schema)


def roundtrip_relation(df: DataFrame, stripe_rows: int = 65536,
                       columns: list[str] | None = None,
                       plans: dict[str, ColumnPlan] | None = None) -> DataFrame:
    """encode -> decode in a single lazy plan; the correctness-gate shape.

    The output schema equals the input schema (all-nullable), projected
    to `columns` when given.
    """
    fields = [T.StructField(f.name, f.dataType, True) for f in df.schema.fields
              if columns is None or f.name in columns]
    return decode_relation(encode_relation(df, stripe_rows, plans),
                           T.StructType(fields), columns)
