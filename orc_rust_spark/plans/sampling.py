"""Sampling pass: per-column statistics via DataFrame aggregations that
route each column to a codec (`ColumnPlan`) before the encode pass.

This is the DataFrame-level half of the codec "optimizer" (SURVEY §4.3,
north_star): a vectorized partial-stats pass inside ``mapInArrow``
(run-length, value range, delta bit-widths, sampled cardinality per
partition) aggregated with plain Spark built-ins (`groupBy(col).agg`),
then a deterministic routing decision on the driver.  The *block-level*
decision tree (which RLEv2 sub-encoding each <=512-value block uses)
stays inside the kernel and always matches the reference exactly; this
pass only decides the per-column stream codec (RLEv2 vs FoR vs bit-pack
vs int-dictionary), saving the encode pass from trying every candidate
per stripe.

Scale note: the stats pass is one narrow map over the data (no shuffle)
plus a tiny aggregation; at 10^12 rows use `sample_fraction` to bound it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

from ..stripes import C_FOR, C_INT_DICT, C_RLEV2, ColumnPlan

_STATS_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("n_runs", T.LongType(), False),
    T.StructField("vmin", T.LongType(), False),
    T.StructField("vmax", T.LongType(), False),
    T.StructField("n_monotonic", T.LongType(), False),
    T.StructField("card_sample", T.LongType(), False),
    T.StructField("sample_n", T.LongType(), False),
])

_INT_PA = {pa.int8(), pa.int16(), pa.int32(), pa.int64()}


def _int_columns(schema: pa.Schema) -> list[str]:
    cols = []
    for f in schema:
        if f.type in _INT_PA:
            cols.append(f.name)
        elif pa.types.is_list(f.type) and f.type.value_type in _INT_PA:
            cols.append(f.name)
    return cols


def _col_values(batch: pa.RecordBatch, name: str) -> np.ndarray:
    arr = batch.column(name)
    if pa.types.is_list(arr.type):
        arr = arr.flatten()
    arr = arr.drop_null()
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def column_stats(df: DataFrame, sample_cap: int = 4096) -> DataFrame:
    """One narrow pass: per (column, partition) partial stats, then a
    built-in aggregation.  No per-row Python — numpy over Arrow batches."""
    int_cols = None

    def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[str, list[int]] = {}
        for batch in batches:
            cols = _int_columns(batch.schema)
            for name in cols:
                v = _col_values(batch, name)
                if len(v) == 0:
                    continue
                runs = int((v[1:] != v[:-1]).sum()) + 1
                mono = int(bool(len(v) > 2 and
                                (np.all(v[1:] >= v[:-1]) or np.all(v[1:] <= v[:-1]))))
                step = max(len(v) // sample_cap, 1)
                sample = v[::step][:sample_cap]
                card = len(np.unique(sample))
                a = acc.setdefault(name, [0, 0, int(v[0]), int(v[0]), 0, 0, 0])
                a[0] += len(v)
                a[1] += runs
                a[2] = min(a[2], int(v.min()))
                a[3] = max(a[3], int(v.max()))
                a[4] += mono
                a[5] = max(a[5], card)
                a[6] = max(a[6], len(sample))
        rows = [{"column": k, "n": a[0], "n_runs": a[1], "vmin": a[2],
                 "vmax": a[3], "n_monotonic": a[4], "card_sample": a[5],
                 "sample_n": a[6]} for k, a in acc.items()]
        if rows:
            yield pa.RecordBatch.from_pylist(rows)

    partials = df.mapInArrow(partial, _STATS_SCHEMA)
    return (partials.groupBy("column")
            .agg(F.sum("n").alias("n"),
                 F.sum("n_runs").alias("n_runs"),
                 F.min("vmin").alias("vmin"),
                 F.max("vmax").alias("vmax"),
                 F.sum("n_monotonic").alias("n_monotonic"),
                 F.max("card_sample").alias("card_sample"),
                 F.max("sample_n").alias("sample_n")))


def plan_codecs(stats: DataFrame) -> dict[str, ColumnPlan]:
    """Deterministic routing from aggregated stats to a per-column codec.

    - low sampled cardinality -> int dictionary
    - run-heavy or monotonic -> RLEv2 (its run/delta sub-encodings win)
    - narrow dense range with high entropy -> frame-of-reference
    - else RLEv2 (the reference's own default, `writer/stripe.rs:178`)
    """
    plans: dict[str, ColumnPlan] = {}
    for r in stats.collect():
        n, n_runs = r["n"], max(r["n_runs"], 1)
        avg_run = n / n_runs
        spread = r["vmax"] - r["vmin"]
        low_card = (r["sample_n"] >= 256 and
                    r["card_sample"] * 8 <= r["sample_n"])
        if low_card and spread > 1 << 20:
            plans[r["column"]] = ColumnPlan(codec=C_INT_DICT)
        elif avg_run >= 1.3 or r["n_monotonic"] > 0:
            plans[r["column"]] = ColumnPlan(codec=C_RLEV2)
        elif 0 < spread < 1 << 24:
            plans[r["column"]] = ColumnPlan(codec=C_FOR)
        else:
            plans[r["column"]] = ColumnPlan(codec=C_RLEV2)
    return plans
