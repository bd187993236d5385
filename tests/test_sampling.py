"""Sampling pass tests: DataFrame-aggregated column stats, codec routing,
and the invariant that a routed plan never increases compressed size
(RLEv2 stays a candidate)."""

import pyspark.sql.functions as F

from orc_rust_spark.functions.tokens import TOKEN_SCHEMA, synthesize_tokens
from orc_rust_spark.operators.decode import decode_pass
from orc_rust_spark.operators.encode import encode_pass
from orc_rust_spark.plans.sampling import column_stats, plan_codecs
from orc_rust_spark.stripes import C_RLEV2


def test_stats_and_plan(spark):
    tok = synthesize_tokens(spark, 300, seed=42, partitions=4).cache()
    stats = {r["column"]: r for r in column_stats(tok).collect()}
    assert set(stats) == {"tokens", "n_tok"}
    total = tok.agg(F.sum("n_tok")).collect()[0][0]
    assert stats["tokens"]["n"] == total
    assert 0 <= stats["tokens"]["vmin"] <= stats["tokens"]["vmax"] < 50262

    plans = plan_codecs(column_stats(tok))
    assert set(plans) == {"tokens", "n_tok"}

    # plan must not increase size vs the unplanned encoder (RLEv2 floor)
    plain = encode_pass(tok).agg(F.sum("output_bytes")).collect()[0][0]
    planned_df = encode_pass(tok, plans=plans)
    planned = planned_df.agg(F.sum("output_bytes")).collect()[0][0]
    assert planned <= plain
    # and decode still round-trips
    assert decode_pass(planned_df, TOKEN_SCHEMA).count() == 300


def test_plan_low_cardinality_routes_dict(spark):
    import pyarrow as pa
    from collections.abc import Iterator
    import numpy as np
    import pyspark.sql.types as T

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        if not any(b.num_rows for b in batches):
            return
        rng = np.random.default_rng(0)
        # 8 distinct values spread over a huge range -> dict should win
        vals = rng.choice(np.array([0, 1 << 40, 2 << 40, 3 << 40, 4 << 40,
                                    5 << 40, 6 << 40, 7 << 40]), 20000)
        yield pa.record_batch([pa.array(vals, pa.int64())], names=["x"])

    plan_df = spark.range(1).mapInArrow(
        gen, T.StructType([T.StructField("x", T.LongType())]))
    plans = plan_codecs(column_stats(plan_df))
    assert plans["x"].codec is not None
    assert C_RLEV2 in plans["x"].candidates()
