"""End-to-end Spark pipeline tests: synthesize -> encode -> manifest ->
decode -> per-row token equality; resume-from-checkpoint idempotency."""

import json
import os
import shutil

import numpy as np
import pyspark.sql.functions as F
import pytest

from orc_rust_spark.functions.tokens import synthesize_tokens, tokens_from_documents
from orc_rust_spark.plans.pipeline import (
    decode_corpus,
    encode_corpus,
    read_manifest,
    verify_roundtrip,
)


@pytest.fixture(scope="module")
def token_df(spark):
    df = synthesize_tokens(spark, n_docs=400, seed=42, partitions=4).cache()
    df.count()
    return df


def test_roundtrip_end_to_end(spark, token_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stripes"))
    stats = encode_corpus(token_df, out, stripe_tokens=1 << 16, partitions=4)
    assert stats["waves_run"] == 1
    res = verify_roundtrip(token_df, spark, out)
    assert res["rows"] == 400
    assert res["mismatches"] == 0


def test_manifest_lineage(spark, token_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stripes"))
    encode_corpus(token_df, out, stripe_tokens=1 << 16, partitions=4)
    m = read_manifest(spark, out).toPandas()
    assert (m.n_rows > 0).all()
    assert m.n_rows.sum() == 400
    # token counts tracked exactly
    total_tokens = token_df.agg(F.sum("n_tok")).collect()[0][0]
    assert m.n_tokens.sum() == total_tokens
    # codecs recorded per column
    codecs = json.loads(m.codecs.iloc[0])
    assert set(codecs) == {"doc_id", "tokens", "n_tok", "source"}
    # checksums unique & deterministic across a re-encode
    out2 = str(tmp_path_factory.mktemp("stripes2"))
    encode_corpus(token_df, out2, stripe_tokens=1 << 16, partitions=4)
    m2 = read_manifest(spark, out2).toPandas()
    a = m.sort_values("stripe_id").checksum.tolist()
    b = m2.sort_values("stripe_id").checksum.tolist()
    assert a == b, "stripe bytes must be a pure function of the input"


def test_resume_skips_committed_waves(spark, token_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stripes"))
    full = encode_corpus(token_df, out, stripe_tokens=1 << 16, waves=4, partitions=4)
    assert full["waves_run"] == 4
    before = read_manifest(spark, out).toPandas().sort_values("stripe_id")

    # simulate a crash after wave 1: delete waves 2,3
    shutil.rmtree(os.path.join(out, "wave=2"))
    shutil.rmtree(os.path.join(out, "wave=3"))
    resumed = encode_corpus(token_df, out, stripe_tokens=1 << 16, waves=4, partitions=4)
    assert resumed["waves_skipped"] == 2
    assert resumed["waves_run"] == 2
    after = read_manifest(spark, out).toPandas().sort_values("stripe_id")
    assert before.checksum.tolist() == after.checksum.tolist()
    assert verify_roundtrip(token_df, spark, out)["mismatches"] == 0


def test_projection_and_pruning(spark, token_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stripes"))
    encode_corpus(token_df, out, stripe_tokens=1 << 16, partitions=4)
    # column projection decodes only requested streams
    cols = decode_corpus(spark, out, columns=["doc_id", "n_tok"])
    assert cols.columns == ["doc_id", "n_tok"]
    assert cols.count() == 400
    # stripe pruning by manifest doc range
    ids = sorted(r.doc_id for r in token_df.select("doc_id").collect())
    lo, hi = ids[10], ids[50]
    pruned = decode_corpus(spark, out, doc_id_range=(lo, hi))
    assert pruned.count() == 41


def test_tokens_from_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = tokens_from_documents(docs)
    row = tok.filter(F.col("n_tok") > 0).first()
    assert row is not None
    assert all(0 <= t < 50257 for t in row.tokens)
    # deterministic
    a = tok.agg(F.sum(F.expr("aggregate(tokens, 0L, (acc, x) -> acc + x)"))).collect()[0][0]
    b = tok.agg(F.sum(F.expr("aggregate(tokens, 0L, (acc, x) -> acc + x)"))).collect()[0][0]
    assert a == b
