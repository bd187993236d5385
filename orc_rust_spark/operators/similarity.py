"""Similarity search over an embedding column (`array<float>`).

Two paths, per the training-data-pipeline brief:

- ``cosine_topk``: exact brute-force baseline — broadcast the (small)
  query set against every row, cosine via built-in HOFs (JVM-side, no
  Python), rank with a window.  O(Q*N) but embarrassingly parallel; the
  correctness oracle for the ANN path.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH with L
  independent tables of b planes each (OR-amplified banding: collision
  probability 1-(1-p^b)^L, the standard recall lever).  A seeded
  hyperplane tensor (a pure function of (dim, L, b, seed), so identical
  on every executor) maps each vector to L bucket keys inside one
  vectorized ``mapInArrow`` (numpy matmul); candidates come from an
  equi-join on (table, bucket) — a hash-partitioned shuffle, never a
  cross join — and exact cosine re-ranks them.

At 10^12 rows each vector is shuffled L times over a (L * 2^b)-key
space; AQE's skew-join splits hot buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window
import pyspark.sql.types as T


def _cosine(a: str, b: str) -> F.Column:
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                 "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    na = F.sqrt(F.expr(f"aggregate({a}, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)"))
    nb = F.sqrt(F.expr(f"aggregate({b}, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)"))
    return dot / (na * nb)


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k: queries (qid, qv) x emb (vec_id, embedding)."""
    q = queries.select(F.col("vec_id").alias("qid"),
                       F.col("embedding").cast("array<double>").alias("qv"))
    e = emb.select(F.col("vec_id").alias("nid"),
                   F.col("embedding").cast("array<double>").alias("bv"))
    sims = F.broadcast(q).crossJoin(e).select(
        "qid", "nid", _cosine("qv", "bv").alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", F.col("rank").cast("int").alias("rank")))


def _bucket_udf(dim: int, n_tables: int, n_planes: int, seed: int):
    """mapInArrow stage: vector -> L (table, bucket) keys via a seeded
    hyperplane tensor (identical on every executor — a pure function of
    (dim, n_tables, n_planes, seed))."""
    schema = pa.schema([("vec_id", pa.int64()), ("bucket", pa.int64())])

    def stage(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_tables * n_planes))
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        for b in batches:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            flat = b.column("embedding").flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(len(ids), dim).astype(np.float64)
            bits = (mat @ planes > 0).reshape(len(ids), n_tables, n_planes)
            local = bits @ weights  # (n, L) bucket within each table
            buckets = (np.arange(n_tables, dtype=np.int64) << 32) | local
            yield pa.record_batch(
                [pa.array(np.repeat(ids, n_tables)),
                 pa.array(buckets.reshape(-1))], schema=schema)

    return stage, T.StructType([
        T.StructField("vec_id", T.LongType()), T.StructField("bucket", T.LongType())])


def embedding_near_dup(emb: DataFrame, threshold: float = 0.4,
                       n_tables: int = 48, n_planes: int = 3,
                       dim: int = 64, seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    generation (equi-join on (table, bucket) — never a cross join) +
    exact cosine confirm at `threshold`.  The scale shape of
    embedding-based dedup for a training-data pipeline: at 10^12 rows
    the bucket join is hash-partitioned and AQE splits hot buckets;
    the confirm only touches candidate pairs."""
    stage, out_schema = _bucket_udf(dim, n_tables, n_planes, seed)
    buckets = emb.select("vec_id", "embedding").mapInArrow(stage, out_schema)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, "bucket")
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("ida"),
                    F.col("b.vec_id").alias("idb")).distinct())
    e1 = emb.select(F.col("vec_id").alias("ida"),
                    F.col("embedding").cast("array<double>").alias("va"))
    e2 = emb.select(F.col("vec_id").alias("idb"),
                    F.col("embedding").cast("array<double>").alias("vb"))
    return (cand.join(e1, "ida").join(e2, "idb")
            .select("ida", "idb", _cosine("va", "vb").alias("sim"))
            .filter(F.col("sim") >= threshold)
            .select("ida", "idb"))


def _train_centroids(emb: DataFrame, n_centroids: int, dim: int,
                     seed: int, sample_rows: int = 4096,
                     iters: int = 8) -> np.ndarray:
    """Deterministic IVF coarse quantizer: Lloyd iterations on a
    bounded driver-side sample (standard IVF practice — train on a
    sample, assign distributed)."""
    rows = emb.select("vec_id", "embedding") \
        .orderBy("vec_id").limit(sample_rows).collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), min(n_centroids, len(mat)),
                           replace=False)]
    for _ in range(iters):
        sims = mat @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def _cell_udf(cents: np.ndarray, nprobe: int):
    """mapInArrow stage: vector -> its `nprobe` nearest coarse cells
    (nprobe=1 for base vectors, >1 for queries)."""
    schema = pa.schema([("vec_id", pa.int64()), ("cell", pa.int32())])

    def stage(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            flat = b.column("embedding").flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(len(ids), cents.shape[1]).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ cents.T
            top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
            yield pa.record_batch(
                [pa.array(np.repeat(ids, nprobe)),
                 pa.array(top.reshape(-1))], schema=schema)

    return stage, T.StructType([
        T.StructField("vec_id", T.LongType()), T.StructField("cell", T.IntegerType())])


def ann_ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                 n_centroids: int = 16, nprobe: int = 8, dim: int = 64,
                 seed: int = 7) -> DataFrame:
    """IVF ANN: deterministic coarse quantizer (sample-trained k-means)
    partitions vectors into cells; a query probes its `nprobe` nearest
    cells and exact-re-ranks only those candidates.  The inverted-file
    alternative to the hyperplane-LSH path — at 100 TB the cell id is a
    partitioning key, so candidate fetch is a co-partitioned equi-join
    over ~nprobe/n_centroids of the data."""
    cents = _train_centroids(emb, n_centroids, dim, seed)
    base_stage, out_schema = _cell_udf(cents, 1)
    q_stage, _ = _cell_udf(cents, nprobe)
    base_cells = emb.select("vec_id", "embedding").mapInArrow(base_stage, out_schema)
    q_cells = queries.select("vec_id", "embedding") \
        .mapInArrow(q_stage, out_schema).withColumnRenamed("vec_id", "qid")
    cand = (q_cells.join(base_cells, "cell")
            .select("qid", F.col("vec_id").alias("nid")).distinct())
    q = queries.select(F.col("vec_id").alias("qid"),
                       F.col("embedding").cast("array<double>").alias("qv"))
    e = emb.select(F.col("vec_id").alias("nid"),
                   F.col("embedding").cast("array<double>").alias("bv"))
    sims = (cand.join(F.broadcast(q), "qid").join(e, "nid")
            .select("qid", "nid", _cosine("qv", "bv").alias("sim")))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", F.col("rank").cast("int").alias("rank")))


def ann_lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                 n_tables: int = 16, n_planes: int = 4, dim: int = 64,
                 seed: int = 7) -> DataFrame:
    """Approximate top-k via L-table hyperplane LSH + exact re-rank."""
    stage, out_schema = _bucket_udf(dim, n_tables, n_planes, seed)

    base_buckets = emb.select("vec_id", "embedding").mapInArrow(stage, out_schema)
    q_buckets = queries.select("vec_id", "embedding") \
        .mapInArrow(stage, out_schema).withColumnRenamed("vec_id", "qid")

    cand = (q_buckets.join(base_buckets, "bucket")
            .select("qid", F.col("vec_id").alias("nid")).distinct())

    q = queries.select(F.col("vec_id").alias("qid"),
                       F.col("embedding").cast("array<double>").alias("qv"))
    e = emb.select(F.col("vec_id").alias("nid"),
                   F.col("embedding").cast("array<double>").alias("bv"))
    sims = (cand.join(F.broadcast(q), "qid").join(e, "nid")
            .select("qid", "nid", _cosine("qv", "bv").alias("sim")))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", F.col("rank").cast("int").alias("rank")))
