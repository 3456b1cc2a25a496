"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the (small) query
  set against the corpus, score with JVM-side higher-order functions, pick
  top-k per query with a window.  One corpus scan, no shuffle of the corpus.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures (seeded,
  deterministic) computed by a vectorized pandas UDF (one numpy matmul per
  Arrow batch), multi-table bucketing, candidates = same-bucket rows in any
  table, exact cosine re-rank of candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import cosine


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are expected small (broadcast); scoring is row-local over one
    corpus scan.  Scores rounded to 4dp before ranking so results are stable
    across float summation orders (and against SQL oracles); ties broken by
    neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _multi_table_bucket_udf(planes: np.ndarray, n_tables: int, n_planes: int):
    """Pandas UDF computing ALL tables' sign-bit bucket ids in one matmul.

    planes is (n_tables*n_planes, dim); the result column is an
    array<long> of n_tables bucket ids per vector.  One Arrow batch = one
    (batch, dim) @ (dim, T*p) matmul — the per-table-UDF-pass formulation
    this replaces scanned the corpus n_tables times."""
    p = planes

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ p.T) > 0  # (batch, T*p)
        bits = bits.reshape(len(m), n_tables, n_planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        ids = (bits @ weights).astype(np.int64)  # (batch, T)
        return pd.Series(list(ids))

    return buckets


def lsh_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH: (id, table, bucket) — one row per table,
    produced by a single corpus scan (one multi-table UDF + posexplode)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    udf = _multi_table_bucket_udf(planes, n_tables, n_planes)
    return emb.select(F.col(id_col), udf(F.col(vec_col)).alias("_bs")).select(
        id_col, F.posexplode("_bs").alias("table", "bucket")
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates = same (table, bucket) in any table,
    exact cosine re-rank of candidates only.

    At corpus scale the candidate join is bucket-partitioned (no all-pairs);
    recall tunes with n_tables / n_planes."""
    cb = lsh_buckets(corpus, dim, n_planes, n_tables, seed, vec_col, id_col)
    qb = lsh_buckets(queries, dim, n_planes, n_tables, seed, vec_col, id_col)
    cand = (
        qb.alias("q")
        .join(
            cb.alias("c"),
            (F.col("q.table") == F.col("c.table"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col(f"q.{id_col}") != F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
        )
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
