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


def _kmeans_centroids(
    samples: np.ndarray, n_clusters: int, iters: int, seed: int
) -> np.ndarray:
    """Seeded Lloyd k-means on an L2-normalized sample (spherical k-means:
    assignment by max cosine).  Driver-side numpy over a BOUNDED sample —
    the standard IVF coarse-quantizer training step."""
    rng = np.random.default_rng(seed)
    x = samples / np.maximum(np.linalg.norm(samples, axis=1, keepdims=True), 1e-12)
    cents = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def _ivf_assign_udf(cents: np.ndarray, n_probes: int):
    """Pandas UDF: the ``n_probes`` nearest centroid ids per vector (one
    matmul per Arrow batch)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cents.T  # (batch, n_clusters)
        top = np.argsort(-sims, axis=1)[:, :n_probes].astype(np.int32)
        return pd.Series(list(top))

    return probes


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_clusters: int = 16,
    n_probes: int = 6,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: coarse k-means quantizer (trained on a seeded
    bounded sample), corpus rows land in their nearest cluster, queries probe
    their ``n_probes`` nearest clusters, exact cosine re-ranks candidates.

    The scale shape: candidate volume ~ corpus * n_probes / n_clusters per
    query instead of all-pairs; at 100 TB raise n_clusters with corpus size
    (sqrt(N) rule) and keep the probe list short.  Deterministic (seeded
    sample + init); recall-gated vs knn_bruteforce in tests."""
    # bounded deterministic sample (hash-ordered top-k, not a full sort)
    rows = (
        corpus.select(F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample)
        .collect()
    )
    samples = np.array([list(r[0]) for r in rows], dtype=np.float64)
    cents = _kmeans_centroids(samples, n_clusters, iters, seed)

    assign1 = _ivf_assign_udf(cents, 1)
    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign1(F.col(vec_col))[0].alias("cluster"),
    )
    probe = _ivf_assign_udf(cents, n_probes)
    q_probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe(F.col(vec_col))).alias("cluster"),
    )
    scored = (
        c_assigned.join(F.broadcast(q_probes), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
        .select("query_id", "neighbor_id", "cos")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
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
    max_bucket_size: int | None = 5000,
    max_broadcast_queries: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = same (table, bucket) in any table,
    exact cosine re-rank of candidates only.

    At corpus scale the candidate join is bucket-routed with the CORPUS side
    never shuffling: the (small) query bucket set is broadcast, and the
    bucket-size cap uses the anti-join shape (aggregate sizes map-side,
    broadcast the over-cap bucket list) so the corpus stream stays map-local
    end-to-end until the candidate distinct.  A hot bucket meeting Q queries
    costs Q * bucket candidates; ``max_bucket_size`` bounds it (see
    operators.dedup.drop_oversized_buckets).

    ``max_broadcast_queries`` guards the query-side broadcast (ADVICE r4: an
    unconditionally-broadcast large query frame risks executor OOM): when
    set, a bounded count probes the query frame and a count above the bound
    degrades to the shuffle join (both sides hash-partition on
    (table, bucket) — correct, just no longer corpus-shuffle-free).  The
    default ``None`` skips the probe job entirely — the caller asserts the
    query set is broadcast-small, the usual kNN shape."""
    from .dedup import drop_oversized_buckets

    big_queries = False
    if max_broadcast_queries is not None:
        n_q = (
            queries.select(id_col).limit(max_broadcast_queries + 1).count()
        )
        big_queries = n_q > max_broadcast_queries
    cb = lsh_buckets(corpus, dim, n_planes, n_tables, seed, vec_col, id_col)
    cb = drop_oversized_buckets(
        cb, ("table", "bucket"), max_bucket_size, "knn_lsh", shape="antijoin"
    )
    qb = lsh_buckets(queries, dim, n_planes, n_tables, seed, vec_col, id_col)
    qb_side = qb.alias("q") if big_queries else F.broadcast(qb.alias("q"))
    cand = (
        qb_side
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
        cand.join(q if big_queries else F.broadcast(q), "query_id")
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
