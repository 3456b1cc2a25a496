"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Scale design (the point of running these on Spark):
* exact dedup        — one hash-aggregation; map-side combine, no data motion
                       beyond the hash shuffle.
* MinHash + LSH      — explode shingles once, compute all K minhashes in a
                       single aggregation pass, then band-bucket self-join:
                       candidate generation never compares all pairs
                       (O(n^2) -> O(sum of bucket^2), the standard LSH bound).
* SimHash            — vectorized pandas_udf (numpy bit-twiddling per Arrow
                       batch); near-dup = identical 64-bit signature or small
                       Hamming distance within LSH bands of the signature.
* n-gram Jaccard     — exact verification on candidate pairs only.
* embedding near-dup — cosine over candidate buckets (see similarity.py for
                       the ANN machinery).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import char_shingles, tokens
from ..functions.vectors import cosine

# 2^31-1: keeps a*x + b < 2^63 (no int64 overflow under ANSI arithmetic)
_MERSENNE = (1 << 31) - 1


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
                ) -> DataFrame:
    """Rank rows within identical-content groups; rank 1 = canonical copy.

    A pure hash-groupBy formulation: sha2 of the content is the group key, a
    deterministic (hash, id) window picks the keeper."""
    from pyspark.sql import Window as W

    h = F.sha2(F.col(text_col), 256)
    w = W.partitionBy(h).orderBy(F.col(id_col))
    return docs.select(
        F.col(id_col),
        h.alias("content_hash"),
        F.row_number().over(w).alias("dup_rank"),
        F.count("*").over(W.partitionBy(h)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """K-permutation MinHash signatures over character-shingle sets.

    One explode + one aggregation computes all K minima simultaneously
    (h_i(x) = (a_i * x + b_i) mod p over xxhash64 shingle values) — a single
    shuffle keyed by doc id, independent of K."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64)

    sh = docs.select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), shingle_k)).alias("sh")
    ).withColumn("x", F.abs(F.xxhash64("sh")) % F.lit(_MERSENNE))

    aggs = [
        F.min((F.lit(int(a[i])) * F.col("x") + F.lit(int(b[i]))) % F.lit(_MERSENNE))
        .alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 16, rows: int = 4
) -> DataFrame:
    """Band the signature, bucket-join within bands -> candidate pairs.

    Emits (id_a < id_b) distinct pairs that collide in >=1 band.  The
    self-join is per (band, bucket): only same-bucket rows ever meet, which
    is what keeps this sub-quadratic at corpus scale."""
    sig_cols = [c for c in signatures.columns if c != id_col]
    assert len(sig_cols) >= bands * rows, "need k >= bands*rows minhashes"
    banded = signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(*[F.col(sig_cols[bi * rows + r]) for r in range(rows)])
                        .alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates -> exact Jaccard verify."""
    sigs = minhash_signatures(docs, text_col, id_col, k, shingle_k, seed)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows)
    return ngram_jaccard_verify(docs, cands, text_col, id_col, threshold, shingle_k)


def ngram_jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (id_a, id_b)."""
    sh = docs.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_k).alias("sh")
    )
    a = sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a")
    b = sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b")
    j = (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return j


def ngram_jaccard_all_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (small inputs / oracle baseline).

    The quadratic baseline the LSH path approximates; SQL-checkable."""
    sh = docs.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_k).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (vectorized pandas UDF: numpy bit ops per Arrow batch)
# ---------------------------------------------------------------------------
@F.pandas_udf(T.LongType())
def _simhash64(token_arrays: pd.Series) -> pd.Series:
    """64-bit SimHash of a token list: sign of per-bit weighted sums of
    token hashes.  Token hash = splitmix64 of a stable string hash."""
    out = np.empty(len(token_arrays), dtype=np.int64)
    for i, toks in enumerate(token_arrays):
        if toks is None or len(toks) == 0:
            out[i] = 0
            continue
        hs = np.array(
            [np.uint64(hash_str64(t)) for t in toks], dtype=np.uint64
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        sums = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for bpos in np.nonzero(sums > 0)[0]:
            sig |= np.uint64(1) << np.uint64(bpos)
        out[i] = np.int64(sig)
    return pd.Series(out)


def hash_str64(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a + splitmix finalizer) —
    stable across processes (unlike Python's seeded hash())."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    # splitmix64 finalize
    h ^= h >> 30
    h = (h * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 27
    h = (h * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 31
    return h


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
            ) -> DataFrame:
    return docs.select(
        F.col(id_col), _simhash64(tokens(F.col(text_col))).alias("simhash")
    )


def simhash_dup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded for scale:
    the 64-bit signature splits into 4 16-bit bands; a pair within Hamming
    distance <=3 must agree exactly on >=1 band (pigeonhole), so the
    self-join is band-bucketed, not all-pairs."""
    sig = simhash(docs, text_col, id_col)
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bucket")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def embedding_neardup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicates (all-pairs form; for corpus scale,
    route candidates through similarity.lsh_buckets first)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
