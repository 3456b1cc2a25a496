"""Recall gates for the hash-based (no-SQL-oracle) operators.

The reference's own verification method is convergence against an
independent oracle (reference src/types/mod.rs:323-324).  MinHash-LSH,
SimHash, and hyperplane-LSH ANN cannot carry a DuckDB oracle (they depend on
xxhash64 / seeded numpy hyperplanes), so each is gated here against the
exact in-repo baseline it approximates:

* minhash_dedup_pairs  vs  ngram_jaccard_all_pairs   (pair recall >= 0.9,
  precision exactly 1.0 — candidates are exact-verified)
* simhash              vs  a per-row Python reference of the same function,
  plus a must-find-exact-copies gate
* knn_lsh              vs  knn_bruteforce            (recall@10 >= 0.9)
* embedding_neardup_pairs_lsh  vs  the all-pairs baseline (EXACT set
  equality at test SFs — this is the value the driver's SQL oracle checks)

All seeds are fixed; results are deterministic, so green here means green
forever (no flaky-probability reruns).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_lsh_pair_recall(docs):
    from logicaldecoding_spark.operators.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_all_pairs,
    )

    sl = docs.filter(F.col("doc_id") < 200)
    exact = _pair_set(ngram_jaccard_all_pairs(sl, threshold=0.6, shingle_k=5))
    got = _pair_set(minhash_dedup_pairs(sl, threshold=0.6, shingle_k=5))
    assert exact, "baseline found no pairs — gate is vacuous"
    # precision is exact by construction (candidates are jaccard-verified)
    assert got <= exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"MinHash-LSH pair recall {recall:.3f} < 0.9"


def test_simhash_vectorized_matches_reference(spark, docs):
    """The loop-free numpy SimHash must equal a straightforward per-row
    Python evaluation of the same definition (majority vote over xxhash64
    token-hash bits)."""
    from logicaldecoding_spark.functions.text import tokens
    from logicaldecoding_spark.operators.dedup import simhash

    sample = docs.filter(F.col("doc_id") < 40)
    hashed = sample.select(
        "doc_id",
        F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t)).alias("hs"),
    ).collect()

    def ref(hs):
        if not hs:
            return 0
        u = [h & 0xFFFFFFFFFFFFFFFF for h in hs]
        sig = 0
        for b in range(64):
            ones = sum((h >> b) & 1 for h in u)
            if 2 * ones > len(u):
                sig |= 1 << b
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    expected = {r["doc_id"]: ref(r["hs"]) for r in hashed}
    got = {r["doc_id"]: r["simhash"] for r in simhash(sample).collect()}
    assert got == expected


def test_simhash_detects_exact_copies(docs):
    from logicaldecoding_spark.operators.dedup import simhash_dup_pairs

    base = docs.filter(F.col("doc_id") < 50)
    copies = base.withColumn("doc_id", F.col("doc_id") + F.lit(10_000))
    pairs = simhash_dup_pairs(base.unionByName(copies), max_hamming=8)
    found = {
        (r["id_a"], r["id_b"]) for r in pairs.filter(F.col("hamming") == 0).collect()
    }
    want = {(i, i + 10_000) for i in range(50)}
    assert want <= found, f"missing exact-copy pairs: {sorted(want - found)[:5]}"


def test_knn_lsh_recall_at_10(emb):
    from logicaldecoding_spark.operators.similarity import knn_bruteforce, knn_lsh

    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh(emb, queries, dim=64, k=10,
                         n_planes=4, n_tables=64).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"knn_lsh recall@10 {recall:.3f} < 0.9"


def test_embedding_lsh_equals_allpairs(emb):
    """The LSH-routed near-dup path must reproduce the all-pairs result
    EXACTLY at test SFs (this is what keeps the driver's SQL oracle green
    for dedup_embedding), and its plan must contain no cartesian join."""
    from logicaldecoding_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    allp = embedding_neardup_pairs(emb, threshold=0.4)
    lsh = embedding_neardup_pairs_lsh(emb, dim=64, threshold=0.4)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    a = {(r["id_a"], r["id_b"], r["cos"]) for r in allp.collect()}
    b = {(r["id_a"], r["id_b"], r["cos"]) for r in lsh.collect()}
    assert a, "all-pairs baseline found no pairs — gate is vacuous"
    assert a == b, (
        f"LSH missed {len(a - b)} pairs / invented {len(b - a)}; "
        f"first: {sorted(a ^ b)[:5]}"
    )


def test_knn_ivf_recall_at_10(emb):
    from logicaldecoding_spark.operators.similarity import knn_bruteforce, knn_ivf

    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(emb, queries, dim=64, k=10,
                         n_clusters=16, n_probes=10).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"knn_ivf recall@10 {recall:.3f} < 0.9"


# ---------------------------------------------------------------------------
# exact-equality gates pinning the DRIVER configurations (round-3): the
# entry's ANN/minhash queries now carry SQL oracles, which is only sound
# because their parameters make candidate sets cover the exact answer at
# driver SF.  These gates pin exactly those configurations against the
# in-repo exact baselines, so a parameter edit that breaks coverage fails
# here before it ships driver-red.
# ---------------------------------------------------------------------------
def _entry_queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def test_driver_minhash_equals_allpairs_exact(spark, docs):
    from logicaldecoding_spark.operators.dedup import ngram_jaccard_all_pairs

    sl = docs.filter(F.col("doc_id") < 200)
    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_all_pairs(sl, threshold=0.6, shingle_k=5).collect()
    }
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in _entry_queries()["dedup_minhash"](spark, SF_DIR).collect()
    }
    assert exact, "baseline found no pairs — gate is vacuous"
    assert got == exact, (
        f"driver minhash config no longer exact: missed {len(exact - got)}, "
        f"invented {len(got - exact)}"
    )


@pytest.mark.parametrize("name", ["knn_lsh", "knn_ivf"])
def test_driver_ann_equals_bruteforce_exact(spark, emb, name):
    from logicaldecoding_spark.operators.similarity import knn_bruteforce

    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in knn_bruteforce(emb, queries, k=10).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in _entry_queries()[name](spark, SF_DIR).collect()
    }
    assert got == exact, (
        f"driver {name} config no longer exact: missed {len(exact - got)}, "
        f"invented {len(got - exact)}"
    )


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark, caplog):
    """10k identical-signature docs put 10k rows in every band bucket; the
    cap must bound the candidate join (and log the drop) instead of
    emitting ~5e7 pairs per band.  Exact duplicates remain exact_dedup's
    job — it finds the whole clique with one hash aggregation."""
    import logging

    from logicaldecoding_spark.operators.dedup import (
        exact_dedup,
        flush_lsh_cap_stats,
        minhash_dedup_pairs,
    )

    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate text " * 20).alias("text"),
    )
    flush_lsh_cap_stats()  # clear pending stats from earlier tests
    with caplog.at_level(logging.WARNING, logger="logicaldecoding_spark.lsh"):
        pairs = minhash_dedup_pairs(docs, threshold=0.6, shingle_k=5,
                                    max_bucket_size=100)
        n = pairs.count()
        # drop accounting is deferred off the operator's critical path
        # (round-4): the flush evaluates + logs it on demand
        stats = flush_lsh_cap_stats()
    assert n == 0  # every bucket was degenerate -> dropped, join bounded
    assert any(s["dropped_rows"] > 0 for s in stats)
    assert any("over cap" in r.getMessage() for r in caplog.records), (
        "drop was silent: no over-cap log record"
    )
    top = exact_dedup(docs).agg(F.max("n_copies").alias("m")).collect()[0]
    assert top["m"] == 10_000


def test_prefix_join_exact_by_construction(spark, docs):
    """The PPJoin-style prefix join must equal the quadratic all-pairs
    answer EXACTLY (prefix/length/positional filters are necessary
    conditions — zero recall loss by the standard lemmas), at multiple
    thresholds, with no per-corpus tuning."""
    from logicaldecoding_spark.operators.dedup import (
        jaccard_prefix_join_pairs,
        ngram_jaccard_all_pairs,
    )

    for t in (0.5, 0.7, 0.9):
        exact = {tuple(r) for r in
                 ngram_jaccard_all_pairs(docs, threshold=t, shingle_k=5
                                         ).collect()}
        got = {tuple(r) for r in
               jaccard_prefix_join_pairs(docs, threshold=t, shingle_k=5
                                         ).collect()}
        assert got == exact, f"t={t}: missed {len(exact-got)}, invented {len(got-exact)}"


def test_array_sig_banding_validates_k(spark, docs):
    """A banding config needing more minhashes than the signature carries
    must FAIL FAST, not silently hash short slices into one degenerate
    bucket (ADVICE r4): plan-time via the minhash_k column metadata, and at
    runtime (raise_error) for externally-built signature frames that lack
    the metadata."""
    import pytest as _pytest

    from logicaldecoding_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sl = docs.filter(F.col("doc_id") < 50)
    sigs = minhash_signatures(sl, k=8, as_array=True)
    # metadata path: caught before any job runs (a real raise, -O-proof)
    with _pytest.raises(ValueError, match="bands\\*rows"):
        lsh_candidate_pairs(sigs, bands=16, rows=4)
    # metadata-stripped (foreign) signature frame: the job itself raises
    naked = sigs.select(
        "doc_id", F.col("_sig").alias("_sig", metadata={})
    )
    with _pytest.raises(Exception, match="shorter than bands\\*rows"):
        lsh_candidate_pairs(naked, bands=16, rows=4,
                            max_bucket_size=None).count()
    # valid config still works on both shapes
    assert lsh_candidate_pairs(sigs, bands=4, rows=2).count() >= 0
    assert lsh_candidate_pairs(naked, bands=4, rows=2).count() >= 0


def test_knn_lsh_query_broadcast_guard(emb):
    """max_broadcast_queries above the query count keeps the broadcast
    shape; below it the join degrades to the shuffle shape — both must
    return the identical result (ADVICE r4: the unconditional query-side
    broadcast had no OOM guard)."""
    from logicaldecoding_spark.operators.similarity import knn_lsh

    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(dim=64, k=10, n_planes=4, n_tables=64)
    base = {tuple(r) for r in knn_lsh(emb, queries, **kw).collect()}
    shuffled = {tuple(r) for r in
                knn_lsh(emb, queries, max_broadcast_queries=2, **kw
                        ).collect()}
    broadcast_ok = {tuple(r) for r in
                    knn_lsh(emb, queries, max_broadcast_queries=1000, **kw
                            ).collect()}
    assert base and base == shuffled == broadcast_ok
