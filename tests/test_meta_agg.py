"""Metadata-only aggregates: count/min/max/null-count from manifest stats.

The Iceberg/Trino metadata-query optimization: on a compacted table the
answer folds from KBs of manifest JSON with ZERO Spark jobs (proven here by
passing ``spark=None``); merge-on-read deltas and unprovable stats fall back
to scanning exactly the unprovable files — the result is always exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logicaldecoding_spark.operators.merge import merge_into
from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA, TableSchema
from logicaldecoding_spark.table.format import LakeTable

NUM_SCHEMA = TableSchema.initial(
    [("repo", "string", False), ("path", "string", False),
     ("size", "long", True), ("lang", "string", True)]
)


def _num_compacted(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, size long, lang string,"
        " op string, lsn long, seq int, txid long",
    )


def _mk(spark, tmp_path, rows, mode="cow"):
    t = LakeTable.create(str(tmp_path / "t"), NUM_SCHEMA, n_buckets=4)
    merge_into(spark, t, _num_compacted(spark, rows),
               applied_upto_lsn=max(r[5] for r in rows), batch_id=0,
               mode=mode)
    return t


def test_pure_cow_answers_without_spark(spark, tmp_path):
    rows = [(f"r{i}", "p", 10 * i, ("py" if i % 3 else None), "I", i + 1, 0, 1)
            for i in range(30)]
    t = _mk(spark, tmp_path, rows)
    # spark=None: any Spark job would raise — this IS the zero-jobs proof
    got = t.agg_stats(None, cols=("size", "lang"))
    assert got["scanned_files"] == 0
    assert got["rows"] == 30
    assert got["cols"]["size"] == {"min": 0, "max": 290, "nulls": 0}
    assert got["cols"]["lang"]["min"] == "py"
    assert got["cols"]["lang"]["nulls"] == 10  # i % 3 == 0
    # cross-check against the real scan
    r = t.read(spark).agg(
        F.count(F.lit(1)), F.min("size"), F.max("size")).collect()[0]
    assert (r[0], r[1], r[2]) == (30, 0, 290)


def test_mor_deltas_scan_only_reconcile_files(spark, tmp_path):
    rows = [(f"r{i}", "p", i, "py", "I", i + 1, 0, 1) for i in range(30)]
    t = _mk(spark, tmp_path, rows)
    # a delta deleting one key and upserting another
    merge_into(spark, t, _num_compacted(
        spark, [("r0", "p", None, "py", "D", 100, 0, 2),
                ("r1", "p", 999, "py", "U", 101, 0, 2)]),
        applied_upto_lsn=101, batch_id=1, mode="mor")
    with pytest.raises(ValueError):
        t.agg_stats(None)  # reconcile files require a scan — loudly
    got = t.agg_stats(spark, cols=("size",))
    assert got["rows"] == t.read(spark).count() == 29
    assert got["cols"]["size"]["max"] == 999
    # only the delta's overlap component scanned, not the whole manifest
    assert 0 < got["scanned_files"] < len(
        t.metadata()["snapshot"]["manifest"])


def test_metadata_only_even_after_rename(spark, tmp_path):
    rows = [(f"r{i}", "p", i, "py", "I", i + 1, 0, 1) for i in range(10)]
    t = _mk(spark, tmp_path, rows)
    t.evolve_schema("rename_column", "size", "bytes", None)
    got = t.agg_stats(None, cols=("bytes",))  # old-name stats, new name
    assert got["scanned_files"] == 0
    assert got["cols"]["bytes"] == {"min": 0, "max": 9, "nulls": 0}


def test_column_added_later_counts_nulls_from_metadata(spark, tmp_path):
    rows = [(f"r{i}", "p", i, "py", "I", i + 1, 0, 1) for i in range(10)]
    t = _mk(spark, tmp_path, rows)
    t.evolve_schema("add_column", "stars", "long", None)
    got = t.agg_stats(None, cols=("stars",))
    assert got["scanned_files"] == 0
    assert got["cols"]["stars"] == {"min": None, "max": None, "nulls": 10}


def test_truncated_string_bound_falls_back_to_exact_scan(spark, tmp_path):
    long_v = "z" * 100  # > STATS_MAX_STR: footer max dropped, min truncated
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA,
                         n_buckets=2)
    merge_into(spark, t, spark.createDataFrame(
        [("r1", "p", "c1", "py", long_v, "I", 1, 0, 1),
         ("r2", "p", "c2", "py", "short", "I", 2, 0, 1)],
        "repo string, path string, commit string, lang string,"
        " content string, op string, lsn long, seq int, txid long"),
        applied_upto_lsn=2, batch_id=0)
    got = t.agg_stats(spark, cols=("content",))
    assert got["scanned_files"] > 0  # honesty: never a bounds-only answer
    assert got["cols"]["content"]["max"] == long_v
    assert got["rows"] == 2
