"""Table maintenance (snapshot expiry, orphan cleanup) and the CDC-out
changelog scan (insert/update/delete between snapshots via the lineage
watermark)."""

from __future__ import annotations

import os

import pytest

from logicaldecoding_spark.operators.merge import merge_into
from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA
from logicaldecoding_spark.table.format import LakeTable


def _compacted(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " op string, lsn long, seq int, txid long",
    )


@pytest.fixture()
def table3(spark, tmp_path):
    """A table with 3 data snapshots: insert a+b, update a / insert c,
    delete b."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(spark, t, _compacted(spark, [
        ("r", "a", "c1", "py", "x", "I", 1, 0, 1),
        ("r", "b", "c2", "py", "y", "I", 2, 0, 1),
    ]), applied_upto_lsn=2, batch_id=0)
    merge_into(spark, t, _compacted(spark, [
        ("r", "a", "c3", "py", "x2", "U", 5, 0, 2),
        ("r", "c", "c4", "py", "z", "I", 6, 0, 2),
    ]), applied_upto_lsn=6, batch_id=1)
    merge_into(spark, t, _compacted(spark, [
        ("r", "b", None, None, None, "D", 9, 0, 3),
    ]), applied_upto_lsn=9, batch_id=2)
    return t


def test_changelog_between_snapshots(spark, table3):
    t = table3
    ch = {(r["path"], r["_change_type"]): r
          for r in t.read_changes(spark, from_version=1).collect()}
    assert set(ch) == {("a", "update"), ("c", "insert"), ("b", "delete")}
    assert ch[("a", "update")]["commit"] == "c3"
    assert ch[("c", "insert")]["commit"] == "c4"
    # delete carries the OLD row image
    assert ch[("b", "delete")]["commit"] == "c2"
    # bounded upper version: v1 -> v2 sees no delete yet
    ch12 = {(r["path"], r["_change_type"])
            for r in t.read_changes(spark, 1, 2).collect()}
    assert ch12 == {("a", "update"), ("c", "insert")}


def test_expire_snapshots_and_orphans(spark, table3):
    t = table3
    assert t.version == 3
    # drop an orphan (simulating a failed write) into the data dir
    orphan_rel = os.path.join("data", "batch-dead", "junk.parquet")
    os.makedirs(os.path.dirname(os.path.join(t.path, orphan_rel)))
    with open(os.path.join(t.path, orphan_rel), "wb") as f:
        f.write(b"junk")

    expired = t.expire_snapshots(keep_last=2)
    assert expired == [0, 1]
    assert [h["version"] for h in t.history()] == [2, 3]
    # current snapshot still reads fine
    assert {r["path"] for r in t.read(spark).collect()} == {"a", "c"}
    with pytest.raises(FileNotFoundError):
        t.read_version(spark, 1)

    removed = t.remove_orphan_files()
    assert orphan_rel in removed
    # v0/v1-only files may be reclaimed, but every retained file survives
    assert {r["path"] for r in t.read(spark).collect()} == {"a", "c"}
    assert {r["path"] for r in t.read_version(spark, 2).collect()} == {"a", "b", "c"}
    # a second pass finds nothing
    assert t.remove_orphan_files() == []


def test_commit_after_expiry_continues_sequence(spark, table3):
    t = table3
    t.expire_snapshots(keep_last=1)
    merge_into(spark, t, _compacted(spark, [
        ("r", "d", "c9", "py", "w", "I", 12, 0, 4),
    ]), applied_upto_lsn=12, batch_id=3)
    assert t.version == 4
    assert {r["path"] for r in t.read(spark).collect()} == {"a", "c", "d"}


def test_changelog_across_schema_evolution(spark, table3):
    """ADVICE r2: read_changes must not crash when the schema evolved between
    from_version and the current snapshot — the old-snapshot side is
    projected to the new schema (added column NULL-filled)."""
    t = table3
    t.evolve_schema("add_column", "stars", "long")
    stars_df = spark.createDataFrame(
        [("r", "a", "c5", "py", "x3", 7, "U", 11, 0, 4),
         ("r", "d", "c6", "py", "w", 9, "I", 12, 0, 4)],
        "repo string, path string, commit string, lang string, content string,"
        " stars long, op string, lsn long, seq int, txid long",
    )
    merge_into(spark, t, stars_df, applied_upto_lsn=12, batch_id=3)

    ch = {(r["path"], r["_change_type"]): r
          for r in t.read_changes(spark, from_version=2).collect()}
    assert set(ch) == {("a", "update"), ("d", "insert"), ("b", "delete")}
    assert ch[("a", "update")]["stars"] == 7
    # the delete row comes from the pre-evolution snapshot: NULL-filled
    assert ch[("b", "delete")]["stars"] is None
    assert ch[("b", "delete")]["commit"] == "c2"
