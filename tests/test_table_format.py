"""Table-format semantics: atomic commits, schema evolution, pruning,
crash-safety of the pointer swap."""

from __future__ import annotations

import json
import os

import pytest

from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA, TableSchema
from logicaldecoding_spark.table.format import LakeTable
from logicaldecoding_spark.operators.merge import merge_into


def _compacted(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " op string, lsn long, seq int, txid long",
    )


def test_create_and_load_roundtrip(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=16)
    t2 = LakeTable.load(str(tmp_path / "t"))
    assert t2.version == 0
    assert t2.n_buckets == 16
    assert t2.schema.names() == ["repo", "path", "commit", "lang", "content"]
    with pytest.raises(FileExistsError):
        LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA)


def test_schema_evolution_add_and_widen(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA)
    t.evolve_schema("add_column", "size", "int", applied_upto_lsn=10)
    t.evolve_schema("widen_type", "size", "long", applied_upto_lsn=20)
    s = t.schema
    f = {x.name: x for x in s.fields}
    assert f["size"].type == "long"
    # field id stability across the widen
    t1 = LakeTable.load(str(tmp_path / "t"))
    ids = {x.name: x.id for x in t1.schema.fields}
    old = t1.schema_by_id(1)  # after add, before widen
    assert {x.name: x.id for x in old.fields}["size"] == ids["size"]
    assert t1.applied_upto_lsn == 20


def test_illegal_widen_rejected(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA)
    with pytest.raises(ValueError):
        t.evolve_schema("widen_type", "commit", "long")  # string -> long: no
    with pytest.raises(ValueError):
        t.evolve_schema("add_column", "repo", "string")  # duplicate


def test_old_snapshot_survives_torn_commit(spark, tmp_path):
    """Crash between data-file write and pointer swap must leave the previous
    snapshot fully readable (the COW atomicity rule, SURVEY §7 step 3)."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(
        spark, t, _compacted(spark, [("r", "p", "c1", "py", "x", "I", 1, 0, 1)]),
        applied_upto_lsn=1, batch_id=0,
    )
    v = t.version
    # simulate the torn commit: orphan data file + newer metadata json exist,
    # but the hint was never swapped
    used_bucket = t.metadata()["snapshot"]["manifest"][0]["bucket"]
    orphan = os.path.join(t.path, "data", str(used_bucket), "orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a parquet file")
    fake_meta = dict(t.metadata())
    fake_meta["version"] = v + 1
    with open(os.path.join(t.path, "metadata", f"v{v+1}.metadata.json"), "w") as f:
        json.dump(fake_meta, f)
    # reader still sees the committed snapshot, and reads cleanly
    t2 = LakeTable.load(t.path)
    assert t2.version == v
    rows = t2.read(spark).collect()
    assert len(rows) == 1 and rows[0]["commit"] == "c1"


def test_history_and_time_travel(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(spark, t, _compacted(spark, [("r", "p", "c1", "py", "x", "I", 1, 0, 1)]),
               applied_upto_lsn=1, batch_id=0)
    merge_into(spark, t, _compacted(spark, [("r", "p", "c2", "py", "y", "U", 5, 0, 2)]),
               applied_upto_lsn=5, batch_id=1)
    h = t.history()
    assert [e["version"] for e in h] == [0, 1, 2]
    assert h[-1]["applied_upto_lsn"] == 5
    old = t.read_version(spark, 1).collect()
    new = t.read(spark).collect()
    assert old[0]["commit"] == "c1" and new[0]["commit"] == "c2"


def test_bucket_pruned_read_skips_files(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=8)
    rows = [(f"r{i}", "p", "c", "py", "x", "I", i + 1, 0, 1) for i in range(40)]
    merge_into(spark, t, _compacted(spark, rows), applied_upto_lsn=41, batch_id=0)
    all_buckets = {m["bucket"] for m in t.metadata()["snapshot"]["manifest"]}
    one = sorted(all_buckets)[0]
    df = t.read(spark, buckets=[one])
    # every returned row must actually hash to the pruned bucket
    from logicaldecoding_spark.table.format import bucket_expr

    got = df.withColumn("_b", bucket_expr(8)).select("_b").distinct().collect()
    assert {r["_b"] for r in got} == {one}
    # and the scan read strictly fewer rows than the table holds
    assert df.count() < 40
