"""Incremental materialized aggregates (operators/mv.py): every refresh must
leave the MV equal to a from-scratch group-by over the source snapshot it
folded up to — across inserts, updates, group migration, deletes, min/max
retraction (the rescan path), group extinction, and NULL group keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logicaldecoding_spark.operators.merge import merge_into
from logicaldecoding_spark.operators.mv import MaterializedAggregate
from logicaldecoding_spark.schema import TableSchema
from logicaldecoding_spark.table.format import LakeTable

SRC_SCHEMA = TableSchema.initial([
    ("repo", "string", False),
    ("path", "string", False),
    ("lang", "string", True),
    ("stars", "long", True),
])

AGGS = {
    "n": ("count", "*"),
    "n_starred": ("count", "stars"),
    "sum_stars": ("sum", "stars"),
    "avg_stars": ("avg", "stars"),
    "min_stars": ("min", "stars"),
    "max_stars": ("max", "stars"),
}

LANGS = ["py", "go", "rs"]


def _apply(spark, t, rows, lsn, bid):
    df = spark.createDataFrame(
        rows,
        "repo string, path string, lang string, stars long,"
        " op string, lsn long, txid long",
    )
    merge_into(spark, t, df, applied_upto_lsn=lsn, batch_id=bid)


def _build_source(spark, tmp_path):
    """5 commits: base load, update+migrate+insert+delete, max-retraction
    delete, whole-group extinction, NULL-lang rows."""
    t = LakeTable.create(str(tmp_path / "src"), SRC_SCHEMA,
                         pk=("repo", "path"), n_buckets=8)
    base = [(f"r{i:03d}", "p", LANGS[i % 3], i, "I", i + 1, 1)
            for i in range(60)]
    _apply(spark, t, base, lsn=60, bid=0)
    _apply(spark, t, [
        ("r000", "p", "py", 500, "U", 100, 2),   # py max becomes 500
        ("r001", "p", "rs", 1, "U", 101, 2),     # go -> rs group migration
        ("r100", "p", "py", 7, "I", 102, 2),
        ("r002", "p", None, None, "D", 103, 2),  # delete an rs row
    ], lsn=103, bid=1)
    _apply(spark, t, [
        ("r000", "p", None, None, "D", 110, 3),  # retract the py max
    ], lsn=110, bid=2)
    # extinction: delete every remaining go row (i % 3 == 1, minus r001)
    go_keys = [f"r{i:03d}" for i in range(60) if i % 3 == 1 and i != 1]
    _apply(spark, t, [(k, "p", None, None, "D", 200 + j, 4)
                      for j, k in enumerate(go_keys)],
           lsn=200 + len(go_keys), bid=3)
    _apply(spark, t, [
        ("null1", "p", None, 11, "I", 300, 5),   # NULL group key
        ("null2", "p", None, 13, "I", 301, 5),
    ], lsn=301, bid=4)
    return t


def _recompute(spark, t, version):
    """Ground truth: from-scratch aggregate over the snapshot state."""
    df = t.read_version(spark, version)
    rows = df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("stars").alias("n_starred"),
        F.sum("stars").alias("sum_stars"),
        F.avg("stars").alias("avg_stars"),
        F.min("stars").alias("min_stars"),
        F.max("stars").alias("max_stars"),
    ).collect()
    return {r["lang"]: r.asDict() for r in rows}


def _mv_state(spark, mv):
    return {r["lang"]: r.asDict() for r in mv.read(spark).collect()}


def _assert_equal(got, want):
    assert set(got) == set(want), (set(got), set(want))
    for k in want:
        for c in ("n", "n_starred", "sum_stars", "min_stars", "max_stars"):
            assert got[k][c] == want[k][c], (k, c, got[k], want[k])
        if want[k]["avg_stars"] is None:
            assert got[k]["avg_stars"] is None, k
        else:
            assert got[k]["avg_stars"] == pytest.approx(
                want[k]["avg_stars"]), k


def test_mv_matches_full_recompute_at_every_version(spark, tmp_path):
    t = _build_source(spark, tmp_path)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"], AGGS, n_buckets=4)
    for entry in t.history():
        v = entry["version"]
        if v == 0:
            continue
        res = mv.refresh(spark, to_version=v)
        assert res["refreshed"] and res["cursor"] == v
        _assert_equal(_mv_state(spark, mv), _recompute(spark, t, v))


def test_mv_single_refresh_spanning_all_commits(spark, tmp_path):
    t = _build_source(spark, tmp_path)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"], AGGS, n_buckets=4)
    mv.refresh(spark)
    _assert_equal(_mv_state(spark, mv), _recompute(spark, t, t.version))


def test_mv_extinction_and_retraction_specifics(spark, tmp_path):
    t = _build_source(spark, tmp_path)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"], AGGS, n_buckets=4)
    versions = [e["version"] for e in t.history()][1:]
    # up to bid=1: py max is the updated 500
    mv.refresh(spark, to_version=versions[1])
    assert _mv_state(spark, mv)["py"]["max_stars"] == 500
    # bid=2 deletes that row: max must REGRESS (rescan path, not monotone)
    res = mv.refresh(spark, to_version=versions[2])
    assert res["rescanned"] >= 1
    st = _mv_state(spark, mv)
    assert st["py"]["max_stars"] == 57  # largest remaining i % 3 == 0... 57
    # bid=3 deletes every go row: the group vanishes
    mv.refresh(spark, to_version=versions[3])
    assert "go" not in _mv_state(spark, mv)
    # bid=4 adds NULL-key rows: one NULL group, SQL-style
    mv.refresh(spark)
    st = _mv_state(spark, mv)
    assert st[None]["n"] == 2 and st[None]["sum_stars"] == 24


def test_mv_refresh_is_idempotent_noop_at_head(spark, tmp_path):
    t = _build_source(spark, tmp_path)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"], AGGS, n_buckets=4)
    mv.refresh(spark)
    v_state = mv.table.version
    res = mv.refresh(spark)
    assert res["refreshed"] is False
    assert mv.table.version == v_state


def test_mv_cursor_survives_reload(spark, tmp_path):
    t = _build_source(spark, tmp_path)
    versions = [e["version"] for e in t.history()][1:]
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"], AGGS, n_buckets=4)
    mv.refresh(spark, to_version=versions[1])
    mv2 = MaterializedAggregate.load(str(tmp_path / "mv"))
    assert mv2.cursor() == versions[1]
    mv2.refresh(spark)
    _assert_equal(_mv_state(spark, mv2), _recompute(spark, t, t.version))


def test_mv_metadata_only_span_advances_cursor(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "src"), SRC_SCHEMA,
                         pk=("repo", "path"), n_buckets=4)
    _apply(spark, t, [("a", "p", "py", 1, "I", 1, 1)], lsn=1, bid=0)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"], AGGS, n_buckets=4)
    mv.refresh(spark)
    t.evolve_schema("add_column", "forks", "long", applied_upto_lsn=1)
    res = mv.refresh(spark)
    assert res["refreshed"] and res["groups_written"] == 0
    assert mv.cursor() == t.version
    _assert_equal(_mv_state(spark, mv), _recompute(spark, t, t.version))


def test_mv_touches_only_changed_buckets(spark, tmp_path):
    """A one-group delta must commit against ~1 state bucket, not all."""
    t = LakeTable.create(str(tmp_path / "src"), SRC_SCHEMA,
                         pk=("repo", "path"), n_buckets=4)
    base = [(f"r{i:03d}", "p", LANGS[i % 3], i, "I", i + 1, 1)
            for i in range(30)]
    _apply(spark, t, base, lsn=30, bid=0)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"],
        {"n": ("count", "*"), "sum_stars": ("sum", "stars")}, n_buckets=16)
    mv.refresh(spark)
    _apply(spark, t, [("r000", "p", "py", 999, "U", 100, 2)], lsn=100, bid=1)
    res = mv.refresh(spark)
    m = mv.table.metadata()["snapshot"]["metrics"]
    assert m["buckets_touched"] == 1, m
    # the whole touched bucket is rewritten: its resident groups, not all 3
    assert 1 <= res["groups_written"] < 3
    got = _mv_state(spark, mv)
    want = {r["lang"]: r.asDict() for r in
            t.read(spark).groupBy("lang").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("stars").alias("sum_stars")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["sum_stars"] == want[k]["sum_stars"]


def test_mv_sum_only_never_rescans(spark, tmp_path):
    """Without min/max aggs, deletes fold purely incrementally."""
    t = _build_source(spark, tmp_path)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"],
        {"n": ("count", "*"), "sum_stars": ("sum", "stars"),
         "avg_stars": ("avg", "stars")}, n_buckets=4)
    for entry in t.history():
        v = entry["version"]
        if v == 0:
            continue
        res = mv.refresh(spark, to_version=v)
        assert res["rescanned"] == 0
    want = _recompute(spark, t, t.version)
    got = _mv_state(spark, mv)
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["sum_stars"] == want[k]["sum_stars"]


def test_streaming_live_mv_maintained_from_tail(spark, small_log, tmp_path):
    """The stream_replay on_commit hook keeps an MV live off the CDC tail:
    each applied micro-batch triggers an incremental refresh, and after the
    tail drains the MV equals a from-scratch group-by over the final table."""
    from logicaldecoding_spark.generator import split_log_dir
    from logicaldecoding_spark.streaming.stream_replay import stream_replay

    log_path, _ = small_log
    log_dir = str(tmp_path / "log_dir")
    split_log_dir(log_path, log_dir, n_files=6)
    table_path = str(tmp_path / "stream_table")
    ckpt = str(tmp_path / "ckpt")

    refreshes: list[dict] = []
    holder: dict = {}

    def on_commit(versions, epoch):
        v = versions[table_path]
        if "mv" not in holder:
            holder["mv"] = MaterializedAggregate.create(
                str(tmp_path / "mv"), LakeTable.load(table_path),
                ["lang"], {"n": ("count", "*")}, n_buckets=4)
        refreshes.append(holder["mv"].refresh(spark, to_version=v))

    q = stream_replay(
        spark, log_dir, table_path, ckpt, n_buckets=8, parse_mode="native",
        max_files_per_trigger=2, on_commit=on_commit,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # maintained LIVE: multiple incremental folds, not one final recompute
    assert sum(1 for r in refreshes if r["refreshed"]) >= 2
    t = LakeTable.load(table_path)
    want = {r["lang"]: r["n"] for r in t.read(spark).groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in holder["mv"].read(spark)
           .select("lang", "n").collect()}
    assert got == want


def test_mv_rescan_pushes_group_inlist_into_file_skipping(
        spark, tmp_path, monkeypatch):
    """A min/max retraction rescan restricts the source read with a
    (group, in, keys) predicate, so on a group-clustered source the stats
    pruner skips files holding none of the retracted groups."""
    t = _build_source(spark, tmp_path)
    t.compact(spark, sort_by=("lang", "stars"), max_rows_per_file=10)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, ["lang"],
        {"min_stars": ("min", "stars"), "max_stars": ("max", "stars")},
        n_buckets=4)
    mv.refresh(spark)
    # retract the current rs maximum -> exactly one group rescans
    rs_max = (t.read(spark).filter("lang = 'rs'")
              .orderBy(F.desc("stars")).first())
    _apply(spark, t, [(rs_max["repo"], rs_max["path"], None, None,
                       "D", 900, 9)], lsn=900, bid=9)

    captured = {}
    orig = LakeTable.read

    def spy(self, spark_, *a, **kw):
        if kw.get("where"):
            captured["where"] = kw["where"]
        return orig(self, spark_, *a, **kw)

    monkeypatch.setattr(LakeTable, "read", spy)
    res = mv.refresh(spark)
    assert res["rescanned"] == 1
    assert captured["where"] == [("lang", "in", ["rs"])]
    got = {r["lang"]: r for r in mv.read(spark).collect()}
    want = {r["lang"]: r for r in
            t.read(spark).groupBy("lang").agg(
                F.min("stars").alias("min_stars"),
                F.max("stars").alias("max_stars")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["min_stars"] == want[k]["min_stars"]
        assert got[k]["max_stars"] == want[k]["max_stars"]
