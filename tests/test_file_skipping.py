"""Manifest column-stats file skipping (the Iceberg lower/upper-bounds scan
pruning): stats captured at write time, predicate pruning on read(where=...),
MoR safety (no resurrection through a skipped base/delta), sort-clustered
compaction making point predicates prune to ~1 file, and changelog
incremental reads skipping files below the watermark."""

from __future__ import annotations

import pytest

from logicaldecoding_spark.operators.merge import merge_into
from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA, TableSchema
from logicaldecoding_spark.table.format import (
    LakeTable,
    entry_refutes,
    normalize_where,
    prune_manifest_entries,
)


def _compacted(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " op string, lsn long, seq int, txid long",
    )


def _rows(n, lsn0=1, commit="c", op="I"):
    return [
        (f"r{i:04d}", "p", commit, "py", f"body{i}", op, lsn0 + i, 0, 1 + i)
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# write-side stats capture
# ---------------------------------------------------------------------------
def test_manifest_entries_carry_column_stats(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(spark, t, _compacted(spark, _rows(50)), applied_upto_lsn=50,
               batch_id=0)
    for m in t.metadata()["snapshot"]["manifest"]:
        st = m["stats"]
        # string pk columns + lineage lsn must be stat'd
        for col in ("repo", "path", "_last_lsn"):
            lo, hi, nulls = st[col]
            assert lo is not None and hi is not None and lo <= hi
        # stats survive a JSON roundtrip of the metadata file (native types)
        assert isinstance(st["repo"][0], str)
        assert isinstance(st["_last_lsn"][1], int)
        # the lsn upper bound agrees with the legacy top-level max_lsn
        assert st["_last_lsn"][1] == m["max_lsn"]


def test_stats_record_null_counts_for_all_null_column(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=2)
    rows = [(f"r{i}", "p", "c", None, "x", "I", i + 1, 0, 1) for i in range(10)]
    merge_into(spark, t, _compacted(spark, rows), applied_upto_lsn=10, batch_id=0)
    for m in t.metadata()["snapshot"]["manifest"]:
        lo, hi, nulls = m["stats"]["lang"]
        assert lo is None and hi is None and nulls == m["rows"]
        # an all-NULL column refutes every comparison on it
        assert entry_refutes(m, "lang", "=", "py")
        assert entry_refutes(m, "lang", ">", "")


def test_long_string_stats_keep_lower_bound_only(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=1)
    big = "z" * 500
    rows = [("r1", "p", "c", "py", big, "I", 1, 0, 1)]
    merge_into(spark, t, _compacted(spark, rows), applied_upto_lsn=1, batch_id=0)
    (m,) = t.metadata()["snapshot"]["manifest"]
    lo, hi, _ = m["stats"]["content"]
    # min prefix-truncated (still a valid lower bound), max dropped
    assert hi is None
    if lo is not None:
        assert len(lo) <= 64 and big.startswith(lo[: len(lo)]) or lo <= big
        # one-sided bound still prunes what it can prove
        assert entry_refutes(m, "content", "<", lo)
        assert not entry_refutes(m, "content", ">", "a")


# ---------------------------------------------------------------------------
# refutation logic (unit)
# ---------------------------------------------------------------------------
def test_entry_refutes_op_matrix():
    e = {"rows": 10, "stats": {"x": [10, 20, 0]}}
    assert entry_refutes(e, "x", "=", 9)
    assert entry_refutes(e, "x", "=", 21)
    assert not entry_refutes(e, "x", "=", 10)
    assert not entry_refutes(e, "x", "=", 20)
    assert entry_refutes(e, "x", "<", 10)
    assert not entry_refutes(e, "x", "<", 11)
    assert entry_refutes(e, "x", "<=", 9)
    assert not entry_refutes(e, "x", "<=", 10)
    assert entry_refutes(e, "x", ">", 20)
    assert not entry_refutes(e, "x", ">", 19)
    assert entry_refutes(e, "x", ">=", 21)
    assert not entry_refutes(e, "x", ">=", 20)
    assert entry_refutes(e, "x", "in", [1, 2, 30])
    assert not entry_refutes(e, "x", "in", [1, 15])
    # missing column / missing stats / incomparable type: never refute
    assert not entry_refutes(e, "y", "=", 5)
    assert not entry_refutes({"rows": 10}, "x", "=", 5)
    assert not entry_refutes(e, "x", "=", "str")
    # one-sided bounds
    lo_only = {"rows": 5, "stats": {"x": [10, None, 0]}}
    assert entry_refutes(lo_only, "x", "<", 10)
    assert not entry_refutes(lo_only, "x", ">", 10**9)
    # legacy max_lsn fallback for pre-stats manifests
    legacy = {"rows": 5, "max_lsn": 100}
    assert entry_refutes(legacy, "_last_lsn", ">", 100)
    assert not entry_refutes(legacy, "_last_lsn", ">", 99)


def test_normalize_where_validates_ops():
    assert normalize_where([("a", "==", 1)]) == [("a", "=", 1)]
    assert normalize_where([("a", "in", (1, 2))]) == [("a", "in", [1, 2])]
    with pytest.raises(ValueError):
        normalize_where([("a", "!=", 1)])


# ---------------------------------------------------------------------------
# read(where=...) — equality with post-filter, and actual pruning
# ---------------------------------------------------------------------------
def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_where_read_equals_post_filter(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=8)
    merge_into(spark, t, _compacted(spark, _rows(60)), applied_upto_lsn=60,
               batch_id=0)
    # evolve, then write rows that have the new column
    t.evolve_schema("add_column", "size", "long", applied_upto_lsn=61)
    rows2 = spark.createDataFrame(
        [(f"s{i}", "p", "c2", "py", "y", 100 + i, "I", 200 + i, 0, 9)
         for i in range(20)],
        "repo string, path string, commit string, lang string, content string,"
        " size long, op string, lsn long, seq int, txid long",
    )
    merge_into(spark, t, rows2, applied_upto_lsn=220, batch_id=1)
    full = t.read(spark)
    for where in (
        [("repo", "=", "r0007")],
        [("repo", ">=", "s"), ("repo", "<", "t")],
        [("size", ">", 110)],
        [("size", "<=", 105)],
        [("repo", "in", ["r0001", "s3", "nope"])],
        [("_last_lsn", ">", 200)],
    ):
        got = t.read(spark, where=where)
        expect = full
        for c, op, v in where:
            from pyspark.sql import functions as F

            col = F.col(c)
            expect = expect.filter(
                col.isin(v) if op == "in"
                else col == v if op == "=" or op == "=="
                else col < v if op == "<"
                else col <= v if op == "<="
                else col > v if op == ">"
                else col >= v
            )
        assert _collect_sorted(got) == _collect_sorted(expect), where


def test_where_prunes_old_schema_files_for_added_column(spark, tmp_path):
    """Files written before a column existed are pruned outright for
    predicates on it (projection NULL-fills the column)."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(spark, t, _compacted(spark, _rows(40)), applied_upto_lsn=40,
               batch_id=0)
    old_files = len(t.metadata()["snapshot"]["manifest"])
    t.evolve_schema("add_column", "size", "long", applied_upto_lsn=41)
    rows2 = spark.createDataFrame(
        [("x1", "p", "c2", "py", "y", 7, "I", 50, 0, 9)],
        "repo string, path string, commit string, lang string, content string,"
        " size long, op string, lsn long, seq int, txid long",
    )
    merge_into(spark, t, rows2, applied_upto_lsn=50, batch_id=1)
    meta = t.metadata()
    preds = normalize_where([("size", "=", 7)])
    lacks = {
        "size": {
            s["schema_id"] for s in meta["schemas"]
            if all(f["name"] != "size" for f in s["fields"])
        }
    }

    def refuted(m):
        return any(
            m["schema_id"] in lacks.get(c, ()) or entry_refutes(m, c, op, v)
            for (c, op, v) in preds
        )

    kept = prune_manifest_entries(
        meta["snapshot"]["manifest"], refuted, t.partition_specs(meta)
    )
    assert old_files >= 1
    assert all(m["schema_id"] != 0 for m in kept)  # v0 files all pruned
    got = t.read(spark, where=[("size", "=", 7)]).collect()
    assert len(got) == 1 and got[0]["repo"] == "x1"


def test_where_errors_on_unknown_column(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=2)
    with pytest.raises(ValueError, match="not in table schema"):
        t.read(spark, where=[("nope", "=", 1)])


# ---------------------------------------------------------------------------
# MoR safety: skipping must never resurrect a superseded base row
# ---------------------------------------------------------------------------
def test_mor_no_resurrection_through_stats_pruning(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    # base: key k with commit c1; another key far away in stats space
    merge_into(
        spark, t,
        _compacted(spark, [("k", "p", "aaaa", "py", "x", "I", 1, 0, 1),
                           ("zz", "p", "zzzz", "py", "x", "I", 2, 0, 1)]),
        applied_upto_lsn=2, batch_id=0,
    )
    # delta updates k's commit to m-middle; base file stats say commit in
    # {aaaa..zzzz}, delta file stats say commit = mmmm
    merge_into(
        spark, t,
        _compacted(spark, [("k", "p", "mmmm", "py", "x2", "U", 10, 0, 2)]),
        applied_upto_lsn=10, batch_id=1, mode="mor",
    )
    # predicate matches the DELTA value: row must surface even though the
    # base file alone could look refutable
    got = t.read(spark, where=[("commit", "=", "mmmm")]).collect()
    assert [r["repo"] for r in got] == ["k"]
    # predicate matches the SUPERSEDED base value: must NOT resurrect
    got = t.read(spark, where=[("commit", "=", "aaaa")]).collect()
    assert got == []
    # predicate refuting the whole component prunes it, and stays correct
    got = t.read(spark, where=[("commit", "=", "!!!!")]).collect()
    assert got == []


def test_mor_component_pruning_drops_only_fully_refuted_groups(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=8)
    merge_into(spark, t, _compacted(spark, _rows(40)), applied_upto_lsn=40,
               batch_id=0)
    # one delta in one bucket
    merge_into(
        spark, t,
        _compacted(spark, [("r0000", "p", "newc", "py", "y", "U", 100, 0, 5)]),
        applied_upto_lsn=100, batch_id=1, mode="mor",
    )
    meta = t.metadata()
    manifest = meta["snapshot"]["manifest"]
    preds = normalize_where([("_last_lsn", ">", 40)])

    def refuted(m):
        return any(entry_refutes(m, c, op, v) for (c, op, v) in preds)

    kept = prune_manifest_entries(manifest, refuted, t.partition_specs(meta))
    # pure base files (max_lsn <= 40) pruned; the delta's component kept
    # whole (its base file reads too, despite refuting the predicate)
    delta_bucket = next(
        m["bucket"] for m in manifest if m.get("content") == "delta"
    )
    kept_buckets = {m["bucket"] for m in kept}
    assert kept_buckets == {delta_bucket}
    assert any(m.get("content", "base") == "base" for m in kept)
    assert len(kept) < len(manifest)
    # and the read is exact
    got = t.read(spark, where=[("_last_lsn", ">", 40)]).collect()
    assert [r["repo"] for r in got] == ["r0000"]


# ---------------------------------------------------------------------------
# sort-clustered compaction -> point predicates prune to ~1 file
# ---------------------------------------------------------------------------
def test_sorted_compaction_yields_disjoint_ranges_and_prunes(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=1)
    merge_into(spark, t, _compacted(spark, _rows(400)), applied_upto_lsn=400,
               batch_id=0)
    t.compact(spark, sort_by=("repo", "path"), max_rows_per_file=100)
    manifest = t.metadata()["snapshot"]["manifest"]
    assert len(manifest) >= 4  # maxRecordsPerFile split the bucket
    # disjoint, ordered repo ranges across the files of the bucket
    ranges = sorted((m["stats"]["repo"][0], m["stats"]["repo"][1])
                    for m in manifest)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # a point predicate keeps exactly one file
    preds = normalize_where([("repo", "=", "r0123")])

    def refuted(m):
        return any(entry_refutes(m, c, op, v) for (c, op, v) in preds)

    meta = t.metadata()
    kept = prune_manifest_entries(
        meta["snapshot"]["manifest"], refuted, t.partition_specs(meta)
    )
    assert len(kept) == 1
    got = t.read(spark, where=[("repo", "=", "r0123")]).collect()
    assert len(got) == 1 and got[0]["repo"] == "r0123"
    # state unchanged by the sorted rewrite
    assert t.read(spark).count() == 400


def test_lookup_exact_after_sorted_compaction(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=2)
    merge_into(spark, t, _compacted(spark, _rows(300)), applied_upto_lsn=300,
               batch_id=0)
    t.compact(spark, sort_by=("repo", "path"), max_rows_per_file=50)
    # small key set -> in-list pruning path
    rows = t.lookup(spark, [("r0007", "p"), ("r0242", "p")]).collect()
    assert sorted(r["repo"] for r in rows) == ["r0007", "r0242"]
    # large key set -> range pruning path (> 64 distinct first-pk values)
    keys = [(f"r{i:04d}", "p") for i in range(100, 200)]
    rows = t.lookup(spark, keys).collect()
    assert len(rows) == 100
    # miss stays a miss
    assert t.retrieve(spark, ("nope", "p")) is None


# ---------------------------------------------------------------------------
# changelog incremental read prunes below-watermark files
# ---------------------------------------------------------------------------
def test_read_changes_still_exact_with_pruned_upsert_scan(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(spark, t, _compacted(spark, _rows(30)), applied_upto_lsn=30,
               batch_id=0)
    v1 = t.version
    # update 2, insert 1, delete 1
    merge_into(
        spark, t,
        _compacted(spark, [
            ("r0001", "p", "c2", "py", "upd", "U", 100, 0, 7),
            ("r0002", "p", "c2", "py", "upd", "U", 101, 0, 7),
            ("newk", "p", "c2", "py", "new", "I", 102, 0, 7),
            ("r0003", "p", "c", "py", "x", "D", 103, 0, 7),
        ]),
        applied_upto_lsn=103, batch_id=1,
    )
    ch = t.read_changes(spark, v1).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], []).append(r["repo"])
    assert sorted(by_type["update"]) == ["r0001", "r0002"]
    assert by_type["insert"] == ["newk"]
    assert by_type["delete"] == ["r0003"]


# ---------------------------------------------------------------------------
# z-order clustering: multi-column pruning
# ---------------------------------------------------------------------------
def _kept_files(t, where):
    preds = normalize_where(where)

    def refuted(m):
        return any(entry_refutes(m, c, op, v) for (c, op, v) in preds)

    meta = t.metadata()
    return len(prune_manifest_entries(
        meta["snapshot"]["manifest"], refuted, t.partition_specs(meta)
    ))


def test_zorder_compaction_prunes_on_every_clustered_column(spark, tmp_path):
    """Lexicographic sort only narrows the LEADING column's per-file range;
    z-order narrows every clustered column's, so a predicate on the second
    column alone still prunes files."""
    schema = TableSchema.initial([
        ("repo", "string", False), ("path", "string", False),
        ("stars", "long", True),
    ])
    # stars is a pseudo-random permutation of 0..4095: independent of repo
    # order, so linear (repo, stars) clustering leaves stars unclustered
    rows = [
        (f"r{i:04d}", "p", (i * 2654435761) % 4096, "I", i + 1, 1 + i)
        for i in range(4096)
    ]

    def build(name, cluster):
        t = LakeTable.create(str(tmp_path / name), schema,
                             pk=("repo", "path"), n_buckets=1)
        df = spark.createDataFrame(
            rows, "repo string, path string, stars long,"
            " op string, lsn long, txid long")
        merge_into(spark, t, df, applied_upto_lsn=4096, batch_id=0)
        t.compact(spark, sort_by=("repo", "stars"),
                  max_rows_per_file=256, cluster=cluster)
        return t

    lin = build("lin", "linear")
    zo = build("zo", "zorder")
    n_files = len(zo.metadata()["snapshot"]["manifest"])
    assert n_files >= 8
    assert len(lin.metadata()["snapshot"]["manifest"]) == n_files

    stars_pred = [("stars", ">=", 1024), ("stars", "<", 1280)]
    # linear: every file spans ~the full stars domain -> nothing prunes
    assert _kept_files(lin, stars_pred) == n_files
    # zorder: the stars strip intersects only its z-blocks
    assert _kept_files(zo, stars_pred) <= n_files // 2
    # the leading column still prunes under zorder (coarser than linear's
    # perfect run, but bounded)
    repo_pred = [("repo", ">=", "r1000"), ("repo", "<", "r1100")]
    assert _kept_files(zo, repo_pred) <= n_files // 2
    assert _kept_files(lin, repo_pred) <= 2

    # pruned reads remain exact on both layouts
    for t in (lin, zo):
        got = sorted(
            r["repo"] for r in t.read(spark, where=stars_pred).collect()
        )
        want = sorted(
            f"r{i:04d}" for i in range(4096)
            if 1024 <= (i * 2654435761) % 4096 < 1280
        )
        assert got == want
    assert zo.read(spark).count() == 4096


# ---------------------------------------------------------------------------
# per-file key bloom filters: point-lookup skipping on UNCLUSTERED data
# ---------------------------------------------------------------------------
def _unclustered_table(spark, tmp_path, n_rows=200, n_repos=20, per_file=25):
    """One bucket, shuffled keys, bounded file cuts: every file's [min,max]
    spans most of the key space — min/max stats cannot prune a point
    predicate here; the bloom can."""
    import random

    from logicaldecoding_spark.table.format import bucket_expr

    rng = random.Random(7)
    rows = [(f"repo{i % n_repos:02d}", f"p{i}", "c", "py", "x", i + 1, i + 1)
            for i in range(n_rows)]
    rng.shuffle(rows)
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA,
                         n_buckets=1)
    df = (spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, _last_lsn long, _last_txid long")
        .withColumn("_bucket", bucket_expr(1)))
    files = t.write_data_files(df, spark, max_rows_per_file=per_file)
    t.commit_data(files, {0}, applied_upto_lsn=n_rows, batch_id=0)
    return t


def test_bloom_prunes_absent_key_to_zero_files(spark, tmp_path):
    t = _unclustered_table(spark, tmp_path)
    man = t.metadata()["snapshot"]["manifest"]
    assert len(man) >= 4 and all("bloom" in m for m in man)
    # min/max alone keeps every file (interleaved ranges)...
    st = {m["stats"]["repo"][0] for m in man}
    assert len(st) <= 3  # most files share the same min -> ranges overlap
    # ...but the bloom proves an absent key touches nothing: no file read
    none = t.read(spark, where=[("repo", "=", "no_such_repo")])
    assert none.count() == 0
    plan = none._jdf.queryExecution().executedPlan().toString().lower()
    assert "parquet" not in plan
    # and lookups of absent keys plan zero files too
    assert t.lookup(spark, [("no_such_repo", "p1")]).count() == 0


def test_bloom_never_refutes_a_present_key(spark, tmp_path):
    """No false negatives by construction: every (key -> containing file)
    pair must survive the pruner (pinned over all keys and files)."""
    t = _unclustered_table(spark, tmp_path)
    man = t.metadata()["snapshot"]["manifest"]
    for i in range(20):
        key = f"repo{i:02d}"
        got = t.read(spark, where=[("repo", "=", key)]).count()
        assert got == 10  # 200 rows / 20 repos, exact through the pruner
    # in-list: only files containing NEITHER key are refuted
    got = t.read(
        spark, where=[("repo", "in", ["repo03", "no_such"])]).count()
    assert got == 10


def test_bloom_respects_rename_physical_name(spark, tmp_path):
    t = _unclustered_table(spark, tmp_path)
    t.evolve_schema("rename_column", "repo", "repository", None)
    assert t.read(
        spark, where=[("repository", "=", "repo03")]).count() == 10
    none = t.read(spark, where=[("repository", "=", "nope")])
    assert none.count() == 0
    plan = none._jdf.queryExecution().executedPlan().toString().lower()
    assert "parquet" not in plan


def test_bloom_mor_component_safety(spark, tmp_path):
    """A delta superseding a key must not let the base file prune alone:
    the component rule keeps base+delta together unless the WHOLE component
    refutes."""
    t = _unclustered_table(spark, tmp_path)
    merge_into(
        spark, t,
        _compacted(spark, [("repo03", "p3", "c9", "rs", "upd", "U",
                            1000, 0, 9)]),
        applied_upto_lsn=1000, batch_id=1, mode="mor",
    )
    rows = t.read(spark, where=[("repo", "=", "repo03")]).collect()
    assert len(rows) == 10
    upd = [r for r in rows if r["path"] == "p3"]
    assert upd and upd[0]["lang"] == "rs"  # the delta won through the pruner


def test_bloom_omitted_above_distinct_cap(spark, tmp_path):
    from logicaldecoding_spark.table.format import (
        BLOOM_MAX_DISTINCT, bucket_expr,
    )

    n = BLOOM_MAX_DISTINCT + 100
    rows = [(f"repo{i:02d}", f"p{i}", "c", "py", "x", i + 1, i + 1)
            for i in range(n)]
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA,
                         n_buckets=1)
    df = (spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, _last_lsn long, _last_txid long")
        .coalesce(1)  # ONE file -> its distinct count exceeds the cap
        .withColumn("_bucket", bucket_expr(1)))
    t.commit_data(t.write_data_files(df, spark), {0},
                  applied_upto_lsn=n, batch_id=0)
    man = t.metadata()["snapshot"]["manifest"]
    assert len(man) == 1
    assert all("bloom" not in m for m in man)  # absent, never wrong
    assert t.read(spark, where=[("repo", "=", "repo01")]).count() == 1


def test_lookup_prunes_with_large_key_list_without_plan_literals(spark, tmp_path):
    """lookup's in-list is PRUNE-ONLY (the semi-join makes results exact),
    so it is no longer capped at 64 literals: a 200-key lookup prunes via
    stats+blooms and the scan plan carries no giant isin."""
    t = _unclustered_table(spark, tmp_path, n_rows=400, n_repos=40,
                           per_file=50)
    keys = [(f"repo{i % 40:02d}", f"p{i}") for i in range(0, 400, 2)]
    got = t.lookup(spark, keys)
    assert got.count() == 200
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "repo07" not in plan  # key literals prune the manifest, not the plan
    # all-absent keys at >64 list size: bloom refutes every file
    absent = t.lookup(spark, [(f"zz{i}", "p") for i in range(100)])
    assert absent.count() == 0
    assert len(set(absent.inputFiles())) == 0


def test_prune_warns_past_entry_ceiling(monkeypatch):
    """Past the documented ceiling the driver-side pruner WARNS loudly
    (r6: per-entry Python cost is fine to ~1e5 entries, a stall beyond)
    while returning the identical pruning decisions."""
    import pytest

    import logicaldecoding_spark.table.format as fmt

    manifest = [
        {"path": f"f{i}", "bucket": i % 4, "spec_id": 0, "schema_id": 0,
         "rows": 10, "stats": {"x": [i * 10, i * 10 + 9, 0]}}
        for i in range(200)
    ]

    def refuted(m):
        return fmt.entry_refutes(m, "x", "=", 55)

    kept_quiet = fmt.prune_manifest_entries(manifest, refuted, {0: 4})
    monkeypatch.setattr(fmt, "PRUNE_ENTRIES_WARN", 100)
    with pytest.warns(UserWarning, match="manifest pruning over 200"):
        kept_loud = fmt.prune_manifest_entries(manifest, refuted, {0: 4})
    assert kept_loud == kept_quiet
    assert [m["path"] for m in kept_loud] == ["f5"]
