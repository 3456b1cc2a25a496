"""SQL facade (logicaldecoding_spark/sql.py): plain spark.sql over lake
state, staged branches, the changelog, and table metadata."""

from __future__ import annotations

from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA
from logicaldecoding_spark.sql import (
    attach,
    describe_history,
    describe_refs,
    table_changes,
)
from logicaldecoding_spark.table.format import LakeTable
from logicaldecoding_spark.operators.merge import merge_into


def _compacted(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " op string, lsn long, seq int, txid long",
    )


def _mk(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA,
                         n_buckets=4)
    merge_into(
        spark, t,
        _compacted(spark, [
            (f"r{i}", "p", f"c{i}", "py", f"x{i}", "I", i + 1, 0, 1)
            for i in range(20)
        ]),
        applied_upto_lsn=20, batch_id=0,
    )
    return t


def test_attach_matches_dataframe_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    attach(spark, {"repos_live": t})
    got = spark.sql(
        "SELECT repo, commit FROM repos_live WHERE repo = 'r7'"
    ).collect()
    assert len(got) == 1 and got[0]["commit"] == "c7"
    assert spark.sql("SELECT count(*) n FROM repos_live").first()["n"] == 20


def test_attach_branch_suffix_enables_sql_audit_diff(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("stage")
    merge_into(
        spark, b,
        _compacted(spark, [("zz", "p", "cz", "py", "z", "I", 99, 0, 9)]),
        applied_upto_lsn=99, batch_id=1,
    )
    attach(spark, {"repos": t.path})
    attach(spark, {"repos": t.path}, ref="stage", suffix="_staged")
    diff = spark.sql(
        "SELECT repo FROM repos_staged EXCEPT SELECT repo FROM repos"
    ).collect()
    assert [r["repo"] for r in diff] == ["zz"]
    # a view pins its attach-time snapshot: publish then re-attach to follow
    t.publish("stage")
    assert spark.sql("SELECT count(*) n FROM repos").first()["n"] == 20
    attach(spark, {"repos": t.path})
    assert spark.sql("SELECT count(*) n FROM repos").first()["n"] == 21


def test_table_changes_view_and_metadata_frames(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.version
    merge_into(
        spark, t,
        _compacted(spark, [("r0", "p", "c0x", "py", "y", "U", 50, 0, 2),
                           ("new", "p", "cn", "py", "n", "I", 51, 0, 2)]),
        applied_upto_lsn=51, batch_id=1,
    )
    table_changes(spark, t, v1, view="repos_changes")
    ch = {
        r["repo"]: r["_change_type"]
        for r in spark.sql(
            "SELECT repo, _change_type FROM repos_changes"
        ).collect()
    }
    assert ch == {"r0": "update", "new": "insert"}

    t.create_tag("rc")
    describe_history(spark, t, view="repos_history")
    assert spark.sql(
        "SELECT max(version) v FROM repos_history"
    ).first()["v"] == t.version
    refs = describe_refs(spark, t).collect()
    assert [(r["name"], r["kind"], r["version"]) for r in refs] == [
        ("rc", "tag", t.version)
    ]


def test_describe_files_metadata_table(spark, tmp_path):
    from logicaldecoding_spark.sql import describe_files

    t = _mk(spark, tmp_path)
    merge_into(
        spark, t,
        _compacted(spark, [("r0", "p", "c9", "py", "z", "U", 30, 0, 2)]),
        applied_upto_lsn=30, batch_id=1, mode="mor",
    )
    df = describe_files(spark, t, view="repos_files")
    man = t.metadata()["snapshot"]["manifest"]
    assert df.count() == len(man)
    # row counts come straight from the manifest, and the delta is visible
    got = spark.sql(
        "SELECT content, sum(rows) AS n FROM repos_files GROUP BY content"
    ).collect()
    by_kind = {r["content"]: r["n"] for r in got}
    assert by_kind["base"] == 20 and by_kind["delta"] == 1
    # footer stats reachable from SQL
    lo = spark.sql(
        "SELECT min(get_json_object(stats_json, '$.repo[0]')) AS lo"
        " FROM repos_files WHERE content = 'base'"
    ).collect()[0]["lo"]
    assert lo == "r0"
