"""Rename / drop column evolution: metadata-only, field-id correct.

The Iceberg evolution rules (spec §Schema Evolution) the LakeTable must
honor — the reference's ALTER TABLE analog carried over the same R-event
DDL channel that already ships add_column/widen_type
(/root/reference/src/pg_logicaldec.proto:37-40, the new_typeinfo schema
channel generalized):

* rename is metadata-only: no data file is rewritten; old files' values
  surface under the NEW name via the field-id read projection.
* drop is metadata-only: the field id is retired forever, so a later
  same-named add_column gets a fresh id and the dropped values do NOT
  resurrect.
* stats-based file skipping keeps working across a rename: manifest stats
  are keyed by the name the file was WRITTEN under, so pruning maps the
  current predicate column to each schema version's physical name.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from logicaldecoding_spark.generator import generate_log
from logicaldecoding_spark.operators.merge import merge_into
from logicaldecoding_spark.oracle import replay_oracle
from logicaldecoding_spark.plans.replay import replay
from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA, TableSchema
from logicaldecoding_spark.table.format import LakeTable

from .util import assert_converged


def _compacted(spark, rows, langcol="lang"):
    return spark.createDataFrame(
        rows,
        f"repo string, path string, commit string, {langcol} string,"
        " content string, op string, lsn long, seq int, txid long",
    )


# ---------------------------------------------------------------------------
# schema-level rules
# ---------------------------------------------------------------------------
def test_rename_keeps_field_id_and_drop_retires_it():
    s0 = REPOS_INITIAL_SCHEMA
    lang_id = {f.name: f.id for f in s0.fields}["lang"]
    s1 = s0.rename_column("lang", "language")
    assert {f.name: f.id for f in s1.fields}["language"] == lang_id
    assert s1.schema_id == s0.schema_id + 1
    s2 = s1.drop_column("language")
    assert all(f.name != "language" for f in s2.fields)
    # re-add under the same name -> strictly fresh id (no reuse of the
    # retired one, else old files' values would resurrect)
    s3 = s2.add_column("language", "string")
    new_id = {f.name: f.id for f in s3.fields}["language"]
    assert new_id > lang_id
    assert new_id > max(f.id for f in s2.fields)
    # json round-trip preserves the retired-id floor
    s2rt = TableSchema.from_json(s2.to_json())
    assert s2rt.add_column("x", "int").fields[-1].id == new_id


def test_rename_drop_validation():
    s = REPOS_INITIAL_SCHEMA
    with pytest.raises(ValueError):
        s.rename_column("nope", "x")
    with pytest.raises(ValueError):
        s.rename_column("lang", "repo")  # collision
    with pytest.raises(ValueError):
        s.rename_column("lang", "_lang")  # reserved prefix
    # idempotent re-applies (crash-resume): same object back
    assert s.rename_column("lang", "language").rename_column(
        "lang", "language") is not None
    s1 = s.rename_column("lang", "language")
    assert s1.rename_column("lang", "language") is s1
    s2 = s.drop_column("lang")
    assert s2.drop_column("lang") is s2


# ---------------------------------------------------------------------------
# table-level semantics
# ---------------------------------------------------------------------------
def test_rename_is_metadata_only_and_projects_old_files(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c1", "py", "x", "I", 1, 0, 1),
                           ("r2", "p", "c2", "rs", "y", "I", 2, 0, 1)]),
        applied_upto_lsn=2, batch_id=0,
    )
    before = sorted(m["path"] for m in t.metadata()["snapshot"]["manifest"])
    t.evolve_schema("rename_column", "lang", "language", None)
    after = sorted(m["path"] for m in t.metadata()["snapshot"]["manifest"])
    assert before == after  # not one data file rewritten
    rows = {r["repo"]: r for r in t.read(spark).collect()}
    assert rows["r1"]["language"] == "py" and rows["r2"]["language"] == "rs"
    assert "lang" not in t.read(spark).columns


def test_stats_pruning_survives_rename(spark, tmp_path):
    """Predicate on the NEW name must prune via stats recorded under the
    OLD physical name — and still return exact results."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=2)
    merge_into(
        spark, t,
        _compacted(spark, [(f"r{i}", "p", f"c{i:04d}", "py", "x", "I", i + 1, 0, 1)
                           for i in range(20)]),
        applied_upto_lsn=21, batch_id=0,
    )
    t.evolve_schema("rename_column", "commit", "commit_sha", None)
    got = t.read(spark, where=[("commit_sha", "=", "c0003")]).collect()
    assert len(got) == 1 and got[0]["repo"] == "r3"
    # a predicate outside every file's [min,max] prunes ALL files: the scan
    # plans to an empty manifest (no parquet read at all)
    none = t.read(spark, where=[("commit_sha", ">", "zzzz")])
    assert none.count() == 0
    assert "parquet" not in none._jdf.queryExecution().executedPlan().toString().lower()


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c1", "py", "x", "I", 1, 0, 1)]),
        applied_upto_lsn=1, batch_id=0,
    )
    t.evolve_schema("drop_column", "lang", None)
    assert "lang" not in t.read(spark).columns
    t.evolve_schema("add_column", "lang", "string")
    rows = t.read(spark).collect()
    assert rows[0]["lang"] is None  # the pre-drop 'py' stays buried
    merge_into(
        spark, t,
        _compacted(spark, [("r2", "p", "c2", "go", "z", "I", 5, 0, 2)]),
        applied_upto_lsn=5, batch_id=1,
    )
    rows = {r["repo"]: r for r in t.read(spark).collect()}
    assert rows["r2"]["lang"] == "go" and rows["r1"]["lang"] is None


def test_pk_rename_updates_pk_and_lookup(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c1", "py", "x", "I", 1, 0, 1),
                           ("r2", "q", "c2", "rs", "y", "I", 2, 0, 1)]),
        applied_upto_lsn=2, batch_id=0,
    )
    t.evolve_schema("rename_column", "repo", "repository", None)
    assert t.pk == ("repository", "path")
    r = t.retrieve(spark, ("r1", "p"))
    assert r is not None and r["repository"] == "r1" and r["commit"] == "c1"
    with pytest.raises(ValueError):
        t.evolve_schema("drop_column", "path", None)


def test_rename_under_merge_on_read(spark, tmp_path):
    """Old-name base file + old-name delta file reconcile correctly after a
    rename: the field-id projection maps BOTH to the new name before the
    per-key last-writer-wins."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c1", "py", "x", "I", 1, 0, 1)]),
        applied_upto_lsn=1, batch_id=0,
    )
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c2", "rs", "y", "U", 3, 0, 2)]),
        applied_upto_lsn=3, batch_id=1, mode="mor",
    )
    t.evolve_schema("rename_column", "lang", "language", None)
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0]["language"] == "rs"  # delta wins
    # and a post-rename MoR delta (new name) reconciles with both
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c3", "go", "z", "U", 5, 0, 3)],
                   "language"),
        applied_upto_lsn=5, batch_id=2, mode="mor",
    )
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0]["language"] == "go"


def test_read_changes_across_rename(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c1", "py", "x", "I", 1, 0, 1),
                           ("r2", "p", "c2", "rs", "y", "I", 2, 0, 1)]),
        applied_upto_lsn=2, batch_id=0,
    )
    v_from = t.version
    t.evolve_schema("rename_column", "lang", "language", None)
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c9", "go", "z", "U", 5, 0, 2),
                           ("r2", "p", "c2", "rs", "y", "D", 6, 0, 2)],
                   "language"),
        applied_upto_lsn=6, batch_id=1,
    )
    ch = {(r["repo"], r["_change_type"]): r for r in
          t.read_changes(spark, v_from).collect()}
    assert ch[("r1", "update")]["language"] == "go"
    # the delete's OLD row image carries the pre-rename value under the
    # NEW (to-side) name — the field-id cross-version mapping
    assert ch[("r2", "delete")]["language"] == "rs"


# ---------------------------------------------------------------------------
# end-to-end: rename + drop arriving over the wire as R events
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def rename_drop_log(tmp_path_factory):
    """A JSON-wire log whose DDL channel renames ``lang``->``language`` at
    1/3 and drops ``commit`` at 2/3; data payloads after each point use the
    post-DDL shape (as a real capture would)."""
    tmp = tmp_path_factory.mktemp("renamedrop")
    base = str(tmp / "wal.parquet")
    generate_log(base, n_txns=90, n_repos=8, paths_per_repo=5,
                 schema_changes=[])
    pdf = pd.read_parquet(base)
    commits = pdf[pdf.op == "C"]["lsn"].tolist()
    cut1 = int(commits[len(commits) // 3])
    cut2 = int(commits[(2 * len(commits)) // 3])
    max_txid = int(pdf["txid"].max())

    def r_txn(at_lsn, txid, kind, column, type_):
        ct = 946_684_800_000_000
        rows = []
        for i, o in enumerate(("B", "R", "C")):
            pl = {"txid": txid, "seq": 0, "ct": ct, "op": o}
            if o == "R":
                pl["change"] = {"kind": kind, "column": column, "type": type_}
            rows.append({"lsn": at_lsn + i, "txid": txid, "seq": 0,
                         "commit_time_us": ct, "op": o, "committed": True,
                         "payload": json.dumps(pl, separators=(",", ":"))})
        return rows

    # renumber so the injected R txns get their own lsn slots at txn
    # boundaries (cut1/cut2 are COMMIT lsns, so nothing straddles them)
    lsn = pdf["lsn"].astype("int64")
    pdf["lsn"] = lsn + (lsn > cut1).astype("int64") * 3 + \
        (lsn > cut2).astype("int64") * 3

    def rewrite(row):
        if row["op"] not in ("I", "U", "D"):
            return row["payload"]
        if row["lsn"] <= cut1:
            return row["payload"]
        ev = json.loads(row["payload"])
        for side in ("new", "old"):
            tup = ev.get(side)
            if not tup:
                continue
            if "lang" in tup:
                tup["language"] = tup.pop("lang")
            if row["lsn"] > cut2 + 3:
                tup.pop("commit", None)
        return json.dumps(ev, separators=(",", ":"))

    pdf["payload"] = pdf.apply(rewrite, axis=1)
    extra = pd.DataFrame(
        r_txn(cut1 + 1, max_txid + 1, "rename_column", "lang", "language")
        + r_txn(cut2 + 4, max_txid + 2, "drop_column", "commit", "")
    )
    out_pdf = pd.concat([pdf, extra], ignore_index=True).sort_values("lsn")
    out = str(tmp / "wal_rename_drop.parquet")
    out_pdf.to_parquet(out, index=False)
    return out


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_replay_rename_drop_converges_with_oracle(
    spark, rename_drop_log, tmp_path, mode
):
    state, schema = replay_oracle(rename_drop_log)
    assert "language" in schema.names() and "commit" not in schema.names()
    table_path = str(tmp_path / f"t_{mode}")
    replay(spark, rename_drop_log, table_path, n_buckets=8,
           n_data_batches=4, merge_mode=mode)
    t = LakeTable.load(table_path)
    assert t.schema.names() == schema.names()
    assert_converged(spark, table_path, state)


def test_streaming_rename_drop_converges(spark, rename_drop_log, tmp_path):
    """The live tail applies rename/drop at their log positions too: each
    micro-batch plans with plan_batches, whose eager folding falls back to
    positional epochs when a non-forward-compatible change is present."""
    from logicaldecoding_spark.generator import split_log_dir
    from logicaldecoding_spark.streaming.stream_replay import stream_replay

    log_dir = str(tmp_path / "rd_dir")
    split_log_dir(rename_drop_log, log_dir, n_files=5, cut_mid_txn=True)
    table_path = str(tmp_path / "t_stream_rd")
    q = stream_replay(
        spark, log_dir, table_path, str(tmp_path / "ckpt_rd"),
        n_buckets=8, parse_mode="native", max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state, schema = replay_oracle(rename_drop_log)
    t = LakeTable.load(table_path)
    assert t.schema.names() == schema.names()
    assert_converged(spark, table_path, state)


def test_compact_and_zorder_after_rename(spark, tmp_path):
    """Maintenance ops run on the post-rename schema: compaction (incl.
    sort clustering by the renamed column) folds MoR deltas and rewrites
    under the current schema id."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA,
                         n_buckets=2)
    merge_into(
        spark, t,
        _compacted(spark, [(f"r{i}", "p", f"c{i}", "py", "x", "I", i + 1, 0, 1)
                           for i in range(10)]),
        applied_upto_lsn=10, batch_id=0,
    )
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "cX", "rs", "y", "U", 20, 0, 2)]),
        applied_upto_lsn=20, batch_id=1, mode="mor",
    )
    t.evolve_schema("rename_column", "lang", "language", None)
    t.compact(spark, sort_by=("language",))
    assert {m["content"] for m in t.metadata()["snapshot"]["manifest"]} == {
        "base"}
    rows = {r["repo"]: r["language"] for r in t.read(spark).collect()}
    assert rows["r1"] == "rs" and rows["r2"] == "py"


def test_mv_refresh_fails_loudly_on_source_rename(spark, tmp_path):
    """An incremental MV whose tracked source column is renamed mid-window
    refuses the fold with a clear message (state keyed by old names cannot
    be folded forward) instead of an unresolved-column error."""
    from logicaldecoding_spark.operators.mv import MaterializedAggregate

    t = LakeTable.create(str(tmp_path / "src"), REPOS_INITIAL_SCHEMA,
                         n_buckets=2)
    merge_into(
        spark, t,
        _compacted(spark, [("r1", "p", "c1", "py", "x", "I", 1, 0, 1)]),
        applied_upto_lsn=1, batch_id=0,
    )
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), t, group_by=["lang"],
        aggs={"n": ("count", "*")},
    )
    mv.refresh(spark)
    t.evolve_schema("rename_column", "lang", "language", None)
    merge_into(
        spark, t,
        _compacted(spark, [("r2", "p", "c2", "rs", "y", "I", 5, 0, 2)],
                   "language"),
        applied_upto_lsn=5, batch_id=1,
    )
    with pytest.raises(ValueError, match="renamed or dropped"):
        mv.refresh(spark)
