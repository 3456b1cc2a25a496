"""Named refs: branches (write-audit-publish staging) and tags.

The reference consumer has a single live state (HashMap, src/types/mod.rs:39);
at lake scale the same engine needs the Iceberg branch/tag model so a risky
backfill or replay can be STAGED on a branch, audited, and published atomically
— or dropped — without readers of ``main`` ever seeing half-applied state.
All refs share one global version sequence (the exclusive metadata-file create
arbitrates committers across refs); lineage is the snapshot parent_id chain.
"""

from __future__ import annotations

import os

import pytest

from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA
from logicaldecoding_spark.table.fileio import CommitConflictError
from logicaldecoding_spark.table.format import LakeTable
from logicaldecoding_spark.operators.merge import merge_into


def _compacted(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " op string, lsn long, seq int, txid long",
    )


def _mk(spark, tmp_path, name="t"):
    t = LakeTable.create(str(tmp_path / name), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(
        spark, t, _compacted(spark, [("r", "p", "c1", "py", "x", "I", 1, 0, 1)]),
        applied_upto_lsn=1, batch_id=0,
    )
    return t


def test_branch_staging_invisible_until_publish(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    assert t.refs() == {"audit": {"kind": "branch", "version": t.version}}
    merge_into(
        spark, b, _compacted(spark, [("r2", "p", "c2", "py", "y", "I", 5, 0, 2)]),
        applied_upto_lsn=5, batch_id=1,
    )
    # staged commit is invisible on main, visible on the branch
    assert t.metadata()["version"] < b.version
    assert {r["repo"] for r in t.read(spark).collect()} == {"r"}
    assert {r["repo"] for r in b.read(spark).collect()} == {"r", "r2"}
    assert t.applied_upto_lsn == 1 and b.applied_upto_lsn == 5

    published = t.publish("audit")
    assert t.version == published
    assert {r["repo"] for r in t.read(spark).collect()} == {"r", "r2"}
    # watermark/offsets carried from the branch head (resume correctness)
    assert t.applied_upto_lsn == 5
    # idempotent re-publish: no new snapshot
    assert t.publish("audit") in (published, t.version)


def test_publish_refuses_divergent_target(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    merge_into(
        spark, b, _compacted(spark, [("r2", "p", "c2", "py", "y", "I", 5, 0, 2)]),
        applied_upto_lsn=5, batch_id=1,
    )
    # main moves on independently -> its head is no longer an ancestor of
    # the branch head; publishing would drop main's commit
    merge_into(
        spark, t, _compacted(spark, [("r3", "p", "c3", "py", "z", "I", 7, 0, 3)]),
        applied_upto_lsn=7, batch_id=2,
    )
    with pytest.raises(CommitConflictError):
        t.publish("audit")
    # main state untouched by the failed publish
    assert {r["repo"] for r in t.read(spark).collect()} == {"r", "r3"}


def test_global_version_sequence_and_ref_scoped_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("stage")
    merge_into(
        spark, b, _compacted(spark, [("r2", "p", "c2", "py", "y", "I", 5, 0, 2)]),
        applied_upto_lsn=5, batch_id=1,
    )
    staged_v = b.version
    # a later main commit must SKIP the version number the branch claimed
    merge_into(
        spark, t, _compacted(spark, [("r3", "p", "c3", "py", "z", "I", 7, 0, 3)]),
        applied_upto_lsn=7, batch_id=2,
    )
    assert t.version > staged_v
    # ref-scoped history: the staged snapshot is not on main's lineage
    assert staged_v not in [e["version"] for e in t.history()]
    assert staged_v in [e["version"] for e in b.history()]
    # ancestry is the parent chain, not contiguity
    assert t.is_ancestor(1, t.version)
    assert not t.is_ancestor(staged_v, t.version)


def test_tag_is_immutable_and_pins_expiry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    tagged = t.version
    t.create_tag("rc1")
    for i in range(6):  # roll the table forward past keep_last
        merge_into(
            spark, t,
            _compacted(
                spark, [("r", "p", f"c{i+2}", "py", "x", "U", 10 + i, 0, 2 + i)]
            ),
            applied_upto_lsn=10 + i, batch_id=1 + i,
        )
    expired = t.expire_snapshots(keep_last=2)
    assert tagged not in expired  # the tag pinned its snapshot
    rt = LakeTable.load(t.path, ref="rc1")
    assert rt.version == tagged
    assert {r["commit"] for r in rt.read(spark).collect()} == {"c1"}
    with pytest.raises(ValueError):
        merge_into(
            spark, rt,
            _compacted(spark, [("q", "p", "c", "py", "x", "I", 99, 0, 99)]),
            applied_upto_lsn=99, batch_id=99,
        )


def test_dropped_branch_files_are_reaped(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("junk")
    merge_into(
        spark, b, _compacted(
            spark, [(f"s{i}", "p", "c", "py", "x", "I", 5 + i, 0, 2)
                    for i in range(8)]
        ),
        applied_upto_lsn=20, batch_id=1,
    )
    staged_files = {
        m["path"] for m in b.metadata()["snapshot"]["manifest"]
    } - {m["path"] for m in t.metadata()["snapshot"]["manifest"]}
    assert staged_files
    b_version = b.version
    t.drop_ref("junk")
    assert "junk" not in t.refs()
    # the staged snapshot is no longer pinned: expire + orphan-reap it
    merge_into(  # advance main so keep_last clears the staged version number
        spark, t, _compacted(spark, [("r", "p", "cz", "py", "x", "U", 30, 0, 9)]),
        applied_upto_lsn=30, batch_id=2,
    )
    expired = t.expire_snapshots(keep_last=1)
    assert b_version in expired
    removed = set(t.remove_orphan_files())
    assert staged_files <= removed
    # main unaffected
    assert {r["repo"] for r in t.read(spark).collect()} == {"r"}
    for rel in staged_files:
        assert not os.path.exists(os.path.join(t.path, rel))


def test_replay_onto_branch_then_publish(spark, small_log, small_oracle,
                                         tmp_path):
    """The CDC backfill WAP flow: replay part of the log to main, replay the
    rest onto a branch (main's watermark and state frozen), audit, publish —
    main then equals the full-log oracle."""
    from logicaldecoding_spark.plans.replay import replay
    from tests.util import assert_converged

    log_path, _ = small_log
    oracle_state, _ = small_oracle
    tbl = str(tmp_path / "t")
    replay(spark, log_path, tbl, n_buckets=8, n_data_batches=3,
           parse_mode="native", stop_after_batches=2)
    t = LakeTable.load(tbl)
    v_main, wm_main = t.version, t.applied_upto_lsn

    run = replay(spark, log_path, tbl, n_buckets=8, n_data_batches=3,
                 parse_mode="native", ref="backfill")
    # main untouched by the branch replay
    t = LakeTable.load(tbl)
    assert (t.version, t.applied_upto_lsn) == (v_main, wm_main)
    b = LakeTable.load(tbl, ref="backfill")
    assert b.applied_upto_lsn > wm_main
    assert run["table_version"] == b.version

    t.publish("backfill")
    assert_converged(spark, tbl, oracle_state)
