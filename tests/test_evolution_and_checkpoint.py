"""Schema-evolution barriers + exactly-once checkpoint/resume at pipeline level.

Evolution rule: a schema change is committed to table metadata BEFORE the
data batch that follows it (SURVEY §4.3.3); events straddling the barrier are
typed under their own epoch's schema.  Resume rule: per-snapshot
``applied_upto_lsn`` makes any re-run skip applied ranges (§2.9 T1/T4)."""

from __future__ import annotations

import pytest

from logicaldecoding_spark.generator import SchemaChangeSpec, generate_log
from logicaldecoding_spark.oracle import replay_oracle
from logicaldecoding_spark.plans.batches import plan_batches
from logicaldecoding_spark.plans.replay import replay
from logicaldecoding_spark.table.format import LakeTable

from .util import assert_converged


@pytest.fixture(scope="module")
def evo_log(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("evo") / "wal.parquet")
    changes = [
        SchemaChangeSpec(at_txn=40, kind="add_column", column="size", type="int"),
        SchemaChangeSpec(at_txn=80, kind="add_column", column="stars", type="long"),
        SchemaChangeSpec(at_txn=120, kind="widen_type", column="size", type="long"),
    ]
    stats = generate_log(path, n_txns=160, n_repos=10, paths_per_repo=6,
                         schema_changes=changes)
    return path, stats


def test_plan_isolates_schema_batches(spark, evo_log):
    path, stats = evo_log
    raw = spark.read.parquet(path).select("lsn", "payload")
    plans = plan_batches(raw, target_data_batches=2, eager_evolution=False)
    kinds = [p.kind for p in plans]
    assert kinds.count("schema") == 3
    # plans tile the lsn space contiguously and in order
    assert plans[0].lsn_from == 0
    for a, b in zip(plans, plans[1:]):
        assert a.lsn_to == b.lsn_from
    assert plans[-1].lsn_to == stats["max_lsn"]
    # schema batches carry their change payloads
    changes = [p.change for p in plans if p.kind == "schema"]
    assert ("add_column", "size", "int") in changes
    assert ("widen_type", "size", "long") in changes


def test_plan_eager_evolution_folds_forward(spark, evo_log):
    path, stats = evo_log
    raw = spark.read.parquet(path).select("lsn", "payload")
    plans = plan_batches(raw, target_data_batches=2, eager_evolution=True)
    # all schema plans first, none advancing the watermark; data un-split
    # by evolution barriers
    kinds = [p.kind for p in plans]
    assert kinds == ["schema"] * 3 + ["data"] * 2
    assert all(not p.advance_watermark for p in plans if p.kind == "schema")
    data = [p for p in plans if p.kind == "data"]
    assert data[0].lsn_from == 0 and data[-1].lsn_to == stats["max_lsn"]


def test_evolution_replay_converges_and_widens(spark, evo_log, tmp_path):
    path, _ = evo_log
    table_path = str(tmp_path / "t")
    replay(spark, path, table_path, parse_mode="native", n_buckets=4, n_data_batches=2)
    oracle_state, oracle_schema = replay_oracle(path)
    assert_converged(spark, table_path, oracle_state)
    t = LakeTable.load(table_path)
    f = {x.name: x for x in t.schema.fields}
    assert f["size"].type == "long" and f["stars"].type == "long"
    # post-widen values exceed int32 (generator writes > 3e9 after the widen)
    big = [
        r
        for r in t.read(spark).collect()
        if r["size"] is not None and r["size"] > 2**31
    ]
    assert big, "expected post-widen values exceeding int32"


def test_resume_after_crash_each_cut_point(spark, evo_log, tmp_path):
    """Stop after k batches for every k; resume must always converge —
    the crash-injection matrix (SURVEY §5 test plan)."""
    path, _ = evo_log
    oracle_state, _ = replay_oracle(path)
    raw = spark.read.parquet(path).select("lsn", "payload")
    plans = plan_batches(raw, target_data_batches=2)
    n_plans = len(plans)
    n_schema = sum(1 for p in plans if p.kind == "schema")
    for k in (1, 3, n_plans - 1):
        table_path = str(tmp_path / f"t{k}")
        r1 = replay(spark, path, table_path, parse_mode="native", n_buckets=4,
                    n_data_batches=2, stop_after_batches=k)
        assert r1["batches_applied"] == k
        r2 = replay(spark, path, table_path, parse_mode="native", n_buckets=4,
                    n_data_batches=2, resume=True)
        # eager schema plans don't advance the watermark, so a resume
        # re-walks them as idempotent metadata no-ops; only DATA batches
        # below the watermark are skipped outright
        assert n_plans - k <= r2["batches_applied"] <= n_plans - k + n_schema
        assert_converged(spark, table_path, oracle_state)
        # and a third run is a pure no-op on data (exactly-once)
        r3 = replay(spark, path, table_path, parse_mode="native", n_buckets=4,
                    n_data_batches=2, resume=True)
        assert all(b["kind"] == "schema" for b in r3["batches"]
                   if b.get("rows_written") is None)
        assert sum(b.get("rows_written") or 0 for b in r3["batches"]) == 0
