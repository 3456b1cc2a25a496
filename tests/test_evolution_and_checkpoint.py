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
    # DATA plans tile the lsn space contiguously and in order (schema plans
    # are metadata-only overlays: each spans its own txn's (BEGIN-1, COMMIT]
    # range, whose events replay inside the FOLLOWING data epoch)
    data = [p for p in plans if p.kind == "data"]
    assert data[0].lsn_from == 0
    for a, b in zip(data, data[1:]):
        assert a.lsn_to == b.lsn_from
    assert data[-1].lsn_to == stats["max_lsn"]
    # every schema plan is ordered BEFORE the data epoch containing its span
    for i, p in enumerate(plans):
        if p.kind == "schema":
            following = next(q for q in plans[i + 1:] if q.kind == "data")
            assert following.lsn_from <= p.lsn_from
            assert following.lsn_to >= p.lsn_to
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


def _write_handmade_log(path: str, rows: list[dict]) -> None:
    """rows: [{lsn, txid, seq, op, extra...}] -> a generator-shaped parquet."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    recs = []
    for r in rows:
        pl = {"txid": r["txid"], "seq": r.get("seq", 0),
              "ct": 946_684_800_000_000, "op": r["op"]}
        if r["op"] in ("I", "U", "D"):
            pl["table"] = "repos"
            if r["op"] in ("I", "U"):
                pl["new"] = r["new"]
            if r["op"] in ("U", "D"):
                pl["old"] = {"repo": r["new"]["repo"], "path": r["new"]["path"]}
        if r["op"] == "R":
            pl["change"] = r["change"]
        recs.append({
            "lsn": r["lsn"], "txid": r["txid"], "seq": r.get("seq", 0),
            "commit_time_us": pl["ct"], "op": r["op"],
            "committed": True,
            "payload": _json.dumps(pl, separators=(",", ":")),
        })
    schema = pa.schema([
        ("lsn", pa.int64()), ("txid", pa.int64()), ("seq", pa.int32()),
        ("commit_time_us", pa.int64()), ("op", pa.string()),
        ("committed", pa.bool_()), ("payload", pa.string()),
    ])
    pq.write_table(pa.Table.from_pylist(recs, schema=schema), path)


@pytest.mark.parametrize("eager", [True, False])
def test_fat_r_txn_and_rolled_back_r_converge(spark, tmp_path, eager):
    """The R txn carries DATA events besides the R (no generator (B,R,C)
    layout assumption), and a second R sits in a transaction that never
    commits — boundaries must come from the R txn's own BEGIN/COMMIT
    markers, the fat txn's data events must still apply, and the
    rolled-back R must NOT evolve the schema (committed-only rule)."""

    def new(pathname, content, **extra):
        return {"repo": "r1", "path": pathname, "commit": "c" * 40,
                "lang": "py", "content": content, **extra}

    log = str(tmp_path / f"fat_{eager}.parquet")
    _write_handmade_log(log, [
        {"lsn": 1, "txid": 100, "op": "B"},
        {"lsn": 2, "txid": 100, "op": "I", "new": new("a", "x1")},
        {"lsn": 3, "txid": 100, "op": "C"},
        # fat R txn: data event, then R, then a data event USING the new col
        {"lsn": 4, "txid": 101, "op": "B"},
        {"lsn": 5, "txid": 101, "seq": 0, "op": "I", "new": new("b", "x2")},
        {"lsn": 6, "txid": 101, "seq": 1, "op": "R",
         "change": {"kind": "add_column", "column": "size", "type": "long"}},
        {"lsn": 7, "txid": 101, "seq": 2, "op": "I",
         "new": new("c", "x3", size="123")},
        {"lsn": 8, "txid": 101, "op": "C"},
        # rolled-back txn carrying an R: must not apply
        {"lsn": 9, "txid": 102, "op": "B"},
        {"lsn": 10, "txid": 102, "seq": 0, "op": "R",
         "change": {"kind": "add_column", "column": "bogus", "type": "long"}},
        {"lsn": 11, "txid": 102, "seq": 1, "op": "I", "new": new("d", "x4")},
        # committed tail txn updating a pre-evolution row with the new col
        {"lsn": 12, "txid": 103, "op": "B"},
        {"lsn": 13, "txid": 103, "op": "U", "new": new("a", "x9", size="7")},
        {"lsn": 14, "txid": 103, "op": "C"},
    ])
    table_path = str(tmp_path / f"t_{eager}")
    replay(spark, log, table_path, parse_mode="native", n_buckets=2,
           n_data_batches=2, eager_evolution=eager)
    oracle_state, oracle_schema = replay_oracle(log)
    assert ("r1", "d") not in oracle_state  # rolled back
    assert_converged(spark, table_path, oracle_state)
    t = LakeTable.load(table_path)
    names = {f.name for f in t.schema.fields}
    assert "size" in names and "bogus" not in names
    got = {r["path"]: r.asDict() for r in t.read(spark).collect()}
    assert got["c"]["size"] == 123 and got["a"]["size"] == 7
    assert got["b"]["size"] is None


def test_plan_many_r_groupby_path_matches_fused(spark, evo_log, monkeypatch):
    """Past _MAX_FUSED_R_TXIDS the planner switches from per-txid
    conditional aggregates (2 columns per R txid — Catalyst degrades far
    below the 100k candidate cap, ADVICE r3) to a shape-stable
    groupBy("txid") over marker rows.  Both shapes must plan identically,
    on the payload-only path and the columnar-sidecar path."""
    from logicaldecoding_spark.plans import batches as B

    path, _ = evo_log
    payload_only = spark.read.parquet(path).select("lsn", "payload")
    sidecar = spark.read.parquet(path).drop("committed")

    expect_payload = B.plan_batches(payload_only, target_data_batches=2,
                                    eager_evolution=False)
    expect_sidecar = B.plan_batches(sidecar, target_data_batches=2,
                                    eager_evolution=False)
    monkeypatch.setattr(B, "_MAX_FUSED_R_TXIDS", 0)
    assert B.plan_batches(payload_only, target_data_batches=2,
                          eager_evolution=False) == expect_payload
    assert B.plan_batches(sidecar, target_data_batches=2,
                          eager_evolution=False) == expect_sidecar


def test_plan_foreign_json_wire_key_order_and_spacing(spark, evo_log, tmp_path):
    """A foreign JSON wire serializing the same events with REVERSED key
    order and standard ``": "`` spacing must plan identically to the
    generator wire (r4 verdict "What's wrong #1": the old per-txid
    substring probe '"txid":N,' assumed generator key order/compactness and
    silently skipped the committed schema change on any other wire)."""
    import json

    import pandas as pd

    path, _ = evo_log
    pdf = pd.read_parquet(path, columns=["lsn", "payload"])

    def rewrite(p):
        ev = json.loads(p)
        flipped = dict(reversed(list(ev.items())))
        return json.dumps(flipped, separators=(", ", ": "))

    pdf["payload"] = pdf["payload"].map(rewrite)
    foreign = str(tmp_path / "foreign.parquet")
    pdf.to_parquet(foreign, index=False)

    canonical = spark.read.parquet(path).select("lsn", "payload")
    rewired = spark.read.parquet(foreign)
    for eager in (False, True):
        expect = plan_batches(canonical, target_data_batches=2,
                              eager_evolution=eager)
        got = plan_batches(rewired, target_data_batches=2,
                           eager_evolution=eager)
        assert [p for p in got if p.kind == "schema"], \
            "foreign wire lost every schema batch"
        assert got == expect


def test_plan_r_without_markers_fails_loudly(spark, evo_log, tmp_path):
    """An R event whose transaction has NO BEGIN/COMMIT marker anywhere in
    the log (unrecognizable marker format / truncated capture) must raise,
    never silently skip a possibly-committed schema change."""
    import json

    import pandas as pd
    import pytest as _pytest

    path, _ = evo_log
    pdf = pd.read_parquet(path, columns=["lsn", "payload"])
    r_txids = {
        json.loads(p)["txid"]
        for p in pdf["payload"]
        if '"op":"R"' in p
    }
    assert r_txids

    def is_marker_of_r(p):
        ev = json.loads(p)
        return ev["op"] in ("B", "C") and ev["txid"] in r_txids

    kept = pdf[~pdf["payload"].map(is_marker_of_r)]
    broken = str(tmp_path / "broken.parquet")
    kept.to_parquet(broken, index=False)
    with _pytest.raises(ValueError, match="no\\s+BEGIN/COMMIT marker"):
        plan_batches(spark.read.parquet(broken), target_data_batches=2)
