"""Vectorized parse: arrow mode == native mode, and crafted-event handling.

Covers the reference's decode layer (RowMessage::decode,
/root/reference/src/replication.rs:120-122) and datum semantics: missing key
== NULL (datum_missing, pg_logicaldec.proto:33)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from logicaldecoding_spark.sources.parse import parse_events


def _df_from_payloads(spark, payloads):
    rows = [(i + 1, p) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "lsn long, payload string")


def test_modes_agree_on_generated_log(spark, small_log):
    log_path, _ = small_log
    raw = spark.read.parquet(log_path).select("lsn", "payload")
    a = parse_events(raw, mode="arrow").orderBy("lsn")
    n = parse_events(raw, mode="native").orderBy("lsn")
    d = parse_events(raw, mode="duckdb").orderBy("lsn")
    assert a.schema == n.schema
    ra, rn = a.collect(), n.collect()
    assert len(ra) == len(rn)
    for x, y in zip(ra, rn):
        assert x == y, f"arrow!=native at lsn {x['lsn']}: {x} vs {y}"
    for x, z in zip(a.collect(), d.collect()):
        assert x == z, f"arrow!=duckdb at lsn {x['lsn']}: {x} vs {z}"


def test_crafted_events_all_shapes(spark):
    payloads = [
        json.dumps({"txid": 7, "seq": 0, "ct": 1, "op": "B"}),
        json.dumps(
            {
                "txid": 7, "seq": 0, "ct": 1, "op": "I", "table": "repos",
                "new": {"repo": "r", "path": "p", "commit": "c", "content": "x"},
            }
        ),
        json.dumps(
            {
                "txid": 7, "seq": 1, "ct": 1, "op": "U", "table": "repos",
                # lang ABSENT -> NULL; old carries the pk
                "new": {"repo": "r", "path": "p", "commit": "c2", "content": "y"},
                "old": {"repo": "r", "path": "p"},
            }
        ),
        json.dumps(
            {
                "txid": 7, "seq": 2, "ct": 1, "op": "D", "table": "repos",
                "old": {"repo": "r", "path": "p"},
            }
        ),
        json.dumps(
            {
                "txid": 8, "seq": 0, "ct": 2, "op": "R",
                "change": {"kind": "add_column", "column": "stars", "type": "long"},
            }
        ),
        json.dumps({"txid": 7, "seq": 0, "ct": 1, "op": "C"}),
    ]
    for mode in ("arrow", "native", "duckdb"):
        rows = (
            parse_events(_df_from_payloads(spark, payloads), mode=mode)
            .orderBy("lsn")
            .collect()
        )
        assert [r["op"] for r in rows] == ["B", "I", "U", "D", "R", "C"]
        ins = rows[1]
        assert ins["new_tuple"]["repo"] == "r"
        assert "lang" not in ins["new_tuple"]  # absent == NULL, never a key
        upd = rows[2]
        assert upd["old_tuple"] == {"repo": "r", "path": "p"}
        dele = rows[3]
        assert dele["new_tuple"] is None
        rel = rows[4]
        assert rel["schema_change"]["kind"] == "add_column"
        assert rel["schema_change"]["column"] == "stars"
        assert rows[0]["new_tuple"] is None and rows[5]["new_tuple"] is None


def test_unicode_and_escapes_roundtrip(spark):
    content = 'line1\nline2\t"quoted" \\ slash é中文'
    p = json.dumps(
        {
            "txid": 1, "seq": 0, "ct": 1, "op": "I", "table": "repos",
            "new": {"repo": "r", "path": "p", "commit": "c", "content": content},
        }
    )
    for mode in ("arrow", "native", "duckdb"):
        row = parse_events(_df_from_payloads(spark, [p]), mode=mode).collect()[0]
        assert row["new_tuple"]["content"] == content, mode


def test_sidecar_parse_matches_payload_parse(spark, tmp_path):
    """A tuple-sidecar capture's columnar decode must equal the payload
    parse row-for-row (full AND slim shapes) — the sidecar is the same
    event, pre-decoded by the archiver, not a different one."""
    from logicaldecoding_spark.generator import default_evolution, generate_log
    from logicaldecoding_spark.sources.parse import parse_slim

    log = str(tmp_path / "wal_sc.parquet")
    generate_log(log, n_txns=120, n_repos=10, paths_per_repo=6,
                 schema_changes=default_evolution(120), tuple_sidecar=True)
    raw = spark.read.parquet(log).drop("committed")

    full_ref = parse_events(raw, mode="native").orderBy("lsn").collect()
    full_sc = parse_events(raw, mode="sidecar").orderBy("lsn").collect()
    assert len(full_ref) == len(full_sc)
    for a, b in zip(full_ref, full_sc):
        for c in ("lsn", "txid", "seq", "commit_time_us", "op", "table",
                  "new_tuple", "old_tuple"):
            assert a[c] == b[c], (c, a, b)

    pk = ("repo", "path")
    slim_ref = parse_slim(raw, pk, mode="native").orderBy("lsn").collect()
    slim_sc = parse_slim(raw, pk, mode="sidecar").orderBy("lsn").collect()
    assert [tuple(r) for r in slim_ref] == [tuple(r) for r in slim_sc]


def test_sidecar_replay_all_jvm_and_converges(spark, tmp_path):
    """parse_mode='auto' on a tuple-sidecar capture resolves to the
    columnar path, converges with the oracle, and the hot path runs with
    ZERO Python payload decode (no mapInArrow over payload anywhere in the
    winner-parse plan)."""
    from logicaldecoding_spark.generator import default_evolution, generate_log
    from logicaldecoding_spark.oracle import replay_oracle
    from logicaldecoding_spark.plans.replay import replay
    from logicaldecoding_spark.sources.parse import parse_events

    log = str(tmp_path / "wal_sc.parquet")
    generate_log(log, n_txns=300, n_repos=20, paths_per_repo=10,
                 schema_changes=default_evolution(300), tuple_sidecar=True)
    table_path = str(tmp_path / "t")
    run = replay(spark, log, table_path, parse_mode="auto", n_buckets=8,
                 n_data_batches=2)
    assert all(b["kind"] == "schema" or b.get("compaction") in ("slim", "full")
               for b in run["batches"])
    oracle_state, _ = replay_oracle(log)
    assert_converged_local(spark, table_path, oracle_state)

    raw = spark.read.parquet(log).drop("committed")
    plan = parse_events(raw, mode="sidecar")._jdf.queryExecution() \
        .executedPlan().toString()
    for marker in ("MapInArrow", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, marker


def assert_converged_local(spark, table_path, oracle_state):
    from logicaldecoding_spark.oracle import diff_states, state_with_hashes
    from logicaldecoding_spark.table.format import LakeTable

    eng = {(r["repo"], r["path"]): r.asDict()
           for r in LakeTable.load(table_path).read(spark).collect()}
    assert diff_states(state_with_hashes(oracle_state),
                       state_with_hashes(eng)) == []
