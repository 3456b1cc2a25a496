"""decoderbufs protobuf wire mode: codec roundtrip + e2e replay convergence
on a protobuf-encoded log (reference wire format, src/pg_logicaldec.proto)."""

from __future__ import annotations

import pytest

from logicaldecoding_spark.sources.proto import (
    decode_datum,
    decode_row_message,
    encode_datum,
    encode_row_message,
)


def test_datum_oneof_roundtrip_canonical_forms():
    import base64

    cases = [
        ("a", "int32", -7, "-7"),
        ("b", "int64", 3_000_000_000, "3000000000"),
        ("c", "bool", True, "true"),
        ("d", "string", "héllo", "héllo"),
        ("e", "bytes", b"\x00\xff\x10", base64.b64encode(b"\x00\xff\x10").decode()),
        ("f", "point", (1.5, -2.25), "(1.5,-2.25)"),
        ("g", "double", 2.5, "2.5"),
    ]
    for name, kind, py, want in cases:
        got_name, got_val = decode_datum(encode_datum(name, py, kind))
        assert (got_name, got_val) == (name, want), (kind, got_val)
    # datum_missing folds to value None (absent key downstream)
    assert decode_datum(encode_datum("m", None, "missing")) == ("m", None)


def test_row_message_roundtrip_all_ops():
    ev = decode_row_message(encode_row_message(
        txid=42, commit_time_us=946_684_800_000_123, op="U", table="repos",
        new={"repo": "r", "path": "p", "content": "x", "lang": None},
        old={"repo": "r", "path": "p"},
    ))
    assert ev["txid"] == 42 and ev["ct"] == 946_684_800_000_123
    assert ev["op"] == "U" and ev["table"] == "repos"
    assert ev["new"] == {"repo": "r", "path": "p", "content": "x"}  # lang absent
    assert ev["old"] == {"repo": "r", "path": "p"}
    for op in ("B", "C"):
        m = decode_row_message(encode_row_message(txid=7, commit_time_us=1, op=op))
        assert m["op"] == op and m["new"] is None and m["table"] is None
    r = decode_row_message(encode_row_message(
        txid=9, commit_time_us=2, op="R",
        change={"kind": "add_column", "column": "size", "type": "long"},
    ))
    assert r["op"] == "R"
    assert r["change"] == {"kind": "add_column", "column": "size", "type": "long"}
    assert r["table"] is None and r["new"] is None


def test_proto_log_replay_converges(spark, tmp_path):
    """Generate the canonical evolution workload AS PROTOBUF WIRE, replay it
    with parse_mode='proto', and match the sequential oracle (which decodes
    the same wire bytes independently) row-for-row incl. lineage."""
    from logicaldecoding_spark.generator import SchemaChangeSpec, generate_log
    from logicaldecoding_spark.oracle import replay_oracle
    from logicaldecoding_spark.plans.replay import replay

    from .util import assert_converged

    log = str(tmp_path / "wal_proto.parquet")
    stats = generate_log(
        log, n_txns=150, n_repos=12, paths_per_repo=6,
        schema_changes=[
            SchemaChangeSpec(at_txn=50, kind="add_column", column="size", type="int"),
            SchemaChangeSpec(at_txn=100, kind="widen_type", column="size", type="long"),
        ],
        payload_format="proto",
    )
    assert stats["payload_format"] == "proto"
    import pyarrow.parquet as pq

    assert pq.ParquetFile(log).schema_arrow.field("payload").type == "binary"

    table_path = str(tmp_path / "t")
    replay(spark, log, table_path, parse_mode="proto", n_buckets=4,
           n_data_batches=2)
    oracle_state, _ = replay_oracle(log)
    assert oracle_state, "oracle produced empty state"
    assert_converged(spark, table_path, oracle_state)
