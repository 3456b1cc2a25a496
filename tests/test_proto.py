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


# ---------------------------------------------------------------------------
# property-based wire-format roundtrip (hypothesis)
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _name = st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF,
                               exclude_categories=("Cs",)),
        min_size=1, max_size=20,
    )
    _text = st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF,
                               exclude_categories=("Cs",)),
        max_size=200,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        txid=st.integers(min_value=0, max_value=2**32 - 1),
        ct=st.integers(min_value=0, max_value=2**63 - 1),
        op=st.sampled_from(["I", "U", "D", "B", "C"]),
        table=st.one_of(st.none(), _name),
        new=st.dictionaries(_name, st.one_of(st.none(), _text), max_size=6),
        old=st.dictionaries(_name, st.one_of(st.none(), _text), max_size=4),
    )
    def test_row_message_roundtrip_property(txid, ct, op, table, new, old):
        """decode(encode(x)) reproduces the canonical event for arbitrary
        txids/timestamps/column names/values incl. full unicode; None
        values (datum_missing) fold to absent keys."""
        if op in ("B", "C"):
            new, old, table = {}, {}, None
        ev = decode_row_message(encode_row_message(
            txid=txid, commit_time_us=ct, op=op, table=table, new=new, old=old,
        ))
        assert ev["txid"] == txid and ev["ct"] == ct and ev["op"] == op
        assert ev["table"] == table
        want_new = {k: v for k, v in new.items() if v is not None} or None
        want_old = {k: v for k, v in old.items() if v is not None} or None
        assert ev["new"] == want_new
        assert ev["old"] == want_old

    @settings(max_examples=200, deadline=None)
    @given(
        kind_val=st.one_of(
            st.tuples(st.just("int32"), st.integers(-2**31, 2**31 - 1)),
            st.tuples(st.just("int64"), st.integers(-2**63, 2**63 - 1)),
            st.tuples(st.just("bool"), st.booleans()),
            st.tuples(st.just("string"), _text),
            st.tuples(st.just("bytes"), st.binary(max_size=64)),
            st.tuples(st.just("double"),
                      st.floats(allow_nan=False, allow_infinity=False)),
        ),
        name=_name,
    )
    def test_datum_roundtrip_property(kind_val, name):
        import base64

        kind, val = kind_val
        got_name, got = decode_datum(encode_datum(name, val, kind))
        assert got_name == name
        if kind in ("int32", "int64"):
            assert got == str(val)
        elif kind == "bool":
            assert got == ("true" if val else "false")
        elif kind == "string":
            assert got == val
        elif kind == "bytes":
            assert got == base64.b64encode(val).decode()
        elif kind == "double":
            assert float(got) == val


def test_new_typeinfo_roundtrip_and_column():
    """decoderbufs field 7 (repeated TypeInfo, pg_logicaldec.proto:37-40,49)
    must be decoded and preserved, not silently skipped (r3 verdict
    "What's missing #1"): a foreign-wire event carrying per-column
    modifier/nullability metadata keeps it through decode."""
    ti = [("varchar(255)", False), ("int4", True), ("text", True)]
    ev = decode_row_message(encode_row_message(
        txid=11, commit_time_us=5, op="I", table="repos",
        new={"repo": "r", "path": "p"}, typeinfo=ti,
    ))
    assert ev["typeinfo"] == [
        {"modifier": m, "value_optional": o} for m, o in ti
    ]
    assert ev["new"] == {"repo": "r", "path": "p"}  # tuples unaffected
    # absent on the wire -> None (JSON wire parity: NULL column)
    ev2 = decode_row_message(encode_row_message(
        txid=12, commit_time_us=6, op="I", table="repos", new={"repo": "r"},
    ))
    assert ev2["typeinfo"] is None


def test_new_typeinfo_surfaces_in_parse_events(spark):
    """parse_events(mode='proto') exposes typeinfo as the ``new_typeinfo``
    column; JSON-wire modes carry the same column as NULL (uniform schema
    across modes)."""
    from logicaldecoding_spark.sources.parse import parse_events

    payloads = [
        encode_row_message(
            txid=1, commit_time_us=1, op="I", table="repos",
            new={"repo": "r"}, typeinfo=[("text", True)],
        ),
        encode_row_message(txid=2, commit_time_us=2, op="B"),
    ]
    raw = spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(payloads)], "lsn long, payload binary"
    )
    rows = parse_events(raw, mode="proto").orderBy("lsn").collect()
    assert rows[0]["new_typeinfo"] == [
        {"modifier": "text", "value_optional": True}
    ] or [tuple(r) for r in rows[0]["new_typeinfo"]] == [("text", True)]
    assert rows[1]["new_typeinfo"] is None

    jraw = spark.createDataFrame(
        [(1, '{"txid":1,"seq":0,"ct":1,"op":"I","table":"repos",'
             '"new":{"repo":"r"}}')],
        "lsn long, payload string",
    )
    for mode in ("arrow", "duckdb", "native"):
        r = parse_events(jraw, mode=mode).collect()[0]
        assert "new_typeinfo" in r.asDict() and r["new_typeinfo"] is None, mode


def test_fast_decoder_seam_injects_through_all_paths(spark, tmp_path):
    """The documented swap point for a C-speed protobuf runtime must
    actually work (r4 ask #6): decoders installed via set_fast_decoders are
    resolved driver-side by the make_* factories and shipped to executors
    inside the task closure, so a fake fast decoder must be observable
    through the full-parse, marker/header, streaming-tagging, and planning
    paths — making google.protobuf/upb adoption a config call, not surgery."""
    from pyspark.sql import functions as F

    from logicaldecoding_spark.generator import SchemaChangeSpec, generate_log
    from logicaldecoding_spark.plans.batches import plan_batches
    from logicaldecoding_spark.sources import proto as P
    from logicaldecoding_spark.sources.parse import parse_events, parse_markers

    log = str(tmp_path / "wal_proto.parquet")
    generate_log(
        log, n_txns=40, n_repos=5, paths_per_repo=4,
        schema_changes=[SchemaChangeSpec(at_txn=20, kind="add_column",
                                         column="size", type="int")],
        payload_format="proto",
    )
    raw = spark.read.parquet(log).select("lsn", "payload")
    real_full, real_hdr = P.decode_row_message, P.decode_row_header

    def fake_full(b):
        ev = real_full(b)
        if ev["op"] in ("I", "U", "D") and ev["new"] is not None:
            ev["new"] = {**ev["new"], "__via__": "fast"}
        return ev

    def fake_hdr(b):
        txid, op = real_hdr(b)
        return (None if txid is None else txid + 1_000_000), op

    try:
        # executor-side full decode: every data event carries the fake's mark
        P.set_fast_decoders(full=fake_full, header=fake_hdr)
        parsed = parse_events(raw, mode="proto")
        # D events carry no new-image: the mark lands on every row that HAS one
        n = parsed.filter(
            F.col("op").isin("I", "U", "D") & F.col("new_tuple").isNotNull()
        ).count()
        via = parsed.filter(
            F.try_element_at("new_tuple", F.lit("__via__")) == "fast"
        ).count()
        assert n > 0 and via == n

        # executor-side header decode: marker txids show the fake's offset
        mk = parse_markers(raw, mode="proto")
        assert mk.agg(F.min("txid")).collect()[0][0] >= 1_000_000

        # streaming txid tagging uses the same header seam
        tagged = raw.mapInArrow(
            P.make_proto_tagged_batches(), "lsn long, payload binary, txid long"
        )
        assert tagged.agg(F.min("txid")).collect()[0][0] >= 1_000_000

        # planning: driver-side R-candidate decode goes through the seam too
        calls = {"full": 0}

        def counting_full(b):
            calls["full"] += 1
            return real_full(b)

        P.set_fast_decoders(full=counting_full, header=real_hdr)
        plans = plan_batches(raw, target_data_batches=2, parse_mode="proto")
        assert [p for p in plans if p.kind == "schema"]
        assert calls["full"] > 0
    finally:
        P.set_fast_decoders()  # restore the pure-Python codec

    # seam closed: behavior identical to the built-in decoder again
    clean = parse_events(raw, mode="proto")
    assert clean.filter(
        F.try_element_at("new_tuple", F.lit("__via__")).isNotNull()
    ).count() == 0


def test_native_batch_decoder_matches_python_codec(spark, tmp_path):
    """The compiled C batch decoder (proto_native, auto-installed through
    the fast-proto seam) must reproduce the pure-Python codec EXACTLY —
    including the rows it falls back on (R events, typeinfo,
    float/double/point datums, spliced by position) and edge shapes
    (missing datums -> absent keys, unicode, empty tuples, bytes->base64,
    negative ints, null maps for markers)."""
    import pyarrow as pa

    from logicaldecoding_spark.sources import proto as P
    from logicaldecoding_spark.sources.proto import (
        decode_row_message,
        encode_row_message,
    )
    from logicaldecoding_spark.sources.proto_native import (
        build_native_decoder,
        make_native_full_batch,
    )

    msgs = [
        encode_row_message(txid=1, commit_time_us=10, op="B"),
        encode_row_message(txid=1, commit_time_us=10, op="I", table="répos",
                           new={"repo": "r", "path": "p", "content": "日本語 x"},
                           ),
        encode_row_message(
            txid=1, commit_time_us=10, op="U", table="repos",
            new={"repo": "r", "path": "p"},
            typed_datums={
                "n32": ("int32", -7), "n64": ("int64", 3_000_000_000),
                "f": ("float", 0.1), "d": ("double", 2.5),
                "b": ("bool", True), "by": ("bytes", b"\x00\xff\x10"),
                "pt": ("point", (1.5, -2.25)), "m": ("missing", None),
            },
        ),
        encode_row_message(txid=1, commit_time_us=10, op="D", table="repos",
                           old={"repo": "r", "path": "p"}),
        encode_row_message(txid=9, commit_time_us=2, op="R",
                           change={"kind": "add_column", "column": "size",
                                   "type": "long"}),
        encode_row_message(txid=2, commit_time_us=11, op="I", table="t",
                           new={"k": None}),  # all-missing tuple
        encode_row_message(txid=1, commit_time_us=10, op="C"),
        encode_row_message(txid=3, commit_time_us=12, op="I", table="t",
                           new={"x": "1"},
                           typeinfo=[("int4", True), ("text", False)]),
    ]
    payload = pa.array(msgs, pa.binary())
    lsn = pa.array(range(len(msgs)), pa.int64())
    fb = make_native_full_batch(build_native_decoder())
    got = fb(lsn, payload).to_pylist()
    for i, (g, m) in enumerate(zip(got, msgs)):
        e = decode_row_message(m)
        want_new = e["new"] and dict(e["new"])
        want_old = e["old"] and dict(e["old"])
        assert g["txid"] == e["txid"] and g["op"] == e["op"], i
        assert g["commit_time_us"] == e["ct"], i
        assert g["table"] == e["table"], i
        g_new = dict(g["new_tuple"]) if g["new_tuple"] is not None else None
        g_old = dict(g["old_tuple"]) if g["old_tuple"] is not None else None
        assert g_new == want_new, (i, g_new, want_new)
        assert g_old == want_old, (i, g_old, want_old)
        if e["change"]:
            assert dict(g["schema_change"]) == e["change"], i
        if e["typeinfo"]:
            assert [dict(t) for t in g["new_typeinfo"]] == e["typeinfo"], i

    # executor-path equality on a generated log: identical parse output
    # fingerprints with and without the native decoder
    from pyspark.sql import functions as F

    from logicaldecoding_spark.generator import SchemaChangeSpec, generate_log
    from logicaldecoding_spark.sources.parse import parse_events

    log = str(tmp_path / "w.parquet")
    generate_log(log, n_txns=150, n_repos=10, paths_per_repo=5,
                 schema_changes=[SchemaChangeSpec(70, "add_column",
                                                  "size", "int")],
                 payload_format="proto")
    raw = spark.read.parquet(log).select("lsn", "payload")

    def fingerprint():
        return parse_events(raw, mode="proto").agg(
            F.count("*"), F.sum("txid"), F.sum(F.crc32("op")),
            F.sum(F.crc32(F.to_json(F.col("new_tuple")))),
            F.sum(F.crc32(F.to_json(F.col("old_tuple")))),
        ).collect()[0]

    import os

    P.set_fast_decoders()
    P._NATIVE_TRIED = False
    native = list(fingerprint())
    os.environ["LOGICALDECODING_NO_NATIVE_PROTO"] = "1"
    try:
        P.set_fast_decoders()
        P._NATIVE_TRIED = False
        pure = list(fingerprint())
    finally:
        del os.environ["LOGICALDECODING_NO_NATIVE_PROTO"]
        P.set_fast_decoders()
        P._NATIVE_TRIED = False
    assert native == pure


if _HAVE_HYP:

    @settings(max_examples=60, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**32 - 1),   # txid
                st.integers(min_value=0, max_value=2**62),       # ct
                st.sampled_from(["I", "U", "D", "B", "C"]),
                st.one_of(st.none(), _name),                     # table
                st.dictionaries(_name, st.one_of(st.none(), _text),
                                max_size=4),                     # new
                st.dictionaries(_name, st.one_of(st.none(), _text),
                                max_size=3),                     # old
            ),
            min_size=1, max_size=40,
        )
    )
    def test_native_batch_decoder_property(rows):
        """Arbitrary encoded batches: the C batch decoder's output equals
        the pure-Python codec row-for-row (unicode names/values, missing
        datums, markers, absent tables)."""
        import pyarrow as pa

        from logicaldecoding_spark.sources.proto_native import (
            build_native_decoder,
            make_native_full_batch,
        )

        msgs = []
        for txid, ct, op, table, new, old in rows:
            if op in ("B", "C"):
                new, old, table = {}, {}, None
            msgs.append(encode_row_message(
                txid=txid, commit_time_us=ct, op=op, table=table,
                new=new, old=old,
            ))
        fb = make_native_full_batch(build_native_decoder())
        got = fb(pa.array(range(len(msgs)), pa.int64()),
                 pa.array(msgs, pa.binary())).to_pylist()
        for i, m in enumerate(msgs):
            e = decode_row_message(m)
            g = got[i]
            assert g["txid"] == e["txid"] and g["op"] == e["op"]
            assert g["commit_time_us"] == e["ct"]
            assert g["table"] == e["table"]
            g_new = dict(g["new_tuple"]) if g["new_tuple"] is not None else None
            g_old = dict(g["old_tuple"]) if g["old_tuple"] is not None else None
            assert g_new == (dict(e["new"]) if e["new"] else None)
            assert g_old == (dict(e["old"]) if e["old"] else None)


def test_native_decoder_rejects_invalid_utf8_like_python():
    """A wire whose datum_string carries invalid UTF-8 must fail loudly on
    BOTH decode paths (the native path validates the assembled arrays and
    falls back to the Python codec, which raises), never silently admit
    undecodable bytes."""
    import pyarrow as pa
    import pytest as _pytest

    from logicaldecoding_spark.sources.proto import _ld, _tag, _uvarint
    from logicaldecoding_spark.sources.proto_native import (
        build_native_decoder,
        make_native_full_batch,
    )

    # hand-encode: RowMessage{txid=1, op=I, new_tuple=[{name:'k',
    # datum_string=<invalid utf8>}]}
    datum = _ld(1, b"k") + _ld(8, b"\xff\xfe\x80")
    msg = (_tag(1, 0) + _uvarint(1) + _tag(4, 0) + _uvarint(0)
           + _ld(3, b"t") + _ld(5, datum))
    with _pytest.raises(UnicodeDecodeError):
        decode_row_message(msg)
    fb = make_native_full_batch(build_native_decoder())
    with _pytest.raises(UnicodeDecodeError):
        fb(pa.array([1], pa.int64()), pa.array([msg], pa.binary()))
