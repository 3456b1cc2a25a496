"""Vectorized change-event parsing.

The analog of the reference's per-message protobuf decode
(``RowMessage::decode(&event[25..])``, /root/reference/src/replication.rs:120-122),
re-expressed for Spark's batch execution in two interchangeable modes:

* ``arrow``  — a scalar ``pandas_udf``: each Arrow batch of serialized payloads
  is parsed in one shot by pyarrow's C++ JSON reader (the payloads are
  newline-free JSON, so a batch is a valid JSONL document).  No per-row Python
  in the parse itself; only the struct->dict materialization for the map
  columns touches Python objects.  This is the north-star-mandated vectorized
  Arrow-UDF path.
* ``native`` — ``from_json`` with an explicit schema: stays entirely JVM-side
  inside whole-stage codegen.  Used as the performance reference; both modes
  are property-tested to produce identical DataFrames.

Output columns (beyond ``lsn``): txid, seq, commit_time_us, op, table,
new_tuple (map<string,string>), old_tuple (map<string,string>), schema_change
(struct<kind,column,type>).  ``committed`` is deliberately NOT produced here —
commit status is derived downstream from COMMIT markers
(operators/assembly.py), as logical decoding does for the reference.
"""

from __future__ import annotations

import io

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import PARSED_EVENT_TYPE, SCHEMA_CHANGE_TYPE

# JSON wire schema of one payload (generator.py writes it; field 'ct' is
# commit_time in unix microseconds — the reference converts the pg epoch-2000
# timestamp the same way, src/replication.rs:19,90-97)
_PAYLOAD_JSON_SCHEMA = T.StructType(
    [
        T.StructField("txid", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("ct", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("new", T.MapType(T.StringType(), T.StringType())),
        T.StructField("old", T.MapType(T.StringType(), T.StringType())),
        T.StructField("change", SCHEMA_CHANGE_TYPE),
    ]
)

_OUT_COLS = [
    "txid",
    "seq",
    "commit_time_us",
    "op",
    "table",
    "new_tuple",
    "old_tuple",
    "schema_change",
]


def _struct_col_to_dicts(table, name: str, n: int) -> list:
    """Arrow struct column -> list of {k: v} dicts with None values dropped
    (absent key == NULL/datum_missing, pg_logicaldec.proto:33)."""
    if name not in table.column_names:
        return [None] * n
    out = []
    for d in table[name].to_pylist():
        if d is None:
            out.append(None)
        else:
            out.append({k: v for k, v in d.items() if v is not None})
    return out


@F.pandas_udf(PARSED_EVENT_TYPE)
def _parse_payload_arrow(payloads: pd.Series) -> pd.DataFrame:
    import pyarrow.json as paj

    n = len(payloads)
    if n == 0:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in _OUT_COLS})
    # one C++-vectorized JSON parse per Arrow batch
    buf = io.BytesIO("\n".join(payloads.tolist()).encode("utf-8"))
    tbl = paj.read_json(buf)

    def col(cname, default=None):
        if cname in tbl.column_names:
            return tbl[cname].to_pandas()
        return pd.Series([default] * n)

    out = pd.DataFrame(
        {
            "txid": col("txid").astype("int64"),
            "seq": col("seq", 0).astype("int32"),
            "commit_time_us": col("ct").astype("int64"),
            "op": col("op"),
            "table": col("table"),
            "new_tuple": pd.Series(_struct_col_to_dicts(tbl, "new", n), dtype=object),
            "old_tuple": pd.Series(_struct_col_to_dicts(tbl, "old", n), dtype=object),
            "schema_change": pd.Series(
                tbl["change"].to_pylist() if "change" in tbl.column_names else [None] * n,
                dtype=object,
            ),
        }
    )
    return out


def parse_events(raw: DataFrame, mode: str = "arrow") -> DataFrame:
    """(lsn, payload) -> (lsn, txid, seq, commit_time_us, op, table,
    new_tuple, old_tuple, schema_change)."""
    if mode == "arrow":
        parsed = raw.select("lsn", _parse_payload_arrow("payload").alias("e"))
    elif mode == "native":
        parsed = raw.select(
            "lsn",
            F.from_json("payload", _PAYLOAD_JSON_SCHEMA).alias("j"),
        ).select(
            "lsn",
            F.struct(
                F.col("j.txid").alias("txid"),
                F.col("j.seq").alias("seq"),
                F.col("j.ct").alias("commit_time_us"),
                F.col("j.op").alias("op"),
                F.col("j.table").alias("table"),
                F.col("j.new").alias("new_tuple"),
                F.col("j.old").alias("old_tuple"),
                F.col("j.change").alias("schema_change"),
            ).alias("e"),
        )
    else:
        raise ValueError(f"unknown parse mode {mode!r}")
    return parsed.select("lsn", "e.*")
