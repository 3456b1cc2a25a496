"""Data model: the WAL change-event schema and the evolving table schema.

The event model is the reference's decoderbufs protobuf
(/root/reference/src/pg_logicaldec.proto:7-50) flattened to columns:

* ``Op`` enum (proto:7-14)  -> ``op`` in {B, C, I, U, D, R}; ``R`` generalizes
  the per-tuple ``new_typeinfo`` schema channel (proto:37-40, :49) into an
  explicit schema-change event (pgoutput RELATION-message analog).
* ``RowMessage`` (proto:42-50) -> one row: lsn, txid, seq, commit_time,
  table, new_tuple, old_tuple.
* ``DatumMessage`` oneof (proto:21-35) -> entries of a map<string,string>;
  an absent key encodes NULL / datum_missing (proto:33).  Typing is applied
  later, driven by the table schema current at the event's epoch — the
  vectorized analog of the reference's runtime oneof dispatch
  (/root/reference/src/types/mod.rs:59-62).

The table schema model is Iceberg-style: fields carry stable ids so columns
can be added and types widened without rewriting history.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# ops (reference Op enum, pg_logicaldec.proto:7-14, plus R for schema change)
# ---------------------------------------------------------------------------
OP_BEGIN = "B"
OP_COMMIT = "C"
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
OP_RELATION = "R"
DATA_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)

# engine-written lineage columns (the reference's xmin analog,
# /root/reference/src/types/tenant/mod.rs:7 fetched via RETURNING xmin)
LINEAGE_COLS = ("_last_lsn", "_last_txid")

# ---------------------------------------------------------------------------
# WAL event log schema (captured log on Parquet; FIXTURES.md section 2)
# ---------------------------------------------------------------------------
SCHEMA_CHANGE_TYPE = T.StructType(
    [
        # add_column | widen_type | rename_column | drop_column
        T.StructField("kind", T.StringType()),
        T.StructField("column", T.StringType()),
        # target logical type name; for rename_column, the NEW column name
        T.StructField("type", T.StringType()),
    ]
)

WAL_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("txid", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("commit_time", T.TimestampType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("table", T.StringType(), True),
        T.StructField("new_tuple", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("old_tuple", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("committed", T.BooleanType(), True),  # ground truth for tests
        T.StructField("schema_change", SCHEMA_CHANGE_TYPE, True),
        T.StructField("payload", T.StringType(), False),  # raw serialized event
    ]
)

# What the vectorized parser reconstructs from ``payload`` alone.  ``committed``
# is deliberately NOT part of it: the engine must derive commit status from
# the presence of a COMMIT marker, like logical decoding itself
# (/root/reference/src/replication.rs:125-136).
PARSED_EVENT_TYPE = T.StructType(
    [
        T.StructField("txid", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("commit_time_us", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("new_tuple", T.MapType(T.StringType(), T.StringType())),
        T.StructField("old_tuple", T.MapType(T.StringType(), T.StringType())),
        T.StructField("schema_change", SCHEMA_CHANGE_TYPE),
    ]
)

# ---------------------------------------------------------------------------
# evolving table schema (Iceberg-style field ids)
# ---------------------------------------------------------------------------
_SPARK_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    # decoderbufs Point{x,y} (reference src/pg_logicaldec.proto:16-19,32);
    # wire encoding in the tuple map is the Postgres text form "(x,y)"
    "point": T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
    ),
}

# legal widenings (Iceberg spec's primitive type promotion set)
WIDENINGS: dict[tuple[str, str], bool] = {
    ("int", "long"): True,
    ("float", "double"): True,
}


def spark_type(name: str) -> T.DataType:
    return _SPARK_TYPES[name]


@dataclass(frozen=True)
class Field:
    id: int
    name: str
    type: str  # logical type name, key of _SPARK_TYPES
    nullable: bool = True

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}

    @staticmethod
    def from_json(d: dict) -> "Field":
        return Field(d["id"], d["name"], d["type"], d.get("nullable", True))


@dataclass
class TableSchema:
    """Ordered field list + stable ids; supports add_column / widen_type /
    rename_column / drop_column (the Iceberg evolution set minus reorder).

    ``last_id`` is the Iceberg ``last-column-id``: the highest field id EVER
    assigned, including dropped fields.  add_column allocates above it, so a
    dropped column's id is never reused — the field-id read projection would
    otherwise resurrect the dropped column's old values into a later
    same-named column."""

    fields: list[Field] = field(default_factory=list)
    schema_id: int = 0
    last_id: int = 0

    def __post_init__(self):
        floor = max((f.id for f in self.fields), default=0)
        if self.last_id < floor:
            self.last_id = floor

    # -- construction -------------------------------------------------------
    @staticmethod
    def initial(cols: list[tuple[str, str, bool]]) -> "TableSchema":
        return TableSchema(
            fields=[Field(i + 1, n, t, nl) for i, (n, t, nl) in enumerate(cols)],
            schema_id=0,
        )

    # -- evolution ----------------------------------------------------------
    def add_column(self, name: str, type_name: str) -> "TableSchema":
        for f in self.fields:
            if f.name == name:
                # idempotent re-apply (crash-resume): the column exists at
                # the requested type, or at a type it was later widened to
                if f.type == type_name or WIDENINGS.get((type_name, f.type)):
                    return self
                raise ValueError(f"column {name!r} already exists")
        if type_name not in _SPARK_TYPES:
            raise ValueError(f"unknown type {type_name!r}")
        next_id = self.last_id + 1
        return TableSchema(
            fields=[*self.fields, Field(next_id, name, type_name, True)],
            schema_id=self.schema_id + 1,
            last_id=next_id,
        )

    def widen_type(self, name: str, to_type: str) -> "TableSchema":
        out = []
        found = False
        for f in self.fields:
            if f.name == name:
                found = True
                if f.type == to_type:
                    return self  # idempotent re-apply (crash-resume)
                elif WIDENINGS.get((f.type, to_type)):
                    out.append(Field(f.id, f.name, to_type, f.nullable))
                else:
                    raise ValueError(f"illegal widen {f.type}->{to_type} for {name!r}")
            else:
                out.append(f)
        if not found:
            raise ValueError(f"no column {name!r}")
        return TableSchema(fields=out, schema_id=self.schema_id + 1,
                           last_id=self.last_id)

    def rename_column(self, old: str, new: str) -> "TableSchema":
        """Metadata-only rename: the field keeps its id (and therefore all
        its already-written data files — the id-based read projection
        surfaces old files' values under the new name, per the Iceberg
        spec's rename rule)."""
        names = {f.name for f in self.fields}
        if old not in names:
            if new in names:
                return self  # idempotent re-apply (crash-resume)
            raise ValueError(f"no column {old!r}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        if not new or new.startswith("_"):
            raise ValueError(f"illegal column name {new!r}")
        out = [
            Field(f.id, new, f.type, f.nullable) if f.name == old else f
            for f in self.fields
        ]
        return TableSchema(fields=out, schema_id=self.schema_id + 1,
                           last_id=self.last_id)

    def drop_column(self, name: str) -> "TableSchema":
        """Metadata-only drop: data files are untouched; the read projection
        simply stops selecting the field.  Its id is retired forever
        (``last_id`` never decreases), so a later same-named add_column gets
        a fresh id and does NOT resurrect the dropped values."""
        if all(f.name != name for f in self.fields):
            return self  # idempotent re-apply (crash-resume)
        if len(self.fields) == 1:
            raise ValueError("cannot drop the last column")
        return TableSchema(
            fields=[f for f in self.fields if f.name != name],
            schema_id=self.schema_id + 1,
            last_id=self.last_id,
        )

    def apply_change(self, kind: str, column: str, type_name: str) -> "TableSchema":
        if kind == "add_column":
            return self.add_column(column, type_name)
        if kind == "widen_type":
            return self.widen_type(column, type_name)
        if kind == "rename_column":
            # wire shape reuses the {kind, column, type} triple: ``column``
            # is the old name, ``type`` carries the NEW name
            return self.rename_column(column, type_name)
        if kind == "drop_column":
            return self.drop_column(column)
        raise ValueError(f"unknown schema change kind {kind!r}")

    # -- views ---------------------------------------------------------------
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def to_spark(self, with_lineage: bool = True) -> T.StructType:
        fields = [T.StructField(f.name, spark_type(f.type), f.nullable) for f in self.fields]
        if with_lineage:
            fields += [
                T.StructField("_last_lsn", T.LongType(), True),
                T.StructField("_last_txid", T.LongType(), True),
            ]
        return T.StructType(fields)

    def to_json(self) -> dict:
        return {
            "schema_id": self.schema_id,
            "last_column_id": self.last_id,
            "fields": [f.to_json() for f in self.fields],
        }

    @staticmethod
    def from_json(d: dict) -> "TableSchema":
        # pre-rename/drop metadata carries no last_column_id; max(field id)
        # is exact for it (nothing was ever dropped)
        return TableSchema(
            fields=[Field.from_json(f) for f in d["fields"]],
            schema_id=d["schema_id"],
            last_id=d.get("last_column_id", 0),
        )


# the target table of source-code repositories (BASELINE.json input_hint);
# the analog of the reference's ``tenants`` DDL
# (/root/reference/migrations/20221009093923_create_tables.up.sql:1-6).
# PK = (repo, path).
REPOS_PK = ("repo", "path")
REPOS_INITIAL_SCHEMA = TableSchema.initial(
    [
        ("repo", "string", False),
        ("path", "string", False),
        ("commit", "string", False),
        ("lang", "string", True),
        ("content", "string", True),
    ]
)
