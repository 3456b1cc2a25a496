"""Schema-driven typed projection of dynamic tuples.

The reference dispatches on the protobuf ``oneof datum`` at runtime per
column (/root/reference/src/types/mod.rs:59-62, :86-103): a missing datum
folds to NULL (:135-146).  Here the same semantics are a vectorized cast
table driven by the table schema current at the event's epoch:

    try_element_at(new_tuple, 'col')  -> NULL when absent   (P5 in SURVEY §2.2)
    .try_cast(type)                   -> typed column       (P6)

``try_*`` variants keep ANSI mode (Spark 4 default) while preserving the
fold-to-NULL semantics for absent keys.  Everything stays JVM-side in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import REPOS_PK, TableSchema, spark_type


def datum_to_typed(raw: Column, type_name: str) -> Column:
    """Decode one tuple-map datum (string or NULL) to its typed column.

    The map<string,string> wire can't carry bytes or Point natively
    (DatumMessage oneof, reference src/pg_logicaldec.proto:16-35), so those
    travel in safe text encodings and are decoded here, vectorized JVM-side:

    * binary — base64 text (``datum_bytes``, proto:31) -> try_to_binary
    * point  — Postgres text form ``(x,y)`` (``datum_point``, proto:32)
      -> struct<x double, y double>
    * everything else — try_cast under the epoch schema (fold-to-NULL)
    """
    if type_name == "binary":
        return F.try_to_binary(raw, F.lit("base64"))
    if type_name == "point":
        num = r"([-+0-9.eE]+)"
        x = F.regexp_extract(raw, rf"^\({num},", 1).try_cast("double")
        y = F.regexp_extract(raw, rf",{num}\)$", 1).try_cast("double")
        return F.when(
            raw.isNotNull(), F.struct(x.alias("x"), y.alias("y"))
        )
    return raw.try_cast(spark_type(type_name))


def typed_value(tuple_col: str, name: str, type_name: str) -> Column:
    return datum_to_typed(
        F.try_element_at(F.col(tuple_col), F.lit(name)), type_name
    ).alias(name)


def typed_changes(
    events: DataFrame, schema: TableSchema, pk: tuple[str, ...] = REPOS_PK
) -> DataFrame:
    """Project parsed data events into typed change rows under ``schema``.

    Output: pk + data columns (typed), plus op / lsn / seq / txid for
    downstream compaction, MERGE resolution and lineage.  DELETE events carry
    their pk in old_tuple (reference reads the PK from old_tuple on delete,
    src/types/mod.rs:151-160), so pk columns coalesce across both images.
    """
    pk_cols = []
    data_cols = []
    for f in schema.fields:
        if f.name in pk:
            pk_cols.append(
                datum_to_typed(
                    F.coalesce(
                        F.try_element_at(F.col("new_tuple"), F.lit(f.name)),
                        F.try_element_at(F.col("old_tuple"), F.lit(f.name)),
                    ),
                    f.type,
                ).alias(f.name)
            )
        else:
            data_cols.append(typed_value("new_tuple", f.name, f.type))
    return events.select(
        *pk_cols,
        *data_cols,
        F.col("op"),
        F.col("lsn"),
        F.col("seq"),
        F.col("txid"),
    )
