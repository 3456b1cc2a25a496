"""Driver-contract conformance: every queries() entry matches its DuckDB
oracle at sf0.01 (row count + schema names + order-insensitive values) —
a local replica of the driver's CORRECTNESS check."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    """Type-sensitive normalization replicating the driver's value hash.

    The driver compares pandas frames type-sensitively: DuckDB HUGEINT
    (e.g. sum(BIGINT) / list_sum) lands in pandas as float/object while
    Spark bigint lands as int — those must NOT compare equal here, or a
    locally-green query ships driver-red (that's how round 1's two red
    rows escaped; see ADVICE.md)."""
    import numpy as np
    import pandas as pd

    if not isinstance(v, (list, tuple, np.ndarray)) and pd.isna(v):
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{v}"
    if isinstance(v, (int, np.integer)):
        return f"int:{int(v)}"
    if isinstance(v, (float, np.floating)):
        return f"float:{float(v):.6f}"
    return f"{type(v).__name__}:{v}"


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 2


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spdf = sdf.toPandas()  # pandas path: same dtype coercion the driver sees
    scols = list(spdf.columns)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op): must run and be non-trivial
        assert len(spdf) > 0, f"{name}: empty result"
        return
    dpdf = ddb.execute(ORACLES[name]).fetchdf()
    dcols = list(dpdf.columns)
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(spdf) == len(dpdf), (
        f"{name}: row count {len(spdf)} vs oracle {len(dpdf)}"
    )
    a = _norm_rows(scols, spdf.itertuples(index=False, name=None))
    b = _norm_rows(dcols, dpdf.itertuples(index=False, name=None))
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mismatches}"
