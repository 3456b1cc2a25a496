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
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


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
    srows = sdf.collect()
    scols = sdf.columns
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op): must run and be non-trivial
        assert len(srows) > 0, f"{name}: empty result"
        return
    res = ddb.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    a = _norm_rows(scols, [[r[c] for c in scols] for r in srows])
    b = _norm_rows(dcols, drows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mismatches}"
