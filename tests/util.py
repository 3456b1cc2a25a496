"""Test helpers: engine-state extraction + three-way comparison.

The comparison mirrors the reference's convergence assertion
(/root/reference/src/types/mod.rs:323-324): materialized states must be equal
row-for-row, including lineage, with the content-sha256 invariant attached
(BASELINE.json input_hint).
"""

from __future__ import annotations

from logicaldecoding_spark.oracle import diff_states, state_with_hashes
from logicaldecoding_spark.table.format import LakeTable


def table_state(spark, table_path: str) -> dict:
    """Engine table -> dict keyed by (repo, path), like the oracle's state."""
    t = LakeTable.load(table_path)
    rows = t.read(spark).collect()
    state = {}
    for r in rows:
        d = r.asDict()
        state[(d["repo"], d["path"])] = d
    return state


def assert_converged(spark, table_path: str, oracle_state: dict) -> None:
    eng = state_with_hashes(table_state(spark, table_path))
    ora = state_with_hashes(oracle_state)
    problems = diff_states(ora, eng, limit=8)
    assert not problems, "engine != oracle:\n" + "\n".join(problems)
    assert len(eng) == len(ora)
