"""Replay batch planning: epochs at schema changes, cuts at commit LSNs.

The reference consumes one transaction at a time off the socket
(/root/reference/src/replication.rs:114-141); the batch analog slices the
captured log into LSN ranges such that

* no transaction straddles a batch boundary (cuts are COMMIT-marker LSNs —
  transactions are serial in the WAL, so every event of a txn has
  lsn <= its commit LSN and > the previous txn's commit LSN): the reference's
  "only whole committed transactions are visible" rule (SURVEY §2.9 T2);
* schema-change (R) events sit on their own boundary: each evolution is a
  batch of its own, applied to table metadata BEFORE the following data
  batch — the transactional-evolution rule.

Planning is cheap at any scale: R events are found with a JVM-side
``contains(payload, ...)`` prefilter (no JSON parse of the full log), and
sub-batch cut points use ``approxQuantile`` over commit LSNs instead of
collecting them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.parse import parse_events


@dataclass(frozen=True)
class BatchPlan:
    kind: str  # 'data' | 'schema'
    lsn_from: int  # exclusive
    lsn_to: int  # inclusive
    change: tuple[str, str, str] | None = None  # (kind, column, type) for 'schema'
    # eager (folded-forward) schema plans must NOT advance the table
    # watermark: they commit before their surrounding data has been applied,
    # and a crash between the two must leave the data replayable.
    advance_watermark: bool = True


def plan_batches(
    raw: DataFrame, target_data_batches: int = 1, parse_mode: str = "native",
    source_table: str | None = None, eager_evolution: bool = True,
) -> list[BatchPlan]:
    """Plan the replay over a raw (lsn, payload) log scan.

    ``source_table`` routes schema-change events in a multi-table log: R
    events naming another table are ignored (an R with no table field is
    table-agnostic and always applies).

    ``eager_evolution`` (default) folds all schema changes FORWARD: every R
    is applied to table metadata first (in LSN order, without advancing the
    watermark), then the data replays as one un-split range.  Sound because
    the supported evolutions (add_column, widen_type) are forward-
    compatible — an event from before the change applied under the post-
    change schema produces exactly the NULL-fill / upcast that read-time
    reconciliation would produce for a row written before the change — and
    because producers emit a column's values only after its relation
    message (pgoutput's contract), so no pre-R event carries the new
    column.  This removes the per-evolution epoch barriers: a log with K
    schema changes replays in K metadata no-ops + the planned data batches
    instead of K extra tiny data epochs.  ``eager_evolution=False`` keeps
    the strict epoch-split order (the two modes are asserted convergent in
    tests)."""
    bounds = raw.agg(
        F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
    ).collect()[0]
    if bounds["hi"] is None:
        return []
    max_lsn = int(bounds["hi"])

    # schema-change events: rare; cheap substring prefilter, then a real parse
    r_df = (
        parse_events(
            raw.filter(F.col("payload").contains('"op":"R"')), mode=parse_mode
        )
        .filter(F.col("op") == "R")
    )
    if source_table is not None:
        r_df = r_df.filter(
            F.col("table").isNull() | (F.col("table") == F.lit(source_table))
        )
    r_rows = r_df.select("lsn", "schema_change").collect()
    r_rows.sort(key=lambda r: r["lsn"])

    plans: list[BatchPlan] = []
    if eager_evolution:
        for r in r_rows:
            ch = r["schema_change"]
            plans.append(
                BatchPlan(
                    "schema", int(r["lsn"]) - 2, min(int(r["lsn"]) + 1, max_lsn),
                    (ch["kind"], ch["column"], ch["type"]),
                    advance_watermark=False,
                )
            )
        plans.extend(
            _split_data_epoch(raw, 0, max_lsn, target_data_batches, parse_mode)
        )
        return plans

    prev = 0  # exclusive lower bound
    for r in r_rows:
        r_lsn = int(r["lsn"])
        # R sits inside its own (B,R,C) txn: include it + its commit marker
        # in the schema batch; data before it forms the preceding epoch.
        if r_lsn - 2 > prev:
            plans.extend(
                _split_data_epoch(raw, prev, r_lsn - 2, target_data_batches, parse_mode)
            )
        ch = r["schema_change"]
        plans.append(
            BatchPlan(
                "schema", r_lsn - 2, min(r_lsn + 1, max_lsn),
                (ch["kind"], ch["column"], ch["type"]),
            )
        )
        prev = min(r_lsn + 1, max_lsn)
    if prev < max_lsn:
        plans.extend(
            _split_data_epoch(raw, prev, max_lsn, target_data_batches, parse_mode)
        )
    return plans


def _split_data_epoch(
    raw: DataFrame, lo: int, hi: int, n: int, parse_mode: str
) -> list[BatchPlan]:
    if n <= 1:
        return [BatchPlan("data", lo, hi)]
    commits = raw.filter(
        (F.col("lsn") > lo) & (F.col("lsn") <= hi)
        & F.col("payload").contains('"op":"C"')
    ).select("lsn")
    qs = [i / n for i in range(1, n)]
    cuts = sorted(set(int(c) for c in commits.approxQuantile("lsn", qs, 0.001)))
    plans = []
    prev = lo
    for c in cuts:
        if c > prev and c < hi:
            plans.append(BatchPlan("data", prev, c))
            prev = c
    plans.append(BatchPlan("data", prev, hi))
    return plans
