"""Replay batch planning: epochs at schema changes, cuts at commit LSNs.

The reference consumes one transaction at a time off the socket
(/root/reference/src/replication.rs:114-141); the batch analog slices the
captured log into LSN ranges such that

* no transaction straddles a batch boundary (cuts are COMMIT-marker LSNs —
  transactions are serial in the WAL, so every event of a txn has
  lsn <= its commit LSN and > the previous txn's commit LSN): the reference's
  "only whole committed transactions are visible" rule (SURVEY §2.9 T2);
* schema-change (R) events sit on their own boundary: each evolution is a
  metadata-only batch of its own, applied BEFORE the data epoch containing
  its transaction — the transactional-evolution rule.  Boundaries come from
  the R transaction's OWN BEGIN/COMMIT marker LSNs read from the log (an R
  txn may carry data events too; they replay in the following data epoch),
  and an R whose transaction rolled back is skipped, matching the
  committed-only rule of the sequential oracle.

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

    # schema-change events: rare; cheap prefilter, then a real parse.  For
    # the JSON wire a substring match finds them; for protobuf the reserved
    # '__schema__' table name appears literally as length-delimited UTF-8 in
    # the wire bytes (false positives are removed by the parse's op filter).
    is_proto = parse_mode == "proto"
    r_pref = (
        raw.filter(F.col("payload").contains(F.lit(b"__schema__")))
        if is_proto
        else raw.filter(F.col("payload").contains('"op":"R"'))
    )
    r_df = parse_events(r_pref, mode=parse_mode).filter(F.col("op") == "R")
    if source_table is not None:
        r_df = r_df.filter(
            F.col("table").isNull() | (F.col("table") == F.lit(source_table))
        )
    r_rows = r_df.select("lsn", "txid", "schema_change").collect()
    r_rows.sort(key=lambda r: r["lsn"])

    # Each R's epoch boundary is its OWN transaction's BEGIN/COMMIT marker
    # LSNs, read from the log (one prefiltered marker scan over the R txids)
    # — no assumption about how many events the R txn carries or where the
    # R sits inside it (the earlier r_lsn±k arithmetic encoded the test
    # generator's minimal (B,R,C) layout).  Transactions are contiguous
    # serial blocks in the WAL, so (begin_lsn, commit_lsn] covers exactly
    # the R txn.  An R whose txn never committed is SKIPPED — rolled-back
    # schema changes must not apply (matching the sequential oracle's
    # committed-only rule, oracle.py).
    tx_bounds: dict[int, tuple[int, int | None]] = {}
    if r_rows:
        from ..sources.parse import parse_markers

        r_txids = sorted({int(r["txid"]) for r in r_rows})
        # B/C marker prefilter: substring match on the JSON wire; on the
        # protobuf wire markers carry no tuples, so a generous length bound
        # (encoded B/C <= 19 bytes) prunes the scan instead
        mk_pref = (
            raw.filter(F.length("payload") <= 32)
            if is_proto
            else raw.filter(
                F.col("payload").contains('"op":"B"')
                | F.col("payload").contains('"op":"C"')
            )
        )
        mk = parse_markers(
            mk_pref, mode="proto" if is_proto else "json"
        ).filter(F.col("txid").isin(r_txids))
        for m in mk.groupBy("txid").agg(
            F.min(F.when(F.col("op") == "B", F.col("lsn"))).alias("b_lsn"),
            F.max(F.when(F.col("op") == "C", F.col("lsn"))).alias("c_lsn"),
        ).collect():
            tx_bounds[int(m["txid"])] = (
                int(m["b_lsn"]) if m["b_lsn"] is not None else None,
                int(m["c_lsn"]) if m["c_lsn"] is not None else None,
            )

    def _r_span(r) -> tuple[int, int] | None:
        """(begin_lsn-1 exclusive, commit_lsn inclusive] of the R's txn, or
        None if the txn never committed (skip the change)."""
        b, c = tx_bounds.get(int(r["txid"]), (None, None))
        if c is None:
            return None  # uncommitted/rolled-back txn: change does not apply
        return ((b if b is not None else int(r["lsn"])) - 1, c)

    plans: list[BatchPlan] = []
    if eager_evolution:
        for r in r_rows:
            span = _r_span(r)
            if span is None:
                continue
            ch = r["schema_change"]
            plans.append(
                BatchPlan(
                    "schema", span[0], span[1],
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
        span = _r_span(r)
        if span is None:
            continue
        lo, hi = span
        # data strictly before the R txn forms the preceding epoch; the R
        # txn's own events (it may carry data events besides the R) fall
        # into the FOLLOWING data epoch, which starts at the txn's BEGIN so
        # nothing is skipped — the schema batch itself is metadata-only.
        if lo > prev:
            plans.extend(
                _split_data_epoch(raw, prev, lo, target_data_batches, parse_mode)
            )
            prev = lo
        ch = r["schema_change"]
        plans.append(
            BatchPlan(
                "schema", lo, hi,
                (ch["kind"], ch["column"], ch["type"]),
                advance_watermark=False,
            )
        )
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
    rng = raw.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi))
    if parse_mode == "proto":
        from ..sources.parse import parse_markers

        commits = (
            parse_markers(rng.filter(F.length("payload") <= 32), mode="proto")
            .filter(F.col("op") == "C").select("lsn")
        )
    else:
        commits = rng.filter(F.col("payload").contains('"op":"C"')).select("lsn")
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
