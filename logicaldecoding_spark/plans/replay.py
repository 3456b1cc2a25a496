"""End-to-end CDC replay: captured WAL log -> converged lake table.

The distributed re-expression of the reference's whole pipeline
(/root/reference/src/main.rs:12-36 + src/types/mod.rs:33-174):

    scan log (lsn-pruned)                 | START_REPLICATION  (replication.rs:75)
    -> vectorized parse                   | RowMessage::decode (replication.rs:120)
    -> committed-txn semi-join            | txn assembly       (replication.rs:125-136)
    -> typed projection (epoch schema)    | oneof dispatch     (types/mod.rs:59-62)
    -> per-PK last-writer-wins compaction | HashMap overwrite  (types/mod.rs:64)
    -> MERGE into lake table (COW or MoR) | subscriber state   (types/mod.rs:39)

with per-batch atomic snapshot commits carrying the applied-LSN watermark
(exactly-once + resume) and schema-evolution batches applied to metadata
before their following data (transactional evolution).

``apply_plans`` is the shared core: the batch entry point (``replay``) feeds
it lsn-pruned Parquet scans; the Structured-Streaming entry point
(streaming/stream_replay.py) feeds it each micro-batch DataFrame.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.compaction import last_writer_wins, last_writer_wins_slim
from ..operators.merge import merge_into
from ..operators.typing import typed_changes
from ..schema import REPOS_INITIAL_SCHEMA, REPOS_PK, TableSchema
from ..sources.parse import parse_events
from ..sources.wal_log import read_wal_log
from ..table.format import LakeTable
from .batches import BatchPlan, plan_batches


def ensure_table(
    table_path: str,
    initial_schema: TableSchema | None = None,
    pk: tuple[str, ...] = REPOS_PK,
    n_buckets: int = 64,
) -> LakeTable:
    t = LakeTable(table_path)
    if not t.io.exists(os.path.join(table_path, "metadata", "version-hint.text")):
        return LakeTable.create(
            table_path, initial_schema or REPOS_INITIAL_SCHEMA, pk=pk,
            n_buckets=n_buckets,
        )
    return LakeTable.load(table_path)


def apply_plans(
    spark: SparkSession,
    table: LakeTable,
    plans: list[BatchPlan],
    raw_provider: Callable[[int | None, int | None], DataFrame],
    *,
    parse_mode: str = "duckdb",
    slim_mode: str = "duckdb",
    salt_buckets: int | None = None,
    compaction: str = "auto",
    max_broadcast_keys: int = 20_000_000,
    source_table: str | None = None,
    slim_provider: Callable[[int | None, int | None], DataFrame] | None = None,
    stop_after_batches: int | None = None,
    batch_id_offset: int = 0,
    merge_mode: str = "cow",
) -> list[dict]:
    """Apply planned batches in order; skip already-applied LSN ranges.

    ``compaction`` selects the per-batch compaction plan:

    * ``'slim'`` — the scale path: per-key winner LSNs from a column-pruned
      narrow pass, broadcast-semi-joined back against the raw scan, so full
      tuples are never shuffled and only winners are fully parsed.  Its
      viability bound is the winner-set broadcast: fine up to ~10^7-10^8
      distinct keys per batch, OOM beyond.
    * ``'full'`` — shuffles every committed event's after-image through one
      aggregation: no broadcast anywhere, survives any key count.
    * ``'auto'`` (default) — estimates the batch's distinct-key count with
      ``approx_count_distinct`` over the cached narrow pass and picks slim
      below ``max_broadcast_keys``, full above — so the default config
      survives a 100x key-count scale-up without an operator retuning
      anything.  The aborted-txid anti-join applies the same guard (abort
      sets are normally a tiny rollback tail, but nothing enforces that).

    Both paths are property-tested equal (tests/test_properties.py)."""
    from pyspark.sql import functions as F

    pk = table.pk
    applied = table.applied_upto_lsn
    batch_metrics: list[dict] = []
    n_done = 0
    for i, b in enumerate(plans):
        if b.lsn_to <= applied:
            continue  # checkpointed: already applied (idempotent replay)
        if stop_after_batches is not None and n_done >= stop_after_batches:
            break
        if b.kind == "schema":
            kind, column, type_name = b.change
            table.evolve_schema(
                kind, column, type_name,
                applied_upto_lsn=b.lsn_to if b.advance_watermark else None,
            )
            batch_metrics.append(
                {"batch": i, "kind": "schema", "change": list(b.change), "upto": b.lsn_to}
            )
            n_done += 1
            continue

        tb0 = time.time()
        # clamp the scan's lower bound to the watermark: a resumed replay
        # whose batch spans (0, max] must cost O(remaining tail), not
        # O(log) — everything <= applied is already in the table, and the
        # watermark is always a batch boundary (commit-aligned), so no
        # transaction straddles the clamp.
        lo_eff = max(b.lsn_from, applied)
        raw = raw_provider(lo_eff, b.lsn_to)
        schema = table.schema  # current-at-epoch schema

        # ONE narrow pass over the batch: pk-only struct parse pruned to
        # (lsn, txid, seq, op, pk) — never materializes large payload values
        # (parse_slim) — cached (~60B/row: unlike full after-images this is
        # cheap to cache).  From it: aborted txids (BEGIN w/o COMMIT), the
        # distinct-key estimate steering the slim/full choice, and (slim
        # path) per-key winner lsns.
        from ..sources.parse import parse_slim

        if slim_provider is not None:
            # fragment-direct scan: Python workers read the log's Parquet
            # row groups themselves — no JVM->Python payload transfer
            p = slim_provider(lo_eff, b.lsn_to)
        else:
            p = parse_slim(raw, pk, mode=slim_mode)
        if source_table is not None:
            # multi-table routing (RowMessage.table, reference
            # src/pg_logicaldec.proto:46): foreign tables' data events are
            # dropped here, BEFORE compaction/merge, so a log carrying
            # several tables can never corrupt this table's state.  B/C
            # markers are transaction-level (no table) and pass through.
            p = p.filter(
                ~F.col("op").isin("I", "U", "D")
                | (F.col("table") == F.lit(source_table))
            )
        slim_all = p.select("lsn", "txid", "seq", "op", *pk).persist()
        markers = slim_all.filter(F.col("op").isin("B", "C"))
        aborted = (
            markers.groupBy("txid")
            .agg(F.max(F.col("op") == "C").alias("has_commit"))
            .filter(~F.col("has_commit"))
            .select("txid")
            .persist()
        )
        # Two-tier stats, one cheap single-stage agg first (materializes the
        # cache): exact event/BEGIN/COMMIT counts.  n_aborted = #B - #C is
        # EXACT (every txn begins once, committed ones commit once).  The
        # distinct-key HLL estimate is only computed — over the now-warm
        # cache — when the event count alone can't prove broadcast
        # viability (keys <= events, so small batches skip the HLL pass
        # entirely).
        t_stats0 = time.time()
        is_data = F.col("op").isin("I", "U", "D")
        st = slim_all.agg(
            F.count(F.when(is_data, True)).alias("events"),
            F.count(F.when(F.col("op") == "B", True)).alias("b"),
            F.count(F.when(F.col("op") == "C", True)).alias("c"),
        ).collect()[0]
        n_events = int(st["events"])
        n_aborted = max(0, int(st["b"]) - int(st["c"]))
        if n_events <= max_broadcast_keys:
            est_keys = n_events  # upper bound is already viable
        else:
            est_keys = int(
                slim_all.filter(is_data)
                .agg(F.approx_count_distinct(F.struct(*pk)).alias("k"))
                .collect()[0]["k"]
            )
        t_stats = time.time() - t_stats0

        abort_join = F.broadcast(aborted) if n_aborted <= max_broadcast_keys \
            else aborted
        slim_data = (
            slim_all.filter(F.col("op").isin("I", "U", "D"))
            .join(abort_join, "txid", "left_anti")
            .select(*pk, "lsn", "seq")
        )
        # touched buckets from the cached NARROW pass (pk strings hash to
        # the same buckets the typed rows will): the wide compacted frame
        # then flows into the MERGE exactly once, never persisted — its
        # cache materialization was the worst-scaling 32-core phase.  Only
        # valid when every pk column is string-typed (slim carries raw
        # strings; xxhash64 of a typed value differs); otherwise merge
        # discovers buckets itself.
        from ..table.format import bucket_expr

        touched = None
        if all(f.type == "string" for f in schema.fields if f.name in pk):
            touched = [
                r["_b"]
                for r in slim_data.select(
                    bucket_expr(table.n_buckets, pk).alias("_b")
                ).distinct().collect()
            ]
        use_slim = compaction == "slim" or (
            compaction == "auto" and est_keys <= max_broadcast_keys
        )
        if use_slim:
            winner_rows = last_writer_wins_slim(
                raw, slim_data, parse_mode=parse_mode, pk=pk,
                salt_buckets=salt_buckets,
            )
            compacted = typed_changes(winner_rows, schema, pk=pk)
        else:
            parsed = parse_events(raw, mode=parse_mode)
            data = parsed.filter(F.col("op").isin("I", "U", "D"))
            if source_table is not None:
                data = data.filter(F.col("table") == F.lit(source_table))
            data = data.join(abort_join, "txid", "left_anti")
            changes = typed_changes(data, schema, pk=pk)
            compacted = last_writer_wins(changes, pk=pk, salt_buckets=salt_buckets)
        m = merge_into(
            spark,
            table,
            compacted,
            applied_upto_lsn=b.lsn_to,
            batch_id=batch_id_offset + i,
            touched=touched,
            mode=merge_mode,
            extra_metrics={"lsn_from": b.lsn_from, "lsn_to": b.lsn_to,
                           "parse_mode": parse_mode,
                           "compaction_used": "slim" if use_slim else "full",
                           "est_keys": est_keys, "aborted_txids": n_aborted},
        )
        slim_all.unpersist()
        aborted.unpersist()
        batch_metrics.append(
            {
                "batch": i,
                "kind": "data",
                "lsn_range": [b.lsn_from, b.lsn_to],
                "rows_written": m["rows_written"],
                "buckets": m["buckets"],
                "compaction": "slim" if use_slim else "full",
                "est_keys": est_keys,
                "secs": round(time.time() - tb0, 3),
                "stats_secs": round(t_stats, 3),
                "phases": m.get("phases"),
            }
        )
        n_done += 1
    return batch_metrics


def replay(
    spark: SparkSession,
    log_path: str,
    table_path: str,
    *,
    initial_schema: TableSchema | None = None,
    pk: tuple[str, ...] = REPOS_PK,
    n_buckets: int = 64,
    # 'auto' prefers the capture's own decoded columns ('sidecar': zero
    # payload decode, zero Python workers) when present; otherwise resolves
    # by measured contention profile: duckdb's yyjson parse wins per-core up
    # to ~16 concurrent workers; past that its allocator contends and the
    # pyarrow C++ reader scales better (A/B on the 30M-event log: 8 cores
    # 53s duckdb vs 62s arrow; 32 cores 43s vs 33s).
    parse_mode: str = "auto",
    n_data_batches: int = 1,
    salt_buckets: int | None = None,
    compaction: str = "auto",
    max_broadcast_keys: int = 20_000_000,
    source_table: str | None = None,
    eager_evolution: bool = True,
    # 'auto': same contention profile as parse_mode — duckdb's yyjson wins
    # per-core up to ~16 concurrent workers, pyarrow scales better past that
    slim_mode: str = "auto",
    direct_slim_scan: bool = False,
    resume: bool = False,
    create: bool = True,
    stop_after_batches: int | None = None,  # crash-injection hook for tests
    # 'mor' writes per-batch deltas (O(changed keys), no target read) and
    # defers merging to readers / LakeTable.compact — see operators/merge.py
    merge_mode: str = "cow",
) -> dict:
    """Replay a captured log into the table; returns run metrics.

    Already-applied LSN ranges are always skipped (the snapshot watermark is
    the mechanism; ``resume=True`` just documents intent), so a re-run after
    a crash converges to the same final state — exactly-once (SURVEY §2.9 T4).
    """
    t0 = time.time()
    from ..dist import ship_package

    ship_package(spark)  # executor workers import this package inside UDFs
    cores = spark.sparkContext.defaultParallelism

    # planning gets the UNPRUNED scan: if the capture carries columnar
    # op/txid sidecar columns, plan_batches plans without ever reading
    # payloads.  The generator's `committed` ground-truth column is dropped
    # here so nothing downstream can cheat with it.
    plan_raw = spark.read.parquet(log_path).drop("committed")

    # tuple sidecar: the capture already carries the DECODED event as
    # columns (key cols + new/old tuple maps) beside the wire payload — the
    # shape an archiver that fully decodes messages writes.  Replay then
    # never re-decodes payloads: the slim pass is a pure column-pruned scan
    # and the winner parse a JVM-side projection (no Python workers at all).
    sidecar_cols = ("lsn", "txid", "seq", "commit_time_us", "op", "table",
                    *pk, "new_tuple", "old_tuple")
    has_tuple_sidecar = set(sidecar_cols) <= set(plan_raw.columns)
    if parse_mode == "auto":
        parse_mode = (
            "sidecar" if has_tuple_sidecar
            else ("duckdb" if cores <= 16 else "arrow")
        )
    if parse_mode == "sidecar" and not has_tuple_sidecar:
        raise ValueError(
            "parse_mode='sidecar' needs a tuple-sidecar capture "
            f"(columns {sidecar_cols}); this log lacks them"
        )
    if slim_mode == "auto":
        # unlike the FULL parse, the pk-pruned slim parse does NOT hit
        # duckdb's high-concurrency allocator contention (measured at 32
        # cores on the 30M-event log: slim duckdb 9.4s vs arrow 17.1s;
        # whole replay 30.7s vs 33.8s) — duckdb wins at every core count
        slim_mode = "sidecar" if parse_mode == "sidecar" else "duckdb"
    if parse_mode == "proto":
        # protobuf-wire log: every parse stage decodes RowMessage bytes
        slim_mode = "proto"
        if direct_slim_scan:
            raise ValueError("direct_slim_scan supports JSON-wire logs only")
    table = ensure_table(table_path, initial_schema, pk, n_buckets) if create \
        else LakeTable.load(table_path)
    plans = plan_batches(plan_raw, target_data_batches=n_data_batches,
                         parse_mode="proto" if parse_mode == "proto" else "native",
                         source_table=source_table,
                         eager_evolution=eager_evolution)

    slim_provider = None
    if direct_slim_scan:
        from ..sources.parse import parse_slim_direct

        slim_provider = lambda lo, hi: parse_slim_direct(  # noqa: E731
            spark, log_path, table.pk, lsn_from=lo, lsn_to=hi
        )

    raw_columns = sidecar_cols if parse_mode == "sidecar" else ("lsn", "payload")
    metrics = apply_plans(
        spark,
        table,
        plans,
        lambda lo, hi: read_wal_log(spark, log_path, lsn_from=lo, lsn_to=hi,
                                    columns=raw_columns),
        slim_provider=slim_provider,
        parse_mode=parse_mode,
        slim_mode=slim_mode,
        salt_buckets=salt_buckets,
        compaction=compaction,
        max_broadcast_keys=max_broadcast_keys,
        source_table=source_table,
        stop_after_batches=stop_after_batches,
        merge_mode=merge_mode,
    )

    wall = time.time() - t0
    final = LakeTable.load(table.path)
    run = {
        "batches_planned": len(plans),
        "batches_applied": len(metrics),
        "table_version": final.version,
        "applied_upto_lsn": final.applied_upto_lsn,
        "wall_secs": round(wall, 3),
        "batches": metrics,
    }
    # per-run metrics log (lineage/observability, north_rule)
    mdir = os.path.join(table_path, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"run-{int(time.time() * 1000)}.json"), "w") as f:
        json.dump(run, f, indent=1)
    return run
