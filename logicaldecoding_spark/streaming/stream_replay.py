"""Structured-Streaming CDC replay: live WAL tail -> lake table.

The streaming twin of plans/replay.py — the closest analog of the
reference's live mode, where the client tails the replication socket and
applies transactions as they commit (/root/reference/src/replication.rs:114-141).
Here the "socket" is a growing directory of log files (the shape a Debezium/
WAL-archiver sink produces): ``readStream`` file source discovers new files,
``foreachBatch`` runs the exact same plan/apply pipeline per micro-batch, and
the lake table's snapshot watermark makes the sink idempotent — a restarted
query that re-delivers a micro-batch is a no-op, which together with the
streaming checkpoint gives end-to-end exactly-once.

Constraint (documented, enforced by the file writer): each log FILE contains
whole transactions (no txn straddles a file boundary), so commit markers for
every data event in a micro-batch are present in that micro-batch.  Cross-
file transaction assembly would need a stateful buffer of open transactions
(applyInPandasWithState) — future work, not required for archiver-shaped
logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..plans.batches import plan_batches
from ..plans.replay import apply_plans, ensure_table
from ..schema import REPOS_PK, TableSchema

# minimal on-disk schema the streaming source needs (lsn + payload; other
# captured-log columns are ignored by the engine)
LOG_FILE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("payload", T.StringType(), False),
    ]
)


def stream_replay(
    spark: SparkSession,
    log_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    initial_schema: TableSchema | None = None,
    pk: tuple[str, ...] = REPOS_PK,
    n_buckets: int = 64,
    parse_mode: str = "arrow",
    salt_buckets: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming replay; returns the StreamingQuery.

    Drive it synchronously in tests with ``q.processAllAvailable()``; in
    production it runs until stopped, checkpointing file offsets to
    ``checkpoint_dir``.
    """
    from ..dist import ship_package

    ship_package(spark)  # executor workers import this package inside UDFs
    table = ensure_table(table_path, initial_schema, pk, n_buckets)

    reader = (
        spark.readStream.schema(LOG_FILE_SCHEMA)
        .option("latestFirst", "false")
        .option("maxFilesPerTrigger", str(max_files_per_trigger or 16))
    )
    raw_stream = reader.parquet(log_dir).select("lsn", "payload")

    def apply_micro_batch(df: DataFrame, epoch_id: int) -> None:
        batch = df.persist()
        try:
            # same planner as batch replay, over this micro-batch only:
            # schema-change events become barriers within the micro-batch
            plans = plan_batches(batch, target_data_batches=1, parse_mode="native")
            if not plans:
                return
            tbl = ensure_table(table_path, initial_schema, pk, n_buckets)
            apply_plans(
                spark,
                tbl,
                plans,
                lambda lo, hi: batch.filter(
                    (batch.lsn > (lo or 0)) & (batch.lsn <= hi)
                ),
                parse_mode=parse_mode,
                salt_buckets=salt_buckets,
                batch_id_offset=int(epoch_id) * 1000,
            )
        finally:
            batch.unpersist()

    return (
        raw_stream.writeStream.foreachBatch(apply_micro_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="2 seconds")
        .start()
    )
