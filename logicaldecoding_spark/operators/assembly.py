"""Committed-transaction assembly.

The reference's client assembles events between BEGIN and COMMIT into
transactions and only emits them on COMMIT
(/root/reference/src/replication.rs:125-136); aborted transactions are never
emitted by logical decoding at all, which is why its subscriber needs no
rollback handling (src/types/mod.rs:285-290 rolls back 10% of generated
transactions and they never reach the stream).

Our captured log DOES contain aborted transactions (BEGIN + data events,
no COMMIT marker), so the distributed equivalent is:

    committed txids = txids having a COMMIT marker
    committed data  = data events LEFT SEMI JOIN committed txids ON txid

The semi-join is the scale-correct shape: at small txn counts AQE turns it
into a broadcast join; at 10^10-event scale it is a shuffled semi-join on a
uniformly distributed key (txid), with map-side distinct on the build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import DATA_OPS, OP_COMMIT


def committed_data_events(parsed: DataFrame, raw: DataFrame | None = None,
                          parse_mode: str = "native") -> DataFrame:
    """Keep only I/U/D events of transactions that committed.

    When the raw (lsn, payload) scan is supplied, the commit-marker side is
    built from a cheap JVM substring prefilter (COMMIT payloads all contain
    '"op":"C"' and are a tiny fraction of the log) instead of a second full
    JSON parse of every event — one string scan replaces one parse pass.
    """
    data = parsed.filter(F.col("op").isin(*DATA_OPS))
    if raw is not None:
        from ..sources.parse import parse_events

        # ONE extra raw scan finds all B/C markers; aborted txids = BEGINs
        # with no COMMIT.  Aborted txns are a small, bounded fraction of a
        # batch (rollback tail), so the anti-join BROADCASTS — the O(events)
        # data side is filtered map-side with NO shuffle, vs a sort-merge
        # semi-join shuffling every event on txid.
        markers = parse_events(
            raw.filter(
                F.col("payload").contains('"op":"B"')
                | F.col("payload").contains('"op":"C"')
            ),
            mode=parse_mode,
        ).select("txid", "op")
        aborted = (
            markers.groupBy("txid")
            .agg(F.max(F.col("op") == OP_COMMIT).alias("has_commit"))
            .filter(~F.col("has_commit"))
            .select("txid")
        )
        return data.join(F.broadcast(aborted), "txid", "left_anti")
    commits = parsed.filter(F.col("op") == OP_COMMIT).select("txid").distinct()
    return data.join(commits, "txid", "left_semi")
