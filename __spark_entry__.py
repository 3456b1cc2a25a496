"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (the CDC
dataflow operators, expressed over the driver's testdata tables) plus the
training-data-pipeline operators (dedup / similarity / text analysis /
multimodal plumbing).  ``oracle_sql()`` gives the DuckDB-checkable ANSI twin
for each; genuinely non-SQL-expressible ops (MinHash/SimHash/LSH — they
depend on xxhash64 / numpy hyperplanes) are exposed without an oracle and get
the driver's rows-only check.

Column aliases match between Spark and SQL exactly (the driver hashes values
under sorted column names).  Floats are rounded on BOTH sides before compare.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# importable regardless of the caller's cwd, driver- AND executor-side
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from logicaldecoding_spark.dist import ship_package

    ship_package(spark)  # executor workers need the package for pandas UDFs
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC engine's core operator — per-key last-writer-wins
    compaction (SURVEY §2.4 A2) — over the sf0.001 events stream."""
    return _q_a2_last_writer_wins(spark, SF_DEFAULT)


# ---------------------------------------------------------------------------
# CDC operator demos over the events stream (SURVEY §2)
# ---------------------------------------------------------------------------
def _q_s4_event_filter(spark, sf):  # S4/P1: frame demux = filter on type
    ev = _t(spark, sf, "events")
    return ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.round("value", 4).alias("value")
    )


def _q_s8_point_lookup(spark, sf):  # S8: point lookup by key
    ev = _t(spark, sf, "events")
    return ev.filter(F.col("event_id") == 500).select(
        "event_id", "user_id", "event_type"
    )


def _q_s9_semi_join(spark, sf):  # S9/J2: IN-list / semi-join lookup
    ev = _t(spark, sf, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id").distinct()
    return (
        ev.join(signups, "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def _q_a1_txn_assembly(spark, sf):  # A1: group-fold per txn(user) envelope
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def _q_a2_last_writer_wins(spark, sf):  # A2: per-key last-wins via max_by
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.max_by(
            F.struct(F.col("event_type"), F.col("value")),
            F.struct(F.col("ts"), F.col("event_id")),
        ).alias("_e")
    ).select(
        "user_id",
        F.col("_e.event_type").alias("last_event_type"),
        F.round(F.col("_e.value"), 4).alias("last_value"),
    )


def _q_a2_salted_lww(spark, sf):  # A2 + explicit salt (two-phase reduce)
    from logicaldecoding_spark.operators.compaction import last_writer_wins

    ev = _t(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    out = last_writer_wins(ev, pk=("user_id",), order=("ts", "event_id"),
                           salt_buckets=8)
    return out.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round(F.col("value"), 4).alias("last_value"),
    )


def _q_s5_props_parse(spark, sf):  # S5/P3: vectorized payload parse + agg
    ev = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"), F.count("k").alias("n_k")
    )


def _q_a3_txn_count(spark, sf):  # A3: transaction counting metric
    ev = _t(spark, sf, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


def _q_set1_except(spark, sf):  # set op: the exceptAll convergence-check shape
    ev = _t(spark, sf, "events")
    a = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 95))
        .select("user_id").distinct()
    )
    b = (
        ev.filter((F.col("event_type") == "click") & (F.col("value") > 95))
        .select("user_id").distinct()
    )
    return a.exceptAll(b).distinct()


def _q_o1_global_order(spark, sf):  # O1: total order + limit
    ev = _t(spark, sf, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").asc())
        .select("event_id", "user_id", "event_type")
        .limit(100)
    )


def _q_t9_window_tumbling(spark, sf):  # T-style tumbling window agg (batch)
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


def _q_w1_topk_per_group(spark, sf):  # top-k per group window
    ev = _t(spark, sf, "events")
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", F.round("value", 4).alias("value"))
    )


def _q_w2_lag_delta(spark, sf):  # W: order recovery via lag over event-time
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.col("value") - F.lag("value").over(w), 4
        ).alias("value_delta"),
    )


def _q_a4_rollup(spark, sf):  # A: hierarchical agg (ROLLUP)
    ev = _t(spark, sf, "events")
    return ev.rollup("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )


def _q_t10_sessionize(spark, sf):  # T: gap-based sessionization (batch form)
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # ntz -> utc seconds
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("sess_id", F.sum(new_sess).over(w))
    return sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
    )


def _q_f7_string_funcs(spark, sf):  # F: scalar string functions
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.length("text").alias("len"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("tag"),
        F.reverse(F.substring("text", 1, 8)).alias("head_rev"),
    )


def _q_q5_local_supply(spark, sf):  # multi-way broadcast-chain join + agg
    region = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def _q_j1_keyed_merge(spark, sf):  # J1: keyed lookup-and-merge (MERGE shape)
    cust = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"), "c_name"
    )
    last = _q_a2_last_writer_wins(spark, sf).select(
        F.col("user_id").alias("key"), "last_event_type"
    )
    j = cust.join(last, "key", "full_outer")
    status = (
        F.when(F.col("c_name").isNull(), F.lit("insert"))
        .when(F.col("last_event_type").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    return j.select("key", "c_name", "last_event_type", status.alias("merge_action"))


# ---------------------------------------------------------------------------
# engine-native lake queries: the REAL LakeTable (table/format.py) built
# deterministically from the events stream, then queried through time travel
# / CDC-out changelog / stats-pruned scan — the driver's DuckDB oracle checks
# the ENGINE, not just the operator shapes.
# ---------------------------------------------------------------------------
_LAKE_CACHE: dict[str, tuple] = {}
_SEQ_CACHE: dict[str, tuple] = {}


def _stamped_events(spark, sf):
    """(seq, n): the events stream with ``lsn = row_number() OVER (ORDER BY
    ts, event_id)`` and ``txid = event_id`` — the stamp every lake builder
    here uses — computed SCALABLY instead of through a single-partition
    window (the ``WindowExec: No Partition Defined`` shape, r5 verdict ask
    #3, which sorts the whole stream in one task).

    Equivalent-by-construction plan: range-repartition by the order key and
    sort within partitions (disjoint, ordered key ranges per partition),
    then ``monotonically_increasing_id`` yields (partition_id << 33 | row
    ordinal); one tiny per-partition count aggregate gives each partition's
    global offset, so ``offset[pid] + ordinal + 1`` IS the global row
    number.  The ranged frame is persisted before the count so both jobs
    see one materialization (range-sampling boundaries are otherwise free
    to differ between jobs).  The count doubles as the n=count(*) the
    callers all need, saving their separate count job."""
    if sf in _SEQ_CACHE:
        return _SEQ_CACHE[sf]
    ev = _t(spark, sf, "events").select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    nparts = max(2, spark.sparkContext.defaultParallelism)
    base = (
        ev.repartitionByRange(nparts, "ts", "event_id")
        .sortWithinPartitions("ts", "event_id")
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    pid = F.shiftright("_mid", 33)
    counts = sorted(
        base.groupBy(pid.alias("_pid")).agg(F.count("*").alias("_n"))
        .collect(),
        key=lambda r: r["_pid"],
    )
    n = sum(r["_n"] for r in counts)
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["_n"]
    off_df = spark.createDataFrame(offsets, "_pid long, _off long")
    seq = (
        base.withColumn("_pid", pid)
        .join(F.broadcast(off_df), "_pid")
        .select(
            "user_id", "event_type", "value",
            (F.col("_off") + F.col("_mid").bitwiseAND((1 << 33) - 1) + 1)
            .alias("lsn"),
            F.col("event_id").alias("txid"),
        )
    )
    _SEQ_CACHE[sf] = (seq, n)
    return _SEQ_CACHE[sf]


def _half_winners(seq, cut):
    """Per-user last-writer winners for BOTH halves of the stamped stream in
    ONE aggregate pass: ``groupBy(_half, user_id)`` partitions rows exactly
    as the two per-half ``groupBy(user_id)`` aggregates the lake builders
    previously ran (``_half`` is a pure function of ``lsn``), so each slice
    holds identical rows — but the stream is scanned once, and each merge's
    write job consumes a small persisted slice instead of re-running the
    full aggregate inline (guide §2.4: operations keyed the same way share
    one pass).  Caller unpersists after the last consumer."""
    return (
        seq.withColumn("_half", (F.col("lsn") <= cut).cast("int"))
        .groupBy("_half", "user_id")
        .agg(
            F.max_by(
                F.struct("event_type", "value", "txid"), F.col("lsn")
            ).alias("_e"),
            F.max("lsn").alias("lsn"),
        )
        .select(
            "_half", "user_id", F.col("_e.event_type").alias("event_type"),
            F.col("_e.value").alias("value"), F.lit("U").alias("op"),
            "lsn", F.col("_e.txid").alias("txid"),
        )
        .persist()
    )


def _events_lake(spark, sf):
    """Two-batch LakeTable over the events stream: lsn = row_number ordered
    by (ts, event_id); batch 1 = first half, batch 2 = the rest.  Returns
    (table, cut_lsn, version_after_batch1)."""
    if sf in _LAKE_CACHE:
        return _LAKE_CACHE[sf]
    import tempfile

    from logicaldecoding_spark.operators.merge import merge_into
    from logicaldecoding_spark.schema import TableSchema
    from logicaldecoding_spark.table.format import LakeTable

    seq, n = _stamped_events(spark, sf)
    cut = n // 2
    schema = TableSchema.initial(
        [("user_id", "long", False), ("event_type", "string", True),
         ("value", "double", True)]
    )
    path = tempfile.mkdtemp(prefix="events_lake_")
    t = LakeTable.create(os.path.join(path, "t"), schema, pk=("user_id",),
                         n_buckets=8)
    v_mid = None
    winners = _half_winners(seq, cut)
    for bid, (half, hi) in enumerate(((1, cut), (0, n))):
        comp = winners.filter(F.col("_half") == half).drop("_half")
        # touched = all buckets, known a priori: the compacted set is a
        # whole-stream per-user aggregate (users >> buckets), so the
        # discover pass (persist + distinct collect, one Spark job per
        # merge) would always answer "every bucket"; a superset is safe —
        # COW's full-outer join passes untouched target rows through
        merge_into(spark, t, comp, applied_upto_lsn=hi, batch_id=bid,
                   touched=list(range(t.n_buckets)))
        if bid == 0:
            v_mid = t.version
    winners.unpersist()
    _LAKE_CACHE[sf] = (t, cut, v_mid)
    return _LAKE_CACHE[sf]


def _q_tt_time_travel(spark, sf):  # time travel: state as of the mid snapshot
    t, _cut, v_mid = _events_lake(spark, sf)
    return t.read_version(spark, v_mid).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    )


def _q_cdc_changelog(spark, sf):  # CDC-out: changelog between two snapshots
    t, _cut, v_mid = _events_lake(spark, sf)
    return t.read_changes(spark, v_mid).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
        F.col("_change_type").alias("change_type"),
    )


def _q_lake_pruned_scan(spark, sf):  # stats-pruned predicate scan of the lake
    t, _cut, _v = _events_lake(spark, sf)
    return t.read(
        spark, where=[("user_id", ">=", 3), ("user_id", "<", 8)]
    ).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    )


def _q_lake_meta_agg(spark, sf):
    """Metadata-only aggregate (LakeTable.agg_stats): count/min/max folded
    from manifest footer stats with ZERO Spark jobs — ``spark=None`` in the
    agg_stats call is the proof (any scan would raise).  The oracle
    recomputes the same numbers from the raw events the long way."""
    t, _cut, _v = _events_lake(spark, sf)
    st = t.agg_stats(None, cols=("user_id", "value"))
    raw = spark.createDataFrame(
        [(st["rows"], st["cols"]["user_id"]["min"],
          st["cols"]["user_id"]["max"], st["cols"]["value"]["min"],
          st["cols"]["value"]["max"], st["cols"]["value"]["nulls"],
          st["scanned_files"])],
        "n_rows long, min_user long, max_user long, min_value double,"
        " max_value double, value_nulls long, scanned_files long",
    )
    return raw.select(
        "n_rows", "min_user", "max_user",
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        "value_nulls", "scanned_files",
    )


_MV_CACHE: dict[str, object] = {}


def _q_mv_incremental_agg(spark, sf):
    """Incremental materialized aggregate (operators/mv.py): per-event-type
    rollup of the lake's live state, maintained from the CDC changelog in
    TWO refreshes (create -> v_mid -> head) so the second fold runs purely
    on preimage/postimage deltas — group migration (a user's last event_type
    changing between batches) and min/max retraction rescans included.  The
    oracle recomputes the same rollup from scratch over the final state."""
    t, _cut, v_mid = _events_lake(spark, sf)
    if sf not in _MV_CACHE:
        import tempfile

        from logicaldecoding_spark.operators.mv import MaterializedAggregate

        mv = MaterializedAggregate.create(
            os.path.join(tempfile.mkdtemp(prefix="events_mv_"), "mv"), t,
            ["event_type"],
            {"n_users": ("count", "*"), "sum_value": ("sum", "value"),
             "avg_value": ("avg", "value"), "min_value": ("min", "value"),
             "max_value": ("max", "value")},
            n_buckets=8,
        )
        mv.refresh(spark, to_version=v_mid)  # fold batch 1
        mv.refresh(spark)                    # incremental fold of batch 2
        _MV_CACHE[sf] = mv
    mv = _MV_CACHE[sf]
    return mv.read(spark).select(
        "event_type", "n_users",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("avg_value", 4).alias("avg_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    )


_WAP_CACHE: dict[str, object] = {}


def _q_lake_branch_publish(spark, sf):
    """Write-audit-publish (table/format.py refs): batch 1 commits to main,
    batch 2 is STAGED on a branch (invisible to main readers), audited, and
    fast-forward-published.  The returned frame is main's post-publish
    state, which the oracle recomputes as a plain last-writer-wins over the
    whole events stream — proving the staged commits landed exactly and the
    publish snapshot carried the branch's watermark/content byte-for-byte."""
    if sf not in _WAP_CACHE:
        import tempfile

        from logicaldecoding_spark.operators.merge import merge_into
        from logicaldecoding_spark.schema import TableSchema
        from logicaldecoding_spark.table.format import LakeTable

        seq, n = _stamped_events(spark, sf)
        cut = n // 2
        schema = TableSchema.initial(
            [("user_id", "long", False), ("event_type", "string", True),
             ("value", "double", True)]
        )
        path = tempfile.mkdtemp(prefix="wap_lake_")
        t = LakeTable.create(os.path.join(path, "t"), schema,
                             pk=("user_id",), n_buckets=8)

        # one shared winner pass for both halves (see _half_winners);
        # touched known a priori (see _events_lake): skip the discover job
        winners = _half_winners(seq, cut)
        comp = lambda half: winners.filter(  # noqa: E731
            F.col("_half") == half).drop("_half")
        merge_into(spark, t, comp(1), applied_upto_lsn=cut, batch_id=0,
                   touched=list(range(t.n_buckets)))
        b = t.create_branch("stage")
        merge_into(spark, b, comp(0), applied_upto_lsn=n, batch_id=1,
                   touched=list(range(t.n_buckets)))
        winners.unpersist()
        assert t.applied_upto_lsn == cut  # audit: main untouched by staging
        t.publish("stage")
        _WAP_CACHE[sf] = t
    t = _WAP_CACHE[sf]
    return t.read(spark).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    )


_ZLAKE_CACHE: dict[str, object] = {}


def _q_lake_zorder_scan(spark, sf):
    """Z-order-clustered rewrite (compact(cluster='zorder')) + a TWO-column
    predicate read through the stats pruner.  Correctness is the oracle's
    plain filter over last-writer-wins state; the multi-column pruning
    benefit itself is plan-asserted in tests/test_file_skipping.py."""
    if sf not in _ZLAKE_CACHE:
        import tempfile

        from logicaldecoding_spark.operators.merge import merge_into
        from logicaldecoding_spark.schema import TableSchema
        from logicaldecoding_spark.table.format import LakeTable

        seq, _n = _stamped_events(spark, sf)
        schema = TableSchema.initial(
            [("user_id", "long", False), ("event_type", "string", True),
             ("value", "double", True)]
        )
        path = tempfile.mkdtemp(prefix="zorder_lake_")
        t = LakeTable.create(os.path.join(path, "t"), schema,
                             pk=("user_id",), n_buckets=4)
        comp = (
            seq.groupBy("user_id")
            .agg(F.max_by(F.struct("event_type", "value", "txid"),
                          F.col("lsn")).alias("_e"),
                 F.max("lsn").alias("lsn"))
            .select("user_id", F.col("_e.event_type").alias("event_type"),
                    F.col("_e.value").alias("value"),
                    F.lit("U").alias("op"), "lsn",
                    F.col("_e.txid").alias("txid"))
        )
        # touched known a priori (see _events_lake): skip the discover job
        merge_into(spark, t, comp, applied_upto_lsn=10**9, batch_id=0,
                   touched=list(range(t.n_buckets)))
        t.compact(spark, sort_by=("user_id", "value"),
                  max_rows_per_file=500, cluster="zorder")
        _ZLAKE_CACHE[sf] = t
    t = _ZLAKE_CACHE[sf]
    return t.read(
        spark,
        where=[("user_id", ">=", 10), ("user_id", "<", 40),
               ("value", ">=", 0.0), ("value", "<", 50.0)],
    ).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    )


# ---------------------------------------------------------------------------
# relational/agg engine demos (Catalyst-native)
# ---------------------------------------------------------------------------
def _q_q1_pricing_summary(spark, sf):  # TPC-H Q1 shape
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q_q3_top_orders(spark, sf):  # join + agg + deterministic top-k
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        j.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)
    )


def _q_s7_full_scan(spark, sf):  # S7: verification full scan (counts)
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.countDistinct("l_orderkey").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# training-data pipeline: dedup / text / similarity / multimodal
# ---------------------------------------------------------------------------
def _q_dedup_exact(spark, sf):
    from logicaldecoding_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "documents"))


def _q_dedup_ngram_jaccard(spark, sf):
    from logicaldecoding_spark.operators.dedup import ngram_jaccard_all_pairs

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 80)
    return ngram_jaccard_all_pairs(docs, threshold=0.55, shingle_k=3)


def _q_dedup_prefix_join(spark, sf):
    """EXACT sub-quadratic set-similarity join (PPJoin-style prefix +
    length + positional filters, all exact necessary conditions): unlike
    the LSH paths this reproduces the all-pairs answer BY CONSTRUCTION on
    any corpus, no per-corpus tuning.  Driver config runs the high-threshold
    regime (t=0.8, the realistic near-dup bar) on a 250-doc slice; the
    oracle is the quadratic all-pairs SQL at the same params.  Note the
    honest scale boundary (operators/dedup.py docstring): on corpora whose
    random pairs sit just under the threshold (heavy shared boilerplate at
    mid thresholds), ANY exact method degenerates toward all-pairs because
    the near-threshold pairs genuinely exist — LSH+cap remains the scale
    path when approximate recall is acceptable."""
    from logicaldecoding_spark.operators.dedup import jaccard_prefix_join_pairs

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 250)
    return jaccard_prefix_join_pairs(docs, threshold=0.8, shingle_k=5)


def _q_dedup_minhash(spark, sf):
    """MinHash-LSH near-dup pipeline, oracled against the exact all-pairs
    n-gram-Jaccard SQL: with bands=32/rows=2 a true pair at jaccard >= 0.6
    collides in >=1 band with prob 1-(1-0.36)^32 ~ 1-6e-7, so at this corpus
    the candidate set provably covers the exact answer and the verified
    output is value-equal to the quadratic oracle (gated in
    tests/test_recall_gates.py)."""
    from logicaldecoding_spark.operators.dedup import minhash_dedup_pairs

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return minhash_dedup_pairs(docs, threshold=0.6, shingle_k=5,
                               k=64, bands=32, rows=2)


def _q_dedup_simhash(spark, sf):
    """SimHash near-dup pairs — rows-only check BY DESIGN, permanently: the
    output's hamming column is a distance between xxhash64-derived 64-bit
    signatures, a quantity no ANSI-SQL oracle can recompute (DuckDB has no
    xxhash64, and the value depends on Spark's exact hash), so there is no
    meaningful SQL twin.  Correctness is instead gated in pytest
    (tests/test_recall_gates.py): the vectorized signature equals a per-row
    reference implementation bit-for-bit, and banding finds all exact copies.

    max_hamming=3 is the regime the 4x16-bit banding GUARANTEES complete
    (pigeonhole: <=3 flipped bits leave >=1 band identical); larger radii
    are best-effort with this banding."""
    from logicaldecoding_spark.operators.dedup import simhash_dup_pairs

    return simhash_dup_pairs(_t(spark, sf, "documents"), max_hamming=3)


def _q_dedup_embedding(spark, sf):
    # production path: LSH-bucketed candidates + exact verify (no all-pairs
    # join in the plan); value-equal to the quadratic oracle at test SFs,
    # enforced by the recall gate in tests/test_recall_gates.py.
    from logicaldecoding_spark.operators.dedup import embedding_neardup_pairs_lsh

    return embedding_neardup_pairs_lsh(
        _t(spark, sf, "embeddings"), dim=64, threshold=0.4
    )


def _q_text_token_stats(spark, sf):
    from logicaldecoding_spark.operators.text import token_stats

    return token_stats(_t(spark, sf, "documents"))


def _q_text_quality(spark, sf):
    from logicaldecoding_spark.operators.text import quality_score

    return quality_score(_t(spark, sf, "documents"))


def _q_text_lang_id(spark, sf):
    from logicaldecoding_spark.operators.text import lang_id

    return lang_id(_t(spark, sf, "documents"))


def _q_text_fingerprint(spark, sf):
    from logicaldecoding_spark.operators.text import fingerprint

    return fingerprint(_t(spark, sf, "documents"))


def _q_knn_bruteforce(spark, sf):
    from logicaldecoding_spark.operators.similarity import knn_bruteforce

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return knn_bruteforce(emb, queries, k=10)


def _q_knn_lsh(spark, sf):
    """LSH ANN top-k, oracled against the exact knn_bruteforce SQL: at this
    corpus, 64 tables x 4 coarse planes give candidate sets that cover every
    true top-10 neighbor (exact equality gated in
    tests/test_recall_gates.py), so the re-ranked output is value-identical
    to brute force while the plan stays bucket-partitioned (no all-pairs).

    Few coarse planes + many tables: this corpus's neighbors sit at
    cos ~0.4-0.6, where fine buckets would destroy recall; at a real
    near-dup corpus (cos >= 0.9) raise n_planes and cut n_tables."""
    from logicaldecoding_spark.operators.similarity import knn_lsh

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return knn_lsh(emb, queries, dim=64, k=10, n_planes=4, n_tables=64)


def _q_knn_ivf(spark, sf):
    """IVF ANN top-k, oracled against the exact knn_bruteforce SQL.

    n_probes=14 of 16 clusters is what exactness costs on THIS corpus: the
    embeddings are near-isotropic (neighbors at cos 0.4-0.6, no cluster
    structure), so a query's true neighbors scatter across most cells.  On a
    real clustered corpus the probe ratio drops to n_probes << n_clusters;
    the parameter trade-off is the operator's contract, the exact-equality
    gate (tests/test_recall_gates.py) pins this configuration."""
    from logicaldecoding_spark.operators.similarity import knn_ivf

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return knn_ivf(emb, queries, dim=64, k=10, n_clusters=16, n_probes=14)


def _q_mm_binary_meta(spark, sf):
    from logicaldecoding_spark.operators.multimodal import attach_binary, binary_meta

    return binary_meta(attach_binary(_t(spark, sf, "documents")))


def _q_mm_decode_stub(spark, sf):
    from logicaldecoding_spark.operators.multimodal import attach_binary, decode_media

    return decode_media(attach_binary(_t(spark, sf, "documents")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s4_event_filter": _q_s4_event_filter,
        "s8_point_lookup": _q_s8_point_lookup,
        "s9_semi_join": _q_s9_semi_join,
        "a1_txn_assembly": _q_a1_txn_assembly,
        "a2_last_writer_wins": _q_a2_last_writer_wins,
        "a2_salted_lww": _q_a2_salted_lww,
        "s5_props_parse": _q_s5_props_parse,
        "a3_txn_count": _q_a3_txn_count,
        "set1_except": _q_set1_except,
        "o1_global_order": _q_o1_global_order,
        "t9_window_tumbling": _q_t9_window_tumbling,
        "w1_topk_per_group": _q_w1_topk_per_group,
        "w2_lag_delta": _q_w2_lag_delta,
        "a4_rollup": _q_a4_rollup,
        "t10_sessionize": _q_t10_sessionize,
        "f7_string_funcs": _q_f7_string_funcs,
        "q5_local_supply": _q_q5_local_supply,
        "j1_keyed_merge": _q_j1_keyed_merge,
        "tt_time_travel": _q_tt_time_travel,
        "cdc_changelog": _q_cdc_changelog,
        "lake_pruned_scan": _q_lake_pruned_scan,
        "lake_meta_agg": _q_lake_meta_agg,
        "mv_incremental_agg": _q_mv_incremental_agg,
        "lake_branch_publish": _q_lake_branch_publish,
        "lake_zorder_scan": _q_lake_zorder_scan,
        "q1_pricing_summary": _q_q1_pricing_summary,
        "q3_top_orders": _q_q3_top_orders,
        "s7_full_scan": _q_s7_full_scan,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_prefix_join": _q_dedup_prefix_join,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding": _q_dedup_embedding,
        "text_token_stats": _q_text_token_stats,
        "text_quality": _q_text_quality,
        "text_lang_id": _q_text_lang_id,
        "text_fingerprint": _q_text_fingerprint,
        "knn_bruteforce": _q_knn_bruteforce,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "mm_binary_meta": _q_mm_binary_meta,
        "mm_decode_stub": _q_mm_decode_stub,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (ANSI SQL on the pre-registered views)
# ---------------------------------------------------------------------------
_SHINGLES3 = (
    "list_distinct([substring(text, i, 3) for i in range(1, greatest(len(text)-2,1)+1)])"
)
_SHINGLES5 = (
    "list_distinct([substring(text, i, 5) for i in range(1, greatest(len(text)-4,1)+1)])"
)
# exact top-k cosine — the SQL twin for BOTH the brute-force scan and the
# ANN paths (LSH / IVF), whose params are tuned so candidates cover the
# exact answer at driver SF (see the query docstrings + recall gates)
_KNN_EXACT = """
    SELECT query_id, neighbor_id, cos, rn AS rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]), 4) AS cos,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(
                       q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) DESC,
                       c.vec_id ASC) AS rn
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 5
    ) WHERE rn <= 10
"""
_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"
_STOP = {
    "en": "['the','a','of','and','to','in','is','that','it','for']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','auf','zu']",
    "es": "['el','la','de','que','y','en','un','es','se','no']",
}
_HITS = {
    lang: f"len(list_filter({_TOKENS}, t -> list_contains({lst}, t)))"
    for lang, lst in _STOP.items()
}


def oracle_sql() -> dict[str, str]:
    return {
        "s4_event_filter": """
            SELECT event_id, user_id, round(value, 4) AS value
            FROM events WHERE event_type = 'error'
        """,
        "s8_point_lookup": """
            SELECT event_id, user_id, event_type FROM events WHERE event_id = 500
        """,
        "s9_semi_join": """
            SELECT event_type, count(*) AS n FROM events
            WHERE user_id IN (SELECT DISTINCT user_id FROM events
                              WHERE event_type = 'signup')
            GROUP BY event_type
        """,
        "a1_txn_assembly": """
            SELECT user_id, count(*) AS n_events, min(ts) AS first_ts,
                   max(ts) AS last_ts, round(sum(value), 4) AS sum_value
            FROM events GROUP BY user_id
        """,
        "a2_last_writer_wins": """
            SELECT user_id, event_type AS last_event_type,
                   round(value, 4) AS last_value
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
                  FROM events) WHERE rn = 1
        """,
        "a2_salted_lww": """
            SELECT user_id, event_type AS last_event_type,
                   round(value, 4) AS last_value
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
                  FROM events) WHERE rn = 1
        """,
        "s5_props_parse": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   count(json_extract_string(props, '$.k')) AS n_k
            FROM events GROUP BY event_type
        """,
        "a3_txn_count": """
            SELECT count(DISTINCT user_id) AS n_users, count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types
            FROM events
        """,
        "set1_except": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase' AND value > 95
            EXCEPT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'click' AND value > 95
        """,
        "o1_global_order": """
            SELECT event_id, user_id, event_type FROM events
            ORDER BY ts DESC, event_id ASC LIMIT 100
        """,
        "t9_window_tumbling": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "w1_topk_per_group": """
            SELECT event_type, rn AS rank, event_id, round(value, 4) AS value
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY event_type ORDER BY value DESC, event_id) rn
                  FROM events) WHERE rn <= 3
        """,
        "w2_lag_delta": """
            SELECT event_id, user_id,
                   round(value - lag(value) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id), 4)
                       AS value_delta
            FROM events
        """,
        "a4_rollup": """
            SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY ROLLUP(event_type)
        """,
        "t10_sessionize": """
            WITH g AS (
                -- whole-second truncation matches Spark's ts->long cast
                -- exactly (fractional epoch() could split a (1800,1801)-gap
                -- session differently; ADVICE r2)
                SELECT user_id, ts, event_id,
                       CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                                - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)
                                > 1800 OR lag(ts) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)
                                IS NULL THEN 1 ELSE 0 END AS new_sess
                FROM events),
            s AS (
                SELECT user_id, ts,
                       CAST(sum(new_sess) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
                FROM g)
            SELECT user_id, sess_id, count(*) AS n_events,
                   min(ts) AS session_start
            FROM s GROUP BY user_id, sess_id
        """,
        "f7_string_funcs": """
            SELECT doc_id, upper(substring(text, 1, 12)) AS head_upper,
                   len(text) AS len,
                   lang || ':' || source AS tag,
                   reverse(substring(text, 1, 8)) AS head_rev
            FROM documents
        """,
        "q5_local_supply": """
            SELECT n_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
                 JOIN nation ON c_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "j1_keyed_merge": """
            SELECT coalesce(c.c_custkey, e.user_id) AS key, c.c_name,
                   e.last_event_type,
                   CASE WHEN c.c_name IS NULL THEN 'insert'
                        WHEN e.last_event_type IS NULL THEN 'keep'
                        ELSE 'update' END AS merge_action
            FROM customer c FULL OUTER JOIN
                 (SELECT user_id, event_type AS last_event_type
                  FROM (SELECT *, row_number() OVER
                          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
                        FROM events) WHERE rn = 1) e
            ON c.c_custkey = e.user_id
        """,
        "tt_time_travel": """
            WITH ordered AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (ORDER BY ts, event_id) AS lsn
                FROM events
            )
            SELECT user_id,
                   arg_max(event_type, lsn) AS last_event_type,
                   round(arg_max(value, lsn), 4) AS last_value
            FROM ordered
            WHERE lsn <= (SELECT count(*) // 2 FROM events)
            GROUP BY user_id
        """,
        "cdc_changelog": """
            WITH ordered AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (ORDER BY ts, event_id) AS lsn
                FROM events
            ),
            cut AS (SELECT count(*) // 2 AS c FROM events),
            s1 AS (
                SELECT DISTINCT user_id FROM ordered
                WHERE lsn <= (SELECT c FROM cut)
            ),
            s2 AS (
                SELECT user_id,
                       arg_max(event_type, lsn) AS last_event_type,
                       round(arg_max(value, lsn), 4) AS last_value,
                       max(lsn) AS maxl
                FROM ordered GROUP BY user_id
            )
            SELECT s2.user_id, s2.last_event_type, s2.last_value,
                   CASE WHEN s1.user_id IS NULL THEN 'insert'
                        ELSE 'update' END AS change_type
            FROM s2 LEFT JOIN s1 ON s2.user_id = s1.user_id
            WHERE s2.maxl > (SELECT c FROM cut)
        """,
        "lake_pruned_scan": """
            WITH ordered AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (ORDER BY ts, event_id) AS lsn
                FROM events
            )
            SELECT user_id,
                   arg_max(event_type, lsn) AS last_event_type,
                   round(arg_max(value, lsn), 4) AS last_value
            FROM ordered
            WHERE user_id >= 3 AND user_id < 8
            GROUP BY user_id
        """,
        "lake_meta_agg": """
            WITH ordered AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (ORDER BY ts, event_id) AS lsn
                FROM events
            ),
            last AS (
                SELECT user_id, arg_max(value, lsn) AS value
                FROM ordered GROUP BY user_id
            )
            SELECT count(*) AS n_rows,
                   min(user_id) AS min_user,
                   max(user_id) AS max_user,
                   round(min(value), 4) AS min_value,
                   round(max(value), 4) AS max_value,
                   count(*) FILTER (WHERE value IS NULL) AS value_nulls,
                   CAST(0 AS BIGINT) AS scanned_files
            FROM last
        """,
        "mv_incremental_agg": """
            WITH ordered AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (ORDER BY ts, event_id) AS lsn
                FROM events
            ),
            final AS (
                SELECT user_id,
                       arg_max(event_type, lsn) AS event_type,
                       arg_max(value, lsn) AS value
                FROM ordered GROUP BY user_id
            )
            SELECT event_type, count(*) AS n_users,
                   round(sum(value), 4) AS sum_value,
                   round(avg(value), 4) AS avg_value,
                   round(min(value), 4) AS min_value,
                   round(max(value), 4) AS max_value
            FROM final GROUP BY event_type
        """,
        "lake_branch_publish": """
            WITH ordered AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (ORDER BY ts, event_id) AS lsn
                FROM events
            )
            SELECT user_id,
                   arg_max(event_type, lsn) AS last_event_type,
                   round(arg_max(value, lsn), 4) AS last_value
            FROM ordered
            GROUP BY user_id
        """,
        "lake_zorder_scan": """
            WITH ordered AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (ORDER BY ts, event_id) AS lsn
                FROM events
            ),
            final AS (
                SELECT user_id,
                       arg_max(event_type, lsn) AS last_event_type,
                       round(arg_max(value, lsn), 4) AS last_value,
                       arg_max(value, lsn) AS raw_value
                FROM ordered GROUP BY user_id
            )
            SELECT user_id, last_event_type, last_value
            FROM final
            WHERE user_id >= 10 AND user_id < 40
              AND raw_value >= 0.0 AND raw_value < 50.0
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "s7_full_scan": """
            SELECT l_returnflag, count(*) AS n,
                   count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY l_returnflag
        """,
        "dedup_exact": """
            SELECT doc_id, sha256(text) AS content_hash,
                   row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id)
                       AS dup_rank,
                   count(*) OVER (PARTITION BY sha256(text)) AS n_copies
            FROM documents
        """,
        "dedup_ngram_jaccard": f"""
            WITH sh AS (SELECT doc_id, {_SHINGLES3} AS s
                        FROM documents WHERE doc_id < 80)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s)) * 1.0
                         / len(list_distinct(a.s || b.s)), 4) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(a.s || b.s)) >= 0.55
        """,
        "dedup_embedding": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.4
        """,
        "text_token_stats": f"""
            SELECT doc_id, len({_TOKENS}) AS n_tokens, len(text) AS n_chars,
                   CAST(list_sum(list_transform({_TOKENS},
                       t -> CAST(ceil(len(t) / 4.0) AS BIGINT))) AS BIGINT)
                       AS n_subwords
            FROM documents
        """,
        "text_quality": f"""
            SELECT doc_id,
                   len({_TOKENS}) AS n_tokens,
                   round((len(text) - (len({_TOKENS}) - 1)) * 1.0
                         / len({_TOKENS}), 4) AS mean_token_len,
                   round(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                         / len(text), 4) AS alpha_ratio,
                   round({_HITS['en']} * 1.0 / len({_TOKENS}), 4) AS stopword_ratio,
                   round(least(len({_TOKENS}) / 100.0, 1.0) * 0.4
                         + least({_HITS['en']} * 1.0 / len({_TOKENS}) * 5.0, 1.0) * 0.3
                         + len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                           / len(text) * 0.3, 4) AS quality
            FROM documents
        """,
        "text_lang_id": f"""
            SELECT doc_id,
                   {_HITS['en']} AS hits_en,
                   {_HITS['de']} AS hits_de,
                   {_HITS['es']} AS hits_es,
                   CASE WHEN greatest({_HITS['en']}, {_HITS['de']}, {_HITS['es']}) <= 0
                            THEN 'und'
                        WHEN {_HITS['en']} = greatest({_HITS['en']}, {_HITS['de']},
                                                      {_HITS['es']}) THEN 'en'
                        WHEN {_HITS['de']} = greatest({_HITS['en']}, {_HITS['de']},
                                                      {_HITS['es']}) THEN 'de'
                        ELSE 'es' END AS lang_pred
            FROM documents
        """,
        "text_fingerprint": f"""
            SELECT doc_id, md5(text) AS fp_full,
                   md5(array_to_string({_TOKENS}[1:8], ' ')) AS fp_prefix
            FROM documents
        """,
        "knn_bruteforce": _KNN_EXACT,
        "knn_lsh": _KNN_EXACT,
        "knn_ivf": _KNN_EXACT,
        "dedup_prefix_join": f"""
            WITH sh AS (SELECT doc_id, {_SHINGLES5} AS s
                        FROM documents WHERE doc_id < 250)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s)) * 1.0
                         / len(list_distinct(a.s || b.s)), 4) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(a.s || b.s)) >= 0.8
        """,
        "dedup_minhash": f"""
            WITH sh AS (SELECT doc_id, {_SHINGLES5} AS s
                        FROM documents WHERE doc_id < 200)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s)) * 1.0
                         / len(list_distinct(a.s || b.s)), 4) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(a.s || b.s)) >= 0.6
        """,
        "mm_binary_meta": """
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS sha256
            FROM documents
        """,
        "mm_decode_stub": """
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS sha256,
                   16 + ('0x' || substr(sha256(text), 1, 2))::INT % 240 AS width,
                   16 + ('0x' || substr(sha256(text), 3, 2))::INT % 240 AS height,
                   'stub' AS format
            FROM documents
        """,
        # dedup_simhash: the ONLY query without a SQL oracle — its output IS
        # xxhash64-derived hamming distances, unreproducible in ANSI SQL by
        # construction; see _q_dedup_simhash's docstring for the pytest gates
        # that stand in for the oracle.
    }
