"""Scaling-efficiency evidence runner (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs on the same input at two parallelism levels — N and 4N cores
(local[2] vs local[8]; local[32] reported as well) — via spark-submit
--py-files, and efficiency = (throughput_4N / throughput_N) / 4.

Writes/updates BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALING_TXNS = int(os.environ.get("SCALING_TXNS", "2000000"))
N_CORES = int(os.environ.get("SCALING_N", "2"))
RUNS = int(os.environ.get("SCALING_RUNS", "2"))
# 'json' = payload wire (round-comparable record); 'sidecar' = the
# archiver's fully-decoded capture (tuple sidecar, r4): same events, the
# engine replays columnar with zero payload decode
WIRE = os.environ.get("SCALING_WIRE", "json")


def gen_log() -> tuple[str, dict]:
    from logicaldecoding_spark.generator import SchemaChangeSpec, generate_log

    cache = os.path.join(REPO, ".bench")
    os.makedirs(cache, exist_ok=True)
    tag = "_sc" if WIRE == "sidecar" else ""
    path = os.path.join(cache, f"wal_scaling{tag}_t{SCALING_TXNS}.parquet")
    meta = path + ".meta.json"
    if os.path.exists(path) and os.path.exists(meta):
        with open(meta) as f:
            return path, json.load(f)
    n = SCALING_TXNS
    stats = generate_log(
        path, n_txns=n, n_repos=max(200, n // 100), paths_per_repo=50,
        content_min_reps=1, content_max_reps=6,
        schema_changes=[
            # schema changes are rare barriers in a real CDC history: early
            # in the log, followed by the long steady-state replay
            SchemaChangeSpec(n // 1000, "add_column", "size", "int"),
            SchemaChangeSpec(2 * n // 1000, "add_column", "stars", "long"),
            SchemaChangeSpec(3 * n // 1000, "widen_type", "size", "long"),
        ],
        chunk_txns=200_000,
        tuple_sidecar=(WIRE == "sidecar"),
    )
    with open(meta, "w") as f:
        json.dump(stats, f)
    return path, stats


def submit(cores: int, log: str, events: int, warm_log: str, run_id: str) -> dict:
    from logicaldecoding_spark.dist import package_zip

    zip_path = package_zip()
    table = os.path.join(REPO, ".bench", f"scaling_table_{cores}_{run_id}")
    cmd = [
        # pin the WHOLE process tree (JVM incl. GC/shuffle threads + Python
        # workers) to exactly `cores` CPUs: local[N] alone under-counts
        # because JVM service threads spill onto extra cores, which fakes
        # small-N throughput and corrupts the efficiency ratio
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "48g"),
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--py-files", zip_path,
        os.path.join(REPO, "bench_jobs", "replay_submit.py"),
        "--log", log, "--table", table, "--fresh",
        "--events", str(events), "--warm-log", warm_log,
        "--shuffle-partitions", str(max(8, min(16, 2 * cores))),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    m = re.search(r"RESULT (\{.*\})", out.stdout)
    if not m:
        with open(f"/tmp/submit_fail_{cores}_{run_id}.out", "w") as f:
            f.write(out.stdout)
        with open(f"/tmp/submit_fail_{cores}_{run_id}.err", "w") as f:
            f.write(out.stderr)
        raise RuntimeError(
            f"no RESULT (rc={out.returncode}); logs at /tmp/submit_fail_{cores}_{run_id}.*"
        )
    return json.loads(m.group(1))


def main() -> None:
    import bench as bench_mod

    log, stats = gen_log()
    warm_log, _ = bench_mod.bench_log_path(0.001)
    events = stats["data_events"]
    results: dict[int, list[dict]] = {}
    for cores in (N_CORES, 4 * N_CORES, 32):
        results[cores] = []
        for r in range(RUNS):
            res = submit(cores, log, events, warm_log, f"r{r}")
            results[cores].append(res)
            print(f"local[{cores}] run{r}: {res['wall_secs']}s "
                  f"{res.get('events_per_sec')} ev/s", flush=True)

    def best(c):
        return max(results[c], key=lambda r: r["events_per_sec"])

    n, n4 = best(N_CORES), best(4 * N_CORES)
    eff = (n4["events_per_sec"] / n["events_per_sec"]) / 4.0
    summary = {
        "events": events,
        "log_rows": stats["rows"],
        "N": N_CORES,
        "throughput_N": n["events_per_sec"],
        "throughput_4N": n4["events_per_sec"],
        "throughput_32": best(32)["events_per_sec"],
        "wall_N": n["wall_secs"],
        "wall_4N": n4["wall_secs"],
        "wall_32": best(32)["wall_secs"],
        "scaling_efficiency": round(eff, 3),
        "all_runs": {str(k): v for k, v in results.items()},
        "timestamp": int(time.time()),
    }
    summary["wire"] = WIRE
    out_name = "scaling.json" if WIRE == "json" else "scaling_sidecar.json"
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
