"""Shared fixtures: one local SparkSession for the whole test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logicaldecoding_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="logicaldecoding_spark-tests",
        cores=int(os.environ.get("TEST_SPARK_CORES", "8")),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_log(tmp_path_factory):
    """Seeded small WAL log with the canonical evolution scenario."""
    from logicaldecoding_spark.generator import default_evolution, generate_log

    path = str(tmp_path_factory.mktemp("wal") / "wal_small.parquet")
    stats = generate_log(
        path,
        n_txns=300,
        n_repos=25,
        paths_per_repo=12,
        schema_changes=default_evolution(300),
    )
    return path, stats


@pytest.fixture(scope="session")
def small_oracle(small_log):
    from logicaldecoding_spark.oracle import replay_oracle

    path, _ = small_log
    return replay_oracle(path)
