"""Structured-Streaming replay: micro-batched file tail converges to the
oracle; restart with the same checkpoint is exactly-once."""

from __future__ import annotations

import shutil

from logicaldecoding_spark.generator import split_log_dir
from logicaldecoding_spark.streaming.stream_replay import stream_replay

from .util import assert_converged


def test_stream_replay_converges(spark, small_log, small_oracle, tmp_path):
    log_path, _ = small_log
    oracle_state, _ = small_oracle
    log_dir = str(tmp_path / "log_dir")
    split_log_dir(log_path, log_dir, n_files=6)
    table_path = str(tmp_path / "stream_table")
    ckpt = str(tmp_path / "ckpt")
    q = stream_replay(
        spark, log_dir, table_path, ckpt, n_buckets=8, parse_mode="native",
        max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert_converged(spark, table_path, oracle_state)


def test_stream_replay_restart_is_exactly_once(spark, small_log, small_oracle, tmp_path):
    log_path, _ = small_log
    oracle_state, _ = small_oracle
    log_dir = str(tmp_path / "log_dir")
    files = split_log_dir(log_path, log_dir, n_files=6)
    assert len(files) >= 4
    table_path = str(tmp_path / "stream_table")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: stream part of the data, then "crash" (stop the query)
    hold = files[-2:]
    held_dir = str(tmp_path / "held")
    import os

    os.makedirs(held_dir)
    for f in hold:
        shutil.move(f, held_dir)
    q = stream_replay(spark, log_dir, table_path, ckpt, n_buckets=8,
                      parse_mode="native", max_files_per_trigger=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # phase 2: the rest of the log arrives; restart from the same checkpoint
    for f in hold:
        shutil.move(os.path.join(held_dir, os.path.basename(f)), log_dir)
    q2 = stream_replay(spark, log_dir, table_path, ckpt, n_buckets=8,
                       parse_mode="native", max_files_per_trigger=2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert_converged(spark, table_path, oracle_state)


def test_stream_replay_converges_with_mid_txn_file_cuts(
    spark, small_log, small_oracle, tmp_path
):
    """Files cut on SIZE, not txn boundary (the naive-archiver shape): events
    of a transaction whose COMMIT lands in a later micro-batch must be
    buffered in the pending sidecar and applied when the COMMIT arrives —
    the reference's cross-read transaction assembly
    (src/replication.rs:125-139), distributed."""
    log_path, _ = small_log
    oracle_state, _ = small_oracle
    log_dir = str(tmp_path / "log_dir_mid")
    split_log_dir(log_path, log_dir, n_files=7, cut_mid_txn=True)
    table_path = str(tmp_path / "stream_table_mid")
    ckpt = str(tmp_path / "ckpt_mid")
    q = stream_replay(
        spark, log_dir, table_path, ckpt, n_buckets=8, parse_mode="native",
        max_files_per_trigger=1,  # every file boundary is a micro-batch edge
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert_converged(spark, table_path, oracle_state)


def test_stream_replay_mid_txn_cuts_restart(spark, small_log, small_oracle, tmp_path):
    """Crash/restart with a transaction open across the stop point: the
    versioned sidecar + table watermark must keep replay exactly-once."""
    import os

    log_path, _ = small_log
    oracle_state, _ = small_oracle
    log_dir = str(tmp_path / "log_dir_mid_rs")
    files = split_log_dir(log_path, log_dir, n_files=8, cut_mid_txn=True)
    assert len(files) >= 5
    table_path = str(tmp_path / "stream_table_mid_rs")
    ckpt = str(tmp_path / "ckpt_mid_rs")

    hold = files[-3:]
    held_dir = str(tmp_path / "held_mid")
    os.makedirs(held_dir)
    for f in hold:
        shutil.move(f, held_dir)
    q = stream_replay(spark, log_dir, table_path, ckpt, n_buckets=8,
                      parse_mode="native", max_files_per_trigger=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    for f in hold:
        shutil.move(os.path.join(held_dir, os.path.basename(f)), log_dir)
    q2 = stream_replay(spark, log_dir, table_path, ckpt, n_buckets=8,
                       parse_mode="native", max_files_per_trigger=1)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert_converged(spark, table_path, oracle_state)
