"""CDC-out: incremental read_changes (manifest-diff bucket restriction) and
the follow_changes tailing generator — every changelog must equal the
brute-force diff of the two snapshot states, while reading only the touched
buckets' files."""

from __future__ import annotations

from logicaldecoding_spark.operators.merge import merge_into
from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA
from logicaldecoding_spark.table.format import LakeTable


def _compacted(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " op string, lsn long, seq int, txid long",
    )


def _state(spark, t, version):
    return {
        (r["repo"], r["path"]): r.asDict()
        for r in t.read_version(spark, version).collect()
    }


def _brute_diff(s_old, s_new):
    """(key -> change_type) ground truth from two materialized states."""
    out = {}
    for k, row in s_new.items():
        if k not in s_old:
            out[k] = "insert"
        elif row["_last_lsn"] > s_old[k]["_last_lsn"]:
            out[k] = "update"
    for k in s_old:
        if k not in s_new:
            out[k] = "delete"
    return out


def _got_changes(df):
    return {
        (r["repo"], r["path"]): r["_change_type"] for r in df.collect()
    }


def _build_history(spark, tmp_path, mode="cow"):
    """4 data commits + 1 schema evolution: inserts, updates, deletes."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=8)
    base = [(f"r{i:03d}", "p", "c0", "py", f"x{i}", "I", i + 1, 0, 1)
            for i in range(40)]
    merge_into(spark, t, _compacted(spark, base), applied_upto_lsn=40,
               batch_id=0, mode=mode)
    merge_into(
        spark, t,
        _compacted(spark, [
            ("r001", "p", "c1", "py", "upd1", "U", 100, 0, 2),
            ("newA", "p", "c1", "py", "newA", "I", 101, 0, 2),
        ]),
        applied_upto_lsn=101, batch_id=1, mode=mode,
    )
    t.evolve_schema("add_column", "stars", "long", applied_upto_lsn=102)
    merge_into(
        spark, t,
        spark.createDataFrame(
            [("r002", "p", "c2", "py", "upd2", 9, "U", 110, 0, 3),
             ("r003", "p", "c0", "py", "x3", None, "D", 111, 0, 3)],
            "repo string, path string, commit string, lang string,"
            " content string, stars long, op string, lsn long, seq int,"
            " txid long",
        ),
        applied_upto_lsn=111, batch_id=2, mode=mode,
    )
    merge_into(
        spark, t,
        spark.createDataFrame(
            [("newB", "q", "c3", "py", "nb", 4, "I", 120, 0, 4)],
            "repo string, path string, commit string, lang string,"
            " content string, stars long, op string, lsn long, seq int,"
            " txid long",
        ),
        applied_upto_lsn=120, batch_id=3, mode=mode,
    )
    return t


def test_read_changes_matches_brute_diff_every_pair(spark, tmp_path):
    t = _build_history(spark, tmp_path)
    versions = [e["version"] for e in t.history()]
    states = {v: _state(spark, t, v) for v in versions}
    for v1, v2 in zip(versions, versions[1:]):
        got = _got_changes(t.read_changes(spark, v1, v2))
        assert got == _brute_diff(states[v1], states[v2]), (v1, v2)
    # and across the whole span at once
    got = _got_changes(t.read_changes(spark, versions[0], versions[-1]))
    assert got == _brute_diff(states[versions[0]], states[versions[-1]])


def test_read_changes_matches_brute_diff_mor(spark, tmp_path):
    t = _build_history(spark, tmp_path, mode="mor")
    versions = [e["version"] for e in t.history()]
    states = {v: _state(spark, t, v) for v in versions}
    for v1, v2 in zip(versions, versions[1:]):
        got = _got_changes(t.read_changes(spark, v1, v2))
        assert got == _brute_diff(states[v1], states[v2]), (v1, v2)


def test_read_changes_restricts_to_touched_buckets(spark, tmp_path):
    """After a single-key commit, the changelog plan must open fewer files
    than the two snapshots hold (manifest-diff bucket restriction)."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=8)
    base = [(f"r{i:03d}", "p", "c0", "py", f"x{i}", "I", i + 1, 0, 1)
            for i in range(64)]
    merge_into(spark, t, _compacted(spark, base), applied_upto_lsn=64,
               batch_id=0)
    v1 = t.version
    merge_into(
        spark, t,
        _compacted(spark, [("r001", "p", "c1", "py", "u", "U", 200, 0, 2)]),
        applied_upto_lsn=200, batch_id=1,
    )
    df = t.read_changes(spark, v1)
    files_read = len(set(df.inputFiles()))
    total = len(t.metadata()["snapshot"]["manifest"]) + len(
        t._load_meta_version(v1)["snapshot"]["manifest"]
    )
    assert files_read < total // 2, (files_read, total)
    got = _got_changes(df)
    assert got == {("r001", "p"): "update"}


def test_read_changes_across_partition_spec_evolution(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    base = [(f"r{i:03d}", "p", "c0", "py", f"x{i}", "I", i + 1, 0, 1)
            for i in range(30)]
    merge_into(spark, t, _compacted(spark, base), applied_upto_lsn=30,
               batch_id=0)
    v1 = t.version
    t.evolve_partition_spec(16)
    merge_into(
        spark, t,
        _compacted(spark, [("r005", "p", "c1", "py", "u", "U", 100, 0, 2),
                           ("nw", "p", "c1", "py", "n", "I", 101, 0, 2)]),
        applied_upto_lsn=101, batch_id=1,
    )
    s1, s2 = _state(spark, t, v1), _state(spark, t, t.version)
    got = _got_changes(t.read_changes(spark, v1))
    assert got == _brute_diff(s1, s2)


def test_follow_changes_replays_to_final_state(spark, tmp_path):
    t = _build_history(spark, tmp_path)
    final_v = t.version
    state: dict = {}
    seen_versions = []
    for v, df in t.follow_changes(spark, from_version=0,
                                  stop_at_version=final_v):
        seen_versions.append(v)
        for r in df.collect():
            k = (r["repo"], r["path"])
            if r["_change_type"] == "delete":
                state.pop(k, None)
            else:
                state[k] = r.asDict()
    # every committed version visited exactly once, in order
    assert seen_versions == [e["version"] for e in t.history()][1:]
    want = _state(spark, t, final_v)
    assert set(state) == set(want)
    for k in want:
        assert state[k]["commit"] == want[k]["commit"], k
        assert state[k]["_last_lsn"] == want[k]["_last_lsn"], k


def test_follow_changes_starts_at_current_by_default(spark, tmp_path):
    t = _build_history(spark, tmp_path)
    # no new commits: the tail drains nothing and exits on max_polls
    got = list(t.follow_changes(spark, poll_secs=0.01, max_polls=1))
    assert got == []
    merge_into(
        spark, t,
        spark.createDataFrame(
            [("late", "p", "c9", "py", "z", 1, "I", 999, 0, 9)],
            "repo string, path string, commit string, lang string,"
            " content string, stars long, op string, lsn long, seq int,"
            " txid long",
        ),
        applied_upto_lsn=999, batch_id=9,
    )
    tail = t.follow_changes(spark, from_version=t.version - 1,
                            stop_at_version=t.version)
    (v, df), = list(tail)
    assert v == t.version
    assert _got_changes(df) == {("late", "p"): "insert"}


def test_follow_changes_metadata_only_snapshot_is_empty(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(spark, t,
               _compacted(spark, [("a", "p", "c", "py", "x", "I", 1, 0, 1)]),
               applied_upto_lsn=1, batch_id=0)
    v1 = t.version
    t.evolve_schema("add_column", "stars", "long", applied_upto_lsn=2)
    (v, df), = list(t.follow_changes(spark, from_version=v1,
                                     stop_at_version=t.version))
    assert v == t.version
    assert df.count() == 0
    # the empty changelog already carries the evolved schema
    assert "stars" in df.columns


def test_read_changes_preimages(spark, tmp_path):
    """include_preimages=True is the Delta-CDF row set: every update appears
    as a pre- AND post-image; the preimage equals the from-side row."""
    t = _build_history(spark, tmp_path)
    versions = [e["version"] for e in t.history()]
    v1, v2 = versions[1], versions[-1]  # post-base-load -> head: has updates
    s_old, s_new = _state(spark, t, v1), _state(spark, t, v2)
    rows = t.read_changes(spark, v1, v2, include_preimages=True).collect()
    by_type: dict[str, dict] = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], {})[
            (r["repo"], r["path"])] = r.asDict()
    want = _brute_diff(s_old, s_new)
    upd_keys = {k for k, v in want.items() if v == "update"}
    assert set(by_type.get("update_postimage", {})) == upd_keys
    assert set(by_type.get("update_preimage", {})) == upd_keys
    assert "update" not in by_type  # renamed wholesale, not duplicated
    assert set(by_type.get("insert", {})) == {
        k for k, v in want.items() if v == "insert"}
    assert set(by_type.get("delete", {})) == {
        k for k, v in want.items() if v == "delete"}
    for k in upd_keys:
        pre, post = by_type["update_preimage"][k], by_type["update_postimage"][k]
        assert pre["_last_lsn"] == s_old[k]["_last_lsn"], k
        assert post["_last_lsn"] == s_new[k]["_last_lsn"], k
        assert pre["commit"] == s_old[k]["commit"], k
    # default mode is byte-identical to before: no preimage rows
    plain = {r["_change_type"] for r in
             t.read_changes(spark, v1, v2).collect()}
    assert "update_preimage" not in plain and "update" in plain
