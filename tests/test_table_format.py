"""Table-format semantics: atomic commits, schema evolution, pruning,
crash-safety of the pointer swap."""

from __future__ import annotations

import json
import os

import pytest

from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA, TableSchema
from logicaldecoding_spark.table.format import LakeTable
from logicaldecoding_spark.operators.merge import merge_into


def _compacted(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string,"
        " op string, lsn long, seq int, txid long",
    )


def test_create_and_load_roundtrip(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=16)
    t2 = LakeTable.load(str(tmp_path / "t"))
    assert t2.version == 0
    assert t2.n_buckets == 16
    assert t2.schema.names() == ["repo", "path", "commit", "lang", "content"]
    with pytest.raises(FileExistsError):
        LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA)


def test_schema_evolution_add_and_widen(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA)
    t.evolve_schema("add_column", "size", "int", applied_upto_lsn=10)
    t.evolve_schema("widen_type", "size", "long", applied_upto_lsn=20)
    s = t.schema
    f = {x.name: x for x in s.fields}
    assert f["size"].type == "long"
    # field id stability across the widen
    t1 = LakeTable.load(str(tmp_path / "t"))
    ids = {x.name: x.id for x in t1.schema.fields}
    old = t1.schema_by_id(1)  # after add, before widen
    assert {x.name: x.id for x in old.fields}["size"] == ids["size"]
    assert t1.applied_upto_lsn == 20


def test_illegal_widen_rejected(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA)
    with pytest.raises(ValueError):
        t.evolve_schema("widen_type", "commit", "long")  # string -> long: no
    with pytest.raises(ValueError):
        t.evolve_schema("add_column", "repo", "long")  # conflicting type
    # same-name same-type re-add is an idempotent no-op (crash-resume)
    v = t.version
    t.evolve_schema("add_column", "repo", "string")
    assert t.version == v


def test_old_snapshot_survives_torn_commit(spark, tmp_path):
    """Crash between data-file write and pointer swap must leave the previous
    snapshot fully readable (the COW atomicity rule, SURVEY §7 step 3)."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(
        spark, t, _compacted(spark, [("r", "p", "c1", "py", "x", "I", 1, 0, 1)]),
        applied_upto_lsn=1, batch_id=0,
    )
    v = t.version
    # simulate the torn commit: orphan data file + newer metadata json exist,
    # but the hint was never swapped
    used_dir = os.path.dirname(
        os.path.join(t.path, t.metadata()["snapshot"]["manifest"][0]["path"])
    )
    with open(os.path.join(used_dir, "orphan.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    fake_meta = dict(t.metadata())
    fake_meta["version"] = v + 1
    with open(os.path.join(t.path, "metadata", f"v{v+1}.metadata.json"), "w") as f:
        json.dump(fake_meta, f)
    # reader still sees the committed snapshot, and reads cleanly
    t2 = LakeTable.load(t.path)
    assert t2.version == v
    rows = t2.read(spark).collect()
    assert len(rows) == 1 and rows[0]["commit"] == "c1"


def test_history_and_time_travel(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    merge_into(spark, t, _compacted(spark, [("r", "p", "c1", "py", "x", "I", 1, 0, 1)]),
               applied_upto_lsn=1, batch_id=0)
    merge_into(spark, t, _compacted(spark, [("r", "p", "c2", "py", "y", "U", 5, 0, 2)]),
               applied_upto_lsn=5, batch_id=1)
    h = t.history()
    assert [e["version"] for e in h] == [0, 1, 2]
    assert h[-1]["applied_upto_lsn"] == 5
    old = t.read_version(spark, 1).collect()
    new = t.read(spark).collect()
    assert old[0]["commit"] == "c1" and new[0]["commit"] == "c2"


def test_bucket_pruned_read_skips_files(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=8)
    rows = [(f"r{i}", "p", "c", "py", "x", "I", i + 1, 0, 1) for i in range(40)]
    merge_into(spark, t, _compacted(spark, rows), applied_upto_lsn=41, batch_id=0)
    all_buckets = {m["bucket"] for m in t.metadata()["snapshot"]["manifest"]}
    one = sorted(all_buckets)[0]
    df = t.read(spark, buckets=[one])
    # every returned row must actually hash to the pruned bucket
    from logicaldecoding_spark.table.format import bucket_expr

    got = df.withColumn("_b", bucket_expr(8)).select("_b").distinct().collect()
    assert {r["_b"] for r in got} == {one}
    # and the scan read strictly fewer rows than the table holds
    assert df.count() < 40


def test_concurrent_commit_raises_cas_conflict(spark, tmp_path):
    """Optimistic concurrency: two handles committing from the same parent
    version — the second must get CommitConflictError (exclusive create of
    v<N+1>.metadata.json is the compare-and-swap), never a silently lost
    snapshot."""
    from logicaldecoding_spark.table.fileio import CommitConflictError

    path = str(tmp_path / "t")
    LakeTable.create(path, REPOS_INITIAL_SCHEMA, n_buckets=4)
    a = LakeTable.load(path)
    merge_into(spark, a, _compacted(spark, [("r", "p", "c1", "py", "x", "I", 1, 0, 1)]),
               applied_upto_lsn=1, batch_id=0)
    # simulate the race window (another committer claims v2 between this
    # handle's metadata read and its pointer swap)
    with open(os.path.join(path, "metadata", "v2.metadata.json"), "w") as f:
        f.write("{}")
    b = LakeTable.load(path)  # sees v1, will try to claim v2
    with pytest.raises(CommitConflictError):
        merge_into(spark, b,
                   _compacted(spark, [("r", "q", "c2", "py", "y", "I", 2, 0, 2)]),
                   applied_upto_lsn=2, batch_id=1)
    # the winning snapshot is intact
    t2 = LakeTable.load(path)
    assert t2.version == 1
    assert [r["commit"] for r in t2.read(spark).collect()] == ["c1"]


class _RecordingFileIO:
    """Instrumented FileIO: records every call, delegates to LocalFileIO."""

    def __init__(self):
        from logicaldecoding_spark.table.fileio import LocalFileIO

        self._inner = LocalFileIO()
        self.calls: list[tuple[str, str]] = []

    def __getattr__(self, name):
        inner = getattr(self._inner, name)

        def wrapper(*args, **kw):
            self.calls.append((name, args[0] if args else ""))
            return inner(*args, **kw)

        return wrapper


def test_fileio_seam_carries_all_table_io(spark, tmp_path):
    """Every fs touch of create/commit/read/load goes through the injected
    FileIO (the object-store swap point, SURVEY §4.4)."""
    io = _RecordingFileIO()
    path = str(tmp_path / "t")
    t = LakeTable.create(path, REPOS_INITIAL_SCHEMA, n_buckets=4, io=io)
    merge_into(spark, t, _compacted(spark, [("r", "p", "c1", "py", "x", "I", 1, 0, 1)]),
               applied_upto_lsn=1, batch_id=0)
    ops = {name for name, _ in io.calls}
    # the commit protocol's primitives all flowed through the seam
    assert {"write_text_exclusive", "write_text_atomic", "read_text"} <= ops
    # and the commit path reads NO data-file contents driver-side: per-file
    # stats come from a distributed footer pass (round-4); the only
    # driver-side data touch is ONE seam listing of the just-written batch
    # directory (bounded by the batch's file count, never table size)
    footer_touches = [
        (name, arg) for name, arg in io.calls
        if name == "parquet_metadata" and "/data" in str(arg)
    ]
    assert not footer_touches, footer_touches
    listings = [
        (name, arg) for name, arg in io.calls
        if name in ("listdir", "list_files") and "/data" in str(arg)
    ]
    assert all("/data/batch-" in str(arg) for _, arg in listings), listings
    assert len(listings) <= 1, listings
    t2 = LakeTable.load(path, io=io)
    assert t2.read(spark).count() == 1


def test_partition_spec_evolution_grows_without_data_move(spark, tmp_path):
    """A table created at n_buckets=4 evolves to 16 purely in metadata; old
    files stay valid (pruned via the bucket mapping), new writes land under
    the new spec, and touched keys migrate lazily."""
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=4)
    rows1 = [(f"r{i}", f"p{i}", "c1", "py", f"x{i}", "I", i + 1, 0, 1)
             for i in range(20)]
    merge_into(spark, t, _compacted(spark, rows1), applied_upto_lsn=20, batch_id=0)
    files_v1 = {m["path"]: m for m in t.metadata()["snapshot"]["manifest"]}
    assert all(m.get("spec_id", 0) == 0 for m in files_v1.values())

    t.evolve_partition_spec(8)
    t.evolve_partition_spec(16)
    assert t.n_buckets == 16 and t.spec_id == 2
    with pytest.raises(ValueError):
        t.evolve_partition_spec(24)  # not a multiple of 16
    # metadata-only: same data files, all still spec 0
    assert {m["path"] for m in t.metadata()["snapshot"]["manifest"]} == set(files_v1)
    # full scan unchanged
    assert {r["path"] for r in t.read(spark).collect()} == {f"p{i}" for i in range(20)}

    # update a few keys + insert new ones under the 16-bucket spec
    rows2 = [("r3", "p3", "c2", "py", "y3", "U", 30, 0, 2),
             ("r7", "p7", None, None, None, "D", 31, 0, 2),
             ("rN", "pN", "c3", "py", "z", "I", 32, 0, 2)]
    merge_into(spark, t, _compacted(spark, rows2), applied_upto_lsn=32, batch_id=1)
    got = {r["path"]: r.asDict() for r in t.read(spark).collect()}
    assert "p7" not in got and got["p3"]["content"] == "y3" and got["pN"]["content"] == "z"
    assert len(got) == 20  # 20 - 1 deleted + 1 inserted
    # new files carry the new spec; untouched old files remain spec 0
    specs_now = {m.get("spec_id", 0) for m in t.metadata()["snapshot"]["manifest"]}
    assert 2 in specs_now
    # bucket-pruned read still finds a key written pre-evolution and
    # untouched since (old-spec file pruned via b_new % n_old)
    from logicaldecoding_spark.table.format import bucket_expr

    bb = (
        spark.createDataFrame([("r5", "p5")], "repo string, path string")
        .select(bucket_expr(16).alias("b")).collect()[0]["b"]
    )
    pruned = t.read(spark, buckets=[bb])
    assert ("r5", "p5") in {(r["repo"], r["path"]) for r in pruned.collect()}


def test_lookup_prunes_to_key_buckets(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPOS_INITIAL_SCHEMA, n_buckets=8)
    rows = [(f"r{i}", f"p{i}", "c1", "py", f"x{i}", "I", i + 1, 0, 1)
            for i in range(40)]
    merge_into(spark, t, _compacted(spark, rows), applied_upto_lsn=40, batch_id=0)
    out = t.lookup(spark, [("r3", "p3"), ("r11", "p11")])
    got = {(r["repo"], r["path"], r["content"]) for r in out.collect()}
    assert got == {("r3", "p3", "x3"), ("r11", "p11", "x11")}
    # the scan reads ONLY the wanted buckets' files (manifest pruning)
    from logicaldecoding_spark.table.format import bucket_expr

    want = {
        r["b"] for r in spark.createDataFrame(
            [("r3", "p3"), ("r11", "p11")], "repo string, path string"
        ).select(bucket_expr(8).alias("b")).collect()
    }
    by_bucket = {m["path"]: m["bucket"] for m in t.metadata()["snapshot"]["manifest"]}
    read_files = t.read(spark, buckets=sorted(want)).inputFiles()
    assert read_files, "pruned scan read nothing"
    for f in read_files:
        rel = f[f.index("data/"):]
        assert by_bucket[rel] in want
    n_all = len(t.read(spark).inputFiles())
    assert len(read_files) < n_all


def test_replay_converges_across_partition_evolution(spark, small_log, small_oracle, tmp_path):
    """Replay part of the log at n_buckets=4, grow to 16 mid-stream, resume:
    final state must still equal the sequential oracle row-for-row."""
    from logicaldecoding_spark.plans.replay import replay

    from .util import assert_converged

    path, _ = small_log
    oracle_state, _ = small_oracle
    table_path = str(tmp_path / "t")
    replay(spark, path, table_path, parse_mode="native", n_buckets=4,
           n_data_batches=4, stop_after_batches=3)
    t = LakeTable.load(table_path)
    t.evolve_partition_spec(16)
    replay(spark, path, table_path, parse_mode="native", n_buckets=4,
           n_data_batches=4, resume=True)
    assert_converged(spark, table_path, oracle_state)
    assert LakeTable.load(table_path).n_buckets == 16


def test_lookup_typed_nonstring_pk(spark, tmp_path):
    """Bucket pruning for lookup must hash keys at the table's pk TYPES:
    xxhash64 of a long differs from xxhash64 of its string rendering, so an
    all-string key frame would prune to the wrong buckets and silently
    return empty for any non-string pk (ADVICE r3)."""
    from logicaldecoding_spark.schema import TableSchema
    from logicaldecoding_spark.table.format import LakeTable

    schema = TableSchema.initial(
        [("id", "long", False), ("val", "string", True)]
    )
    t = LakeTable.create(str(tmp_path / "t"), schema, pk=("id",), n_buckets=8)
    rows = spark.createDataFrame(
        [(i, f"v{i}", "I", i + 1, 0, 1) for i in range(50)],
        "id long, val string, op string, lsn long, seq int, txid long",
    )
    merge_into(spark, t, rows, applied_upto_lsn=50, batch_id=0)

    got = t.lookup(spark, [(7,), (23,)]).collect()
    assert {r["id"]: r["val"] for r in got} == {7: "v7", 23: "v23"}
    assert t.retrieve(spark, (7,))["val"] == "v7"
    assert t.retrieve(spark, (999,)) is None
    # and the lookup still prunes: fewer files scanned than a full read
    assert len(t.lookup(spark, [(7,)]).inputFiles()) < \
        len(t.read(spark).inputFiles())


class _RaceFileIO:
    """FileIO that runs a hook right before the first exclusive metadata
    create — a deterministic commit race (the hook commits from another
    handle, so the hooked committer loses the CAS and must rebase)."""

    def __init__(self, hook):
        from logicaldecoding_spark.table.fileio import LocalFileIO

        self._inner = LocalFileIO()
        self._hook = hook
        self._fired = False

    def write_text_exclusive(self, path, text):
        if not self._fired and path.endswith(".metadata.json"):
            self._fired = True
            self._hook()
        return self._inner.write_text_exclusive(path, text)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_commit_rebase_on_disjoint_concurrent_snapshot(spark, tmp_path):
    """Iceberg-style optimistic retry: losing the CAS to a DISJOINT
    concurrent snapshot (a MoR append into an untouched bucket) rebases and
    commits instead of aborting — the concurrency a live-tail ingest plus
    periodic maintenance needs.  Both writers' effects survive."""
    path = str(tmp_path / "t")
    t0 = LakeTable.create(path, REPOS_INITIAL_SCHEMA, n_buckets=4)
    rows = [(f"r{i}", f"p{i}", "c1", "py", f"x{i}", "I", i + 1, 0, 1)
            for i in range(30)]
    merge_into(spark, t0, _compacted(spark, rows), applied_upto_lsn=30,
               batch_id=0)

    from logicaldecoding_spark.table.format import bucket_expr
    bmap = {r["repo"]: r["_b"] for r in _compacted(spark, rows).select(
        "repo", bucket_expr(4).alias("_b")).collect()}
    buckets = sorted(set(bmap.values()))
    cow_bucket, mor_bucket = buckets[0], buckets[1]
    cow_key = next(k for k, b in bmap.items() if b == cow_bucket)
    mor_key = next(k for k, b in bmap.items() if b == mor_bucket)

    def concurrent_mor_append():
        b = LakeTable.load(path)
        merge_into(spark, b, _compacted(
            spark, [(mor_key, f"p{mor_key[1:]}", "c2", "py", "mor", "U",
                     100, 0, 2)]), applied_upto_lsn=100, batch_id=1,
            mode="mor")

    a = LakeTable(path, io=_RaceFileIO(concurrent_mor_append))
    a.metadata()
    merge_into(spark, a, _compacted(
        spark, [(cow_key, f"p{cow_key[1:]}", "c3", "py", "cow", "U",
                 200, 0, 3)]), applied_upto_lsn=200, batch_id=2)

    t = LakeTable.load(path)
    got = {r["repo"]: r["content"] for r in t.read(spark).collect()}
    assert got[cow_key] == "cow" and got[mor_key] == "mor"
    assert t.applied_upto_lsn == 200
    assert t.version == 3  # v0 create, v1 base, v2 mor, v3 rebased cow


def test_commit_true_conflict_still_raises(spark, tmp_path):
    """A concurrent snapshot that touches the commit's replaced slots (a
    delta appended into a bucket a compaction is folding) must still abort:
    rebasing would silently drop the other writer's file."""
    from logicaldecoding_spark.table.fileio import CommitConflictError

    path = str(tmp_path / "t")
    t0 = LakeTable.create(path, REPOS_INITIAL_SCHEMA, n_buckets=4)
    rows = [(f"r{i}", f"p{i}", "c1", "py", f"x{i}", "I", i + 1, 0, 1)
            for i in range(30)]
    merge_into(spark, t0, _compacted(spark, rows), applied_upto_lsn=30,
               batch_id=0)
    # MoR delta exists; a compaction folding ALL buckets starts
    merge_into(spark, t0, _compacted(
        spark, [("r0", "p0", "c2", "py", "y0", "U", 50, 0, 2)]),
        applied_upto_lsn=50, batch_id=1, mode="mor")

    def concurrent_mor_append():
        b = LakeTable.load(path)
        merge_into(spark, b, _compacted(
            spark, [("r1", "p1", "c3", "py", "y1", "U", 60, 0, 3)]),
            applied_upto_lsn=60, batch_id=2, mode="mor")

    a = LakeTable(path, io=_RaceFileIO(concurrent_mor_append))
    a.metadata()
    with pytest.raises(CommitConflictError):
        a.compact(spark)
    # the loser's abort left the winner's state fully intact
    t = LakeTable.load(path)
    got = {r["repo"]: r["content"] for r in t.read(spark).collect()}
    assert got["r0"] == "y0" and got["r1"] == "y1"


def test_manifest_segmentation_bounds_commit_writes(tmp_path):
    """r4 ask #5: against a 10k-file manifest, a commit touching one bucket
    must write metadata bounded by its touched slots (segment reuse), not
    rewrite all 10k entries; expire + orphan removal must keep referenced
    segments and reap expired ones."""
    import os

    from logicaldecoding_spark.schema import REPOS_INITIAL_SCHEMA
    from logicaldecoding_spark.table.format import LakeTable

    t = LakeTable.create(str(tmp_path / "big"), REPOS_INITIAL_SCHEMA,
                         n_buckets=1000)

    def entry(i, bucket, content="base"):
        return {"path": f"data/batch-x/_bucket={bucket}/f{i}.parquet",
                "bucket": bucket, "spec_id": 0, "schema_id": 0,
                "content": content, "rows": 10, "max_lsn": i + 1}

    # 10 append commits x 1000 files = a 10k-file manifest in 10 segments
    n = 0
    for c in range(10):
        files = [entry(n + i, (n + i) % 1000) for i in range(1000)]
        n += 1000
        t.commit_data(files, set(), applied_upto_lsn=n, batch_id=c)
    man = t.metadata()["snapshot"]["manifest"]
    assert len(man) == 10_000
    refs = t.metadata(refresh=False)["snapshot"]["manifest_list"]
    # bound: ~4 live segments per bucket group (per-group fold policy)
    assert 1 <= len(refs) <= 4 * 64

    def meta_files():
        out = {}
        for root, _, names in os.walk(os.path.join(t.path, "metadata")):
            for f in names:
                p = os.path.join(root, f)
                out[p] = os.path.getsize(p)
        return out

    before = meta_files()
    # the bounded commit: replace ONE bucket
    t.commit_data([entry(99_999, 7)], {7}, applied_upto_lsn=20_000,
                  batch_id=99)
    after = meta_files()
    new_bytes = sum(sz for p, sz in after.items() if p not in before)
    # an inline manifest rewrite would be ~10k entries (> 1 MB); the
    # segmented write is the touched segments' survivors + 1 new file
    assert new_bytes < 300_000, f"commit wrote {new_bytes} metadata bytes"
    man2 = {m["path"] for m in t.metadata()["snapshot"]["manifest"]}
    assert f"data/batch-x/_bucket=7/f99999.parquet" in man2
    # bucket 7's ten old files replaced, everything else survives
    assert len(man2) == 10_000 - 10 + 1

    # a fresh handle (no warm cache) materializes identically
    t2 = LakeTable.load(t.path)
    assert {m["path"] for m in t2.metadata()["snapshot"]["manifest"]} == man2

    # maintenance: expire old snapshots, reap orphan segments, keep live ones
    live_refs = {r["path"] for r in
                 t.metadata(refresh=False)["snapshot"]["manifest_list"]}
    t.expire_snapshots(keep_last=2)
    removed = t.remove_orphan_files()
    seg_dir = os.path.join(t.path, "metadata", "manifests")
    remaining = {os.path.join("metadata", "manifests", f)
                 for f in os.listdir(seg_dir)}
    assert live_refs <= remaining, "a live segment was deleted"
    assert any(r.startswith(os.path.join("metadata", "manifests"))
               for r in removed), "expired segments were not reaped"
    t3 = LakeTable.load(t.path)
    assert {m["path"] for m in t3.metadata()["snapshot"]["manifest"]} == man2
