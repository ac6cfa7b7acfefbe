"""SnapshotTable: versioned manifests give stable time travel, overwrite
semantics, and invisibility of unpublished commits."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from serverless_mapreduce_spark.paths import scratch
from serverless_mapreduce_spark.sources.snapshots import SnapshotTable


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x bigint")


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    assert t.latest_version() is None

    v1 = t.commit(_df(spark, [1, 2, 3]))
    v2 = t.commit(_df(spark, [4, 5]))
    assert (v1, v2) == (1, 2)
    assert t.read(spark).count() == 5
    # v1 is immutable after the append
    assert sorted(r.x for r in t.read(spark, 1).collect()) == [1, 2, 3]

    v3 = t.commit(_df(spark, [9]), mode="overwrite")
    assert v3 == 3
    assert [r.x for r in t.read(spark).collect()] == [9]
    # time travel still sees the pre-overwrite snapshot
    assert t.read(spark, 2).count() == 5
    assert t.versions() == [1, 2, 3]


def test_unpublished_commit_is_invisible(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1]))
    # simulate a crashed writer: data files exist, manifest only half-written
    stray = os.path.join(t.data_dir, "deadbeef")
    os.makedirs(stray)
    with open(os.path.join(t.manifest_dir, ".tmp-deadbeef.json"), "w") as fh:
        fh.write("{not json")
    assert t.versions() == [1]
    assert t.read(spark).count() == 1


def test_manifest_stats_prune(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    t.commit(df.repartitionByRange(10, "k"), stats_cols=("k",))

    kept, total = t.plan_files(where=("k", 150, 250))
    assert total == 10
    # a 10%-wide box on a range-clustered layout touches ~2 of 10 files
    assert 1 <= len(kept) <= 3
    got = sorted(
        r.k for r in t.read(spark, where=("k", 150, 250)).filter(
            "k BETWEEN 150 AND 250").collect()
    )
    assert got == list(range(150, 251))


def test_stats_less_files_are_kept(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    t.commit(df.coalesce(1))                              # no stats
    t.commit(df.coalesce(1), stats_cols=("k",))           # stats
    kept, total = t.plan_files(where=("k", 5000, 6000))
    # the stats-bearing file prunes (out of range); the blind one must stay
    assert total == 2 and len(kept) == 1


def test_incremental_read_plans_only_the_delta(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1, 2, 3]))
    t.commit(_df(spark, [4, 5]))

    delta = t.incremental_files(1, 2)
    # the planned set is exactly v2's additions: no v1 file is ever opened
    assert delta and set(delta) == set(t._files(2)) - set(t._files(1))
    assert sorted(r.x for r in t.read_incremental(spark, 1, 2).collect()) == [4, 5]

    # an overwrite replaces the file list, so the "delta" is the full rewrite
    t.commit(_df(spark, [9]), mode="overwrite")
    assert set(t.incremental_files(2, 3)) == set(t._files(3))

    # no-op range (same version) has no delta
    assert t.incremental_files(2, 2) == []


def test_expire_versions_deletes_only_orphans(spark, tmp_path):
    """Vacuum accounting at the file level: expiring v1 must delete exactly
    the files no kept manifest references, leave every shared file on
    disk, make v1 unreadable, and keep v2/v3 byte-identical readable."""
    import os

    t = SnapshotTable(str(tmp_path / "tbl"))
    df1 = spark.range(10).withColumnRenamed("id", "x")
    t.commit(df1, mode="append")                       # v1: files A
    t.commit(spark.range(10, 15).withColumnRenamed("id", "x"), mode="append")
    # v2 = files A + B — A is SHARED between v1 and v2
    t.commit(spark.range(15, 20).withColumnRenamed("id", "x"), mode="append")
    # v3 = A + B + C
    v1_files = set(t._files(1))
    v3_files = set(t._files(3))
    dropped, deleted = t.expire_versions(keep_latest=2)
    # v1 shares ALL its files with v2/v3 → nothing may be deleted
    assert dropped == [1] and deleted == []
    assert all(os.path.exists(f) for f in v3_files)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t._files(1)
    # now orphan real files: overwrite drops every old file from the live set
    t.commit(spark.range(100, 103).withColumnRenamed("id", "x"), mode="overwrite")
    # v4 = files D only; expiring to keep v4+v3... keep_latest=1 keeps v4
    dropped, deleted = t.expire_versions(keep_latest=1)
    assert dropped == [2, 3]
    assert set(deleted) == v3_files  # A+B+C all orphaned by the overwrite
    assert not any(os.path.exists(f) for f in v3_files)
    assert sorted(r.x for r in t.read(spark).collect()) == [100, 101, 102]
    # deleted files must be gone but the table still owns version history
    assert t.versions() == [4]


def test_expire_versions_keep_latest_validation(tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl2"))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.expire_versions(keep_latest=0)


def test_expire_versions_is_idempotent_after_partial_crash(spark, tmp_path):
    """Simulate a crash between file deletes and manifest deletes: some
    doomed files already gone, expired manifests still present. The re-run
    must finish the vacuum (missing_ok deletes), not abort on
    FileNotFoundError."""
    t = SnapshotTable(str(tmp_path / "tbl3"))
    t.commit(_df(spark, [1, 2, 3]), mode="append")           # v1
    t.commit(_df(spark, [10, 11]), mode="overwrite")          # v2 orphans v1
    doomed = set(t._files(1)) - set(t._files(2))
    assert doomed
    os.remove(sorted(doomed)[0])  # the "crash": one orphan already deleted
    dropped, deleted = t.expire_versions(keep_latest=1)
    assert dropped == [1] and set(deleted) == doomed
    assert t.versions() == [2]
    assert sorted(r.x for r in t.read(spark).collect()) == [10, 11]


def test_expire_versions_removes_dead_commit_dirs_and_sidecars(spark, tmp_path):
    """A fully-orphaned commit directory must disappear entirely — parquet
    files, _SUCCESS/.crc sidecars, and the directory entry itself — or the
    retention vacuum accumulates directory entries forever (r8 advice).
    A commit dir with ANY live file must keep its sidecars untouched."""
    t = SnapshotTable(str(tmp_path / "tbl4"))
    t.commit(_df(spark, [1, 2, 3]), mode="append")            # v1: dir A
    t.commit(_df(spark, [10, 11]), mode="overwrite")           # v2: dir B, orphans A
    dir_a = {os.path.dirname(f) for f in t._files(1)}
    dir_b = {os.path.dirname(f) for f in t._files(2)}
    assert dir_a and dir_a.isdisjoint(dir_b)
    # sidecars exist before the vacuum (write.parquet emits _SUCCESS)
    assert any(
        os.path.exists(os.path.join(d, "_SUCCESS")) for d in dir_a
    )
    t.expire_versions(keep_latest=1)
    assert not any(os.path.exists(d) for d in dir_a)  # dir + sidecars gone
    assert all(os.path.exists(d) for d in dir_b)      # live dir untouched
    assert sorted(r.x for r in t.read(spark).collect()) == [10, 11]


def test_compact_small_files_accounting(spark, tmp_path):
    """Compaction must: shrink the file count, keep reads row-identical,
    leave the pre-compaction version readable, skip already-large files,
    and let the retention vacuum reclaim exactly the small originals."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    t.commit(df.filter("k < 500").repartition(8))     # v1: 8 small files
    t.commit(df.filter("k >= 500").repartition(8))    # v2: +8 small files
    pre_files = t._files(2)
    assert len(pre_files) == 16
    pre_rows = sorted(r.k for r in t.read(spark, 2).collect())

    v3 = t.compact_small_files(
        spark, target_bytes=1 << 30, cluster_by=("k",), stats_cols=("k",)
    )
    assert v3 == 3
    post_files = t._files(3)
    assert len(post_files) < len(pre_files)
    assert set(post_files).isdisjoint(pre_files)  # manifest swap, no reuse
    # bit-identical logical content
    assert sorted(r.k for r in t.read(spark, 3).collect()) == pre_rows
    # pre-compaction version untouched and still readable
    assert t._files(2) == pre_files
    assert sorted(r.k for r in t.read(spark, 2).collect()) == pre_rows
    # compacted layout carries fresh stats → a box probe prunes (range-
    # clustered on k, so at most a couple of files can intersect the box)
    kept, total = t.plan_files(3, where=("k", 0, 10))
    assert kept and len(kept) < max(2, total)
    # vacuum reclaims the small originals once v1/v2 expire
    dropped, deleted = t.expire_versions(keep_latest=1)
    assert dropped == [1, 2] and set(deleted) == set(pre_files)
    assert not any(os.path.exists(f) for f in pre_files)
    assert sorted(r.k for r in t.read(spark).collect()) == pre_rows


def test_compact_skips_large_files_and_noops(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    t.commit(df.coalesce(1))                 # one "large" file (below)
    t.commit(df.repartition(4))              # four small files
    big = t._files(1)[0]
    # threshold set between the sizes: only the 4 repartitioned files are
    # "small" (they're each ~1/4 the rows of the big one)
    thresh = os.path.getsize(big)
    v3 = t.compact_small_files(spark, small_bytes=thresh, target_bytes=1 << 30)
    assert v3 == 3
    assert big in t._files(3)                # untouched large file kept
    assert len(t._files(3)) < len(t._files(2))
    # fewer than two small files -> no-op, no new version
    v_same = t.compact_small_files(spark, small_bytes=1)
    assert v_same == 3 and t.latest_version() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.compact_small_files(spark, version=1)   # head-only maintenance


def test_schema_evolution_add_column(spark, tmp_path):
    """Append with an extra column evolves the table schema additively:
    the latest read surfaces the new column (NULL for pre-evolution
    files), old-version reads keep the old shape, incremental reads use
    the target version's schema, and type changes are refused."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1, 2, 3]))                               # v1
    t.commit(
        spark.createDataFrame([(10, "a"), (11, "b")], "x bigint, tag string")
    )                                                             # v2
    v2 = t.read(spark, 2)
    assert v2.columns == ["x", "tag"]
    got = {r.x: r.tag for r in v2.collect()}
    assert got == {1: None, 2: None, 3: None, 10: "a", 11: "b"}
    # old version: old shape, unchanged
    assert t.read(spark, 1).columns == ["x"]
    # incremental read under the evolved target schema
    inc = t.read_incremental(spark, 1, 2)
    assert inc.columns == ["x", "tag"]
    # new-schema-only append keeps working; dropping a column is additive
    # too (the missing column stays, NULL for the new files)
    t.commit(spark.createDataFrame([("c",)], "tag string"))       # v3
    v3 = t.read(spark, 3)
    assert v3.columns == ["x", "tag"]
    assert [r.tag for r in v3.filter("x IS NULL").collect()] == ["c"]
    # type change is corruption, not evolution
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema evolution"):
        t.commit(spark.createDataFrame([(1.5,)], "x double"))
    # compaction preserves the evolved schema and the NULL backfill
    v4 = t.compact_small_files(spark, target_bytes=1 << 30)
    assert v4 == 4
    rows = {r.x: r.tag for r in t.read(spark, 4).collect()}
    assert rows == {1: None, 2: None, 3: None, 10: "a", 11: "b", None: "c"}


def test_delete_where_rewrites_only_intersecting_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    t.commit(df.repartitionByRange(10, "k"), stats_cols=("k",))
    pre = t._files(1)
    v2 = t.delete_where(
        spark, "k BETWEEN 150 AND 250", prune=("k", 150, 250), stats_cols=("k",)
    )
    assert v2 == 2
    post = set(t._files(2))
    survivors_untouched = post & set(pre)
    # range-clustered: at most ~3 of 10 files intersect the box; the rest
    # must be carried over byte-identical (same path, never rewritten)
    assert len(survivors_untouched) >= 7
    got = sorted(r.k for r in t.read(spark, 2).collect())
    assert got == [k for k in range(1000) if not (150 <= k <= 250)]
    # time travel: the purge is invisible in v1 until retention runs
    assert t.read(spark, 1).count() == 1000
    # a second identical delete finds nothing new but still rewrites the
    # candidate files (no silent no-op semantics for deletes)
    assert sorted(r.k for r in t.read(spark, t.delete_where(
        spark, "k BETWEEN 150 AND 250", prune=("k", 150, 250))).collect()) == got


def test_merge_upsert_file_accounting_and_evolution(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame([(k, k * 10) for k in range(100)], "k BIGINT, v BIGINT")
    t.commit(df.repartitionByRange(4, "k"))
    pre = t._files(1)
    assert len(pre) == 4
    # updates touch only keys 0..9 → exactly one of the four range files
    ups = spark.createDataFrame(
        [(5, 555, "u"), (7, 777, "u"), (200, 2000, "i")],
        "k BIGINT, v BIGINT, tag STRING",   # tag = NEW column (evolution)
    )
    v2 = t.merge_upsert(spark, ups, ("k",))
    assert v2 == 2
    post = set(t._files(2))
    # three untouched range files carried over; the hit file replaced
    assert len(post & set(pre)) == 3
    rows = {r.k: (r.v, r.tag) for r in t.read(spark, 2).collect()}
    assert rows[5] == (555, "u") and rows[7] == (777, "u")     # updated
    assert rows[200] == (2000, "i")                            # inserted
    assert rows[6] == (60, None) and rows[99] == (990, None)   # untouched
    assert len(rows) == 101
    # old version unchanged, old shape
    assert t.read(spark, 1).columns == ["k", "v"]
    assert t.read(spark, 1).count() == 100


def test_bloom_point_lookup_plans_subset_without_false_negatives(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    t.commit(df.repartition(16, "k"), bloom_cols=("k",))
    keys = [5, 999, 1500]
    files, total = t.plan_files_keys("k", keys)
    assert total == 16
    # each key lives in exactly one file; blooms may add rare false
    # positives but must never exceed a handful of files
    assert 1 <= len(files) <= 6
    got = sorted(
        r.k
        for r in t._reader(spark, 1).parquet(*files)
        .filter(F.col("k").isin(keys)).collect()
    )
    assert got == sorted(keys)  # no false negatives, ever
    # absent keys may plan 0 files (the fastest possible lookup)
    none_files, _ = t.plan_files_keys("k", [10**12])
    assert len(none_files) <= 1
    # files committed WITHOUT a bloom are conservatively kept
    t.commit(spark.range(5000, 5100).withColumnRenamed("id", "k").coalesce(1))
    files2, total2 = t.plan_files_keys("k", keys)
    assert total2 == 17 and len(files2) == len(files) + 1


def test_bloom_spark_python_hash_parity(spark):
    """The planner re-derives bit positions in Python (zlib.crc32); the
    bitmap was built by Spark's crc32. One mismatched position would
    silently break the no-false-negative guarantee, so pin equality."""
    from serverless_mapreduce_spark.sources.snapshots import (
        BLOOM_K,
        _bloom_positions_sql,
        _bloom_probe_positions,
    )

    vals = [0, 7, 123456789, -5]
    rows = spark.createDataFrame([(v,) for v in vals], "k BIGINT").selectExpr(
        "k", *[f"{_bloom_positions_sql('k', i)} AS p{i}" for i in range(BLOOM_K)]
    ).collect()
    for r in rows:
        assert [r[f"p{i}"] for i in range(BLOOM_K)] == _bloom_probe_positions(r["k"])


def test_delete_where_null_condition_rows_survive(spark, tmp_path):
    """DELETE removes rows where the condition is TRUE; a NULL-key row
    evaluates the condition to NULL and must SURVIVE the rewrite (plain
    NOT(cond) would silently erase it — r10 review)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1,), (250,), (None,)], "k BIGINT").coalesce(1)
    )
    v2 = t.delete_where(spark, "k BETWEEN 100 AND 300")
    got = sorted(
        (r.k if r.k is not None else -1) for r in t.read(spark, v2).collect()
    )
    assert got == [-1, 1]  # 250 deleted; NULL row survives


def test_bloom_type_validation_and_maintenance_preservation(spark, tmp_path):
    """Non-integer/string bloom columns are refused loudly (Spark/Python
    string renderings diverge → false negatives); compaction can carry
    blooms forward via its bloom_cols parameter (r10 review)."""
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "tbl"))
    bad = spark.createDataFrame([(1.5,)], "x DOUBLE")
    with _pytest.raises(ValueError, match="bloom_cols"):
        t.commit(bad, bloom_cols=("x",))

    df = spark.range(0, 400).withColumnRenamed("id", "k")
    t.commit(df.filter("k < 200").repartition(4), bloom_cols=("k",))
    t.commit(df.filter("k >= 200").repartition(4), bloom_cols=("k",))
    v3 = t.compact_small_files(spark, target_bytes=1 << 30, bloom_cols=("k",))
    assert all("bloom" in e for e in t._entries(v3))  # carried through
    files, total = t.plan_files_keys("k", [7], version=v3)
    assert total < 8 and files  # compacted, present key found
    got = t._reader(spark, v3).parquet(*files).filter("k = 7").collect()
    assert [r.k for r in got] == [7]
    # pruning power survives the rewrite: an absent key plans ~no files
    none_files, _ = t.plan_files_keys("k", [10**12], version=v3)
    assert len(none_files) < total


def test_bloom_empty_file_gets_empty_bitmap(spark, tmp_path):
    """A file whose bloom column is entirely NULL records an EMPTY bitmap
    (always skipped) instead of no bitmap (scanned forever — r10 review)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(None, 1)], "k BIGINT, v BIGINT").coalesce(1),
        bloom_cols=("k",),
    )
    ent = t._entries(1)[0]
    assert ent["bloom"]["k"]["bits"] == []
    files, total = t.plan_files_keys("k", [123])
    assert total == 1 and files == []


def test_restore_version_is_metadata_only_and_vacuumable(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1, 2, 3]))                      # v1: clean
    t.commit(_df(spark, [99, 98]))                       # v2: bad batch
    v3 = t.restore_version(1)
    assert v3 == 3
    # metadata-only: v3's file list IS v1's (same paths, nothing rewritten)
    assert t._files(3) == t._files(1)
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 3]
    # bad head stays readable for the post-mortem
    assert sorted(r.x for r in t.read(spark, 2).collect()) == [1, 2, 3, 98, 99]
    bad_files = set(t._files(2)) - set(t._files(1))
    # vacuum keeping only the restored head deletes exactly the bad batch
    dropped, deleted = t.expire_versions(keep_latest=1)
    assert dropped == [1, 2] and set(deleted) == bad_files
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 3]


def test_cleanup_orphans_removes_only_unreferenced_dirs(spark, tmp_path):
    import glob as _glob

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1, 2]))
    # a crashed writer: files written, manifest never published
    stray = os.path.join(t.data_dir, "deadbeef0000")
    _df(spark, [7, 8]).coalesce(1).write.parquet(stray)
    assert _glob.glob(os.path.join(stray, "*.parquet"))
    # default grace period: a just-written dir looks like an IN-FLIGHT
    # commit (files durable, manifest not yet published) and is spared
    assert t.cleanup_orphans() == []
    assert os.path.exists(stray)
    doomed = t.cleanup_orphans(grace_seconds=0.0)
    assert doomed and all("deadbeef0000" in f for f in doomed)
    assert not os.path.exists(stray)
    # live data untouched; a second pass finds nothing
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2]
    assert t.cleanup_orphans(grace_seconds=0.0) == []


def test_concurrent_appends_never_lose_a_commit(spark, tmp_path):
    """The manifest pointer is a CAS: two writers racing the same version
    number must BOTH land (append auto-retries against the new head) —
    with the old rename-over semantics one silently overwrote the other.
    8 threads x 3 appends: versions dense, every row present exactly
    once."""
    import threading

    t = SnapshotTable(str(tmp_path / "tbl"))
    errs = []

    def writer(base):
        try:
            for j in range(3):
                t.commit(_df(spark, [base * 10 + j]))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert t.versions() == list(range(1, 25))
    got = sorted(r.x for r in t.read(spark).collect())
    assert got == sorted(i * 10 + j for i in range(8) for j in range(3))


def test_publish_conflict_raises_when_version_already_claimed(spark, tmp_path):
    """The CAS itself: publishing a version number a concurrent writer
    already claimed raises CommitConflict and leaves the winner's
    manifest byte-identical (the pre-r10 rename-over silently replaced
    it). Read-modify-write paths (merge/delete/compact/restore) surface
    this to the caller; appends auto-retry (previous test)."""
    from serverless_mapreduce_spark.sources.snapshots import CommitConflict
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1]))
    t.commit(_df(spark, [2]))
    before = open(t._manifest_path(2)).read()
    with _pytest.raises(CommitConflict):
        t._publish(t._entries(1), "restore", None, parent=1)  # targets v2
    assert open(t._manifest_path(2)).read() == before  # winner untouched
    assert t.versions() == [1, 2]  # no tmp debris counted as a version


def test_branch_refs_isolate_and_publish_atomically(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    v1 = t.commit(_df(spark, [1, 2]))
    t.set_branch("main", v1)
    v2 = t.commit(_df(spark, [3]))        # staged: branch readers blind
    assert t.resolve_branch("main") == v1
    assert t.read(spark, t.resolve_branch("main")).count() == 2
    t.set_branch("main", v2)              # publish
    assert sorted(r.x for r in t.read(spark, t.resolve_branch("main")).collect()) == [1, 2, 3]
    # a branch cannot point at a version that doesn't exist
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.set_branch("main", 99)
    # refs are not manifests: version listing is unaffected
    assert t.versions() == [1, 2]


def test_tags_are_immutable_pinned_refs(spark, tmp_path):
    from serverless_mapreduce_spark.sources.snapshots import CommitConflict
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "tbl"))
    v1 = t.commit(_df(spark, [1, 2]))
    t.set_tag("release-1", v1)
    t.commit(_df(spark, [3]))
    # the tag stays pinned through later commits
    assert t.resolve_tag("release-1") == v1
    assert t.read(spark, t.resolve_tag("release-1")).count() == 2
    # immutable: re-tagging raises instead of silently repointing
    with _pytest.raises(CommitConflict):
        t.set_tag("release-1", 2)
    assert t.resolve_tag("release-1") == v1
    with _pytest.raises(ValueError):
        t.set_tag("release-2", 99)
    # refs never pollute the version listing
    assert t.versions() == [1, 2]
