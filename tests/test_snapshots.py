"""SnapshotTable: versioned manifests give stable time travel, overwrite
semantics, and invisibility of unpublished commits."""

from __future__ import annotations

import os

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
