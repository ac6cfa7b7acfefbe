"""Merge-on-read deletes (round 11): delete-key files commit O(keys)
without touching data files, reads apply them as anti-joins, sequence
numbers stop old deletes from erasing later re-inserts, compaction
materializes them away (dropping dangling delete entries), and the
change feed classifies MOR-deleted keys as deletes."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_mapreduce_spark.sources.snapshots import SnapshotTable


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k BIGINT, v BIGINT")


def _keys(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "k BIGINT")


def test_mor_delete_touches_no_data_file(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(k, k * 10) for k in range(20)]).repartition(4))
    pre = set(t._files(1))
    v2 = t.delete_keys_mor(spark, _keys(spark, [3, 7, 11]), ("k",))
    # every data file carried over path-identical; the only new path is
    # the delete-key file itself
    post_data = {e["path"] for e in t._data_entries(v2)}
    assert post_data == pre
    dels = t._delete_entries(v2)
    assert len(dels) == 1 and dels[0]["keys"] == ["k"]
    # read applies the delete; time travel shows the pre-delete rows
    assert sorted(r.k for r in t.read(spark, v2).collect()) == [
        k for k in range(20) if k not in (3, 7, 11)
    ]
    assert t.read(spark, 1).count() == 20


def test_sequence_numbers_let_later_appends_reinsert(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 10), (2, 20)]))
    t.delete_keys_mor(spark, _keys(spark, [1]), ("k",))
    assert [r.k for r in t.read(spark).collect()] == [2]
    # re-insert key 1 AFTER the delete: the delete's seq is lower, so the
    # new row must survive (the Iceberg sequence-number rule)
    t.commit(_kv(spark, [(1, 111)]))
    rows = {r.k: r.v for r in t.read(spark).collect()}
    assert rows == {1: 111, 2: 20}
    # merge-upsert re-inserting a deleted key is likewise visible
    t.delete_keys_mor(spark, _keys(spark, [2]), ("k",))
    assert {r.k for r in t.read(spark).collect()} == {1}
    t.merge_upsert(spark, _kv(spark, [(2, 222)]), ("k",))
    rows = {r.k: r.v for r in t.read(spark).collect()}
    assert rows == {1: 111, 2: 222}


def test_cow_ops_do_not_resurrect_mor_deleted_rows(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(k, k) for k in range(10)]).coalesce(1))
    t.delete_keys_mor(spark, _keys(spark, [4, 5]), ("k",))
    # a copy-on-write DELETE rewrites the file: the rewrite must apply the
    # MOR delete first, or 4/5 would come back with a fresh seq
    v3 = t.delete_where(spark, "k >= 8")
    assert sorted(r.k for r in t.read(spark, v3).collect()) == [0, 1, 2, 3, 6, 7]
    # same for merge_upsert's rewrite
    v4 = t.merge_upsert(spark, _kv(spark, [(0, 100)]), ("k",))
    rows = {r.k: r.v for r in t.read(spark, v4).collect()}
    assert rows == {0: 100, 1: 1, 2: 2, 3: 3, 6: 6, 7: 7}


def test_compaction_materializes_and_drops_dangling_deletes(spark, tmp_path):
    import os

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(k, k) for k in range(100)]).repartition(4))
    t.delete_keys_mor(spark, _keys(spark, [10, 20, 30]), ("k",))
    expected = [k for k in range(100) if k not in (10, 20, 30)]
    v3 = t.compact_small_files(spark, target_bytes=1 << 30)
    assert t._delete_entries(v3) == []  # dangling after full rewrite
    assert sorted(r.k for r in t.read(spark, v3).collect()) == expected
    # the pre-compaction MOR version still reads identically (time travel)
    assert sorted(r.k for r in t.read(spark, 2).collect()) == expected
    # a delete that still covers an untouched file SURVIVES compaction:
    # make one data file "large" by thresholding on size
    t2 = SnapshotTable(str(tmp_path / "tbl2"))
    t2.commit(_kv(spark, [(k, k) for k in range(50)]).coalesce(1))   # big
    t2.commit(_kv(spark, [(100, 1), (101, 1)]).repartition(2))       # small
    big = t2._files(1)[0]
    t2.delete_keys_mor(spark, _keys(spark, [5, 100]), ("k",))
    v4 = t2.compact_small_files(
        spark, small_bytes=os.path.getsize(big), target_bytes=1 << 30
    )
    assert len(t2._delete_entries(v4)) == 1  # still covers the big file
    got = sorted(r.k for r in t2.read(spark, v4).collect())
    assert got == [k for k in range(50) if k != 5] + [101]


def test_change_feed_classifies_mor_deletes(spark, tmp_path):
    """The change-feed interaction (VERDICT r10 item 2): a full-outer diff
    of the pre-delete and post-delete versions must classify exactly the
    purged keys as deletes — MOR storage is invisible to the feed."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(k, k) for k in range(10)]))
    v2 = t.delete_keys_mor(spark, _keys(spark, [2, 8]), ("k",))
    v1df = t.read(spark, 1).select("k", F.col("v").alias("old_v"))
    v2df = t.read(spark, v2).select("k", F.col("v").alias("new_v"))
    feed = (
        v1df.join(v2df, "k", "full_outer")
        .withColumn(
            "op",
            F.when(F.col("old_v").isNull(), F.lit("insert"))
            .when(F.col("new_v").isNull(), F.lit("delete"))
            .when(~F.col("new_v").eqNullSafe(F.col("old_v")), F.lit("update")),
        )
        .filter(F.col("op").isNotNull())
    )
    got = {(r.k, r.op) for r in feed.collect()}
    assert got == {(2, "delete"), (8, "delete")}


def test_incremental_read_never_surfaces_delete_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 1), (2, 2)]))
    v2 = t.delete_keys_mor(spark, _keys(spark, [1]), ("k",))
    # the only "file added" is the delete file — no delta ROWS exist, and
    # (r12) the empty delta is a schema-true empty frame, not an error
    inc0 = t.read_incremental(spark, 1, v2)
    assert inc0.count() == 0
    assert [f.name for f in inc0.schema.fields] == ["k", "v"]
    v3 = t.commit(_kv(spark, [(9, 9)]))
    inc = t.read_incremental(spark, 1, v3)
    assert [(r.k, r.v) for r in inc.collect()] == [(9, 9)]


def test_mor_plan_files_exclude_delete_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    t.commit(df.repartitionByRange(4, "k"), stats_cols=("k",))
    v2 = t.delete_keys_mor(spark, _keys(spark, [50]), ("k",))
    # r12: a raw file plan over a version carrying MOR deletes RAISES by
    # default — a direct scan would silently resurrect deleted rows
    import pytest

    with pytest.raises(ValueError, match="merge-on-read"):
        t.plan_files(v2, where=("k", 0, 10))
    files, total = t.plan_files(v2, where=("k", 0, 10), ignore_deletes=True)
    assert total == 4  # the delete file is metadata, never planned
    del_paths = {e["path"] for e in t._delete_entries(v2)}
    assert not del_paths & set(files)
    # ...but retention liveness still pins it (in _files)
    assert del_paths <= set(t._files(v2))


def test_restore_after_cow_keeps_mor_deletes_applied(spark, tmp_path):
    """r11 review: a COW rewrite folds the original data segment into a
    residual; restoring the MOR version afterwards must carry the
    RESTORED version's sequence numbers, or the delete stops applying
    and restore resurrects the purged rows."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(k, k) for k in range(10)]).coalesce(1))     # v1
    v2 = t.delete_keys_mor(spark, _keys(spark, [4, 5]), ("k",))       # v2
    expected = [k for k in range(10) if k not in (4, 5)]
    assert sorted(r.k for r in t.read(spark, v2).collect()) == expected
    # v3: a COW delete rewrites the data file (residual fold, new seq)
    v3 = t.delete_where(spark, "k >= 9")
    assert sorted(r.k for r in t.read(spark, v3).collect()) == [
        k for k in expected if k < 9
    ]
    # restore to the MOR version: the deletes must still apply
    v4 = t.restore_version(v2)
    assert sorted(r.k for r in t.read(spark, v4).collect()) == expected


def test_incremental_files_never_lists_delete_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 1)]))
    v2 = t.delete_keys_mor(spark, _keys(spark, [1]), ("k",))
    assert t.incremental_files(1, v2) == []
    del_paths = {e["path"] for e in t._delete_entries(v2)}
    v3 = t.commit(_kv(spark, [(2, 2)]))
    inc = set(t.incremental_files(1, v3))
    assert inc and not (inc & del_paths)
