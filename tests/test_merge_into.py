"""Pins for SnapshotTable.merge_into — Delta MERGE's conditional
matched clauses: matched-and-condition update/delete, the
matched-but-unacted keep contract, unmatched inserts, NULL-condition
three-valued logic, and the CDC change files each shape records."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_mapreduce_spark.sources.snapshots import SnapshotTable


def _kv(spark, rows):
    return spark.createDataFrame(list(rows), "k bigint, v bigint")


def _state(t, spark):
    return sorted(tuple(r) for r in t.read(spark).select("k", "v").collect())


def _feed(t, spark, lo, hi):
    return sorted(
        (r["_change_type"], r["k"], r["v"])
        for r in t.read_changes(spark, lo, hi).collect()
    )


def test_conditional_update_keeps_unacted_matches(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 10), (2, 20), (3, 30), (4, 40)]))
    v = t.merge_into(
        spark,
        _kv(spark, [(1, 111), (2, 222), (9, 999)]),
        ("k",),
        when_matched="update",
        matched_condition="v >= 20",  # target-row condition
        change_feed=True,
    )
    # k=2 acted (v=20 ≥ 20) → replaced; k=1 matched but v=10 < 20 → KEPT
    # unchanged and its source row NOT inserted; k=9 unmatched → insert
    assert _state(t, spark) == [(1, 10), (2, 222), (3, 30), (4, 40), (9, 999)]
    assert _feed(t, spark, v - 1, v) == [
        ("insert", 9, 999),
        ("update_postimage", 2, 222),
        ("update_preimage", 2, 20),
    ]


def test_conditional_delete_and_no_insert(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 10), (2, 20), (3, 30)]))
    v = t.merge_into(
        spark,
        _kv(spark, [(1, 0), (2, 0), (7, 0)]).select("k"),
        ("k",),
        when_matched="delete",
        matched_condition="v > 15",
        insert_unmatched=False,
        change_feed=True,
    )
    assert _state(t, spark) == [(1, 10), (3, 30)]  # only k=2 died
    assert _feed(t, spark, v - 1, v) == [("delete", 2, 20)]


def test_null_condition_keeps_row(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, None), (2, 20)], "k bigint, v bigint")
    )
    t.merge_into(
        spark,
        _kv(spark, [(1, 111), (2, 222)]),
        ("k",),
        when_matched="update",
        matched_condition="v > 5",  # NULL for k=1 → acts like false
        insert_unmatched=False,
    )
    assert _state(t, spark) == [(1, None), (2, 222)]


def test_unconditional_delete_merge(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 10), (2, 20)]))
    t.merge_into(
        spark,
        _kv(spark, [(1, 0), (5, 50)]),
        ("k",),
        when_matched="delete",
        insert_unmatched=True,
    )
    assert _state(t, spark) == [(2, 20), (5, 50)]


def test_duplicate_source_keys_raise(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 10)]))
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_into(spark, _kv(spark, [(1, 1), (1, 2)]), ("k",))


def test_untouched_files_carry_over(spark, tmp_path):
    """Files holding no matched key are referenced path-identical —
    the merge costs O(affected files + batch), never O(table)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 10)]).coalesce(1))
    t.commit(_kv(spark, [(100, 1000)]).coalesce(1))
    before = set(t._files(2))
    t.merge_into(
        spark,
        _kv(spark, [(100, 1001)]),
        ("k",),
        when_matched="update",
        insert_unmatched=False,
    )
    after = set(t._files(3))
    assert set(t._files(1)) <= after  # v1's file untouched, carried by path
    assert before & after  # shared files referenced, not copied
    assert _state(t, spark) == [(1, 10), (100, 1001)]


# --- WHEN NOT MATCHED BY SOURCE THEN DELETE ---------------------------------


def test_nmbs_delete_full_sync(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 10), (2, 20), (3, 30)]))
    v = t.merge_into(
        spark,
        _kv(spark, [(2, 222), (9, 90)]),
        ("k",),
        when_matched="update",
        insert_unmatched=True,
        not_matched_by_source="delete",
        change_feed=True,
    )
    # table == source exactly
    assert _state(t, spark) == [(2, 222), (9, 90)]
    feed = _feed(t, spark, v - 1, v)
    assert ("delete", 1, 10) in feed and ("delete", 3, 30) in feed
    assert ("insert", 9, 90) in feed
    assert ("update_postimage", 2, 222) in feed


def test_nmbs_delete_condition_and_prune(spark, tmp_path):
    """The conditioned source-absent delete only touches in-box files;
    the out-of-box file carries over path-identical."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 10), (2, 20)]).coalesce(1), stats_cols=("k",))
    t.commit(_kv(spark, [(100, 1000), (101, 1010)]).coalesce(1), stats_cols=("k",))
    before = set(t._files(2))
    t.merge_into(
        spark,
        _kv(spark, [(1, 0)]).select("k"),
        ("k",),
        when_matched="delete",
        insert_unmatched=False,
        not_matched_by_source="delete",
        nmbs_condition="k >= 100 AND k < 101",
        nmbs_prune=("k", 100, 100),
    )
    # k=1 died (matched delete), k=100 died (source-absent, in box);
    # k=2 survived the rewrite, k=101 survived in-box filtering
    assert _state(t, spark) == [(2, 20), (101, 1010)]
    # no file could be fully carried here (both held acted rows) — now
    # pin the carry-over case: an out-of-box file is never rewritten
    t2 = SnapshotTable(str(tmp_path / "tbl2"))
    t2.commit(_kv(spark, [(1, 10)]).coalesce(1), stats_cols=("k",))
    t2.commit(_kv(spark, [(100, 1000)]).coalesce(1), stats_cols=("k",))
    t2.merge_into(
        spark,
        _kv(spark, [(7, 70)]),
        ("k",),
        insert_unmatched=True,
        not_matched_by_source="delete",
        nmbs_condition="k >= 100",
        nmbs_prune=("k", 100, float("inf")),
    )
    assert set(t2._files(1)) <= set(t2._files(3))  # v1 file untouched
    assert _state(t2, spark) == [(1, 10), (7, 70)]
