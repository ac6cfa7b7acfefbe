"""Atomic multi-table stream commits (round 11): the MultiTableCatalog
makes batch N visible in BOTH tables or in NEITHER — crash injection
between the two staged commits, replay convergence without duplicates,
and catalog-level exactly-once."""

from __future__ import annotations

from serverless_mapreduce_spark.sources.snapshots import (
    MultiTableCatalog,
    SnapshotTable,
)

DDL = "k BIGINT, v BIGINT"


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _apply_batch(spark, cat, a, b, sid, batch_id, rows, crash_between=False):
    """The two-table ingest shape: stage a, (maybe crash), stage b,
    publish one transaction."""
    if cat.batch_committed(sid, batch_id):
        return False
    va = a.commit_onto(cat.visible("a"), _batch(spark, rows))
    if crash_between:
        raise RuntimeError("injected crash between the staged commits")
    vb = b.commit_onto(cat.visible("b"), _batch(spark, rows))
    cat.publish({"a": va, "b": vb}, sid, batch_id)
    return True


def _visible_rows(spark, cat, t, name):
    v = cat.visible(name)
    if v is None:
        return []
    return sorted(r.k for r in t.read(spark, v).collect())


def test_crash_between_commits_leaves_no_half_visible_batch(spark, tmp_path):
    import pytest

    cat = MultiTableCatalog(str(tmp_path))
    a = SnapshotTable(str(tmp_path / "a"))
    b = SnapshotTable(str(tmp_path / "b"))
    _apply_batch(spark, cat, a, b, "s", 0, [(1, 1)])
    assert _visible_rows(spark, cat, a, "a") == [1]
    assert _visible_rows(spark, cat, b, "b") == [1]

    # batch 1 crashes AFTER table a staged its commit
    with pytest.raises(RuntimeError, match="injected crash"):
        _apply_batch(spark, cat, a, b, "s", 1, [(2, 2)], crash_between=True)
    # table a's HEAD is ahead (the staged orphan) but catalog readers see
    # batch 1 in NEITHER table — no half-visible window
    assert a.latest_version() > cat.visible("a")
    assert _visible_rows(spark, cat, a, "a") == [1]
    assert _visible_rows(spark, cat, b, "b") == [1]
    assert not cat.batch_committed("s", 1)

    # the replay re-stages from the PUBLISHED base: no duplicates from the
    # orphaned first attempt, both tables flip together
    assert _apply_batch(spark, cat, a, b, "s", 1, [(2, 2)])
    assert _visible_rows(spark, cat, a, "a") == [1, 2]
    assert _visible_rows(spark, cat, b, "b") == [1, 2]

    # a redelivery after the publish is skipped at the catalog level
    assert not _apply_batch(spark, cat, a, b, "s", 1, [(9, 9)])
    assert _visible_rows(spark, cat, a, "a") == [1, 2]


def test_crash_before_any_commit_and_ledger_independence(spark, tmp_path):
    cat = MultiTableCatalog(str(tmp_path))
    a = SnapshotTable(str(tmp_path / "a"))
    b = SnapshotTable(str(tmp_path / "b"))
    # batches from different streams keep independent ledgers
    _apply_batch(spark, cat, a, b, "s1", 0, [(1, 1)])
    _apply_batch(spark, cat, a, b, "s2", 0, [(2, 2)])
    assert cat.batch_committed("s1", 0) and cat.batch_committed("s2", 0)
    assert not cat.batch_committed("s1", 1)
    assert _visible_rows(spark, cat, a, "a") == [1, 2]
    # publish for a SUBSET of tables keeps the others' visibility
    v = a.commit_onto(cat.visible("a"), _batch(spark, [(3, 3)]))
    cat.publish({"a": v})
    assert _visible_rows(spark, cat, a, "a") == [1, 2, 3]
    assert _visible_rows(spark, cat, b, "b") == [1, 2]


def test_commit_onto_branches_from_base_not_head(spark, tmp_path):
    """The replay-safety core: committing onto a base IGNORES any staged
    orphan versions above it, so a re-staged batch never stacks onto its
    own crashed first attempt."""
    t = SnapshotTable(str(tmp_path / "t"))
    v1 = t.commit(_batch(spark, [(1, 1)]))
    orphan = t.commit_onto(v1, _batch(spark, [(2, 2)]))   # staged, never published
    again = t.commit_onto(v1, _batch(spark, [(2, 2)]))    # the replay
    assert again > orphan
    assert sorted(r.k for r in t.read(spark, again).collect()) == [1, 2]
    # the orphan's data files are referenced by no later version: a vacuum
    # keeping the replayed head reclaims them
    orphan_only = set(t._files(orphan)) - set(t._files(again))
    assert orphan_only
    t.expire_versions(keep_latest=1)
    import os

    assert not any(os.path.exists(f) for f in orphan_only)
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]


def test_expire_versions_pin_protects_catalog_visible_version(spark, tmp_path):
    """r11 review: staged orphan heads count toward keep_latest, so
    retention without the pin can delete the catalog-visible version's
    manifest and break every catalog reader."""
    cat = MultiTableCatalog(str(tmp_path))
    a = SnapshotTable(str(tmp_path / "a"))
    v1 = a.commit(_batch(spark, [(1, 1)]))
    cat.publish({"a": v1})
    # two crashed staged attempts above the published version
    a.commit_onto(v1, _batch(spark, [(2, 2)]))
    a.commit_onto(v1, _batch(spark, [(2, 2)]))
    assert cat.visible("a") == v1 and a.latest_version() == 3
    # without the pin, keep_latest=2 would expire v1 (the visible one!)
    a.expire_versions(keep_latest=2, pin=(cat.visible("a"),))
    assert sorted(r.k for r in a.read(spark, cat.visible("a")).collect()) == [1]


# --- catalog-guarded materialized-view refresh (r12, VERDICT r11 item 6) ----


def _refresh_view(spark, cat, base_t, view_t, crash_before_publish=False):
    """The incremental_agg_maintenance refresh shape: merge the stored
    view with the delta since the catalog-visible cursor, stage the new
    view, (maybe crash), publish cursor+view in one txn."""
    from pyspark.sql import functions as F

    seen, wvis = cat.visible("base"), cat.visible("view")
    head = base_t.latest_version()
    if head == seen:
        return False  # nothing new
    delta = (
        base_t.read_incremental(spark, seen, head)
        .groupBy("k")
        .agg(F.sum("v").cast("bigint").alias("s"))
    )
    merged = (
        view_t.read(spark, wvis)
        .unionAll(delta)
        .groupBy("k")
        .agg(F.sum("s").cast("bigint").alias("s"))
    )
    w = view_t.commit(merged, mode="overwrite")
    if crash_before_publish:
        raise RuntimeError("injected crash before the catalog publish")
    cat.publish({"base": head, "view": w})
    return True


def test_view_refresh_crash_leaves_consistent_pair_and_replays_once(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    base_t = SnapshotTable(str(tmp_path / "base"))
    view_t = SnapshotTable(str(tmp_path / "view"))
    cat = MultiTableCatalog(str(tmp_path / "cat"))
    v1 = base_t.commit(_batch(spark, [(1, 10), (2, 20)]))
    w1 = view_t.commit(
        base_t.read(spark, v1).groupBy("k").agg(
            F.sum("v").cast("bigint").alias("s")
        ),
        mode="overwrite",
    )
    cat.publish({"base": v1, "view": w1})
    base_t.commit(_batch(spark, [(1, 5), (3, 7)]))

    # crash AFTER staging the refreshed view, BEFORE the catalog publish
    try:
        _refresh_view(spark, cat, base_t, view_t, crash_before_publish=True)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    # catalog readers still see the OLD consistent pair: the view matches
    # a full recompute at the visible cursor, not the staged head
    assert cat.visible("base") == v1 and cat.visible("view") == w1
    got = {
        (r.k, r.s)
        for r in view_t.read(spark, cat.visible("view")).collect()
    }
    assert got == {(1, 10), (2, 20)}

    # replay re-derives from the catalog-visible state and converges:
    # exactly the full-recompute answer, no doubled delta
    assert _refresh_view(spark, cat, base_t, view_t)
    got2 = {
        (r.k, r.s)
        for r in view_t.read(spark, cat.visible("view")).collect()
    }
    assert got2 == {(1, 15), (2, 20), (3, 7)}
    # idempotent when nothing new landed
    assert not _refresh_view(spark, cat, base_t, view_t)
