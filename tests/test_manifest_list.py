"""Manifest-list layering (round 11): appends publish one O(batch) delta
segment plus refs to the parent's unchanged segments, copy-on-write
versions carry untouched segments by REFERENCE, the streaming idempotence
ledger rides every manifest forward (so retention cannot lose it), bloom
parameters live in the manifest entry, and merge refuses duplicate-key
update batches."""

from __future__ import annotations

import json
import os

from serverless_mapreduce_spark.sources import snapshots as snapmod
from serverless_mapreduce_spark.sources.snapshots import SnapshotTable


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x bigint")


def _manifest_size(t, v):
    return os.path.getsize(t._manifest_path(v))


def test_append_manifest_bytes_are_o_batch_not_o_table(spark, tmp_path):
    """The r10 format re-serialized the FULL per-file entry list (stats +
    bloom bitmaps) into every manifest — O(total files) metadata bytes per
    append. Now an append writes one segment holding ONLY its batch's
    entries; the manifest is a ref list. With constant batch size, the
    newest manifest grows by one ~25-byte ref per append, never by a
    per-file entry — two orders of magnitude under the bitmap-bearing
    entries it used to inline."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    seg_sizes = []
    for i in range(12):
        df = spark.range(i * 100, (i + 1) * 100).withColumnRenamed("id", "k")
        v = t.commit(df.coalesce(1), stats_cols=("k",), bloom_cols=("k",))
        body = t._manifest_body(v)
        assert "files" not in body and body["segments"]
        # the delta segment holds exactly this batch's files
        new_seg = body["segments"][-1]
        assert len(t._seg_entries(new_seg)) == 1
        seg_sizes.append(os.path.getsize(t._seg_path(new_seg)))
    # segment bytes are batch-sized: constant across appends
    assert max(seg_sizes) - min(seg_sizes) < 200
    # manifest bytes: v12 vs v2 differ only by ~10 segment refs plus their
    # BOUNDED pruning summaries (r12: per-segment partition/stats
    # envelopes, value sets capped at SUMMARY_PARTITION_CAP), while one
    # inline bloom entry alone is >1 KB — the per-append growth is O(1),
    # the O(table) term is gone
    growth = _manifest_size(t, 12) - _manifest_size(t, 2)
    assert growth < 10 * 250
    assert _manifest_size(t, 12) < seg_sizes[0]
    # reads over the layered manifests are identical to the flat ones
    assert t.read(spark).count() == 1200
    files, total = t.plan_files_keys("k", [555])
    assert total == 12 and 1 <= len(files) <= 3


def test_cow_publish_carries_untouched_segments_by_reference(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1, 2, 3]).coalesce(1))          # v1: segment A
    t.commit(_df(spark, [10, 11]).coalesce(1))           # v2: + segment B
    segs_v2 = t._segment_refs(2)
    assert len(segs_v2) == 2
    # delete keys living only in segment B: A must carry over as the SAME
    # ref (zero metadata rewritten for it), B replaced by a residual
    keys = spark.createDataFrame([(10,)], "x bigint")
    v3 = t.delete_keys(spark, keys, ("x",))
    segs_v3 = t._segment_refs(v3)
    assert segs_v2[0] in segs_v3
    assert segs_v2[1] not in segs_v3
    assert sorted(r.x for r in t.read(spark, v3).collect()) == [1, 2, 3, 11]
    # time travel through shared segments still intact
    assert sorted(r.x for r in t.read(spark, 2).collect()) == [1, 2, 3, 10, 11]


def test_restore_is_still_metadata_only_under_segments(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1, 2]))
    t.commit(_df(spark, [9]))
    v3 = t.restore_version(1)
    assert t._segment_refs(v3) == t._segment_refs(1)
    assert t._files(v3) == t._files(1)


def test_expire_versions_gcs_only_dead_segments(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1]))                            # v1: seg A
    t.commit(_df(spark, [2]))                            # v2: A + B
    t.commit(_df(spark, [3]))                            # v3: A + B + C
    seg_a = t._segment_refs(1)[0]
    dropped, _ = t.expire_versions(keep_latest=2)
    assert dropped == [1]
    # seg A is shared with kept v2/v3 → must survive the manifest GC
    assert os.path.exists(t._seg_path(seg_a))
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 3]
    # overwrite orphans every old segment; expiring to the overwrite alone
    # must GC them
    t.commit(_df(spark, [7]), mode="overwrite")          # v4
    old_refs = set(t._segment_refs(3))
    t.expire_versions(keep_latest=1)
    assert not any(os.path.exists(t._seg_path(r)) for r in old_refs)
    assert [r.x for r in t.read(spark).collect()] == [7]


def test_stream_ledger_survives_retention(spark, tmp_path):
    """The r10 contract was documentation ('retention must keep the replay
    horizon'); now the max committed batch id per stream rides every
    manifest forward, so a checkpoint replay AFTER aggressive retention is
    still skipped instead of double-appending (r10 advice)."""
    ddl = "k BIGINT"
    t = SnapshotTable(str(tmp_path / "tbl"))
    for b in range(4):
        t.commit_stream_batch(spark.createDataFrame([(b,)], ddl), "s", b)
    t.compact_small_files(spark, target_bytes=1 << 30)
    t.expire_versions(keep_latest=1)
    # the manifests that RECORDED batches 0..3 are gone...
    assert t.committed_stream_batches("s") == set()
    # ...but the ledger carried into the compaction manifest still knows
    assert t.stream_batch_committed("s", 2)
    assert (
        t.commit_stream_batch(spark.createDataFrame([(99,)], ddl), "s", 2)
        is None
    )
    assert sorted(r.k for r in t.read(spark).collect()) == [0, 1, 2, 3]
    # genuinely new batches still commit exactly once
    assert t.commit_stream_batch(spark.createDataFrame([(4,)], ddl), "s", 4)
    assert (
        t.commit_stream_batch(spark.createDataFrame([(4,)], ddl), "s", 4)
        is None
    )
    # maintenance commits keep carrying it (compact again, replay again)
    t.compact_small_files(spark, target_bytes=1 << 30)
    assert t.stream_batch_committed("s", 4)
    # a different stream is independent
    assert not t.stream_batch_committed("other", 0)


def test_merge_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    import pytest

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, 10)], "k BIGINT, v BIGINT"))
    dup = spark.createDataFrame([(1, 100), (1, 200)], "k BIGINT, v BIGINT")
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_upsert(spark, dup, ("k",))
    # table unchanged by the refused merge
    assert [(r.k, r.v) for r in t.read(spark).collect()] == [(1, 10)]


def test_bloom_params_from_manifest_beat_constant_drift(spark, tmp_path, monkeypatch):
    """A future change to BLOOM_M/BLOOM_K must not probe previously
    committed bitmaps with new bit positions — that breaks the
    no-false-negative guarantee (wrong results). The planner reads m/k
    from the manifest entry, so a constant change only affects NEW
    commits (r10 advice)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    t.commit(df.repartition(8, "k"), bloom_cols=("k",))
    ent = t._entries(1)[0]["bloom"]["k"]
    assert (ent["m"], ent["k"]) == (snapmod.BLOOM_M, snapmod.BLOOM_K)
    monkeypatch.setattr(snapmod, "BLOOM_M", 997)
    monkeypatch.setattr(snapmod, "BLOOM_K", 5)
    for key in (5, 123, 499):
        files, total = t.plan_files_keys("k", [key])
        assert total == 8 and files  # present key always planned
        got = t._reader(spark, 1).parquet(*files).filter(f"k = {key}").collect()
        assert [r.k for r in got] == [key]


def test_legacy_inline_manifest_still_reads_and_appends(spark, tmp_path):
    """Tables written under the pre-r11 inline-files format must stay
    readable, and the first append migrates them to segments."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1, 2]).coalesce(1))
    # rewrite v1 as a LEGACY manifest (inline files, no segments)
    body = t._manifest_body(1)
    legacy = {
        "version": 1,
        "mode": "append",
        "files": t._entries(1),
        "schema": body["schema"],
    }
    with open(t._manifest_path(1), "w") as fh:
        json.dump(legacy, fh)
    t._seg_cache = {}
    assert sorted(r.x for r in t.read(spark, 1).collect()) == [1, 2]
    v2 = t.commit(_df(spark, [3]))
    assert t._segment_refs(v2) is not None
    assert sorted(r.x for r in t.read(spark, v2).collect()) == [1, 2, 3]


def test_rewrite_manifests_folds_refs_and_preserves_mor(spark, tmp_path):
    """Manifest compaction: after many appends the ref list folds to one
    segment, reads stay identical over the SAME data files
    (metadata-only), merge-on-read deletes keep applying (per-entry seq
    stamps), and appends continue from the folded list."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(8):
        t.commit(_df(spark, [i]).coalesce(1))
    t.delete_keys_mor(
        spark, spark.createDataFrame([(3,)], "x bigint"), ("x",)
    )
    t.commit(_df(spark, [3]).coalesce(1))  # re-insert AFTER the delete
    head = t.latest_version()
    assert len(t._segment_refs(head)) == 10
    pre_files = t._files(head)
    pre_rows = sorted(r.x for r in t.read(spark, head).collect())
    assert pre_rows == [0, 1, 2, 3, 4, 5, 6, 7]  # old 3 deleted, new kept

    v = t.rewrite_manifests()
    assert len(t._segment_refs(v)) == 1
    assert t._files(v) == pre_files  # metadata-only: same data paths
    assert sorted(r.x for r in t.read(spark, v).collect()) == pre_rows
    # MOR visibility preserved through the fold: the delete still hides
    # the ORIGINAL row 3 but not the re-insert
    dels = t._delete_entries(v)
    assert len(dels) == 1
    # subsequent appends extend the folded list
    v2 = t.commit(_df(spark, [99]))
    assert len(t._segment_refs(v2)) == 2
    assert sorted(r.x for r in t.read(spark, v2).collect()) == pre_rows + [99]
    # manifest bytes reset: the folded head is smaller than the
    # 10-ref pre-fold manifest plus segments it replaced
    import os
    assert os.path.getsize(t._manifest_path(v)) < os.path.getsize(
        t._manifest_path(head)
    ) + 200
    # retention GCs the pre-fold segments once their versions expire
    old_refs = set(t._segment_refs(head))
    t.expire_versions(keep_latest=2)
    assert not any(os.path.exists(t._seg_path(r)) for r in old_refs)
    assert sorted(r.x for r in t.read(spark).collect()) == pre_rows + [99]
