"""Round-15 pins: boundary retention holes in the per-version ref diff
(r14 advice 1 — ``_delta_entries`` only falls back over tombstoned
staged orphans; any other missing ancestor raises unless the caller
opts in), partition-value rendering parity between the DataSource
writer and the library's hive layout (advice 2), vectorized partition
splits in the DS writer (advice 3), no orphan segment JSON on replayed
streaming batches (advice 4), and single-version pinning of the batch
DataSource's schema + plan (advice 5)."""

from __future__ import annotations

import json
import os

import pytest

from serverless_mapreduce_spark.sources.snapshot_batch import register
from serverless_mapreduce_spark.sources.snapshot_stream import (
    SnapshotStreamReader,
)
from serverless_mapreduce_spark.sources.snapshots import (
    MultiTableCatalog,
    SnapshotTable,
)


def _kv(spark, pairs):
    return spark.createDataFrame(list(pairs), "k bigint, v bigint")


# --- boundary retention holes (r14 advice 1) --------------------------------


def test_delta_entries_raises_on_boundary_retention_hole(spark, tmp_path):
    """A window whose BOUNDARY parent expired must not silently diff
    against an older ancestor: that diff re-delivers rows the consumer
    already consumed, tagged with the wrong _commit_version. The
    in-window hole checks never covered this (the hole sits just BELOW
    the window)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_kv(spark, [(1, 1)]))
    t.commit(_kv(spark, [(2, 2)]))
    t.commit(_kv(spark, [(3, 3)]))
    t.commit(_kv(spark, [(4, 4)]))
    dropped, _ = t.expire_versions(keep_latest=2)  # v1, v2 manifests gone
    assert dropped == [1, 2]
    with pytest.raises(ValueError, match="not tombstoned"):
        t._delta_entries(3)
    # read_changes / incremental reads from the expired boundary raise
    # too — every in-window body exists, only the parent is the hole
    with pytest.raises(ValueError, match="not tombstoned"):
        t.read_changes(spark, 2, 4)
    with pytest.raises(ValueError, match="not tombstoned"):
        t.read_incremental(spark, 2, 4).collect()
    # explicit opt-in recovers via the wider ancestor diff (appends only
    # ever add segments, so the hole's rows ride along — at-least-once)
    ents = t._delta_entries(3, allow_holes=True)
    assert len(ents) >= 1


def test_stream_boundary_hole_honors_fail_on_data_loss(spark, tmp_path):
    """A restarted stream whose checkpointed cursor was retention-expired
    plans (cursor, head] — every in-window manifest exists, but the
    cursor version itself is the hole. Loud under the default
    failOnDataLoss=true; lax mode opts into the recovery diff."""
    base = str(tmp_path / "tbl")
    t = SnapshotTable(base)
    t.commit(_kv(spark, [(1, 1)]))
    t.commit(_kv(spark, [(2, 2)]))
    t.commit(_kv(spark, [(3, 3)]))
    os.remove(t._manifest_path(2))  # retention outran the cursor
    reader = SnapshotStreamReader({"path": base}, None)
    with pytest.raises(ValueError, match="not tombstoned"):
        reader.partitions({"version": 2}, {"version": 3})
    lax = SnapshotStreamReader({"path": base, "failOnDataLoss": "false"}, None)
    parts = lax.partitions({"version": 2}, {"version": 3})
    rows = sorted(
        tuple(r)
        for p in parts
        for r in spark.read.parquet(p.value[0]).collect()
    )
    # lax recovery: the hole's still-referenced segment rides along
    assert rows == [(2, 2), (3, 3)]


def test_delta_entries_still_falls_back_over_tombstoned_orphan(spark, tmp_path):
    """The provably-never-published case the fallback was built for —
    staged-orphan GC tombstones the hole — keeps working loudly-silent
    under the default."""
    root = str(tmp_path)
    t = SnapshotTable(f"{root}/tbl")
    cat = MultiTableCatalog(root)
    v1 = t.commit_onto(None, _kv(spark, [(1, 1)]))
    cat.publish({"tbl": v1})
    t.commit_onto(v1, _kv(spark, [(2, 2)]))  # crashed stage (v2)
    v3 = t.commit_onto(v1, _kv(spark, [(2, 2)]), token="s:1")  # re-stage
    cat.publish({"tbl": v3}, "s", 1)
    assert cat.collect_staged_orphans({"tbl": t}, grace_seconds=0.0) == {
        "tbl": [2]
    }
    ents = t._delta_entries(v3)  # parent v2 tombstoned: no raise
    assert len(ents) >= 1


# --- hive partition-value rendering parity (r14 advice 2) -------------------


def test_bool_date_partition_roundtrip_library_vs_probe(spark, tmp_path):
    """Library-written bool/date partitions must match typed probes:
    Spark's hive layout renders True as 'true', Python str() as 'True'
    — the shared renderer makes partition_eq typed-probe-safe."""
    import datetime

    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [
            (True, datetime.date(2024, 1, 1), 1),
            (True, datetime.date(2024, 1, 2), 2),
            (False, datetime.date(2024, 1, 1), 3),
            (False, datetime.date(2024, 1, 2), 4),
        ],
        "flag boolean, d date, v bigint",
    )
    t.commit(df, partition_by=("flag", "d"))
    # library recorded hive renderings
    vals = {
        (e["partitions"]["flag"], e["partitions"]["d"])
        for e in t._data_entries(1)
    }
    assert vals == {
        ("true", "2024-01-01"),
        ("true", "2024-01-02"),
        ("false", "2024-01-01"),
        ("false", "2024-01-02"),
    }
    # a TYPED probe (python bool/date, not pre-rendered strings) prunes
    # to exactly the one matching file — str(True)='True' used to prune
    # EVERYTHING out (silent wrong-prune)
    kept, total = t.plan_files(
        partition_eq={"flag": True, "d": datetime.date(2024, 1, 2)}
    )
    assert total == 4 and len(kept) == 1
    rows = (
        t.read(spark, partition_eq={"flag": True, "d": datetime.date(2024, 1, 2)})
        .collect()
    )
    assert sorted(r.v for r in rows) == [2]


def test_ds_writer_partition_values_match_library_rendering(spark, tmp_path):
    """DataSource-written partition values must render exactly as the
    library's hive-layout parse does, or partition_eq mismatches prune
    matching DS-written files out of results (r14 advice 2)."""
    import datetime

    base = str(tmp_path / "tbl")
    register(spark)
    df = spark.createDataFrame(
        [
            (True, datetime.date(2024, 3, 1), 1),
            (False, datetime.date(2024, 3, 2), 2),
        ],
        "flag boolean, d date, v bigint",
    )
    (
        df.write.format("snapshot")
        .option("path", base)
        .option("partitionBy", "flag,d")
        .mode("append")
        .save()
    )
    t = SnapshotTable(base)
    vals = {
        (e["partitions"]["flag"], e["partitions"]["d"])
        for e in t._data_entries(1)
    }
    assert vals == {("true", "2024-03-01"), ("false", "2024-03-02")}
    kept, total = t.plan_files(partition_eq={"flag": True})
    assert total == 2 and len(kept) == 1
    rows = t.read(spark, partition_eq={"flag": True}).collect()
    assert [r.v for r in rows] == [1]


# --- no orphan segment JSON on replayed batches (r14 advice 4) --------------


def test_replayed_ledgered_publish_leaves_no_segment_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = _kv(spark, [(1, 1), (2, 2)])
    entries = t._write_data(df, ())
    v = t.publish_entries(entries, schema=df.schema, stream_id="s", batch_id=0)
    assert v == 1
    segs_after_first = sorted(os.listdir(t.manifest_dir))
    # a zombie twin replays the same (stream, batch): recognized as a
    # duplicate, publishes nothing — and writes NO segment JSON either
    dup_entries = t._write_data(df, ())
    assert (
        t.publish_entries(
            dup_entries, schema=df.schema, stream_id="s", batch_id=0
        )
        is None
    )
    assert sorted(os.listdir(t.manifest_dir)) == segs_after_first


# --- schema and plan pinned to ONE resolved version (r14 advice 5) ----------


def test_batch_ds_schema_and_plan_pin_same_version(spark, tmp_path):
    from serverless_mapreduce_spark.sources.snapshot_batch import (
        SnapshotBatchDataSource,
    )

    base = str(tmp_path / "tbl")
    t = SnapshotTable(base)
    t.commit(_kv(spark, [(1, 1)]))
    ds = SnapshotBatchDataSource(options={"path": base})
    ds.schema()  # analysis resolves the head (v1) and pins it
    t.commit(_kv(spark, [(2, 2)]))  # a commit lands before reader()
    reader = ds.reader(t._schema(1))
    assert reader._version == 1  # plan comes from the pinned snapshot
    planned = {p.value[0] for p in reader.partitions()}
    assert planned == set(t._files(1))
