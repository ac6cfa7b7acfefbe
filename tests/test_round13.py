"""Round-13 pins: advice fixes (replace_where guard, resolve_as_of
ordering, monotonic commit timestamps, job-side row counts) and the
maintenance/stream interop work (data_change=false, change feed,
transforms, cursor-pinned retention, staged-orphan GC)."""

from __future__ import annotations

import json
import os

import pytest

from serverless_mapreduce_spark.sources.snapshots import SnapshotTable


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x bigint")


# --- replace_where: empty probe is a loud validation error -----------------


def test_replace_where_empty_probe_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1, 2, 3]), partition_by=("x",))
    with pytest.raises(ValueError, match="at least one partition equality"):
        t.replace_where(spark, {}, _df(spark, [9]))


# --- resolve_as_of: ts-less manifests in a mixed-writer history ------------


def _strip_ts(t: SnapshotTable, version: int) -> None:
    p = t._manifest_path(version)
    with open(p) as fh:
        body = json.load(fh)
    body.pop("ts", None)
    with open(p, "w") as fh:
        json.dump(body, fh)


def _set_ts(t: SnapshotTable, version: int, ts: float) -> None:
    p = t._manifest_path(version)
    with open(p) as fh:
        body = json.load(fh)
    body["ts"] = ts
    with open(p, "w") as fh:
        json.dump(body, fh)


def test_resolve_as_of_tsless_after_newer_commit(spark, tmp_path):
    """A ts-less version written AFTER a commit already newer than the
    target (mixed-writer upgrade window) must not resolve — the scan
    stops at the first version known to exceed the target."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1]))  # v1
    t.commit(_df(spark, [2]))  # v2
    t.commit(_df(spark, [3]))  # v3, ts-less (pre-r12 writer)
    _set_ts(t, 1, 100.0)
    _set_ts(t, 2, 200.0)
    _strip_ts(t, 3)
    assert t.resolve_as_of(150.0) == 1
    # a ts-less version NOT preceded by a too-new commit stays eligible
    assert t.resolve_as_of(250.0) == 3


def test_resolve_as_of_tsless_prefix_still_eligible(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1]))  # v1 ts-less (legacy)
    t.commit(_df(spark, [2]))  # v2
    _strip_ts(t, 1)
    _set_ts(t, 2, 200.0)
    assert t.resolve_as_of(150.0) == 1


def test_publish_clamps_ts_monotonic(spark, tmp_path):
    """A parent manifest with a future clock must not let the child
    publish an OLDER timestamp — resolve_as_of's early exit depends on
    monotonic history."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [1]))
    import time

    future = time.time() + 10_000.0
    _set_ts(t, 1, future)
    t.commit(_df(spark, [2]))
    assert t._manifest_body(2)["ts"] >= future


# --- row counts come from the write job, not driver footer opens -----------


def test_commit_records_row_counts_without_stats(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, list(range(37))))
    ents = t._data_entries(1)
    assert all("rows" in e for e in ents)
    assert sum(e["rows"] for e in ents) == 37


def test_commit_records_rows_and_stats_one_pass(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [5, 7, 11]), stats_cols=("x",))
    ents = t._data_entries(1)
    assert sum(e["rows"] for e in ents) == 3
    los = [e["stats"]["x"][0] for e in ents if "stats" in e]
    his = [e["stats"]["x"][1] for e in ents if "stats" in e]
    assert min(los) == 5 and max(his) == 11
