"""Round-12 metadata-layer pins: segment-level pruning summaries (planning
skips whole segments UNOPENED), partition-aligned segment writes,
summary-preserving manifest rewrite, the merge-on-read broadcast gate, the
raw-plan-vs-MOR guard, partition-spec evolution across commits, orphan
cleanup of partitioned commit dirs, and catalog txn-log retention."""

from __future__ import annotations

import os

import pytest

from serverless_mapreduce_spark.sources.snapshots import (
    MultiTableCatalog,
    SnapshotTable,
)


def _gkv(spark, rows):
    """rows of (g: string partition col, k: bigint)"""
    return spark.createDataFrame(rows, "g string, k bigint")


def _spy_opens(monkeypatch):
    """Count which segment files get OPENED (cache-missing _seg_entries
    calls would hide behind the instance cache; we count refs instead and
    use fresh instances in the tests)."""
    calls: list[str] = []
    orig = SnapshotTable._seg_entries

    def spy(self, ref):
        calls.append(ref)
        return orig(self, ref)

    monkeypatch.setattr(SnapshotTable, "_seg_entries", spy)
    return calls


def _partitioned_table(spark, tmp_path, n_commits=3):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(n_commits):
        rows = [(g, i * 10 + j) for g in ("a", "b", "c") for j in range(3)]
        t.commit(_gkv(spark, rows), partition_by=("g",), stats_cols=("k",))
    return t


def test_partition_eq_plan_opens_only_matching_segments(
    spark, tmp_path, monkeypatch
):
    """THE r12 headline pin (VERDICT item 1 done-criterion): with
    partition-aligned segments and manifest-carried summaries, a
    partition_eq plan opens exactly the matching segments — 3 of 9 here —
    and the total-file count comes from summaries alone."""
    t = _partitioned_table(spark, tmp_path)
    head = t.latest_version()
    assert len(t._segment_refs(head)) == 9  # 3 commits x 3 partition values
    fresh = SnapshotTable(t.base)  # no warm segment cache
    calls = _spy_opens(monkeypatch)
    files, total = fresh.plan_files(head, partition_eq={"g": "a"})
    assert len(set(calls)) == 3
    # value-exactness unchanged: the plan is EXACTLY the g=a files
    full = t._data_entries(head)
    assert total == len(full)
    assert set(files) == {
        e["path"] for e in full if e["partitions"]["g"] == "a"
    }


def test_where_range_plan_skips_segments_by_stats_envelope(
    spark, tmp_path, monkeypatch
):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(4):  # disjoint k ranges, one segment per commit
        df = spark.range(i * 100, (i + 1) * 100).withColumnRenamed("id", "k")
        t.commit(df.coalesce(1), stats_cols=("k",))
    fresh = SnapshotTable(t.base)
    calls = _spy_opens(monkeypatch)
    files, total = fresh.plan_files(where=("k", 150, 160))
    assert len(set(calls)) == 1  # only the [100, 200) segment is opened
    assert total == 4 and len(files) == 1


def test_read_uses_segment_skipping_and_stays_row_correct(spark, tmp_path):
    t = _partitioned_table(spark, tmp_path)
    got = sorted(
        r.k for r in t.read(spark, partition_eq={"g": "b"}).filter("g = 'b'").collect()
    )
    want = sorted(
        r.k for r in t.read(spark).filter("g = 'b'").collect()
    )
    assert got == want and len(got) == 9


def test_rewrite_manifests_folds_per_partition_and_keeps_skipping(
    spark, tmp_path, monkeypatch
):
    """Manifest compaction must not trade segment COUNT for segment
    SKIPPING: folding groups by partition value, so the post-rewrite
    layout still answers a partition_eq probe opening one segment."""
    t = _partitioned_table(spark, tmp_path)
    v = t.rewrite_manifests()
    refs = t._segment_refs(v)
    assert len(refs) == 3  # one folded segment per partition value
    fresh = SnapshotTable(t.base)
    calls = _spy_opens(monkeypatch)
    files, total = fresh.plan_files(v, partition_eq={"g": "c"})
    assert len(set(calls)) == 1
    full = t._data_entries(v)
    assert total == len(full)
    assert set(files) == {
        e["path"] for e in full if e["partitions"]["g"] == "c"
    }
    assert t.read(spark, v).count() == 27


def test_summary_carries_rows_and_delete_counts(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_gkv(spark, [("a", 1), ("a", 2)]).coalesce(1))
    v2 = t.delete_keys_mor(
        spark, spark.createDataFrame([(1,)], "k bigint"), ("k",)
    )
    body = t._manifest_body(v2)
    sums = [body["summaries"][r] for r in body["segments"]]
    assert sum(s["n_data"] for s in sums) == 1
    assert sum(s["n_delete"] for s in sums) == 1
    assert sum(s.get("rows", 0) for s in sums) == 2  # data rows only
    assert t._has_mor_deletes(v2) and not t._has_mor_deletes(1)


def test_plan_files_raises_on_mor_versions_unless_opted_out(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 10).withColumnRenamed("id", "k"))
    v2 = t.delete_keys_mor(
        spark, spark.createDataFrame([(3,)], "k bigint"), ("k",)
    )
    with pytest.raises(ValueError, match="merge-on-read"):
        t.plan_files(v2)
    with pytest.raises(ValueError, match="merge-on-read"):
        t.plan_files_keys("k", [3], v2)
    files, _ = t.plan_files(v2, ignore_deletes=True)
    assert files  # the escape hatch for callers applying deletes themselves


def test_mor_broadcast_gate_plan_shape_and_rows(spark, tmp_path, monkeypatch):
    """VERDICT r11 item 2: a delete-key file above MOR_BROADCAST_ROW_LIMIT
    must NOT be broadcast-hinted (the analyzed plan carries no hint); below
    the limit it is. Row results are identical either way."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 200).withColumnRenamed("id", "k").coalesce(1))
    t.delete_keys_mor(
        spark,
        spark.range(0, 50).withColumnRenamed("id", "k"),
        ("k",),
    )
    hinted = t.read(spark)
    assert "strategy=broadcast" in hinted._jdf.queryExecution().analyzed().toString()
    monkeypatch.setattr(SnapshotTable, "MOR_BROADCAST_ROW_LIMIT", 10)
    unhinted = t.read(spark)
    assert (
        "strategy=broadcast"
        not in unhinted._jdf.queryExecution().analyzed().toString()
    )
    assert sorted(r.k for r in unhinted.collect()) == list(range(50, 200))
    assert sorted(r.k for r in hinted.collect()) == list(range(50, 200))


def test_cow_key_broadcast_gated_by_batch_count(spark, tmp_path, monkeypatch):
    """The same gate on the copy-on-write path: above the limit,
    delete_keys' locate/rewrite joins carry no broadcast hint, and the
    rewrite is still key-exact."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 100).withColumnRenamed("id", "k").coalesce(1))
    monkeypatch.setattr(SnapshotTable, "MOR_BROADCAST_ROW_LIMIT", 5)
    v = t.delete_keys(
        spark, spark.range(0, 20).withColumnRenamed("id", "k"), ("k",)
    )
    assert sorted(r.k for r in t.read(spark, v).collect()) == list(range(20, 100))


def test_read_with_deletes_empty_entries_returns_schema_true_frame(
    spark, tmp_path
):
    """r11 advice: pruning can eliminate every candidate file; the read
    path must hand back a schema-pinned EMPTY frame, not IndexError."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_gkv(spark, [("a", 1)]))
    out = t._read_with_deletes(spark, 1, [])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["g", "k"]


def test_partition_spec_evolution_prunes_conservatively(spark, tmp_path):
    """VERDICT r11 item 8: unpartitioned -> partitioned(g) -> partitioned
    (k) commits coexist; a g-probe keeps every file lacking a recorded g
    value (no lost rows), and spec-aware compaction migrates old files
    into the probed spec so the plan tightens afterwards."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_gkv(spark, [("a", 1), ("b", 2)]).coalesce(1))          # no spec
    t.commit(_gkv(spark, [("a", 3), ("b", 4)]), partition_by=("g",))  # spec g
    t.commit(_gkv(spark, [("a", 5), ("b", 6)]), partition_by=("k",))  # spec k
    head = t.latest_version()
    files, total = t.plan_files(head, partition_eq={"g": "a"})
    by_path = {e["path"]: e for e in t._data_entries(head)}
    # every g-recording file in the plan is g=a; files without g survive
    for f in files:
        parts = by_path[f].get("partitions", {})
        assert parts.get("g", "a") == "a"
    # no lost rows: the pruned read filtered to g='a' equals the truth
    got = sorted(
        r.k for r in t.read(spark, partition_eq={"g": "a"}).filter("g='a'").collect()
    )
    assert got == [1, 3, 5]
    # migrate everything into the g spec; now the probe is value-exact
    v = t.compact_small_files(spark, partition_by=("g",))
    files2, _ = t.plan_files(v, partition_eq={"g": "a"})
    by_path2 = {e["path"]: e for e in t._data_entries(v)}
    assert files2 and all(
        by_path2[f]["partitions"]["g"] == "a" for f in files2
    )
    got2 = sorted(
        r.k for r in t.read(spark, v, partition_eq={"g": "a"}).filter("g='a'").collect()
    )
    assert got2 == [1, 3, 5]


def test_cleanup_orphans_sweeps_partitioned_commit_dirs(spark, tmp_path):
    """r11 advice: orphaned PARTITIONED commits nest parquet under
    _p_<col>= dirs; a top-level-only listing saw them as empty and leaked
    them forever."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_gkv(spark, [("a", 1)]))
    # fabricate a crashed partitioned commit: files written, no manifest
    orphan = t._write_data(
        _gkv(spark, [("a", 9), ("b", 8)]), (), partition_by=("g",)
    )
    orphan_paths = [e["path"] for e in orphan]
    assert all(os.sep + "_p_g=" in p for p in orphan_paths)
    swept = t.cleanup_orphans(grace_seconds=0.0)
    assert set(orphan_paths) <= set(swept)
    assert not any(os.path.exists(p) for p in orphan_paths)
    assert t.read(spark).count() == 1  # live data untouched


def test_catalog_expire_txns_bounds_the_log(tmp_path):
    cat = MultiTableCatalog(str(tmp_path / "cat"))
    for b in range(30):
        cat.publish({"corpus": b + 1}, stream_id="s", batch_id=b)
    assert len(cat.txns()) == 30
    dropped = cat.expire_txns(keep_latest=5)
    assert len(dropped) == 25 and cat.txns() == list(range(26, 31))
    # head semantics unchanged: full visibility map + ledger survive
    assert cat.visible("corpus") == 30
    assert cat.batch_committed("s", 29) and not cat.batch_committed("s", 30)
    cat.publish({"corpus": 31})
    assert cat.visible("corpus") == 31


def test_hidden_partition_transforms(spark, tmp_path, monkeypatch):
    """month(col) partition transforms: files cluster and record the
    TRANSFORMED value, a raw-column date box prunes files AND whole
    segments, values stay in the data files, and transform-spec
    compaction preserves the layout."""
    rows = [
        (i, f"199{6 + i % 2}-0{1 + i % 3}-15 00:00:00") for i in range(12)
    ]
    df = spark.createDataFrame(rows, "k bigint, d string").selectExpr(
        "k", "CAST(d AS TIMESTAMP) AS d"
    )
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(df, partition_by=("month(d)",))
    ents = t._data_entries(1)
    keys = {k for e in ents for k in e["partitions"]}
    assert keys == {"month(d)"}
    vals = {e["partitions"]["month(d)"] for e in ents}
    assert vals == {
        "1996-01", "1996-02", "1996-03", "1997-01", "1997-02", "1997-03"
    }
    # raw-column box prunes to the covering months, unopened segments
    fresh = SnapshotTable(t.base)
    calls = _spy_opens(monkeypatch)
    files, total = fresh.plan_files(where=("d", "1996-02-01", "1996-03-31"))
    by_path = {e["path"]: e for e in ents}
    want = {
        e["path"]
        for e in ents
        if e["partitions"]["month(d)"] in ("1996-02", "1996-03")
    }
    assert set(files) == want and total == len(ents)
    assert len(set(calls)) == 2  # one aligned segment per covered month
    # rows are value-exact and the raw column survives in the files
    got = sorted(
        r.k
        for r in t.read(spark, where=("d", "1996-02-01", "1996-03-31"))
        .filter("d >= '1996-02-01' AND d < '1996-04-01'")
        .collect()
    )
    truth = sorted(
        r.k
        for r in df.filter("d >= '1996-02-01' AND d < '1996-04-01'").collect()
    )
    assert got == truth and got
    # partition_eq on the transformed key still works
    f2, _ = t.plan_files(partition_eq={"month(d)": "1997-01"})
    assert f2 and all(
        by_path[f]["partitions"]["month(d)"] == "1997-01" for f in f2
    )
    # compaction under the transform spec keeps recorded values
    v = t.compact_small_files(spark, partition_by=("month(d)",))
    ents2 = t._data_entries(v)
    assert {e["partitions"]["month(d)"] for e in ents2} == vals
    f3, tot3 = t.plan_files(v, where=("d", "1997-02-01", "1997-02-28"))
    assert f3 and len(f3) < tot3


def test_all_null_stats_file_survives_range_plan(spark, tmp_path):
    """r12 review: a file whose stats column is entirely NULL records
    [None, None] bounds; range planning must keep it conservatively (its
    NULL rows can't match anyway), never TypeError on the None compare —
    in plan_files, read, and delete_where's candidate split alike."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint"),
        stats_cols=("v",),
    )
    t.commit(
        spark.createDataFrame(
            [(3, None), (4, None)], "k bigint, v bigint"
        ),
        stats_cols=("v",),
    )
    files, total = t.plan_files(where=("v", 15, 25))
    assert total == len(t._data_entries(2)) and files
    got = sorted(
        r.k
        for r in t.read(spark, where=("v", 15, 25))
        .filter("v >= 15 AND v <= 25")
        .collect()
    )
    assert got == [2]
    v = t.delete_where(spark, "v = 20", prune=("v", 20, 20))
    assert sorted(r.k for r in t.read(spark, v).collect()) == [1, 3, 4]


def test_mor_gate_sums_rows_across_a_commits_delete_files(
    spark, tmp_path, monkeypatch
):
    """r12 review: one purge commit written as several sub-limit key
    files must not broadcast — the gate sums the COMMIT's rows."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 300).withColumnRenamed("id", "k").coalesce(1))
    # AQE would coalesce the distinct'd key set back to one file; disable
    # it so the purge commit genuinely spans several sub-limit key files
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t.delete_keys_mor(
            spark,
            spark.range(0, 100).withColumnRenamed("id", "k").repartition(4),
            ("k",),
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    dels = t._delete_entries(t.latest_version())
    assert len(dels) > 1  # the purge really spans several key files
    assert all(e["rows"] < 100 for e in dels)
    monkeypatch.setattr(SnapshotTable, "MOR_BROADCAST_ROW_LIMIT", 99)
    plan = t.read(spark)._jdf.queryExecution().analyzed().toString()
    assert "strategy=broadcast" not in plan
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(100, 300))


def test_public_reads_serve_schema_true_empty_frames(spark, tmp_path):
    """r12 review: read() with an all-pruned plan and read_incremental()
    across a no-op window return EMPTY frames under the recorded schema —
    composing callers never see a ValueError."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_gkv(spark, [("a", 1)]), partition_by=("g",))
    out = t.read(spark, partition_eq={"g": "zzz"})
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["g", "k"]
    v2 = t.rewrite_manifests()  # metadata-only: no files added
    inc = t.read_incremental(spark, 1, v2)
    assert inc.count() == 0 and [f.name for f in inc.schema.fields] == ["g", "k"]


def test_replace_where_guards_and_accounting(spark, tmp_path):
    """replaceWhere (r12): exact partition replacement, path-identical
    carry of untouched partitions, and both loud guards — unrecorded
    partition values and stray out-of-partition batch rows."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(
        _gkv(spark, [("a", 1), ("a", 2), ("b", 3)]), partition_by=("g",)
    )
    keep = {
        e["path"]
        for e in t._data_entries(1)
        if e["partitions"]["g"] != "a"
    }
    v2 = t.replace_where(
        spark, {"g": "a"}, _gkv(spark, [("a", 100), ("a", 200)])
    )
    got = sorted((r.g, r.k) for r in t.read(spark, v2).collect())
    assert got == [("a", 100), ("a", 200), ("b", 3)]
    # time travel intact, untouched partition path-identical
    assert sorted(r.k for r in t.read(spark, 1).collect()) == [1, 2, 3]
    post = {
        e["path"]
        for e in t._data_entries(v2)
        if e["partitions"]["g"] != "a"
    }
    assert post == keep
    # guard 1: a stray out-of-partition row refuses the whole batch
    with pytest.raises(ValueError, match="outside the target partition"):
        t.replace_where(spark, {"g": "a"}, _gkv(spark, [("a", 1), ("b", 9)]))
    # guard 2: files without recorded values can't be replaced around
    t2 = SnapshotTable(str(tmp_path / "tbl2"))
    t2.commit(_gkv(spark, [("a", 1)]))  # no partition spec
    with pytest.raises(ValueError, match="record partition values"):
        t2.replace_where(spark, {"g": "a"}, _gkv(spark, [("a", 5)]))
    # idempotent backfill: re-applying replaces with identical rows
    v3 = t.replace_where(
        spark, {"g": "a"}, _gkv(spark, [("a", 100), ("a", 200)])
    )
    assert sorted((r.g, r.k) for r in t.read(spark, v3).collect()) == got


def test_point_lookup_skips_segments_by_stats_envelope(
    spark, tmp_path, monkeypatch
):
    """plan_files_keys (r12): on a range-clustered key column, a point
    lookup skips whole segments whose summary envelope excludes every
    probe key — the bloom check then runs only over covering segments."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(4):  # disjoint k ranges, one segment per commit
        df = spark.range(i * 100, (i + 1) * 100).withColumnRenamed("id", "k")
        t.commit(df.coalesce(1), stats_cols=("k",), bloom_cols=("k",))
    fresh = SnapshotTable(t.base)
    calls = _spy_opens(monkeypatch)
    files, total = fresh.plan_files_keys("k", [155, 167])
    assert len(set(calls)) == 1  # only the [100, 200) segment opened
    assert total == 4 and len(files) == 1
    got = sorted(
        r.k
        for r in spark.read.parquet(*files).filter("k IN (155, 167)").collect()
    )
    assert got == [155, 167]


def test_day_transform_partitioning(spark, tmp_path):
    """day(col) — the finer hidden-partition transform: values record as
    yyyy-MM-dd and a raw date box prunes day-exactly."""
    rows = [(i, f"1996-03-{10 + i % 3:02d} 12:00:00") for i in range(9)]
    df = spark.createDataFrame(rows, "k bigint, d string").selectExpr(
        "k", "CAST(d AS TIMESTAMP) AS d"
    )
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(df, partition_by=("day(d)",))
    ents = t._data_entries(1)
    assert {e["partitions"]["day(d)"] for e in ents} == {
        "1996-03-10", "1996-03-11", "1996-03-12"
    }
    files, total = t.plan_files(where=("d", "1996-03-11", "1996-03-11"))
    by_path = {e["path"]: e for e in ents}
    assert files and len(files) < total
    assert all(
        by_path[f]["partitions"]["day(d)"] == "1996-03-11" for f in files
    )
    got = sorted(
        r.k
        for r in t.read(spark, where=("d", "1996-03-11", "1996-03-11"))
        .filter("d >= '1996-03-11' AND d < '1996-03-12'")
        .collect()
    )
    assert got == [1, 4, 7]


def test_replace_where_multi_column_stray_guard(spark, tmp_path):
    """r12 second review: a MIXED-partition row (right a, wrong b) must
    trip the stray guard — NOT(c1 AND c2), never (NOT c1 AND NOT c2)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [("1", "2", 10), ("1", "9", 20)], "a string, b string, k bigint"
    )
    t.commit(df, partition_by=("a", "b"))
    mixed = spark.createDataFrame(
        [("1", "2", 11), ("1", "9", 99)], "a string, b string, k bigint"
    )
    with pytest.raises(ValueError, match="outside the target partition"):
        t.replace_where(spark, {"a": "1", "b": "2"}, mixed)
    # the clean batch replaces exactly (a=1, b=2)
    ok = spark.createDataFrame([("1", "2", 11)], "a string, b string, k bigint")
    v = t.replace_where(spark, {"a": "1", "b": "2"}, ok)
    got = sorted((r.a, r.b, r.k) for r in t.read(spark, v).collect())
    assert got == [("1", "2", 11), ("1", "9", 20)]


def test_replace_where_on_transform_partitioned_table(spark, tmp_path):
    """r12 second review: replace_where evaluates the partition TRANSFORM
    against the raw column, so a day()-partitioned table backfills one
    day atomically with the stray guard intact."""
    df = spark.createDataFrame(
        [(1, "1996-03-10 08:00:00"), (2, "1996-03-11 09:00:00")],
        "k bigint, d string",
    ).selectExpr("k", "CAST(d AS TIMESTAMP) AS d")
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(df, partition_by=("day(d)",))
    fix = spark.createDataFrame(
        [(22, "1996-03-11 10:00:00")], "k bigint, d string"
    ).selectExpr("k", "CAST(d AS TIMESTAMP) AS d")
    v = t.replace_where(spark, {"day(d)": "1996-03-11"}, fix)
    got = sorted(r.k for r in t.read(spark, v).collect())
    assert got == [1, 22]
    # a batch whose rows belong to a DIFFERENT day is refused
    stray = spark.createDataFrame(
        [(33, "1996-03-12 10:00:00")], "k bigint, d string"
    ).selectExpr("k", "CAST(d AS TIMESTAMP) AS d")
    with pytest.raises(ValueError, match="outside the target partition"):
        t.replace_where(spark, {"day(d)": "1996-03-11"}, stray)


def test_resolve_as_of_timestamp_time_travel(spark, tmp_path):
    import time

    t = SnapshotTable(str(tmp_path / "tbl"))
    t0 = time.time()
    t.commit(_gkv(spark, [("a", 1)]))
    mid = time.time()
    time.sleep(0.02)
    t.commit(_gkv(spark, [("a", 2)]))
    assert t.resolve_as_of(mid) == 1
    assert t.resolve_as_of(time.time()) == 2
    assert t.read(spark, t.resolve_as_of(mid)).count() == 1
    with pytest.raises(ValueError, match="no version committed"):
        t.resolve_as_of(t0 - 10)
    # legacy manifests without a ts resolve as arbitrarily old
    body = t._manifest_body(1)
    body.pop("ts")
    import json as _json

    with open(t._manifest_path(1), "w") as fh:
        _json.dump(body, fh)
    assert t.resolve_as_of(t0 - 10) == 1
