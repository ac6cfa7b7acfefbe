"""Partition spec in SnapshotTable (round 11): per-file partition values
recorded at commit, value-exact pruning with zero scanned files for
non-matching partitions, NULL partitions, hive-escaped values, and
composition with stats pruning, COW carry-over, and appends."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_mapreduce_spark.sources.snapshots import SnapshotTable


def _df(spark, rows, ddl="k BIGINT, grp STRING"):
    return spark.createDataFrame(rows, ddl)


def test_partition_values_recorded_and_pruned_exactly(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    rows = [(k, "ab"[k % 2]) for k in range(20)]
    t.commit(_df(spark, rows), partition_by=("grp",))
    ents = t._data_entries(1)
    assert all(e["partitions"].keys() == {"grp"} for e in ents)
    files_a, total = t.plan_files(partition_eq={"grp": "a"})
    # value-exact: EVERY kept file is the probed partition, every other
    # partition contributes zero files
    by_path = {e["path"]: e["partitions"]["grp"] for e in ents}
    assert files_a and all(by_path[f] == "a" for f in files_a)
    assert len(files_a) + len(t.plan_files(partition_eq={"grp": "b"})[0]) == total
    got = sorted(
        r.k for r in t.read(spark, partition_eq={"grp": "a"}).collect()
    )
    assert got == [k for k in range(20) if k % 2 == 0]
    # the partition column is IN the data files, not reconstructed
    assert t.read(spark).columns == ["k", "grp"]


def test_partition_null_and_escaped_values(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    rows = [(1, "x y"), (2, None), (3, "a=b")]  # space, NULL, '=' in value
    t.commit(_df(spark, rows), partition_by=("grp",))
    vals = {e["partitions"]["grp"] for e in t._data_entries(1)}
    assert vals == {"x y", None, "a=b"}
    for want, ks in (("x y", [1]), (None, [2]), ("a=b", [3])):
        got = sorted(
            r.k for r in t.read(spark, partition_eq={"grp": want}).collect()
        )
        assert got == ks


def test_partition_pruning_composes_with_stats(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    rows = [(k, "ab"[k % 2]) for k in range(1000)]
    df = _df(spark, rows).repartitionByRange(4, "k")
    t.commit(df, partition_by=("grp",), stats_cols=("k",))
    # 4 range buckets x 2 partitions = 8 files; combined pruning keeps the
    # intersection
    files, total = t.plan_files(
        where=("k", 0, 100), partition_eq={"grp": "a"}
    )
    assert total == 8 and 1 <= len(files) <= 2
    got = sorted(
        r.k
        for r in t.read(
            spark, where=("k", 0, 100), partition_eq={"grp": "a"}
        )
        .filter("k <= 100")
        .collect()
    )
    assert got == [k for k in range(101) if k % 2 == 0]


def test_unpartitioned_files_are_conservatively_kept(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [(1, "a")]).coalesce(1))  # no partition spec
    t.commit(_df(spark, [(2, "b")]), partition_by=("grp",))
    files, total = t.plan_files(partition_eq={"grp": "b"})
    # the spec-less file cannot be excluded; the 'a' partition file can
    assert total == 2 and len(files) == 2
    got = sorted(
        r.k
        for r in t.read(spark, partition_eq={"grp": "b"})
        .filter("grp = 'b'")
        .collect()
    )
    assert got == [2]


def test_partition_values_survive_cow_carry(spark, tmp_path):
    """A delete that rewrites one partition's file must carry the other
    partitions' entries — with their recorded values — by reference."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    rows = [(k, "ab"[k % 2]) for k in range(10)]
    t.commit(_df(spark, rows), partition_by=("grp",))
    v2 = t.delete_keys_mor(
        spark, spark.createDataFrame([(0,)], "k BIGINT"), ("k",)
    )
    v3 = t.compact_small_files(spark, target_bytes=1 << 30)
    # compaction rewrote everything: values gone (conservative), reads right
    got = sorted(r.k for r in t.read(spark, v3).collect())
    assert got == list(range(1, 10))
    # but a keyed COW delete touching only partition 'a' carries 'b' values
    t2 = SnapshotTable(str(tmp_path / "tbl2"))
    t2.commit(_df(spark, rows), partition_by=("grp",))
    t2.delete_keys(spark, spark.createDataFrame([(2,)], "k BIGINT"), ("k",))
    vals = {
        e["partitions"]["grp"]
        for e in t2._data_entries(t2.latest_version())
        if "partitions" in e
    }
    assert "b" in vals  # untouched partition kept its recorded value
    files_b, _ = t2.plan_files(partition_eq={"grp": "b"})
    assert files_b
    assert v2  # silence lint: versions used above


def test_partitioned_append_extends_partitions(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, [(1, "a")]), partition_by=("grp",))
    t.commit(_df(spark, [(2, "c")]), partition_by=("grp",))
    files_c, total = t.plan_files(partition_eq={"grp": "c"})
    assert total == 2 and len(files_c) == 1
    assert [
        r.k for r in t.read(spark, partition_eq={"grp": "c"}).collect()
    ] == [2]


def test_partitioned_stats_keyed_by_full_path_not_basename(spark, tmp_path):
    """One task writing two partition values emits the SAME basename under
    both partition directories; stats/blooms keyed by basename would
    assign one file's min/max to the other — a silent wrong-prune (r11
    review). coalesce(1) forces exactly that layout."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    rows = [(k, "a") for k in range(0, 100)] + [
        (k, "b") for k in range(1000, 1100)
    ]
    df = _df(spark, rows, "k BIGINT, grp STRING").coalesce(1)
    t.commit(df, partition_by=("grp",), stats_cols=("k",), bloom_cols=("k",))
    ents = t._data_entries(1)
    assert len(ents) == 2
    by_grp = {e["partitions"]["grp"]: e for e in ents}
    assert by_grp["a"]["stats"]["k"] == [0, 99]
    assert by_grp["b"]["stats"]["k"] == [1000, 1099]
    # a box over the low range must plan ONLY partition a's file
    files, total = t.plan_files(where=("k", 0, 50))
    assert total == 2 and files == [by_grp["a"]["path"]]
    got = sorted(r.k for r in t.read(spark, where=("k", 0, 50)).filter("k <= 50").collect())
    assert got == list(range(51))
    # blooms likewise: a key in partition b must plan b's file
    files_b, _ = t.plan_files_keys("k", [1050])
    assert by_grp["b"]["path"] in files_b
    got = t._reader(spark, 1).parquet(*files_b).filter("k = 1050").collect()
    assert [r.k for r in got] == [1050]


def test_partition_eq_coerces_probe_values(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, 5), (2, 7)], "k BIGINT, part BIGINT"),
        partition_by=("part",),
    )
    # integer probe of an integer partition column must match the
    # hive-rendered string values (r11 review)
    got = [r.k for r in t.read(spark, partition_eq={"part": 5}).collect()]
    assert got == [1]
    files, total = t.plan_files(partition_eq={"part": 7})
    assert total == 2 and len(files) == 1


def test_compaction_preserves_partition_spec(spark, tmp_path):
    """compact_small_files(partition_by=...) re-clusters the rewrite by
    partition value and records fresh per-file values, so partition_eq
    pruning keeps working on the compacted layout (r11: the spec-less
    rewrite was conservatively always scanned)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    rows_a = [(k, "a") for k in range(50)]
    rows_b = [(k, "b") for k in range(100, 150)]
    t.commit(_df(spark, rows_a), partition_by=("grp",))
    t.commit(_df(spark, rows_b), partition_by=("grp",))
    t.commit(_df(spark, [(999, "a")]), partition_by=("grp",))
    pre_rows = sorted(r.k for r in t.read(spark).collect())
    v = t.compact_small_files(
        spark, target_bytes=1 << 30, partition_by=("grp",)
    )
    ents = t._data_entries(v)
    assert all("partitions" in e and "grp" in e["partitions"] for e in ents)
    assert sorted(r.k for r in t.read(spark, v).collect()) == pre_rows
    files_b, total = t.plan_files(v, partition_eq={"grp": "b"})
    assert files_b and len(files_b) < total
    got = sorted(
        r.k
        for r in t.read(spark, v, partition_eq={"grp": "b"})
        .filter("grp = 'b'")
        .collect()
    )
    assert got == [k for k, _ in rows_b]


def test_streaming_commits_into_partitioned_table(spark, tmp_path):
    """Exactly-once streaming ingest composes with the partition spec:
    each micro-batch records per-file partition values, so a
    partition-sliced consumer prunes streamed data the same as batch
    commits — and the batch ledger still dedups replays."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    b0 = _df(spark, [(1, "a"), (2, "b")])
    b1 = _df(spark, [(3, "a"), (4, "c")])
    assert t.commit_stream_batch(b0, "s", 0, partition_by=("grp",)) == 1
    assert t.commit_stream_batch(b1, "s", 1, partition_by=("grp",)) == 2
    # replay skipped
    assert t.commit_stream_batch(b0, "s", 0, partition_by=("grp",)) is None
    files_a, total = t.plan_files(partition_eq={"grp": "a"})
    assert len(files_a) == 2 and len(files_a) < total
    got = sorted(
        r.k
        for r in t.read(spark, partition_eq={"grp": "a"})
        .filter("grp = 'a'")
        .collect()
    )
    assert got == [1, 3]
