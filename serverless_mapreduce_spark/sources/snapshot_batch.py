"""The snapshot table as a BATCH ``spark.read.format("snapshot")``
source (r13 verdict item 2): a Spark 4 Python DataSource over
:class:`~serverless_mapreduce_spark.sources.snapshots.SnapshotTable`,
so batch consumers get the table-format surface through the standard
reader API instead of the library API — the Delta/Iceberg
``spark.read.format(...)`` contract.

Surface:

- ``versionAsOf`` / ``timestampAsOf`` time travel (same resolution
  rules as the library's ``read``/``resolve_as_of``);
- filter pushdown (``pushFilters``) wired into the EXISTING manifest
  pruning: equality predicates probe recorded partition values
  (hidden-partition transforms included) and comparison predicates on
  numeric columns form a min/max box against per-file/segment stats —
  files and whole segments the manifest proves irrelevant are never
  planned, let alone opened. Every filter is also RETURNED to Spark
  (pruning is file-granular; Spark applies the row-level residual),
  so pushdown can only remove whole files, never rows it shouldn't;
- merge-on-read deletes applied inside the source: ``partitions()``
  plans each data file with exactly the delete-key files whose
  sequence number supersedes it (the Iceberg sequence rule —
  identical to the library's ``_read_with_deletes`` grouping), and
  ``read`` anti-joins them as Arrow compute, so the engine only ever
  sees live rows;
- schema pinned from the resolved version's manifest (pre-evolution
  files surface added columns as NULL — the same ``_reader``
  contract, re-implemented Arrow-side).

Scale: planning is manifest-only (one JSON + the summaries it
carries); one :class:`InputPartition` per data file parallelizes the
scan per file across executors; ``read`` yields ``RecordBatch``es
straight from the parquet reader — no per-row Python anywhere
(the pyds_kv.py discipline). Reference analog: none — the reference
re-lists and re-reads whole S3 prefixes per job
(``driver/driver.py``); this is the planned, pruned, versioned scan
that replaces that at 100 TB.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from serverless_mapreduce_spark.sources.snapshots import SnapshotTable


def _resolve_version(t: SnapshotTable, opts: dict) -> int:
    v = opts.get("versionasof")
    if v is not None:
        version = int(v)
        if version not in t.versions():
            raise ValueError(
                f"snapshot batch source: versionAsOf={version} is not a "
                f"live version of {t.base!r}"
            )
        return version
    ts = opts.get("timestampasof")
    if ts is not None:
        return t.resolve_as_of(float(ts))
    head = t.latest_version()
    if head is None:
        raise ValueError(
            "snapshot batch source: table has no committed version"
        )
    return head


class SnapshotBatchReader(DataSourceReader):
    """Manifest-planned batch reader over one resolved table version.

    Holds only the table path, resolved version, pinned schema, and the
    pushed pruning probes — a live SnapshotTable is planning state and
    is dropped from the executor pickle."""

    def __init__(self, options: dict, schema: StructType):
        opts = {k.lower(): v for k, v in options.items()}
        self._base = opts["path"]
        self._version = _resolve_version(SnapshotTable(self._base), opts)
        self._schema = schema
        # batch change feed (Delta's table_changes through the reader
        # API): serve every row-level change in (startingVersion,
        # endingVersion] with the CDF metadata columns appended
        self._change_feed = (
            str(opts.get("readchangefeed", "false")).lower() == "true"
        )
        self._cf_start = int(opts.get("startingversion", 0))
        self._cf_end = int(opts.get("endingversion", self._version))
        # pushed pruning probes: {col: value} equalities and
        # {col: [lo, hi]} numeric boxes (None = unbounded side)
        self._eq: dict[str, str | None] = {}
        self._box: dict[str, list] = {}

    def _table(self) -> SnapshotTable:
        t = getattr(self, "_tbl", None)
        if t is None:
            t = self._tbl = SnapshotTable(self._base)
        return t

    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state.pop("_tbl", None)
        return state

    # -- pushdown ----------------------------------------------------------

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Harvest pruning probes; return EVERY filter for Spark to
        evaluate row-level (manifest pruning is file-granular — the
        probes only discard files that provably hold no matching row,
        the same conservative contract as the library's ``plan_files``).
        """
        for f in filters:
            if len(getattr(f, "attribute", ())) != 1:
                yield f
                continue
            col = f.attribute[0]
            if isinstance(f, EqualTo):
                self._eq[col] = None if f.value is None else str(f.value)
                if isinstance(f.value, (int, float)) and not isinstance(
                    f.value, bool
                ):
                    self._box.setdefault(col, [None, None])
                    self._box[col] = [f.value, f.value]
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                if isinstance(f.value, (int, float)):
                    b = self._box.setdefault(col, [None, None])
                    if b[0] is None or f.value > b[0]:
                        b[0] = f.value
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                if isinstance(f.value, (int, float)):
                    b = self._box.setdefault(col, [None, None])
                    if b[1] is None or f.value < b[1]:
                        b[1] = f.value
            yield f

    # -- planning ----------------------------------------------------------

    def _planned_entries(self) -> list[dict]:
        """Pruned data entries for the resolved version: one library
        pruning pass per pushed probe (each pass is conservative, so
        composing them can only remove files no probe could keep)."""
        t = self._table()
        where = None
        for col, (lo, hi) in self._box.items():
            if lo is not None and hi is not None:
                where = (col, lo, hi)
                break  # the library box is single-column; others residual
        entries = t._pruned_data_entries(
            self._version, where, self._eq or None
        )
        # remaining complete boxes prune entry-level via recorded stats
        for col, (lo, hi) in self._box.items():
            if where is not None and col == where[0]:
                continue
            if lo is None or hi is None:
                continue
            kept = []
            for e in entries:
                rng = e.get("stats", {}).get(col)
                if (
                    rng is not None
                    and rng[0] is not None
                    and rng[1] is not None
                    and (rng[0] > hi or rng[1] < lo)
                ):
                    continue
                kept.append(e)
            entries = kept
        return entries

    def partitions(self) -> list[InputPartition]:
        """One partition per planned data file, each carrying exactly
        the delete-key files that supersede it (delete seq > data seq —
        the library's ``_read_with_deletes`` grouping, shipped to the
        executor as (path, [(delete_path, key_cols), ...])). Under
        ``readChangeFeed`` the plan is instead the library's
        ``plan_changes`` walk: one partition per change-volume file,
        tagged (change_type, commit_version, commit_ts)."""
        t = self._table()
        if self._change_feed:
            return [
                InputPartition(("cdf", p, ctype, v, ts))
                for paths, ctype, v, ts in t.plan_changes(
                    self._cf_start, self._cf_end
                )
                for p in paths
            ]
        dels = t._delete_entries(self._version)
        out = []
        for e in self._planned_entries():
            appl = tuple(
                (d["path"], tuple(d["keys"]))
                for d in sorted(dels, key=lambda d: d["path"])
                if d["_seq"] > e.get("_seq", 0)
            )
            out.append(InputPartition((e["path"], appl)))
        return out

    # -- execution ---------------------------------------------------------

    def read(self, partition: InputPartition) -> Iterator:
        """Arrow read of one data file aligned to the pinned schema
        (absent pre-evolution columns filled with NULLs), with the
        partition's applicable merge-on-read deletes anti-joined out as
        Arrow compute — the engine receives only live rows."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        if self._change_feed:
            _tag, path, ctype, cver, cts = partition.value
            raw = pq.read_table(path)
            cols = []
            for field in target:
                if field.name == "_change_type":
                    cols.append(
                        pa.array([ctype] * raw.num_rows, type=field.type)
                    )
                elif field.name == "_commit_version":
                    cols.append(
                        pa.array([cver] * raw.num_rows, type=field.type)
                    )
                elif field.name == "_commit_timestamp":
                    cols.append(
                        pa.array([cts] * raw.num_rows, type=field.type)
                    )
                elif field.name in raw.column_names:
                    cols.append(
                        raw.column(field.name)
                        .combine_chunks()
                        .cast(field.type)
                    )
                else:
                    cols.append(pa.nulls(raw.num_rows, field.type))
            yield from pa.table(cols, schema=target).to_batches()
            return
        path, appl = partition.value
        raw = pq.read_table(path)
        cols = []
        for field in target:
            if field.name in raw.column_names:
                cols.append(
                    raw.column(field.name).combine_chunks().cast(field.type)
                )
            else:
                cols.append(pa.nulls(raw.num_rows, field.type))
        tbl = pa.table(cols, schema=target)
        for dpath, keys in appl:
            dk = pq.read_table(dpath, columns=list(keys))
            # align key types to the pinned schema so the hash join
            # compares like with like
            dk = pa.table(
                [
                    dk.column(k)
                    .combine_chunks()
                    .cast(target.field(k).type)
                    for k in keys
                ],
                names=list(keys),
            )
            # SQL anti-join semantics: NULL keys never match — drop
            # null-keyed delete rows, then distinct, then left-anti
            mask = None
            for k in keys:
                m = pc.is_valid(dk.column(k))
                mask = m if mask is None else pc.and_(mask, m)
            if mask is not None:
                dk = dk.filter(mask)
            dk = dk.group_by(list(keys)).aggregate([])
            if dk.num_rows:
                tbl = tbl.join(
                    dk, keys=list(keys), join_type="left anti"
                ).select(target.names)
        yield from tbl.cast(target).to_batches()


class SnapshotBatchDataSource(DataSource):
    """``spark.read.format("snapshot").option("path", base).load()``.

    Options: ``path`` (table base dir, required), ``versionAsOf``
    (exact live version), ``timestampAsOf`` (epoch seconds — resolved
    like the library's ``resolve_as_of``), ``readChangeFeed`` (batch
    CDF: serve every row-level change in ``(startingVersion,
    endingVersion]`` — default (0, resolved version] — with the
    ``_change_type``/``_commit_version``/``_commit_timestamp`` columns;
    the plan is the library's ``plan_changes`` walk, loud on
    retention-expired holes). Enable
    ``spark.sql.python.filterPushdown.enabled`` for manifest pruning
    of pushed filters (they are still re-applied row-level by Spark
    either way)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self) -> str:
        opts = {k.lower(): v for k, v in self.options.items()}
        t = SnapshotTable(opts["path"])
        version = _resolve_version(t, opts)
        st = t._schema(version)
        if st is None:
            raise ValueError(
                "snapshot batch source: the resolved manifest records no "
                "schema (pre-round-10 table)"
            )
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in st.fields
        )
        if str(opts.get("readchangefeed", "false")).lower() == "true":
            ddl += (
                ", _change_type string"
                ", _commit_version bigint"
                ", _commit_timestamp double"
            )
        return ddl

    def reader(self, schema: StructType) -> SnapshotBatchReader:
        return SnapshotBatchReader(dict(self.options), schema)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SnapshotBatchDataSource)


# --- registered correctness query ---------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from serverless_mapreduce_spark.catalog import table  # noqa: E402
from serverless_mapreduce_spark.paths import scratch, sf_tag  # noqa: E402
from serverless_mapreduce_spark.registry import query  # noqa: E402
from serverless_mapreduce_spark.sources.snapshots import _cents  # noqa: E402


@query(
    "snapshot_batch_datasource",
    priority=0,
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS k, o_orderpriority AS p,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    )
    SELECT 'head_urgent' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM src WHERE p = '1-URGENT' AND k % 10 <> 0
    UNION ALL
    SELECT 'v1_all' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM src WHERE k % 2 = 0
    """,
)
def snapshot_batch_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE TABLE FORMAT BEHIND ``spark.read.format("snapshot")`` (r13
    verdict item 2): build a partitioned snapshot table (v1 = even
    orders, v2 = odd orders, v3 = merge-on-read purge of the %10 keys),
    then read it back ONLY through the registered batch DataSource —
    the head with a partition-equality filter PUSHED into manifest
    pruning (non-matching partitions are never planned; the MOR delete
    is applied inside the source as an Arrow anti-join), and
    ``versionAsOf=1`` time travel (pre-append, pre-purge). The oracle
    recomputes both probes from raw orders: a pruning bug loses a
    partition, a delete-application bug resurrects purged keys, a
    time-travel bug leaks v2 rows into the v1 probe.

    tests/test_snapshot_batch.py pins the planning contract itself:
    pushed-filter file counts equal the library's ``plan_files``, and
    schema evolution surfaces NULLs through the Arrow path."""
    import shutil

    base = scratch(sf_tag(sf_dir), "snapshot_batch_ds")
    shutil.rmtree(base, ignore_errors=True)
    t = SnapshotTable(base)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        _cents("o_totalprice").alias("cents"),
    )
    k = F.col("o_orderkey")
    t.commit(orders.filter(k % 2 == 0), partition_by=("o_orderpriority",))
    t.commit(orders.filter(k % 2 == 1), partition_by=("o_orderpriority",))
    t.delete_keys_mor(
        spark, orders.filter(k % 10 == 0).select("o_orderkey"), ("o_orderkey",)
    )

    # pushFilters is gated behind spark.sql.python.filterPushdown.enabled
    # (default false). Enable on a CLONE — never the caller's session.
    spark = spark.newSession()
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)

    head = (
        spark.read.format("snapshot")
        .option("path", base)
        .load()
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(F.lit("head_urgent").alias("probe"), "n_rows", "sum_cents")
    )
    v1 = (
        spark.read.format("snapshot")
        .option("path", base)
        .option("versionAsOf", "1")
        .load()
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(F.lit("v1_all").alias("probe"), "n_rows", "sum_cents")
    )
    return head.unionAll(v1)
