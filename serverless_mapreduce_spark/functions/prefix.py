"""Range-partitioned two-pass prefix sums — the distributed form of a
global ``SUM() OVER (ORDER BY ...)``.

A window with ORDER BY and no PARTITION BY plans as a single-partition sort
in Spark: every row moves to one task. That is the textbook scale smell the
operator docstrings (sort_by_value, ks_drift_clicks_purchases) name, and
this module is the decomposition they prescribe, implemented once:

1. ``repartitionByRange`` on the order key — rows land in P contiguous,
   sorted ranges (one sampling pass picks the boundaries; the same
   machinery Spark's own global ``orderBy`` uses);
2. per-partition running sums — an ordinary window PARTITIONED by the
   physical range id, so every task computes its own prefix independently;
3. per-partition TOTALS collected to the driver (P rows — bytes, not
   data), turned into exclusive offsets, and joined back on the range id.

Wall-clock is two narrow passes over the data plus a P-row driver round
trip, and no task ever holds more than its range. Requires UNIQUE order
keys (ties would make the within-partition ROWS frame order-dependent);
callers aggregate to a distinct-key table first, which is also what keeps
the input type-table-sized rather than corpus-sized.

No reference analog: the reference sorts globally by shipping every
record through its range partitioner into per-bucket Lambdas
(``shuffle_service``) and never computes running aggregates; this is the
Spark-native generalization its sort path would need for one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` plus ``cum_<c>`` (inclusive running sum in global
    ``order_col`` order) and ``total_<c>`` (grand total) for each ``c`` in
    ``sum_cols``. ``order_col`` values must be unique."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint (not persist): BOTH passes below must observe the
    # identical physical layout — a merely-cached frame can be recomputed
    # on eviction/executor loss, and the re-sampled range boundaries would
    # silently shift _rid assignments between the totals collect and the
    # final join. Eager materialization pins the layout (the same pattern
    # the graph iterations use); on a real cluster prefer reliable
    # checkpoint() to survive executor loss too.
    rp = (
        df.repartitionByRange(p, F.col(order_col))
        .withColumn("_rid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = (
        rp.groupBy("_rid")
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            *[F.count(c).alias(f"_n_{c}") for c in sum_cols],
        )
        .collect()
    )
    totals.sort(key=lambda r: r["_rid"])
    offsets: list[tuple] = []
    running = {c: 0 for c in sum_cols}
    running_n = {c: 0 for c in sum_cols}
    # grand total preserves SQL SUM semantics: NULL when every value is
    # NULL, the NULL-skipping sum otherwise
    grand = {
        c: (
            sum(r[c] or 0 for r in totals)
            if any(r[f"_n_{c}"] for r in totals)
            else None
        )
        for c in sum_cols
    }
    for r in totals:
        offsets.append(
            tuple(
                [r["_rid"]]
                + [running[c] for c in sum_cols]
                + [running_n[c] for c in sum_cols]
            )
        )
        for c in sum_cols:
            running[c] += r[c] or 0
            running_n[c] += r[f"_n_{c}"]
    # explicit DDL schema: a schema-less createDataFrame cannot infer from
    # an EMPTY offsets list (zero input partitions is a legal input)
    off_schema = ", ".join(
        ["_rid INT"]
        + [f"_off_{c} BIGINT" for c in sum_cols]
        + [f"_offn_{c} BIGINT" for c in sum_cols]
    )
    off_df = spark.createDataFrame(offsets, off_schema)
    w = (
        Window.partitionBy("_rid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = rp.join(F.broadcast(off_df), "_rid")
    for c in sum_cols:
        # exact global-window parity under NULLs: SUM over a frame with no
        # non-NULL value is NULL, not 0 — track the running non-NULL COUNT
        # alongside the running sum and NULL the cum where it is zero
        # (a bare local-sum + offset would go NULL whenever a partition's
        # LEADING values are NULL, and 0 where the global window says NULL)
        seen = F.count(c).over(w) + F.col(f"_offn_{c}")
        out = out.withColumn(
            f"cum_{c}",
            F.when(
                seen > 0,
                F.coalesce(F.sum(c).over(w), F.lit(0)) + F.col(f"_off_{c}"),
            ),
        ).withColumn(
            f"total_{c}",
            F.lit(grand[c]).cast("bigint")
            if grand[c] is None
            else F.lit(grand[c]),
        )
    return out.drop(
        "_rid",
        *[f"_off_{c}" for c in sum_cols],
        *[f"_offn_{c}" for c in sum_cols],
    )
