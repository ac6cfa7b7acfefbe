"""functions/prefix.py: the range-partitioned two-pass prefix sums must
equal the single-partition global window exactly, including negative
values, sparse keys, and partition-boundary offsets."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from serverless_mapreduce_spark.caching import release_cached
from serverless_mapreduce_spark.functions.prefix import prefix_sums


def _naive(df, order_col, cols):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(f"cum_{c}", F.sum(c).over(w)).withColumn(
            f"total_{c}", F.sum(c).over(wa)
        )
    return out


def test_prefix_sums_equals_global_window(spark):
    rng = random.Random(7)
    keys = rng.sample(range(100000), 500)
    rows = [(k, rng.randint(-50, 50), rng.randint(0, 9)) for k in keys]
    df = spark.createDataFrame(rows, "k bigint, a bigint, b bigint")
    got = {
        r["k"]: (r["cum_a"], r["cum_b"], r["total_a"], r["total_b"])
        for r in prefix_sums(df, "k", ["a", "b"], num_partitions=7).collect()
    }
    release_cached()
    want = {
        r["k"]: (r["cum_a"], r["cum_b"], r["total_a"], r["total_b"])
        for r in _naive(df, "k", ["a", "b"]).collect()
    }
    assert got == want


def test_prefix_sums_single_row_and_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(1, 5)], "k bigint, a bigint")
    rows = prefix_sums(df, "k", ["a"], num_partitions=8).collect()
    release_cached()
    assert [(r["cum_a"], r["total_a"]) for r in rows] == [(5, 5)]


def test_prefix_sums_empty_input(spark):
    df = spark.createDataFrame([], "k bigint, a bigint")
    assert prefix_sums(df, "k", ["a"], num_partitions=4).collect() == []
    release_cached()


def test_prefix_sums_null_values_match_global_window(spark):
    # NULL-bearing sum columns: cum must be NULL exactly where the global
    # window's frame holds no non-NULL value (leading NULLs), and resume
    # correctly across range-partition boundaries
    rows = [(1, None), (2, None), (3, 7), (4, None), (5, 2), (6, None)]
    df = spark.createDataFrame(rows, "k bigint, a bigint")
    got = {
        r["k"]: (r["cum_a"], r["total_a"])
        for r in prefix_sums(df, "k", ["a"], num_partitions=3).collect()
    }
    release_cached()
    want = {
        r["k"]: (r["cum_a"], r["total_a"])
        for r in _naive(df, "k", ["a"]).collect()
    }
    assert got == want
    assert got[1] == (None, 9) and got[2] == (None, 9)
    assert got[3] == (7, 9) and got[6] == (9, 9)


def test_prefix_sums_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k bigint, a bigint")
    rows = prefix_sums(df, "k", ["a"], num_partitions=2).collect()
    release_cached()
    assert all(r["cum_a"] is None and r["total_a"] is None for r in rows)
