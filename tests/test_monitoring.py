"""E16 monitoring parity: df.observe counters ride a real query."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.monitoring import observe_counts


def test_observe_counts_on_scan(spark, sf_dir):
    df = table(spark, sf_dir, "customer")
    expected = df.count()
    observed, obs = observe_counts(df, key_col="c_custkey", name="m1")
    n = observed.count()
    got = obs.get
    assert got["lineCount"] == n == expected > 0
    assert got["nullKeys"] == 0
    # HLL++ approximate distinct: within 5% of the exact key count
    assert abs(got["numKeys"] - expected) <= expected * 0.05


def test_observe_rides_an_aggregation(spark, sf_dir):
    df = table(spark, sf_dir, "events")
    observed, obs = observe_counts(df, key_col="user_id", name="m2")
    agg = observed.groupBy("user_id").agg(F.count("*").alias("n"))
    rows = agg.collect()
    # the observation measured the *input* side of the aggregation
    assert obs.get["lineCount"] == 1000
    assert sum(r.n for r in rows) == 1000
