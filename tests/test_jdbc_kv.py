"""JDBC KV connector: genuine external round-trip through embedded Derby,
with server-side projection/filter pushdown (the reference's DynamoDB
ProjectionExpression parity, data_sources/input_handler_dynamodb.py:154-179)
and a partition-parallel read."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_mapreduce_spark.sources.jdbc_kv import (
    read_events_kv,
    write_events_kv,
)


def test_jdbc_roundtrip_lossless_and_parallel(spark, sf_dir):
    url = write_events_kv(spark, sf_dir)
    back = read_events_kv(spark, url, num_partitions=4)
    from serverless_mapreduce_spark.catalog import table

    src = table(spark, sf_dir, "events")
    assert back.count() == src.count()
    # Typed columns survive: exact sum of a projected column matches.
    a = back.agg(F.sum(F.col("value").cast("decimal(18,2)"))).collect()[0][0]
    b = src.agg(F.sum(F.col("value").cast("decimal(18,2)"))).collect()[0][0]
    assert a == b
    # Partition-parallel read: one range scan per requested partition.
    assert back.rdd.getNumPartitions() == 4


def test_jdbc_pushdown_reaches_the_store(spark, sf_dir):
    """The generated store-side SQL must carry the filter and only the
    referenced columns — visible as PushedFilters / a narrowed ReadSchema
    in the scan node."""
    url = write_events_kv(spark, sf_dir)
    back = read_events_kv(spark, url)
    q = (
        back.filter(F.col("event_type") == "purchase")
        .select("event_type", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in q and "event_type" in q.split("PushedFilters")[1][:200]
    # projection pruning: the scan must not read user_id
    scan_part = q[q.find("Scan JDBCRelation"):][:400]
    assert "user_id" not in scan_part.lower()
