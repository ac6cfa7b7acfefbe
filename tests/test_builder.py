"""Builder facade semantics: the bounded-memory associative paths must
produce identical results to the contract-parity (materializing) defaults."""

from __future__ import annotations

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.pipeline.builder import ServerlessMR
from serverless_mapreduce_spark.pipeline.facade_queries import (
    ip_prefix_partition,
    sum_map,
    sum_reduce,
)


def _collect(df):
    return sorted((r.key, r.value) for r in df.collect())


def test_associative_reduce_matches_default(spark, sf_dir):
    events = table(spark, sf_dir, "events")

    def build(**kw):
        return _collect(
            ServerlessMR(spark)
            .source(events, key_col="user_id", value_col="value")
            .map(sum_map)
            .reduce(sum_reduce, num_reducers=4, **kw)
            .run()
        )

    assert build() == build(associative=True)


def test_associative_combine_matches_default(spark, sf_dir):
    events = table(spark, sf_dir, "events")

    def build(assoc):
        return _collect(
            ServerlessMR(spark)
            .source(events, key_col="user_id", value_col="value")
            .map(sum_map)
            .combine(sum_reduce, associative=assoc)
            .shuffle(ip_prefix_partition)
            .reduce(sum_reduce, num_reducers=4)
            .run()
        )

    assert build(False) == build(True)


def test_custom_partitioner_controls_placement(spark, sf_dir):
    """The reference contract is that shuffle(p) controls *placement*
    (default/partition.py:4-11): every key must land in partition
    p(key, n) % n exactly."""
    events = table(spark, sf_dir, "events")
    n = 4
    out = (
        ServerlessMR(spark)
        .source(events, key_col="user_id", value_col="value")
        .map(sum_map)
        .shuffle(ip_prefix_partition)
        .reduce(sum_reduce, num_reducers=n)
        .run()
    )
    placed = out.rdd.mapPartitionsWithIndex(
        lambda pid, it: [(pid, row.key) for row in it]
    ).collect()
    assert placed, "no output rows"
    for pid, key in placed:
        assert pid == ip_prefix_partition(key, n) % n, (pid, key)
