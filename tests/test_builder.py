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
