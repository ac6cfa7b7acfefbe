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


def test_describe_reports_the_dag(spark):
    """describe() serializes the merge DAG (the reference's /dag payload):
    two sealed source pipelines feeding a merged reducer pipeline."""
    import json

    from serverless_mapreduce_spark.pipeline.builder import ServerlessMR

    # non-default column names so source() applies the KV wire encoding
    # (the exact key/value names mean "already encoded" to the facade)
    a = spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, v int")
    b = spark.createDataFrame([("k1", 3)], "k string, v int")
    def ident_map(outputs, kv):
        outputs.append(kv)

    def sum_reduce(outputs, kv):
        key, vals = kv
        outputs.append((key, sum(vals)))

    mr = ServerlessMR(spark)
    p1 = mr.source(a, "k", "v").map(ident_map).finish()
    p2 = mr.source(b, "k", "v").finish()
    mr.merge([p1, p2]).shuffle(lambda k, n: 0).reduce(
        sum_reduce, num_reducers=1
    )
    dag = mr.describe()
    json.dumps(dag)  # JSON-able, the endpoint contract
    pipes = {p["pid"]: p for p in dag["pipelines"]}
    assert pipes[p1]["has_source"] and pipes[p2]["has_source"]
    merged = [p for p in dag["pipelines"] if p["depends_on"]]
    assert len(merged) == 1
    assert merged[0]["depends_on"] == [p1, p2]
    kinds = [s["kind"] for s in merged[0]["stages"]]
    assert "reduce" in kinds
    # describing did not execute or seal anything: run() still works
    # run() returns the wire-encoded KV frame (values are JSON strings)
    import json as _json

    out = {r["key"]: _json.loads(r["value"]) for r in mr.run().collect()}
    assert out == {"k1": 4, "k2": 2}
