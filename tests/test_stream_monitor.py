"""streaming/monitor.py: the per-micro-batch progress collector must see
every batch of a drained stateful stream — input rows summing to the
source cardinality and non-empty state metrics for the windowed agg."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from serverless_mapreduce_spark.streaming import monitor
from serverless_mapreduce_spark.streaming.stream_queries import (
    events_stream,
    run_stream_to_memory,
    stateful_session,
)


def test_collector_sees_batches_and_state(spark, sf_dir):
    ss = stateful_session(spark)
    col = monitor.attach(ss)
    try:
        ev = events_stream(ss, sf_dir).withWatermark("ts", "1 hour")
        agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
            F.count("*").alias("n")
        )
        run_stream_to_memory(agg, mode="complete")
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        # listener events are delivered asynchronously after the drain
        for _ in range(50):
            if col.total_input_rows() >= n_events:
                break
            time.sleep(0.2)
        s = col.summary()
        assert s["input_rows"] == n_events
        assert s["n_batches"] >= 1
        assert s["max_state_rows"] > 0      # the windowed agg kept state
        assert s["max_state_bytes"] > 0
        assert len(s["queries"]) == 1
    finally:
        monitor.detach(ss, col)
