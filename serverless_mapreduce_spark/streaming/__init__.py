"""Structured-Streaming analogs of the aggregation workloads (SURVEY §7.2
step 7 — extension scope; the reference has no streaming surface at all).

``stream_queries`` registers windowed/streamed variants of W2/W9 over the
``events``/``documents`` fixtures, run to completion with
``trigger(availableNow=True)`` into a memory sink so the driver's batch
oracle can check them.
"""

from serverless_mapreduce_spark.streaming.stream_queries import (
    events_stream,
    run_stream_to_memory,
)

__all__ = ["events_stream", "run_stream_to_memory"]
