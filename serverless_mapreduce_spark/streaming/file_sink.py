"""Production streaming sinks: checkpointed parquet, resumable.

The memory sink the registered stream queries drain into is harness-only:
it collects to the driver and cannot resume from a checkpoint. Production
streams write files. Two shapes, both checkpointed so a killed run resumes
from recorded offsets instead of reprocessing:

- **append + file sink** (stateless or watermark-finalized streams): the
  built-in parquet sink commits each batch to a ``_spark_metadata`` log —
  exactly-once per batch, so a resume adds only unseen input files.
- **complete + foreachBatch overwrite** (running aggregates): each batch
  rewrites the full result from the operator state; the state itself lives
  in the checkpoint, so a resumed run restores counts from *already
  consumed* input and converges to the batch answer over everything seen.

tests/test_streaming_resume.py kills and resumes both shapes and checks
convergence against the batch oracle; the registered ``stream_file_sink``
query runs the complete-mode shape end-to-end (write → read back) so the
production sink has its own driver-checked CORRECTNESS row.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_mapreduce_spark.registry import query
from serverless_mapreduce_spark.session import utc_session
from serverless_mapreduce_spark.streaming.stream_queries import (
    WATERMARK,
    events_stream,
)


def run_stream_to_parquet(
    sdf: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    mode: str = "append",
) -> None:
    """Drain the bounded stream into parquet with a checkpoint. ``append``
    uses the built-in file sink (exactly-once batch commits); ``complete``
    rewrites ``out_dir`` per batch from full operator state."""
    if mode == "complete":

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(out_dir)

        q = (
            sdf.writeStream.foreachBatch(write_batch)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    else:
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()


def _scratch(sf_dir: str, *parts: str) -> str:
    from serverless_mapreduce_spark.paths import scratch, sf_tag

    return scratch("filesink", sf_tag(sf_dir), *parts)


@query(
    "stream_file_sink",
    priority=0,
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS win_start,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_windowed_sum through the PRODUCTION sink: complete-mode
    windowed aggregation checkpointed to disk, each batch overwriting the
    parquet result, then read back. Fresh dirs per invocation keep the
    driver run deterministic; the resume semantics are exercised by
    tests/test_streaming_resume.py."""
    out, ckpt = _scratch(sf_dir, "out"), _scratch(sf_dir, "ckpt")
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    # One UTC-pinned clone for the WHOLE query: the sink writes win_start as
    # an instant, so the read-back below must render it under the same
    # session timezone the stream aggregated in.
    spark = utc_session(spark)
    ev = events_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "sum_value",
            "n_events",
        )
    )
    run_stream_to_parquet(agg, out, ckpt, mode="complete")
    return spark.read.parquet(out)
