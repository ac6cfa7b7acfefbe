"""foreachBatch upsert sink: multi-batch convergence and version history."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import StructType

from serverless_mapreduce_spark.sources.snapshots import SnapshotTable
from serverless_mapreduce_spark.streaming.upsert_sink import (
    upsert_stream_to_snapshot,
)

DDL = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"


def _write_chunk(spark, path, rows):
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(path)


def test_multi_batch_upsert_converges(spark, tmp_path):
    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1)

    # three files → three micro-batches under maxFilesPerTrigger=1; user 1's
    # state is overwritten twice, user 2 ties on ts (event_id must break it)
    _write_chunk(spark, src, [(1, t0, 1, "a", 1.0), (2, t0, 2, "a", 2.0)])
    _write_chunk(
        spark, src,
        [(3, t0 + dt.timedelta(hours=1), 1, "b", 3.0), (4, t0, 2, "b", 4.0)],
    )
    _write_chunk(
        spark, src, [(5, t0 + dt.timedelta(hours=2), 1, "c", 5.0)]
    )

    events = (
        spark.readStream.schema(StructType.fromDDL(DDL))
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t = upsert_stream_to_snapshot(events, str(tmp_path / "tbl"))

    # one version per non-empty batch
    assert len(t.versions()) == 3
    final = {
        r.user_id: (r.last_event_id, r.last_type, r.last_value)
        for r in t.read(spark).collect()
    }
    assert final[1] == (5, "c", 5.0)
    # same ts for user 2 → higher event_id wins
    assert final[2] == (4, "b", 4.0)

    # time travel: after batch 1 only the first chunk's state existed
    v1 = {r.user_id: r.last_event_id for r in t.read(spark, 1).collect()}
    assert v1 == {1: 1, 2: 2}
