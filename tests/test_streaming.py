"""Streaming semantics tests: append-mode watermark finalization, state
recovery across runs, and late-data drop — the state-bounding behavior the
registered (complete-mode) queries declare but can't show in one bounded run."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DDL = "user_id BIGINT, ts TIMESTAMP"


def _write(path: str, rows: list[tuple[int, str]], mtime: float) -> None:
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    # micro precision: the shared session sets nanosAsLong, which would turn
    # a TIMESTAMP(NANOS) column into bigint and break the TIMESTAMP schema
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    os.utime(path, (mtime, mtime))


def _run_available_now(spark, src, ckpt, sink_name):
    # foreachBatch (not the memory sink): it supports checkpoint recovery,
    # which run 2 depends on
    emitted: list = []

    def collect_batch(batch_df, _bid):
        emitted.extend(batch_df.collect())

    stream = spark.readStream.schema(StructType.fromDDL(DDL)).parquet(str(src))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.foreachBatch(collect_batch)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # collect() renders timestamps as naive PROCESS-local datetimes; re-express
    # as the UTC wall value the fixture wrote so the assert is TZ-independent.
    import datetime as _dt

    def _utc(d):
        return d.astimezone(_dt.timezone.utc).replace(tzinfo=None)

    return {_utc(r.win_start).strftime("%H:%M"): r.n for r in emitted}


def test_append_watermark_finalization_recovery_and_late_drop(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    now = time.time()

    # Run 1: three early events + a 05:00 event that advances the final
    # watermark to 04:00 → windows [00:00) and [01:00) finalize and emit;
    # [05:00) stays in state (checkpointed).
    _write(
        str(src / "f1.parquet"),
        [
            (1, "2024-01-01 00:05:00"),
            (1, "2024-01-01 00:15:00"),
            (1, "2024-01-01 01:10:00"),
            (1, "2024-01-01 05:00:00"),
        ],
        now - 10,
    )
    got1 = _run_available_now(spark, src, ckpt, "wm_run1")
    assert got1 == {"00:00": 2, "01:00": 1}, got1

    # Run 2 (same checkpoint): a LATE event at 00:30 — below the recovered
    # 04:00 watermark — plus 05:30 and 07:00. The late row must be dropped:
    # if it were accepted it would re-open the already-evicted [00:00)
    # window and a spurious [00:00):1 row would appear. 05:30 joins the
    # recovered [05:00) state (proving recovery: count 2, not 1); the final
    # watermark (06:00) finalizes it; [07:00) stays withheld.
    _write(
        str(src / "f2.parquet"),
        [
            (1, "2024-01-01 00:30:00"),
            (1, "2024-01-01 05:30:00"),
            (1, "2024-01-01 07:00:00"),
        ],
        now - 5,
    )
    got2 = _run_available_now(spark, src, ckpt, "wm_run2")
    assert got2 == {"05:00": 2}, got2
