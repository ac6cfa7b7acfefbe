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


def test_events_stream_branches_on_nanos_encoding(spark, tmp_path):
    """The fixture generator has shipped events.ts as TIMESTAMP(NANOS) in
    some rounds and TIMESTAMP(MICROS, not-UTC-adjusted) in others;
    events_stream probes the footer and binds the matching stream schema,
    so BOTH encodings drain to identical NTZ wall-clock values."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from serverless_mapreduce_spark.streaming.stream_queries import (
        events_stream,
        run_stream_to_memory,
    )

    wall = ["2024-01-01 00:05:00", "2024-01-01 02:15:00"]
    base = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(wall),
            "user_id": [10, 20],
            "event_type": ["view", "click"],
            "value": [1.5, 2.5],
            "props": ["{}", "{}"],
        }
    )
    for enc, unit in (("nanos", "ns"), ("micros", "us")):
        d = tmp_path / enc
        d.mkdir()
        tbl = pa.Table.from_pandas(base, preserve_index=False)
        ts_type = pa.timestamp(unit)  # tz-naive: isAdjustedToUTC=false
        tbl = tbl.set_column(
            tbl.schema.get_field_index("ts"),
            "ts",
            tbl.column("ts").cast(ts_type),
        )
        pq.write_table(tbl, d / "events.parquet", store_schema=False)
        ev = events_stream(spark, str(d))
        got = {
            (r["event_id"], str(r["ts"]))
            for r in run_stream_to_memory(
                ev.select("event_id", "ts"), mode="append"
            ).collect()
        }
        assert got == {(1, "2024-01-01 00:05:00"), (2, "2024-01-01 02:15:00")}, (
            enc,
            got,
        )
