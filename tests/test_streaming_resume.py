"""Checkpoint/resume semantics of the production parquet sinks
(streaming/file_sink.py): a stream stopped after consuming part of its
input and restarted over the same checkpoint must (a) not duplicate
already-committed rows and (b) converge to the batch answer over all input.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from serverless_mapreduce_spark.streaming.file_sink import run_stream_to_parquet

DDL = "k BIGINT, v BIGINT"


def _add_source_file(spark, src_dir: str, rows: list[tuple[int, int]], name: str) -> None:
    """Materialize one parquet file into the monitored source directory."""
    tmp = os.path.join(src_dir, f"_tmp_{name}")
    spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.rename(part, os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


@pytest.fixture
def dirs(tmp_path):
    d = {n: str(tmp_path / n) for n in ("src", "out", "ckpt")}
    os.makedirs(d["src"])
    return d


def _stream(spark, src_dir: str):
    return spark.readStream.schema(DDL).parquet(src_dir)


def test_append_sink_resumes_without_duplicates(spark, dirs):
    _add_source_file(spark, dirs["src"], [(1, 10), (2, 20)], "a")
    proj = _stream(spark, dirs["src"]).withColumn("v2", F.col("v") * 2)
    run_stream_to_parquet(proj, dirs["out"], dirs["ckpt"])
    assert spark.read.parquet(dirs["out"]).count() == 2

    # "Crash" happened between runs; new files arrive; resume over the same
    # checkpoint must pick up ONLY the unseen file.
    _add_source_file(spark, dirs["src"], [(3, 30)], "b")
    proj2 = _stream(spark, dirs["src"]).withColumn("v2", F.col("v") * 2)
    run_stream_to_parquet(proj2, dirs["out"], dirs["ckpt"])

    got = {(r.k, r.v, r.v2) for r in spark.read.parquet(dirs["out"]).collect()}
    assert got == {(1, 10, 20), (2, 20, 40), (3, 30, 60)}  # no duplicates


def test_complete_sink_restores_state_across_restart(spark, dirs):
    _add_source_file(spark, dirs["src"], [(1, 10), (1, 5), (2, 20)], "a")

    def agg(sdf):
        return sdf.groupBy("k").agg(F.sum("v").alias("sum_v"), F.count("*").alias("n"))

    run_stream_to_parquet(agg(_stream(spark, dirs["src"])), dirs["out"], dirs["ckpt"], mode="complete")
    # Second run sees only file b — key 1's total must still include file
    # a's contribution (state restored from the checkpoint) and key 2 must
    # survive even though no new row mentions it.
    _add_source_file(spark, dirs["src"], [(1, 1), (3, 7)], "b")
    run_stream_to_parquet(agg(_stream(spark, dirs["src"])), dirs["out"], dirs["ckpt"], mode="complete")

    got = {(r.k, r.sum_v, r.n) for r in spark.read.parquet(dirs["out"]).collect()}
    assert got == {(1, 16, 3), (2, 20, 1), (3, 7, 1)}
