#!/usr/bin/env python3
"""Profile the per-component cost of a snapshotstream drain (guide §1 /
§4 — the Python boundary): how much of a scenario drain is (a) the
``.load()`` schema-inference worker spawn, (b) the ``start()`` streaming
reader-runner spawn, (c) the micro-batch itself, and whether reusing the
streaming DataFrame across drains (one load, N starts) saves a spawn.

Usage: python tools/profile_stream_floor.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from serverless_mapreduce_spark.session import get_spark
    from serverless_mapreduce_spark.sources.snapshot_stream import read_stream
    from serverless_mapreduce_spark.sources.snapshots import SnapshotTable

    spark = get_spark(app_name="profile-stream-floor")
    root = os.path.join(REPO, ".scratch", "profile_floor")
    shutil.rmtree(root, ignore_errors=True)
    base = os.path.join(root, "tbl")
    t = SnapshotTable(base)
    t.commit(spark.createDataFrame([(1,)], "k bigint"))

    def tt(label, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)
        return r

    def drain(df, ckpt):
        (
            df.writeStream.foreachBatch(lambda b, i: b.count())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # session warm-up: one full load+drain so JVM/codegen costs are out
    warm_ck = os.path.join(root, "warm_ck")
    tt("WARM load+drain", lambda: drain(read_stream(spark, base), warm_ck))

    for rep in range(2):
        ck = os.path.join(root, f"ck{rep}")
        sdf = tt(f"[{rep}] load (schema worker)", lambda: read_stream(spark, base))
        tt(f"[{rep}] drain1 (start+await, fresh ckpt)", lambda: drain(sdf, ck))
        tt(f"[{rep}] drain2 SAME df SAME ckpt (no new data)", lambda: drain(sdf, ck))
        t.commit(spark.createDataFrame([(2,)], "k bigint"))
        tt(f"[{rep}] drain3 SAME df SAME ckpt (1 new version)", lambda: drain(sdf, ck))
        sdf2 = tt(f"[{rep}] re-load (schema worker again)", lambda: read_stream(spark, base))
        tt(f"[{rep}] drain4 FRESH df SAME ckpt (no new data)", lambda: drain(sdf2, ck))

    # JVM file-source floor for comparison (memory-sink family)
    ev = (
        spark.readStream.schema("k bigint")
        .parquet(os.path.join(root, "filesrc"))
    )
    os.makedirs(os.path.join(root, "filesrc"), exist_ok=True)
    spark.createDataFrame([(1,)], "k bigint").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "filesrc"))
    fck = os.path.join(root, "fck")
    tt("file-source drain1 (JVM source, foreachBatch)", lambda: drain(ev, fck))
    tt("file-source drain2 (no new data)", lambda: drain(ev, fck))

    # memory-sink drain floor
    def mem_drain(df, name):
        (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    tt("file-source memory-sink drain", lambda: mem_drain(ev, "prof_mem1"))


if __name__ == "__main__":
    main()
