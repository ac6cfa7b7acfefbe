#!/usr/bin/env python3
"""Per-query wall seconds at sf1 under the CURRENT core count (guide
§1 + r17 verdict item 6: sf0.1 is scheduling-bound, so parallel-scaling
evidence must come from sf1). Runs each named query twice through the
bench's noop-sink methodology and reports cold + steady seconds as one
JSON line per query; a wrapper invokes this once per SPARK_GRAFT_CPUS
value and composes the c8/c32 ratio table.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/sf1_scaling.py <query> [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SF1_DIR", os.path.join(REPO, ".sf1"))
    from serverless_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="sf1-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # session warm-up: one documents scan pays the Python-worker wave
    from serverless_mapreduce_spark.catalog import table

    table(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    for name in names:
        spark.sparkContext.setJobDescription(f"sf1-{cpus}c-{name}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        steady = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "query": name,
                    "cpus": cpus,
                    "cold_sec": round(cold, 3),
                    "steady_sec": round(steady, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
