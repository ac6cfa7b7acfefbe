#!/usr/bin/env python3
"""Per-query Spark JOB-COUNT probe (guide §1: measure first): run named
registered queries through the bench's noop-sink methodology inside a
job group and report wall seconds + how many Spark jobs the query
scheduled. Driver round-trips (one per job) are a fixed per-job cost
that multiplies across scenario queries (snapshot DML, iterative graph
loops), so "fewer jobs, same result" is a measurable optimization axis
alongside the plan shape.

Usage:
    python tools/job_probe.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    from serverless_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="job-probe")
    sc = spark.sparkContext
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # session warm-up (mirrors bench.py): JVM/codegen + page cache
    queries["q1_filter_scan"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for i, name in enumerate(names):
        group = f"probe-{i}-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"{name}: {dt:.3f}s  jobs={len(jobs)}")


if __name__ == "__main__":
    main()
