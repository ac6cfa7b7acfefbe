"""Full-registry driver-simulation preflight.

Runs every registered query on a VANILLA local SparkSession (no engine
session-factory confs — mirroring the driver's harness) against the DuckDB
oracle at sf0.01, using the same order-insensitive value comparison as
tests/oracle.py. Prints one line per query and a final summary; exit code 1
on any mismatch.

Usage: python tools/preflight.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("preflight")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from oracle import assert_matches_oracle

    qs = entry.queries()
    orc = entry.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if any(s in k for s in only)}

    failures: list[str] = []
    t_all = time.time()
    for i, (name, fn) in enumerate(qs.items(), 1):
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = assert_matches_oracle(df, orc[name], sf_dir)
            print(f"[{i}/{len(qs)}] OK   {name}: {n} rows {time.time()-t0:.2f}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — report every failure
            failures.append(name)
            print(f"[{i}/{len(qs)}] FAIL {name}: {exc}", flush=True)
            traceback.print_exc()

    print(
        f"\npreflight: {len(qs) - len(failures)}/{len(qs)} green "
        f"in {time.time()-t_all:.1f}s sf_dir={sf_dir}",
        flush=True,
    )
    if failures:
        print("failures:", failures, flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
