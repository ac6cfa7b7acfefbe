#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for named registered queries into
``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
files (the judge reads plan claims against these).

Usage:
    python tools/plan_dump.py <tag> <suffix> <query> [<query> ...]

e.g. ``python tools/plan_dump.py r17 before graph_components tpch_q2``.

Note: building a query's DataFrame EXECUTES any scenario side effects
(snapshot commits, stream drains) — the dump costs roughly one bench run
of the named lines, so name only the queries being evidenced.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    from serverless_mapreduce_spark.session import get_spark

    spark = get_spark(app_name=f"plan-dump-{tag}")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
