"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are populated from the operator registry
(serverless_mapreduce_spark.registry): every operator module registers its
named query together with the DuckDB oracle SQL that proves it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_mapreduce_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full q3 pipeline
    (date filter → join → group avg/sum → global top-1) — the reference's
    marquee 3-pipeline Amplab benchmark query as one Catalyst plan."""
    from serverless_mapreduce_spark.operators.relational import q3_top1

    return q3_top1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (same column names/aliases both sides)."""
    return registry.all_oracles()
