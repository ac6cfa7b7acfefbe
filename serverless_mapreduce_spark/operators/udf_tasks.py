"""W13 cpu_udf_tasks: heavy per-row Python work over a relational skeleton.

The reference's tasks 9–11 (``performance_functions/task9.py:1-52`` etc.) run
recursive ``fib(duration + 6)`` / busy loops inside map/reduce callbacks to
stress UDF cost. Here the same shape is an Arrow-batched pandas UDF
(vectorized transfer, ~10-100× over row-at-a-time Python UDFs) over the same
groupBy-sum skeleton as W2.

The oracle computes fib via a recursive CTE joined on n — proving the UDF's
values, not just its row count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.registry import query

FIB_OFFSET = 6
FIB_MOD = 15  # fib input = user_id % FIB_MOD + FIB_OFFSET, bounded like the reference's duration+6


def _fib_batch(n: pd.Series) -> pd.Series:
    """Iterative fib per batch value; memoized per distinct n within the
    Arrow batch so cost is O(batch + max_n), not O(rows · n)."""
    memo: dict[int, int] = {}

    def fib(k: int) -> int:
        if k in memo:
            return memo[k]
        a, b = 0, 1
        for _ in range(k):
            a, b = b, a + b
        memo[k] = a
        return a

    return n.map(fib)


def _fib_udf():
    from pyspark.sql.types import LongType

    return pandas_udf(_fib_batch, LongType())


@query(
    "cpu_udf_fib",
    oracle=f"""
    WITH RECURSIVE fib(n, a, b) AS (
      SELECT 0, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      UNION ALL
      SELECT n + 1, b, a + b FROM fib WHERE n < {FIB_MOD + FIB_OFFSET}
    ), keyed AS (
      SELECT user_id, user_id % {FIB_MOD} + {FIB_OFFSET} AS fn, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT k.user_id, f.a AS fib_value, k.n_events
    FROM keyed k JOIN fib f ON f.n = k.fn
    """,
)
def cpu_udf_fib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """task9's shape: per-key aggregation where the key's derived value is a
    CPU-bound Python function. The UDF runs on the *aggregated* (small) side
    — compute pushed after the shuffle, so Python cost is O(groups), not
    O(rows); the reference pays it per record."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id", (F.col("user_id") % FIB_MOD + FIB_OFFSET).alias("fn"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            _fib_udf()(F.col("fn")).alias("fib_value"),
            "n_events",
        )
    )
