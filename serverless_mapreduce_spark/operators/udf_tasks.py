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
    "cpu_udf_fib", priority=200,
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


# --- task10 analog: URL count with reducer-side Python compute ---------------

@query(
    "cpu_udf_url_magic",
    oracle=f"""
    WITH RECURSIVE fib(n, a, b) AS (
      SELECT 0, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      UNION ALL
      SELECT n + 1, b, a + b FROM fib WHERE n < 14
    ), urls AS (
      SELECT url, COUNT(*) AS cnt
      FROM (
        SELECT unnest(regexp_extract_all(
                 text || ' see http://' || source || '.example.com/' || CAST(doc_id % 7 AS VARCHAR),
                 'https?://[^\\s]+')) AS url
        FROM documents
      )
      GROUP BY url
    )
    SELECT u.url, u.cnt, f.a AS magic
    FROM urls u JOIN fib f ON f.n = u.cnt % 10 + 5
    """,
)
def cpu_udf_url_magic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """task10's shape (``performance_functions/task10.py:1-62``): the W10
    URL-in-link count where both map and reduce burn CPU in Python. The
    reference busy-loops 10k iterations per URL; here the Python work is the
    reducer-side ``fib`` magic value (task9's reducer trick,
    ``task9.py:40-48``) run as an Arrow-batched pandas UDF *after* the
    count aggregation — Python cost is O(distinct URLs), while the per-row
    extract/explode/count stays JVM-side."""
    from serverless_mapreduce_spark.operators.text import URL_RE

    docs = table(spark, sf_dir, "documents").withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.lit(" see http://"),
            F.col("source"),
            F.lit(".example.com/"),
            (F.col("doc_id") % 7).cast("string"),
        ),
    )
    counts = (
        docs.select(F.explode(F.regexp_extract_all("text2", F.lit(URL_RE), 0)).alias("url"))
        .groupBy("url")
        .agg(F.count("*").alias("cnt"))
    )
    return counts.select(
        "url",
        "cnt",
        _fib_udf()((F.col("cnt") % 10 + 5).cast("int")).alias("magic"),
    )


# --- task11 analog: prefix-keyed revenue sum with Python post-compute --------

COLLATZ_MOD = 97


def _collatz_batch(seed: pd.Series) -> pd.Series:
    """Collatz step count per seed — genuinely iterative Python work (no
    closed form), the engine's stand-in for the reference's busy loops."""

    def steps(n: int) -> int:
        n = int(n)
        s = 0
        while n > 1:
            n = n // 2 if n % 2 == 0 else 3 * n + 1
            s += 1
        return s

    return seed.map(steps)


def _collatz_udf():
    from pyspark.sql.types import LongType

    return pandas_udf(_collatz_batch, LongType())


@query(
    "cpu_udf_collatz_revenue",
    oracle=f"""
    WITH RECURSIVE keyed AS (
      SELECT substring(c_name, 1, 16) AS name_prefix,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM customer
      GROUP BY 1
    ), seeds AS (
      SELECT name_prefix, cents, abs(cents) % {COLLATZ_MOD} + 2 AS seed FROM keyed
    ), collatz(name_prefix, cur, steps) AS (
      SELECT name_prefix, seed, 0 FROM seeds
      UNION ALL
      SELECT name_prefix,
             CASE WHEN cur % 2 = 0 THEN cur // 2 ELSE 3 * cur + 1 END,
             steps + 1
      FROM collatz WHERE cur > 1
    )
    SELECT s.name_prefix,
           CAST(s.cents AS DOUBLE) / 100 AS sum_acctbal,
           c.steps AS collatz_steps
    FROM seeds s
    JOIN (SELECT name_prefix, MAX(steps) AS steps FROM collatz GROUP BY 1) c
      USING (name_prefix)
    """,
)
def cpu_udf_collatz_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """task11's shape (``performance_functions/task11.py:1-45``): substring
    prefix key → float revenue sum, with CPU burned in Python on both sides.
    The reference busy-loops 2.5k/100k iterations; here the reduce-side
    Python work is a Collatz step count seeded from the *exact* cents of the
    group's sum — iterative, value-bearing (oracle-checkable via a recursive
    CTE), and run on the aggregated side so Python cost is O(groups). The
    sum itself is exact decimal arithmetic JVM-side; the seed uses abs() so
    Spark/DuckDB/Python agree on the modulo of negative balances."""
    cents = (
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")) * 100
    ).cast("long")
    agg = (
        table(spark, sf_dir, "customer")
        .groupBy(F.substring("c_name", 1, 16).alias("name_prefix"))
        .agg(cents.alias("cents"))
    )
    seed = (F.abs(F.col("cents")) % COLLATZ_MOD + 2).cast("long")
    return agg.select(
        "name_prefix",
        (F.col("cents").cast("double") / 100).alias("sum_acctbal"),
        _collatz_udf()(seed).alias("collatz_steps"),
    )
