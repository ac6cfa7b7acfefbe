"""Query registry: names each operator program and pairs it with its DuckDB
oracle SQL.

Each operator module registers its queries with the ``@query`` decorator;
``__spark_entry__.py`` exposes the merged registry to the driver's
correctness harness (SURVEY.md §5: DuckDB oracle replaces the reference's
golden-S3-JSON end-to-end assertions).

Cross-engine determinism contract (why oracles can hash-match exactly):
- float aggregates go through ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS
  DOUBLE)`` — decimal sums are exact and order-independent, so Spark and
  DuckDB produce bit-identical doubles regardless of partitioning;
- derived floats (ratios, cosines) are rounded to a fixed scale well above
  their accumulated error;
- hashes use md5 hex strings (identical built-in in both engines), never the
  engines' internal (different) hash functions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``; ``oracle``
    is the equivalent DuckDB SQL (None → driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


def _ensure_loaded() -> None:
    """Import every operator module for its registration side effects."""
    from serverless_mapreduce_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        multimodal,
        relational,
        similarity,
        text,
        training_pipeline,
        udf_tasks,
    )
    from serverless_mapreduce_spark.pipeline import facade_queries  # noqa: F401
    from serverless_mapreduce_spark.sources import source_queries  # noqa: F401
    from serverless_mapreduce_spark.streaming import stream_queries  # noqa: F401


# SQL fragment helpers shared by oracle strings -------------------------------

def dsum_sql(col: str, alias: str) -> str:
    """Order-independent double sum (see module docstring)."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"
