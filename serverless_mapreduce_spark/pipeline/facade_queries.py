"""Correctness-gate queries that run *through the builder facade* — proving
the compatibility layer end-to-end against the same DuckDB oracle as the
relational operators.

These mirror the reference's own end-to-end tests (word count with golden
outputs, ``tests/end_to_end_tests_2.py:32-51``; map-chain + custom partition
+ reduce, ``end_to_end_tests.py:34-54``) but checked against SQL instead of
golden S3 JSON (strictly stronger — SURVEY.md §5).
"""

from __future__ import annotations

import re
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.pipeline.builder import ServerlessMR
from serverless_mapreduce_spark.registry import query

# the reference's tokenizer (word_count_map.py:12)
_WC_RE = r"; |, |\*|\n| |:|\."


def wc_map(outputs: list, kv: tuple) -> None:
    """word_count_map.py:1-17 semantics: tokenize the value, emit (tok, 1)."""
    _, text = kv
    for tok in re.split(_WC_RE, str(text)):
        if tok:
            outputs.append((tok, 1))


def wc_reduce(outputs: list, kv: tuple) -> None:
    """word_count_reduce.py:1-14 semantics: sum the counts."""
    key, values = kv
    outputs.append((key, sum(int(v) for v in values)))


@query(
    "facade_word_count", priority=200,
    oracle=f"""
    SELECT word AS key, CAST(COUNT(*) AS VARCHAR) AS value
    FROM (
      SELECT unnest(string_split_regex(text, '{_WC_RE}')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def facade_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count executed through map→combine→reduce on the facade (the
    combiner exercises map-side pre-aggregation like useCombine)."""
    docs = table(spark, sf_dir, "documents")
    return (
        ServerlessMR(spark)
        .source(docs, key_col="doc_id", value_col="text")
        .map(wc_map)
        .combine(wc_reduce)
        .reduce(wc_reduce, num_reducers=8)
        .run()
    )


def sum_map(outputs: list, kv: tuple) -> None:
    """query_2.py:9-16 semantics: emit (sourceIP, adRevenue)."""
    key, value = kv
    outputs.append((key, float(value)))


def sum_reduce(outputs: list, kv: tuple) -> None:
    """query_2.py:21-38 semantics: stringly values, explicit casts, formatted
    emit. Accumulates in exact Decimal (Decimal(str(v)) is exact for the
    2-decimal inputs and for '%.2f'-formatted intermediates), so the result
    is order-independent and matches the oracle's DECIMAL(18,2) sum on any
    partitioning — an IEEE left-fold could flip the 2-decimal rounding on
    half-ulp boundaries at larger scale."""
    key, values = kv
    total = sum(Decimal(str(v)) for v in values)
    outputs.append((key, f"{total:.2f}"))


def ip_prefix_partition(key: str, num_bins: int) -> int:
    """A custom content-based partitioner in the reference's
    p(key, num_bins) shape (default/partition.py:4-11)."""
    return sum(ord(c) for c in str(key)[:4]) % num_bins


@query(
    "facade_groupby_sum", priority=200,
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key,
           printf('%.2f', CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)) AS value
    FROM events
    GROUP BY user_id
    """,
)
def facade_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 through the facade with a *custom* shuffle partitioner — placement
    is user-controlled (rdd.partitionBy), results are identical to the
    relational W2. Python float sums on exact 2-decimal inputs round-trip
    through '%.2f' identically to the oracle's exact decimal sum."""
    events = table(spark, sf_dir, "events")
    out = (
        ServerlessMR(spark)
        .source(events, key_col="user_id", value_col="value")
        .map(sum_map)
        .shuffle(ip_prefix_partition)
        .reduce(sum_reduce, num_reducers=8)
        .run()
    )
    # facade values are JSON-encoded; strip the quotes of the string scalar
    # so the text form matches the oracle's printf output
    return out.select("key", F.regexp_replace("value", '^"|"$', "").alias("value"))


def identity_map(outputs: list, kv: tuple) -> None:
    """user_job_6/map_3.py:1-14 semantics: pass the pair through."""
    outputs.append((kv[0], kv[1]))


@query(
    "facade_merge_union", priority=0,
    oracle="""
    WITH a AS (
      SELECT CAST(o_custkey AS VARCHAR) AS key,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS val
      FROM orders GROUP BY 1
    ), b AS (
      SELECT CAST(c_custkey AS VARCHAR) AS key,
             CAST(c_acctbal AS DECIMAL(18,2)) AS val
      FROM customer
    )
    SELECT key, printf('%.2f', CAST(SUM(val) AS DOUBLE)) AS value
    FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    GROUP BY key
    """,
)
def facade_merge_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's marquee multi-pipeline DAG (web_user_main.py:70-78):
    two pipelines pre-aggregate independently, finish(), then a third
    pipeline merge()s their concatenated outputs through identity map →
    associative combine → re-aggregate. Exercises finish/merge (E12), the
    default hash shuffle, and the bounded-memory combiner path."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")

    smr = ServerlessMR(spark)
    smr.source(orders, key_col="o_custkey", value_col="o_totalprice").map(sum_map).reduce(
        sum_reduce, num_reducers=4
    )
    p1 = smr.finish()
    smr.source(customer, key_col="c_custkey", value_col="c_acctbal").map(sum_map)
    p2 = smr.finish()
    out = (
        smr.merge([p1, p2])
        .map(identity_map)
        .combine(sum_reduce, associative=True)
        .reduce(sum_reduce, num_reducers=4)
        .run()
    )
    return out.select("key", F.regexp_replace("value", '^"|"$', "").alias("value"))


def chain_map_cast(outputs: list, kv: tuple) -> None:
    """user_job_5/map_2.py:11 semantics: cast the value to float."""
    outputs.append((kv[0], float(kv[1])))


def chain_map_fmt_strip(outputs: list, kv: tuple) -> None:
    """user_job_5/map_3.py:11 semantics: '%.2f'-format then strip the dot."""
    outputs.append((kv[0], format(float(kv[1]), ".2f").replace(".", "")))


def chain_map_take4(outputs: list, kv: tuple) -> None:
    """user_job_5/map_4.py:11 semantics: first 4 chars."""
    outputs.append((kv[0], str(kv[1])[:4]))


@query(
    "facade_map_chain", priority=0,
    oracle="""
    SELECT c_name AS key,
           substring(replace(printf('%.2f', c_acctbal), '.', ''), 1, 4) AS value
    FROM customer
    """,
)
def facade_map_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11's multi-map stage chain *through the facade* — the shape of the
    reference's own e2e test (``end_to_end_tests.py:34-54``: chained maps +
    reducers). In the reference every .map() is a separate Lambda stage with
    an S3 materialization between; here the three mapInPandas stages pipeline
    within one task with no materialization (Spark fuses narrow stages)."""
    customer = table(spark, sf_dir, "customer")
    out = (
        ServerlessMR(spark)
        .source(customer, key_col="c_name", value_col="c_acctbal")
        .map(chain_map_cast)
        .map(chain_map_fmt_strip)
        .map(chain_map_take4)
        .run()
    )
    return out.select("key", F.regexp_replace("value", '^"|"$', "").alias("value"))


@query(
    "facade_full_chain", priority=0,
    oracle="""
    SELECT c_name AS key,
           substring(replace(printf('%.2f',
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)), '.', ''), 1, 4)
             AS value
    FROM customer
    GROUP BY c_name
    """,
)
def facade_full_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full commented flagship chain (user_main.py:27-28):
    map → map → combine → shuffle → reduce → map → map in ONE pipeline —
    exercises pre-shuffle map fusion, the combiner, a custom partitioner,
    and post-reduce map stages. Each reference .map() is a separate Lambda
    stage + S3 materialization; here the whole thing is one lazy DAG with
    exactly one shuffle (the custom-partitioned reduce)."""
    customer = table(spark, sf_dir, "customer")
    out = (
        ServerlessMR(spark)
        .source(customer, key_col="c_name", value_col="c_acctbal")
        .map(identity_map)
        .map(chain_map_cast)
        .combine(sum_reduce, associative=True)
        .shuffle(ip_prefix_partition)
        .reduce(sum_reduce, num_reducers=4)
        .map(chain_map_fmt_strip)
        .map(chain_map_take4)
        .run()
    )
    return out.select("key", F.regexp_replace("value", '^"|"$', "").alias("value"))
