"""Genuinely-external typed KV source/sink over JDBC (embedded Derby).

Parity target: the reference's one *typed* external store is DynamoDB —
a keyed table scanned item-by-item with SERVER-SIDE column projection
(``ProjectionExpression``, ``data_sources/input_handler_dynamodb.py:135-213``)
and written back ``put_item``-per-pair by the output handler
(``data_sources/output_handler_dynamodb.py:100-112``). The engine's
``dynamo_typed_extract`` reproduces those *semantics* on parquet; this module
adds the part prior rounds only documented as missing: a real external
round-trip through a database that is NOT the fixture filesystem, using
Spark's built-in JDBC relation (Derby runs embedded in the JVM — the only
database actually present in this environment; the code path is identical
for any server-ful JDBC store).

Why this is the honest 100 TB shape:
- The READ is partition-parallel: ``partitionColumn/lowerBound/upperBound/
  numPartitions`` splits the key range into independent range-predicate
  queries, one per task — Spark's JDBC analog of scanning DynamoDB segments
  in parallel.
- Column pruning and filters PUSH INTO THE STORE: the generated SQL selects
  only referenced columns (ProjectionExpression parity) and ships the
  predicate server-side (plan shows PushedFilters, asserted in
  tests/test_jdbc_kv.py) — the data that never leaves the store is the whole
  point of a KV source.
- The WRITE batches inserts per partition (``put_item`` parity without the
  1-row-per-call overhead the reference pays).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.paths import scratch, sf_tag
from serverless_mapreduce_spark.registry import query

JDBC_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

#: Columns round-tripped through the store (the reference's
#: inputColumnsDynamoDB list); event_id is the partition/primary key.
KV_COLUMNS = ("event_id", "user_id", "event_type", "value")


def _jdbc_url(sf_dir: str) -> str:
    base = scratch("jdbc")
    os.makedirs(base, exist_ok=True)
    return f"jdbc:derby:{base}/kv_{sf_tag(sf_dir)};create=true"


def _props() -> dict[str, str]:
    return {"driver": JDBC_DRIVER}


def write_events_kv(spark: SparkSession, sf_dir: str) -> str:
    """Load the events projection into the external store (idempotent
    overwrite). Returns the JDBC url. Derby's log goes to the scratch dir,
    not the caller's cwd."""
    jvm = spark.sparkContext._jvm  # type: ignore[attr-defined]
    jvm.System.setProperty("derby.system.home", scratch("jdbc"))
    url = _jdbc_url(sf_dir)
    df = table(spark, sf_dir, "events").select(*KV_COLUMNS)
    # A handful of write partitions: embedded Derby serializes page writes
    # anyway; a server-ful store would take the full write parallelism.
    (
        df.coalesce(4)
        .write.mode("overwrite")
        .options(**_props())
        # Derby maps StringType to CLOB by default, which can't be compared
        # or filtered; pin a comparable VARCHAR (the typed-column DDL the
        # reference declares in inputColumnsDynamoDB).
        .option("createTableColumnTypes", "event_type VARCHAR(64)")
        .jdbc(url, "events_kv")
    )
    return url


def read_events_kv(
    spark: SparkSession, url: str, num_partitions: int = 8
) -> DataFrame:
    """Partition-parallel typed read: the key range splits into
    ``num_partitions`` independent server-side range scans."""
    # Spark's JDBC writer passes the TABLE name through unquoted (Derby
    # stores it upcased) but CREATEs the COLUMNS quoted lowercase — so a
    # hand-written probe must reference the table unquoted and the columns
    # quoted, or Derby misses one or the other.
    bounds = spark.read.options(**_props()).jdbc(
        url,
        '(SELECT MIN("event_id") lo, MAX("event_id") hi FROM events_kv) b',
    ).collect()[0]
    return spark.read.options(**_props()).jdbc(
        url,
        "events_kv",
        column="event_id",
        lowerBound=int(bounds["LO"]),
        upperBound=int(bounds["HI"]) + 1,
        numPartitions=num_partitions,
    )


@query(
    "kv_jdbc_roundtrip",
    priority=0,
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY event_type
    """,
)
def kv_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E5 through a REAL external store: events load into Derby over
    JDBC, then the query reads back ONLY (event_type, value) with the
    event_type filter pushed into the store (PushedFilters — the
    ProjectionExpression parity check), partition-parallel on the key
    range, and aggregates. The oracle never sees the store — matching it
    proves the round-trip was lossless."""
    url = write_events_kv(spark, sf_dir)
    back = read_events_kv(spark, url)
    return (
        back.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
