"""Table catalog over the parquet fixtures.

The reference enumerates raw S3 objects and leaves schema to user map code +
Hive DDL (``data_sources/input_handler_s3.py:51-70``, ``hive/Query1.q``).
Here schema is first-class: tables are parquet with embedded schema, loaded
once per (sf_dir, table) and registered as temp views so both the DataFrame
and SQL surfaces see them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Columnar scan → Catalyst prunes columns and
    pushes predicates into the parquet reader (check via PushedFilters /
    ReadSchema in .explain)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # parquet reader rejects outright. nanosAsLong is a runtime-settable
        # SQL conf, so set it here rather than only in our session factory —
        # callers (the driver's harness included) bring their own session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # nanos → micros with *integer* division: epoch-nanos (~1.7e18)
        # exceed double's 53-bit mantissa, so `/ 1000` via IEEE double would
        # corrupt the microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ensure_parallelism(spark: SparkSession, df: DataFrame, *keys: str) -> DataFrame:
    """Restore scan parallelism for CPU-heavy narrow pipelines.

    Parquet scans split at row-group granularity; the small fixture files are
    single-row-group, so a scan yields ONE partition and every per-row
    expression downstream (shingling, minhash, LSH bits) runs on one core —
    and AQE then coalesces the tiny shuffles back to 1 partition too.

    With ``keys``, this hoists the exchange the downstream aggregation/join
    would perform anyway: ``repartition(n, keys)`` moves the hash shuffle
    *before* the expensive projection, so compute parallelizes and the later
    ``groupBy(keys)`` reuses the partitioning (no second exchange). With an
    explicit partition count, AQE does not re-coalesce it. Without ``keys``
    it round-robins, which adds one shuffle of the *raw* (pre-explosion)
    rows — cheapest possible placement.

    Gated: a no-op whenever the scan already splits (≥ half the cores), which
    is always true on real multi-row-group data at scale — so plans at 100 TB
    are unchanged while single-file fixtures use the whole machine."""
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, n // 2):
        return df
    from pyspark.sql import functions as F

    return df.repartition(n, *[F.col(k) for k in keys]) if keys else df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view (for the SQL surface)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
