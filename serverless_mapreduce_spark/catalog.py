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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long (see session.py) → microsecond-precision timestamp
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view (for the SQL surface)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
