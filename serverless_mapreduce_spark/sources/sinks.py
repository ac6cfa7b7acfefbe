"""Write path (engine operators E4/E5).

The reference persists every job's result — one S3 JSON object per reducer
under ``{job}/{prefix}/{submission_time}/{reducer_id}``
(``output_handler_s3.py:41-53``) or one DynamoDB item per output pair
(``output_handler_dynamodb.py:100-112``). The Spark-native mapping:

- "one object per reducer" → output file count == DataFrame partition count,
  controlled here via ``num_partitions`` (the reference's reducer count);
- format parity: ``json`` for the S3 handler's JSON bodies, ``parquet`` as
  the engine default (columnar, splittable, statistics for pushdown —
  what you actually want at 100 TB), ``csv`` for text interchange;
- ``partition_by`` adds hive-style directory partitioning, the scalable
  replacement for the reference's per-key DynamoDB placement: downstream
  readers get partition pruning instead of point lookups.

Writers never collect: the write is executed by the tasks that own each
partition, exactly like the reference's reducers writing their own output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "json", "csv", "orc")


def write_output(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    num_partitions: int | None = None,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> str:
    """Persist ``df`` under ``path``; returns ``path`` for chaining.

    ``num_partitions`` mirrors the reference's per-stage reducer count
    (``main.py:155``): it bounds both write parallelism and output file
    count. Use ``coalesce``-style small values only for small results — for
    large outputs leave it None and let AQE pick the partitioning.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {_FORMATS}")
    out = df.repartition(num_partitions) if num_partitions else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "false")
    getattr(writer, fmt)(path)
    return path


def read_output(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    """Read back a ``write_output`` result. JSON/CSV require the explicit
    schema (schema inference is a full extra pass — never at scale)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt not in ("parquet", "orc"):  # self-describing columnar footers
        raise ValueError(f"{fmt} read-back requires an explicit schema")
    return getattr(reader, fmt)(path)
