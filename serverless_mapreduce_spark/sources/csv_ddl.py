"""CSV source with explicit Hive-DDL schema (engine operator E1).

The reference's primary input is raw CSV text in S3: mappers receive whole
objects as strings and hand-parse fields (``input_handler_s3.py:66-70``,
``performance_functions/query_1.py:9-17``), while the *actual* schema lives
out-of-band in Hive DDL (``hive/Query1.q:1-9``, ``hive/Query2.q:1-16``).
Here the DDL is promoted to a first-class StructType so the scan is typed,
columnar-prunable, and filter-pushable from the start — at 100 TB the
difference between "read every byte into Python strings" and a schema'd
reader with column pruning is the whole game.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# The reference's two published table DDLs (hive/Query1.q:1-9, Query2.q:1-16),
# re-expressed as plain column DDL for users who want the Amplab layout.
RANKINGS_DDL = "pageURL STRING, pageRank INT, avgDuration INT"
USERVISITS_DDL = (
    "sourceIP STRING, destURL STRING, visitDate STRING, adRevenue DOUBLE, "
    "userAgent STRING, countryCode STRING, languageCode STRING, "
    "searchWord STRING, duration INT"
)

_CREATE_TABLE_RE = re.compile(
    r"CREATE\s+(?:EXTERNAL\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?\S+\s*\((?P<cols>.*?)\)",
    re.IGNORECASE | re.DOTALL,
)


def ddl_to_schema(ddl: str) -> StructType:
    """Hive DDL → StructType.

    Accepts either a full ``CREATE [EXTERNAL] TABLE`` statement (the shape of
    ``hive/Query1.q``) or a bare column list (``"a STRING, b INT"``). Hive's
    primitive type names (STRING/INT/DOUBLE/…) are valid Spark DDL, so the
    column block parses directly via ``StructType.fromDDL``.
    """
    m = _CREATE_TABLE_RE.search(ddl)
    cols = m.group("cols") if m else ddl
    return StructType.fromDDL(cols)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    sep: str = ",",
    header: bool = False,
    **options: str,
) -> DataFrame:
    """Typed CSV scan: the Spark-native version of the reference's
    read-object-then-split mappers (``FIELDS TERMINATED BY ','`` per
    ``hive/Query1.q:7``). FAILFAST so schema drift surfaces at read time
    instead of as silent nulls deep in a 1000-executor job."""
    if isinstance(schema, str):
        schema = ddl_to_schema(schema)
    return (
        spark.read.schema(schema)
        .options(sep=sep, header=str(header).lower(), mode="FAILFAST", **options)
        .csv(path)
    )
