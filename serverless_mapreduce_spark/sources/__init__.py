"""Sources & sinks: CSV-with-DDL reader (reference E1) and write path (E4/E5).

Reference analogs:
- ``data_sources/input_handler_s3.py:51-70`` — raw text scan; schema lives in
  the Hive DDL files (``hive/Query1.q:1-9``, ``hive/Query2.q:1-16``).
- ``data_sources/output_handler_s3.py:41-53`` / ``output_handler_dynamodb.py:100-112``
  — one output object per reducer under ``{job}/{prefix}/{submit_time}/{id}``.
"""

from serverless_mapreduce_spark.sources.csv_ddl import ddl_to_schema, read_csv
from serverless_mapreduce_spark.sources.sinks import read_output, write_output

__all__ = ["ddl_to_schema", "read_csv", "read_output", "write_output"]
