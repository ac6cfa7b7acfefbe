"""serverless_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
hanglili/Serverless-MapReduce (a Lambda+S3 MapReduce framework) on top of
Apache Spark DataFrames. The reference's physical machinery (S3 shuffle,
coordinator Lambdas, DynamoDB barriers) is replaced wholesale by Spark's
scheduler/shuffle/Catalyst; what this package provides is:

- ``operators``: every workload query the reference ships (SURVEY.md §2.2
  W1–W14) re-expressed as declarative DataFrame programs, plus the
  LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal plumbing).
- ``pipeline``: a fluent ``map/combine/shuffle/reduce`` builder facade with
  the reference's user-callback contract, executed via Arrow-batched
  ``applyInPandas`` / ``mapInPandas``.
- ``sources``/``catalog``: schema-first readers over the test parquet/CSV
  fixtures (the reference keeps schema in user code + Hive DDL; here it is
  first-class ``StructType``).
- ``streaming``: Structured-Streaming analogs of the aggregation workloads.
"""

from serverless_mapreduce_spark.session import get_spark
from serverless_mapreduce_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
__version__ = "0.2.0"
