from serverless_mapreduce_spark.pipeline.builder import ServerlessMR, kv_dataframe
from serverless_mapreduce_spark.pipeline import facade_queries  # noqa: F401

__all__ = ["ServerlessMR", "kv_dataframe"]
