"""Unit tests for the source/sink layer (E1 CSV-with-DDL, E4/E5 write path)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import IntegerType, StringType, StructType

from serverless_mapreduce_spark.sources.csv_ddl import (
    RANKINGS_DDL,
    USERVISITS_DDL,
    ddl_to_schema,
)
from serverless_mapreduce_spark.sources.sinks import read_output, write_output


def test_ddl_bare_column_list(spark):
    schema = ddl_to_schema(RANKINGS_DDL)
    assert [f.name for f in schema.fields] == ["pageURL", "pageRank", "avgDuration"]
    assert isinstance(schema["pageURL"].dataType, StringType)
    assert isinstance(schema["pageRank"].dataType, IntegerType)


def test_ddl_full_create_table_statement(spark):
    # the exact shape of the reference's hive/Query1.q:1-9
    ddl = """
    CREATE EXTERNAL TABLE IF NOT EXISTS rankings (
      pageURL STRING,
      pageRank INT,
      avgDuration INT
    )
    ROW FORMAT DELIMITED
      FIELDS TERMINATED BY ','
    STORED AS TEXTFILE
    LOCATION '${INPUT}/rankings';
    """
    assert ddl_to_schema(ddl) == ddl_to_schema(RANKINGS_DDL)


def test_ddl_uservisits_has_nine_typed_columns(spark):
    schema = ddl_to_schema(USERVISITS_DDL)
    assert len(schema.fields) == 9
    assert schema["adRevenue"].dataType.typeName() == "double"
    assert schema["duration"].dataType.typeName() == "integer"


def test_write_output_rejects_unknown_format(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(ValueError, match="unsupported format"):
        write_output(df, str(tmp_path / "x"), fmt="avro")


def test_read_output_requires_schema_for_text_formats(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_output(spark, str(tmp_path / "x"), fmt="json")


def test_write_output_num_partitions_controls_file_count(spark, tmp_path):
    import glob

    df = spark.range(100)
    path = write_output(df, str(tmp_path / "out"), fmt="parquet", num_partitions=3)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 3
    back = read_output(spark, path)
    assert back.count() == 100


def test_partition_by_creates_hive_layout(spark, tmp_path):
    import os

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id INT, grp STRING"
    )
    path = write_output(df, str(tmp_path / "part_out"), partition_by=["grp"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("grp=")
    ) == ["grp=a", "grp=b"]
    schema = StructType.fromDDL("id INT, grp STRING")
    back = read_output(spark, path)
    assert {r.grp for r in back.collect()} == {"a", "b"}
    assert schema is not None


def test_partitioned_sink_prunes_to_one_partition(spark, sf_dir):
    from serverless_mapreduce_spark.sources.source_queries import sink_partitioned_pruned

    df = sink_partitioned_pruned(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "PartitionFilters: [isnotnull(event_type" in final, final
    # the other four event_type directories are never read (the filter sits
    # in PartitionFilters, i.e. directory pruning, not a data filter)
    import re

    assert re.search(r"PartitionFilters: \[[^]]*= click\)", final), final


def test_compaction_reduces_file_count(spark, sf_dir):
    import glob
    import os

    from serverless_mapreduce_spark.operators import datamgmt  # noqa: F401
    from serverless_mapreduce_spark.paths import scratch, sf_tag
    from serverless_mapreduce_spark.sources.source_queries import (
        FRAGMENT_FILES,
        compact_small_files,
    )

    compact_small_files(spark, sf_dir).count()
    frag = glob.glob(
        os.path.join(scratch(sf_tag(sf_dir), "compact_frag"), "*.parquet")
    )
    out = glob.glob(
        os.path.join(scratch(sf_tag(sf_dir), "compact_out"), "*.parquet")
    )
    assert len(frag) == FRAGMENT_FILES
    assert 1 <= len(out) < len(frag)
