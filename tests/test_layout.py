"""Z-order layout: the clustering must actually tighten per-file stats —
that is the property the 100 TB scan pruning rides on."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.paths import scratch, sf_tag
from serverless_mapreduce_spark.sources.layout import Z_FILES, with_zval


def _per_file_span(spark, path: str) -> float:
    """Mean (max-min) o_custkey span across the files of a parquet dir."""
    spans = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg((F.max("o_custkey") - F.min("o_custkey")).alias("span"))
        .agg(F.avg("span"))
        .collect()[0][0]
    )
    return float(spans)


def test_zorder_tightens_file_stats(spark, sf_dir):
    orders = with_zval(table(spark, sf_dir, "orders"))
    base = scratch(sf_tag(sf_dir), "zorder_test")

    rr_dir = os.path.join(base, "roundrobin")
    orders.repartition(Z_FILES).write.mode("overwrite").parquet(rr_dir)

    z_dir = os.path.join(base, "clustered")
    (
        orders.repartitionByRange(Z_FILES, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(z_dir)
    )

    rr_span = _per_file_span(spark, rr_dir)
    z_span = _per_file_span(spark, z_dir)
    # Round-robin files each cover ~the full custkey range; z-ordered files
    # cover a fraction of it (the interleave splits range between the two
    # dimensions, so expect ~2-4x tighter, not perfectly tight).
    assert z_span < 0.6 * rr_span, (z_span, rr_span)


def test_zorder_write_is_lossless(spark, sf_dir):
    from serverless_mapreduce_spark.sources.layout import zorder_cluster_write

    n_src = table(spark, sf_dir, "orders").count()
    clustered = scratch(sf_tag(sf_dir), "zorder", "clustered")
    zorder_cluster_write(spark, sf_dir)  # materializes the clustered copy
    n_out = spark.read.parquet(clustered).count()
    assert n_out == n_src
