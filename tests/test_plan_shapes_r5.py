"""Shape assertions for the round-5 continuation operators: the specific
plan properties their docstrings promise (single keyed exchange, broadcast
anti-join, scan-time filter pushdown) — tighter than the registry-wide
scale-killer lint."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from serverless_mapreduce_spark.registry import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    text = buf.getvalue()
    return text[text.index("== Physical Plan ==") :]


def _exchanges(plan: str) -> int:
    # count Exchange NODES (lines where the operator name appears in the
    # tree), not the repeated detail-section headers
    return sum(
        1
        for line in plan.splitlines()
        if "- Exchange" in line or line.startswith("Exchange")
    )


def test_rolling_window_single_user_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rolling_30d_user_spend")
    assert _exchanges(plan) == 1
    assert "RangeFrame" in plan  # the event-time frame, not a rows frame
    assert "EqualTo(event_type,purchase)" in plan  # filter reached the scan


def test_longest_streak_single_user_exchange(spark, sf_dir):
    # both row_numbers, the island aggregation, and the pick window all
    # ride ONE user-keyed exchange (subset-key distribution satisfaction)
    plan = _plan(spark, sf_dir, "longest_streak_per_user")
    assert _exchanges(plan) == 1


def test_data_quality_fk_check_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "data_quality_checks")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan  # the dim never shuffles the fact


def test_zscore_stats_broadcast_no_fact_shuffle_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "zscore_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    # the dim-side quarter filter must reach the fact scan as a RUNTIME
    # partition filter (DynamicPruningExpression), not a post-scan filter
    plan = _plan(spark, sf_dir, "join_dpp_pruned_fact")
    assert "dynamicpruning" in plan.lower()


def test_runtime_bloom_filter_join_reduction(spark, tmp_path):
    """The third runtime-filter mechanism next to DPP and broadcast
    pruning: with runtime bloomFilter enabled, a selective dim filter is
    compiled into a bloom_filter probe on the FACT side of a shuffled
    join — semi-join reduction without a broadcastable dim, the 100 TB
    setting where the dim outgrows autoBroadcast but its key set still
    fits a fixed-size sketch. Conf-driven (no code change to any query),
    so this test documents the deployment knob."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        spark.range(100_000).withColumn("k", F.col("id") % 1000).write.parquet(
            str(tmp_path / "fact")
        )
        spark.range(1000).withColumn("k", F.col("id")).withColumn(
            "attr", F.col("id") % 7
        ).write.parquet(str(tmp_path / "dim"))
        fact = spark.read.parquet(str(tmp_path / "fact"))
        dim = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("attr") == 3)
        joined = fact.join(dim, "k")

        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain(True)
        assert "bloom" in buf.getvalue().lower()
        # and the filtered join still computes the right thing
        assert joined.count() == fact.filter((F.col("k") % 7) == 3).count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_winnowing_no_exchange(spark, sf_dir):
    # the whole selection is per-row array arithmetic fused into the scan:
    # the plan must contain NO shuffle of any kind
    plan = _plan(spark, sf_dir, "winnowing_fingerprints")
    assert _exchanges(plan) == 0


def test_substring_dup_spans_single_gram_exchange_no_join(spark, sf_dir):
    # cross-doc duplication is decided by window min/max on ONE gram-keyed
    # exchange — no join materializes pair or type lists at all (the
    # earlier groupBy+semi-join shape shuffled the gram stream twice);
    # the only other exchange is the doc-keyed island/span window chain
    plan = _plan(spark, sf_dir, "substring_dup_spans")
    assert "Join" not in plan
    assert _exchanges(plan) == 2  # gram-keyed window + doc-keyed windows


def test_er_blocked_pairs_joins_on_block_key(spark, sf_dir):
    # the self-join must be keyed on the blocking key — an equi-join the
    # planner can hash/sort-merge — with the name inequality and the edit
    # distance applied as post-join filters, never a nested-loop pair scan
    plan = _plan(spark, sf_dir, "er_blocked_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "blk" in plan
