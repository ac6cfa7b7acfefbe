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
