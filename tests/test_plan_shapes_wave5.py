"""Shape assertions for the wave-5 operators — pins the plan properties
their docstrings promise, so a future edit that silently reintroduces a
per-row array literal, an extra exchange, or a range self-join fails
loudly here rather than as a bench regression."""

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


def test_bloom_probe_has_no_per_row_array_literal(spark, sf_dir):
    # the bitmap ships as a 1-row broadcast (BroadcastNestedLoopJoin of a
    # LocalTableScan), never as a CreateArray literal re-materialized per
    # probe row (the 3s-at-sf0.1 regression this replaced)
    plan = _plan(spark, sf_dir, "bloom_prefilter_join")
    assert "BroadcastNestedLoopJoin" in plan
    # no 8192-element CreateArray literal in any Filter/Project node —
    # the bitmap must only exist as broadcast row data
    for ln in plan.splitlines():
        if "Filter" in ln or "Project" in ln:
            assert ln.count(",") < 2000, "per-row array literal is back"
    # the FP-removing exact join is still there
    assert "LeftSemi" in plan


def test_twap_single_user_exchange(spark, sf_dir):
    # window pass + aggregate are both user_id-keyed: exactly one
    # exchange over events
    plan = _plan(spark, sf_dir, "time_weighted_avg_user")
    exchanges = sum(1 for ln in plan.splitlines() if "- Exchange" in ln)
    assert exchanges == 1


def test_attribution_is_window_not_join(spark, sf_dir):
    # the purchases-to-clicks lookback compiles to a running-max window,
    # never a purchases x clicks range self-join
    plan = _plan(spark, sf_dir, "attribution_last_touch")
    assert "Join" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_seasonal_baseline_broadcasts(spark, sf_dir):
    # the 24-row hour-of-day baseline broadcasts into the flag pass
    plan = _plan(spark, sf_dir, "seasonal_residual_outliers")
    assert "BroadcastHashJoin" in plan


def test_weighted_sample_no_shuffle(spark, sf_dir):
    # after the 1-row max scalar, the keep decision is map-side only:
    # no exchange anywhere in the returned frame's plan
    plan = _plan(spark, sf_dir, "weighted_sample_events")
    assert "Exchange" not in plan


def test_corr_matrix_single_aggregation(spark, sf_dir):
    # all 14 sufficient statistics in one partial+final aggregate over
    # one scan: exactly one exchange (the 1-row partials merge)
    plan = _plan(spark, sf_dir, "corr_matrix_lineitem")
    exchanges = sum(1 for ln in plan.splitlines() if "- Exchange" in ln)
    assert exchanges == 1
    assert plan.count("Scan parquet") == 1


def test_ewma_single_key_shuffle(spark, sf_dir):
    # repartition(custkey) is the only exchange; the recurrence itself is
    # a partition-local Arrow scan (MapInPandas), not per-group FlatMap
    plan = _plan(spark, sf_dir, "ewma_user_spend")
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan
