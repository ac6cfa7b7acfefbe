"""Shape assertions for the wave-6 operators (interval curve, linear
attribution, funnel quantiles, CDC diff, AQP eval, k-anonymity)."""

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


def test_linear_attribution_is_window_not_join(spark, sf_dir):
    # the 24h touch count is a RANGE-frame window on the user timeline,
    # never a purchases x clicks range self-join
    plan = _plan(spark, sf_dir, "attribution_linear_touch")
    assert "Join" not in plan
    assert "Window" in plan


def test_concurrent_orders_no_range_join(spark, sf_dir):
    # the interval count is a difference array (union + agg + window),
    # never the days x orders stabbing join
    plan = _plan(spark, sf_dir, "concurrent_orders_daily")
    assert "NestedLoop" not in plan
    assert "Window" in plan
    # one keyed join only: lineitem->orders to derive the close date
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 1


def test_cdc_diff_single_full_outer(spark, sf_dir):
    plan = _plan(spark, sf_dir, "cdc_diff_snapshots")
    assert "FullOuter" in plan
    assert "NestedLoop" not in plan


def test_aqp_eval_single_scan_no_join(spark, sf_dir):
    # exact + estimate ride one scan and one aggregation
    plan = _plan(spark, sf_dir, "eval_sample_accelerated_agg")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_k_anonymity_single_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "k_anonymity_audit")
    assert "Join" not in plan
    exchanges = sum(1 for ln in plan.splitlines() if "- Exchange" in ln)
    assert exchanges == 1


def test_funnel_ttc_no_nested_loop(spark, sf_dir):
    # user-keyed equi-joins + the prefix primitive only
    plan = _plan(spark, sf_dir, "funnel_time_to_convert")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_hhi_reuses_partkey_exchange(spark, sf_dir):
    # two-level aggregation both keyed by l_partkey: one exchange total,
    # no window, no join
    plan = _plan(spark, sf_dir, "supplier_concentration_hhi")
    assert "Join" not in plan
    assert "Window" not in plan
    exchanges = sum(1 for ln in plan.splitlines() if "- Exchange" in ln)
    assert exchanges == 1


def test_label_margin_single_probe_join(spark, sf_dir):
    # one bucket-keyed broadcast probe join; both maxes ride one
    # conditional aggregation — no second join for the negative side
    plan = _plan(spark, sf_dir, "eval_embedding_label_margin")
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
