"""Cross-operator invariants for the wave-5/6 additions — properties two
independently-implemented operators must agree on, which catch semantic
drift that each operator's own oracle (being its twin) cannot."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sssp_dominates_bfs_hops(spark, sf_dir):
    """Weighted distance >= hop count on every node (all weights >= 1),
    and both algorithms reach exactly the same node set — the weighted
    and unweighted relaxations agree on reachability."""
    from serverless_mapreduce_spark.operators.graph import (
        graph_bfs_hops,
        graph_sssp_weighted,
    )

    hops = {
        r["node"]: r["hops"] for r in graph_bfs_hops(spark, sf_dir).collect()
    }
    dist = {
        r["node"]: r["dist"]
        for r in graph_sssp_weighted(spark, sf_dir).collect()
    }
    assert set(hops) == set(dist)
    assert all(dist[n] >= hops[n] for n in hops)


def test_ppr_mass_conserved(spark, sf_dir):
    """Personalized PageRank conserves probability mass: with no
    dangling nodes (every node has degree >= 1 by construction) each
    round maps total mass T -> 0.15 + 0.85*T, and T0 = 1, so total
    stays 1 to rounding."""
    from serverless_mapreduce_spark.operators.graph import graph_ppr_seeded

    total = (
        graph_ppr_seeded(spark, sf_dir).agg(F.sum("ppr")).collect()[0][0]
    )
    assert abs(total - 1.0) < 1e-6


def test_linear_and_last_touch_agree_on_attribution(spark, sf_dir):
    """A purchase has n_touches > 0 under linear attribution IFF
    last-touch attributes it to 'click' — both reduce to 'was there a
    click in the 24h lookback', derived via two different window
    mechanisms (running MAX timestamp vs RANGE-frame count)."""
    from serverless_mapreduce_spark.operators.analytics import (
        attribution_last_touch,
        attribution_linear_touch,
    )

    linear = attribution_linear_touch(spark, sf_dir)
    n_linear_touched = linear.filter(F.col("n_touches") > 0).count()
    last = attribution_last_touch(spark, sf_dir)
    n_last_click = (
        last.filter(F.col("channel") == "click")
        .agg(F.sum("n_purchases"))
        .collect()[0][0]
        or 0
    )
    assert n_linear_touched == n_last_click


def test_attribution_tie_same_instant_click_is_not_a_touch(spark):
    """A click at the purchase's EXACT timestamp precedes nothing — both
    operators must agree it is not a touch (the strictly-before rule;
    this is the tie case the fixture happens never to produce, pinned
    here on a crafted frame so the invariant isn't data luck)."""
    import serverless_mapreduce_spark.operators.analytics as A
    from tests.test_round6_wave5 import _with_fake_events

    rows = [
        (1, 1, "2024-01-01 00:00:00", "click", 1.0),  # same instant
        (2, 1, "2024-01-01 00:00:00", "purchase", 1.0),
        (3, 2, "2024-01-01 00:00:00", "click", 1.0),
        (4, 2, "2024-01-01 00:00:01", "purchase", 1.0),  # 1s later: touch
    ]
    fake = _with_fake_events(A, spark, rows)
    saved = A.table
    A.table = fake
    try:
        last = {
            (r["user_id"], r["channel"]): r["n_purchases"]
            for r in A.attribution_last_touch(spark, "unused").collect()
        }
        linear = {
            r["user_id"]: r["n_touches"]
            for r in A.attribution_linear_touch(spark, "unused").collect()
        }
    finally:
        A.table = saved
    assert last == {(1, "direct"): 1, (2, "click"): 1}
    assert linear == {1: 0, 2: 1}


def test_concurrent_orders_curve_is_valid(spark, sf_dir):
    """The open-orders curve never dips negative and returns to zero
    after the last close (every +1 has its -1)."""
    from serverless_mapreduce_spark.operators.analytics import (
        concurrent_orders_daily,
    )

    rows = sorted(
        concurrent_orders_daily(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    assert all(r["open_orders"] >= 0 for r in rows)
    assert rows[-1]["open_orders"] == 0
    assert sum(r["delta"] for r in rows) == 0


def test_funnel_ttc_quantiles_monotone(spark, sf_dir):
    from serverless_mapreduce_spark.operators.analytics import (
        funnel_time_to_convert,
    )

    q = {
        r["pct"]: r["delta_us"]
        for r in funnel_time_to_convert(spark, sf_dir).collect()
    }
    pcts = sorted(q)
    assert all(
        q[pcts[i]] <= q[pcts[i + 1]] for i in range(len(pcts) - 1)
    )
    assert all(v > 0 for v in q.values())


def test_time_ops_are_session_tz_invariant(spark, sf_dir):
    """Every ts-dependent wave-5/6 operator pins its own UTC clone
    (utc_session), so results must be identical no matter how hostile
    the caller session's timezone is — the property that makes the
    driver's vanilla-session hash comparison portable."""
    from serverless_mapreduce_spark.registry import all_queries

    qs = all_queries()
    names = (
        "seasonal_residual_outliers",
        "attribution_last_touch",
        "session_path_topk",
        "time_weighted_avg_user",
        "ewma_user_spend",
        "concurrent_orders_daily",
        "funnel_time_to_convert",
    )
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.session.timeZone", "Pacific/Chatham")
    for name in names:
        cols_rows = lambda df: sorted(
            tuple(str(r[c]) for c in sorted(df.columns))
            for r in df.collect()
        )
        a = cols_rows(qs[name](spark, sf_dir))
        b = cols_rows(qs[name](hostile, sf_dir))
        assert a == b, f"{name}: result depends on caller session TZ"
