"""Advanced analytics operators beyond the reference's workload set: as-of
join, range join, pivot, top-k per group, exact distinct counts, reproducible
stratified sampling, exact grouped quantiles, and a hypertable-style
multi-granularity time rollup.

The reference (hanglili/Serverless-MapReduce) has no analog for any of these —
its surface stops at map/shuffle/reduce (``src/python/serverless_mr/job/``) —
but a user running analytics on the same data needs them, so they are part of
this engine's first-class query surface. Every query here is a declarative
DataFrame program with a DuckDB oracle; none uses a Python UDF.

Scale stance (100 TB):
- The as-of join is the union-tag + keyed-window plan: one shuffle on the
  join key, no per-row range probe, no cross product. This is the standard
  distributed as-of strategy (kdb/QuestDB semantics, Flink temporal-join
  shape) expressed in pure DataFrame ops.
- The range join keeps an equality key (user_id) so candidates are bounded
  per key; for keyless interval joins, bucketize time into interval-width
  bins, join on bin, then post-filter — same plan shape, still no cartesian.
- Sampling is hash-threshold based (md5), so it is deterministic,
  partition-invariant, pushed to the scan as a cheap filter, and needs no
  shuffle at all — unlike ``df.sampleBy`` whose seed-per-partition output
  changes with parallelism.
- Quantiles are exact within each group for oracle parity; the 100 TB path
  is ``approx_percentile`` (t-digest sketch, mergeable map-side) — swap one
  expression, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import epoch_us, table
from serverless_mapreduce_spark.registry import query
from serverless_mapreduce_spark.session import utc_session


# --- as-of join: latest 'view' at-or-before each 'purchase', per user --------

@query(
    "join_asof_purchase_view",
    oracle="""
    SELECT event_id, user_id, asof_view_id, asof_view_value
    FROM (
      SELECT p.event_id, p.user_id,
             v.event_id AS asof_view_id, v.value AS asof_view_value,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events p
      JOIN events v
        ON v.user_id = p.user_id
       AND v.event_type = 'view'
       AND v.ts <= p.ts
      WHERE p.event_type = 'purchase'
    ) WHERE rn = 1
    """,
)
def join_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for each purchase, the most recent view by the same user
    at-or-before the purchase timestamp (ties: latest event_id).

    Plan: tag views and purchases, union, then one window per user ordered by
    (ts, is_view DESC, event_id) carrying ``last(view_struct ignorenulls)``
    — a running "latest view so far". One shuffle on user_id, work per
    partition is a single sorted pass. The naive plan (inequality join +
    rank, which the oracle uses) is O(views x purchases) per user and
    unusable at 100 TB; this one is O(n log n) per user.
    """
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_view"),
        F.struct(
            F.col("event_id").alias("view_id"), F.col("value").alias("view_value")
        ).alias("v"),
        F.col("event_id").alias("order_id"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_view"),
        F.lit(None).cast("struct<view_id:bigint,view_value:double>").alias("v"),
        F.lit(None).cast("long").alias("order_id"),
        "event_id",
    )
    # Sort order within a user: time asc; at equal ts the view comes FIRST
    # (at-or-before includes the same instant); among equal-ts views the
    # largest event_id lands last, so `last()` picks it — matching the
    # oracle's (ts DESC, event_id DESC) choice.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_view").desc(), F.col("order_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = views.unionByName(purchases).withColumn(
        "asof", F.last("v", ignorenulls=True).over(w)
    )
    return (
        tagged.filter((F.col("is_view") == 0) & F.col("asof").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("asof.view_id").alias("asof_view_id"),
            F.col("asof.view_value").alias("asof_view_value"),
        )
    )


# --- range join: clicks in the hour before each purchase, per user -----------

@query(
    "join_range_click_burst",
    oracle="""
    SELECT p.event_id, COUNT(*) AS n_clicks_1h
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def join_range_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN: count clicks by the same user in the hour before each
    purchase. The equality key (user_id) makes this a plain shuffled
    equi-join with the time-range as a post-join filter — candidates are
    bounded per user, never a cartesian. For a *keyless* interval join,
    bucketize ts into 1-hour bins, join on bin (and bin+1), then apply the
    same range filter: identical plan shape, still no cross product."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts < p.p_ts),
    )
    return joined.groupBy("event_id").agg(F.count("*").alias("n_clicks_1h"))


# --- pivot: order counts, status columns by priority rows --------------------

@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an *explicit* value list: passing the pivot values up front
    skips the extra distinct-scan job Spark otherwise runs to discover them
    — at 100 TB that implicit pass over the fact table is a full extra scan.
    Pivot compiles to a single groupBy with conditional aggregates (exactly
    the oracle's CASE form): one shuffle."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        )
    )


# --- top-k per group: 3 biggest orders per customer --------------------------

@query(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price. A *partitioned* window (keyed by
    customer), so it distributes — and Spark inserts a rank-limit before the
    final sort per partition (WindowGroupLimit), so each task keeps only k
    rows per key rather than ranking everything. Ties broken by o_orderkey
    for cross-engine determinism."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --- exact distinct per day: daily active users ------------------------------

@query(
    "daily_active_users",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users: COUNT(DISTINCT) per day. Spark plans this as
    two-phase (partial distinct on (day, user) map-side, then merge), so the
    shuffle carries deduplicated pairs, not raw events. At 100 TB swap in
    ``approx_count_distinct`` (HyperLogLog++, mergeable sketch, one narrow
    shuffle) — exact is registered because the oracle can verify it. Day is
    emitted as a string; session TZ pinned so truncation is UTC on any
    caller's session."""
    spark = utc_session(spark)
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


# --- reproducible stratified sample ------------------------------------------

# Per-stratum keep-thresholds over the md5 hex keyspace: a row stays iff
# md5(key) < threshold, so 'O' keeps ~0x1a/0x100 ≈ 10.2%, 'F' ~15.6%, 'P' 50%.
STRATA_THRESHOLDS = {"F": "28", "O": "1a", "P": "80"}


@query(
    "stratified_sample_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE md5(CAST(o_orderkey AS VARCHAR)) <
          CASE o_orderstatus
            WHEN 'F' THEN '{STRATA_THRESHOLDS["F"]}'
            WHEN 'O' THEN '{STRATA_THRESHOLDS["O"]}'
            ELSE '{STRATA_THRESHOLDS["P"]}'
          END
    """,
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates, implemented as a
    hash-threshold filter (keep iff md5(key) < stratum threshold) instead of
    ``df.sampleBy``. Why: the hash filter is deterministic across runs,
    engines, AND partitionings (sampleBy's per-partition RNG changes output
    when parallelism changes), it needs zero shuffles, and it composes — the
    same key always lands in the sample, so downstream joins of two sampled
    tables stay consistent. This is how reproducible training-data
    subsampling should work at 100 TB."""
    h = F.md5(F.col("o_orderkey").cast("string"))
    thr = (
        F.when(F.col("o_orderstatus") == "F", STRATA_THRESHOLDS["F"])
        .when(F.col("o_orderstatus") == "O", STRATA_THRESHOLDS["O"])
        .otherwise(STRATA_THRESHOLDS["P"])
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(h < thr)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


# --- exact grouped quantiles (cent-integer trick for cross-engine equality) --

@query(
    "price_quantiles_by_priority",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(cents, 0.25) AS p25_cents,
           quantile_cont(cents, 0.50) AS p50_cents,
           quantile_cont(cents, 0.75) AS p75_cents
    FROM (
      SELECT o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    )
    GROUP BY o_orderpriority
    """,
)
def price_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75 of order price per priority. Prices are converted to
    integer cents via DECIMAL (lossless), so linear interpolation at
    quarter fractions is *exact* in IEEE doubles — both engines compute
    bit-identical results with no rounding epsilon. Exact percentile sorts
    within each group; at 100 TB use ``approx_percentile`` (t-digest,
    mergeable map-side, one narrow shuffle) — same expression slot."""
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    pct = F.percentile(F.col("cents"), F.lit([0.25, 0.50, 0.75]))
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderpriority", cents.alias("cents"))
        .groupBy("o_orderpriority")
        .agg(pct.alias("q"))
        .select(
            "o_orderpriority",
            F.col("q")[0].alias("p25_cents"),
            F.col("q")[1].alias("p50_cents"),
            F.col("q")[2].alias("p75_cents"),
        )
    )


# --- hypertable-style rollup: hour -> day -> total from reusable partials ----

@query(
    "time_bucket_rollup",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY ROLLUP (day, hour)
    """,
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (hourly, daily, grand total) built the
    continuous-aggregate way: aggregate ONCE at the finest grain (hour),
    then re-aggregate those partials upward. ``df.rollup`` would instead
    Expand every input row 3x before the shuffle — 3x shuffle volume on the
    fact table; here the day/total levels re-aggregate the (tiny) hourly
    result, which is the hypertable/materialized-rollup pattern at 100 TB.
    Decimal partials keep the re-aggregation exact; TZ pinned to UTC so
    bucket edges match the naive-timestamp oracle on any session."""
    spark = utc_session(spark)
    ev = table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    hourly = ev.groupBy("day", "hour").agg(
        F.sum("v").alias("_sv"), F.count("*").alias("n_events")
    )
    daily = hourly.groupBy("day").agg(
        F.lit(None).cast("string").alias("hour"),
        F.sum("_sv").alias("_sv"),
        F.sum("n_events").alias("n_events"),
    )
    total = daily.agg(
        F.lit(None).cast("string").alias("day"),
        F.lit(None).cast("string").alias("hour"),
        F.sum("_sv").alias("_sv"),
        F.sum("n_events").alias("n_events"),
    )
    out_cols = [
        "day",
        "hour",
        F.col("_sv").cast("double").alias("sum_value"),
        F.col("n_events").cast("long").alias("n_events"),
    ]
    return (
        hourly.select(*out_cols)
        .unionByName(daily.select(*out_cols))
        .unionByName(total.select(*out_cols))
    )


# --- batch sessionization: gap-based session ids via one keyed window ---------

SESSION_GAP_HOURS = 12


@query(
    "sessionize_events",
    priority=0,
    oracle=f"""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '{SESSION_GAP_HOURS} hours'
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the offline twin of the streaming
    ``session_window_agg``): a new session starts when a user's gap is
    >= {SESSION_GAP_HOURS}h — the >= matches Spark's exclusive
    session-window end, so batch and stream agree on boundaries. The
    classic lag-flag-cumsum plan: ONE shuffle on user_id serves both
    window passes AND the final per-session aggregate (all three are
    user_id-partitioned — Spark reuses the exchange), so the whole query
    is a single exchange over the events table at any scale. Tie-safety:
    equal timestamps get flag 0, so every tie-order yields identical
    session ids. Session bounds are emitted as epoch micros (BIGINT) —
    timezone-free cross-engine."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = SESSION_GAP_HOURS * 3600
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | (F.timestamp_diff("SECOND", prev, F.col("ts")) >= gap_s),
        1,
    ).otherwise(0)
    sid = F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .withColumn("new_s", new_s)
        .withColumn("session_id", sid.cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            epoch_us(F.min("ts")).alias("session_start_us"),
            epoch_us(F.max("ts")).alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# --- weekly cohort retention --------------------------------------------------

@query(
    "cohort_retention",
    priority=0,
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
      FROM events
    ),
    first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
    SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_wk, wk) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM e JOIN first ON e.user_id = first.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week, counted
    distinct in each subsequent week — the standard growth-analytics
    triangle. Scale shape: the cohort dim is ONE ROW PER USER (tiny next
    to the events fact) and broadcasts back onto events; the distinct
    count is two-phase partial-distinct on (cohort, offset, user), so the
    shuffle carries deduplicated triples. Weeks are Monday-truncated in
    UTC in both engines; the offset is an exact day-diff / 7."""
    spark = utc_session(spark)
    e = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        e.join(F.broadcast(first), "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --- conversion funnel: ordered view → click → purchase ----------------------

@query(
    "funnel_conversion",
    priority=0,
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_buy
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
      GROUP BY e.user_id
    )
    SELECT 'view' AS step, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT 'click_after_view', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 'purchase_after_click', (SELECT COUNT(*) FROM p)
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first qualifying click —
    the sequential-dependency analytics shape (product funnels, training
    curricula). Plan: ONE exchange on user_id serves three chained
    whole-partition window minimums (t_view, then first click > t_view,
    then first purchase > that click — each window reuses the same
    partitioning, so Catalyst plans a single shuffle), a per-user collapse
    on the SAME partitioning (again exchange-reused), and a 1-row global
    conditional count unpivoted to labeled rows via inline() — no joins
    at all. The previous formulation staged three aggregations and
    BROADCAST each stage's user dim into the next — fine at fixture
    scale, but a per-user dim is exactly what you cannot broadcast on a
    real corpus; this plan's only wide op is the user_id hash partition,
    at any scale. (Oracle keeps the naive staged-join form.)"""
    w = Window.partitionBy("user_id")
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_type")
    )
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    flagged = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
            F.col("ts"),
        )
    ).over(w)
    flagged = flagged.withColumn("t_click", t_click)
    t_buy = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        flagged.withColumn("t_buy", t_buy)
        .groupBy("user_id")
        .agg(
            F.max(F.col("t_view").isNotNull()).alias("viewed"),
            F.max(F.col("t_click").isNotNull()).alias("clicked"),
            F.max(F.col("t_buy").isNotNull()).alias("bought"),
        )
    )
    wide = per_user.agg(
        F.sum(F.col("viewed").cast("long")).alias("n_v"),
        F.sum(F.col("clicked").cast("long")).alias("n_c"),
        F.sum(F.col("bought").cast("long")).alias("n_b"),
    )
    return wide.select(
        F.inline(
            F.array(
                F.struct(F.lit("view").alias("step"), F.col("n_v").alias("n_users")),
                F.struct(
                    F.lit("click_after_view").alias("step"),
                    F.col("n_c").alias("n_users"),
                ),
                F.struct(
                    F.lit("purchase_after_click").alias("step"),
                    F.col("n_b").alias("n_users"),
                ),
            )
        )
    )


# --- set operations: INTERSECT / EXCEPT over yearly customer sets -------------

SETOP_Y1 = ("1997-01-01", "1998-01-01")
SETOP_Y2 = ("1998-01-01", "1999-01-01")


@query(
    "set_ops_customers",
    priority=0,
    oracle=f"""
    WITH y1 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '{SETOP_Y1[0]} 00:00:00'
                  AND o_orderdate < TIMESTAMP '{SETOP_Y1[1]} 00:00:00'),
         y2 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '{SETOP_Y2[0]} 00:00:00'
                  AND o_orderdate < TIMESTAMP '{SETOP_Y2[1]} 00:00:00')
    SELECT 'both_years' AS cohort,
           (SELECT COUNT(*) FROM (SELECT * FROM y1 INTERSECT SELECT * FROM y2)) AS n_customers
    UNION ALL
    SELECT 'only_{SETOP_Y1[0][:4]}',
           (SELECT COUNT(*) FROM (SELECT * FROM y1 EXCEPT SELECT * FROM y2))
    UNION ALL
    SELECT 'only_{SETOP_Y2[0][:4]}',
           (SELECT COUNT(*) FROM (SELECT * FROM y2 EXCEPT SELECT * FROM y1))
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra over customer activity: who ordered in both years, who
    churned, who is new — INTERSECT and EXCEPT as first-class operators
    (the reference has no set operators at all). Spark plans both as
    LEFT SEMI / LEFT ANTI joins over distinct keys — same keyed-shuffle
    shape as any join, no sort, no cross product; the year filters push to
    the orders scan. Labeled count rows union into the result (no scalar
    cross-join)."""
    o = table(spark, sf_dir, "orders")

    def year_keys(lo: str, hi: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y1 = year_keys(*SETOP_Y1)
    y2 = year_keys(*SETOP_Y2)

    def count_row(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_customers")).select(
            F.lit(label).alias("cohort"), "n_customers"
        )

    return (
        count_row(y1.intersect(y2), "both_years")
        .unionAll(count_row(y1.exceptAll(y2).distinct(), f"only_{SETOP_Y1[0][:4]}"))
        .unionAll(count_row(y2.exceptAll(y1).distinct(), f"only_{SETOP_Y2[0][:4]}"))
    )


# --- unpivot: wide status counts melted back to long --------------------------

@query(
    "unpivot_order_status",
    priority=0,
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'F' AS o_orderstatus, F AS n_orders FROM wide
    UNION ALL
    SELECT o_orderpriority, 'O', O FROM wide
    UNION ALL
    SELECT o_orderpriority, 'P', P FROM wide
    """,
)
def unpivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of ``pivot_status_by_priority``:
    aggregate wide (one SUM(CASE) per status, single shuffle with map-side
    partials), then ``DataFrame.unpivot`` melts the three count columns
    back to (priority, status, n) rows. Unpivot is a narrow, zero-shuffle
    expansion (each wide row emits 3 long rows in place) — the plan is one
    exchange total at any scale. The oracle melts via UNION ALL of the
    same wide CTE."""
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("F"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("bigint")
        .alias("O"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
        .cast("bigint")
        .alias("P"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="o_orderstatus",
        valueColumnName="n_orders",
    )


# --- time-series gap filling: zero-filled hourly counts per event type --------

@query(
    "gapfill_hourly_counts",
    priority=50,
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM c GROUP BY 1),
    s AS (
      SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM r
    )
    SELECT s.event_type, epoch_us(s.hr) AS hour_us,
           COALESCE(c.n, 0) AS n_events
    FROM s LEFT JOIN c ON s.event_type = c.event_type AND s.hr = c.hr
    """,
)
def gapfill_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP FILLING: hourly event counts per type with missing
    hours zero-filled — the resample/asfreq operation every monitoring and
    feature pipeline needs, which a plain GROUP BY cannot produce (absent
    hours yield no row at all).

    Scale shape: aggregate FIRST (events collapse to one row per
    (type, hour) — the only pass over the fact table), then build the time
    spine from each type's own [min, max] hourly range via
    ``sequence`` + ``explode`` — generated distributed, one row per type
    exploding to its range, never a driver-side loop or a cross join. The
    spine left-joins the (tiny) aggregate; at 100 TB the join inputs are
    both dimension-sized. Hours are emitted as epoch micros (BIGINT),
    timezone-free across engines."""
    spark = utc_session(spark)
    counts = (
        table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("n"))
    )
    spine = (
        counts.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    return spine.join(counts, ["event_type", "hr"], "left").select(
        "event_type",
        epoch_us(F.col("hr")).alias("hour_us"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
    )


# --- per-user linear trend: exact-arithmetic regression slope ------------------

#: x origin for the regression (any constant instant works; this one keeps
#: x small and positive for the fixture's 2024 event range).
REGR_EPOCH = "2024-01-01 00:00:00"


@query(
    "regr_slope_user_trend",
    priority=50,
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP))
                  - epoch_us(TIMESTAMP '{REGR_EPOCH}') AS BIGINT) // 1000000
               AS x,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y_cents
      FROM events
    ),
    s AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y_cents AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x AS DECIMAL(19,0)) * y_cents) AS sxy,
             SUM(CAST(x AS DECIMAL(19,0)) * x) AS sxx
      FROM pts GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 12)
             AS slope_cents_per_sec
    FROM s
    WHERE n >= 2 AND n * sxx - sx * sx <> 0
    """,
)
def regr_slope_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value trend: least-squares slope of (event value) over
    (event time) — ``REGR_SLOPE`` computed from EXACT integer/decimal
    moments. Why not the built-in: both engines implement regr_slope with
    IEEE-double partial aggregation, whose result depends on partition
    merge order — unfixable for a hash-equality oracle. Instead x (seconds
    since a constant origin) and y (cents) are integers, so the four
    moments Σx, Σy, Σxy, Σx² are EXACT decimal sums — order-independent
    under any partitioning — and the single final division is one
    deterministic double op (rounded to 12 dp to absorb the two
    decimal→double casts). One shuffle, map-side partial aggregation; the
    moment-sum rewrite is exactly how a 1000-executor regression should
    run — never collect points."""
    us_origin = epoch_us(F.lit(REGR_EPOCH).cast("timestamp_ntz"))
    pts = table(spark, sf_dir, "events").select(
        "user_id",
        ((epoch_us(F.col("ts")) - us_origin) / 1_000_000)
        .cast("bigint")
        .alias("x"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("y_cents"),
    )
    s = pts.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y_cents").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y_cents")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.filter((F.col("n") >= 2) & (den != 0))
        .select(
            "user_id",
            "n",
            F.round(num.cast("double") / den.cast("double"), 12).alias(
                "slope_cents_per_sec"
            ),
        )
    )


# --- fixed-width histogram of order prices -------------------------------------

HIST_BUCKET_WIDTH_CENTS = 2_500_000  # $25,000 buckets over [$1k, $500k)


@query(
    "revenue_histogram",
    priority=50,
    oracle=f"""
    SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                // {HIST_BUCKET_WIDTH_CENTS} AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def revenue_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width HISTOGRAM of order prices: bucket id = floor(cents /
    width). The bucketing expression is a pure row function (no
    width_bucket UDF, no per-bucket scan), so the whole histogram is ONE
    hash aggregation with map-side partials — each task emits at most
    #buckets rows regardless of input size, the textbook
    mergeable-summary shape. Cents go through DECIMAL so bucket edges are
    exact (no 0.1-ulp bucket flips); empty buckets are simply absent
    (compose with ``gapfill_hourly_counts``'s spine trick to zero-fill)."""
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        table(spark, sf_dir, "orders")
        .select(
            (cents / HIST_BUCKET_WIDTH_CENTS).cast("bigint").alias("bucket"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("p").cast("double").alias("sum_price"),
        )
    )


# --- approximate distinct: HyperLogLog users per event type --------------------

APPROX_DISTINCT_RSD = 0.01


def approx_distinct_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, approx_users, exact_users) in ONE aggregation — the HLL
    sketch and the exact distinct ride the same shuffle. Production callers
    drop the exact column; the registered query and the accuracy pytest
    derive their checks from this frame."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=APPROX_DISTINCT_RSD).alias(
                "approx_users"
            ),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )


@query(
    "approx_distinct_users",
    priority=50,
    oracle="""
    -- DuckDB's approx_count_distinct is a DIFFERENT HLL implementation
    -- (different bias correction), so the estimates legitimately differ and
    -- the estimate itself can't be the hashed value. The driver-checkable
    -- contract is the accuracy bound: Spark emits
    -- |approx - exact| / exact <= 3*rsd per group, which must be TRUE for
    -- every group — hashable, and honest about what HLL promises.
    SELECT event_type, TRUE AS within_bound
    FROM events GROUP BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT) per event type via HyperLogLog++
    (``approx_count_distinct``, rsd=0.01). THE cardinality operator at
    100 TB: the sketch is a few KB per group and merges associatively, so
    the shuffle carries one sketch per (task, group) instead of the
    deduplicated keys that exact distinct (``daily_active_users``) must
    move. For the driver check only, the exact count rides along in the
    SAME aggregation (one extra expression, no extra shuffle) so the query
    can emit the within-error-bound boolean the oracle asserts; a
    production caller takes ``approx_users`` from the same plan. The
    estimate-vs-exact gate also runs in pytest
    (tests/test_edge_cases.py::test_approx_distinct_within_rsd)."""
    return approx_distinct_estimates(spark, sf_dir).select(
        "event_type",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 3 * APPROX_DISTINCT_RSD
        ).alias("within_bound"),
    )


# --- approximate quantiles with a rank-error contract --------------------------

APPROX_Q_ACC = 10_000  #: percentile_approx accuracy (rank error <= n/ACC)


def approx_quantile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, q50, q95, n) via the KLL-style quantile sketch
    (``percentile_approx``). THE percentile operator at 100 TB: the sketch
    is O(accuracy) memory per group and merges associatively, so the
    shuffle carries one sketch per (task, group) instead of the full
    sorted value set that an exact percentile
    (``price_quantiles_by_priority``) must see."""
    qs = F.percentile_approx("value", [0.5, 0.95], APPROX_Q_ACC)
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(qs.alias("qs"), F.count("*").alias("n"))
        .select(
            "event_type",
            F.col("qs")[0].alias("q50"),
            F.col("qs")[1].alias("q95"),
            "n",
        )
    )


@query(
    "approx_quantiles_bounded",
    priority=0,
    oracle="""
    -- Same contract shape as approx_distinct_users: DuckDB's approx
    -- quantile is a different sketch, so the estimate itself can't be the
    -- hashed value. percentile_approx guarantees the returned value's RANK
    -- is within n/accuracy of the target rank; the query emits that rank
    -- check (with slack for ties) as booleans, which must be TRUE per group.
    SELECT event_type, TRUE AS p50_within, TRUE AS p95_within
    FROM events GROUP BY event_type
    """,
)
def approx_quantiles_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95 of ``value`` per event type with the rank-error
    bound verified IN the query: a second pass counts values <= each
    estimate (broadcast of the tiny per-group estimates, conditional sum)
    and checks the count lands within target_rank ± (3n/accuracy + 2).
    The verification pass exists for the driver gate only — a production
    caller takes (q50, q95) from :func:`approx_quantile_estimates`'s
    single sketch aggregation and never rescans. The estimate-vs-exact
    distance is separately gated in
    tests/test_edge_cases.py::test_approx_quantiles_near_exact."""
    est = approx_quantile_estimates(spark, sf_dir)
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    counted = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("q50"), 1).otherwise(0)).alias("le50"),
            F.sum(F.when(F.col("value") <= F.col("q95"), 1).otherwise(0)).alias("le95"),
            F.first("n").alias("n"),
        )
    )
    tol = 3.0 * F.col("n") / APPROX_Q_ACC + 2
    return counted.select(
        "event_type",
        (
            (F.col("le50") >= 0.5 * F.col("n") - tol)
            & (F.col("le50") <= 0.5 * F.col("n") + tol)
        ).alias("p50_within"),
        (
            (F.col("le95") >= 0.95 * F.col("n") - tol)
            & (F.col("le95") <= 0.95 * F.col("n") + tol)
        ).alias("p95_within"),
    )


# --- keyless interval join via time-bucketization -----------------------------

RANGE_WINDOW_US = 300_000_000  # ±5 minutes, in microseconds


@query(
    "join_range_keyless",
    priority=0,
    oracle=f"""
    SELECT e.event_id, COUNT(*) AS n_signups_nearby
    FROM events e
    JOIN events s
      ON s.event_type = 'signup'
     AND abs(epoch_us(CAST(e.ts AS TIMESTAMP))
             - epoch_us(CAST(s.ts AS TIMESTAMP))) <= {RANGE_WINDOW_US}
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def join_range_keyless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval join (no shared equality key): errors matched to
    signups within ±5 minutes. The naive plan is a cartesian with a range
    filter — O(N·M) and exactly what the plan lint forbids. The scalable
    plan BUCKETIZES time into window-width bins: each error explodes to
    its bin and both neighbors (3 rows), each signup keeps its single bin,
    and the join becomes an EQUI join on the bin — candidates per bin are
    bounded by local event density, never N·M. Only one side explodes, and
    a signup's bin is unique, so each qualifying pair matches exactly once
    (no post-dedup). The exact |dt| predicate then prunes bin-neighbors.
    This is the ``join_range_click_burst`` shape with the equality key
    removed — the bin IS the manufactured key; the oracle runs the naive
    inequality join (fine at oracle SF)."""
    ev = table(spark, sf_dir, "events")
    us = epoch_us(F.col("ts"))
    bin_ = F.floor(us / F.lit(RANGE_WINDOW_US))
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("event_id"), us.alias("e_us"), bin_.alias("b"))
        .select(
            "event_id",
            "e_us",
            F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)).alias(
                "bin"
            ),
        )
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        us.alias("s_us"), bin_.alias("bin")
    )
    return (
        errors.join(signups, "bin")
        .filter(F.abs(F.col("e_us") - F.col("s_us")) <= RANGE_WINDOW_US)
        .groupBy("event_id")
        .agg(F.count("*").alias("n_signups_nearby"))
    )


# --- SCD2: slowly-changing-dimension intervals from the event log --------------

@query(
    "scd2_user_state",
    priority=0,
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ),
    chg AS (
      SELECT user_id, event_id, ts, event_type FROM (
        SELECT *, lag(event_type) OVER w AS prev_type
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ) WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    iv AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM chg
    )
    SELECT user_id, state,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN 0
                         ELSE epoch_us(valid_to) - epoch_us(valid_from) END)
                AS BIGINT) AS closed_dur_us,
           CAST(MAX(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS has_current
    FROM iv GROUP BY user_id, state
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 DIMENSION BUILD: turn the append-only event log into
    validity intervals per user — collapse consecutive same-state
    observations (change detection via lag), open an interval at each
    change, close it at the next change (lead; NULL = current row). This
    is how a warehouse derives a historized dimension from CDC at 100 TB,
    and the plan is the sessionize shape: lag-filter, lead, and the final
    (user, state) aggregate are ALL user_id-partitioned, so one exchange
    serves every pass. Determinism: windows order by (ts, event_id) — the
    unique tiebreaker makes every interval boundary reproducible under any
    partitioning. Registered result aggregates interval count, total
    CLOSED duration, and a current-state flag per (user, state) — interval
    endpoints feed the hash via the duration sum, so a wrong boundary
    fails the gate."""
    from serverless_mapreduce_spark.catalog import epoch_us

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    chg = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .drop("prev_type")
    )
    iv = chg.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("valid_to"),
    )
    return iv.groupBy("user_id", "state").agg(
        F.count("*").alias("n_intervals"),
        F.sum(
            F.when(F.col("valid_to").isNull(), F.lit(0)).otherwise(
                epoch_us(F.col("valid_to")) - epoch_us(F.col("valid_from"))
            )
        )
        .cast("bigint")
        .alias("closed_dur_us"),
        F.max(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("has_current"),
    )


# --- HLL sketch rollup: persist per-day sketches, merge without raw data -------

HLL_ROLLUP_LGK = 14  #: lgConfigK → relative error ~= 1.04 / sqrt(2^14) ~= 0.8%


@query(
    "hll_sketch_rollup",
    priority=0,
    oracle="""
    -- Same contract as approx_distinct_users: the Datasketches estimate
    -- is implementation-defined, so the hashed value is the accuracy
    -- bound, which must hold per group. The REAL assertion this query
    -- adds is structural: the estimate comes from MERGED per-day
    -- sketches, never from re-scanning raw user_ids.
    SELECT event_type, TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH ROLLUP — the incremental-distinct pattern at 100 TB: each
    day's partition aggregates its users into a Datasketches HLL sketch
    ONCE (``hll_sketch_agg``, a few KB per group); any later question
    ("distinct users per event type this quarter?") merges the stored
    sketches (``hll_union_agg``) without touching raw data again. The
    first aggregation is the only pass over the events table; the merge
    input is (days x event_types) sketch rows. The exact count rides along
    solely to emit the driver-checkable error-bound boolean (estimates are
    gated against exact in tests/test_edge_cases.py). The relative error
    for lgConfigK={HLL_ROLLUP_LGK} is ~1.04/sqrt(2^{HLL_ROLLUP_LGK}) ≈
    0.8%; the bound below allows 5x that, tight enough to catch a
    mis-merged or mis-keyed sketch."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_ROLLUP_LGK)).alias("sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    err = 5 * 1.04 / (2 ** (HLL_ROLLUP_LGK / 2))
    return merged.join(exact, "event_type").select(
        "event_type",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= err
        ).alias("within_bound"),
    )


# --- SCD2 consumer: point-in-time (temporal) join ------------------------------

@query(
    "scd2_point_in_time_join",
    priority=0,
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ),
    chg AS (
      SELECT user_id, event_id, ts, event_type FROM (
        SELECT *, lag(event_type) OVER w AS prev_type
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ) WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    iv AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM chg
    ),
    probes AS (
      SELECT user_id, event_id, ts FROM e WHERE event_type = 'purchase'
    )
    SELECT iv.state AS prior_state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT probes.user_id) AS BIGINT) AS n_users,
           CAST(SUM(probes.event_id) AS BIGINT) AS sum_event_id
    FROM probes JOIN iv
      ON probes.user_id = iv.user_id
     AND probes.ts > iv.valid_from
     AND (iv.valid_to IS NULL OR iv.valid_to >= probes.ts)
    GROUP BY iv.state
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME (temporal) JOIN against the SCD2 dimension: each
    purchase event is matched to the user-state interval valid at the
    instant JUST BEFORE its timestamp — the feature-store lookup ("what
    state was the user in when they decided to buy?"), and the reason
    scd2_user_state builds intervals at all. Probing at ts itself is
    degenerate (the purchase opens or continues a 'purchase' interval, so
    it would always find itself); probing at ts-epsilon is the leak-free
    as-of semantics every feature store specifies. On half-open intervals
    [from, to) the instant before ts is covered exactly when
    ``valid_from < ts AND (valid_to IS NULL OR valid_to >= ts)`` — pure
    interval arithmetic, no epsilon literal. A user whose FIRST event is
    the purchase has no prior interval and drops out of the inner join
    (both engines agree).

    Plan shape: the interval build reuses the SCD2 single-exchange pattern
    (lag-filter and lead both ride one user_id partitioning); the join
    itself is an equi-join ON user_id with the range containment as a
    residual filter — Spark plans SortMergeJoin on the key, and the
    per-user interval list is change-count-sized (orders of magnitude
    smaller than events), so the residual scans a short sorted run per
    probe, never a cross product. Because intervals PARTITION each user's
    timeline from their first event, every probe matches exactly one
    interval — sum_event_id pins that bijection into the hash (a
    double-match or a miss shifts the sum). Aggregation output is
    state-cardinality-sized."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    chg = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .drop("prev_type")
    )
    iv = chg.select(
        F.col("user_id").alias("iv_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = probes.join(
        iv,
        (F.col("user_id") == F.col("iv_user"))
        & (F.col("ts") > F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") >= F.col("ts"))),
    )
    return joined.groupBy(F.col("state").alias("prior_state")).agg(
        F.count("*").alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
    )


# --- gaps-and-islands: longest same-state run per user -------------------------

@query(
    "longest_streak_per_user",
    priority=0,
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ),
    grp AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS island
      FROM e
    ),
    runs AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM grp GROUP BY user_id, event_type, island
    )
    SELECT user_id, run_len AS longest_run, event_type AS longest_type
    FROM (
      SELECT user_id, event_type, run_len,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY run_len DESC, event_type) AS rn
      FROM runs
    ) WHERE rn = 1
    """,
)
def longest_streak_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: the longest run of consecutive same-type events
    per user (streak detection — the canonical pattern for "N failures in
    a row", session quality gates, engagement streaks). Islands are
    labeled by the ROW_NUMBER DIFFERENCE trick: the global per-user
    sequence number minus the per-(user, type) sequence number is constant
    exactly within a consecutive same-type run, so ONE subtraction turns
    runs into group keys — no iterative logic, no self-join, integer-exact
    in both engines.

    Plan: both row_numbers, the run-length aggregation, and the final
    per-user max all partition by user_id (the (user_id, event_type)
    window and groupBys are hash-compatible refinements), so the whole
    query rides a single user-keyed exchange — the sessionize/SCD2 shape
    again. Deterministic tie on equal-length runs: the lexicographically
    first type wins, pinned identically in the oracle via the ordered
    MIN."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    grp = e.withColumn(
        "island", F.row_number().over(w_all) - F.row_number().over(w_typ)
    )
    runs = grp.groupBy("user_id", "event_type", "island").agg(
        F.count("*").alias("run_len")
    )
    w_pick = Window.partitionBy("user_id").orderBy(
        F.desc("run_len"), "event_type"
    )
    return (
        runs.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("run_len").cast("bigint").alias("longest_run"),
            F.col("event_type").alias("longest_type"),
        )
    )


# --- chi-square independence: lang x source contingency ------------------------

# priority=60: with 51 never-driver-verified queries and a 50-slot driver
# window, exactly one must wait for round 6 — this one is the safest to
# defer (single-row output, pinned summation order, oracle-checked in
# pytest every run), so it sorts behind every other never-verified query,
# including the round-4 priority-50 block.
@query(
    "chisq_lang_source",
    priority=60,
    oracle="""
    WITH obs AS (
      SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS o
      FROM documents GROUP BY lang, source
    ),
    margins AS (
      SELECT lang, source, o,
             SUM(o) OVER (PARTITION BY lang) AS row_tot,
             SUM(o) OVER (PARTITION BY source) AS col_tot,
             SUM(o) OVER () AS n
      FROM obs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM((o - row_tot * col_tot / n) * (o - row_tot * col_tot / n)
                     / (row_tot * col_tot / n)), 6) AS chi2
    FROM margins
    """,
)
def chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE INDEPENDENCE TEST over the lang x source contingency
    table — the standard corpus-composition diagnostic ("is language
    distribution independent of the crawl source?") run before fixing
    mixture weights (source_mixture_weights consumes the answer). One
    aggregation builds the contingency cells; the marginals are WINDOW
    sums over the CELL table (lang-count x source-count rows, never the
    corpus), so raw documents are scanned exactly once no matter how many
    margins are needed — at 100 TB the second pass the textbook two-scan
    formulation would burn is the whole cost. Expected counts e = r*c/n
    and the (o-e)^2/e terms are rational arithmetic on integer-valued
    doubles — correctly-rounded IEEE ops, bit-identical across engines
    (registry exactness contract); the final sum adds one term per CELL
    in the deterministic single-partition order of the tiny cell table,
    rounded once."""
    obs = (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("double").alias("o"))
    )
    m = (
        obs.withColumn("row_tot", F.sum("o").over(Window.partitionBy("lang")))
        .withColumn("col_tot", F.sum("o").over(Window.partitionBy("source")))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    # coalesce(1): the cell table is tiny; one partition pins the FP
    # summation order so the rounded chi2 is reproducible bit-for-bit
    return (
        m.select("lang", "source", term.alias("term"))
        .coalesce(1)
        .sortWithinPartitions("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.round(F.sum("term"), 6).alias("chi2"),
        )
    )


# --- z-score outlier detection with decimal-exact moments ----------------------

ZSCORE_K = 3.0  #: flag |value - mean| > K * stddev


# priority=60: fourth deliberate deferral behind the 50-slot driver window
# (see chisq_lang_source) — decimal-exact moments make its hash the most
# environment-independent of the new ops; pytest oracle-checks it every run.
@query(
    "zscore_outliers",
    priority=60,
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, n, s1 / n AS mean,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
      FROM m
    )
    SELECT e.event_type, ANY_VALUE(s.n) AS n,
           ROUND(ANY_VALUE(s.mean), 6) AS mean,
           ROUND(ANY_VALUE(s.sd), 6) AS stddev,
           CAST(SUM(CASE WHEN abs(e.value - s.mean) > {ZSCORE_K} * s.sd
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY e.event_type
    """,
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-SCORE OUTLIER DETECTION per event_type: two-pass mean/stddev gate
    — the anomaly screen a metrics pipeline runs over event values before
    they feed dashboards or training labels. Cross-engine exactness is the
    interesting part: ``stddev_samp`` is UNUSABLE for a hash-verified
    oracle (its partial-aggregation summation order makes the last bits
    partitioning-dependent), so the moments are accumulated as DECIMAL
    sums — value has 2 decimal digits, value^2 exactly 4, so Σv and Σv²
    are EXACT in both engines under any partitioning — and converted to
    double once: mean = s1/n, sd = sqrt((s2 - s1^2/n)/(n-1)), all
    correctly-rounded IEEE ops (sqrt included, unlike ln/pow). The flag
    comparison then evaluates identical doubles on both sides.

    Plan: pass 1 is one group-cardinality aggregation (map-side decimal
    partials); pass 2 re-scans events with the 5-row stats table
    BROADCAST onto it — at 100 TB the fact table streams through twice
    and shuffles ZERO rows (the alternative single-pass
    collect-then-filter materializes nothing either, but two cheap scans
    beat one giant window sort)."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    dec = F.col("value").cast("decimal(18,2)")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    stats = m.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    flagged = ev.join(F.broadcast(stats), "event_type")
    return flagged.groupBy("event_type").agg(
        F.first("n").cast("bigint").alias("n"),
        F.round(F.first("mean"), 6).alias("mean"),
        F.round(F.first("sd"), 6).alias("stddev"),
        F.sum(
            (F.abs(F.col("value") - F.col("mean")) > ZSCORE_K * F.col("sd"))
            .cast("bigint")
        ).alias("n_outliers"),
    )


# --- time-range window frame: rolling 30-day spend per user --------------------

ROLLING_DAYS = 30


# priority=60: deliberately behind the 50-slot driver window alongside
# chisq_lang_source (52 never-verified queries, 50 slots) — exact integer
# cents + pinned RANGE-peer semantics make it the other safest deferral;
# both are oracle-checked in pytest every run and will top round 6's window.
@query(
    "rolling_30d_user_spend",
    priority=60,
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
             RANGE BETWEEN INTERVAL {ROLLING_DAYS} DAYS PRECEDING
                       AND CURRENT ROW
           ) AS BIGINT) AS cents_30d
    FROM events WHERE event_type = 'purchase'
    """,
)
def rolling_30d_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RANGE WINDOW FRAME: each purchase annotated with the user's
    trailing-{ROLLING_DAYS}-day spend — a RANGE frame over EVENT TIME, not
    a ROWS frame over positions (the registry's other windows are all
    rows-framed; this is the one shape that answers "spend in the last N
    days" when events are irregularly spaced). Spark's rangeBetween needs
    a numeric ordering column, so the frame orders by epoch MICROSECONDS
    (``catalog.epoch_us``) with a ±{ROLLING_DAYS}-day bound in µs — value-
    identical to the oracle's INTERVAL frame over the timestamp, including
    the tie rule (RANGE peers share identical order values in both
    engines, so equal-timestamp purchases see each other's spend).

    Plan: one user-keyed exchange, then a per-user time sort; the frame
    is evaluated with a sliding two-pointer pass over each sorted
    partition — O(n) amortized per user, state bounded by the window's
    event count. Spend sums ride exact integer cents (decimal-cast at 2dp
    first), so the rolling totals hash bit-identically. At 100 TB the
    user-day skew story is the same as every user-keyed window here:
    near-uniform key cardinality, AQE handles stragglers."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    us = epoch_us(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us.alias("ord"))
        .rangeBetween(-ROLLING_DAYS * 86_400 * 1_000_000, 0)
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).cast("bigint").alias("cents_30d"),
    )


# --- Markov transition matrix over the per-user event sequence -----------------

@query(
    "event_transition_matrix",
    priority=60,
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ),
    seq AS (
      SELECT event_type AS dst,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS src
      FROM e
    ),
    tc AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE src IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY src), 6) AS p
    FROM tc
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-ORDER MARKOV TRANSITIONS over each user's event sequence:
    count (prev_type -> type) adjacencies and row-normalize into
    transition probabilities — the behavior model behind next-action
    prediction, funnel-drop diagnosis, and bot detection (a user whose
    transition row collapses to one column is a script). One lag window
    on the user-keyed exchange (the sessionize/SCD2/streak shape yet
    again — the fourth operator on that same single shuffle, which is the
    point: at 100 TB these all share one physical layout), then a
    type-pair aggregation whose cardinality is |types|^2 = 25; the
    row-normalizing window runs on that 25-row table, nowhere near the
    data. Ordering ties break on (ts, event_id) as everywhere; p divides
    exact integers and rounds once."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    seq = e.select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    tc = seq.groupBy("src", "dst").agg(F.count("*").cast("bigint").alias("n"))
    row = Window.partitionBy("src")
    return tc.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(row), 6).alias("p"),
    )


# --- RFM segmentation: quintile scores over per-customer order stats -----------

RFM_ANCHOR = "1998-12-31"  #: fixed analysis date (fixture orders end 1998-08)


@query(
    "rfm_segments",
    priority=60,
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey AS c,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       DATE '{RFM_ANCHOR}') AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT c, cents,
             ntile(5) OVER (ORDER BY recency_days ASC, c) AS r,
             ntile(5) OVER (ORDER BY freq DESC, c) AS f,
             ntile(5) OVER (ORDER BY cents DESC, c) AS m
      FROM cust
    )
    SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
             AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM scored GROUP BY 1
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the classic customer-value cube: per customer,
    Recency (days from last order to a FIXED analysis date — a literal,
    not max(orderdate), so the score is reproducible and needs no global
    aggregate), Frequency (order count), Monetary (exact cents); each
    dimension quintiled with ntile(5) and the 3-digit segment code
    aggregated. ntile is deterministic here because every ORDER BY
    carries the custkey tiebreaker — a total order, so both engines
    assign identical quintiles even at value ties (without the
    tiebreaker, ntile on tied values is partitioning luck).

    Plan: one customer-keyed aggregation over orders, then three ntile
    windows over the CUSTOMER-cardinality table. The windows are
    unpartitioned — a deliberate, documented exception to the
    no-global-window rule: ntile needs the global rank, the input is the
    aggregated customer table (orders-of-magnitude smaller than the
    fact), and at 100 TB the standard evolution is quantile BOUNDARIES
    from approx_percentile broadcast as a range join, same output
    contract. Final segment rollup is 125 groups."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.datediff(
            F.lit(RFM_ANCHOR).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        ).alias("recency_days"),
        F.count("*").alias("freq"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("cents"),
    )
    scored = cust.select(
        "c",
        "cents",
        F.ntile(5).over(Window.orderBy(F.asc("recency_days"), "c")).alias("r"),
        F.ntile(5).over(Window.orderBy(F.desc("freq"), "c")).alias("f"),
        F.ntile(5).over(Window.orderBy(F.desc("cents"), "c")).alias("m"),
    )
    return scored.groupBy(
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ).alias("segment")
    ).agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# --- grouping sets: the explicit multi-grain aggregate -------------------------

@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the explicit form completing the multi-grain
    aggregate trio (cube_order_totals enumerates all 2^n grains,
    rollup_revenue the hierarchical prefix chain; GROUPING SETS names
    exactly the grains wanted — here both one-column marginals plus the
    full cross and the grand total, which is NOT a rollup prefix chain).
    ``gid`` (grouping_id) disambiguates a subtotal NULL from a data NULL —
    the contract consumers pivot on. One pass: Spark plans an Expand (one
    input row fans to the 4 grains) feeding a single hash aggregate with
    map-side partials — the same shape as cube, cost proportional to
    |grains| x input, no per-grain rescan. Exact integer cents keep the
    hash engine-identical. Reference parity: the reference computes one
    grain per job (driver.py re-runs the whole pipeline per aggregation);
    this is the multi-grain one-pass replacement."""
    o = table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        o.select("o_orderpriority", "o_orderstatus", cents.alias("cents"))
        .groupingSets(
            [
                ["o_orderpriority", "o_orderstatus"],
                ["o_orderpriority"],
                ["o_orderstatus"],
                [],
            ],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
    )


# --- full-outer join: the one join type not yet in the matrix ------------------

@query(
    "join_full_outer_user_days",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.day, p.day) AS day,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(p.n_purchases, 0) AS n_purchases,
           c.user_id IS NOT NULL AS clicked,
           p.user_id IS NOT NULL AS purchased
    FROM c FULL OUTER JOIN p
      ON c.user_id = p.user_id AND c.day = p.day
    """,
)
def join_full_outer_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the last join type missing from the registry's
    matrix (inner/left/semi/anti/asof/range/bucketed/salted/DPP are
    registered elsewhere): daily click activity against daily purchase
    activity per user, keeping user-days that appear on EITHER side —
    the activity-overlap table funnel/attribution analyses start from.
    Null-handling is the point of the operator: side flags + COALESCEd
    counts make the three populations (click-only, purchase-only, both)
    explicit. Scale shape: both inputs pre-aggregate to (user, day) BEFORE
    the join — the join runs on reduced keyspaces, never raw events, and
    both sides already share the join key's hash partitioning from their
    groupBys, so the join adds no extra exchange; a full-outer can never
    broadcast (both sides must see all keys), making the co-partitioned
    sort-merge the only correct 100 TB plan — which is exactly what
    Catalyst picks."""
    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("timestamp").cast("date")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "day")
        .agg(F.count("*").cast("bigint").alias("n_clicks"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.count("*").cast("bigint").alias("n_purchases"))
    )
    cu, pu = F.col("c.user_id"), F.col("p.user_id")
    return (
        c.alias("c")
        .join(
            p.alias("p"),
            (cu == pu) & (F.col("c.day") == F.col("p.day")),
            "full_outer",
        )
        .select(
            F.coalesce(cu, pu).alias("user_id"),
            F.coalesce(F.col("c.day"), F.col("p.day")).alias("day"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            cu.isNotNull().alias("clicked"),
            pu.isNotNull().alias("purchased"),
        )
    )


# --- two-sample KS drift test: exact integer contract --------------------------

@query(
    "ks_drift_clicks_purchases",
    oracle="""
    WITH s AS (
      SELECT value,
             CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS c1i,
             CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS c2i
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
      GROUP BY value
    ),
    c AS (
      SELECT value,
             SUM(c1i) OVER (ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cum1,
             SUM(c2i) OVER (ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cum2,
             SUM(c1i) OVER () AS n1,
             SUM(c2i) OVER () AS n2
      FROM s
    ),
    d AS (
      SELECT value, n1, n2, ABS(cum1 * n2 - cum2 * n1) AS d_num FROM c
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(MAX(d_num) AS BIGINT) AS d_num,
           CAST(MAX(n1) * MAX(n2) AS BIGINT) AS denom,
           MIN(value) FILTER (d_num = (SELECT MAX(d_num) FROM d)) AS at_value,
           ROUND(CAST(MAX(d_num) AS DOUBLE) / (MAX(n1) * MAX(n2)), 6) AS d
    FROM d
    """,
)
def ks_drift_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV drift test — the distribution-drift
    monitor every production pipeline wants between snapshots/sources,
    here comparing the `value` distribution of clicks vs purchases.
    Exactness trick: the KS statistic D = max_v |F1(v) − F2(v)| is
    computed over the COMMON DENOMINATOR as the integer numerator
    max |c1(v)·n2 − c2(v)·n1| — no float CDFs, no libm, so the driver
    hash-matches bit-exactly; the rounded ratio rides along for humans.
    `at_value` (the smallest value achieving the max) pins determinism
    under ties.

    Distributed shape: the event stream collapses to the per-VALUE type
    table first (one hash shuffle — the only corpus-sized exchange); the
    empirical CDFs are then computed by functions/prefix.py's
    RANGE-PARTITIONED TWO-PASS PREFIX SUMS — per-range running sums plus
    driver-broadcast partition offsets — NOT a single-partition global
    window, so no task ever holds more than its value range even when the
    distinct-value table itself is huge. The final row is one plain
    aggregate (map-side partials; min_by struct tiebreak pins at_value)."""
    from serverless_mapreduce_spark.functions.prefix import prefix_sums

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & F.col("value").isNotNull()
    )
    s = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("c1i"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("c2i"),
    )
    c = prefix_sums(s, "value", ["c1i", "c2i"])
    d = c.select(
        "value",
        F.col("total_c1i").alias("n1"),
        F.col("total_c2i").alias("n2"),
        F.abs(
            F.col("cum_c1i") * F.col("total_c2i")
            - F.col("cum_c2i") * F.col("total_c1i")
        ).alias("d_num"),
    )
    return d.agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.max("d_num").cast("bigint").alias("d_num"),
        (F.max("n1") * F.max("n2")).cast("bigint").alias("denom"),
        F.min_by(
            F.col("value"), F.struct((-F.col("d_num")).alias("a"), "value")
        ).alias("at_value"),
        F.round(
            F.max("d_num").cast("double") / (F.max("n1") * F.max("n2")), 6
        ).alias("d"),
    )


# --- market-basket co-occurrence: top-k recommendations per item ---------------

COOC_TOP_K = 3


@query(
    "item_cooccurrence_topk",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT a AS item, b AS rec, n_orders FROM pairs
      UNION ALL
      SELECT b AS item, a AS rec, n_orders FROM pairs
    ),
    ranked AS (
      SELECT item, rec, n_orders,
             ROW_NUMBER() OVER (PARTITION BY item
                                ORDER BY n_orders DESC, rec) AS rnk
      FROM sym
    )
    SELECT item, rec, n_orders, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {COOC_TOP_K}
    """,
)
def item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET CO-OCCURRENCE top-{COOC_TOP_K} — the
    "customers who bought X also bought" data-prep workload (the counting
    half of association-rule mining; the graph family's edge build with
    COUNTS kept instead of distinct-ed away). Shape: distinct (order,
    item) first — repeat order lines must not inflate support — then the
    pair build as a self-join CO-PARTITIONED on the order key (fanout
    bounded by order width, output O(|lineitem|·width)), one pair-keyed
    count aggregation, symmetrize by union (each direction ranked
    independently), and a per-item row_number window for the top-k —
    item-keyed, so the ranking distributes like any keyed shuffle, with
    the (count DESC, rec ASC) tiebreak making the cut deterministic in
    both engines. The pair counts come from the MAINTAINED co-purchase
    table shared with the graph family (graph._pair_counts — one
    lineitem self-join per session/sf serves all of them). At 100 TB the
    known hazard is the mega-basket (one order with 10⁴ items → 10⁸
    pairs): production caps basket width or samples within oversized
    baskets before the self-join — the same hot-key discipline as the
    LSH posting caps (winnowing_pairs)."""
    from serverless_mapreduce_spark.operators.graph import _pair_counts

    pairs = _pair_counts(spark, sf_dir)
    sym = pairs.select(
        F.col("a").alias("item"), F.col("b").alias("rec"), "n_orders"
    ).unionByName(
        pairs.select(
            F.col("b").alias("item"), F.col("a").alias("rec"), "n_orders"
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("n_orders"), "rec")
    return (
        sym.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= COOC_TOP_K)
        .select("item", "rec", "n_orders", F.col("rnk").cast("bigint"))
    )


# --- association rules: support / confidence / lift -----------------------------

RULE_MIN_SUPPORT = 3   #: orders containing both items


@query(
    "assoc_rules_lift",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM op),
    item AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
      FROM op GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS ante, b.l_partkey AS cons,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT ante, cons, n_both FROM pairs
      UNION ALL
      SELECT cons, ante, n_both FROM pairs
    )
    SELECT s.ante, s.cons, s.n_both,
           ia.n_item AS n_ante, ic.n_item AS n_cons,
           ROUND(CAST(s.n_both AS DOUBLE) / ia.n_item, 6) AS confidence,
           ROUND(CAST(s.n_both * n.n_orders AS DOUBLE)
                 / (ia.n_item * ic.n_item), 6) AS lift
    FROM sym s
    JOIN item ia ON ia.l_partkey = s.ante
    JOIN item ic ON ic.l_partkey = s.cons
    CROSS JOIN n
    WHERE s.n_both >= {RULE_MIN_SUPPORT}
    """,
)
def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSOCIATION RULES (ante → cons) with support / confidence / lift —
    the scoring half of market-basket mining on top of the
    item_cooccurrence_topk counting plan. Exactness: every statistic is a
    ratio of exact integers (n_both, per-item order counts, the global
    basket count), divided ONCE as doubles and rounded ONCE — plus the
    raw integers ride along, so the driver hash pins the counts even if a
    consumer re-derives the ratios at different precision. The global
    basket count enters via a scalar subquery (no 1-row crossJoin on the
    Spark side — the plan lint forbids BroadcastNestedLoopJoin).

    Scale shape: the pair counts come from the MAINTAINED co-purchase
    table shared with the graph family and item_cooccurrence_topk
    (graph._pair_counts); the two item-count joins are ITEM-keyed
    against a vocabulary-sized table — at this fixture AQE broadcasts it,
    at 100 TB it hash-joins on the item key; the min-support filter cuts
    the rule set before the joins. Same mega-basket cap caveat as
    item_cooccurrence_topk."""
    from serverless_mapreduce_spark.caching import persist_tracked
    from serverless_mapreduce_spark.operators.graph import _pair_counts

    op = persist_tracked(
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = op.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_item")
    )
    pairs = (
        _pair_counts(spark, sf_dir)
        .select(
            F.col("a").alias("ante"),
            F.col("b").alias("cons"),
            F.col("n_orders").alias("n_both"),
        )
        .filter(F.col("n_both") >= RULE_MIN_SUPPORT)
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("cons").alias("ante"), F.col("ante").alias("cons"), "n_both"
        )
    )
    from serverless_mapreduce_spark.catalog import unique_view

    view = unique_view(op, "rules_op")
    n_orders = F.expr(
        f"(SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM {view})"
    )
    out = (
        sym.join(
            item.select(
                F.col("l_partkey").alias("ante"), F.col("n_item").alias("n_ante")
            ),
            "ante",
        )
        .join(
            item.select(
                F.col("l_partkey").alias("cons"), F.col("n_item").alias("n_cons")
            ),
            "cons",
        )
        .withColumn("n_orders", n_orders)
    )
    result = out.select(
        "ante",
        "cons",
        "n_both",
        "n_ante",
        "n_cons",
        F.round(F.col("n_both").cast("double") / F.col("n_ante"), 6).alias(
            "confidence"
        ),
        F.round(
            (F.col("n_both") * F.col("n_orders")).cast("double")
            / (F.col("n_ante") * F.col("n_cons")),
            6,
        ).alias("lift"),
    )
    return result


# --- item-item Jaccard similarity (collaborative-filtering prep) ----------------

SIM_TOP_K = 5


@query(
    "item_similarity_jaccard_topk",
    priority=150,
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    item AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM op GROUP BY 1
    ),
    sym AS (
      SELECT a AS i, b AS j, n_both FROM pairs
      UNION ALL
      SELECT b AS i, a AS j, n_both FROM pairs
    ),
    scored AS (
      SELECT s.i, s.j, s.n_both, ii.n_item AS n_i, jj.n_item AS n_j
      FROM sym s
      JOIN item ii ON ii.l_partkey = s.i
      JOIN item jj ON jj.l_partkey = s.j
    )
    SELECT i, j, n_both,
           CAST(FLOOR(CAST(n_both AS DOUBLE) * 1000000
                / (n_i + n_j - n_both)) AS BIGINT) AS jaccard_micro,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY i
               ORDER BY CAST(n_both AS DOUBLE) / (n_i + n_j - n_both) DESC, j
             ) AS rnk
      FROM scored
    ) WHERE rnk <= {SIM_TOP_K}
    """,
)
def item_similarity_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM-ITEM JACCARD SIMILARITY top-{SIM_TOP_K} — the classic
    neighborhood model behind "customers also bought" and the standard
    item-sim feature in recommender training data: J(i,j) =
    |baskets(i) ∩ baskets(j)| / |baskets(i) ∪ baskets(j)|, computed
    entirely from counts — n_both from the SHARED materialized co-purchase
    pair table (graph._pair_counts, basket-width-capped, one build per
    session serves five consumers now), n_i/n_j from one item-keyed count.
    No new basket self-join: the expensive exchange is amortized across
    the family. Union size by inclusion-exclusion (n_i + n_j - n_both);
    RANKING compares the raw IEEE ratio (identical doubles both engines)
    and the OUTPUT is FLOOR micro-units of it (the ROUND-tie lesson:
    integer ratios can land on decimal-string ties). Per-item
    top-{SIM_TOP_K} via
    window; Spark 3.5+ pushes the rank filter down as WindowGroupLimit
    (partial top-k before the shuffle, the scalable form)."""
    from serverless_mapreduce_spark.operators.graph import _pair_counts

    pairs = _pair_counts(spark, sf_dir).withColumnRenamed("n_orders", "n_both")
    op = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    from serverless_mapreduce_spark.caching import persist_tracked

    # persisted: BOTH broadcast builds below consume it — unpersisted, the
    # lineitem distinct + count chain runs twice (one full fact shuffle each)
    item = persist_tracked(
        op.groupBy("l_partkey").agg(F.count("*").cast("bigint").alias("n_item"))
    )
    sym = pairs.select(
        F.col("a").alias("i"), F.col("b").alias("j"), "n_both"
    ).unionByName(
        pairs.select(F.col("b").alias("i"), F.col("a").alias("j"), "n_both")
    )
    scored = (
        sym.join(
            item.select(F.col("l_partkey").alias("i"), F.col("n_item").alias("n_i")),
            "i",
        )
        .join(
            item.select(F.col("l_partkey").alias("j"), F.col("n_item").alias("n_j")),
            "j",
        )
        .withColumn(
            "sim_raw",
            F.col("n_both").cast("double")
            / (F.col("n_i") + F.col("n_j") - F.col("n_both")),
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("sim_raw"), F.asc("j"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= SIM_TOP_K)
        .select(
            "i",
            "j",
            "n_both",
            # same op ORDER as the oracle (multiply, then divide): the
            # raw ratio * 1e6 differs in the last ulp from (n*1e6)/d
            F.floor(
                F.col("n_both").cast("double")
                * 1000000
                / (F.col("n_i") + F.col("n_j") - F.col("n_both"))
            )
            .cast("bigint")
            .alias("jaccard_micro"),
            "rnk",
        )
    )


# --- shuffle-key skew profiling -------------------------------------------------

@query(
    "key_skew_profile",
    priority=150,
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_orderkey
    ),
    dist AS (
      SELECT cnt, CAST(COUNT(*) AS BIGINT) AS n_keys FROM per_key GROUP BY cnt
    )
    SELECT cnt, n_keys,
           CAST(FLOOR(CAST(n_keys AS DOUBLE) * 1000000
                 / (SELECT COUNT(*) FROM per_key)) AS BIGINT) AS key_frac_micro
    FROM dist
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE-KEY SKEW PROFILE — the diagnostic you run BEFORE choosing a
    join/agg strategy at 100 TB: the count-of-counts distribution of rows
    per key (here lineitem's order key, the engine's hottest join key).
    The output is tiny (one row per distinct per-key cardinality) and
    exact, unlike a sampled sketch: a power-law key set shows up as a long
    cnt tail, which is precisely the signal that routes a plan to salting
    / AQE skew handling (skew_salted_join) instead of a plain hash join.
    Two cheap aggregations — per-key count (map-side partials), then a
    count keyed by the count — nothing driver-side; the key fraction is
    FLOOR micro-units of the exact integer ratio (deterministic across
    engines, per the classifier-score ROUND-tie lesson)."""
    per_key = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    from serverless_mapreduce_spark.caching import persist_tracked

    per_key = persist_tracked(per_key)  # feeds dist AND the total below
    total = per_key.count()
    return (
        per_key.groupBy("cnt")
        .agg(F.count("*").cast("bigint").alias("n_keys"))
        .select(
            "cnt",
            "n_keys",
            F.floor(F.col("n_keys").cast("double") * 1000000 / F.lit(total))
            .cast("bigint")
            .alias("key_frac_micro"),
        )
    )


# --- time-series gap fill: LOCF + linear interpolation --------------------------

@query(
    "gapfill_interpolate",
    priority=150,
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_val
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM c GROUP BY 1),
    s AS (
      SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM r
    ),
    grid AS (
      SELECT s.event_type, CAST(epoch(s.hr) AS BIGINT) // 3600 AS hr_idx,
             c.avg_val
      FROM s LEFT JOIN c ON s.event_type = c.event_type AND s.hr = c.hr
    ),
    anchored AS (
      SELECT event_type, hr_idx, avg_val,
             last_value(avg_val IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hr_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
             last_value(CASE WHEN avg_val IS NOT NULL THEN hr_idx END
                        IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hr_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_hr,
             first_value(avg_val IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hr_idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
             first_value(CASE WHEN avg_val IS NOT NULL THEN hr_idx END
                         IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hr_idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_hr
      FROM grid
    )
    SELECT event_type, hr_idx,
           (avg_val IS NOT NULL) AS observed,
           CAST(FLOOR(prev_val * 1000000) AS BIGINT) AS locf_micro,
           CAST(FLOOR(
             CASE
               WHEN avg_val IS NOT NULL THEN avg_val
               WHEN prev_val IS NULL THEN next_val
               WHEN next_val IS NULL THEN prev_val
               ELSE prev_val + (next_val - prev_val)
                    * (CAST(hr_idx - prev_hr AS DOUBLE)
                       / CAST(next_hr - prev_hr AS DOUBLE))
             END * 1000000) AS BIGINT) AS interp_micro
    FROM anchored
    """,
)
def gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with VALUES, not just zero counts: hourly
    mean event value per type on the dense lo..hi hour grid, absent hours
    filled two ways — LOCF (last observation carried forward, the
    monitoring default) and LINEAR INTERPOLATION between the neighboring
    observed hours (the feature-pipeline default; TimescaleDB's
    locf()/interpolate() pair). Distributed shape: the dense grid is one
    per-type sequence explode (gapfill_hourly_counts' plan); both fills
    come from ONE window pass each way — running last-non-null forward,
    first-non-null backward — so the whole operator is two sorts within
    the per-type partitions, no self-join against the observed subset.
    Leading-edge gaps take the next observation, trailing-edge gaps the
    previous (interp); LOCF is NULL before the first observation.
    Exactness: observed means divide the exact decimal sum once; the
    interpolation weight is IEEE (i/k) with the identical expression both
    sides, and outputs are FLOOR(x·1e6) micro-units — deterministic where
    a ROUND of these often-clean rationals is not (the classifier-score
    lesson)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    c = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_val")
        )
    )
    r = c.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    s = r.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    grid = s.join(c, ["event_type", "hr"], "left").select(
        "event_type",
        (F.unix_timestamp("hr") / 3600).cast("bigint").alias("hr_idx"),
        "avg_val",
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("hr_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hr_idx")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    hr_if_obs = F.when(F.col("avg_val").isNotNull(), F.col("hr_idx"))
    anch = grid.select(
        "event_type",
        "hr_idx",
        "avg_val",
        F.last("avg_val", ignorenulls=True).over(wb).alias("prev_val"),
        F.last(hr_if_obs, ignorenulls=True).over(wb).alias("prev_hr"),
        F.first("avg_val", ignorenulls=True).over(wf).alias("next_val"),
        F.first(hr_if_obs, ignorenulls=True).over(wf).alias("next_hr"),
    )
    interp = (
        F.when(F.col("avg_val").isNotNull(), F.col("avg_val"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(
            F.col("prev_val")
            + (F.col("next_val") - F.col("prev_val"))
            * (
                (F.col("hr_idx") - F.col("prev_hr")).cast("double")
                / (F.col("next_hr") - F.col("prev_hr")).cast("double")
            )
        )
    )
    return anch.select(
        "event_type",
        "hr_idx",
        F.col("avg_val").isNotNull().alias("observed"),
        F.floor(F.col("prev_val") * 1000000).cast("bigint").alias("locf_micro"),
        F.floor(interp * 1000000).cast("bigint").alias("interp_micro"),
    )


# --- exact global order statistics ----------------------------------------------

QUANTILE_PCTS = (25, 50, 75, 90, 99)


@query(
    "exact_global_quantiles",
    priority=150,
    oracle=f"""
    WITH ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn
      FROM events
    ),
    n AS (SELECT COUNT(*) AS n FROM events)
    SELECT p.pct,
           (p.pct * n.n + 99) // 100 AS k,
           (SELECT value FROM ranked
            WHERE rn = (p.pct * n.n + 99) // 100) AS value
    FROM (SELECT CAST(UNNEST([{', '.join(str(p) for p in QUANTILE_PCTS)}])
                 AS INT) AS pct) p, n
    """,
)
def exact_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles (k-th smallest, k = ceil(p·n/100)) of
    events.value — the order statistic a plain ``ORDER BY`` computes by
    funneling every row through one partition, done instead with the
    range-partitioned two-pass prefix-sum primitive (functions/prefix.py):
    group values (one value-keyed shuffle, dup-safe), running counts per
    contiguous value range, then each requested k resolves to
    ``min(value) where cum_cnt >= k`` — expressed as ONE conditional
    aggregation over the prefix frame (no inequality join, no
    BroadcastNestedLoop, no global sort). approx_quantiles_bounded is the
    sketch answer with error bars; this is the exact answer at one extra
    shuffle — the pair a 100 TB deployment chooses between. The total
    count is a 1-row driver scalar (the documented pattern); k uses pure
    integer ceil arithmetic, and the output VALUE is an element of the
    data (no derived float at all), so the hash is trivially exact."""
    from serverless_mapreduce_spark.functions.prefix import prefix_sums

    ev = table(spark, sf_dir, "events")
    n = ev.count()
    vc = ev.groupBy("value").agg(F.count("*").cast("bigint").alias("cnt"))
    pref = prefix_sums(vc, "value", ["cnt"])
    ks = {p: (p * n + 99) // 100 for p in QUANTILE_PCTS}
    aggs = [
        F.min(F.when(F.col("cum_cnt") >= F.lit(k), F.col("value"))).alias(
            f"v{p}"
        )
        for p, k in ks.items()
    ]
    wide = pref.agg(*aggs)
    stack = ", ".join(f"{p}, {ks[p]}L, v{p}" for p in QUANTILE_PCTS)
    return wide.select(
        F.expr(
            f"stack({len(QUANTILE_PCTS)}, {stack}) as (pct, k, value)"
        )
    )


# --- robust outliers: median absolute deviation ----------------------------------

MAD_K_SIGMA = 3          #: flag |x - median| > MAD_K_SIGMA * 1.4826 * MAD


@query(
    "mad_outlier_events",
    priority=150,
    oracle=f"""
    WITH ranked AS (
      SELECT value, event_id,
             ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM events
    ),
    med AS (
      SELECT value AS median FROM ranked WHERE rn = (n + 1) // 2
    ),
    dev_ranked AS (
      SELECT ABS(e.value - m.median) AS dev,
             ROW_NUMBER() OVER (ORDER BY ABS(e.value - m.median), e.event_id)
               AS rn,
             COUNT(*) OVER () AS n
      FROM events e, med m
    ),
    mad AS (SELECT dev AS mad FROM dev_ranked WHERE rn = (n + 1) // 2)
    SELECT e.event_id, e.user_id, e.value,
           CAST(FLOOR(ABS(e.value - m.median) * 1000000) AS BIGINT)
             AS abs_dev_micro
    FROM events e, med m, mad d
    WHERE ABS(e.value - m.median) > {MAD_K_SIGMA} * 1.4826 * d.mad
    """,
)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier detection by MEDIAN ABSOLUTE DEVIATION — the
    heavy-tail-safe twin of zscore_outliers (mean/std are themselves
    dragged by the outliers they're meant to find; median/MAD are not).
    Two EXACT order statistics — the value median, then the median of
    absolute deviations — each computed with the range-partitioned
    prefix-count trick (exact_global_quantiles' plan: group values, range
    prefix counts, min value with cum >= k), never a global single-
    partition sort; the two medians are 1-row driver scalars and the flag
    pass is one fused scan. Exactness: the medians are data elements, the
    deviation is one subtraction + ABS on identical IEEE doubles, the
    threshold compare is the same double expression both engines, and the
    output deviation is FLOOR micro-units (ROUND-tie lesson)."""
    from serverless_mapreduce_spark.functions.prefix import prefix_sums

    ev = table(spark, sf_dir, "events")
    n = ev.count()
    k = (n + 1) // 2

    def exact_median(col_df, colname):
        vc = col_df.groupBy(colname).agg(
            F.count("*").cast("bigint").alias("cnt")
        )
        pref = prefix_sums(vc, colname, ["cnt"])
        row = pref.filter(F.col("cum_cnt") >= k).agg(
            F.min(colname)
        ).collect()[0]
        return row[0]

    median = exact_median(ev.select("value"), "value")
    dev = ev.select(
        (F.abs(F.col("value") - F.lit(median))).alias("dev")
    )
    mad = exact_median(dev, "dev")
    thresh = MAD_K_SIGMA * 1.4826 * mad
    return ev.filter(
        F.abs(F.col("value") - F.lit(median)) > F.lit(thresh)
    ).select(
        "event_id",
        "user_id",
        "value",
        F.floor(F.abs(F.col("value") - F.lit(median)) * 1000000)
        .cast("bigint")
        .alias("abs_dev_micro"),
    )


# --- Pareto / Lorenz curve of customer revenue -----------------------------------

@query(
    "pareto_revenue_share",
    priority=150,
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS revc
      FROM orders GROUP BY o_custkey
    ),
    grp AS (
      SELECT revc, CAST(COUNT(*) AS BIGINT) AS n_cust FROM cust GROUP BY revc
    ),
    cum AS (
      SELECT revc, n_cust,
             SUM(n_cust) OVER (ORDER BY revc DESC) AS cum_cust,
             SUM(revc * n_cust) OVER (ORDER BY revc DESC) AS cum_revc,
             SUM(revc * n_cust) OVER () AS total_revc
      FROM grp
    )
    SELECT revc AS rev_cents, n_cust,
           CAST(cum_cust AS BIGINT) AS cum_cust,
           CAST(cum_revc AS BIGINT) AS cum_rev_cents,
           CAST(FLOOR(CAST(cum_revc AS DOUBLE) * 1000000 / total_revc)
                AS BIGINT) AS rev_share_micro
    FROM cum
    """,
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO / LORENZ CURVE of customer revenue — "the top k customers
    hold what share of revenue", the concentration analysis behind
    80/20 dashboards and sampling decisions: customers aggregate to exact
    integer CENTS, collapse to revenue-value groups (unique keys, so ties
    never straddle a row), and the DESCENDING cumulative customer count
    and revenue come from the range-partitioned two-pass prefix sums
    (functions/prefix.py, ordered on the negated cents key) — the same
    global running total a naive ``SUM() OVER (ORDER BY …)`` would funnel
    through one partition. Everything is integer until the single share
    division, emitted as FLOOR micro-units (ROUND-tie lesson) with the
    identical multiply-then-divide order in both engines."""
    from serverless_mapreduce_spark.functions.prefix import prefix_sums

    cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("revc")
        )
    )
    grp = cust.groupBy("revc").agg(
        F.count("*").cast("bigint").alias("n_cust")
    )
    pref = prefix_sums(
        grp.select(
            "revc",
            "n_cust",
            (-F.col("revc")).alias("_negkey"),
            (F.col("revc") * F.col("n_cust")).alias("wrev"),
        ),
        "_negkey",
        ["n_cust", "wrev"],
    )
    return pref.select(
        F.col("revc").alias("rev_cents"),
        "n_cust",
        F.col("cum_n_cust").alias("cum_cust"),
        F.col("cum_wrev").alias("cum_rev_cents"),
        F.floor(
            F.col("cum_wrev").cast("double") * 1000000 / F.col("total_wrev")
        )
        .cast("bigint")
        .alias("rev_share_micro"),
    )


# --- exponentially-weighted moving average (true recurrence) -----------------

def _tdiv2(s: int) -> int:
    """Integer (s / 2) TRUNCATED TOWARD ZERO — the semantics of DuckDB's
    ``//`` on BIGINT, which the EWMA oracles use. Python's ``//`` FLOORS
    instead, and the two diverge on negative sums (-7 // 2: Python -4,
    DuckDB -3) — a silent 1-cent oracle mismatch the moment a fixture
    carries refunds/chargebacks. Keeping the recurrence truncating on
    both sides makes the contract sign-safe, not fixture-contingent."""
    return s // 2 if s >= 0 else -((-s) // 2)



@query(
    "ewma_user_spend",
    priority=150,
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT o_custkey AS custkey,
             strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS spend_cents
      FROM orders GROUP BY 1, 2
    ),
    seq AS (
      SELECT custkey, day, spend_cents,
             ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY day) AS rn
      FROM daily
    ),
    ewma AS (
      SELECT custkey, day, spend_cents, spend_cents AS ewma_cents, rn
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.custkey, s.day, s.spend_cents,
             (e.ewma_cents + s.spend_cents) // 2 AS ewma_cents, s.rn
      FROM ewma e
      JOIN seq s ON s.custkey = e.custkey AND s.rn = e.rn + 1
    )
    SELECT custkey, day, spend_cents, ewma_cents FROM ewma
    """,
)
def ewma_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA of per-customer daily spend — a TRUE SEQUENTIAL RECURRENCE
    (e_t = f(e_{t-1}, x_t)), the one time-series shape no window
    function expresses: rolling_30d is a frame aggregate and gapfill's
    LOCF is last_value, but EWMA's state feeds back into itself.
    Batch twin of the streaming ``applyInPandasWithState`` operator.
    NOT ``groupBy().applyInPandas`` — that pays a per-group pandas-frame
    construction for every customer (measured 13.9 s at sf0.1: ~15k
    tiny groups × fixed Arrow/pandas overhead dwarfs the actual math).
    Instead: repartition by custkey + sortWithinPartitions(custkey, day)
    lays every customer's series out contiguously and ordered inside a
    partition, then ONE ``mapInPandas`` pass runs the recurrence as a
    partition-level scan, carrying (key, state) across Arrow batch
    boundaries — same single shuffle, zero per-group overhead,
    embarrassingly parallel across partitions; sequential only within a
    customer's own days, which is the irreducible data dependency. At
    100 TB per-group series length is bounded (days per customer), so
    no key outgrows a partition's scan.

    Exactness (ROUND-tie lesson): alpha = 1/2 in INTEGER CENTS with
    division truncated toward zero (DuckDB ``//`` semantics; see
    _tdiv2) — e_t = trunc((e_{t-1} + x_t) / 2) — so every value is an
    exact
    bigint in both engines (the oracle is a per-customer recursive CTE
    advancing all customers one row per round); no float ever exists.
    Spend per day uses the decimal-cent sum contract from module top."""
    import pandas as pd

    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
            )
            .cast("bigint")
            .alias("spend_cents")
        )
    )

    def ewma_scan(batches):
        # partition-level recurrence: rows arrive grouped by custkey and
        # ordered by day (repartition + sortWithinPartitions below);
        # (key, state) carries across Arrow batch boundaries.
        key, prev = None, 0
        for pdf in batches:
            out = []
            for k, x in zip(pdf["custkey"], pdf["spend_cents"]):
                x = int(x)
                prev = x if k != key else _tdiv2(prev + x)
                key = k
                out.append(prev)
            pdf["ewma_cents"] = pd.Series(out, dtype="int64")
            yield pdf

    return (
        daily.repartition("custkey")
        .sortWithinPartitions("custkey", "day")
        .mapInPandas(
            ewma_scan,
            "custkey bigint, day string, spend_cents bigint, ewma_cents bigint",
        )
    )


# --- time-weighted average (TWAP) --------------------------------------------

@query(
    "time_weighted_avg_user",
    priority=150,
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
             epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS tn
      FROM events
    ),
    agg AS (
      SELECT user_id,
             SUM(vc * (tn - t)) AS swc,
             SUM(tn - t) AS sd,
             CAST(COUNT(*) AS BIGINT) AS n_intervals
      FROM seq WHERE tn IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_intervals, CAST(sd AS BIGINT) AS held_us,
           CAST(FLOOR(CAST(swc AS DOUBLE) * 10.0 / CAST(sd AS DOUBLE))
                AS BIGINT) AS twap_milli
    FROM agg WHERE sd > 0
    """,
)
def time_weighted_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average of an irregularly-sampled series (TWAP /
    TimescaleDB ``time_weight``): each observation holds until the next
    one, so its weight is the HOLD DURATION, not 1 — the correct average
    for sensor readings, prices, or rates sampled on activity rather
    than on a clock (a plain AVG over-weights bursts). Plan: one window
    pass (LEAD on the user's timeline gives each reading its hold
    interval — last-value-holds-until-next, the step-function
    convention), then one hash aggregation; both are user_id-partitioned
    so the single exchange is reused, same as sessionize_events. The
    final reading has no successor and carries zero weight in both
    engines. Tie-safe: equal timestamps are ordered by event_id in both
    engines, so LEAD pairs identically.

    Exactness: value cents x hold micros accumulate as exact BIGINT
    products (bounded: cents < 1e4, series span < 1e13 us, sum < 1e17
    << 2^63); the output is FLOOR of one IEEE double multiply+divide on
    those identical bigints — deterministic cross-engine (ROUND-tie
    lesson, registry docstring)."""
    spark = utc_session(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("vc"),
        epoch_us(F.col("ts")).alias("t"),
        F.lead(epoch_us(F.col("ts"))).over(w).alias("tn"),
    )
    return (
        seq.filter(F.col("tn").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum((F.col("tn") - F.col("t"))).alias("held_us"),
            F.sum(F.col("vc") * (F.col("tn") - F.col("t"))).alias("_swc"),
        )
        # a user whose events all share one timestamp has zero total hold
        # time — no time-weighted average exists (0/0); drop them in both
        # engines rather than diverging on NaN handling
        .filter(F.col("held_us") > 0)
        .select(
            "user_id",
            "n_intervals",
            "held_us",
            F.floor(
                F.col("_swc").cast("double") * 10.0
                / F.col("held_us").cast("double")
            )
            .cast("bigint")
            .alias("twap_milli"),
        )
    )


# --- weight-proportional (Poisson) sampling ----------------------------------

#: Bits of md5 used as the uniform draw for weighted sampling. 40 bits
#: keeps every cross-multiplied compare inside BIGINT: U < 2^40 and
#: cent-weights < 2^17 (fixture max ~49k cents), so both products stay
#: < 2^57 with headroom.
_WS_BITS = 40


@query(
    "weighted_sample_events",
    priority=150,
    oracle=f"""
    WITH w AS (
      SELECT event_id, user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents,
             CAST(concat('0x',
               substr(md5(CAST(event_id AS VARCHAR) || ':ws'), 1, 10))
               AS BIGINT) AS u
      FROM events
    )
    SELECT event_id, user_id, value_cents
    FROM w
    WHERE u * (SELECT MAX(value_cents) FROM w)
          < value_cents * {1 << _WS_BITS}
    """,
)
def weighted_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT-PROPORTIONAL Poisson sampling: each event is kept with
    probability value_i / max(value) — the map-side sampling primitive
    for importance-weighted training mixes (quota and stratified
    sampling pick BY GROUP; this picks BY ROW WEIGHT). Fully
    distributed: after one scalar max (a 1-row aggregate), the keep
    decision is a per-row integer compare — no shuffle, no rank window,
    no state — so it runs at scan speed on 100 TB and composes with any
    downstream op. Deterministic and auditable (the run can be replayed
    and the exact member set re-derived): the uniform draw is the top
    40 bits of md5(event_id), salted ':ws' to decorrelate from every
    other md5 derivation in the repo. Exactness: keep iff
    u * max_cents < cents * 2^40 — integer cross-multiplication
    (registry contract: never a float ratio), both products < 2^63.
    Expected sample size is sum(w)/max(w); the A-Res/A-ExpJ reservoir
    family gives EXACT-k weighted samples but needs a per-item
    log/pow draw (non-deterministic cross-engine) and a global top-k —
    this Poisson form is the oracle-checkable, shuffle-free variant."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )
    max_cents = ev.agg(F.max("value_cents")).collect()[0][0]  # 1-row scalar
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":ws"))),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    return ev.filter(
        u * F.lit(max_cents) < F.col("value_cents") * F.lit(1 << _WS_BITS)
    ).select("event_id", "user_id", "value_cents")


# --- one-pass Pearson correlation matrix -------------------------------------

_CORR_COLS = ("quantity", "extendedprice", "discount", "tax")


def _corr_oracle() -> str:
    """All six pairwise correlations from ONE aggregation of exact
    decimal sums; the corr arithmetic below is kept CHARACTER-IDENTICAL
    to the Spark expression (same casts, same operand order) so the
    IEEE doubles match bitwise (every op — *, -, /, sqrt — is correctly
    rounded, so identical inputs + identical order = identical bits)."""
    units = {
        "quantity": "l_quantity",
        "extendedprice": "l_extendedprice",
        "discount": "l_discount",
        "tax": "l_tax",
    }
    cols = ", ".join(
        f"CAST(CAST({src} AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS {u}"
        for u, src in units.items()
    )
    aggs = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for u in _CORR_COLS:
        aggs.append(f"CAST(SUM({u}) AS DOUBLE) AS s_{u}")
        aggs.append(f"CAST(SUM({u} * {u}) AS DOUBLE) AS ss_{u}")
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(f"CAST(SUM({a} * {b}) AS DOUBLE) AS sp_{a}_{b}")
    corr_rows = ", ".join(
        f"('{a}~{b}', CAST(FLOOR(1000000.0 * "
        f"(n * sp_{a}_{b} - s_{a} * s_{b}) / "
        f"(sqrt(n * ss_{a} - s_{a} * s_{a}) * "
        f"sqrt(n * ss_{b} - s_{b} * s_{b}))) AS BIGINT))"
        for a, b in pairs
    )
    return f"""
    WITH u AS (SELECT {cols} FROM lineitem),
    agg AS (SELECT {", ".join(aggs)} FROM u)
    SELECT p.* FROM agg, (VALUES {corr_rows}) AS _v,
    LATERAL (SELECT _v.col0 AS pair, _v.col1 AS corr_micro) p
    """


@query("corr_matrix_lineitem", priority=150, oracle=_corr_oracle())
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise PEARSON CORRELATION matrix of the four lineitem measures
    in ONE PASS — the profiling step before feature selection or drift
    modeling: all 14 sufficient statistics (n, 4 sums, 4 sums of
    squares, 6 cross-products) come from a single scan + single
    partial+final aggregation (no shuffle of raw rows, one 1-row
    exchange of partials), then the 6 correlations are pure arithmetic
    on that one row, unpivoted with ``stack``. ``df.stat.corr`` computes
    ONE pair per pass; at 100 TB re-scanning per pair is the difference
    between 1 scan and C(k,2) scans. Exactness: unit sums are exact
    DECIMAL integers (cents), and the correlation arithmetic is
    CHARACTER-IDENTICAL across engines over doubles cast from those
    exact sums — every IEEE op is correctly rounded, so the bits match
    and FLOOR micro-units can't straddle (ROUND-tie lesson; sqrt is
    IEEE-exact, unlike ln/exp)."""
    li = table(spark, sf_dir, "lineitem")
    units = {
        "quantity": "l_quantity",
        "extendedprice": "l_extendedprice",
        "discount": "l_discount",
        "tax": "l_tax",
    }
    u = li.select(
        *[
            (F.col(src).cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)")
            .alias(name)
            for name, src in units.items()
        ]
    )
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(c).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(c) * F.col(c)).cast("double").alias(f"ss_{c}")
        )
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(
            F.sum(F.col(a) * F.col(b)).cast("double").alias(f"sp_{a}_{b}")
        )
    agg = u.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}~{b}', CAST(FLOOR(1000000.0 * "
        f"(n * sp_{a}_{b} - s_{a} * s_{b}) / "
        f"(sqrt(n * ss_{a} - s_{a} * s_{a}) * "
        f"sqrt(n * ss_{b} - s_{b} * s_{b}))) AS BIGINT)"
        for a, b in pairs
    )
    return agg.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (pair, corr_micro)"
    )


# --- seasonal-baseline residual outliers -------------------------------------

#: Residual threshold in cents: an event is anomalous for its hour-of-day
#: when its value deviates from that hour's mean by more than this.
SEASONAL_RESID_CENTS = 3000


@query(
    "seasonal_residual_outliers",
    priority=150,
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(strftime(ts, '%H') AS INTEGER) AS hod,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM events
    ),
    base AS (
      SELECT hod, SUM(vc) AS sh, CAST(COUNT(*) AS BIGINT) AS nh
      FROM ev GROUP BY hod
    )
    SELECT event_id, user_id, event_type, e.hod, vc,
           CAST(FLOOR(CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE)) AS BIGINT)
             AS hour_mean_cents_floor
    FROM ev e JOIN base b ON e.hod = b.hod
    WHERE abs(vc * nh - sh) > {SEASONAL_RESID_CENTS} * nh
    """,
)
def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONALITY-AWARE outlier detection: score each event against the
    mean of its OWN hour-of-day, not the global center — the
    seasonal-naive residual model that catches a $40 value at 3am (quiet
    hour) that zscore/MAD's global statistics would wave through, and
    vice versa. Plan: one tiny 24-row baseline aggregate (hour-of-day →
    sum, count) joined back broadcast-style into a second scan — the
    classic two-pass profile-then-flag shape (same as zscore_outliers),
    keyed so finely that the baseline is negligible at any scale; the
    flag pass is pure codegen. Exactness: the deviation test is integer
    cross-multiplication (|vc*nh - sh| > T*nh — never a float mean
    compare; registry contract), bounded well inside BIGINT (sh < 2^40
    at sf1k); the reported floor-mean is FLOOR of one IEEE divide on
    identical bigints. TZ pinned so hour buckets match the naive-ts
    oracle."""
    spark = utc_session(spark)
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.hour("ts").alias("hod"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("vc"),
    )
    base = ev.groupBy("hod").agg(
        F.sum("vc").alias("sh"), F.count("*").cast("bigint").alias("nh")
    )
    return (
        ev.join(F.broadcast(base), "hod")
        .filter(
            F.abs(F.col("vc") * F.col("nh") - F.col("sh"))
            > F.lit(SEASONAL_RESID_CENTS) * F.col("nh")
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            "hod",
            "vc",
            F.floor(F.col("sh").cast("double") / F.col("nh").cast("double"))
            .cast("bigint")
            .alias("hour_mean_cents_floor"),
        )
    )


# --- last-touch marketing attribution ----------------------------------------

#: Attribution lookback window: a purchase credits the most recent click
#: within this many hours, else it counts as 'direct'.
ATTRIB_WINDOW_HOURS = 24


@query(
    "attribution_last_touch",
    priority=150,
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_us
      FROM events
    )
    SELECT user_id,
           CASE WHEN last_click_us IS NOT NULL
                 AND epoch_us(ts) - last_click_us
                     <= CAST({ATTRIB_WINDOW_HOURS} AS BIGINT) * 3600 * 1000000
                THEN 'click' ELSE 'direct' END AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION: each purchase credits the user's most
    recent click STRICTLY BEFORE it (by timestamp) within a 24h
    lookback, else counts as 'direct' — the event-sequence join every
    growth pipeline runs. NOT a join at all in this plan: a purchase
    needs the latest preceding click, which is one running
    MAX(CASE WHEN click THEN epoch END) over a RANGE frame ending at
    1 PRECEDING — epoch micros are integers, so the frame is exactly
    't_click <= t_purchase - 1', i.e. strictly earlier TIMESTAMPS.
    The RANGE frame (not ROWS) is the tie-correctness choice: a ROWS
    frame would include a same-instant click or not depending on the
    tiebreak order, while the strictly-before rule is the same one
    attribution_linear_touch's frame uses — the two operators provably
    agree on which purchases are click-attributed
    (tests/test_invariants_wave6.py), which a same-instant-counts rule
    would break. One user-keyed exchange + window pass + small
    aggregate versus the naive purchases⋈clicks range self-join; exact
    integer micros; no floats anywhere."""
    spark = utc_session(spark)
    t = epoch_us(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(t)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        t.alias("t_us"),
        "event_type",
        F.max(
            F.when(F.col("event_type") == "click", t)
        ).over(w).alias("last_click_us"),
    )
    within = (
        F.col("last_click_us").isNotNull()
        & (
            F.col("t_us") - F.col("last_click_us")
            <= F.lit(ATTRIB_WINDOW_HOURS * 3600 * 1000000)
        )
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.when(within, F.lit("click")).otherwise("direct").alias("channel"),
        )
        .groupBy("user_id", "channel")
        .agg(F.count("*").cast("bigint").alias("n_purchases"))
    )


# --- concurrent open orders per day (interval stabbing) ----------------------

@query(
    "concurrent_orders_daily",
    priority=150,
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS d_open,
             strftime(MAX(l.l_shipdate) + INTERVAL 1 DAY, '%Y-%m-%d')
               AS d_close
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
      SELECT day, SUM(delta) AS d FROM (
        SELECT d_open AS day, 1 AS delta FROM spans
        UNION ALL
        SELECT d_close AS day, -1 AS delta FROM spans
      ) GROUP BY day
    )
    SELECT day, CAST(d AS BIGINT) AS delta,
           CAST(SUM(d) OVER (ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS open_orders
    FROM deltas
    """,
)
def concurrent_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCURRENT-INTERVAL COUNTING (how many orders are OPEN on each
    day, open = placed but not fully shipped) by the DIFFERENCE-ARRAY
    trick: each order contributes +1 at its open day and -1 the day
    after its last shipment, the deltas aggregate per day (the day axis
    is TINY — thousands of rows regardless of order count), and a
    running sum over days yields the concurrency curve. This is THE
    scalable shape for interval stabbing: the naive days×orders range
    join is O(|days|·|orders|) — a billion-order table against a 10-year
    axis is 10^12 comparisons — while the difference array is one keyed
    aggregation over 2 events per order plus a day-axis-sized window
    (same family as gapfill/pareto; the axis is small enough for a
    single-partition window here, and the range-partitioned prefix
    primitive takes over if the axis ever isn't). Exactness: pure
    integer counts and date arithmetic; per-order close = MAX(shipdate)
    + 1 day, computed identically both engines; TZ pinned for the
    date-string cast."""
    spark = utc_session(spark)
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("d_open"),
            F.date_format(
                F.date_add(F.col("last_ship"), 1), "yyyy-MM-dd"
            ).alias("d_close"),
        )
    )
    # one explode, not a 2-branch union: union'ing two selects of `spans`
    # makes Catalyst execute the lineitem⋈orders span build TWICE (one
    # copy per branch — observed as two BroadcastHashJoins in the plan);
    # exploding a 2-element array emits both delta rows from ONE pass
    deltas = (
        spans.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("d_open").alias("day"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.col("d_close").alias("day"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("e")
        )
        .select("e.day", "e.delta")
        .groupBy("day")
        .agg(F.sum("delta").alias("d"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.select(
        "day",
        F.col("d").cast("bigint").alias("delta"),
        F.sum("d").over(w).cast("bigint").alias("open_orders"),
    )


# --- linear multi-touch attribution ------------------------------------------

@query(
    "attribution_linear_touch",
    priority=150,
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS t,
             COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN CAST({ATTRIB_WINDOW_HOURS} AS BIGINT)
                             * 3600 * 1000000
                             PRECEDING AND 1 PRECEDING
             ), 0) AS n_touches
      FROM events
    )
    SELECT user_id, event_id AS purchase_id,
           CAST(n_touches AS BIGINT) AS n_touches,
           CASE WHEN n_touches > 0
                THEN CAST(1000000 // n_touches AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS credit_per_touch_micro
    FROM seq WHERE event_type = 'purchase'
    """,
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR (multi-touch) ATTRIBUTION — the fairness upgrade over
    attribution_last_touch: every click in the 24h lookback shares the
    purchase's credit equally. The touch count is a RANGE-frame window
    over epoch micros, frame [t-24h, t-1] — integer micros make
    '1 PRECEDING' exactly 'strictly earlier timestamp', the same
    strictly-before rule attribution_last_touch applies, so the two
    operators provably agree on which purchases are click-attributed
    even under same-instant ties (tests/test_invariants_wave6.py).
    ONE user-keyed window pass, not a purchases×clicks range join
    whose candidate set is quadratic in per-user activity. The RANGE
    frame is the load-bearing feature: a ROWS frame counts positions
    (and would make tie handling order-dependent), RANGE counts the
    actual 24h of event-time. Per-touch
    credit is FLOOR(1e6 / n) micro-credits — integer division,
    identical both engines (ROUND-tie lesson); zero-touch purchases
    ('direct') carry 0. Tie-safe WITHOUT a tiebreak column (RANGE frames
    allow exactly one ORDER BY expression in both engines): a RANGE
    frame includes ALL peers of the boundary instant, so the count is
    order-independent under timestamp ties by construction; the frame
    bound is exact integer micros."""
    spark = utc_session(spark)
    t = epoch_us(F.col("ts"))
    is_click = F.when(F.col("event_type") == "click", 1).otherwise(0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(t)
        .rangeBetween(-ATTRIB_WINDOW_HOURS * 3600 * 1000000, -1)
    )
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.coalesce(F.sum(is_click).over(w), F.lit(0)).alias("n_touches"),
    )
    n = F.col("n_touches")
    return seq.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        n.cast("bigint").alias("n_touches"),
        F.when(n > 0, (F.lit(1000000) / n).cast("bigint"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("credit_per_touch_micro"),
    )


# --- funnel time-to-convert quantiles ----------------------------------------

FUNNEL_TTC_PCTS = (25, 50, 75, 90)


@query(
    "funnel_time_to_convert",
    priority=150,
    oracle=f"""
    WITH first_click AS (
      SELECT user_id, MIN(epoch_us(ts)) AS tc
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) - c.tc AS delta_us
      FROM events e JOIN first_click c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.tc
      GROUP BY e.user_id, c.tc
    ),
    ranked AS (
      SELECT delta_us, ROW_NUMBER() OVER (ORDER BY delta_us, user_id) AS rn
      FROM conv
    ),
    n AS (SELECT COUNT(*) AS n FROM conv)
    SELECT p.pct,
           (p.pct * n.n + 99) // 100 AS k,
           (SELECT delta_us FROM ranked
            WHERE rn = (p.pct * n.n + 99) // 100) AS delta_us
    FROM (SELECT CAST(UNNEST([{", ".join(str(p) for p in FUNNEL_TTC_PCTS)}])
                 AS INT) AS pct) p, n
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT QUANTILES for the click→purchase funnel: per user,
    the gap between the FIRST click and the FIRST purchase after it,
    then exact p25/50/75/90 over converting users — the product metric
    behind 'median time to purchase'. funnel_conversion counts WHO
    converts; this measures HOW FAST. Plan: the first-click table is a
    user-keyed aggregate joined back to purchases on the SAME user key
    (one exchange family, no range self-join), and the quantiles run
    the exact-order-statistic pattern (group deltas, range-partitioned
    prefix counts, min-where-cum>=k — exact_global_quantiles' plan, no
    single-partition global sort). Exactness: deltas are exact epoch
    micros; k is integer ceil arithmetic; outputs are data elements —
    nothing derived, nothing rounded."""
    from serverless_mapreduce_spark.functions.prefix import prefix_sums

    spark = utc_session(spark)
    ev = table(spark, sf_dir, "events")
    t = epoch_us(F.col("ts"))
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(t).alias("tc"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", t.alias("tp"))
        .join(first_click, "user_id")
        .filter(F.col("tp") > F.col("tc"))
        .groupBy("user_id", "tc")
        .agg((F.min("tp") - F.col("tc")).alias("delta_us"))
        .select("user_id", "delta_us")
        # checkpoint BEFORE the count: the scalar n and the value-counts
        # frame below otherwise each execute the full scan+join+agg
        # pipeline from scratch (review finding) — unlike
        # exact_global_quantiles, whose count is a bare table scan
        .localCheckpoint(eager=True)
    )
    n = conv.count()  # 1-row scalar: number of converting users
    vc = conv.groupBy("delta_us").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    pref = prefix_sums(vc, "delta_us", ["cnt"])
    ks = {p: (p * n + 99) // 100 for p in FUNNEL_TTC_PCTS}
    aggs = [
        F.min(
            F.when(F.col("cum_cnt") >= F.lit(k), F.col("delta_us"))
        ).alias(f"v{p}")
        for p, k in ks.items()
    ]
    wide = pref.agg(*aggs)
    stack = ", ".join(f"{p}, {ks[p]}L, v{p}" for p in FUNNEL_TTC_PCTS)
    return wide.select(
        F.expr(
            f"stack({len(FUNNEL_TTC_PCTS)}, {stack}) as (pct, k, delta_us)"
        )
    )


# --- sampling-accelerated aggregation eval -----------------------------------

AQP_SAMPLE_MOD = 10  #: 1-in-10 deterministic row sample


@query(
    "eval_sample_accelerated_agg",
    priority=150,
    oracle=f"""
    WITH rows_ AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(concat('0x', substr(md5(
               CAST(l_orderkey AS VARCHAR) || ':' ||
               CAST(l_linenumber AS VARCHAR) || ':aqp'), 1, 8)) AS BIGINT)
               % {AQP_SAMPLE_MOD} = 0 AS in_sample
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(SUM(cents) AS BIGINT) AS exact_cents,
           CAST(SUM(CASE WHEN in_sample THEN cents ELSE 0 END)
             * {AQP_SAMPLE_MOD} AS BIGINT) AS est_cents,
           CAST(FLOOR(CAST(abs(
                  SUM(CASE WHEN in_sample THEN cents ELSE 0 END)
                    * {AQP_SAMPLE_MOD} - SUM(cents)
                ) AS DOUBLE) * 1000000 / CAST(SUM(cents) AS DOUBLE))
                AS BIGINT) AS rel_err_micro
    FROM rows_ GROUP BY l_returnflag
    """,
)
def eval_sample_accelerated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE QUERY PROCESSING eval (BlinkDB-style): answer the
    revenue-by-returnflag aggregate from a DETERMINISTIC 1-in-10 row
    sample scaled by 10, next to the exact answer, and report the
    relative error — the measurement that decides whether a dashboard
    can run on the sample at 1/10th the scan cost. The sample predicate
    is md5 over the row's natural key (salted ':aqp'), so the sample is
    REPRODUCIBLE and co-computable: here both answers ride ONE scan and
    one aggregation (a conditional sum — the sample costs one extra
    column, which is how you audit an AQP layer); in production the
    sample lives as its own 10x-smaller table and the exact side is
    skipped. Exactness: integer cents, integer scale-up, FLOOR of one
    IEEE divide for the error (ROUND-tie lesson); the md5-threshold
    sampling is the same auditable-membership mechanism as
    weighted_sample_events and label_rebalance."""
    li = table(spark, sf_dir, "lineitem")
    rowkey = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
        F.lit(":aqp"),
    )
    in_sample = (
        F.conv(F.substring(F.md5(rowkey), 1, 8), 16, 10).cast("bigint")
        % AQP_SAMPLE_MOD
        == 0
    )
    rows_ = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        in_sample.alias("in_sample"),
    )
    exact = F.sum("cents")
    est = (
        F.sum(F.when(F.col("in_sample"), F.col("cents")).otherwise(0))
        * AQP_SAMPLE_MOD
    )
    return rows_.groupBy("l_returnflag").agg(
        exact.alias("exact_cents"),
        est.alias("est_cents"),
        F.floor(
            F.abs(est - exact).cast("double")
            * 1000000
            / exact.cast("double")
        )
        .cast("bigint")
        .alias("rel_err_micro"),
    )


# --- session path mining -----------------------------------------------------

PATH_TOPK = 10


@query(
    "session_path_topk",
    priority=150,
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '{SESSION_GAP_HOURS} hours'
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, event_type, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    tri AS (
      SELECT event_type || '>' ||
             lead(event_type, 1) OVER w2 || '>' ||
             lead(event_type, 2) OVER w2 AS path
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    ),
    counted AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n
      FROM tri WHERE path IS NOT NULL GROUP BY path
    )
    SELECT path, n, rnk FROM (
      SELECT path, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rnk
      FROM counted
    ) WHERE rnk <= {PATH_TOPK}
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION PATH MINING: the top-10 three-step event-type paths users
    take WITHIN a session — the aggregate behind Sankey/user-flow
    views ('view>click>purchase vs view>click>error'). Pipeline: the
    sessionize lag-flag-cumsum (same SESSION_GAP_HOURS boundary rule as
    sessionize_events, so paths never span sessions), then each
    session's ordered event sequence yields its trigrams via two LEADs
    over the session-keyed window — NO self-join, no explode of
    collected arrays (collect_list would build per-session arrays just
    to re-explode them; the windows stay streaming-friendly and reuse
    ONE user-keyed exchange for flagging, numbering, and trigram
    derivation alike) — and one path-keyed count + global top-k
    finishes it. At 100 TB the per-path count is the only global
    exchange and its key space is |event_types|^3 — tiny. Exactness:
    counts and strings only; sequence order pinned by (ts, event_id) in
    both engines; top-k tie-broken by path string."""
    spark = utc_session(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_s = SESSION_GAP_HOURS * 3600
    new_s = F.when(
        prev.isNull()
        | (F.timestamp_diff("SECOND", prev, F.col("ts")) >= gap_s),
        1,
    ).otherwise(0)
    sess = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .withColumn("new_s", new_s)
        .withColumn(
            "session_id",
            F.sum("new_s")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
    )
    w2 = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    # F.concat, NOT concat_ws: concat propagates NULL (matching the
    # oracle's ||), so a too-short tail or a NULL event_type yields a
    # NULL path and is dropped — concat_ws would silently SKIP the null
    # and emit a malformed 2-part path the oracle never sees
    tri = sess.select(
        F.concat(
            F.col("event_type"),
            F.lit(">"),
            F.lead("event_type", 1).over(w2),
            F.lit(">"),
            F.lead("event_type", 2).over(w2),
        ).alias("path")
    )
    counted = (
        tri.filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counted.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= PATH_TOPK)
        .select("path", "n", "rnk")
    )


# --- supplier concentration (Herfindahl index) -------------------------------

HHI_MIN_SUPPLIERS = 2


@query(
    "supplier_concentration_hhi",
    priority=150,
    oracle=f"""
    WITH vol AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    part AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             SUM(q) AS tot,
             SUM(q * q) AS sq
      FROM vol GROUP BY l_partkey
    )
    SELECT l_partkey, n_suppliers,
           CAST(FLOOR(CAST(sq AS DOUBLE) * 1000000
                / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))) AS BIGINT)
             AS hhi_micro
    FROM part WHERE n_suppliers >= {HHI_MIN_SUPPLIERS}
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPPLY-CONCENTRATION risk per part: the HERFINDAHL-HIRSCHMAN
    index of supplier volume shares, HHI = Σ share_s² — 1.0 means a
    single-source part (supply-chain risk), 1/n means perfectly spread
    — the standard concentration metric (antitrust, procurement risk)
    computed for every multi-supplier part. Algebra does the scaling
    work: HHI = Σ(q_s/T)² = Σq_s² / T², so ONE two-level aggregation
    (part+supplier volumes, then per-part Σq and Σq²) suffices — no
    per-row share division, no window. Both levels are partkey-keyed,
    so the second aggregate reuses the first's exchange. Exactness:
    centiquantity volumes are exact BIGINTs (fixture Σq² < 2^50);
    the output is FLOOR micro-units of sq/(tot·tot) with
    CHARACTER-IDENTICAL double arithmetic both engines (ROUND-tie
    lesson)."""
    vol = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        # one explicit partkey exchange serves BOTH aggregation levels:
        # hash(l_partkey) clusters every (partkey, suppkey) group AND
        # every partkey group, so neither groupBy adds its own shuffle
        # (without this, level 1 hashes on (pk, sk) and level 2 re-hashes
        # on pk — two exchanges of the same data)
        .repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("q")
        )
    )
    part = vol.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("q").alias("tot"),
        F.sum(F.col("q") * F.col("q")).alias("sq"),
    )
    return part.filter(F.col("n_suppliers") >= HHI_MIN_SUPPLIERS).select(
        "l_partkey",
        "n_suppliers",
        F.floor(
            F.col("sq").cast("double")
            * 1000000
            / (F.col("tot").cast("double") * F.col("tot").cast("double"))
        )
        .cast("bigint")
        .alias("hhi_micro"),
    )
