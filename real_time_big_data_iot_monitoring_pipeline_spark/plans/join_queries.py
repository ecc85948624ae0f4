"""Join-surface catalog: the reference has only implicit dim-lookup joins
(SURVEY §2.3 J1/J2), so the equi/semi/anti/outer/range/as-of join surface
is exercised over the TPC-H-ish star schema — the shapes a Spark engine
must get right at 100 TB (broadcast small dims, shuffle-hash/sort-merge
big facts, AQE skew handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    sum_product_exact,
    avg_fixed,
    round_det,
    utc_ts,
)
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "join_dim_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(c.c_custkey) AS n_customers,
           ROUND((sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) / (100.0 * count(c.c_acctbal))) + 1e-8, 4) AS avg_acctbal
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("joins", "J1", "J2", "broadcast"),
)
def join_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-lookup join chain (reference J1 location->coords dict as a real
    broadcast hash join): customer LEFT-joined through nation->region.
    Both dims are broadcast — the fact table never shuffles for the join."""
    n, r, c = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region"), _t(spark, sf_dir, "customer")
    dim = F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (
        dim.join(c, c.c_nationkey == dim.n_nationkey, "left")
        .groupBy("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            avg_fixed(F.col("c_acctbal")).alias("avg_acctbal"),
        )
    )


@register(
    "join_star_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 + 1e-8, 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    tags=("joins", "headline", "tpch-q5"),
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: revenue per nation for one region and a
    two-year window.  Plan shape for scale: region/nation/customer are
    broadcast; lineitem⋈orders is the one big shuffle, and the region +
    date filters are pushed below it so the shuffle carries only
    qualifying orders.  Date bounds are `utc_ts` instant literals —
    session-timezone-proof and pushdown-friendly."""
    l, o, c = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    o = o.filter(
        (F.col("o_orderdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < utc_ts("1998-01-01 00:00:00"))
    )
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == o.o_orderkey)
        .join(dim, F.col("o_custkey") == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            round_det(
                sum_product_exact(
                    as_cents(F.col("l_extendedprice"))
                    * (100 - as_cents(F.col("l_discount")))
                ) / 10000.0,
                2,
            ).alias("revenue")
        )
    )


@register(
    "pricing_summary",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_linestatus, l_quantity,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS epc,
               CAST(round(l_discount * 100, 0) AS BIGINT) AS dc,
               CAST(round(l_tax * 100, 0) AS BIGINT) AS tc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    )
    SELECT l_returnflag, l_linestatus,
           ROUND(sum(l_quantity) + 1e-8, 2) AS sum_qty,
           ROUND(sum(epc) / 100.0 + 1e-8, 2) AS sum_base_price,
           ROUND(sum(epc * (100 - dc)) / 10000.0 + 1e-8, 2) AS sum_disc_price,
           ROUND(sum(epc * (100 - dc) * (100 + tc)) / 1000000.0 + 1e-8, 2) AS sum_charge,
           ROUND(sum(l_quantity) / count(l_quantity) + 1e-8, 4) AS avg_qty,
           ROUND(sum(epc) / (100.0 * count(epc)) + 1e-8, 4) AS avg_price,
           ROUND(sum(dc) / (100.0 * count(dc)) + 1e-8, 4) AS avg_disc,
           count(*) AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("joins", "headline", "tpch-q1"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the classic scan-heavy aggregation
    benchmark.  Entirely map-side until a tiny (flag,status) shuffle; the
    shipdate filter pushes into the parquet scan."""
    l = _t(spark, sf_dir, "lineitem")
    epc = as_cents(F.col("l_extendedprice"))
    dc = as_cents(F.col("l_discount"))
    tc = as_cents(F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= utc_ts("2001-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_det(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_det(F.sum(epc) / 100.0, 2).alias("sum_base_price"),
            # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
            round_det(
                sum_product_exact(epc * (100 - dc)) / 10000.0, 2
            ).alias("sum_disc_price"),
            round_det(
                sum_product_exact(epc * (100 - dc) * (100 + tc)) / 1000000.0, 2
            ).alias("sum_charge"),
            round_det(F.sum("l_quantity") / F.count("l_quantity"), 4).alias("avg_qty"),
            round_det(F.sum(epc) / (F.lit(100.0) * F.count(epc)), 4).alias("avg_price"),
            round_det(F.sum(dc) / (F.lit(100.0) * F.count(dc)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("joins", "semi"),
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one finished order.  Semi
    joins ship only the join key of the probe side — no payload shuffle."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderstatus") == "F"), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("joins", "anti"),
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "outer_join_order_counts",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           ROUND(coalesce(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) / 100.0, 0.0) + 1e-8, 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("joins", "outer"),
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + aggregate: order count and spend per customer,
    zeros preserved for order-less customers."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            round_det(F.coalesce(F.sum(as_cents(F.col("o_totalprice"))) / 100.0, F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "top_customers_by_revenue",
    oracle="""
    SELECT c_custkey, revenue FROM (
        SELECT o_custkey AS c_custkey,
               ROUND(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 + 1e-8, 2) AS revenue
        FROM orders GROUP BY o_custkey
    ) ORDER BY revenue DESC, c_custkey LIMIT 10
    """,
    tags=("joins", "topk"),
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k after aggregation: sort+limit compiles to
    TakeOrderedAndProject over the agg output (k rows per partition, k-row
    merge).  Revenue is rounded BEFORE ranking so cross-engine float-sum
    ulps cannot flip the order; custkey breaks ties."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(round_det(F.sum(as_cents(F.col("o_totalprice"))) / 100.0, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@register(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('budget', 0.0, 925.0), ('mid', 925.0, 950.0),
               ('upper', 950.0, 975.0), ('premium', 975.0, 10000.0)
    )
    SELECT b.band, count(*) AS n_parts, ROUND((sum(CAST(round(p.p_retailprice * 100, 0) AS BIGINT)) / (100.0 * count(p.p_retailprice))) + 1e-8, 4) AS avg_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    tags=("joins", "range"),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a literal band dim: Spark plans
    BroadcastNestedLoopJoin — fine because the build side is 4 rows; at
    scale the same shape works for any small banding table."""
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 925.0), ("mid", 925.0, 950.0), ("upper", 950.0, 975.0), ("premium", 975.0, 10000.0)],
        ["band", "lo", "hi"],
    )
    return (
        p.join(F.broadcast(bands), (p.p_retailprice >= F.col("lo")) & (p.p_retailprice < F.col("hi")))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"), avg_fixed(F.col("p_retailprice")).alias("avg_price"))
    )


@register(
    "asof_join_events",
    oracle="""
    WITH u AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN event_id END AS click_id,
               CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
        FROM events WHERE event_type IN ('click', 'error')
    ),
    filled AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
               last_value(click_id IGNORE NULLS) OVER w AS prev_click_id,
               last_value(click_us IGNORE NULLS) OVER w AS prev_click_us
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, prev_click_id,
           CAST(floor((ts_us - prev_click_us) / 1000000) AS BIGINT) AS lag_seconds
    FROM filled WHERE event_type = 'error'
    """,
    tags=("joins", "asof", "custom-operator"),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (backward): for every error event, the same user's most
    recent prior click.  Spark lacks a native as-of join; the idiomatic
    composition is union-tag + `last(ignorenulls) over (rows unbounded
    preceding)` — one sort per user partition instead of a per-row probe,
    which is exactly how a 100 TB as-of should run (no row explosion)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "error"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_us = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    filled = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.last(click_id, ignorenulls=True).over(w).alias("prev_click_id"),
        F.last(click_us, ignorenulls=True).over(w).alias("prev_click_us"),
    )
    return filled.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "prev_click_id",
        F.floor((F.col("ts_us") - F.col("prev_click_us")) / 1000000).cast("long").alias("lag_seconds"),
    )


@register(
    "set_ops_users",
    oracle="""
    SELECT user_id, 'both' AS tag FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT user_id, 'click_only' AS tag FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    tags=("setops",),
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.7 — absent in the reference, free in
    Spark): intersect/except of user populations, tagged and unioned."""
    e = load_table(spark, sf_dir, "events")
    clickers = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clickers.intersect(buyers).select("user_id", F.lit("both").alias("tag"))
    click_only = clickers.exceptAll(buyers).select("user_id", F.lit("click_only").alias("tag"))
    return both.unionByName(click_only)


@register(
    "asof_join_forward_tolerance",
    oracle="""
    WITH u AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN event_id END AS click_id,
               CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
        FROM events WHERE event_type IN ('click', 'error')
    ),
    filled AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
               first_value(click_id IGNORE NULLS) OVER w AS next_click_id,
               first_value(click_us IGNORE NULLS) OVER w AS next_click_us
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           CASE WHEN next_click_us - ts_us <= 300000000 THEN next_click_id END AS next_click_id,
           CASE WHEN next_click_us - ts_us <= 300000000
                THEN CAST(floor((next_click_us - ts_us) / 1000000) AS BIGINT) END AS lead_seconds
    FROM filled WHERE event_type = 'error'
    """,
    tags=("joins", "asof", "forward", "tolerance", "custom-operator"),
)
def asof_join_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join, FORWARD direction with a tolerance bound: for every
    error event, the same user's NEXT click — but only if it lands
    within 5 minutes (pandas `merge_asof(direction='forward',
    tolerance=...)` semantics).  Same scale shape as the backward twin
    (`asof_join_events`): union-tag + `first(ignorenulls)` over the
    forward frame — one per-user sort, no row explosion, and the
    tolerance is a post-window null-out, not a join condition, so the
    plan stays a single window pass."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "error"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_us = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    filled = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.first(click_id, ignorenulls=True).over(w).alias("next_click_id"),
        F.first(click_us, ignorenulls=True).over(w).alias("next_click_us"),
    )
    within = (F.col("next_click_us") - F.col("ts_us")) <= 300_000_000
    return filled.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.when(within, F.col("next_click_id")).alias("next_click_id"),
        F.when(within, F.floor((F.col("next_click_us") - F.col("ts_us")) / 1_000_000).cast("long")).alias(
            "lead_seconds"
        ),
    )


@register(
    "asof_join_nearest",
    oracle="""
    WITH u AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN event_id END AS click_id,
               CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
        FROM events WHERE event_type IN ('click', 'error')
    ),
    filled AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
               last_value(click_id IGNORE NULLS) OVER wb AS prev_click_id,
               last_value(click_us IGNORE NULLS) OVER wb AS prev_click_us,
               first_value(click_id IGNORE NULLS) OVER wf AS next_click_id,
               first_value(click_us IGNORE NULLS) OVER wf AS next_click_us
        FROM u
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    scored AS (
        SELECT event_id, user_id,
               CASE WHEN prev_click_us IS NOT NULL
                         AND ts_us - prev_click_us <= 120000000
                    THEN ts_us - prev_click_us END AS back_gap,
               prev_click_id,
               CASE WHEN next_click_us IS NOT NULL
                         AND next_click_us - ts_us <= 120000000
                    THEN next_click_us - ts_us END AS fwd_gap,
               next_click_id
        FROM filled WHERE event_type = 'error'
    )
    SELECT event_id, user_id,
           CASE WHEN back_gap IS NOT NULL AND (fwd_gap IS NULL OR back_gap <= fwd_gap)
                THEN prev_click_id
                WHEN fwd_gap IS NOT NULL THEN next_click_id END AS matched_click_id,
           CASE WHEN back_gap IS NOT NULL AND (fwd_gap IS NULL OR back_gap <= fwd_gap)
                THEN -CAST(floor(back_gap / 1000000) AS BIGINT)
                WHEN fwd_gap IS NOT NULL
                THEN CAST(floor(fwd_gap / 1000000) AS BIGINT) END AS signed_gap_seconds
    FROM scored
    """,
    tags=("joins", "asof", "nearest", "tolerance", "custom-operator"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join, NEAREST direction with tolerance: for every error
    event, the same user's closest click within +-2 minutes — pandas
    `merge_asof(direction='nearest', tolerance=...)` semantics, the one
    as-of variant the backward/forward twins don't cover.  Ties prefer
    the earlier (backward) click.

    Scale shape: both candidate frames (backward `last(ignorenulls)` and
    forward `first(ignorenulls)`) share one window partitioning and
    ordering, so Spark computes them in a SINGLE per-user sort pass — no
    second shuffle, no row explosion, and picking the nearer candidate
    is a plain CASE projection.  A range-join formulation would explode
    every error x click pair inside the tolerance; this stays one row
    per event at any corpus size."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "error"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    tol_us = 120_000_000
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_us = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    filled = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.last(click_id, ignorenulls=True).over(wb).alias("prev_click_id"),
        F.last(click_us, ignorenulls=True).over(wb).alias("prev_click_us"),
        F.first(click_id, ignorenulls=True).over(wf).alias("next_click_id"),
        F.first(click_us, ignorenulls=True).over(wf).alias("next_click_us"),
    )
    scored = filled.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.when(
            F.col("prev_click_us").isNotNull()
            & ((F.col("ts_us") - F.col("prev_click_us")) <= tol_us),
            F.col("ts_us") - F.col("prev_click_us"),
        ).alias("back_gap"),
        "prev_click_id",
        F.when(
            F.col("next_click_us").isNotNull()
            & ((F.col("next_click_us") - F.col("ts_us")) <= tol_us),
            F.col("next_click_us") - F.col("ts_us"),
        ).alias("fwd_gap"),
        "next_click_id",
    )
    back_wins = F.col("back_gap").isNotNull() & (
        F.col("fwd_gap").isNull() | (F.col("back_gap") <= F.col("fwd_gap"))
    )
    return scored.select(
        "event_id",
        "user_id",
        F.when(back_wins, F.col("prev_click_id"))
        .when(F.col("fwd_gap").isNotNull(), F.col("next_click_id"))
        .alias("matched_click_id"),
        F.when(back_wins, -F.floor(F.col("back_gap") / 1_000_000).cast("long"))
        .when(
            F.col("fwd_gap").isNotNull(),
            F.floor(F.col("fwd_gap") / 1_000_000).cast("long"),
        )
        .alias("signed_gap_seconds"),
    )


@register(
    "interval_overlap_join",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    y AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS grp
        FROM x
    ),
    sessions AS (
        SELECT user_id,
               epoch_us(min(ts)) AS s_start,
               epoch_us(max(ts)) + 1800000000 AS s_end
        FROM y GROUP BY user_id, grp
    ),
    incidents AS (
        SELECT user_id, event_id AS incident_event_id,
               epoch_us(ts) - 900000000 AS i_start,
               epoch_us(ts) + 900000000 AS i_end
        FROM events WHERE event_type = 'error'
    )
    SELECT s.user_id, CAST(s.s_start AS BIGINT) AS session_start_us,
           i.incident_event_id,
           CAST(floor((least(s.s_end, i.i_end) - greatest(s.s_start, i.i_start)) / 1000000) AS BIGINT)
               AS overlap_seconds
    FROM sessions s JOIN incidents i
      ON s.user_id = i.user_id
     AND s.s_start < i.i_end AND i.i_start < s.s_end
    """,
    tags=("joins", "interval-overlap", "temporal", "custom-operator"),
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP (temporal theta) join: each user's activity
    sessions (30-min-gap `session_window`s) joined to the same user's
    incident windows (error event +- 15 min) wherever the two intervals
    overlap — the temporal join shape the as-of family (point-to-point)
    and range join (point-to-band) don't cover.

    Scale shape: a direct theta join would be a per-user cross product.
    Instead both interval sets explode onto a 30-minute GRID (an
    interval covers ceil(len/30min) bucket rows — bounded fan-out), the
    candidate join is a plain equi-join on (user, bucket), duplicate
    bucket-pair hits collapse with one distinct, and the exact strict
    overlap predicate + overlap length verify candidates JVM-side.
    That is the standard relational interval-join compromise (grid
    bucketing), and the only shuffle is the bucketed equi-join.  The
    DuckDB oracle runs the direct theta join over gaps-and-islands
    sessions — value-hashing proves the bucketed plan loses no pair."""
    e = load_table(spark, sf_dir, "events")
    bucket_us = 1_800_000_000
    sessions = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("s_start"),
            F.unix_micros(F.col("w.end")).alias("s_end"),
        )
    )
    incidents = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("incident_event_id"),
        (F.unix_micros("ts") - 900_000_000).alias("i_start"),
        (F.unix_micros("ts") + 900_000_000).alias("i_end"),
    )

    def gridded(df, lo, hi):
        return df.withColumn(
            "bucket",
            F.explode(F.sequence(F.floor(F.col(lo) / bucket_us), F.floor(F.col(hi) / bucket_us))),
        )

    cand = (
        gridded(sessions, "s_start", "s_end")
        .join(gridded(incidents, "i_start", "i_end"), ["user_id", "bucket"])
        .drop("bucket")
        .distinct()
    )
    return cand.filter(
        (F.col("s_start") < F.col("i_end")) & (F.col("i_start") < F.col("s_end"))
    ).select(
        "user_id",
        F.col("s_start").alias("session_start_us"),
        "incident_event_id",
        F.floor(
            (F.least("s_end", "i_end") - F.greatest("s_start", "i_start")) / 1_000_000
        )
        .cast("long")
        .alias("overlap_seconds"),
    )
