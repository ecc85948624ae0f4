"""Analytic window-function surface (round-4 widening).

The reference's window usage stops at rolling means / diffs / tail-N
(SURVEY §2.6 W1-W5).  A warehouse user leans on four more analytic
shapes constantly; each gets a catalog query with a DuckDB oracle and a
plan pinned to PARTITIONED windows (the scale rule: a window spec
without partitionBy collapses the data to one task — every spec here
partitions on a real key):

* cumulative share-of-total        (running sum + windowed total)
* LAG-based inter-event gaps       (ordered diff per key, then rollup)
* NTILE decile profiling           (equi-count banding of a whole table)
* gaps-and-islands streaks         (dense_rank arithmetic, zero joins)

Plus `null_rate_audit`: per-column null/distinct profiling — the
data-quality scan every ingest pipeline runs before trusting a feed.

Determinism: money in exact cents, date fields extracted via
session-timezone-proof `utc_naive`, every NTILE/rank ordering carries a
unique tie-break key so both engines band identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    round_det,
    utc_naive,
)
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "running_revenue_share",
    oracle="""
    WITH monthly AS (
        SELECT c.c_mktsegment AS segment,
               CAST(EXTRACT(year FROM o.o_orderdate) * 100 + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS ym,
               sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS rev_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY segment, ym
    )
    SELECT segment, ym,
           ROUND(rev_cents / 100.0 + 1e-8, 2) AS revenue,
           ROUND(sum(rev_cents) OVER (PARTITION BY segment ORDER BY ym
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 + 1e-8, 2) AS cum_revenue,
           ROUND((sum(rev_cents) OVER (PARTITION BY segment ORDER BY ym
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / CAST(sum(rev_cents) OVER (PARTITION BY segment) AS DOUBLE)) + 1e-8, 6) AS cum_share
    FROM monthly
    """,
    tags=("analytics", "window", "cumulative"),
)
def running_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative monthly revenue and share-of-segment-total per market
    segment.  The windows run over the PRE-AGGREGATED monthly frame
    (#segments x #months rows), so the expensive part stays a plain
    grouped agg; the running sum partitions by segment — parallel across
    segments, never a global sort.  Exact-cents sums make the cumulative
    and total bit-identical across engines and partitionings."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice", "o_orderdate")
    c = F.broadcast(_t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"))
    d = utc_naive("o_orderdate")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (F.year(d) * 100 + F.month(d)).cast("long").alias("ym"),
        )
        .agg(F.sum(as_cents(F.col("o_totalprice"))).alias("rev_cents"))
    )
    cum = Window.partitionBy("segment").orderBy("ym").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy("segment")
    return monthly.select(
        "segment",
        "ym",
        round_det(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        round_det(F.sum("rev_cents").over(cum) / 100.0, 2).alias("cum_revenue"),
        round_det(F.sum("rev_cents").over(cum) / F.sum("rev_cents").over(tot).cast("double"), 6).alias("cum_share"),
    )


@register(
    "customer_order_gap_stats",
    oracle="""
    WITH gaps AS (
        SELECT c.c_mktsegment AS segment,
               CAST(EXTRACT(epoch FROM o.o_orderdate) / 86400 AS BIGINT)
               - lag(CAST(EXTRACT(epoch FROM o.o_orderdate) / 86400 AS BIGINT))
                 OVER (PARTITION BY o.o_custkey ORDER BY o.o_orderdate, o.o_orderkey) AS gap_days
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT segment,
           CAST(count(gap_days) AS BIGINT) AS n_gaps,
           ROUND(sum(gap_days) / CAST(count(gap_days) AS DOUBLE) + 1e-8, 4) AS avg_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps WHERE gap_days IS NOT NULL GROUP BY segment
    """,
    tags=("analytics", "window", "lag"),
)
def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics (LAG) rolled up per market segment:
    how long customers wait between orders.  The LAG window partitions
    by customer — per-partition sorts run parallel across customers, and
    the subsequent segment rollup is a tiny shuffle.  Gap days are exact
    integers (epoch-day arithmetic, timezone-free), so the averages are
    order-independent."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    c = F.broadcast(_t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"))
    day = F.floor(F.unix_seconds(F.col("o_orderdate")) / 86400).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("segment"), (day - F.lag(day).over(w)).alias("gap_days"))
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("segment").agg(
        F.count("gap_days").alias("n_gaps"),
        round_det(F.sum("gap_days") / F.count("gap_days").cast("double"), 4).alias("avg_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


@register(
    "acctbal_decile_profile",
    oracle="""
    WITH banded AS (
        SELECT ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile,
               CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        FROM customer
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           ROUND(min(bal_cents) / 100.0 + 1e-8, 2) AS min_bal,
           ROUND(max(bal_cents) / 100.0 + 1e-8, 2) AS max_bal,
           ROUND(sum(bal_cents) / (100.0 * count(*)) + 1e-8, 4) AS avg_bal
    FROM banded GROUP BY decile
    """,
    tags=("analytics", "window", "ntile"),
)
def acctbal_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) banding of customers by account balance with per-decile
    profiles — banded by `operators/windows.global_ntile` (range
    repartition + per-partition rank + 1-row broadcast offset map), so
    the equi-count banding runs with NO single-task global sort while
    reproducing NTILE's uneven-bucket assignment bit-for-bit against
    the oracle.  The ordering carries c_custkey as a unique tie-break
    so both engines band identically."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_ntile

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    banded = global_ntile(c, ["c_acctbal", "c_custkey"], 10, out="decile").select(
        "decile", as_cents(F.col("c_acctbal")).alias("bal_cents")
    )
    return banded.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        round_det(F.min("bal_cents") / 100.0, 2).alias("min_bal"),
        round_det(F.max("bal_cents") / 100.0, 2).alias("max_bal"),
        round_det(F.sum("bal_cents") / (100.0 * F.count(F.lit(1))), 4).alias("avg_bal"),
    )


@register(
    "order_month_streaks",
    oracle="""
    WITH months AS (
        SELECT DISTINCT o_custkey,
               CAST((EXTRACT(year FROM o_orderdate) - 1995) * 12 + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m
        FROM orders
    ), islands AS (
        SELECT o_custkey,
               m - dense_rank() OVER (PARTITION BY o_custkey ORDER BY m) AS island
        FROM months
    ), streaks AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS streak_len
        FROM islands GROUP BY o_custkey, island
    ), best AS (
        SELECT o_custkey, max(streak_len) AS best_streak FROM streaks GROUP BY o_custkey
    )
    SELECT best_streak, CAST(count(*) AS BIGINT) AS n_customers
    FROM best GROUP BY best_streak
    """,
    tags=("analytics", "window", "gaps-and-islands"),
)
def order_month_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active months per
    customer, then the distribution of best streaks.  The island id is
    pure window arithmetic (month_index - dense_rank) — no self-join, no
    explode; every shuffle is keyed on o_custkey and operates on the
    deduplicated (customer, month) frame, which is <= 84 rows per
    customer regardless of order volume."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    d = utc_naive("o_orderdate")
    months = o.select(
        "o_custkey",
        ((F.year(d) - 1995) * 12 + F.month(d) - 1).cast("long").alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    islands = months.select("o_custkey", (F.col("m") - F.dense_rank().over(w)).alias("island"))
    streaks = islands.groupBy("o_custkey", "island").agg(F.count(F.lit(1)).alias("streak_len"))
    best = streaks.groupBy("o_custkey").agg(F.max("streak_len").alias("best_streak"))
    return best.groupBy("best_streak").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "null_rate_audit",
    oracle="""
    SELECT 'event_type' AS col_name, CAST(count(*) - count(event_type) AS BIGINT) AS n_null,
           ROUND((count(*) - count(event_type)) / CAST(count(*) AS DOUBLE) + 1e-8, 6) AS null_rate,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct
    FROM events
    UNION ALL
    SELECT 'props', CAST(count(*) - count(props) AS BIGINT),
           ROUND((count(*) - count(props)) / CAST(count(*) AS DOUBLE) + 1e-8, 6),
           CAST(count(DISTINCT props) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(count(*) - count(user_id) AS BIGINT),
           ROUND((count(*) - count(user_id)) / CAST(count(*) AS DOUBLE) + 1e-8, 6),
           CAST(count(DISTINCT user_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'value', CAST(count(*) - count(value) AS BIGINT),
           ROUND((count(*) - count(value)) / CAST(count(*) AS DOUBLE) + 1e-8, 6),
           CAST(count(DISTINCT value) AS BIGINT)
    FROM events
    """,
    tags=("analytics", "data-quality", "profiling"),
)
def null_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (null count / null rate / exact
    distinct count) for the event feed — the scan every ingest pipeline
    runs before trusting a source.  All columns profile in ONE pass:
    a single aggregate computes every count jointly (count-distinct
    expansion gives one shuffle total), then the 1-row result unpivots
    driver-free via stack().  The oracle's UNION-ALL formulation scans
    once per column — the Spark plan is strictly better and produces the
    identical frame."""
    e = _t(spark, sf_dir, "events")
    cols = ["event_type", "props", "user_id", "value"]
    aggs = []
    for col in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nn"),
            round_det((F.count(F.lit(1)) - F.count(col)) / F.count(F.lit(1)).cast("double"), 6).alias(f"{col}__nr"),
            F.countDistinct(col).alias(f"{col}__nd"),
        ]
    one = e.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', {c}__nn, {c}__nr, {c}__nd" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (col_name, n_null, null_rate, n_distinct)"
    )


@register(
    "trailing_week_revenue",
    oracle="""
    WITH daily AS (
        SELECT o_custkey,
               CAST(floor(EXTRACT(epoch FROM o_orderdate) / 86400) AS BIGINT) AS day_idx,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_cents
        FROM orders GROUP BY o_custkey, day_idx
    )
    SELECT o_custkey, day_idx,
           CAST(sum(rev_cents) OVER w / 1 AS BIGINT) AS trail_cents,
           CAST(count(*) OVER w AS BIGINT) AS active_days_7d
    FROM daily
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day_idx
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    tags=("analytics", "window", "range-frame"),
)
def trailing_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue per customer via a RANGE (value-based)
    window frame — the time-interval frame ROWS BETWEEN cannot express
    when days are missing.  Pre-aggregating to (customer, day) first
    keeps the window input at one row per active day; the frame then
    partitions by customer (parallel across customers) and the range
    bound works on the integer epoch-day key, which is timezone-free
    and makes peer handling identical in both engines.  Exact-cents
    sums keep the trailing totals bit-identical."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    daily = o.groupBy(
        "o_custkey",
        F.floor(F.unix_seconds("o_orderdate") / F.lit(86400)).cast("long").alias("day_idx"),
    ).agg(F.sum(as_cents(F.col("o_totalprice"))).alias("rev_cents"))
    w = Window.partitionBy("o_custkey").orderBy("day_idx").rangeBetween(-6, 0)
    return daily.select(
        "o_custkey",
        "day_idx",
        F.sum("rev_cents").over(w).alias("trail_cents"),
        F.count(F.lit(1)).over(w).alias("active_days_7d"),
    )


@register(
    "acctbal_relative_standing",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(percent_rank() OVER w + 1e-8, 6) AS pct_rank,
           ROUND(cume_dist() OVER w + 1e-8, 6) AS cume_d
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("analytics", "window", "distribution"),
)
def acctbal_relative_standing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist per market segment: each customer's
    relative standing within their segment.  Partitioned by segment (the
    sort parallelizes across segments); the ordering carries c_custkey
    as a unique tie-break so rank positions — and therefore both
    distribution values — are identical across engines.  Both functions
    ride ONE window spec, so one sort serves both outputs."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        round_det(F.percent_rank().over(w), 6).alias("pct_rank"),
        round_det(F.cume_dist().over(w), 6).alias("cume_d"),
    )


@register(
    "ewma_batch_per_user",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               array_agg(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           ROUND(list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc) + 1e-8, 6) AS ewma
    FROM per_user
    """,
    tags=("analytics", "recurrence", "ewma"),
)
def ewma_batch_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha=0.2) as a BATCH recurrence with an exact
    oracle — the sequential fold ewma_i = a*x_i + (1-a)*ewma_{i-1} that
    no window frame can express.  Each user's ordered values collect
    into an array (sort_array over (ts, event_id, value) structs — a
    deterministic total order) and `aggregate` folds it left-to-right;
    DuckDB's `list_reduce` executes the IDENTICAL IEEE operation
    sequence, so even this order-sensitive float recurrence value-hashes
    across engines.  One shuffle on user_id; per-user arrays are
    event-count-bounded per key (the same bound any per-key recurrence
    needs), and the streaming twin (`stateful.ewma_stream`) is the
    unbounded-stream form of the same fold."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    fold = F.aggregate(
        F.expr("slice(vals, 2, size(vals))"),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
    )
    return (
        e.groupBy("user_id")
        .agg(arr.alias("_arr"))
        .select(
            "user_id",
            F.transform(F.col("_arr"), lambda s: s.getField("value")).alias("vals"),
        )
        .select(
            "user_id",
            F.size("vals").cast("long").alias("n_events"),
            round_det(fold, 6).alias("ewma"),
        )
    )


@register(
    "mad_anomaly",
    oracle="""
    WITH med AS (
        SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS m FROM events
    ), dev AS (
        SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(value - med.m)) AS mad, any_value(med.m) AS m
        FROM events, med
    )
    SELECT e.event_id, e.value,
           ROUND(abs(e.value - dev.m) / (1.4826 * dev.mad) + 1e-8, 4) AS robust_z
    FROM events e, dev
    WHERE abs(e.value - dev.m) > 3.5 * 1.4826 * dev.mad
    """,
    tags=("analytics", "anomaly", "robust"),
)
def mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection — the robust twin of
    `iqr_anomaly` (a single wild value cannot move the MAD the way it
    moves a standard deviation).  Two exact-percentile passes (median,
    then median of absolute deviations), each a 1-row aggregate
    BROADCAST into the row-level flag pass — the same no-driver-collect
    shape as the IQR fences; 1.4826 rescales MAD to sigma-equivalent
    units and 3.5 is the conventional robust-z cut."""
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    med = F.broadcast(e.agg(F.expr("percentile(value, 0.5)").alias("m")))
    dev = F.broadcast(
        e.crossJoin(med)
        .agg(
            F.expr("percentile(abs(value - m), 0.5)").alias("mad"),
            F.first("m").alias("m"),
        )
    )
    return (
        e.crossJoin(dev)
        .filter(F.abs(F.col("value") - F.col("m")) > 3.5 * 1.4826 * F.col("mad"))
        .select(
            "event_id",
            "value",
            round_det(F.abs(F.col("value") - F.col("m")) / (1.4826 * F.col("mad")), 4).alias(
                "robust_z"
            ),
        )
    )


_PR_ITER = """
    c{i} AS (
        SELECT e.dst AS node, sum((r.rank_micro * e.w) // o.out_w) AS s
        FROM edges e
        JOIN r{p} r ON e.src = r.node
        JOIN outw o ON e.src = o.src
        GROUP BY 1
    ),
    r{i} AS (
        SELECT n.node,
               CAST(150000 + (850000 * COALESCE(c.s, 0)) // 1000000 AS BIGINT) AS rank_micro
        FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
    )"""

_PR_ORACLE = (
    """
    WITH e0 AS (
        SELECT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT src, dst, w FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM e0
    ),
    nodes AS (
        SELECT DISTINCT src AS node FROM edges
        UNION
        SELECT DISTINCT dst AS node FROM edges
    ),
    outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY 1),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),"""
    + ",".join(_PR_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
    SELECT r3.node - 10000000 AS s_suppkey, s.s_name, r3.rank_micro
    FROM r3 JOIN supplier s ON r3.node - 10000000 = s.s_suppkey
    WHERE r3.node >= 10000000
    ORDER BY rank_micro DESC, s_suppkey LIMIT 20
    """
)


@register(
    "pagerank_trade_graph",
    oracle=_PR_ORACLE,
    tags=("analytics", "graph", "iterative", "pagerank"),
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 iterations, damping 0.85) over the
    customer<->supplier trade graph (edge weight = number of lineitems
    traded), reporting the 20 most central suppliers — the iterative
    weighted-propagation shape `dedup_components`' transitive closure
    does not cover.  Ranks are exact integer micro-units
    (`operators/graph.pagerank_micro`), so the 3-iteration fixpoint is
    bit-identical in both engines and survives any partitioning; the
    oracle unrolls the same three iterations as chained CTEs."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.graph import pagerank_micro

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(10_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    # broadcast_ranks: the trade graph's node set is customers ∪
    # suppliers — dimension-bounded, never fact-sized — so the rank table
    # broadcasts and the checkpointed edge table is never re-shuffled
    # (3x SortMergeJoin -> BroadcastHashJoin).  symmetric_edges: `edges`
    # is e0 ∪ reverse(e0) by construction, so the node-universe distinct
    # and closing left join are identities and are skipped (together
    # measured ~2.8 -> 0.76 s median at sf0.1; round-12 optimization).
    ranks = pagerank_micro(edges, iterations=3, broadcast_ranks=True, symmetric_edges=True)
    return (
        ranks.filter(F.col("node") >= 10_000_000)
        .select((F.col("node") - 10_000_000).alias("s_suppkey"), "rank_micro")
        .join(sup.select("s_suppkey", "s_name"), "s_suppkey")
        .select("s_suppkey", "s_name", "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "s_suppkey")
        .limit(20)
    )


@register(
    "holt_forecast_per_user",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               array_agg(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    ),
    fit AS (
        SELECT user_id, len(vals) AS n_events,
               list_reduce(list_transform(vals::DOUBLE[], v -> [v, 0.0::DOUBLE]),
                           (acc, x) -> [0.2::DOUBLE * x[1] + 0.8::DOUBLE * (acc[1] + acc[2]),
                                        0.1::DOUBLE * ((0.2::DOUBLE * x[1] + 0.8::DOUBLE * (acc[1] + acc[2])) - acc[1])
                                          + 0.9::DOUBLE * acc[2]]) AS st
        FROM per_user
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           ROUND(st[1] + 1e-8, 6) AS level,
           ROUND(st[2] + 1e-8, 6) AS trend,
           ROUND(st[1] + st[2] + 1e-8, 6) AS forecast_next
    FROM fit
    """,
    tags=("analytics", "recurrence", "holt", "forecast"),
)
def holt_forecast_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per user (alpha=0.2, gamma=0.1,
    level init = first value, trend init = 0) with a one-step-ahead
    forecast — the trend-aware big sibling of `ewma_batch_per_user`'s
    single-state fold, and a second doubly-recursive shape no window
    frame expresses.  Exactness: the two-variable state folds as a
    2-element DOUBLE ARRAY on both engines with the identical IEEE
    operation sequence — a struct accumulator is NOT portable here:
    DuckDB's `list_reduce` updates struct fields in place, so the second
    field's expression reads the first field's NEW value (measured);
    list accumulators construct fresh values on both engines.  Same
    scale shape as the EWMA: one shuffle on user_id, per-key
    event-bounded arrays."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    fold = F.aggregate(
        F.expr("slice(vals, 2, size(vals))"),
        F.array(F.element_at(F.col("vals"), 1), F.lit(0.0)),
        lambda acc, x: F.array(
            F.lit(0.2) * x + F.lit(0.8) * (F.element_at(acc, 1) + F.element_at(acc, 2)),
            F.lit(0.1)
            * (
                (F.lit(0.2) * x + F.lit(0.8) * (F.element_at(acc, 1) + F.element_at(acc, 2)))
                - F.element_at(acc, 1)
            )
            + F.lit(0.9) * F.element_at(acc, 2),
        ),
    )
    return (
        e.groupBy("user_id")
        .agg(arr.alias("_arr"))
        .select(
            "user_id",
            F.transform(F.col("_arr"), lambda s: s.getField("value")).alias("vals"),
        )
        .select(
            "user_id",
            F.size("vals").cast("long").alias("n_events"),
            fold.alias("st"),
        )
        .select(
            "user_id",
            "n_events",
            round_det(F.element_at(F.col("st"), 1), 6).alias("level"),
            round_det(F.element_at(F.col("st"), 2), 6).alias("trend"),
            round_det(F.element_at(F.col("st"), 1) + F.element_at(F.col("st"), 2), 6).alias(
                "forecast_next"
            ),
        )
    )


@register(
    "benford_digit_audit",
    oracle="""
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders
        WHERE o_totalprice > 0
    ),
    d AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c
    ),
    n AS (SELECT count(*) AS total FROM d),
    obs AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1)
    SELECT obs.digit, CAST(n_obs AS BIGINT) AS n_obs,
           ROUND(CAST(n_obs AS DOUBLE) / total + 1e-8, 6) AS observed_share,
           CAST(floor(ln(1.0 + 1.0 / obs.digit) / ln(10.0) * 1000000.0 + 0.5 + 1e-8) AS BIGINT)
               AS benford_share_micro
    FROM obs CROSS JOIN n
    """,
    tags=("analytics", "data-quality", "benford"),
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals — the fraud/synthetic-
    data screen finance pipelines run on money columns.  The leading
    digit comes from the exact-cents integer's decimal STRING (never
    log10 of a float: libm log10 at exact powers of ten differs across
    engines; string heads don't), and the Benford expectation
    ln(1+1/d)/ln(10) is micro-quantized the same way the catalog's other
    transcendentals are, so every output cell is engine-stable.  One
    scan + a 9-group agg + a broadcast total: scan-speed at any scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(as_cents(F.col("o_totalprice")).cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    total = F.broadcast(d.agg(F.count(F.lit(1)).alias("total")))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .crossJoin(total)
        .select(
            "digit",
            F.col("n_obs").cast("long").alias("n_obs"),
            round_det(F.col("n_obs").cast("double") / F.col("total"), 6).alias("observed_share"),
            F.floor(
                F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0)) * 1000000.0
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("benford_share_micro"),
        )
    )


@register(
    "anova_value_by_type",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS x FROM events
    ),
    g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(x) AS BIGINT) AS s_g
        FROM c GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS ss, CAST(count(DISTINCT event_type) AS BIGINT) AS k
        FROM c
    ),
    parts AS (
        SELECT tot.n, tot.k,
               CAST(tot.ss AS DOUBLE) - CAST(tot.s AS DOUBLE) * tot.s / tot.n AS ss_total,
               sum(CAST(g.s_g AS DOUBLE) * g.s_g / g.n_g) - CAST(tot.s AS DOUBLE) * tot.s / tot.n AS ss_between
        FROM g CROSS JOIN tot
        GROUP BY tot.n, tot.k, tot.ss, tot.s
    )
    SELECT n, k,
           ROUND(ss_total / 10000.0 + 1e-8, 4) AS ss_total,
           ROUND(ss_between / 10000.0 + 1e-8, 4) AS ss_between,
           ROUND((ss_total - ss_between) / 10000.0 + 1e-8, 4) AS ss_within,
           ROUND((ss_between / (k - 1)) / ((ss_total - ss_between) / (n - k)) + 1e-8, 6) AS f_stat,
           ROUND(ss_between / ss_total + 1e-8, 6) AS eta_squared
    FROM parts
    """,
    tags=("analytics", "anova", "statistics"),
)
def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types: total / between /
    within sum-of-squares, the F statistic, and eta-squared (effect
    size) — does the grouping explain the variance?  All moments are
    exact integer cents sums (x, x^2, per-group sums), so only the
    final fixed-order float identities differ from integers; one
    corpus scan + a k-row rollup, the same no-driver-collect shape as
    the catalog's other closed-form statistics."""
    e = load_table(spark, sf_dir, "events")
    c = e.select("event_type", as_cents(F.col("value")).alias("x"))
    g = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"), F.sum("x").alias("s_g")
    )
    tot = F.broadcast(
        c.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("s"),
            # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")).alias("ss"),
            F.count_distinct("event_type").cast("long").alias("k"),
        )
    )
    parts = (
        g.crossJoin(tot)
        .groupBy("n", "k", "ss", "s")
        .agg(
            F.sum(F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")).alias("sb_raw")
        )
        .select(
            "n",
            "k",
            (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")).alias(
                "ss_total"
            ),
            (F.col("sb_raw") - F.col("s").cast("double") * F.col("s") / F.col("n")).alias(
                "ss_between"
            ),
        )
    )
    return parts.select(
        "n",
        "k",
        round_det(F.col("ss_total") / 10000.0, 4).alias("ss_total"),
        round_det(F.col("ss_between") / 10000.0, 4).alias("ss_between"),
        round_det((F.col("ss_total") - F.col("ss_between")) / 10000.0, 4).alias("ss_within"),
        round_det(
            (F.col("ss_between") / (F.col("k") - 1))
            / ((F.col("ss_total") - F.col("ss_between")) / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
        round_det(F.col("ss_between") / F.col("ss_total"), 6).alias("eta_squared"),
    )


@register(
    "weighted_median_price",
    oracle="""
    WITH pv AS (
        SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS wt
        FROM lineitem GROUP BY 1
    ),
    c AS (
        SELECT v, wt,
               sum(wt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
               (SELECT sum(wt) FROM pv) AS tot
        FROM pv
    )
    SELECT ROUND(min(v) FILTER (WHERE 2 * cum >= tot) / 100.0 + 1e-8, 2) AS median_price,
           ROUND(any_value(tot) / 100.0 + 1e-8, 2) AS total_weight
    FROM c
    """,
    tags=("analytics", "weighted-median", "prefix-sum"),
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median unit price — the
    inventory-weighted "typical price" a pricing analyst wants, which no
    built-in percentile computes (they weight rows equally).  Definition:
    smallest price v whose cumulative quantity weight reaches half the
    total.  Plan: prices collapse to DISTINCT values first (the weight
    table is value-sized, and the crossing value is invariant to how
    ties are ordered), then `operators/windows.global_running_sum`
    produces the exact inclusive prefix sum with NO single-task window
    (range repartition + per-partition cumsum + P-entry broadcast
    offsets) and the answer is one more global min-aggregate.  All
    weights are exact integer cents-of-quantity."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_running_sum

    li = _t(spark, sf_dir, "lineitem")
    pv = (
        li.select(
            as_cents(F.col("l_extendedprice")).alias("v"),
            as_cents(F.col("l_quantity")).alias("wt"),
        )
        .groupBy("v")
        .agg(F.sum("wt").alias("wt"))
    )
    c = global_running_sum(pv, ["v"], "wt", out="cum")
    return c.agg(
        round_det(
            F.min(F.when(2 * F.col("cum") >= F.col("_grs_total"), F.col("v"))) / 100.0, 2
        ).alias("median_price"),
        round_det(F.first("_grs_total") / 100.0, 2).alias("total_weight"),
    )


@register(
    "chi2_type_value",
    oracle="""
    WITH obs AS (
        SELECT event_type,
               CASE WHEN value < 25 THEN 'lo' WHEN value < 50 THEN 'mid'
                    WHEN value < 100 THEN 'hi' ELSE 'xhi' END AS band,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY 1),
    ct AS (SELECT band, sum(o) AS c FROM obs GROUP BY 1),
    n AS (SELECT sum(o) AS n FROM obs),
    cells AS (
        SELECT obs.o, rt.r, ct.c, n.n,
               CAST(floor(
                   CAST(obs.o * n.n - rt.r * ct.c AS DOUBLE)
                   * CAST(obs.o * n.n - rt.r * ct.c AS DOUBLE)
                   / (CAST(n.n AS DOUBLE) * rt.r * ct.c)
                   * 1000000 + 0.5 + 1e-8) AS BIGINT) AS term_micro
        FROM obs JOIN rt USING (event_type) JOIN ct USING (band) CROSS JOIN n
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1) AS BIGINT) AS dof,
           ROUND(sum(term_micro) / 1000000.0 + 1e-8, 4) AS chi2
    FROM cells
    """,
    tags=("analytics", "chi-square", "independence-test"),
)
def chi2_type_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between event type and a
    fixed value band — the categorical association check a feature-
    selection / drift-detection pass runs (is `value` distributed the
    same across event types?).  Numerically exact pattern: each cell's
    statistic is computed as (o*N - r*c)^2 / (N*r*c) — the numerator
    difference is an EXACT int64 before the (identical-in-both-engines)
    float square/divide — then micro-quantized per cell so the final
    chi2 is an order-independent integer sum over the (bounded,
    |types| x |bands|) cell table.  Plan: one events scan -> cell
    counts; row/column margins re-aggregate the CELL table (never the
    fact table); margins and N attach by broadcast."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("value") < 25, "lo")
        .when(F.col("value") < 50, "mid")
        .when(F.col("value") < 100, "hi")
        .otherwise("xhi")
        .alias("band"),
    )
    obs = e.groupBy("event_type", "band").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("band").agg(F.sum("o").alias("c"))
    n = F.broadcast(obs.agg(F.sum("o").alias("n")))
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = diff * diff / (F.col("n").cast("double") * F.col("r") * F.col("c"))
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "band")
        .crossJoin(n)
        .select(
            "r",
            "c",
            F.floor(term * 1000000 + F.lit(0.5 + 1e-8)).cast("long").alias("term_micro"),
        )
    )
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        ((F.count_distinct("r") - 1) * (F.count_distinct("c") - 1))
        .cast("long")
        .alias("dof"),
        round_det(F.sum("term_micro") / 1000000.0, 4).alias("chi2"),
    )


@register(
    "grouped_weighted_median",
    oracle="""
    WITH pv AS (
        SELECT p.p_brand,
               CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS v,
               sum(CAST(round(l.l_quantity * 100, 0) AS BIGINT)) AS wt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    c AS (
        SELECT p_brand, v, wt,
               sum(wt) OVER (PARTITION BY p_brand ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS cum,
               sum(wt) OVER (PARTITION BY p_brand) AS tot
        FROM pv
    )
    SELECT p_brand,
           ROUND(min(v) FILTER (WHERE 2 * cum >= tot) / 100.0 + 1e-8, 2) AS median_price,
           ROUND(any_value(tot) / 100.0 + 1e-8, 2) AS total_weight
    FROM c GROUP BY p_brand
    """,
    tags=("analytics", "weighted-median", "per-group"),
)
def grouped_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price PER BRAND — the grouped twin of
    `weighted_median_price`.  Prices collapse to DISTINCT (brand, price)
    weights first, so the per-brand cumulative window runs over the
    price-cardinality frame, not the fact table: with few heavy groups
    (25 brands here) a group-partitioned window over RAW rows would put
    1/25th of the fact table in one task — pre-aggregation is what makes
    the partitioned window safe.  (For a GLOBAL weighted median, or
    groups whose distinct-value set is itself huge, use the
    `global_running_sum` kernel — `weighted_median_price` shows that
    path.)  All weights exact integer."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_quantity")
    p = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    pv = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", as_cents(F.col("l_extendedprice")).alias("v"))
        .agg(F.sum(as_cents(F.col("l_quantity"))).alias("wt"))
    )
    wc = Window.partitionBy("p_brand").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt_ = Window.partitionBy("p_brand")
    c = pv.select(
        "p_brand",
        "v",
        F.sum("wt").over(wc).alias("cum"),
        F.sum("wt").over(wt_).alias("tot"),
    )
    return c.groupBy("p_brand").agg(
        round_det(
            F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("v"))) / 100.0, 2
        ).alias("median_price"),
        round_det(F.first("tot") / 100.0, 2).alias("total_weight"),
    )


@register(
    "pareto_frontier_customers",
    oracle="""
    WITH xy AS (
        SELECT CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
               max(cnt.n) AS best_orders
        FROM customer c
        JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
              FROM orders GROUP BY 1) cnt
          ON cnt.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    scan AS (
        SELECT bal_cents, best_orders,
               max(best_orders) OVER (ORDER BY bal_cents DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS better_y
        FROM xy
    )
    SELECT ROUND(bal_cents / 100.0 + 1e-8, 2) AS acctbal,
           best_orders AS n_orders
    FROM scan
    WHERE better_y IS NULL OR best_orders > better_y
    """,
    tags=("analytics", "skyline", "pareto-frontier"),
)
def pareto_frontier_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): the customers not dominated on
    (account balance, order count) — no other customer has BOTH a
    higher balance and at least as many orders.  The classic skyline
    algorithm is a sort + running-max scan; here the scan runs on
    `operators/windows.global_running_max` with an EXCLUSIVE prefix
    (max order count among all strictly-richer customers), so the
    frontier extraction is distributed end-to-end: collapse to per-
    balance best order count (one agg), range-partition by balance
    descending, per-partition running max + P-entry broadcast prefix —
    never a single-task ORDER BY.  A point survives iff its y beats
    every larger-x point's y."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import (
        global_running_max,
    )

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    cnt = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    xy = (
        c.join(cnt, c.c_custkey == cnt.o_custkey)
        .groupBy(as_cents(F.col("c_acctbal")).alias("bal_cents"))
        .agg(F.max("n").alias("best_orders"))
    )
    scan = global_running_max(
        xy, [F.col("bal_cents").desc()], "best_orders", out="better_y", inclusive=False
    )
    return scan.filter(
        F.col("better_y").isNull() | (F.col("best_orders") > F.col("better_y"))
    ).select(
        round_det(F.col("bal_cents") / 100.0, 2).alias("acctbal"),
        F.col("best_orders").alias("n_orders"),
    )


@register(
    "twap_per_user",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(round(value * 100, 0) AS BIGINT) AS val_cents,
               epoch_us(ts) AS us,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_us
        FROM events
    )
    SELECT user_id,
           CAST(count(next_us) AS BIGINT) AS n_intervals,
           ROUND(sum(val_cents * (next_us - us))
                 / (100.0 * sum(next_us - us)) + 1e-8, 4) AS twap,
           CAST(sum(next_us - us) AS BIGINT) AS span_us
    FROM seq WHERE next_us IS NOT NULL
    GROUP BY user_id
    """,
    tags=("analytics", "timeseries", "twap", "duration-weighted"),
)
def twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-weighted average value per user (TWAP): each reading is
    weighted by how long it remained current (until the next reading) —
    the correct "average level" for irregularly-sampled series, where
    the plain mean over-weights bursts (the reference's dashboards
    average rows, which is wrong whenever sampling is adaptive).  The
    duration comes from one LEAD over the user-partitioned order; the
    weighted sum is exact int64 (cents x microseconds, bounded:
    490*100 * feed-span-us < 2^63 for spans up to ~3,700 years) and one
    fixed-order division lands the float."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = e.select(
        "user_id",
        as_cents(F.col("value")).alias("val_cents"),
        us.alias("us"),
        F.lead(us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dur = F.col("next_us") - F.col("us")
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
        round_det(
            F.sum(F.col("val_cents").cast("decimal(38,0)") * dur.cast("decimal(38,0)"))
            / (100.0 * F.sum(dur)),
            4,
        ).alias("twap"),
        F.sum(dur).cast("long").alias("span_us"),
    )


@register(
    "ohlc_hourly_bars",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bar_start,
               CAST(round(value * 100, 0) AS BIGINT) AS val_cents,
               epoch_us(ts) AS us, event_id
        FROM events
    ),
    ranked AS (
        SELECT user_id, bar_start, val_cents,
               row_number() OVER (PARTITION BY user_id, bar_start
                                  ORDER BY us, event_id) AS rn_open,
               row_number() OVER (PARTITION BY user_id, bar_start
                                  ORDER BY us DESC, event_id DESC) AS rn_close
        FROM pts
    )
    SELECT user_id, bar_start,
           ROUND(max(CASE WHEN rn_open = 1 THEN val_cents END) / 100.0 + 1e-8, 2) AS open,
           ROUND(max(val_cents) / 100.0 + 1e-8, 2) AS high,
           ROUND(min(val_cents) / 100.0 + 1e-8, 2) AS low,
           ROUND(max(CASE WHEN rn_close = 1 THEN val_cents END) / 100.0 + 1e-8, 2) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM ranked GROUP BY 1, 2
    """,
    tags=("analytics", "timeseries", "ohlc", "resample"),
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling — open/high/low/close per (user, hour), the
    canonical downsampling for any tick-like series (and a strictly
    richer summary than the reference dashboard's per-window min/max,
    streamlit_dashboard.py's gauge row).  ONE hash aggregation does all
    five statistics: open/close are `min_by`/`max_by` on the exact
    (micros, event_id) tie-broken order — no window, no sort, no second
    shuffle (the oracle spells the same semantics with rank windows;
    Spark's min_by gets it in the agg).  Values in exact cents."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    ord_key = F.struct(F.unix_micros(F.col("ts")).alias("us"), F.col("event_id").alias("eid"))
    vc = as_cents(F.col("value"))
    return (
        e.groupBy(
            "user_id",
            (F.floor(F.unix_seconds(F.col("ts")) / 3600) * 3600).cast("long").alias("bar_start"),
        )
        .agg(
            round_det(F.min_by(vc, ord_key) / 100.0, 2).alias("open"),
            round_det(F.max(vc) / 100.0, 2).alias("high"),
            round_det(F.min(vc) / 100.0, 2).alias("low"),
            round_det(F.max_by(vc, ord_key) / 100.0, 2).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_ticks"),
        )
    )


@register(
    "exact_quantiles_distributed",
    oracle="""
    WITH vals AS (
        SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v FROM lineitem
    )
    SELECT 0.25 AS q,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY v) / 100.0 + 1e-8, 4)
               AS quantile_price
    FROM vals
    UNION ALL
    SELECT 0.5 AS q,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY v) / 100.0 + 1e-8, 4)
               AS quantile_price
    FROM vals
    UNION ALL
    SELECT 0.75 AS q,
           ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY v) / 100.0 + 1e-8, 4)
               AS quantile_price
    FROM vals
    UNION ALL
    SELECT 0.95 AS q,
           ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY v) / 100.0 + 1e-8, 4)
               AS quantile_price
    FROM vals
    """"",
    tags=("analytics", "quantiles", "prefix-sum", "distributed-exact"),
)
def exact_quantiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quantiles with NO single-node sort buffer:
    Spark's built-in `percentile` is exact but materializes the value
    multiset per reduce task — at 100 TB that buffer is the bottleneck.
    This plan needs only (distinct value, count) + the
    `global_running_sum` prefix kernel: for each q, the two ranks that
    bracket position q*(N-1) are located by a filter on the cumulative
    interval [cum-cnt+1, cum] (each rank hits exactly ONE distinct
    value), and the standard linear interpolation reconstructs
    percentile_cont — which is exactly what the DuckDB oracle computes,
    via its own independent implementation.  Memory per task is O(
    distinct values in its range partition), never O(rows)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_running_sum

    li = _t(spark, sf_dir, "lineitem").select(as_cents(F.col("l_extendedprice")).alias("v"))
    pv = li.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    c = global_running_sum(pv, ["v"], "cnt", out="cum")
    qs = F.broadcast(
        li.sparkSession.createDataFrame([(0.25,), (0.5,), (0.75,), (0.95,)], "q double")
    )
    j = c.crossJoin(qs)
    n = F.col("_grs_total")
    p = F.col("q") * (n - 1).cast("double")  # 0-based fractional position
    lo_rank = (F.floor(p) + 1).cast("long")  # 1-based bracketing ranks
    hi_rank = F.least(lo_rank + 1, n)
    covers = lambda r: (F.col("cum") >= r) & ((F.col("cum") - F.col("cnt")) < r)  # noqa: E731
    hits = j.filter(covers(lo_rank) | covers(hi_rank)).select(
        "q",
        p.alias("p"),
        F.when(covers(lo_rank), F.col("v")).alias("v_lo"),
        F.when(covers(hi_rank), F.col("v")).alias("v_hi"),
    )
    frac = F.col("p") - F.floor(F.col("p"))
    return hits.groupBy("q").agg(
        round_det(
            (
                F.min("v_lo").cast("double")
                + F.first(frac) * (F.min("v_hi") - F.min("v_lo")).cast("double")
            )
            / 100.0,
            4,
        ).alias("quantile_price")
    )


# Inverse-CDF thresholds for Poisson(1): P(K <= k) for k = 0..6.  A
# hash-uniform u in [0,1) maps to the smallest k with u < CDF(k) — the
# per-row resample weight of the Poisson bootstrap.
_POIS1_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406, 0.999917)


def _pois1_case(u_expr: str) -> str:
    branches = " ".join(
        f"WHEN {u_expr} < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {branches} ELSE 7 END"


@register(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
        SELECT b.b,
               CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
               {_pois1_case("((o.o_orderkey * 2654435761 + b.b * 40503) % 4294967296) / 4294967296.0")} AS w
        FROM orders o, (SELECT unnest(generate_series(0, 31)) AS b) b
    ),
    means AS (
        SELECT b, sum(w * cents) AS wsum, sum(w) AS n
        FROM reps GROUP BY b HAVING sum(w) > 0
    ),
    stats AS (
        SELECT ROUND(wsum / (100.0 * n) + 1e-8, 4) AS m FROM means
    )
    SELECT CAST(count(*) AS BIGINT) AS n_replicates,
           ROUND(avg(m) + 1e-8, 4) AS boot_mean,
           ROUND(quantile_cont(m, 0.025) + 1e-8, 4) AS ci_lo,
           ROUND(quantile_cont(m, 0.975) + 1e-8, 4) AS ci_hi
    FROM stats
    """,
    tags=("analytics", "bootstrap", "confidence-interval", "resampling"),
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the mean order value —
    the bootstrap that actually works at 100 TB: classic resampling
    needs N draws WITH replacement per replicate (a global shuffle per
    replicate); the Poisson approximation gives every row an independent
    Poisson(1) weight per replicate, so all B=32 replicates compute in
    ONE scan as conditional weighted sums (the technique production A/B
    platforms use for exactly this reason).  Weights are hash-derived
    (inverse CDF on a Knuth-mixed uniform), so both engines draw the
    IDENTICAL resample; replicate means use exact integer cents, and
    the interval is an exact percentile over the 32-row replicate
    frame.  Scale: one fact scan fanned x32 map-side, one 32-group
    agg — no shuffle grows with B."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    reps = o.crossJoin(F.broadcast(spark.range(32).select(F.col("id").alias("b"))))
    u = (
        (F.col("o_orderkey") * 2654435761 + F.col("b") * 40503) % 4294967296
    ) / 4294967296.0
    w = F.expr(_pois1_case("((o_orderkey * 2654435761 + b * 40503) % 4294967296) / 4294967296.0"))
    means = (
        reps.select("b", as_cents(F.col("o_totalprice")).alias("cents"), w.alias("w"))
        .groupBy("b")
        .agg(F.sum(F.col("w") * F.col("cents")).alias("wsum"), F.sum("w").alias("n"))
        .filter(F.col("n") > 0)
        .select(round_det(F.col("wsum") / (100.0 * F.col("n")), 4).alias("m"))
    )
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        round_det(F.avg("m"), 4).alias("boot_mean"),
        # one buffer for both CI bounds (round-12: see aggregates.describe)
        round_det(F.element_at(F.expr("percentile(m, array(0.025, 0.975))"), 1), 4).alias("ci_lo"),
        round_det(F.element_at(F.expr("percentile(m, array(0.025, 0.975))"), 2), 4).alias("ci_hi"),
    )


@register(
    "ab_conversion_ztest",
    oracle="""
    WITH assign AS (
        SELECT user_id,
               (user_id * 2654435761) % 2 = 0 AS in_a,
               max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(count(*) FILTER (WHERE in_a) AS BIGINT) AS n_a,
               CAST(COALESCE(sum(converted) FILTER (WHERE in_a), 0) AS BIGINT) AS c_a,
               CAST(count(*) FILTER (WHERE NOT in_a) AS BIGINT) AS n_b,
               CAST(COALESCE(sum(converted) FILTER (WHERE NOT in_a), 0) AS BIGINT) AS c_b
        FROM assign
    )
    SELECT n_a, c_a, n_b, c_b,
           ROUND(c_a / CAST(n_a AS DOUBLE) + 1e-8, 6) AS rate_a,
           ROUND(c_b / CAST(n_b AS DOUBLE) + 1e-8, 6) AS rate_b,
           ROUND((c_a / CAST(n_a AS DOUBLE) - c_b / CAST(n_b AS DOUBLE))
                 / sqrt(((c_a + c_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1 - (c_a + c_b) / CAST(n_a + n_b AS DOUBLE))
                        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) + 1e-8, 4) AS z_score
    FROM arms
    """,
    tags=("analytics", "ab-test", "hypothesis-test"),
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between deterministically-assigned A/B
    arms (Knuth-hash split on user_id — the same bucketing a real
    experimentation platform uses): did arm A's high-value-purchase
    conversion (any purchase over 150) differ from arm B's?  (The
    threshold keeps conversion away from 1.0 — at rate 1 the pooled
    variance is zero and the statistic is undefined.)  All counts are exact integers from one
    user-keyed aggregation; the pooled-variance z statistic is a
    fixed-order float expression over those six integers, identical in
    both engines.  Scale: per-user conversion is a max-aggregate
    (conditional, map-side partial), the arm rollup is 1 row."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("converted")
    ).withColumn("in_a", (F.col("user_id") * 2654435761) % 2 == 0)
    arms = assign.agg(
        F.sum(F.col("in_a").cast("long")).alias("n_a"),
        F.sum(F.when(F.col("in_a"), F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum((~F.col("in_a")).cast("long")).alias("n_b"),
        F.sum(F.when(~F.col("in_a"), F.col("converted")).otherwise(0)).alias("c_b"),
    )
    ra = F.col("c_a") / F.col("n_a").cast("double")
    rb = F.col("c_b") / F.col("n_b").cast("double")
    p = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b")).cast("double")
    z = (ra - rb) / F.sqrt(p * (1 - p) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return arms.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_b").cast("long").alias("c_b"),
        round_det(ra, 6).alias("rate_a"),
        round_det(rb, 6).alias("rate_b"),
        round_det(z, 4).alias("z_score"),
    )


@register(
    "kaplan_meier_repurchase",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ),
    mx AS (SELECT max(o_orderdate) AS md FROM orders),
    per AS (
        SELECT f.o_custkey,
               CASE WHEN s.o_orderdate IS NOT NULL
                    THEN date_diff('day', f.o_orderdate, s.o_orderdate) ELSE
                         date_diff('day', f.o_orderdate, mx.md) END AS t_days,
               CASE WHEN s.o_orderdate IS NOT NULL THEN 1 ELSE 0 END AS event
        FROM ranked f
        LEFT JOIN ranked s ON s.o_custkey = f.o_custkey AND s.rn = 2
        CROSS JOIN mx
        WHERE f.rn = 1
    ),
    days AS (
        SELECT t_days, CAST(sum(event) AS BIGINT) AS d,
               CAST(sum(1 - event) AS BIGINT) AS c
        FROM per GROUP BY t_days
    ),
    n AS (SELECT CAST(sum(d + c) AS BIGINT) AS total FROM days),
    curve AS (
        SELECT t_days, d, c,
               n.total
               - COALESCE(sum(d + c) OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
        FROM days, n
    ),
    terms AS (
        SELECT t_days, d, at_risk,
               CAST(floor(
                   CASE WHEN d = at_risk THEN -46.0
                        ELSE ln(1 - d / CAST(at_risk AS DOUBLE)) END
                   * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano
        FROM curve
    )
    SELECT t_days, CAST(at_risk AS BIGINT) AS n_at_risk, d AS d_events,
           ROUND(exp(sum(nano) OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING)
                     / 1000000000.0) + 1e-8, 6) AS survival
    FROM terms WHERE TRUE QUALIFY d > 0
    """,
    tags=("analytics", "survival", "kaplan-meier", "prefix-sum"),
)
def kaplan_meier_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve for time-to-repurchase: per customer,
    the gap from first to second order (event) or to the dataset's end
    (right-censored), estimated with the product-limit formula S(t) =
    prod(1 - d_i/n_i) — the churn/retention curve every subscription
    analysis starts with, correctly handling censoring where a naive
    average of observed gaps is biased.  Distributed shape: subjects
    collapse to a DAY-grain (t, events, censored) table, and BOTH
    running quantities ride `operators/windows.global_running_sum` —
    the at-risk count n_i as N minus the exclusive prefix of departures,
    and the log-survival as the prefix of nano-quantized ln(1 - d/n)
    terms (one exp at the end) — so the curve computes with no
    single-task window at any width.  The d = n_i terminal edge uses an
    explicit -46 nat sentinel (exp -> ~1e-20 -> 0) identically in both
    engines."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_running_sum

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    mx = F.broadcast(o.agg(F.max("o_orderdate").alias("md")))
    day = lambda c: F.floor(F.unix_seconds(c) / 86400)  # noqa: E731
    per = (
        ranked.groupBy("o_custkey")
        .agg(
            F.min(F.when(F.col("rn") == 1, day(F.col("o_orderdate")))).alias("fd"),
            F.min(F.when(F.col("rn") == 2, day(F.col("o_orderdate")))).alias("sd"),
        )
        .crossJoin(mx)
        .select(
            F.coalesce(
                F.col("sd") - F.col("fd"), day(F.col("md")) - F.col("fd")
            ).cast("long").alias("t_days"),
            F.col("sd").isNotNull().cast("long").alias("event"),
        )
    )
    days = per.groupBy("t_days").agg(
        F.sum("event").alias("d"), F.sum(1 - F.col("event")).alias("c")
    )
    days = days.withColumn("dep", F.col("d") + F.col("c"))
    cum = global_running_sum(days, ["t_days"], "dep", out="cum")
    curve = cum.select(
        "t_days",
        "d",
        (F.col("_grs_total") - F.col("cum") + F.col("dep")).alias("at_risk"),
    )
    term = F.floor(
        F.when(F.col("d") == F.col("at_risk"), F.lit(-46.0))
        .otherwise(F.log(1 - F.col("d") / F.col("at_risk").cast("double")))
        * 1000000000
        + F.lit(0.5 + 1e-8)
    ).cast("long")
    terms = curve.withColumn("nano", term)
    surv = global_running_sum(terms, ["t_days"], "nano", out="lnsum")
    return surv.filter(F.col("d") > 0).select(
        "t_days",
        F.col("at_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("d_events"),
        round_det(F.exp(F.col("lnsum") / 1000000000.0), 6).alias("survival"),
    )


@register(
    "yoy_revenue_growth",
    oracle="""
    WITH monthly AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY 1, 2
    )
    SELECT cur.yr, cur.mo,
           ROUND(cur.cents / 100.0 + 1e-8, 2) AS revenue,
           ROUND(prev.cents / 100.0 + 1e-8, 2) AS revenue_prior_year,
           ROUND((cur.cents - prev.cents) / CAST(prev.cents AS DOUBLE) + 1e-8, 6)
               AS yoy_growth
    FROM monthly cur JOIN monthly prev
      ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
    """,
    tags=("analytics", "yoy", "period-over-period"),
)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the period-over-period
    self-join every BI dashboard leads with, and a different plan shape
    from LAG (LAG needs contiguous ordered rows; the calendar self-join
    matches the same month across a 12-row gap and naturally drops
    months with no prior-year twin).  The join runs on the
    PRE-AGGREGATED monthly frame (years x 12 rows, broadcast), so the
    fact table is scanned and shuffled exactly once; month extraction
    is session-timezone-proof via `utc_naive`."""
    o = _t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    d = utc_naive("o_orderdate")
    monthly = o.groupBy(
        F.year(d).cast("int").alias("yr"), F.month(d).cast("int").alias("mo")
    ).agg(F.sum(as_cents(F.col("o_totalprice"))).alias("cents"))
    cur = monthly.alias("cur")
    prev = monthly.alias("prev")
    return (
        cur.join(
            F.broadcast(prev),
            (F.col("prev.yr") == F.col("cur.yr") - 1) & (F.col("prev.mo") == F.col("cur.mo")),
        )
        .select(
            F.col("cur.yr").alias("yr"),
            F.col("cur.mo").alias("mo"),
            round_det(F.col("cur.cents") / 100.0, 2).alias("revenue"),
            round_det(F.col("prev.cents") / 100.0, 2).alias("revenue_prior_year"),
            round_det(
                (F.col("cur.cents") - F.col("prev.cents"))
                / F.col("prev.cents").cast("double"),
                6,
            ).alias("yoy_growth"),
        )
    )


@register(
    "customer_spend_gini",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) AS i
        FROM spend
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           ROUND(sum(cents) / 100.0 + 1e-8, 2) AS total_spend,
           ROUND((2.0 * sum(i * cents)) / (count(*) * CAST(sum(cents) AS DOUBLE))
                 - (count(*) + 1.0) / count(*) + 1e-8, 6) AS gini
    FROM ranked
    """,
    tags=("analytics", "gini", "concentration", "prefix-rank"),
)
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of customer spend — the revenue-concentration
    number ("do 20% of customers drive 80% of revenue?") in its exact
    closed form G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    ascending-rank-weighted values.  The rank comes from
    `operators/windows.global_row_number` (range repartition +
    broadcast offsets — no single-task sort), rank-weighted sums are
    exact int64 (rank x cents stays far under 2^63 at any real
    customer count x spend), and the two float divisions are
    fixed-order.  Same family as `running_revenue_share`'s cumulative
    view, but a single comparable scalar."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_row_number

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(as_cents(F.col("o_totalprice"))).alias("cents")
    )
    ranked = global_row_number(spend, ["cents", "o_custkey"], out="i")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        round_det(F.sum("cents") / 100.0, 2).alias("total_spend"),
        round_det(
            # decimal(38,0): rank*cents sums are n^2-law (round-11 scale audit)
            (2.0 * F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")))
            / (F.count(F.lit(1)) * F.sum("cents").cast("double"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@register(
    "mann_whitney_utest",
    oracle="""
    WITH pool AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
        FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS t, CAST(sum(is_a) AS BIGINT) AS a
        FROM pool GROUP BY cents
    ),
    r AS (
        SELECT *, sum(t) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - t AS cb
        FROM g
    ),
    s AS (
        SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(a * (2 * cb + t + 1)) AS BIGINT) AS r1_twice,
               CAST(sum(t * t * t - t) AS BIGINT) AS ties
        FROM r
    )
    SELECT n1 AS n_click, (n - n1) AS n_view,
           (r1_twice - n1 * (n1 + 1)) / 2.0 AS u_stat,
           ties AS tie_term,
           ROUND((r1_twice - n1 * (n1 + 1) - n1 * (n - n1))
                 / (2.0 * sqrt((n1 * (n - n1) / 12.0)
                               * ((n + 1) - ties / (CAST(n AS DOUBLE) * (n - 1)))))
                 + 1e-8, 4) AS z_score
    FROM s
    """,
    tags=("analytics", "hypothesis-test", "rank-statistic", "global-kernel"),
)
def mann_whitney_utest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U (Wilcoxon rank-sum) test between two event
    populations ('click' vs 'view' values) — the NONPARAMETRIC member
    of the hypothesis-test family (`ab_conversion_ztest` compares
    proportions, `anova_value_by_type` compares means; rank tests are
    what a practitioner reaches for when values are skewed and means
    mislead).  The classic formulation sorts the pooled sample and
    assigns average ranks to ties — a global sort of every observation.
    This plan never ranks observations: values collapse to a
    per-distinct-cents aggregate (t total, a in-group), the tie-average
    rank of each distinct value is derived from the exact global prefix
    sum of counts (`operators/windows.global_running_sum` — range
    repartition + P-entry broadcast, no single-task sort), and the
    rank-sum R1 folds up as the exact integer sum a*(2*cb + t + 1) (kept
    doubled to stay integral).  U, the tie-corrected variance, and z are
    fixed-order float expressions over five exact integers, identical
    in both engines.  Scale: the shuffle is #distinct-values sized, the
    statistic is 1 row; i64 holds r1_twice up to ~3e9 observations
    (beyond that the same plan runs on decimal(38,0)).
    Reference parity: extends ref:app.py's status-split summary stats
    to a defensible significance call."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_running_sum

    pool = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            as_cents(F.col("value")).alias("cents"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        )
    )
    g = pool.groupBy("cents").agg(
        F.count(F.lit(1)).alias("t"), F.sum("is_a").cast("long").alias("a")
    )
    r = global_running_sum(g, ["cents"], "t", out="run").withColumn(
        "cb", F.col("run") - F.col("t")
    )
    # decimal(38,0): exact past the int64 cliff (round-11 scale audit): rank sums are
    # n^2-law and the tie term is n^3 on tie groups
    ad, td = F.col("a").cast("decimal(38,0)"), F.col("t").cast("decimal(38,0)")
    s = r.agg(
        F.sum("a").alias("n1"),
        F.sum("t").alias("n"),
        F.sum(ad * (2 * F.col("cb") + F.col("t") + 1).cast("decimal(38,0)")).alias("r1_twice"),
        F.sum(td * td * td - td).alias("ties"),
    )
    n1, n = F.col("n1"), F.col("n")
    n1d = n1.cast("decimal(38,0)")
    num = (
        F.col("r1_twice")
        - n1d * (n1 + 1).cast("decimal(38,0)")
        - n1d * (n - n1).cast("decimal(38,0)")
    )
    var = (n1d * (n - n1).cast("decimal(38,0)") / F.lit(12.0)) * (
        (n + 1) - F.col("ties") / (n.cast("double") * (n - 1))
    )
    return s.select(
        n1.cast("long").alias("n_click"),
        (n - n1).cast("long").alias("n_view"),
        ((F.col("r1_twice") - n1d * (n1 + 1).cast("decimal(38,0)")) / F.lit(2.0)).alias("u_stat"),
        F.col("ties").cast("long").alias("tie_term"),
        round_det(num / (F.lit(2.0) * F.sqrt(var)), 4).alias("z_score"),
    )


@register(
    "acf_hourly_means",
    oracle="""
    WITH hourly AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               CAST(floor(sum(CAST(round(value * 100, 0) AS BIGINT)) * 1.0 / count(*)
                          + 0.5 + 1e-8) AS BIGINT) AS m
        FROM events GROUP BY hr
    ),
    lags AS (SELECT unnest([1, 2, 3, 24]) AS lag),
    pairs AS (
        SELECT l.lag, a.m AS x, b.m AS y
        FROM hourly a CROSS JOIN lags l JOIN hourly b ON b.hr = a.hr + l.lag
    ),
    mom AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS np,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag_hours, np AS n_pairs,
           ROUND((np * sxy - sx * sy)
                 / sqrt(CAST(np * sxx - sx * sx AS DOUBLE) * (np * syy - sy * sy))
                 + 1e-8, 6) AS acf
    FROM mom
    """,
    tags=("analytics", "time-series", "autocorrelation"),
)
def acf_hourly_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION of the hourly-mean value series at lags 1, 2, 3
    and 24 hours — the first diagnostic a time-series practitioner runs
    before picking seasonal windows or forecast models (a strong lag-24
    spike says "daily cycle"; `seasonal_anomaly_census` and
    `holt_forecast_per_user` both presuppose exactly this check).
    Statistic: the Pearson-pairs ACF variant — for each lag k,
    correlate the series against itself shifted k hours over the
    aligned pairs.  Determinism end-to-end: the hourly mean is
    cent-quantized to an integer (exact cents sum / count, one double
    division + floor, identical in both engines), so every moment
    (n, Sx, Sy, Sxx, Syy, Sxy) is an exact integer and the correlation
    is one fixed-order float expression.  Plan shape: one hash
    aggregation events->hours, then the k-shift alignment is an
    EQUI-join of the hourly table against itself on hr+k (the 4-row lag
    dimension is a broadcast cross) — no window over the global series,
    no driver collect; the shuffled relation is #hours-sized, ~1e5 rows
    per decade even at 100 TB of raw events.  i64 headroom: cent-scale
    means keep np*Sxx below 2^53 through ~1e8 hours.
    Reference parity: extends ref:app.py's hourly-trend chart from "plot
    the means" to "how correlated is hour t with hour t-k"."""
    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy(F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hr"))
        .agg(
            F.floor(
                F.sum(as_cents(F.col("value"))) * F.lit(1.0) / F.count(F.lit(1))
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("m")
        )
    )
    lags = spark.createDataFrame([(1,), (2,), (3,), (24,)], "lag int")
    pairs = (
        hourly.crossJoin(F.broadcast(lags))
        .withColumn("hr_y", F.col("hr") + F.col("lag"))
        .alias("a")
        .join(hourly.alias("b"), F.col("a.hr_y") == F.col("b.hr"))
        .select(F.col("a.lag"), F.col("a.m").alias("x"), F.col("b.m").alias("y"))
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    np_, sx, sy = F.col("np"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return mom.select(
        F.col("lag").cast("int").alias("lag_hours"),
        np_.cast("long").alias("n_pairs"),
        round_det(
            (np_ * sxy - sx * sy)
            / F.sqrt((np_ * sxx - sx * sx).cast("double") * (np_ * syy - sy * sy)),
            6,
        ).alias("acf"),
    )


@register(
    "spearman_qty_price",
    oracle="""
    WITH base AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
        FROM lineitem
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    gx AS (SELECT x, CAST(count(*) AS BIGINT) AS t FROM base GROUP BY x),
    rx AS (
        SELECT x, 2 * (sum(t) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS rx2
        FROM gx
    ),
    gy AS (SELECT y, CAST(count(*) AS BIGINT) AS t FROM base GROUP BY y),
    ry AS (
        SELECT y, 2 * (sum(t) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS ry2
        FROM gy
    ),
    d AS (
        SELECT rx2 - (n + 1) AS dx, ry2 - (n + 1) AS dy
        FROM base JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN tot
    ),
    mom AS (
        SELECT CAST(sum(dx * dy) AS BIGINT) AS sxy,
               CAST(sum(dx * dx) AS BIGINT) AS sxx,
               CAST(sum(dy * dy) AS BIGINT) AS syy
        FROM d
    )
    SELECT (SELECT n FROM tot) AS n_rows,
           ROUND(sxy / sqrt(CAST(sxx AS DOUBLE) * syy) + 1e-8, 6) AS spearman_rho
    FROM mom
    """,
    tags=("analytics", "rank-statistic", "correlation", "global-kernel"),
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation between order-line quantity and
    extended price — the robust companion to `corr_matrix`'s Pearson
    (rank correlation survives the skew and outliers that make raw-value
    correlation mislead, and it is the curation-pipeline default for
    "are these two quality signals redundant?").  The textbook recipe
    ranks both columns with average-rank tie handling — two GLOBAL
    sorts.  This plan never sorts rows: each column collapses to its
    distinct-value counts, the tie-averaged rank of every distinct value
    falls out of the exact global prefix sum
    (`operators/windows.global_running_sum` — range repartition +
    P-entry broadcast, no single-task window), kept DOUBLED (2*cb+t+1)
    so it stays integral, and rows get their rank pair back via two
    equi-joins on value.  Centering by the doubled mean (n+1) makes
    Sx = Sy = 0, so rho reduces to Sxy/sqrt(Sxx*Syy) over exact integer
    moments — one fixed-order float expression, identical in both
    engines.  Scale: shuffles are #distinct-value- and row-sized
    equi-joins (no broadcast of data-sized state); i64 holds the
    centered moments (≤ n^3) through ~2M rows — beyond that the same
    plan runs the three sums on decimal(38,0), cf. the
    `mann_whitney_utest` headroom note.  Reference parity: upgrades
    ref:app.py's scatter-plot eyeball check to a tie-correct statistic."""
    base = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        as_cents(F.col("l_extendedprice")).alias("y"),
    )
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_running_sum

    # Round-13 restructure (guide §2.4 "two operations keyed the same
    # way share one exchange", §5; round-12 verdict next-round #5).
    # Two observations delete every row-sized join-back:
    #   1. x is DOMAIN-bounded (l_quantity is 1..50 at every scale), so
    #      its rank kernel collapses to a bounded seed collect — the
    #      kmeans_refine / PQ-LUT discipline: collect the ~50 (x, count)
    #      rows and compute the exact integer prefix-sum ranks (and n,
    #      and the whole Sxx moment = Σ t·dx²) in Python.  This deletes
    #      the x-side range exchange + offset pass, both `tot` scan
    #      subtrees, and the fact-side broadcast the un-hinted planner
    #      picked (base has parquet statistics, the checkpointed rank
    #      kernel has none, so BuildLeft landed on the FACT table —
    #      unboundable at 100 TB).
    #   2. the y-side moments only need PER-DISTINCT-y sums: with dx
    #      attached map-side (broadcast LocalRelation join — no
    #      shuffle), the SAME groupBy(y) that feeds the rank kernel
    #      also carries sdx = Σ dx, and Sxy = Σ_y dy·sdx,
    #      Syy = Σ_y t·dy² — so rows are NEVER joined back: the old
    #      row-sized sort-merge join (exchange + two sorts) is gone and
    #      the only remaining machinery is the y aggregation + the rank
    #      kernel's range exchange.
    # Exact-integer algebra throughout.  Honest sf0.1 reading: a WASH
    # (3.02 -> 3.04 s warm med at local[8]) — the deleted row-sized SMJ
    # is offset by the added gx collect job, and the remaining floor is
    # the y rank kernel itself; the win is the PLAN (row-sized
    # sort-merge join + one range exchange gone), which is what matters
    # at 100 TB.  An F.broadcast hint alone measured WORSE (3.02 ->
    # 3.22: the broadcast build serializes the rank subtree as its own
    # job) — recorded so round 14 doesn't re-try it.
    gx = sorted(
        (r["x"], r["t"])
        for r in base.groupBy("x").agg(F.count(F.lit(1)).alias("t")).collect()
    )
    n = sum(t for _, t in gx)
    run, rx_rows, sxx = 0, [], 0
    for xv, t in gx:
        rx2 = 2 * run + t + 1  # doubled tie-averaged rank: 2*(cum - t) + t + 1
        rx_rows.append((xv, rx2 - (n + 1)))
        sxx += t * (rx2 - (n + 1)) ** 2  # exact Python int — no overflow
        run += t
    dx_local = spark.createDataFrame(rx_rows, "x long, dx long")
    gy = (
        base.join(F.broadcast(dx_local), "x")
        .groupBy("y")
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum(F.col("dx").cast("decimal(38,0)")).alias("sdx"),
        )
    )
    ry = global_running_sum(gy, ["y"], "t", out="run")
    # decimal(38,0): rank-diff moments are n^3-law — already within 11x
    # of int64 at sf0.1 (round-11 scale audit)
    dyd = (2 * (F.col("run") - F.col("t")) + F.col("t") + 1 - F.lit(n + 1)).cast(
        "decimal(38,0)"
    )
    mom = ry.agg(
        F.sum(dyd * F.col("sdx")).alias("sxy"),
        F.sum(dyd * dyd * F.col("t").cast("decimal(38,0)")).alias("syy"),
    )
    # float(sxx) is the round-to-nearest double of the exact integer —
    # bit-identical to the old decimal(38,0) -> double cast
    return mom.select(
        F.lit(n).cast("long").alias("n_rows"),
        round_det(
            F.col("sxy") / F.sqrt(F.lit(float(sxx)) * F.col("syy")), 6
        ).alias("spearman_rho"),
    )


@register(
    "ks_two_sample_test",
    oracle="""
    WITH pool AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
        FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (
        SELECT cents, CAST(sum(is_a) AS BIGINT) AS t1,
               CAST(count(*) - sum(is_a) AS BIGINT) AS t2
        FROM pool GROUP BY cents
    ),
    r AS (
        SELECT sum(t1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS c1,
               sum(t2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS c2
        FROM g
    ),
    tot AS (SELECT CAST(sum(t1) AS BIGINT) AS n1, CAST(sum(t2) AS BIGINT) AS n2 FROM g)
    SELECT n1 AS n_click, n2 AS n_view,
           ROUND(max(abs(c1 * 1.0 / n1 - c2 * 1.0 / n2)) + 1e-8, 6) AS ks_stat,
           ROUND(1.358 * sqrt((n1 + n2) / (CAST(n1 AS DOUBLE) * n2)) + 1e-8, 6) AS d_crit_05
    FROM r CROSS JOIN tot GROUP BY n1, n2
    """,
    tags=("analytics", "hypothesis-test", "distribution", "global-kernel"),
)
def ks_two_sample_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KOLMOGOROV-SMIRNOV test between the 'click' and
    'view' value distributions — the distribution-shape member of the
    hypothesis-test family (`mann_whitney_utest` detects location
    shift; KS detects ANY CDF divergence: spread, shape, tails).  The
    statistic sup|F1 - F2| classically needs both samples sorted
    together — a global sort.  Here both empirical CDFs fall out of ONE
    pass over the distinct-value counts: per-cents (t1, t2) aggregate,
    two exact global prefix sums on the same range partitioning
    (`global_running_sum`, chained — no single-task window), then
    D = max over distinct values of |c1/n1 - c2/n2|.  Each term is one
    float subtraction of two exact-integer divisions (identical IEEE
    doubles in both engines) and max is order-independent, so the
    hashed 6dp values cannot flake.  The 5% rejection bar
    1.358*sqrt((n1+n2)/(n1*n2)) ships alongside; the caller compares.
    Scale: shuffle is #distinct-values-sized; the statistic is one row.
    Reference parity: the principled upgrade of ref:app.py's
    side-by-side status histograms."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_running_sum

    pool = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            as_cents(F.col("value")).alias("cents"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        )
    )
    g = pool.groupBy("cents").agg(
        F.sum("is_a").cast("long").alias("t1"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("long").alias("t2"),
    )
    r = global_running_sum(g, ["cents"], "t1", out="c1")
    r = global_running_sum(r, ["cents"], "t2", out="c2")
    tot = g.agg(F.sum("t1").alias("n1"), F.sum("t2").alias("n2"))
    return (
        r.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(
                    F.col("c1") * F.lit(1.0) / F.col("n1")
                    - F.col("c2") * F.lit(1.0) / F.col("n2")
                )
            ).alias("d_raw")
        )
        .select(
            F.col("n1").cast("long").alias("n_click"),
            F.col("n2").cast("long").alias("n_view"),
            round_det(F.col("d_raw"), 6).alias("ks_stat"),
            round_det(
                F.lit(1.358)
                * F.sqrt(
                    (F.col("n1") + F.col("n2"))
                    / (F.col("n1").cast("double") * F.col("n2"))
                ),
                6,
            ).alias("d_crit_05"),
        )
    )


@register(
    "mutual_info_type_bucket",
    oracle="""
    WITH base AS (
        SELECT event_type AS et, CAST(round(value * 100, 0) AS BIGINT) // 10000 AS b
        FROM events
    ),
    j AS (SELECT et, b, CAST(count(*) AS BIGINT) AS nij FROM base GROUP BY et, b),
    mi AS (SELECT et, CAST(sum(nij) AS BIGINT) AS ni FROM j GROUP BY et),
    mj AS (SELECT b, CAST(sum(nij) AS BIGINT) AS nj FROM j GROUP BY b),
    tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM j),
    terms AS (
        SELECT CAST(floor((nij * 1.0 / n)
                          * ln((CAST(n AS DOUBLE) * nij) / (CAST(ni AS DOUBLE) * nj))
                          * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano
        FROM j JOIN mi USING (et) JOIN mj USING (b) CROSS JOIN tot
    )
    SELECT (SELECT count(*) FROM j) AS n_cells,
           (SELECT n FROM tot) AS n_events,
           ROUND(sum(nano) / 1000000000.0 + 1e-8, 6) AS mi_nats
    FROM terms
    """,
    tags=("analytics", "information-theory", "dependence"),
)
def mutual_info_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL INFORMATION between event type and value band (100-unit
    buckets) — the model-free dependence measure that catches what
    correlation cannot (any nonlinear association between a categorical
    and a bucketed numeric shows up; `chi2_type_value` asks "is there
    dependence?", MI answers "how many nats of it?", the quantity
    feature-selection and leakage audits rank by).  Plan: one hash
    aggregation to the joint contingency table (cells = |types| x
    |buckets|, tiny), marginals re-aggregated FROM the joint table
    (never a second scan of events), broadcast-joined back, and each
    cell's (nij/N)*ln(N*nij/(ni*nj)) term is NANO-QUANTIZED to an
    integer before summing — the `corpus_kl_drift` recipe — so the sum
    is order-independent and the 6dp hash cannot flake on float
    addition order.  All log/division inputs are exact integer counts:
    both engines evaluate the identical fixed-order double expression
    per cell.  Scale: after the first aggregation everything is
    cells-sized; the events shuffle is the one map-side-combinable
    groupBy.  Reference parity: quantifies the type-vs-value dependence
    ref:app.py's per-status summary table only displays."""
    base = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT) div 10000").alias("b"),
    )
    j = base.groupBy("et", "b").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    mi = j.groupBy("et").agg(F.sum("nij").alias("ni"))
    mj = j.groupBy("b").agg(F.sum("nij").alias("nj"))
    tot = j.agg(F.sum("nij").alias("n"))
    cells = j.agg(F.count(F.lit(1)).alias("n_cells"))
    nano = F.floor(
        (F.col("nij") * F.lit(1.0) / F.col("n"))
        * F.log(
            (F.col("n").cast("double") * F.col("nij"))
            / (F.col("ni").cast("double") * F.col("nj"))
        )
        * F.lit(1000000000)
        + F.lit(0.5 + 1e-8)
    ).cast("long")
    terms = (
        j.join(F.broadcast(mi), "et")
        .join(F.broadcast(mj), "b")
        .crossJoin(F.broadcast(tot))
        .select(F.col("n").alias("n_events"), nano.alias("nano"))
    )
    return (
        terms.groupBy("n_events")
        .agg(round_det(F.sum("nano") / F.lit(1000000000.0), 6).alias("mi_nats"))
        .crossJoin(F.broadcast(cells))
        .select(
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("n_events").cast("long").alias("n_events"),
            "mi_nats",
        )
    )


@register(
    "wilson_ci_return_rate",
    oracle="""
    WITH g AS (
        SELECT CAST(round(l_discount * 100, 0) AS INT) AS discount_pct,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM lineitem GROUP BY discount_pct
    )
    SELECT discount_pct, n, k,
           ROUND(k * 1.0 / n + 1e-8, 6) AS rate,
           ROUND((k * 1.0 / n + 1.9208 / n
                  - 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n + 0.9604 / (CAST(n AS DOUBLE) * n)))
                 / (1 + 3.8416 / n) + 1e-8, 6) AS ci_lo,
           ROUND((k * 1.0 / n + 1.9208 / n
                  + 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n + 0.9604 / (CAST(n AS DOUBLE) * n)))
                 / (1 + 3.8416 / n) + 1e-8, 6) AS ci_hi
    FROM g
    """,
    tags=("analytics", "confidence-interval", "proportion"),
)
def wilson_ci_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON 95% confidence interval on the return rate per discount
    band —
    the interval a practitioner should quote for a proportion (the
    naive Wald interval collapses to zero width at p=0/1 and undercovers
    at small n; Wilson inverts the score test, stays inside [0,1], and
    is what `ab_conversion_ztest`'s point estimates deserve around
    them).  Everything derives from two exact integers per group (n
    trials, k successes) through one fixed-order float expression with
    the z=1.96 constants pre-squared (1.9208 = z^2/2, 3.8416 = z^2,
    0.9604 = z^2/4), so both engines compute bit-identical doubles.
    Plan: one map-side-combinable aggregation; the statistic table is
    #groups-sized.  Scale: nothing downstream of the first agg touches
    row counts.  Reference parity: ref:app.py reports per-status rates
    with no uncertainty — this is the defensible version."""
    g = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.round(F.col("l_discount") * 100, 0).cast("int").alias("discount_pct"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    n, k = F.col("n"), F.col("k")
    p = k * F.lit(1.0) / n
    half = F.lit(1.96) * F.sqrt(
        p * (1 - p) / n + F.lit(0.9604) / (n.cast("double") * n)
    )
    denom = 1 + F.lit(3.8416) / n
    return g.select(
        "discount_pct",
        n.alias("n"),
        k.alias("k"),
        round_det(p, 6).alias("rate"),
        round_det((p + F.lit(1.9208) / n - half) / denom, 6).alias("ci_lo"),
        round_det((p + F.lit(1.9208) / n + half) / denom, 6).alias("ci_hi"),
    )


@register(
    "xcorr_click_purchase",
    oracle="""
    WITH bounds AS (
        SELECT min(epoch_us(ts) // 3600000000) AS h0,
               max(epoch_us(ts) // 3600000000) AS h1
        FROM events
    ),
    grid AS (SELECT unnest(generate_series((SELECT h0 FROM bounds), (SELECT h1 FROM bounds))) AS hr),
    c AS (
        SELECT epoch_us(ts) // 3600000000 AS hr,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    series AS (
        SELECT g.hr, COALESCE(c.x, 0) AS x, COALESCE(c.y, 0) AS y
        FROM grid g LEFT JOIN c ON c.hr = g.hr
    ),
    lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag),
    pairs AS (
        SELECT l.lag, a.x, b.y
        FROM series a CROSS JOIN lags l JOIN series b ON b.hr = a.hr + l.lag
    ),
    mom AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS np,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag_hours, np AS n_pairs,
           ROUND((np * sxy - sx * sy)
                 / sqrt(CAST(np * sxx - sx * sx AS DOUBLE) * (np * syy - sy * sy))
                 + 1e-8, 6) AS xcorr
    FROM mom
    """,
    tags=("analytics", "time-series", "cross-correlation", "lead-lag"),
)
def xcorr_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-CORRELATION between the hourly click and purchase count
    series at lags -3..+3 — the lead-lag diagnostic ("do clicks predict
    purchases an hour later?") that turns two dashboard sparklines into
    a causal-direction hint; the asymmetry between +k and -k is the
    signal (`acf_hourly_means` is the self-paired special case).  Both
    series are DENSIFIED onto the full hour grid (sequence + left join
    + 0-fill) because correlation over only-hours-with-events silently
    conditions on activity and biases r toward zero exactly when
    traffic is sparse.  Counts are exact integers, so all six moments
    per lag are integer-exact and r is one fixed-order float —
    bit-identical in both engines.  Plan: one events aggregation, a
    broadcast 1-row bounds cross to build the grid (sequence-explode,
    no driver collect), the 7-row lag dimension broadcast, and the
    shift alignment as an equi-self-join — everything after the first
    agg is #hours-sized."""
    e = _t(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 3600000000").alias("hr"), "event_type"
    )
    c = e.groupBy("hr").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    bounds = e.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr")
    )
    series = grid.join(c, "hr", "left").select(
        "hr", F.coalesce("x", F.lit(0)).alias("x"), F.coalesce("y", F.lit(0)).alias("y")
    )
    lags = spark.createDataFrame([(v,) for v in (-3, -2, -1, 0, 1, 2, 3)], "lag int")
    pairs = (
        series.crossJoin(F.broadcast(lags))
        .withColumn("hr_y", F.col("hr") + F.col("lag"))
        .alias("a")
        .join(series.alias("b"), F.col("a.hr_y") == F.col("b.hr"))
        .select(F.col("a.lag"), F.col("a.x").alias("x"), F.col("b.y").alias("y"))
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    np_, sx, sy = F.col("np"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return mom.select(
        F.col("lag").cast("int").alias("lag_hours"),
        np_.cast("long").alias("n_pairs"),
        round_det(
            (np_ * sxy - sx * sy)
            / F.sqrt((np_ * sxx - sx * sx).cast("double") * (np_ * syy - sy * sy)),
            6,
        ).alias("xcorr"),
    )


@register(
    "key_skew_audit",
    oracle="""
    WITH g AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(max(c) AS BIGINT) AS max_c
        FROM g
    )
    SELECT CAST(length(bin(c)) AS INT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_keys_in_bucket,
           CAST(sum(c) AS BIGINT) AS n_rows_in_bucket,
           ROUND(sum(c) * 1.0 / n_rows + 1e-8, 6) AS row_share,
           n_keys AS n_keys_total, max_c AS max_rows_per_key,
           ROUND(max_c * 1.0 * n_keys / n_rows + 1e-8, 4) AS skew_factor
    FROM g CROSS JOIN tot
    GROUP BY log2_bucket, n_keys, n_rows, max_c
    """,
    tags=("analytics", "data-quality", "skew", "shuffle-planning"),
)
def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SKEW AUDIT of the join/shuffle key distribution — the
    pre-flight check behind every salting/AQE-skew decision this engine
    makes (`salted_join_brand_revenue` PRESUMES a hot key; this query
    is how you find one): per-key counts collapse into a log2-bucketed
    count-of-counts histogram plus the summary a planner wants —
    max-rows-per-key and the skew factor max/avg (1.0 = uniform).  The
    bucket is computed as length(bin(c)) = floor(log2 c)+1 — INTEGER
    string-length arithmetic, deliberately not floor(ln c/ln 2), which
    lands on 2.999... for exact powers of two and mis-buckets them in
    engine-dependent ways.  All shares/ratios are single divisions of
    exact integers.  Plan: one map-side-combinable count, then
    everything is #keys-sized; the 1-row total is a broadcast cross.
    At 100 TB this runs ahead of any big join to decide broadcast vs
    salt vs AQE — the audit itself shuffles only the key column."""
    g = _t(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_c"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy(
            F.length(F.bin("c")).cast("int").alias("log2_bucket"),
            "n_keys",
            "n_rows",
            "max_c",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys_in_bucket"),
            F.sum("c").cast("long").alias("n_rows_in_bucket"),
            round_det(F.sum("c") * F.lit(1.0) / F.first("n_rows"), 6).alias("row_share"),
        )
        .select(
            "log2_bucket",
            "n_keys_in_bucket",
            "n_rows_in_bucket",
            "row_share",
            F.col("n_keys").cast("long").alias("n_keys_total"),
            F.col("max_c").cast("long").alias("max_rows_per_key"),
            round_det(
                F.col("max_c") * F.lit(1.0) * F.col("n_keys") / F.col("n_rows"), 4
            ).alias("skew_factor"),
        )
    )


@register(
    "theilsen_trend_per_type",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) AS d,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(floor((((b.s / b.c) - (a.s / a.c)) / (b.d - a.d)) / 100.0 * 1e9
                          + 0.5 + 1e-8) AS BIGINT) AS slope_nano
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    ),
    ranked AS (
        SELECT event_type, slope_nano,
               row_number() OVER (PARTITION BY event_type ORDER BY slope_nano) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM pairs
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs, slope_nano,
           ROUND(slope_nano / 1e9 + 1e-8, 6) AS slope_per_day
    FROM ranked WHERE rn = (n + 1) // 2
    """,
    tags=("analytics", "robust", "trend", "theil-sen"),
)
def theilsen_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend per event type — the median of all
    pairwise day-to-day slopes, the outlier-resistant twin of
    `regression_per_group`'s OLS (one wild day drags a least-squares
    slope arbitrarily; it moves the pairwise-slope MEDIAN by at most
    one rank).  Scale design: Theil-Sen is O(n^2) in POINTS, so the
    points are the per-(type, day) aggregate — one map-side-combinable
    pass collapses any event volume to #types x #days rows, and the
    pairwise self-join is C(#days, 2) per type, bounded by the
    CALENDAR, never by data volume (30 days -> 435 pairs/type at any
    scale).  Exactness: daily sums ride exact cents; every slope is
    quantized to 1e-9/day nano-units from identically-derived doubles,
    and the estimate is the LOWER MEDIAN (rank (n+1) div 2) of those
    integers — order- and tie-independent, so the hash pins the whole
    estimator.  Reference anchor: ref trend classification
    (`ma_diff_trend` family) + Sen (1968) / Theil (1950), public."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("d"),
        )
        .agg(
            F.sum(as_cents(F.col("value"))).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("s").alias("s1"), F.col("c").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("d").alias("d2"), F.col("s").alias("s2"), F.col("c").alias("c2")
    )
    slope_nano = F.floor(
        ((F.col("s2") / F.col("c2") - F.col("s1") / F.col("c1")) / (F.col("d2") - F.col("d1")))
        / 100.0
        * 1e9
        + F.lit(0.5 + 1e-8)
    ).cast("long")
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select("event_type", slope_nano.alias("slope_nano"), "d1", "d2")
    )
    w = Window.partitionBy("event_type").orderBy("slope_nano", "d1", "d2")
    wc = Window.partitionBy("event_type")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn("n_pairs", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select(
            "event_type",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "slope_nano",
            round_det(F.col("slope_nano") / 1e9, 6).alias("slope_per_day"),
        )
    )


@register(
    "trimmed_winsorized_means",
    oracle="""
    WITH ranked AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    bounds AS (
        SELECT event_type, CAST(n AS BIGINT) AS n, CAST(n // 10 AS BIGINT) AS k,
               min(CASE WHEN rn = n // 10 + 1 THEN cents END) AS lo_cents,
               min(CASE WHEN rn = n - n // 10 THEN cents END) AS hi_cents,
               sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10 THEN cents ELSE 0 END)
                   AS mid_sum
        FROM ranked GROUP BY event_type, n
    )
    SELECT event_type, n, k,
           ROUND(lo_cents / 100.0 + 1e-8, 2) AS lo_cut,
           ROUND(hi_cents / 100.0 + 1e-8, 2) AS hi_cut,
           ROUND(mid_sum / (100.0 * (n - 2 * k)) + 1e-8, 4) AS trimmed_mean,
           ROUND((mid_sum + k * lo_cents + k * hi_cents) / (100.0 * n) + 1e-8, 4)
               AS winsorized_mean
    FROM bounds
    """,
    tags=("analytics", "robust", "aggregate"),
)
def trimmed_winsorized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided TRIMMED and WINSORIZED means per event type — the
    robust location estimates every metrics pipeline reaches for when a
    plain mean is one fat-finger away from garbage.  Rank-based exact
    semantics (drop/clamp by ORDER STATISTIC, k = n div 10), not
    percentile interpolation: the trimmed mean sums exact cents over
    ranks (k, n-k], the winsorized mean adds k copies of each cut value
    — all integer arithmetic until one final division, so the hash pins
    the estimator, not a float approximation of it.  One window sort
    per group (parallel across groups; a single giant group would ride
    the `global_ntile` range-partition kernels) and one map-side
    aggregate — no second pass, the cut values fall out of the same
    GROUP BY via rank-pinned MIN(CASE).  Robust-stats family:
    `mad_anomaly`, `weighted_median_price`, `theilsen_trend_per_type`."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        as_cents(F.col("value")).alias("cents"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    k = F.expr("n div 10")
    bounds = (
        ranked.groupBy("event_type", "n")
        .agg(
            F.min(F.when(F.col("rn") == k + 1, F.col("cents"))).alias("lo_cents"),
            F.min(F.when(F.col("rn") == F.col("n") - k, F.col("cents"))).alias("hi_cents"),
            F.sum(
                F.when((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k), F.col("cents"))
                .otherwise(F.lit(0))
            ).alias("mid_sum"),
        )
    )
    kk = F.expr("n div 10").cast("long")
    return bounds.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        kk.alias("k"),
        round_det(F.col("lo_cents") / 100.0, 2).alias("lo_cut"),
        round_det(F.col("hi_cents") / 100.0, 2).alias("hi_cut"),
        round_det(F.col("mid_sum") / (100.0 * (F.col("n") - 2 * kk)), 4).alias("trimmed_mean"),
        round_det(
            (F.col("mid_sum") + kk * F.col("lo_cents") + kk * F.col("hi_cents"))
            / (100.0 * F.col("n")),
            4,
        ).alias("winsorized_mean"),
    )


@register(
    "pythagorean_means_per_type",
    oracle="""
    WITH vals AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE CAST(round(value * 100, 0) AS BIGINT) > 0
    ),
    acc AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(sum(CAST(floor(ln(cents / 100.0) * 1e9 + 0.5 + 1e-8) AS BIGINT))
                    AS BIGINT) AS sum_lnano,
               CAST(sum(1000000000000 // cents) AS BIGINT) AS sum_inv
        FROM vals GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(sum_cents / (100.0 * n) + 1e-8, 4) AS amean,
           ROUND(exp(sum_lnano / (1e9 * n)) + 1e-8, 4) AS gmean,
           ROUND(n * 1000000000000 / sum_inv / 100.0 + 1e-8, 4) AS hmean
    FROM acc
    """,
    tags=("analytics", "statistics", "means"),
)
def pythagorean_means_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three PYTHAGOREAN MEANS per event type in ONE order-independent
    aggregate — arithmetic (exact cents), geometric (each row's ln
    quantized to integer NANO-NATS before summation, the
    `unigram_logprob_score` precedent: float exp/ln happen only on
    identically-derived scalars, never inside a reduction whose order
    differs between engines), and harmonic (each reciprocal quantized by
    INTEGER DIVISION 1e12 div cents — exact, so the denominator is an
    integer sum).  AM >= GM >= HM by construction, a useful sanity
    invariant for rate metrics where the arithmetic mean of ratios is
    the classic wrong answer (harmonic is the right mean for rates,
    geometric for growth factors).  Zero values are excluded with the
    SAME guard in both engines (ln/reciprocal undefined).  Plan: one
    map-side-combinable hash agg — scan-speed at any scale."""
    ev = load_table(spark, sf_dir, "events")
    cents = as_cents(F.col("value"))
    vals = ev.select("event_type", cents.alias("cents")).filter(F.col("cents") > 0)
    lnano = F.floor(F.log(F.col("cents") / 100.0) * 1e9 + F.lit(0.5 + 1e-8)).cast("long")
    inv = F.expr("1000000000000 div cents")
    acc = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum(lnano).cast("long").alias("sum_lnano"),
        F.sum(inv).cast("long").alias("sum_inv"),
    )
    return acc.select(
        "event_type",
        "n",
        round_det(F.col("sum_cents") / (100.0 * F.col("n")), 4).alias("amean"),
        round_det(F.exp(F.col("sum_lnano") / (1e9 * F.col("n"))), 4).alias("gmean"),
        round_det(
            F.col("n") * 1000000000000 / F.col("sum_inv") / 100.0, 4
        ).alias("hmean"),
    )


@register(
    "conformal_forecast_interval",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) AS d,
               CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 1000000) // count(*)
                    AS BIGINT) AS m6
        FROM events GROUP BY 1, 2
    ),
    mn AS (SELECT min(d) AS d0 FROM daily),
    idx AS (SELECT event_type, d - d0 AS i, m6 FROM daily CROSS JOIN mn),
    fit AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(i) AS BIGINT) AS sx, CAST(sum(m6) AS BIGINT) AS sy,
               CAST(sum(i * i) AS BIGINT) AS sxx, CAST(sum(i * m6) AS BIGINT) AS sxy
        FROM idx WHERE i < 20 GROUP BY 1
    ),
    coef AS (
        SELECT event_type,
               CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
                   AS slope,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                 - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 AS icept
        FROM fit
    ),
    cal AS (
        SELECT CAST(floor(abs(m6 - (icept + slope * i)) + 0.5 + 1e-8) AS BIGINT) AS r
        FROM idx JOIN coef USING (event_type) WHERE i >= 20 AND i < 25
    ),
    q AS (
        SELECT r AS qhat, CAST(n_cal AS BIGINT) AS n_cal FROM (
            SELECT r, row_number() OVER (ORDER BY r) AS rn, count(*) OVER () AS n_cal
            FROM cal
        ) WHERE rn = (9 * (n_cal + 1) + 9) // 10
    )
    SELECT event_type, CAST(i AS BIGINT) AS day_idx,
           CAST(m6 AS BIGINT) AS actual_m6,
           CAST(floor(icept + slope * i + 0.5 + 1e-8) AS BIGINT) AS pred_m6,
           qhat, n_cal,
           (abs(m6 - (icept + slope * i)) <= qhat) AS covered
    FROM idx JOIN coef USING (event_type) CROSS JOIN q
    WHERE i >= 25
    """,
    tags=("analytics", "ml-eval", "conformal", "forecast"),
)
def conformal_forecast_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL PREDICTION INTERVALS around a per-type daily
    forecast — the distribution-free uncertainty band every forecast
    that feeds a decision needs (Vovk et al.; Lei et al. 2018, the
    method behind MAPIE): fit OLS on days 0-19, take the
    ceil(0.9*(n+1))-th smallest absolute residual on held-out
    calibration days 20-24 as q-hat, and report each test day (25+)
    with its prediction, the +-q-hat band, and whether the actual
    landed inside — finite-sample 90% coverage with NO distributional
    assumption, which a Gaussian +-1.64sigma band cannot promise.
    Exactness: daily means quantized once by INTEGER division to
    micro-cents; OLS runs on exact integer moments with the division
    spelled identically in both engines (the `regression_per_group`
    discipline); residuals and predictions quantize through the same
    floor(+0.5+1e-8) before any comparison, so the coverage booleans
    hash.  Scale: the heavy pass is the per-(type, day) aggregate —
    everything after is calendar-bounded (the pooled calibration set is
    #types x 5 rows; its rank-q selection is deliberately a tiny
    window, not a data-sized sort)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("d"),
        )
        .agg(
            F.expr(
                "CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 1000000)"
                " div count(*) AS BIGINT)"
            ).alias("m6")
        )
    )
    mn = F.broadcast(daily.agg(F.min("d").alias("d0")))
    idx = daily.crossJoin(mn).select(
        "event_type", (F.col("d") - F.col("d0")).alias("i"), "m6"
    )
    fit = (
        idx.filter(F.col("i") < 20)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("i").cast("long").alias("sx"),
            F.sum("m6").cast("long").alias("sy"),
            F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
            F.sum(F.col("i") * F.col("m6")).cast("long").alias("sxy"),
        )
    )
    coef = fit.select(
        "event_type",
        F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"
        ).alias("slope"),
        F.expr(
            "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"
            " - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"
            " * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
        ).alias("icept"),
    )
    joined = idx.join(F.broadcast(coef), "event_type")
    cal = joined.filter((F.col("i") >= 20) & (F.col("i") < 25)).select(
        F.expr("CAST(floor(abs(m6 - (icept + slope * i)) + 0.5 + 1e-8) AS BIGINT)").alias("r")
    )
    wq = Window.orderBy("r")
    wc = Window.partitionBy()
    q = F.broadcast(
        cal.select(
            "r",
            F.row_number().over(wq).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_cal"),
        )
        .filter(F.col("rn") == F.expr("(9 * (n_cal + 1) + 9) div 10"))
        .select(F.col("r").alias("qhat"), F.col("n_cal").cast("long").alias("n_cal"))
    )
    return (
        joined.filter(F.col("i") >= 25)
        .crossJoin(q)
        .select(
            "event_type",
            F.col("i").cast("long").alias("day_idx"),
            F.col("m6").cast("long").alias("actual_m6"),
            F.expr("CAST(floor(icept + slope * i + 0.5 + 1e-8) AS BIGINT)").alias("pred_m6"),
            "qhat",
            "n_cal",
            F.expr("abs(m6 - (icept + slope * i)) <= qhat").alias("covered"),
        )
    )


@register(
    "backtest_rolling_origin",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) AS d,
               CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 1000000) // count(*)
                    AS BIGINT) AS m6
        FROM events GROUP BY 1, 2
    ),
    mn AS (SELECT min(d) AS d0 FROM daily),
    idx AS (SELECT event_type, d - d0 AS i, m6 FROM daily CROSS JOIN mn),
    evals AS (
        SELECT a.event_type,
               abs(a.m6 - n1.m6) AS err_naive,
               abs(a.m6 - s7.m6) AS err_seasonal
        FROM idx a
        JOIN idx n1 ON n1.event_type = a.event_type AND n1.i = a.i - 1
        JOIN idx s7 ON s7.event_type = a.event_type AND s7.i = a.i - 7
        WHERE a.i >= 21
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_origins,
           CAST(sum(err_naive) AS BIGINT) AS sae_naive6,
           CAST(sum(err_seasonal) AS BIGINT) AS sae_seasonal6,
           (sum(err_seasonal) < sum(err_naive)) AS seasonal_wins
    FROM evals GROUP BY event_type
    """,
    tags=("analytics", "forecast", "backtest"),
)
def backtest_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING-ORIGIN FORECAST BACKTEST — the model-selection evidence a
    forecast pipeline owes before anyone trusts its numbers: for every
    origin day from 21 on, score the one-step NAIVE forecast
    (yesterday's value) against the SEASONAL-NAIVE (same weekday last
    week) and report each type's summed absolute error plus the
    verdict bit.  This is the m-competition evaluation protocol
    (Hyndman & Athanasopoulos, fpp3) reduced to its dataflow shape:
    the per-(type, day) aggregate once again collapses data volume to
    calendar size, and each origin's forecasts are SELF-JOINS AT FIXED
    LAG on that tiny frame — no window over raw events, no state.
    Errors stay in exact micro-cents (integer-division daily means, the
    `conformal_forecast_interval` discipline), so the winner bit is
    hash-stable.  Complements `holt_forecast_per_user` (a model) with
    the harness that would pick between models."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("d"),
        )
        .agg(
            F.expr(
                "CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 1000000)"
                " div count(*) AS BIGINT)"
            ).alias("m6")
        )
    )
    mn = F.broadcast(daily.agg(F.min("d").alias("d0")))
    idx = daily.crossJoin(mn).select(
        "event_type", (F.col("d") - F.col("d0")).alias("i"), "m6"
    )
    a = idx.alias("a")
    n1 = idx.select("event_type", (F.col("i") + 1).alias("i"), F.col("m6").alias("m6_n1"))
    s7 = idx.select("event_type", (F.col("i") + 7).alias("i"), F.col("m6").alias("m6_s7"))
    evals = (
        a.join(n1, ["event_type", "i"])
        .join(s7, ["event_type", "i"])
        .filter(F.col("i") >= 21)
        .select(
            "event_type",
            F.abs(F.col("m6") - F.col("m6_n1")).alias("err_naive"),
            F.abs(F.col("m6") - F.col("m6_s7")).alias("err_seasonal"),
        )
    )
    return evals.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_origins"),
        F.sum("err_naive").cast("long").alias("sae_naive6"),
        F.sum("err_seasonal").cast("long").alias("sae_seasonal6"),
        (F.sum("err_seasonal") < F.sum("err_naive")).alias("seasonal_wins"),
    )


@register(
    "kendall_tau_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT CASE WHEN (a.n_events - b.n_events) * (a.sum_cents - b.sum_cents) > 0
                    THEN 1 ELSE 0 END AS conc,
               CASE WHEN (a.n_events - b.n_events) * (a.sum_cents - b.sum_cents) < 0
                    THEN 1 ELSE 0 END AS disc,
               CASE WHEN a.n_events = b.n_events THEN 1 ELSE 0 END AS tie_x,
               CASE WHEN a.sum_cents = b.sum_cents THEN 1 ELSE 0 END AS tie_y
        FROM daily a JOIN daily b ON a.d < b.d
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(sum(disc) AS BIGINT) AS discordant,
           CAST(sum(tie_x) AS BIGINT) AS ties_x,
           CAST(sum(tie_y) AS BIGINT) AS ties_y,
           ROUND((sum(conc) - sum(disc))
                 / (sqrt(count(*) - sum(tie_x)) * sqrt(count(*) - sum(tie_y)))
                 + 1e-8, 6) AS tau_b
    FROM pairs
    """,
    tags=("analytics", "statistics", "correlation", "kendall"),
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S TAU-B between daily event volume and daily total value —
    completing the correlation family (Pearson `corr_matrix`, Spearman
    `spearman_qty_price`): the rank correlation whose unit is PAIRS
    (concordant minus discordant over tie-adjusted pairs), preferred
    when the monotone relationship matters but ranks are heavily tied.
    Tau is O(n^2) in points, so — the `theilsen_trend_per_type` rule —
    the points are the per-DAY aggregates: C(#days, 2) pairs regardless
    of event volume.  Concordance tests are pure integer sign products
    (exact cents, exact counts); the only float is the final tie-
    adjusted normalization from integer sums.  At larger calendars the
    O(n log n) merge-sort inversion count is the known upgrade
    (Knight 1966) — the n^2 pair join is correct and calendar-bounded
    here."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(as_cents(F.col("value"))).cast("long").alias("sum_cents"),
    )
    a = daily.select(
        F.col("d").alias("d1"), F.col("n_events").alias("x1"), F.col("sum_cents").alias("y1")
    )
    b = daily.select(
        F.col("d").alias("d2"), F.col("n_events").alias("x2"), F.col("sum_cents").alias("y2")
    )
    pairs = a.crossJoin(b).filter(F.col("d1") < F.col("d2")).select(
        F.when((F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2")) > 0, 1)
        .otherwise(0)
        .alias("conc"),
        F.when((F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2")) < 0, 1)
        .otherwise(0)
        .alias("disc"),
        F.when(F.col("x1") == F.col("x2"), 1).otherwise(0).alias("tie_x"),
        F.when(F.col("y1") == F.col("y2"), 1).otherwise(0).alias("tie_y"),
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
        F.sum("tie_x").cast("long").alias("ties_x"),
        F.sum("tie_y").cast("long").alias("ties_y"),
        round_det(
            (F.sum("conc") - F.sum("disc"))
            / (
                F.sqrt(F.count(F.lit(1)) - F.sum("tie_x"))
                * F.sqrt(F.count(F.lit(1)) - F.sum("tie_y"))
            ),
            6,
        ).alias("tau_b"),
    )


@register(
    "psi_value_drift",
    oracle="""
    WITH ref AS (
        SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'click'
    ),
    tgt AS (
        SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    rb AS (
        SELECT cents, ntile(10) OVER (ORDER BY cents, event_id) AS bin FROM ref
    ),
    edges AS (
        SELECT bin, CAST(max(cents) AS BIGINT) AS edge,
               CAST(count(*) AS BIGINT) AS c_ref
        FROM rb GROUP BY bin
    ),
    tb AS (
        SELECT t.event_id, COALESCE(min(e.bin), 10) AS bin
        FROM tgt t LEFT JOIN edges e ON t.cents <= e.edge AND e.bin < 10
        GROUP BY t.event_id
    ),
    tc AS (SELECT bin, CAST(count(*) AS BIGINT) AS c_tgt FROM tb GROUP BY bin),
    tot AS (
        SELECT (SELECT count(*) FROM ref) AS n_ref,
               (SELECT count(*) FROM tgt) AS n_tgt
    )
    SELECT e.bin, e.edge, e.c_ref,
           CAST(COALESCE(tc.c_tgt, 0) AS BIGINT) AS c_tgt,
           CAST(floor(
               ((e.c_ref + 1.0) / (tot.n_ref + 10) - (COALESCE(tc.c_tgt, 0) + 1.0) / (tot.n_tgt + 10))
               * ln(((e.c_ref + 1.0) / (tot.n_ref + 10))
                    / ((COALESCE(tc.c_tgt, 0) + 1.0) / (tot.n_tgt + 10)))
               * 1e9 + 0.5 + 1e-8) AS BIGINT) AS contrib_nano
    FROM edges e LEFT JOIN tc ON tc.bin = e.bin CROSS JOIN tot
    """,
    tags=("analytics", "drift", "psi", "monitoring", "global-ntile"),
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX between two value distributions
    (clicks as the reference, purchases as the live target) — the
    model-monitoring drift score credit scoring popularized: decile
    edges come from the REFERENCE's exact order statistics, the target
    buckets against those edges, and PSI = sum (p_i - q_i) ln(p_i/q_i)
    with +1 Laplace smoothing so empty target bins stay finite
    (documented, mirrored in both engines).  `corpus_kl_drift` is the
    token-distribution cousin; PSI's edge-from-reference binning is
    what production scorecards actually deploy.  Exactness: integer
    cents everywhere; reference binning rides `global_ntile` (fourth
    kernel consumer) vs the oracle's native ntile; each bin's
    contribution quantizes identically-derived doubles to nano-units
    before the (driver-side) sum, so the hash pins all ten
    contributions.  Plan: two filtered scans, the kernel's range
    shuffle on the reference, a BROADCAST edge join to bucket the
    target (10 rows), two hash aggs."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_ntile

    ev = load_table(spark, sf_dir, "events")
    cents = as_cents(F.col("value"))
    ref = ev.filter(F.col("event_type") == "click").select(
        "event_id", cents.alias("cents")
    )
    tgt = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", cents.alias("cents")
    )
    rb = global_ntile(ref, [F.col("cents"), F.col("event_id")], 10, out="bin")
    edges = rb.groupBy("bin").agg(
        F.max("cents").cast("long").alias("edge"),
        F.count(F.lit(1)).cast("long").alias("c_ref"),
    )
    tb = (
        tgt.join(
            F.broadcast(edges.filter(F.col("bin") < 10).select("bin", "edge")),
            F.col("cents") <= F.col("edge"),
            "left",
        )
        .groupBy("event_id")
        .agg(F.coalesce(F.min("bin"), F.lit(10)).alias("bin"))
    )
    tc = tb.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("c_tgt"))
    tot = F.broadcast(
        ref.agg(F.count(F.lit(1)).alias("n_ref")).crossJoin(
            tgt.agg(F.count(F.lit(1)).alias("n_tgt"))
        )
    )
    j = (
        edges.join(tc, "bin", "left")
        .withColumn("c_tgt", F.coalesce(F.col("c_tgt"), F.lit(0)).cast("long"))
        .crossJoin(tot)
    )
    p = (F.col("c_ref") + 1.0) / (F.col("n_ref") + 10)
    q = (F.col("c_tgt") + 1.0) / (F.col("n_tgt") + 10)
    return j.select(
        "bin",
        "edge",
        "c_ref",
        "c_tgt",
        F.floor((p - q) * F.log(p / q) * 1e9 + F.lit(0.5 + 1e-8))
        .cast("long")
        .alias("contrib_nano"),
    )


@register(
    "ab_cuped_adjustment",
    oracle="""
    WITH mn AS (
        SELECT min(CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT)) AS d0
        FROM events
    ),
    per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
               CAST(sum(CASE WHEN CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) - d0 < 15
                             THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) - d0 >= 15
                             THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        FROM events CROSS JOIN mn GROUP BY user_id
    ),
    mom AS (
        -- second-moment sums stay HUGEINT (no BIGINT cast): they cross
        -- 2^63 at the same scale the Spark side was decimal-hardened
        -- for, and they only feed CAST(... AS DOUBLE) arithmetic below
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM per_user
    ),
    theta AS (
        SELECT CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS th,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        FROM mom
    ),
    adj AS (
        SELECT arm, y,
               CAST(floor((y - th * (x - xbar)) * 100 + 0.5 + 1e-8) AS BIGINT) AS y2
        FROM per_user CROSS JOIN theta
    )
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_users,
           ROUND(sum(y) / (100.0 * count(*)) + 1e-8, 4) AS mean_y,
           ROUND((count(*) * sum(y * y) - sum(y) * sum(y))
                 / (1.0 * count(*) * (count(*) - 1)) + 1e-8, 4) AS var_y_cents2,
           ROUND(sum(y2) / (10000.0 * count(*)) + 1e-8, 4) AS mean_adj,
           ROUND((count(*) * sum(y2 * y2) - sum(y2) * sum(y2))
                 / (10000.0 * count(*) * (count(*) - 1)) + 1e-8, 4) AS var_adj_cents2,
           ROUND((1.0 - ((count(*) * sum(y2 * y2) - sum(y2) * sum(y2)) / 10000.0)
                        / (count(*) * sum(y * y) - sum(y) * sum(y))) * 100 + 1e-8, 4)
               AS var_reduction_pct
    FROM adj GROUP BY arm
    """,
    tags=("analytics", "experimentation", "cuped", "variance-reduction"),
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED VARIANCE REDUCTION for the A/B stack (Deng et al. 2013,
    WSDM — the adjustment every mature experimentation platform
    applies): per-user pre-period spend (days 0-14) is the covariate,
    post-period spend the metric; theta = cov(x,y)/var(x) from EXACT
    integer moments pooled across arms (pre-period data is
    treatment-independent, so pooling is unbiased), adjusted metric
    y' = y - theta(x - xbar), and the hashed report shows per-arm mean
    (unchanged by construction up to the centering) and the variance
    drop that shrinks the experiment's confidence intervals —
    `ab_conversion_ztest`'s power upgrade.  Exactness: x, y are exact
    cents; theta/xbar are identically-derived doubles; each adjusted
    value quantizes to centi-cents BEFORE the second-moment sums, and
    the variance NUMERATORS (n*sum(v^2) - sum(v)^2) are computed in
    DECIMAL(38,0) — exact to ~1e38 — because at sf0.1 row counts
    sum(y2)^2 already exceeds int64 (found by the round-11 full-catalog
    sweep: ANSI multiplyExact overflow in the final hash agg; the
    DuckDB oracle's aggregate sums are int128, and round 12 removed the
    BIGINT casts its CTEs put on the second-moment sums so the oracle
    truly holds to ~1e38 too, not just to the same 2^63 cliff).  The exact
    integer numerator then divides as a double, so sf0.01 values are
    bit-identical to the int64 formulation and the scale ceiling moves
    to ~1e10 users.  Plan: one per-user aggregate (map-side
    combinable), a 1-row moment broadcast, one final hash agg."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    mn = F.broadcast(ev.agg(F.min(day).alias("d0")))
    cents = as_cents(F.col("value"))
    per_user = (
        ev.crossJoin(mn)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(day - F.col("d0") < 15, cents).otherwise(0)).cast("long").alias("x"),
            F.sum(F.when(day - F.col("d0") >= 15, cents).otherwise(0)).cast("long").alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    )
    # theta moments in DECIMAL(38,0): n*sxy / sx*sy sit within ~20x of
    # the int64 cliff at sf0.1 (ab_cuped_adjustment's final-agg
    # numerators crossed the same cliff — round-11 sweep find); exact
    # decimals move the ceiling to ~1e38, and the double cast of the
    # exact integer matches the oracle's int128 arithmetic bit-for-bit
    xdm, ydm = F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)")
    mom = F.broadcast(
        per_user.agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(xdm).alias("sx"),
            F.sum(ydm).alias("sy"),
            F.sum(xdm * xdm).alias("sxx"),
            F.sum(xdm * ydm).alias("sxy"),
        ).select(
            F.expr(
                "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"
            ).alias("th"),
            F.expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").alias("xbar"),
        )
    )
    adj = per_user.crossJoin(mom).select(
        "arm",
        "y",
        F.expr("CAST(floor((y - th * (x - xbar)) * 100 + 0.5 + 1e-8) AS BIGINT)").alias("y2"),
    )
    n = F.count(F.lit(1))
    # second moments in DECIMAL(38,0): sum(v)^2 alone exceeds int64 at
    # sf0.1 user counts (ANSI overflow, round-11 sweep find) — the
    # decimal lattice keeps the numerator EXACT to ~1e38, matching the
    # oracle's int128 sums value-for-value
    yd = F.col("y").cast("decimal(38,0)")
    y2d = F.col("y2").cast("decimal(38,0)")
    nd = n.cast("decimal(38,0)")
    var_y_num = nd * F.sum(yd * yd) - F.sum(yd) * F.sum(yd)
    var_adj_num = nd * F.sum(y2d * y2d) - F.sum(y2d) * F.sum(y2d)
    return adj.groupBy("arm").agg(
        n.cast("long").alias("n_users"),
        round_det(F.sum("y") / (100.0 * n), 4).alias("mean_y"),
        round_det(var_y_num / (1.0 * n * (n - 1)), 4).alias("var_y_cents2"),
        round_det(F.sum("y2") / (10000.0 * n), 4).alias("mean_adj"),
        round_det(var_adj_num / (10000.0 * n * (n - 1)), 4).alias("var_adj_cents2"),
        round_det(
            (F.lit(1.0) - (var_adj_num / 10000.0) / var_y_num) * 100,
            4,
        ).alias("var_reduction_pct"),
    )


@register(
    "kfold_regression_stability",
    oracle="""
    WITH mn AS (
        SELECT min(CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT)) AS d0
        FROM events
    ),
    rows_ AS (
        SELECT CAST(user_id % 5 AS INT) AS fold,
               CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) - d0 AS x,
               CAST(round(value * 100, 0) AS BIGINT) AS y
        FROM events CROSS JOIN mn
    ),
    mom AS (
        SELECT fold, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM rows_ GROUP BY fold
    )
    SELECT fold, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
                 + 1e-8, 8) AS slope_cents_per_day,
           ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                 - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 + 1e-8, 6) AS intercept_cents,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
                 + 1e-8, 6) AS r2
    FROM mom
    """,
    tags=("analytics", "ml-eval", "cross-validation", "regression"),
)
def kfold_regression_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-FOLD COEFFICIENT STABILITY — the cross-validation diagnostic
    that separates a real trend from a fold-dependent artifact: users
    hash into 5 disjoint folds (user-LEVEL split, the grouped-CV rule
    that prevents within-user leakage across folds), each fold fits
    the global value-vs-day OLS from EXACT integer moments, and the
    hashed per-fold slopes/intercepts/r2 show whether the estimate
    survives resampling (a stable model's fold coefficients agree to
    noise; a leaky or overfit one fans out).  One map-side-combinable
    aggregate computes all five fits simultaneously — k-fold CV as ONE
    pass, not k jobs, because closed-form moments make 'hold out a
    fold' just another GROUP BY key.  Same exactness discipline as
    `regression_per_group`; complements `conformal_forecast_interval`
    (uncertainty) and `backtest_rolling_origin` (model selection)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    mn = F.broadcast(ev.agg(F.min(day).alias("d0")))
    rows_ = ev.crossJoin(mn).select(
        (F.col("user_id") % 5).cast("int").alias("fold"),
        (day - F.col("d0")).alias("x"),
        as_cents(F.col("value")).alias("y"),
    )
    # moments in DECIMAL(38,0): n*syy and sy*sy sit within ~10x of the
    # int64 cliff at sf0.1 event counts (ab_cuped_adjustment's final
    # agg crossed the same cliff — round-11 sweep find); the exact
    # decimal lattice matches the oracle's int128 sums value-for-value
    # and the OUTPUT n stays bigint for schema parity
    xd, yd = F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)")
    mom = rows_.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nd"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(yd * yd).alias("syy"),
    )
    return mom.select(
        "fold",
        "n",
        round_det(
            F.expr(
                "CAST(nd * sxy - sx * sy AS DOUBLE) / CAST(nd * sxx - sx * sx AS DOUBLE)"
            ),
            8,
        ).alias("slope_cents_per_day"),
        round_det(
            F.expr(
                "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"
                " - CAST(nd * sxy - sx * sy AS DOUBLE) / CAST(nd * sxx - sx * sx AS DOUBLE)"
                "   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
            ),
            6,
        ).alias("intercept_cents"),
        round_det(
            F.expr(
                "CAST(nd * sxy - sx * sy AS DOUBLE) * CAST(nd * sxy - sx * sy AS DOUBLE)"
                " / (CAST(nd * sxx - sx * sx AS DOUBLE) * CAST(nd * syy - sy * sy AS DOUBLE))"
            ),
            6,
        ).alias("r2"),
    )


@register(
    "nelson_aalen_hazard",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ),
    mx AS (SELECT max(o_orderdate) AS md FROM orders),
    per AS (
        SELECT f.o_custkey,
               CASE WHEN s.o_orderdate IS NOT NULL
                    THEN date_diff('day', f.o_orderdate, s.o_orderdate) ELSE
                         date_diff('day', f.o_orderdate, mx.md) END AS t_days,
               CASE WHEN s.o_orderdate IS NOT NULL THEN 1 ELSE 0 END AS event
        FROM ranked f
        LEFT JOIN ranked s ON s.o_custkey = f.o_custkey AND s.rn = 2
        CROSS JOIN mx
        WHERE f.rn = 1
    ),
    days AS (
        SELECT t_days, CAST(sum(event) AS BIGINT) AS d,
               CAST(sum(1 - event) AS BIGINT) AS c
        FROM per GROUP BY t_days
    ),
    n AS (SELECT CAST(sum(d + c) AS BIGINT) AS total FROM days),
    curve AS (
        SELECT t_days, d,
               n.total
               - COALESCE(sum(d + c) OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
        FROM days, n
    ),
    terms AS (
        SELECT t_days, d, at_risk,
               CAST(floor(d / CAST(at_risk AS DOUBLE) * 1000000000 + 0.5 + 1e-8)
                    AS BIGINT) AS nano
        FROM curve
    )
    SELECT t_days, CAST(at_risk AS BIGINT) AS n_at_risk, d AS d_events,
           CAST(sum(nano) OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_hazard_nano,
           ROUND(exp(-sum(nano) OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING)
                     / 1000000000.0) + 1e-8, 6) AS fh_survival
    FROM terms WHERE TRUE QUALIFY d > 0
    """,
    tags=("analytics", "survival", "nelson-aalen", "prefix-sum"),
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON-AALEN cumulative hazard for time-to-repurchase — the
    survival family's second estimator next to `kaplan_meier_
    repurchase`: H(t) = sum d_i/n_i over event times, with exp(-H) the
    Fleming-Harrington survival (tighter than KM in small-risk-set
    tails, and the quantity Cox models regress on).  Same distributed
    shape as KM: subjects collapse to the day grain, the at-risk count
    and the cumulative hazard BOTH ride
    `operators/windows.global_running_sum` (no single-task window),
    and each day's d/n increment quantizes to nano-units before the
    prefix sum so the cumulative integer is order-exact.  Sharing the
    (t, d, n) table with KM is the production pattern — one pass, both
    estimators."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_running_sum

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    mx = F.broadcast(o.agg(F.max("o_orderdate").alias("md")))
    day = lambda c: F.floor(F.unix_seconds(c) / 86400)  # noqa: E731
    per = (
        ranked.groupBy("o_custkey")
        .agg(
            F.min(F.when(F.col("rn") == 1, day(F.col("o_orderdate")))).alias("fd"),
            F.min(F.when(F.col("rn") == 2, day(F.col("o_orderdate")))).alias("sd"),
        )
        .crossJoin(mx)
        .select(
            F.coalesce(
                F.col("sd") - F.col("fd"), day(F.col("md")) - F.col("fd")
            ).cast("long").alias("t_days"),
            F.col("sd").isNotNull().cast("long").alias("event"),
        )
    )
    days = per.groupBy("t_days").agg(
        F.sum("event").alias("d"), F.sum(1 - F.col("event")).alias("c")
    )
    days = days.withColumn("dep", F.col("d") + F.col("c"))
    cum = global_running_sum(days, ["t_days"], "dep", out="cum")
    curve = cum.select(
        "t_days",
        "d",
        (F.col("_grs_total") - F.col("cum") + F.col("dep")).alias("at_risk"),
    )
    term = F.floor(
        F.col("d") / F.col("at_risk").cast("double") * 1000000000 + F.lit(0.5 + 1e-8)
    ).cast("long")
    terms = curve.withColumn("nano", term)
    haz = global_running_sum(terms, ["t_days"], "nano", out="hsum")
    return haz.filter(F.col("d") > 0).select(
        "t_days",
        F.col("at_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.col("hsum").cast("long").alias("cum_hazard_nano"),
        round_det(F.exp(-F.col("hsum") / 1000000000.0), 6).alias("fh_survival"),
    )


@register(
    "revenue_bridge_decomposition",
    oracle="""
    WITH mn AS (
        SELECT min(CAST(floor(EXTRACT(epoch FROM o_orderdate) / 86400) AS BIGINT)) AS d0
        FROM orders
    ),
    rows_ AS (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN CAST(floor(EXTRACT(epoch FROM o.o_orderdate) / 86400) AS BIGINT)
                         - mn.d0 < 15 THEN 'A' ELSE 'B' END AS period,
               CAST(round(l.l_quantity, 0) AS BIGINT) AS qty,
               CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS r4
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        CROSS JOIN mn
    ),
    agg AS (
        SELECT segment,
               CAST(sum(CASE WHEN period = 'A' THEN qty ELSE 0 END) AS BIGINT) AS q_a,
               CAST(sum(CASE WHEN period = 'B' THEN qty ELSE 0 END) AS BIGINT) AS q_b,
               CAST(sum(CASE WHEN period = 'A' THEN r4 ELSE 0 END) AS BIGINT) AS r_a4,
               CAST(sum(CASE WHEN period = 'B' THEN r4 ELSE 0 END) AS BIGINT) AS r_b4
        FROM rows_ GROUP BY segment
    )
    SELECT segment, q_a, q_b, r_a4, r_b4,
           CAST((q_b - q_a) * (r_a4 // q_a) AS BIGINT) AS volume_effect4,
           CAST((r_b4 // q_b - r_a4 // q_a) * q_b AS BIGINT) AS price_effect4,
           CAST((r_b4 - r_a4)
                - (q_b - q_a) * (r_a4 // q_a)
                - (r_b4 // q_b - r_a4 // q_a) * q_b AS BIGINT) AS residual4
    FROM agg
    """,
    tags=("analytics", "finance", "variance-decomposition", "bridge"),
)
def revenue_bridge_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE-VOLUME REVENUE BRIDGE per market segment — the FP&A
    decomposition behind every 'why did revenue move' review: between
    period A (first 15 order days) and period B, the revenue delta
    splits into a VOLUME effect (quantity change at old unit price)
    and a PRICE effect (unit-price change at new volume), plus an
    explicit RESIDUAL so the bridge sums EXACTLY — unit prices are
    integer-division quantized (1e-4 dollars per unit), and an honest
    decomposition carries its quantization remainder instead of
    hiding it (the identity r_b - r_a = volume + price + residual
    holds bit-exactly in the hash).  All arithmetic is the exact
    integer revenue idiom (`join_star_revenue`'s cents x (100 -
    discount-cents) micro-units).  Plan: one 3-table join (orders
    broadcast-side joins customer), one hash agg, then arithmetic on
    #segments rows."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    day = F.floor(F.unix_seconds(F.col("o_orderdate")) / 86400).cast("long")
    mn = F.broadcast(o.agg(F.min(day).alias("d0")))
    rows_ = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .crossJoin(mn)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(day - F.col("d0") < 15, F.lit("A")).otherwise(F.lit("B")).alias("period"),
            F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
            (
                as_cents(F.col("l_extendedprice"))
                * (100 - as_cents(F.col("l_discount")))
            ).alias("r4"),
        )
    )
    agg = rows_.groupBy("segment").agg(
        F.sum(F.when(F.col("period") == "A", F.col("qty")).otherwise(0)).cast("long").alias("q_a"),
        F.sum(F.when(F.col("period") == "B", F.col("qty")).otherwise(0)).cast("long").alias("q_b"),
        F.sum(F.when(F.col("period") == "A", F.col("r4")).otherwise(0)).cast("long").alias("r_a4"),
        F.sum(F.when(F.col("period") == "B", F.col("r4")).otherwise(0)).cast("long").alias("r_b4"),
    )
    return agg.select(
        "segment",
        "q_a",
        "q_b",
        "r_a4",
        "r_b4",
        F.expr("(q_b - q_a) * (r_a4 div q_a)").cast("long").alias("volume_effect4"),
        F.expr("(r_b4 div q_b - r_a4 div q_a) * q_b").cast("long").alias("price_effect4"),
        F.expr(
            "(r_b4 - r_a4) - (q_b - q_a) * (r_a4 div q_a)"
            " - (r_b4 div q_b - r_a4 div q_a) * q_b"
        ).cast("long").alias("residual4"),
    )


# two-sided alpha=.05 / power=.80 normal quantiles, fixed literals in
# both engines (the closed-form power calculation's only constants)
_Z_ALPHA, _Z_BETA = 1.959963984540054, 0.8416212335729143


@register(
    "ab_power_mde",
    oracle=f"""
    WITH mn AS (
        SELECT min(CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT)) AS d0
        FROM events
    ),
    per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
               CAST(sum(CASE WHEN CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) - d0 < 15
                             THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) - d0 >= 15
                             THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        FROM events CROSS JOIN mn GROUP BY user_id
    ),
    mom AS (
        -- second-moment sums stay HUGEINT (no BIGINT cast): they cross
        -- 2^63 at the same scale the Spark side was decimal-hardened
        -- for, and they only feed CAST(... AS DOUBLE) arithmetic below
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM per_user
    ),
    theta AS (
        SELECT CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS th,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        FROM mom
    ),
    adj AS (
        SELECT arm, y,
               CAST(floor((y - th * (x - xbar)) * 100 + 0.5 + 1e-8) AS BIGINT) AS y2
        FROM per_user CROSS JOIN theta
    ),
    counts AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS sy, sum(y * y) AS syy,
               CAST(sum(y2) AS BIGINT) AS sy2, sum(y2 * y2) AS sy2y2
        FROM adj
    ),
    metric_variants AS (
        SELECT 'raw' AS metric, n_a, n_b,
               (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS var_cents2
        FROM counts
        UNION ALL
        SELECT 'cuped', n_a, n_b,
               (CAST(n AS DOUBLE) * sy2y2 - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) / 10000.0 AS var_cents2
        FROM counts
    )
    SELECT metric, n_a, n_b,
           ROUND(var_cents2 + 1e-8, 4) AS var_cents2,
           ROUND(({_Z_ALPHA!r} + {_Z_BETA!r})
                 * sqrt(var_cents2 * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) + 1e-8, 4) AS mde_cents
    FROM metric_variants
    """,
    tags=("analytics", "experimentation", "power-analysis"),
)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINIMUM DETECTABLE EFFECT for the A/B stack, before and after
    CUPED — the sizing arithmetic every experiment review starts with:
    MDE = (z_alpha/2 + z_beta) * sqrt(var * (1/n_A + 1/n_B)) at the
    standard 5%/80% operating point (z constants are fixed literals in
    both engines), evaluated on the raw per-user metric AND on the
    CUPED-adjusted one — making `ab_cuped_adjustment`'s variance
    reduction legible as the thing practitioners actually feel: a
    smaller detectable effect at the same traffic.  Variances come
    from exact integer moments with the op sequence spelled identically
    in both engines; the adjusted metric reuses the centi-cent
    quantization.  One per-user aggregate + a 1-row moment pipeline —
    nothing here is data-sized after the first pass."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    mn = F.broadcast(ev.agg(F.min(day).alias("d0")))
    cents = as_cents(F.col("value"))
    per_user = (
        ev.crossJoin(mn)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(day - F.col("d0") < 15, cents).otherwise(0)).cast("long").alias("x"),
            F.sum(F.when(day - F.col("d0") >= 15, cents).otherwise(0)).cast("long").alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    )
    # theta moments in DECIMAL(38,0): n*sxy / sx*sy sit within ~20x of
    # the int64 cliff at sf0.1 (ab_cuped_adjustment's final-agg
    # numerators crossed the same cliff — round-11 sweep find); exact
    # decimals move the ceiling to ~1e38, and the double cast of the
    # exact integer matches the oracle's int128 arithmetic bit-for-bit
    xdm, ydm = F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)")
    mom = F.broadcast(
        per_user.agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(xdm).alias("sx"),
            F.sum(ydm).alias("sy"),
            F.sum(xdm * xdm).alias("sxx"),
            F.sum(xdm * ydm).alias("sxy"),
        ).select(
            F.expr(
                "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"
            ).alias("th"),
            F.expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").alias("xbar"),
        )
    )
    adj = per_user.crossJoin(mom).select(
        "arm",
        "y",
        F.expr("CAST(floor((y - th * (x - xbar)) * 100 + 0.5 + 1e-8) AS BIGINT)").alias("y2"),
    )
    # second moments in DECIMAL(38,0): per-row y2*y2 alone approaches
    # int64 at sf0.1 and the sums cross it well before 10x (same cliff
    # as ab_cuped_adjustment — round-11 sweep find); the double
    # conversions below are value-identical on the exact integers
    yda = F.col("y").cast("decimal(38,0)")
    y2da = F.col("y2").cast("decimal(38,0)")
    counts = adj.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(yda * yda).alias("syy"),
        F.sum("y2").cast("long").alias("sy2"),
        F.sum(y2da * y2da).alias("sy2y2"),
    )
    raw = counts.select(
        F.lit("raw").alias("metric"),
        "n_a",
        "n_b",
        F.expr(
            "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))"
        ).alias("var_cents2"),
    )
    cuped = counts.select(
        F.lit("cuped").alias("metric"),
        "n_a",
        "n_b",
        F.expr(
            "(CAST(n AS DOUBLE) * sy2y2 - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) / 10000.0"
        ).alias("var_cents2"),
    )
    both = raw.unionByName(cuped)
    return both.select(
        "metric",
        "n_a",
        "n_b",
        round_det(F.col("var_cents2"), 4).alias("var_cents2"),
        round_det(
            (F.lit(_Z_ALPHA) + F.lit(_Z_BETA))
            * F.sqrt(F.col("var_cents2") * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))),
            4,
        ).alias("mde_cents"),
    )


@register(
    "cluster_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
        SELECT b.b,
               CAST(round(e.value * 100, 0) AS BIGINT) AS cents,
               {_pois1_case("((e.user_id * 2654435761 + b.b * 40503) % 4294967296) / 4294967296.0")} AS w
        FROM events e, (SELECT unnest(generate_series(0, 31)) AS b) b
    ),
    means AS (
        SELECT b, sum(w * cents) AS wsum, sum(w) AS n
        FROM reps GROUP BY b HAVING sum(w) > 0
    ),
    stats AS (
        SELECT ROUND(wsum / (100.0 * n) + 1e-8, 4) AS m FROM means
    )
    SELECT CAST(count(*) AS BIGINT) AS n_replicates,
           ROUND(avg(m) + 1e-8, 4) AS boot_mean,
           ROUND(quantile_cont(m, 0.025) + 1e-8, 4) AS ci_lo,
           ROUND(quantile_cont(m, 0.975) + 1e-8, 4) AS ci_hi
    FROM stats
    """,
    tags=("analytics", "bootstrap", "cluster-resampling", "confidence-interval"),
)
def cluster_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER (user-level) bootstrap CI for the mean event value — the
    statistically-correct resampling when observations are CORRELATED
    within users: `poisson_bootstrap_ci` resamples ROWS independently,
    which understates variance whenever a user's events co-move (the
    classic A/B pitfall; Bakshy & Eckles 2013); here the Poisson(1)
    weight is drawn per (USER, replicate) — hash-derived from user_id,
    so every event of a user shares its replicate weight and whole
    clusters enter or leave a resample together.  Same one-scan x32
    fan-out plan as the row bootstrap (the only change is WHICH id
    seeds the hash — the cost profile is identical), exact integer
    cents, exact percentile over the 32-replicate frame.  Run next to
    `poisson_bootstrap_ci` the widened interval IS the
    intra-user-correlation diagnostic."""
    e = _t(spark, sf_dir, "events").select("user_id", "value")
    reps = e.crossJoin(F.broadcast(spark.range(32).select(F.col("id").alias("b"))))
    w = F.expr(
        _pois1_case("((user_id * 2654435761 + b * 40503) % 4294967296) / 4294967296.0")
    )
    means = (
        reps.select("b", as_cents(F.col("value")).alias("cents"), w.alias("w"))
        .groupBy("b")
        .agg(F.sum(F.col("w") * F.col("cents")).alias("wsum"), F.sum("w").alias("n"))
        .filter(F.col("n") > 0)
        .select(round_det(F.col("wsum") / (100.0 * F.col("n")), 4).alias("m"))
    )
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        round_det(F.avg("m"), 4).alias("boot_mean"),
        # one buffer for both CI bounds (round-12: see aggregates.describe)
        round_det(F.element_at(F.expr("percentile(m, array(0.025, 0.975))"), 1), 4).alias("ci_lo"),
        round_det(F.element_at(F.expr("percentile(m, array(0.025, 0.975))"), 2), 4).alias("ci_hi"),
    )


@register(
    "robust_stl_decomposition",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) AS d,
               CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 1000000) // count(*)
                    AS BIGINT) AS m6
        FROM events GROUP BY 1, 2
    ),
    mn AS (SELECT min(d) AS d0 FROM daily),
    idx AS (
        SELECT event_type, d - d0 AS i, (d + 3) % 7 + 1 AS iso_dow, m6
        FROM daily CROSS JOIN mn
    ),
    slopes AS (
        SELECT event_type, slope_nano FROM (
            SELECT a.event_type,
                   CAST(floor(((b.m6 - a.m6) / CAST(b.i - a.i AS DOUBLE)) * 1000
                              + 0.5 + 1e-8) AS BIGINT) AS slope_nano,
                   row_number() OVER (PARTITION BY a.event_type
                                      ORDER BY floor(((b.m6 - a.m6) / CAST(b.i - a.i AS DOUBLE))
                                                     * 1000 + 0.5 + 1e-8),
                                               a.i, b.i) AS rn,
                   count(*) OVER (PARTITION BY a.event_type) AS n
            FROM idx a JOIN idx b ON a.event_type = b.event_type AND a.i < b.i
        ) WHERE rn = (n + 1) // 2
    ),
    detrended AS (
        SELECT i.event_type, i.iso_dow,
               i.m6 - (s.slope_nano * i.i) // 1000 AS r
        FROM idx i JOIN slopes s ON s.event_type = i.event_type
    ),
    seasonal AS (
        SELECT event_type, iso_dow, r AS seasonal_med, n AS n_days FROM (
            SELECT event_type, iso_dow, r,
                   row_number() OVER (PARTITION BY event_type, iso_dow ORDER BY r) AS rn,
                   count(*) OVER (PARTITION BY event_type, iso_dow) AS n
            FROM detrended
        ) WHERE rn = (n + 1) // 2
    ),
    resid AS (
        SELECT d.event_type, d.iso_dow, abs(d.r - s.seasonal_med) AS ae
        FROM detrended d
        JOIN seasonal s ON s.event_type = d.event_type AND s.iso_dow = d.iso_dow
    ),
    mad AS (
        SELECT event_type, iso_dow, ae AS resid_mad FROM (
            SELECT event_type, iso_dow, ae,
                   row_number() OVER (PARTITION BY event_type, iso_dow ORDER BY ae) AS rn,
                   count(*) OVER (PARTITION BY event_type, iso_dow) AS n
            FROM resid
        ) WHERE rn = (n + 1) // 2
    )
    SELECT s.event_type, CAST(s.iso_dow AS INT) AS iso_dow,
           sl.slope_nano,
           CAST(s.seasonal_med AS BIGINT) AS seasonal_med,
           CAST(s.n_days AS BIGINT) AS n_days,
           CAST(m.resid_mad AS BIGINT) AS resid_mad
    FROM seasonal s
    JOIN slopes sl ON sl.event_type = s.event_type
    JOIN mad m ON m.event_type = s.event_type AND m.iso_dow = s.iso_dow
    """,
    tags=("analytics", "robust", "decomposition", "seasonality"),
)
def robust_stl_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST trend/seasonal/residual decomposition (STL's shape with
    rank statistics instead of loess): per event type, (1) the TREND is
    the Theil-Sen lower-median slope over the daily series, (2) the
    SEASONAL component is the lower-median of the detrended values per
    ISO weekday — medians, not means, so one wild day cannot print a
    fake seasonality — and (3) the RESIDUAL scale is the per-weekday
    MAD of what remains, the robust sigma a seasonal anomaly detector
    thresholds on (`seasonal_anomaly_census` is the mean/stddev
    cousin; this is the outlier-resistant production variant).  Every
    component is integer-exact: daily means by integer division, slopes
    quantized to nano-units with the lower-median rank rule, detrending
    by integer slope*day div, weekday medians and MADs as order
    statistics.  Everything after the daily aggregate is
    calendar-bounded (30 days x 5 types); the day grain itself is the
    usual one map-side-combinable pass."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("d"),
        )
        .agg(
            F.expr(
                "CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 1000000)"
                " div count(*) AS BIGINT)"
            ).alias("m6")
        )
    )
    mn = F.broadcast(daily.agg(F.min("d").alias("d0")))
    idx = daily.crossJoin(mn).select(
        "event_type",
        (F.col("d") - F.col("d0")).alias("i"),
        ((F.col("d") + 3) % 7 + 1).alias("iso_dow"),
        "m6",
    )
    a = idx.select("event_type", F.col("i").alias("i1"), F.col("m6").alias("m1"))
    b = idx.select("event_type", F.col("i").alias("i2"), F.col("m6").alias("m2"))
    slope_nano = F.floor(
        ((F.col("m2") - F.col("m1")) / (F.col("i2") - F.col("i1")).cast("double")) * 1000
        + F.lit(0.5 + 1e-8)
    ).cast("long")
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("i1") < F.col("i2"))
        .select("event_type", slope_nano.alias("slope_nano"), "i1", "i2")
    )
    wsl = Window.partitionBy("event_type").orderBy("slope_nano", "i1", "i2")
    wsc = Window.partitionBy("event_type")
    slopes = (
        pairs.withColumn("rn", F.row_number().over(wsl))
        .withColumn("n", F.count(F.lit(1)).over(wsc))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", "slope_nano")
    )
    detrended = idx.join(F.broadcast(slopes), "event_type").select(
        "event_type",
        "iso_dow",
        (F.col("m6") - F.expr("(slope_nano * i) div 1000")).alias("r"),
    )
    wm = Window.partitionBy("event_type", "iso_dow").orderBy("r")
    wc = Window.partitionBy("event_type", "iso_dow")
    seasonal = (
        detrended.withColumn("rn", F.row_number().over(wm))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(
            "event_type",
            "iso_dow",
            F.col("r").alias("seasonal_med"),
            F.col("n").alias("n_days"),
        )
    )
    resid = detrended.join(seasonal, ["event_type", "iso_dow"]).select(
        "event_type", "iso_dow", F.abs(F.col("r") - F.col("seasonal_med")).alias("ae")
    )
    wr = Window.partitionBy("event_type", "iso_dow").orderBy("ae")
    mad = (
        resid.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type", "iso_dow")))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", "iso_dow", F.col("ae").alias("resid_mad"))
    )
    return (
        seasonal.join(F.broadcast(slopes), "event_type")
        .join(mad, ["event_type", "iso_dow"])
        .select(
            "event_type",
            F.col("iso_dow").cast("int").alias("iso_dow"),
            "slope_nano",
            F.col("seasonal_med").cast("long").alias("seasonal_med"),
            F.col("n_days").cast("long").alias("n_days"),
            F.col("resid_mad").cast("long").alias("resid_mad"),
        )
    )


# O'Brien-Fleming-style monitoring boundary constant (two-sided ~5%
# overall at daily looks): z-boundary(k) = C * sqrt(K / k).  Fixed
# literal in both engines — the monitoring RULE is the operator under
# test, not the constant's derivation.
_OBF_C, _OBF_K = 2.04, 30


@register(
    "ab_sequential_monitoring",
    oracle=f"""
    WITH mn AS (
        SELECT min(CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT)) AS d0
        FROM events
    ),
    firstp AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
               min(CASE WHEN event_type = 'purchase'
                        THEN CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) - d0 + 1
                   END) AS fd
        FROM events CROSS JOIN mn GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM firstp
    ),
    looks AS (SELECT unnest(generate_series(1, {_OBF_K})) AS k),
    cum AS (
        SELECT k,
               CAST(count(CASE WHEN arm = 0 AND fd <= k THEN 1 END) AS BIGINT) AS c_a,
               CAST(count(CASE WHEN arm = 1 AND fd <= k THEN 1 END) AS BIGINT) AS c_b
        FROM looks LEFT JOIN firstp ON TRUE
        GROUP BY k
    ),
    z AS (
        SELECT k, c_a, c_b,
               CAST(floor(
                   (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                   / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                          * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                          * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
                   * 1000 + 0.5 + 1e-8) AS BIGINT) AS z_milli,
               CAST(floor({_OBF_C} * sqrt(CAST({_OBF_K} AS DOUBLE) / k) * 1000
                          + 0.5 + 1e-8) AS BIGINT) AS bound_milli
        FROM cum CROSS JOIN arms
        WHERE c_a + c_b > 0 AND c_a + c_b < n_a + n_b
    )
    SELECT CAST(k AS INT) AS k, c_a, c_b, z_milli, bound_milli,
           (abs(z_milli) >= bound_milli) AS crossed
    FROM z
    """,
    tags=("analytics", "experimentation", "sequential-testing"),
)
def ab_sequential_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-SEQUENTIAL A/B MONITORING — the daily-peeking discipline
    that makes 'check the experiment every morning' statistically
    legal: at each look k the cumulative conversion z-statistic
    compares against an O'Brien-Fleming-style boundary C*sqrt(K/k)
    (very strict early, nominal at the horizon), so early stops don't
    inflate the false-positive rate the way naive repeated z-tests do
    (Pocock/OBF, the machinery inside every experimentation platform's
    'sequential' mode; `ab_conversion_ztest` is the single-look
    cousin).  Conversion = first purchase by day k, per user; all
    counts are exact integers, the z and the boundary quantize to
    milli-units from identically-derived doubles, and degenerate looks
    (no or all conversions — sd undefined) are excluded by the same
    guard in both engines.  Plan: one per-user first-purchase
    aggregate; the 30-look expansion joins a literal day frame to a
    users-sized frame — look-count x users, bounded by the calendar,
    then collapses immediately."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    mn = F.broadcast(ev.agg(F.min(day).alias("d0")))
    firstp = (
        ev.crossJoin(mn)
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "purchase", day - F.col("d0") + 1)
            ).alias("fd")
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    )
    arms = F.broadcast(
        firstp.agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        )
    )
    looks = F.broadcast(
        ev.sparkSession.range(1, _OBF_K + 1).select(F.col("id").alias("k"))
    )
    cum = (
        looks.crossJoin(firstp)
        .groupBy("k")
        .agg(
            F.count(
                F.when((F.col("arm") == 0) & (F.col("fd") <= F.col("k")), 1)
            ).cast("long").alias("c_a"),
            F.count(
                F.when((F.col("arm") == 1) & (F.col("fd") <= F.col("k")), 1)
            ).cast("long").alias("c_b"),
        )
    )
    z = (
        cum.crossJoin(arms)
        .filter((F.col("c_a") + F.col("c_b") > 0) & (F.col("c_a") + F.col("c_b") < F.col("n_a") + F.col("n_b")))
        .select(
            "k",
            "c_a",
            "c_b",
            F.expr(
                "CAST(floor((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)"
                " / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))"
                "        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))"
                "        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))"
                " * 1000 + 0.5 + 1e-8) AS BIGINT)"
            ).alias("z_milli"),
            F.expr(
                f"CAST(floor({_OBF_C} * sqrt(CAST({_OBF_K} AS DOUBLE) / k) * 1000"
                " + 0.5 + 1e-8) AS BIGINT)"
            ).alias("bound_milli"),
        )
    )
    return z.select(
        F.col("k").cast("int").alias("k"),
        "c_a",
        "c_b",
        "z_milli",
        "bound_milli",
        (F.abs(F.col("z_milli")) >= F.col("bound_milli")).alias("crossed"),
    )


@register(
    "croston_intermittent_demand",
    oracle="""
    WITH daily AS (
        SELECT l_partkey AS part,
               CAST(floor(EXTRACT(epoch FROM l_shipdate) / 86400) AS BIGINT) AS day,
               CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS size_cents
        FROM lineitem GROUP BY 1, 2
    ),
    gaps AS (
        SELECT part, day, size_cents,
               day - lag(day) OVER (PARTITION BY part ORDER BY day) AS gap
        FROM daily
    ),
    arrs AS (
        SELECT part,
               CAST(count(*) AS BIGINT) AS n_demand_days,
               CAST(array_agg(size_cents ORDER BY day) AS DOUBLE[]) AS sizes,
               CAST(array_agg(gap ORDER BY day) FILTER (WHERE gap IS NOT NULL) AS DOUBLE[]) AS gaps
        FROM gaps GROUP BY part
    ),
    fold AS (
        SELECT part, n_demand_days,
               list_reduce(sizes, (acc, x) -> 0.1 * x + 0.9 * acc) AS z,
               list_reduce(gaps,  (acc, x) -> 0.1 * x + 0.9 * acc) AS p
        FROM arrs WHERE n_demand_days >= 8
    )
    SELECT part, n_demand_days,
           ROUND(z / 100.0 + 1e-8, 4) AS size_ewma,
           ROUND(p + 1e-8, 4) AS interval_ewma,
           ROUND(z / (100.0 * p) + 1e-8, 6) AS demand_per_day
    FROM fold ORDER BY part
    """,
    tags=("analytics", "forecast", "croston", "intermittent-demand", "recurrence"),
)
def croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSTON'S METHOD for intermittent demand — the forecasting model
    for series that are MOSTLY ZERO (spare parts, long-tail SKUs),
    where Holt/naive smoothers (`holt_forecast_per_user`,
    `backtest_rolling_origin`) collapse toward zero between demands:
    smooth the nonzero demand SIZES and the INTER-DEMAND INTERVALS as
    two separate EWMAs (alpha=0.1) and forecast size/interval demand
    per day (Croston 1972, public).  Exactness: daily sizes are exact
    cents and gaps exact integer days; each per-part recurrence is the
    same IEEE left-fold in both engines (the `ewma_batch_per_user`
    list-fold discipline), seeded by the first element, so the
    order-sensitive float recurrences hash.  Plan: one day-grain agg,
    a part-partitioned lag for gaps, one part-keyed collect — per-part
    arrays are demand-day-bounded (calendar-bounded at any row
    volume).  Parts with < 8 demand days are excluded (too sparse to
    seed both folds meaningfully) by both engines."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.floor(F.unix_seconds(F.col("l_shipdate")) / F.lit(86400)).cast("long").alias("day"),
    ).agg(F.sum(as_cents(F.col("l_quantity"))).alias("size_cents"))
    w = Window.partitionBy("part").orderBy("day")
    gaps = daily.withColumn("gap", F.col("day") - F.lag("day").over(w))
    arrs = gaps.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_demand_days"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "size_cents"))),
            lambda s: s.getField("size_cents").cast("double"),
        ).alias("sizes"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("gap").isNotNull(), F.struct("day", "gap"))
                )
            ),
            lambda s: s.getField("gap").cast("double"),
        ).alias("gaps"),
    )

    def fold(arr):
        return F.aggregate(
            F.slice(arr, 2, F.size(arr)),
            F.element_at(arr, 1),
            lambda acc, x: F.lit(0.1) * x + F.lit(0.9) * acc,
        )

    out = (
        arrs.where(F.col("n_demand_days") >= 8)
        .select(
            "part",
            F.col("n_demand_days").cast("long").alias("n_demand_days"),
            fold(F.col("sizes")).alias("z"),
            fold(F.col("gaps")).alias("p"),
        )
    )
    return out.select(
        "part",
        "n_demand_days",
        round_det(F.col("z") / 100.0, 4).alias("size_ewma"),
        round_det(F.col("p"), 4).alias("interval_ewma"),
        round_det(F.col("z") / (100.0 * F.col("p")), 6).alias("demand_per_day"),
    ).orderBy("part")


# Abramowitz & Stegun 26.2.17 upper-tail normal approximation, written
# ONCE and formatted into both dialects so the IEEE op sequence is
# identical (the engines share literal constants, not a library call —
# neither ships a portable normal CDF).
_AS_TAIL = (
    "(exp(-({x}) * ({x}) / 2.0) / 2.5066282746310002 * "
    "((1.0 / (1.0 + 0.2316419 * ({x}))) * (0.319381530 + (1.0 / (1.0 + 0.2316419 * ({x}))) * "
    "(-0.356563782 + (1.0 / (1.0 + 0.2316419 * ({x}))) * (1.781477937 + "
    "(1.0 / (1.0 + 0.2316419 * ({x}))) * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * ({x}))) "
    "* 1.330274429))))))"
)


@register(
    "fdr_bh_correction",
    oracle=f"""
    WITH cells AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
                        * CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS q
        FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
                   CAST(count(*) AS BIGINT) AS m
            FROM cells),
    z AS (
        SELECT event_type, n,
               ((s / (1.0 * n)) - (ss / (1.0 * nn)))
               / sqrt(((q - (CAST(s AS DOUBLE) * s) / n) / (n - 1)) / n) AS zval,
               m
        FROM cells CROSS JOIN tot
    ),
    p AS (
        SELECT event_type, n, m,
               CAST(floor(zval * 1000 + 0.5 + 1e-8) AS BIGINT) AS z_milli,
               CAST(floor(2.0 * {_AS_TAIL.format(x="abs(zval)")} * 1000000 + 0.5 + 1e-8)
                   AS BIGINT) AS p_micro
        FROM z
    ),
    ranked AS (
        SELECT event_type, n, m, z_milli, p_micro,
               row_number() OVER (ORDER BY p_micro, event_type) AS rank
        FROM p
    ),
    cut AS (
        SELECT coalesce(max(rank) FILTER (WHERE p_micro * m * 10 <= 1000000 * rank), 0) AS kmax
        FROM ranked
    )
    SELECT event_type, n, z_milli, p_micro, CAST(rank AS BIGINT) AS rank,
           rank <= cut.kmax AS bh_rejected
    FROM ranked CROSS JOIN cut
    ORDER BY rank
    """,
    tags=("analytics", "multiple-testing", "fdr", "benjamini-hochberg", "global-row-number"),
)
def fdr_bh_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG false-discovery-rate control (q=0.1) over the
    per-type "mean value differs from the corpus mean" hypothesis
    family — the multiple-testing step every experimentation platform
    runs BETWEEN raw tests (`ab_conversion_ztest`) and decisions:
    testing m hypotheses at alpha each inflates false positives; BH's
    step-up rule (reject all ranks <= max{{i: p_(i) <= q*i/m}}) bounds
    the EXPECTED false-discovery share instead.  Cross-engine p-values
    are the hard part: neither engine ships a portable normal CDF, so
    the Abramowitz-Stegun 26.2.17 tail approximation is formatted into
    both dialects as ONE expression (shared literals, identical IEEE op
    sequence), fed by z-scores from exact integer moments, and
    micro-quantized BEFORE ranking — so ranks, the step-up comparison
    (p6*m*10 <= 1e6*rank, all int64), and the rejection set are exact
    integer decisions in both engines.  Plan: one scan -> per-type
    moments; everything after is m-row arithmetic (ranks ride
    `global_row_number`)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import (
        global_row_number,
    )

    e = _t(spark, sf_dir, "events").select("event_type", as_cents(F.col("value")).alias("vc"))
    cells = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
        F.sum(F.col("vc").cast("decimal(38,0)") * F.col("vc").cast("decimal(38,0)")).alias("q"),
    )
    tot = F.broadcast(
        cells.agg(F.sum("n").alias("nn"), F.sum("s").alias("ss"), F.count(F.lit(1)).alias("m"))
    )
    zval = (
        (F.col("s") / (1.0 * F.col("n"))) - (F.col("ss") / (1.0 * F.col("nn")))
    ) / F.sqrt(
        ((F.col("q") - (F.col("s").cast("double") * F.col("s")) / F.col("n")) / (F.col("n") - 1))
        / F.col("n")
    )
    z = cells.crossJoin(tot).select("event_type", "n", "m", zval.alias("zval"))
    p = z.select(
        "event_type",
        "n",
        "m",
        F.floor(F.col("zval") * 1000 + F.lit(0.5 + 1e-8)).cast("long").alias("z_milli"),
        F.floor(
            2.0 * F.expr(_AS_TAIL.format(x="abs(zval)")) * 1000000 + F.lit(0.5 + 1e-8)
        )
        .cast("long")
        .alias("p_micro"),
    )
    ranked = global_row_number(p, [F.col("p_micro"), F.col("event_type")], out="rank")
    cut = F.broadcast(
        ranked.agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("p_micro") * F.col("m") * 10 <= 1000000 * F.col("rank"),
                        F.col("rank"),
                    )
                ),
                F.lit(0),
            ).alias("kmax")
        )
    )
    return (
        ranked.crossJoin(cut)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "z_milli",
            "p_micro",
            F.col("rank").cast("long").alias("rank"),
            (F.col("rank") <= F.col("kmax")).alias("bh_rejected"),
        )
        .orderBy("rank")
    )
