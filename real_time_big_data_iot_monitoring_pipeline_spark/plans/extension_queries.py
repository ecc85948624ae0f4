"""Coverage-extension catalog: remaining SURVEY §2 scalar surface
(compound predicates, clip, date formatting, schema'd JSON) plus engine
completeness beyond the reference (ranking windows, term frequencies,
n-gram counts, more TPC-H join shapes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    sum_product_exact,
    avg_fixed,
    avg_fixed_sql,
    clip,
    round_det,
    utc_naive,
    utc_ts,
)
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

_K_SQL = "CAST(json_extract_string(props, '$.k') AS DOUBLE)"


@register(
    "filter_compound_bool",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, value, {_K_SQL} AS k FROM events)
    SELECT event_id, user_id, value, k
    FROM e
    WHERE (value < 5.0 OR value > 400.0) AND k >= 20.0 AND k <= 90.0
    """,
    tags=("reference", "P7"),
)
def filter_compound_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicate (reference anomaly flag OR-chains,
    streamlit_dashboard.py:203-205): (out-of-band value) AND k-range."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("double")
    )
    return e.filter(
        ((F.col("value") < 5.0) | (F.col("value") > 400.0))
        & (F.col("k") >= 20.0)
        & (F.col("k") <= 90.0)
    ).select("event_id", "user_id", "value", "k")


@register(
    "clip_values",
    oracle="""
    SELECT least(greatest(value, 50.0), 150.0) AS clipped, count(*) AS cnt
    FROM events GROUP BY 1
    """,
    tags=("reference", "F13"),
)
def clip_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.clip equivalent (reference app.py:94,100) as least/greatest,
    grouped to exercise the expression under aggregation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(clip(F.col("value"), 50.0, 150.0).alias("clipped"))
        .groupBy("clipped")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "date_format_display",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate, count(*) AS cnt
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2000-03-01'
    GROUP BY 1
    """,
    tags=("reference", "F3", "F4"),
)
def date_format_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Display timestamp formatting (reference
    streamlit_dashboard.py:483-528 strftime).  The instant bounds push
    into the parquet scan; rendering goes through `utc_naive` so the
    emitted strings are the UTC reading of each instant under ANY
    session timezone — matching DuckDB strftime exactly."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= utc_ts("2000-01-01 00:00:00"))
            & (F.col("o_orderdate") < utc_ts("2000-03-01 00:00:00"))
        )
        .groupBy(
            F.date_format(utc_naive("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("odate")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "props_struct_extract",
    oracle=f"""
    SELECT count({_K_SQL}) AS n_k,
           CAST(min({_K_SQL}) AS BIGINT) AS min_k,
           CAST(max({_K_SQL}) AS BIGINT) AS max_k,
           count(*) AS n_rows
    FROM events
    """,
    tags=("reference", "F12", "multimodal"),
)
def props_struct_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd JSON decode (`from_json` with an explicit StructType —
    the engine's open-schema path for typed metadata on multimodal
    columns), then struct-field aggregation."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("k", T.DoubleType())])
    e = load_table(spark, sf_dir, "events").withColumn(
        "p", F.from_json("props", schema)
    )
    return e.agg(
        F.count("p.k").alias("n_k"),
        F.min("p.k").cast("long").alias("min_k"),
        F.max("p.k").cast("long").alias("max_k"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "rank_events_per_user",
    oracle="""
    SELECT event_id, user_id, rnk, drnk FROM (
        SELECT event_id, user_id,
               rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk,
               dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS drnk
        FROM events
    ) WHERE rnk <= 3
    """,
    tags=("extension", "window", "ranking"),
)
def rank_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions (absent from the reference; part of a
    complete analytic surface): top-3 values per user by rank, with
    dense_rank alongside, unique tie-break on event_id."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.select(
            "event_id",
            "user_id",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "term_frequency",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT word, count(*) AS freq FROM words
    WHERE length(word) > 0
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 20
    """,
    tags=("northstar", "text"),
)
def term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies, top-20: explode is a generator (no
    shuffle), the count is partial-aggregated, and the top-k compiles to
    TakeOrderedAndProject — the canonical word-count at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(20)
    )


@register(
    "bigram_counts",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    idx AS (
        SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM w WHERE len(ws) >= 2
    ),
    bg AS (SELECT ws[i] || ' ' || ws[i + 1] AS bigram FROM idx)
    SELECT bigram, count(*) AS freq FROM bg
    GROUP BY bigram
    ORDER BY freq DESC, bigram
    LIMIT 20
    """,
    tags=("northstar", "text", "ngram"),
)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram frequencies, top-20 — n-gram generation as a codegen'd
    array transform, counted with partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.expr("transform(sequence(0, size(ws) - 2), i -> concat_ws(' ', ws[i], ws[i + 1]))")
    return (
        docs.select(toks.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram"))
        .limit(20)
    )


@register(
    "revenue_filter_agg",
    oracle="""
    SELECT ROUND(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * CAST(round(l_discount * 100, 0) AS BIGINT)) / 10000.0 + 1e-8, 2) AS promo_revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("joins", "tpch-q6"),
)
def revenue_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate with three pushable
    predicates — the query whose entire cost is scan selectivity, i.e.
    the purest test that pushdown/pruning works."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= utc_ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < utc_ts("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round_det(
                sum_product_exact(
                    as_cents(F.col("l_extendedprice")) * as_cents(F.col("l_discount"))
                )
                / 10000.0,
                2
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "unshipped_orders_topk",
    oracle="""
    SELECT o.o_orderkey,
           ROUND(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 + 1e-8, 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS odate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("joins", "tpch-q3"),
)
def unshipped_orders_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer dim broadcast into the
    orders⋈lineitem shuffle, grouped revenue, rounded-then-ranked top-10
    (rounding before ordering keeps ranks ulp-stable across engines)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < utc_ts("1998-01-01 00:00:00")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > utc_ts("1998-01-01 00:00:00")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            round_det(
                sum_product_exact(
                    as_cents(F.col("l_extendedprice"))
                    * (100 - as_cents(F.col("l_discount")))
                ) / 10000.0,
                2,
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format(utc_naive("o_orderdate"), "yyyy-MM-dd").alias("odate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "avg_order_by_priority",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {avg_fixed_sql('o_totalprice')} AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("joins", "A2"),
)
def avg_order_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-band aggregation over orders (wider categorical
    group-by surface on the star schema)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        avg_fixed(F.col("o_totalprice")).alias("avg_price"),
    )


@register(
    "grouped_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY value) + 1e-8, 4) AS q1,
           ROUND(percentile_cont(0.5)  WITHIN GROUP (ORDER BY value) + 1e-8, 4) AS median_v,
           ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY value) + 1e-8, 4) AS q3,
           ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value) + 1e-8, 4) AS p95
    FROM events GROUP BY event_type
    """,
    tags=("reference", "A11", "grouped"),
)
def grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact quantiles (the grouped form of the reference's
    quantile usage): exact `percentile` sorts within each hash-agg
    group — per-group cost, no global sort."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        # one buffer for all four quantiles (round-12: see aggregates.describe)
        round_det(F.element_at(F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.95))"), 1), 4).alias("q1"),
        round_det(F.element_at(F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.95))"), 2), 4).alias("median_v"),
        round_det(F.element_at(F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.95))"), 3), 4).alias("q3"),
        round_det(F.element_at(F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.95))"), 4), 4).alias("p95"),
    )


@register(
    "returned_items_report",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 + 1e-8, 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01' AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("joins", "tpch-q10"),
)
def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.
    Returnflag filter pushes into the lineitem scan; customer/nation
    broadcast; one revenue shuffle on custkey; rounded-then-ranked."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= utc_ts("1998-01-01 00:00:00"))
        & (F.col("o_orderdate") < utc_ts("1999-01-01 00:00:00"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select("c_custkey", "c_name", "n_name")
    )
    return (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(dim, F.col("o_custkey") == dim.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            round_det(
                sum_product_exact(
                    as_cents(F.col("l_extendedprice"))
                    * (100 - as_cents(F.col("l_discount")))
                ) / 10000.0,
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "big_orders_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, o.o_orderkey,
           ROUND(sum(l.l_quantity) + 1e-8, 2) AS total_qty,
           ROUND(CAST(round(max(o.o_totalprice) * 100, 0) AS BIGINT) / 100.0 + 1e-8, 2) AS order_price
    FROM orders o
    JOIN big ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, o.o_orderkey
    """,
    tags=("joins", "tpch-q18"),
)
def big_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold —
    aggregate-then-semi-join-then-reaggregate.  The HAVING subquery is a
    first aggregation whose (small) result broadcasts back against
    lineitem, so the big table is scanned twice but never shuffled for
    the join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("tq")).filter(F.col("tq") > 150).select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big), "l_orderkey")
        .join(o.select("o_orderkey", "o_custkey", "o_totalprice"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(
            round_det(F.sum("l_quantity"), 2).alias("total_qty"),
            round_det(as_cents(F.max("o_totalprice")) / 100.0, 2).alias("order_price"),
        )
    )


@register(
    "volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 + 1e-8, 2) AS volume
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
    tags=("joins", "tpch-q7"),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume by year — the same
    dimension table (nation) joined twice under different roles, plus an
    inequality predicate between the two join results."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    sup = F.broadcast(s.join(F.broadcast(sn), s.s_nationkey == F.col("sk")).select("s_suppkey", "supp_nation"))
    cus = F.broadcast(c.join(F.broadcast(cn), c.c_nationkey == F.col("ck")).select("c_custkey", "cust_nation"))
    return (
        l.join(o.select("o_orderkey", "o_custkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .join(sup, l.l_suppkey == sup.s_suppkey)
        .join(cus, F.col("o_custkey") == cus.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            # year() of the UTC reading — session-tz-proof field extract
            F.year(utc_naive("o_orderdate")).cast("long").alias("o_year"),
        )
        .agg(
            round_det(
                sum_product_exact(
                    as_cents(F.col("l_extendedprice"))
                    * (100 - as_cents(F.col("l_discount")))
                ) / 10000.0,
                2,
            ).alias("volume")
        )
    )


@register(
    "late_supplier_blame",
    oracle="""
    WITH lo AS (
        SELECT l.l_orderkey, l.l_suppkey,
               (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    po AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
        FROM lo GROUP BY 1
    ),
    blame AS (
        SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
        FROM lo JOIN po USING (l_orderkey)
        WHERE lo.late AND po.n_supp >= 2 AND po.n_late_supp = 1
    )
    SELECT s.s_name, CAST(count(DISTINCT b.l_orderkey) AS BIGINT) AS numwait
    FROM blame b JOIN supplier s ON b.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 20
    """,
    tags=("extension", "tpch", "anti-join", "decorrelated"),
)
def late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape (suppliers who kept waiting orders) adapted to
    the fixture schema: the SOLE late shipper (l_shipdate more than 60
    days after o_orderdate) on finished multi-supplier orders.  The
    classic formulation is a correlated EXISTS + NOT EXISTS pair; here
    both are DECORRELATED into one per-order aggregate (distinct
    suppliers / distinct late suppliers) joined back to the late rows —
    Spark-first, because a correlated form would probe lineitem once per
    quantifier while this is two scans of one cached shape.  Plan
    (verified with explain("formatted")): orders and supplier broadcast
    (the fact table never shuffles for any join), each branch shuffles
    on l_orderkey only for its aggregate, and the final s_name rollup is
    a TakeOrderedAndProject top-k, never a global sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    blame = (
        lo.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blame.join(F.broadcast(supplier), blame.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
    tags=("semi-structured", "variant", "spark4-surface"),
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type — the modern
    path for JSON columns (`json_props_stats` / `props_struct_extract`
    cover the classic get_json_object / from_json routes): `parse_json`
    builds the binary variant ONCE per row, `try_variant_get` extracts
    typed fields with null-on-mismatch semantics, and downstream
    aggregation runs on the decoded value.  At 100 TB variant's binary
    encoding beats repeated string re-parsing when several fields are
    extracted from one payload (one parse, many shredded gets) — the
    same reason warehouses added a VARIANT/JSONB type.  DuckDB oracle
    uses its native json_extract; both engines see the identical typed
    integers."""
    e = load_table(spark, sf_dir, "events").select("event_type", "props")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "long")
    return (
        v.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("k_total"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
    )


@register(
    "props_variant_shredded",
    oracle="""
    WITH j AS (
        SELECT event_type,
               CASE
                 WHEN event_id % 3 = 0 THEN
                   '{"meta":{"tag":"' || event_type || '","v":'
                     || CAST(user_id % 100 AS VARCHAR) || '},"k":'
                     || CAST(user_id % 10 AS VARCHAR) || '}'
                 WHEN event_id % 3 = 1 THEN
                   '{"arr":[' || CAST(user_id AS VARCHAR) || ','
                     || CAST(user_id % 7 AS VARCHAR) || ']}'
                 ELSE '{"k":' || CAST(user_id % 10 AS VARCHAR) || '}'
               END AS payload
        FROM events
    ),
    x AS (
        SELECT event_type,
               json_extract_string(payload, '$.meta.tag') AS tag,
               CAST(json_extract(payload, '$.meta.v') AS BIGINT) AS v,
               json_extract_string(payload, '$.meta.v') AS v_str,
               CAST(json_extract(payload, '$.arr[0]') AS BIGINT) AS arr0,
               CAST(json_extract(payload, '$.k') AS BIGINT) AS k
        FROM j
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(tag) AS BIGINT) AS n_meta,
           CAST(count(CASE WHEN tag = event_type THEN 1 END) AS BIGINT) AS n_tag_match,
           CAST(sum(v) AS BIGINT) AS v_total,
           CAST(sum(length(v_str)) AS BIGINT) AS v_strlen_total,
           CAST(sum(arr0) AS BIGINT) AS arr0_total,
           CAST(count(*) - count(k) AS BIGINT) AS n_k_missing
    FROM x GROUP BY event_type
    """,
    tags=("semi-structured", "variant", "nested-path", "type-coercion", "spark4-surface"),
)
def props_variant_shredded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT depth — nested paths, array indexing, type COERCION and
    schema DRIFT over one variant column (`props_variant_stats` covers
    the flat single-field get).  The payload is built in-query as a
    deterministic three-way drifting schema (the fixture's props are
    uniformly flat `{"k": int}`, so the drift a real telemetry feed
    carries is synthesized identically on both engines): a third of the
    rows nest `{"meta": {"tag", "v"}, "k"}`, a third carry only an
    array `{"arr": [..]}`, a third only flat `{"k"}`.  One `parse_json`
    per row, then SHREDDED gets: `$.meta.tag` as string, `$.meta.v`
    twice — once as long, once COERCED to string (variant cast rules:
    number -> its decimal rendering) — `$.arr[0]` by array index, and
    `$.k` whose two-thirds missingness lands in `n_k_missing` —
    `try_variant_get` null-on-absent semantics, the drift-tolerant
    contract (a strict `variant_get` would throw; ref anchor:
    spark_streaming.py:136-139 enforces one rigid schema and drops
    everything else to dead-letter — variant keeps the payload
    queryable).  At 100 TB the single binary parse amortizes across
    all five gets, the reason VARIANT exists; aggregation stays on
    typed integers."""
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id", "event_id")
    m = F.col("event_id") % 3
    num = lambda c: c.cast("string")  # noqa: E731
    payload = (
        F.when(
            m == 0,
            F.concat(
                F.lit('{"meta":{"tag":"'),
                F.col("event_type"),
                F.lit('","v":'),
                num(F.col("user_id") % 100),
                F.lit('},"k":'),
                num(F.col("user_id") % 10),
                F.lit("}"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('{"arr":['),
                num(F.col("user_id")),
                F.lit(","),
                num(F.col("user_id") % 7),
                F.lit("]}"),
            ),
        )
        .otherwise(
            F.concat(F.lit('{"k":'), num(F.col("user_id") % 10), F.lit("}"))
        )
    )
    v = F.parse_json(payload)
    x = e.select(
        "event_type",
        F.try_variant_get(v, "$.meta.tag", "string").alias("tag"),
        F.try_variant_get(v, "$.meta.v", "long").alias("v"),
        F.try_variant_get(v, "$.meta.v", "string").alias("v_str"),
        F.try_variant_get(v, "$.arr[0]", "long").alias("arr0"),
        F.try_variant_get(v, "$.k", "long").alias("k"),
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("tag").cast("long").alias("n_meta"),
        F.count(F.when(F.col("tag") == F.col("event_type"), 1)).cast("long").alias("n_tag_match"),
        F.sum("v").cast("long").alias("v_total"),
        F.sum(F.length("v_str")).cast("long").alias("v_strlen_total"),
        F.sum("arr0").cast("long").alias("arr0_total"),
        (F.count(F.lit(1)) - F.count("k")).cast("long").alias("n_k_missing"),
    )
