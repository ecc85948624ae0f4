"""Classic OLAP decision-support shapes (round-4 widening).

The reference's analytics surface is flat scans + group-bys over one
events table (SURVEY §2.4); a user replacing it with this engine will
immediately point the same API at warehouse-shaped data.  This module
fills the remaining canonical decision-support plan shapes over the
TPC-H-ish fixture star schema — the ones whose PLANS differ structurally
from anything already in the catalog:

* correlated EXISTS        -> conditional semi join       (Q4 shape)
* market-share ratio       -> two-level conditional agg over a 5-way
                              star join                   (Q8 shape)
* COUNT distribution       -> outer join + double group-by (Q13 shape)
* conditional promo ratio  -> broadcast dim + CASE agg     (Q14 shape)
* argmax via scalar subquery -> self-agg + 1-row broadcast (Q15 shape)
* correlated scalar per key  -> per-key avg joined back    (Q17 shape)
* disjunctive multi-range predicate pushed into a join     (Q19 shape)
* NOT EXISTS + scalar subquery -> anti join + 1-row bcast  (Q22 shape)

Every query keeps money math in exact integer cents (see
functions/scalars.py) so the DuckDB oracle hashes bit-identically under
any partitioning, and every date literal is a session-timezone-proof
instant (`utc_ts`).

Scale notes are per-query; the common theme: the lineitem fact table
never shuffles for a dimension join (dims broadcast), and the only big
shuffles are keyed on l_orderkey / c_custkey where the data genuinely
must meet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    round_det,
    utc_naive,
    utc_ts,
)
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# Exact-cents discounted revenue: epc * (100 - dc) is an exact int64;
# /10000.0 only at the end, after the (exact) integer sum.
def _disc_price_cents(price="l_extendedprice", disc="l_discount"):
    return as_cents(F.col(price)) * (100 - as_cents(F.col(disc)))


_DISC_SQL = "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"


@register(
    "order_priority_exists",
    oracle=f"""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("olap", "tpch-q4", "semi-join", "exists"),
)
def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (one quarter) that had at least one slow
    line (shipped >30 days after order), counted per priority.  The
    correlated EXISTS becomes a LEFT SEMI join whose condition mixes the
    equi key with the correlated inequality — Spark shuffles both sides
    on l_orderkey once and evaluates the inequality inside the join, so
    lineitem is scanned exactly once (vs once per order for a naive
    correlated probe).  The quarter filter is pushed to the orders scan
    before the shuffle."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= utc_ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < utc_ts("1996-10-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, slow, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "market_share_by_year",
    oracle=f"""
    WITH flat AS (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               {_DISC_SQL} AS rev_cents,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey  = c.c_custkey
        JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
        JOIN region r    ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
        JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
        JOIN part p      ON l.l_partkey  = p.p_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND((sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_cents ELSE 0 END)
                  / CAST(sum(rev_cents) AS DOUBLE)) + 1e-8, 6) AS mkt_share
    FROM flat GROUP BY o_year
    """,
    tags=("olap", "tpch-q8", "star-join", "conditional-agg"),
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of ECONOMY-part revenue sold to
    ASIA customers, per order year.  Five dimensions hang off the two
    facts; ALL are broadcast (part, supplier->nation, customer->nation->
    region), so the only shuffle in the plan is lineitem><orders on
    l_orderkey.  The share is a conditional sum over one grouped pass —
    numerator and denominator never require two scans.  Year extraction
    goes through `utc_naive` so the grouping key is identical under any
    driver session timezone."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c, n, r = (_t(spark, sf_dir, t) for t in ("customer", "nation", "region"))
    s, p = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "part")

    asia_cust = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = F.broadcast(
        s.join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
               s.s_nationkey == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    econ_part = F.broadcast(p.filter(F.col("p_type") == "ECONOMY").select("p_partkey"))

    rev = F.col("rev_cents")
    return (
        l.join(econ_part, l.l_partkey == econ_part.p_partkey)
        .join(supp_nation, l.l_suppkey == supp_nation.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(asia_cust, o.o_custkey == asia_cust.c_custkey)
        .select(
            F.year(utc_naive("o_orderdate")).cast("long").alias("o_year"),
            _disc_price_cents().alias("rev_cents"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            round_det(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0)))
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    tags=("olap", "tpch-q13", "outer-join", "distribution"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    keeping zero-order customers via the LEFT OUTER join (the filter
    lives in the JOIN CONDITION, not a WHERE — pushing it to WHERE would
    silently drop the zero bucket).  Two shuffles, both small: one on
    c_custkey for the per-customer count (partial map-side counts make
    the shuffle rows-per-customer, not rows-per-order), then one on the
    count value itself — whose cardinality is the max order count, i.e.
    tiny at any data scale."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT ROUND((100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN {_DISC_SQL} ELSE 0 END)
                  / CAST(sum({_DISC_SQL}) AS DOUBLE)) + 1e-8, 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    tags=("olap", "tpch-q14", "broadcast", "conditional-agg"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue from PROMO parts.
    part is broadcast (it's a dimension), the month filter pushes to the
    lineitem parquet scan, and the ratio is one conditional aggregate —
    the whole query is a single scan with zero fact shuffles (the final
    1-row agg moves bytes, not rows)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= utc_ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < utc_ts("1997-10-01 00:00:00"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = _disc_price_cents()
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            round_det(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "top_supplier_revenue",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, sum({_DISC_SQL}) AS rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(r.rev_cents / 10000.0 + 1e-8, 2) AS total_revenue
    FROM revenue r JOIN supplier s ON r.supplier_no = s.s_suppkey
    WHERE r.rev_cents = (SELECT max(rev_cents) FROM revenue)
    """,
    tags=("olap", "tpch-q15", "scalar-subquery", "argmax"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.
    Naive decorrelation (agg + broadcast the scalar max back) would
    duplicate the whole revenue subtree — Spark has no common-subplan
    reuse across a self-referencing scalar, so lineitem would be scanned
    TWICE (verified on the explain output).  Instead the global max is a
    window max over the ALREADY per-supplier-aggregated frame: one
    lineitem scan, and the single-partition exchange carries only
    aggregated supplier rows (#suppliers, not #lineitems).  Revenue
    equality is exact (integer cents), so the argmax filter is
    deterministic across engines."""
    from pyspark.sql import Window

    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= utc_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < utc_ts("1996-04-01 00:00:00"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price_cents()).alias("rev_cents")
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue.withColumn("max_cents", F.max("rev_cents").over(Window.partitionBy()))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            round_det(F.col("rev_cents") / 10000.0, 2).alias("total_revenue"),
        )
    )


@register(
    "small_qty_order_revenue",
    oracle="""
    WITH brand AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#13'
    ), part_avg AS (
        SELECT l_partkey, 0.2 * (sum(CAST(l_quantity AS BIGINT)) / CAST(count(*) AS DOUBLE)) AS qty_cut
        FROM brand GROUP BY l_partkey
    )
    SELECT ROUND(sum(CAST(round(b.l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / 7.0 + 1e-8, 2) AS avg_yearly
    FROM brand b JOIN part_avg a ON b.l_partkey = a.l_partkey
    WHERE b.l_quantity < a.qty_cut
    """,
    tags=("olap", "tpch-q17", "correlated-scalar", "self-join"),
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) were not taken, for one
    brand.  The correlated per-part scalar (avg quantity) is decorrelated
    into a per-partkey aggregate joined back on l_partkey — both sides
    of that join are ALREADY restricted to the brand via the broadcast
    part dim, so the shuffle carries only the brand's rows.  Quantities
    are integral, so sum(long)/count is bit-identical in both engines
    and the strict `<` cut is deterministic."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand = l.join(p, l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = brand.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("long")) / F.count(F.lit(1)).cast("double"))
        ).alias("qty_cut")
    )
    return (
        brand.join(part_avg.withColumnRenamed("l_partkey", "a_partkey"),
                   F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            round_det(
                F.sum(as_cents(F.col("l_extendedprice"))) / 100.0 / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@register(
    "disjunctive_part_revenue",
    oracle=f"""
    SELECT ROUND(sum({_DISC_SQL}) / 10000.0 + 1e-8, 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("olap", "tpch-q19", "disjunctive-predicate", "broadcast"),
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-branch disjunctive predicate
    mixing dim attributes (brand, size) with fact attributes (quantity).
    part is broadcast; the brand/size half of each branch prunes the
    broadcast build side and the OR evaluates inside the join — one
    lineitem scan, no shuffle at all (the 1-row agg is bytes).  At 100 TB
    the win is that the disjunction never forces a cartesian or a
    UNION-of-three-scans plan."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    qty = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(20, 50) & qty.between(20, 30))
    )
    return (
        l.join(p, (l.l_partkey == p.p_partkey) & branch)
        .agg(round_det(F.sum(_disc_price_cents()) / 10000.0, 2).alias("revenue"))
    )


@register(
    "idle_rich_customers",
    oracle="""
    WITH cutoff AS (
        SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / (100.0 * count(*)) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           ROUND(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) / 100.0 + 1e-8, 2) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT avg_bal FROM cutoff)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n.n_name
    """,
    tags=("olap", "tpch-q22", "anti-join", "scalar-subquery"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    order (none since 2000-01-01), rolled up per nation.  The scalar
    subquery (average positive balance, exact cents) is a 1-row
    broadcast; the NOT EXISTS is a LEFT ANTI join against the DISTINCT
    recent-o_custkey projection — at scale the anti join shuffles only
    distinct customer keys, never full orders rows; the date filter
    pushes to the orders scan and the balance cut applies BEFORE the
    shuffle so the probe side is already thinned."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    n = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= utc_ts("2000-01-01 00:00:00"))
        .select("o_custkey")
        .distinct()
    )
    cutoff = F.broadcast(
        c.filter(F.col("c_acctbal") > 0.0).agg(
            (F.sum(as_cents(F.col("c_acctbal"))) / (100.0 * F.count(F.lit(1)))).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(cutoff)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round_det(F.sum(as_cents(F.col("c_acctbal"))) / 100.0, 2).alias("totacctbal"),
        )
    )


@register(
    "brand_basket_affinity",
    oracle="""
    WITH b AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_orders AS (SELECT count(DISTINCT okey) AS total FROM b),
    brand_cnt AS (SELECT brand, count(*) AS cnt FROM b GROUP BY 1),
    pairs AS (
        SELECT a.brand AS brand_a, c.brand AS brand_b, count(*) AS both_cnt
        FROM b a JOIN b c ON a.okey = c.okey AND a.brand < c.brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(both_cnt AS BIGINT) AS both_cnt,
           ROUND((CAST(both_cnt AS DOUBLE) * total) /
                 (CAST(x.cnt AS DOUBLE) * y.cnt) + 1e-8, 4) AS lift
    FROM pairs
    JOIN brand_cnt x ON brand_a = x.brand
    JOIN brand_cnt y ON brand_b = y.brand
    CROSS JOIN n_orders
    ORDER BY both_cnt DESC, brand_a, brand_b LIMIT 25
    """,
    tags=("olap", "market-basket", "self-join"),
)
def brand_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: brand pairs co-purchased within one order,
    with lift = P(a,b) / (P(a)P(b)) — the classic co-occurrence self-join
    the decision-support set doesn't otherwise exercise.  Scale shape:
    the self-join keys on l_orderkey, so the pair fan-out is bounded by
    (basket size choose 2) per order — baskets are small by construction
    (TPC-H: <= 7 lineitems), so the join output is linear in orders, not
    quadratic in anything global; brand marginals and the order total
    are tiny aggregates broadcast into the lift projection.  Lift's
    numerator/denominator multiply in a fixed order (both_cnt*total,
    cnt_a*cnt_b) so the rounded double is engine-stable."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    b = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    total = F.broadcast(b.agg(F.count_distinct("okey").alias("total")))
    brand_cnt = b.groupBy("brand").agg(F.count(F.lit(1)).alias("cnt"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(c, (F.col("a.okey") == F.col("c.okey")) & (F.col("a.brand") < F.col("c.brand")))
        .groupBy(F.col("a.brand").alias("brand_a"), F.col("c.brand").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("both_cnt"))
    )
    x = F.broadcast(brand_cnt.select(F.col("brand").alias("brand_a"), F.col("cnt").alias("cnt_a")))
    y = F.broadcast(brand_cnt.select(F.col("brand").alias("brand_b"), F.col("cnt").alias("cnt_b")))
    return (
        pairs.join(x, "brand_a")
        .join(y, "brand_b")
        .crossJoin(total)
        .select(
            "brand_a",
            "brand_b",
            F.col("both_cnt").cast("long").alias("both_cnt"),
            round_det(
                (F.col("both_cnt").cast("double") * F.col("total"))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("both_cnt").desc(), "brand_a", "brand_b")
        .limit(25)
    )


@register(
    "multi_grain_rollup",
    oracle="""
    WITH e AS (
        SELECT event_type, epoch_us(ts) // 1000000 AS es,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    )
    SELECT '5m' AS grain, event_type,
           CAST((es // 300) * 300 AS BIGINT) AS window_start,
           count(*) AS cnt,
           ROUND((sum(cents) / (100.0 * count(*))) + 1e-8, 4) AS avg_value
    FROM e GROUP BY 1, 2, 3
    UNION ALL
    SELECT '1h', event_type, CAST((es // 3600) * 3600 AS BIGINT), count(*),
           ROUND((sum(cents) / (100.0 * count(*))) + 1e-8, 4)
    FROM e GROUP BY 1, 2, 3
    UNION ALL
    SELECT '1d', event_type, CAST((es // 86400) * 86400 AS BIGINT), count(*),
           ROUND((sum(cents) / (100.0 * count(*))) + 1e-8, 4)
    FROM e GROUP BY 1, 2, 3
    """,
    tags=("olap", "grouping-sets", "multi-grain", "rollup"),
)
def multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup in ONE scan: 5-minute, 1-hour, and 1-day
    aggregates per event type via GROUPING SETS — the continuous-
    aggregate / hypertable-rollup shape (TimescaleDB's caggs, Druid's
    multiple granularities) that would otherwise cost three scans.
    Spark expands the sets map-side and partial-aggregates before the
    single shuffle, so the cost is one pass + union-sized agg state —
    at 100 TB the scan dominates and the two coarser grains are nearly
    free.  Grain is decoded from which window column survived
    (NULL-pattern, equivalent to grouping_id but portable); epoch-second
    bucket arithmetic keeps every output cell session-tz-independent."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        ((F.unix_seconds("ts") / 300).cast("long") * 300).alias("ws5"),
        ((F.unix_seconds("ts") / 3600).cast("long") * 3600).alias("ws1h"),
        ((F.unix_seconds("ts") / 86400).cast("long") * 86400).alias("ws1d"),
        as_cents(F.col("value")).alias("cents"),
    )
    grain = (
        F.when(F.col("ws5").isNotNull(), "5m")
        .when(F.col("ws1h").isNotNull(), "1h")
        .otherwise("1d")
    )
    return (
        e.groupingSets(
            [["event_type", "ws5"], ["event_type", "ws1h"], ["event_type", "ws1d"]],
            "event_type",
            "ws5",
            "ws1h",
            "ws1d",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            round_det(F.sum("cents") / (F.lit(100.0) * F.count(F.lit(1))), 4).alias("avg_value"),
        )
        .select(
            grain.alias("grain"),
            "event_type",
            F.coalesce("ws5", "ws1h", "ws1d").cast("long").alias("window_start"),
            "cnt",
            "avg_value",
        )
    )


_NAAJ_SQL = """
    SELECT 'not_in' AS semantics,
           (SELECT count(*) FROM {cust} WHERE c_custkey NOT IN
               (SELECT o_custkey FROM {orders} WHERE o_orderkey % 3 = 0
                UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_customers
    UNION ALL
    SELECT 'not_exists',
           (SELECT count(*) FROM {cust} c WHERE NOT EXISTS
               (SELECT 1 FROM (SELECT o_custkey FROM {orders} WHERE o_orderkey % 3 = 0
                               UNION ALL SELECT CAST(NULL AS BIGINT)) s
                WHERE s.o_custkey = c.c_custkey))
"""


@register(
    "null_aware_not_in",
    oracle=_NAAJ_SQL.format(cust="customer", orders="orders"),
    tags=("olap", "null-semantics", "anti-join", "sql-surface"),
)
def null_aware_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, demonstrated and correctly planned: with a
    NULL in the subquery, ANSI `NOT IN` is three-valued — no row can
    prove it is different from NULL, so the count is ZERO — while `NOT
    EXISTS` (null-agnostic equality) returns the real complement.  Spark
    plans the first as a null-aware anti join (a dedicated physical
    strategy: broadcast + null-key tracking) and the second as an
    ordinary left-anti; both semantics land in one result so the
    difference is value-hash-pinned, the trap every SQL user eventually
    hits in production.  Also the catalog's exercise of the `spark.sql`
    ENTRY PATH — identical ANSI text runs on both engines verbatim.
    Scale: both branches broadcast the (aggregated) subquery key set;
    the probe side never shuffles."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_naaj_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_naaj_orders")
    return spark.sql(_NAAJ_SQL.format(cust="v_naaj_cust", orders="v_naaj_orders"))


@register(
    "nation_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS o_year,
           ROUND(sum({_DISC_SQL}
                     - CAST(round(p.p_retailprice * 100, 0) AS BIGINT)
                       * CAST(round(l.l_quantity * 100, 0) AS BIGINT))
                 / 10000.0 + 1e-8, 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
    tags=("olap", "tpch-q9", "star-join", "profit"),
)
def nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (ref workload family: the reference's group-by
    dashboards over one table, generalized to the star schema a
    warehouse user will point this engine at): profit per nation per
    ship-year for one product family — revenue minus cost, the fixture's
    cost proxy being retailprice x quantity (no partsupp table in the
    fixture).  Plan: the p_name LIKE filter prunes part BEFORE its
    broadcast, so the fact table inner-joins against a ~12% dim subset
    and non-matching lineitem rows drop at the (broadcast) join — never
    shuffled.  supplier and nation broadcast too; the only shuffle is
    the final (nation, year) agg, pre-aggregated map-side.  Money math:
    both terms land in exact 1e-4-dollar int64 units (price-cents x
    discount-percent and retail-cents x quantity-cents), summed exactly,
    divided once."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select("p_partkey", "p_retailprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    profit_1e4 = _disc_price_cents() - as_cents(F.col("p_retailprice")) * qty_cents
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(utc_naive(F.col("l_shipdate"))).cast("int").alias("o_year"),
        )
        .agg(round_det(F.sum(profit_1e4) / 10000.0, 2).alias("profit"))
    )


@register(
    "brand_value_concentration",
    oracle=f"""
    WITH brand_value AS (
        SELECT p.p_brand, sum({_DISC_SQL}) AS v
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    ),
    total AS (SELECT sum(v) AS tv FROM brand_value)
    SELECT p_brand, ROUND(v / 10000.0 + 1e-8, 2) AS brand_value,
           ROUND(v / tv + 1e-8, 6) AS share
    FROM brand_value, total
    WHERE v * 25 > tv
    """,
    tags=("olap", "tpch-q11", "global-scalar-having"),
)
def brand_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose aggregate clears a threshold
    defined by the GLOBAL aggregate — the `HAVING sum(...) > fraction *
    (SELECT sum(...) ...)` pattern (here: brands holding >1/25 of total
    discounted revenue; the fixture has no partsupp so revenue stands in
    for stock value).  The scalar subquery becomes a 1-row broadcast
    crossJoin — the same pattern as `top_supplier_revenue` (Q15) — so
    the brand-level agg is computed ONCE and reused for both the
    threshold and the output, never recomputed per group.  The
    threshold compare stays in exact integer units (v * 25 > tv, no
    division)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bv = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(_disc_price_cents()).alias("v"))
    )
    total = F.broadcast(bv.agg(F.sum("v").alias("tv")))
    return (
        bv.crossJoin(total)
        .filter(F.col("v") * 25 > F.col("tv"))
        .select(
            "p_brand",
            round_det(F.col("v") / 10000.0, 2).alias("brand_value"),
            round_det(F.col("v") / F.col("tv"), 6).alias("share"),
        )
    )


@register(
    "dominant_part_suppliers",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qty_cents
        FROM lineitem GROUP BY 1, 2
    ),
    pt AS (
        SELECT l_partkey, sum(qty_cents) AS part_total
        FROM ps GROUP BY 1
    ),
    dom AS (
        SELECT ps.l_suppkey, ps.l_partkey
        FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
        WHERE ps.qty_cents * 5 > pt.part_total
    )
    SELECT s.s_name AS supplier, n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_dominant_parts
    FROM dom
    JOIN supplier s ON s.s_suppkey = dom.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
    tags=("olap", "tpch-q20", "correlated-threshold", "semi-join"),
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the correlated `> 0.5 * (SELECT sum(...) WHERE
    same key)` threshold — suppliers who shipped more than 20% of a
    part's total quantity (the fixture's supplier fan-out is too even
    for a literal half-share to ever fire; 20% keeps the plan shape and
    a non-vacuous result), rolled up per supplier with nation attached.
    The correlated scalar becomes a second-level aggregate of the first
    (per-part totals derive from the (part, supplier) agg — lineitem is
    read and shuffled ONCE, on l_partkey, and both aggregation grains
    reuse that partitioning; the per-part total join is part-keyed and
    co-partitioned).  The share-threshold compare is exact integer
    (qty x 5 > total).  Supplier and nation dims broadcast onto the
    (tiny) dominant set."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty_cents).alias("qty_cents"))
    pt = ps.groupBy("l_partkey").agg(F.sum("qty_cents").alias("part_total"))
    dom = ps.join(pt, "l_partkey").filter(F.col("qty_cents") * 5 > F.col("part_total"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        dom.join(F.broadcast(s), dom.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("s_name").alias("supplier"), F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_dominant_parts"))
    )


@register(
    "part_supplier_variety",
    oracle="""
    WITH excluded AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    ),
    ps AS (
        SELECT DISTINCT l.l_partkey, l.l_suppkey
        FROM lineitem l
        WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    )
    SELECT p.p_brand, p.p_type,
           CASE WHEN p.p_size <= 15 THEN 'small'
                WHEN p.p_size <= 35 THEN 'medium' ELSE 'large' END AS size_band,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    GROUP BY 1, 2, 3
    """,
    tags=("olap", "tpch-q16", "count-distinct", "not-in-exclusion"),
)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier VARIETY per product segment — how many
    distinct suppliers ship each (brand, type, size band), excluding a
    blacklisted supplier set via NOT IN (here: negative account balance;
    the fixture has no comment column).  Plan: the exclusion list is a
    small aggregate -> broadcast null-aware anti join (the exclusion
    set has no NULLs by construction, so this is a plain anti join);
    the (part, supplier) pairs DISTINCT first (collapsing repeat
    shipments map-side before any wide work); count(DISTINCT suppkey)
    re-shuffles the deduplicated pair table only.  Completes the
    catalog's TPC-H shape sweep (Q2/4/8/9/11/13-15/17-22 already
    present)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    excluded = (
        _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    ps = li.join(
        F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti"
    ).distinct()
    p = F.broadcast(
        _t(spark, sf_dir, "part").select(
            "p_partkey",
            "p_brand",
            "p_type",
            F.when(F.col("p_size") <= 15, "small")
            .when(F.col("p_size") <= 35, "medium")
            .otherwise("large")
            .alias("size_band"),
        )
    )
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "size_band")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "region_nation_revenue_share",
    oracle=f"""
    WITH nat AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum({_DISC_SQL}) AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT sum(v) AS world FROM nat)
    SELECT region, nation,
           ROUND(v / 10000.0 + 1e-8, 2) AS revenue,
           ROUND(v / CAST(sum(v) OVER (PARTITION BY region) AS DOUBLE) + 1e-8, 6)
               AS share_of_region,
           ROUND(v / CAST(tot.world AS DOUBLE) + 1e-8, 6) AS share_of_world
    FROM nat, tot
    """,
    tags=("olap", "hierarchy", "share-of-parent"),
)
def region_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent hierarchical rollup: each nation's supplier
    revenue as a fraction of its REGION's total and of the WORLD total —
    the drill-down ratio every BI hierarchy needs, and a different plan
    shape from ROLLUP (which stacks grains; this RELATES them).  One
    fact aggregation at the leaf grain (nation), then the parent totals
    derive from the LEAF table: a region-partitioned window over the
    25-row nation frame and a 1-row broadcast for the world — the fact
    table is scanned and shuffled exactly once, and the two ratios are
    float divisions of exact integer sums."""
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    s = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey"))
    r = F.broadcast(_t(spark, sf_dir, "region").select("r_regionkey", "r_name"))
    nat = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(_disc_price_cents()).alias("v"))
    )
    world = F.broadcast(nat.agg(F.sum("v").alias("world")))
    wr = Window.partitionBy("region")
    return (
        nat.crossJoin(world)
        .select(
            "region",
            "nation",
            round_det(F.col("v") / 10000.0, 2).alias("revenue"),
            round_det(F.col("v") / F.sum("v").over(wr).cast("double"), 6).alias(
                "share_of_region"
            ),
            round_det(F.col("v") / F.col("world").cast("double"), 6).alias("share_of_world"),
        )
    )


@register(
    "hierarchy_subtree_rollup",
    oracle="""
    WITH RECURSIVE up(node, anc) AS (
        SELECT c_custkey, c_custkey FROM customer
        UNION ALL
        SELECT up.node, up.anc // 10 FROM up WHERE up.anc >= 10
    ),
    roots AS (
        SELECT node, anc AS root FROM up WHERE anc < 10
    ),
    rev AS (
        SELECT o_custkey, sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY 1
    )
    SELECT r.root,
           CAST(count(*) AS BIGINT) AS n_nodes,
           ROUND(sum(COALESCE(rev.cents, 0)) / 100.0 + 1e-8, 2) AS subtree_revenue
    FROM roots r LEFT JOIN rev ON rev.o_custkey = r.node
    GROUP BY r.root
    """,
    tags=("olap", "hierarchy", "recursive", "pointer-doubling"),
)
def hierarchy_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE hierarchy rollup — the org-chart / bill-of-materials
    query SQL needs a recursive CTE for: customers form a synthetic
    reporting tree (parent = custkey div 10, roots are keys < 10) and
    every node's revenue rolls up to its ROOT.  Spark has no recursive
    CTE; the scalable equivalent is POINTER DOUBLING on the ancestor
    link: starting from the ONE-STEP map anc_1(n) = parent(n), each
    round composes the map with ITSELF — anc_{k+1}(n) = anc_k(anc_k(n))
    — so the climbed distance doubles per round and a depth-d tree
    resolves in ceil(log2 d) self-joins.  (Joining a static one-step
    parent map k times would climb only k levels — linear, not
    logarithmic — and silently strand deep nodes at a non-root
    ancestor; pinned by the depth-6 regression test.)  Roots self-point,
    so once a node's pointer reaches its root it is absorbed and extra
    rounds are harmless.  3 doublings of the 1-step map reach 2^3 = 8
    levels >= this tree's depth (4 at sf0.1, 5 at sf1); each round is
    one key-keyed equi-join of the map against itself,
    lineage-truncated like `dedup.duplicate_components`.  The oracle
    walks the same links with a real recursive CTE, proving the
    doubling loop reaches the identical fixpoint."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("node"))
    # one-step ancestor map: anc_1(n) = parent(n); roots self-point
    anc = c.select(
        "node",
        F.when(F.col("node") < 10, F.col("node"))
        .otherwise(F.expr("node div 10"))
        .alias("anc"),
    )
    for _ in range(3):  # reach doubles each round: 1 -> 2 -> 4 -> 8 levels
        hop = anc.select(F.col("node").alias("m_node"), F.col("anc").alias("m_anc"))
        anc = (
            anc.join(hop, anc.anc == hop.m_node)
            .select("node", F.col("m_anc").alias("anc"))
            .localCheckpoint(eager=False)
        )
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(as_cents(F.col("o_totalprice"))).alias("cents"))
    )
    return (
        anc.join(rev, anc.node == rev.o_custkey, "left")
        .groupBy(F.col("anc").alias("root"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            round_det(F.sum(F.coalesce(F.col("cents"), F.lit(0))) / 100.0, 2).alias(
                "subtree_revenue"
            ),
        )
    )


_SETALL_SQL = """
    WITH buyers AS (
        SELECT o_custkey AS custkey FROM {orders} WHERE o_orderpriority = '1-URGENT'
    ),
    anybuyers AS (
        SELECT o_custkey AS custkey FROM {orders}
    ),
    plain AS (
        SELECT count(*) AS n FROM (
            SELECT custkey FROM anybuyers EXCEPT SELECT custkey FROM buyers
        )
    ),
    multi AS (
        SELECT count(*) AS n FROM (
            SELECT custkey FROM anybuyers EXCEPT ALL SELECT custkey FROM buyers
        )
    ),
    inter AS (
        SELECT count(*) AS n FROM (
            SELECT custkey FROM anybuyers INTERSECT ALL SELECT custkey FROM buyers
        )
    )
    SELECT CAST(plain.n AS BIGINT) AS n_except_distinct,
           CAST(multi.n AS BIGINT) AS n_except_all,
           CAST(inter.n AS BIGINT) AS n_intersect_all
    FROM plain, multi, inter
"""


@register(
    "set_ops_multiplicity",
    oracle=_SETALL_SQL.format(orders="orders"),
    tags=("olap", "set-ops", "bag-semantics", "sql-surface"),
)
def set_ops_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations — EXCEPT ALL / INTERSECT ALL, where
    multiplicities subtract and min instead of collapsing: the customer
    key multiset of ALL orders minus the multiset of urgent orders
    counts each customer's NON-urgent order multiplicity (EXCEPT ALL),
    while plain EXCEPT answers the totally different question "who
    never ordered urgent".  All three counts land in one result so the
    semantic gap is value-hash-pinned (`set_ops_users` covers the
    DISTINCT variants; `null_aware_not_in` the NOT IN trap — this
    completes the set-operation semantics family).  Runs through the
    `spark.sql` entry path verbatim on both engines; Spark plans
    EXCEPT ALL as an aggregate-and-replicate (count difference
    generation), never a row-pairing join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_setall_orders")
    return spark.sql(_SETALL_SQL.format(orders="v_setall_orders"))


_RECURSIVE_CTE_SQL = """
    WITH RECURSIVE up(node, anc) AS (
        SELECT c_custkey, c_custkey FROM {customer}
        UNION ALL
        SELECT node, CAST((anc - anc % 10) / 10 AS BIGINT) FROM up WHERE anc >= 10
    ),
    roots AS (
        SELECT node, anc AS root FROM up WHERE anc < 10
    ),
    rev AS (
        SELECT o_custkey, sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM {orders} GROUP BY 1
    )
    SELECT r.root,
           CAST(count(*) AS BIGINT) AS n_nodes,
           ROUND(sum(COALESCE(rev.cents, 0)) / 100.0 + 1e-8, 2) AS subtree_revenue
    FROM roots r LEFT JOIN rev ON rev.o_custkey = r.node
    GROUP BY r.root
"""


@register(
    "recursive_cte_hierarchy",
    oracle=_RECURSIVE_CTE_SQL.format(customer="customer", orders="orders"),
    tags=("olap", "recursive-cte", "sql-surface", "spark4-surface", "hierarchy"),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE `WITH RECURSIVE` (Spark 4) — the SAME recursive-CTE text
    runs through `spark.sql` and DuckDB: the customer-tree ancestor
    walk + root revenue rollup that `hierarchy_subtree_rollup` computes
    with engine-level pointer doubling.  The pair is deliberate: the
    doubling plan is the ceil(log2 d)-join SCALE path; this query pins
    the SQL SURFACE a migrator's recursive queries arrive in, now that
    Spark executes recursion natively (one iteration per level — fine
    for shallow hierarchies, which is what recursive CTEs get used
    for).  Identical results from three independent strategies
    (doubling, Spark recursion, DuckDB recursion) triangulate the
    semantics."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_rec_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_rec_orders")
    return spark.sql(_RECURSIVE_CTE_SQL.format(customer="v_rec_customer", orders="v_rec_orders"))


@register(
    "abc_classification",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey AS part, CAST(sum({_DISC_SQL}) AS BIGINT) AS rc
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT part, rc,
               sum(rc) OVER (ORDER BY rc DESC, part
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
               sum(rc) OVER () AS total
        FROM rev
    ),
    classed AS (
        SELECT CASE WHEN run * 100 <= total * 80 THEN 'A'
                    WHEN run * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS cls,
               rc, total
        FROM ranked
    )
    SELECT cls,
           CAST(count(*) AS BIGINT) AS n_parts,
           ROUND(sum(rc) / (CAST(any_value(total) AS DOUBLE) * 10000.0) * 10000.0 + 1e-8, 6) AS revenue_share
    FROM classed GROUP BY cls ORDER BY cls
    """,
    tags=("olap", "abc-analysis", "pareto", "global-running-sum"),
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC INVENTORY CLASSIFICATION of parts by discounted revenue —
    the 80/15/5 Pareto banding every supply-chain/merchandising team
    runs (A: parts covering the first 80% of cumulative revenue, B: to
    95%, C: the tail).  The class boundary is an INTEGER comparison
    (run*100 <= total*80 on exact micro-cent int64s) so boundary parts
    band identically in both engines.  The Spark side rides the
    `global_running_sum` RANGE-PARTITION kernel over (revenue DESC,
    part) — a fourth kernel-equivalence consumer; no data-sized global
    window — while the oracle uses a native window prefix sum; the
    grand total arrives as the kernel's broadcast `_grs_total`, never a
    second scan.  Output is 3 rows at any catalog size."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import (
        global_running_sum,
    )

    rev = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("part"))
        .agg(F.sum(_disc_price_cents()).alias("rc"))
    )
    ranked = global_running_sum(
        rev, [F.col("rc").desc(), F.col("part")], "rc", out="run"
    )
    classed = ranked.select(
        F.when(F.col("run") * 100 <= F.col("_grs_total") * 80, "A")
        .when(F.col("run") * 100 <= F.col("_grs_total") * 95, "B")
        .otherwise("C")
        .alias("cls"),
        "rc",
        F.col("_grs_total").alias("total"),
    )
    return (
        classed.groupBy("cls")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            round_det(
                F.sum("rc") / (F.first("total").cast("double") * 10000.0) * 10000.0, 6
            ).alias("revenue_share"),
        )
        .orderBy("cls")
    )


@register(
    "hhi_market_concentration",
    oracle=f"""
    WITH bv AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
               p.p_brand,
               CAST(sum({_DISC_SQL}) AS BIGINT) AS v
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT yr, CAST(sum(v) AS BIGINT) AS tv FROM bv GROUP BY 1),
    terms AS (
        SELECT bv.yr,
               CAST(floor((CAST(bv.v AS DOUBLE) / tot.tv)
                          * (CAST(bv.v AS DOUBLE) / tot.tv)
                          * 10000000000 + 0.5 + 1e-8) AS BIGINT) AS hhi_micro4,
               bv.v, tot.tv
        FROM bv JOIN tot USING (yr)
    )
    SELECT yr,
           CAST(count(*) AS BIGINT) AS n_brands,
           ROUND(sum(hhi_micro4) / 1000000.0 + 1e-8, 4) AS hhi,
           (max(v) * 1000000) // max(tv) AS top_share_micro
    FROM terms GROUP BY yr ORDER BY yr
    """,
    tags=("olap", "hhi", "market-concentration", "antitrust"),
)
def hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN INDEX of brand revenue concentration per
    order year — the antitrust/market-power convention (sum of squared
    percentage shares, 0..10000: <1500 unconcentrated, >2500 highly
    concentrated), the SCALAR concentration dial next to
    `brand_value_concentration`'s Q11 threshold list and
    `customer_spend_gini`'s inequality curve.  Each brand-year's
    squared share is one identical double expression from exact
    integer revenue cents, quantized at 1e-4 HHI points BEFORE the
    per-year sum (order-independent); the top-brand share is an exact
    integer floor-division.  Plan: one 3-way join -> (year x brand)
    agg; year totals re-aggregate the brand table; everything after is
    brands-sized."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", _disc_price_cents().alias("vc")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(utc_naive("o_orderdate")).cast("long").alias("yr")
    )
    bv = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("yr", "p_brand")
        .agg(F.sum("vc").alias("v"))
    )
    tot = bv.groupBy("yr").agg(F.sum("v").alias("tv"))
    share = F.col("v").cast("double") / F.col("tv")
    terms = bv.join(F.broadcast(tot), "yr").select(
        "yr",
        "v",
        "tv",
        F.floor(share * share * 10000000000 + F.lit(0.5 + 1e-8)).cast("long").alias("hhi_micro4"),
    )
    return (
        terms.groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_brands"),
            round_det(F.sum("hhi_micro4") / 1000000.0, 4).alias("hhi"),
            F.expr("(max(v) * 1000000L) div max(tv)").alias("top_share_micro"),
        )
        .orderBy("yr")
    )
