"""Skew-resilience catalog queries: the salted two-stage aggregation and
the salted replicated join, registered with their (identical-result)
direct oracles so the driver value-hash-checks them (round-2 verdict,
"Next round" #8).

At 100 TB a hot group key (one dominant event type) or a hot join key
turns the reduce side into a single straggler task; the salted plans
spread that key over `salt_buckets` tasks at the cost of one extra
cheap merge shuffle / a `salt_buckets`x dim replication.  The RESULT is
identical to the direct plan — which is exactly what makes these
oracle-checkable: DuckDB runs the direct aggregation/join and the
driver asserts the salted Spark plan matches cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import as_cents, round_det, sum_product_exact
from real_time_big_data_iot_monitoring_pipeline_spark.operators.skew import (
    salted_join,
    salted_value_stats,
)
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


@register(
    "salted_type_stats",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(*))) + 1e-8, 4) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
    tags=("skew", "aggregation", "salted"),
)
def salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the (low-cardinality, hence
    hot-keyed) event_type column: stage 1 aggregates on (event_type,
    salt) so each hot key spreads over 16 tasks, stage 2 merges the
    algebraic partials.  Identical result to `group_type_stats`'s direct
    aggregation — the oracle runs the direct SQL."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    return salted_value_stats(e, ["event_type"], "value", salt_buckets=16)


@register(
    "salted_join_brand_revenue",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_items,
           ROUND(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 + 1e-8, 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("skew", "join", "salted"),
)
def salted_join_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof fact-dim join: lineitem's part key is salted per-row
    and the (small) part dim is replicated across the 16 salt buckets,
    so a hot part key spreads over 16 reduce tasks instead of one
    straggler.  Revenue per brand on exact cents; the oracle runs the
    direct (unsalted) join — results are identical by construction."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, p, "p_partkey", salt_buckets=16)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        round_det(
            sum_product_exact(
                as_cents(F.col("l_extendedprice")) * (100 - as_cents(F.col("l_discount")))
            )
            / 10000.0,
            2,
        ).alias("revenue"),
    )
