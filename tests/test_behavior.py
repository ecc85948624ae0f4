"""Behavioral-analytics unit tests (round 5): hand-computed references
for the funnel's strict ordering, the cohort month math, the FK audit's
anti-join counts, and the domain-cap draw — small enough for a human to
audit, complementing the full-catalog oracle-parity suite."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators.sampling import KNUTH, MOD, cap_per_group
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import REGISTRY


def _write_events(spark, tmp, rows):
    """rows: (event_id, user_id, event_type, sec).  Writes an events
    parquet a query builder can load, padding the unused columns."""
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "sec"]).select(
        "event_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))


def test_funnel_requires_strict_order(spark, tmp_path):
    tmp = str(tmp_path)
    rows = [
        # user 1: full funnel in order -> counts at every stage
        (1, 1, "view", 100),
        (2, 1, "click", 200),
        (3, 1, "purchase", 300),
        # user 2: clicked BEFORE first view -> stalls at stage 1
        (4, 2, "click", 50),
        (5, 2, "view", 60),
        # user 3: view then purchase but never clicked -> stage 1 only
        (6, 3, "view", 10),
        (7, 3, "purchase", 20),
        # user 4: click at the SAME instant as view (not strictly after)
        (8, 4, "view", 500),
        (9, 4, "click", 500),
    ]
    _write_events(spark, tmp, rows)
    out = {r.stage: r for r in REGISTRY["funnel_conversion"].build(spark, tmp).collect()}
    assert out[1].n_users == 4
    assert out[2].n_users == 1  # only user 1
    assert out[3].n_users == 1
    assert out[1].step_conversion == 1.0
    assert out[2].step_conversion == 0.25


def test_cohort_retention_month_arithmetic(spark, tmp_path):
    tmp = str(tmp_path)
    rows = [
        # cust 1: first order 1995-01, returns 1995-03 (offset 2)
        (1, 1, "1995-01-15"),
        (2, 1, "1995-03-02"),
        # cust 2: same cohort, never returns
        (3, 2, "1995-01-20"),
        # cust 3: cohort 1995-12, returns 1996-01 (offset 1, year wrap)
        (4, 3, "1995-12-31"),
        (5, 3, "1996-01-01"),
        # cust 4: cohort 1995-01, returns past the 12-month horizon
        (6, 4, "1995-01-05"),
        (7, 4, "1996-03-05"),
    ]
    df = spark.createDataFrame(rows, ["o_orderkey", "o_custkey", "d"]).select(
        "o_orderkey", "o_custkey", F.to_timestamp("d").alias("o_orderdate")
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
    out = {
        (r.cohort_ym, r.offset_months): r
        for r in REGISTRY["cohort_retention"].build(spark, tmp).collect()
    }
    assert out[(199501, 0)].n_active == 3
    assert out[(199501, 2)].n_active == 1
    assert abs(out[(199501, 2)].retention - round(1 / 3, 6)) < 1e-6
    assert out[(199512, 1)].n_active == 1  # year-wrap offset
    assert (199501, 14) not in out  # beyond the 12-month horizon


def test_cap_per_group_semantics(spark):
    rows = [(i, "big" if i < 40 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = cap_per_group(df, "source", id_col="doc_id", cap=10).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["big"]) == 10  # capped
    assert len(by_src["small"]) == 10  # at the cap exactly
    # the kept set is the hash-rank prefix, independent of partitioning
    expected_big = sorted(range(40), key=lambda i: ((i * KNUTH) % MOD, i))[:10]
    assert sorted(r.doc_id for r in by_src["big"]) == sorted(expected_big)
    out2 = cap_per_group(df.repartition(7), "source", id_col="doc_id", cap=10).collect()
    assert sorted((r.doc_id, r.keep_rank) for r in out2) == sorted(
        (r.doc_id, r.keep_rank) for r in out
    )


def test_fk_orphan_audit_counts(spark, sf_dir, oracle):
    out = {r.fk_edge: r for r in REGISTRY["fk_orphan_audit"].build(spark, sf_dir).collect()}
    # TPC-H referential integrity holds: no orphans on any edge
    for edge in ("lineitem->orders", "orders->customer", "lineitem->part"):
        assert out[edge].n_orphan == 0
    # but childless parents exist (customers with no orders is a TPC-H fact)
    n_childless = oracle.execute(
        "SELECT count(*) FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ).fetchone()[0]
    assert out["orders->customer"].n_childless_parent == n_childless
    n_li = oracle.execute("SELECT count(*) FROM lineitem").fetchone()[0]
    assert out["lineitem->orders"].n_child == n_li


def test_debounce_greedy_chain(spark):
    from pyspark.sql import functions as F

    from real_time_big_data_iot_monitoring_pipeline_spark.operators.timeseries import debounce

    # user 1: events at 0s, 30m, 60m, 90m with 1h gap -> keep 0s and 60m
    # (the 30m drop must NOT reset the clock: greedy chains off KEPT
    # events only); 90m is only 30m after the kept 60m -> dropped.
    # user 2: tie at the same instant -> smaller event_id wins;
    # an event at EXACTLY the gap boundary is kept (>=).
    rows = [
        (1, 1, 0),
        (2, 1, 1800),
        (3, 1, 3600),
        (4, 1, 5400),
        (10, 2, 100),
        (11, 2, 100),
        (12, 2, 100 + 3600),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "sec"]).select(
        "event_id", "user_id", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    kept = sorted(
        (r.user_id, r.event_id) for r in debounce(df, gap_seconds=3600).collect()
    )
    assert kept == [(1, 1), (1, 3), (2, 10), (2, 12)]
