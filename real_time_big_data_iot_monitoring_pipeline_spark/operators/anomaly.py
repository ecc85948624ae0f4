"""IQR anomaly detection (SURVEY §2.10 M1; reference
``streamlit_dashboard.py:185-207``).

The reference computes quantile bounds in pandas over a materialized
frame.  Our shape is two declarative passes joined by a 1-row broadcast —
the bounds never touch the driver, so the operator is identical at 60k
rows and at 100 TB:

    bounds = df.agg(percentile(...))          -- 1-row DataFrame
    flagged = df.crossJoin(broadcast(bounds)) -- map-side, no shuffle
                 .withColumn(flag, x < lo | x > hi)

Exact `percentile` (interpolated, matching DuckDB `percentile_cont` and
pandas `quantile`) is used so the oracle hash-matches; swap in
`percentile_approx` at scales where exactness stops mattering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def iqr_bounds(df: DataFrame, cols: Sequence[str], k: float = 1.5) -> DataFrame:
    """One-row frame of (lower, upper) IQR fences per metric.

    Both quantiles of a metric come from ONE `percentile(c, array(.25,
    .75))` aggregate: the exact-percentile buffer holds every value of
    the column, so asking for q1 and q3 separately doubled the
    aggregation state and the merge work per metric (2 buffers per
    column -> 1; round-12 optimization — same interpolation, bit-equal
    results)."""
    aggs = []
    for c in cols:
        qs = F.expr(f"percentile({c}, array(0.25, 0.75))")
        q1 = F.element_at(qs, 1)
        q3 = F.element_at(qs, 2)
        iqr = q3 - q1
        aggs.append((q1 - F.lit(k) * iqr).alias(f"{c}_lower"))
        aggs.append((q3 + F.lit(k) * iqr).alias(f"{c}_upper"))
    return df.agg(*aggs)


def flag_anomalies(df: DataFrame, cols: Sequence[str], k: float = 1.5) -> DataFrame:
    """Row-level anomaly flags per metric plus the OR-combined row flag
    (reference ``streamlit_dashboard.py:203-205``)."""
    out = df.crossJoin(F.broadcast(iqr_bounds(df, cols, k)))
    row_flag = F.lit(False)
    for c in cols:
        flag = (F.col(c) < F.col(f"{c}_lower")) | (F.col(c) > F.col(f"{c}_upper"))
        out = out.withColumn(f"{c}_anomaly", flag)
        row_flag = row_flag | F.col(f"{c}_anomaly")
    return out.withColumn("is_anomaly", row_flag)


def anomalies(df: DataFrame, cols: Sequence[str], k: float = 1.5) -> DataFrame:
    """Only the anomalous rows, with the fences attached for context."""
    return flag_anomalies(df, cols, k).filter(F.col("is_anomaly"))
