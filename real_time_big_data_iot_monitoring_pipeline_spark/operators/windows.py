"""Analytic window-function operators (SURVEY §2.5-2.6).

Every window here partitions by a group key before ordering — a global
`Window.orderBy` with no partition collapses to a single task and is a
100 TB anti-pattern, so the engine never emits one.  Ties are always
broken by a unique id so results are deterministic across engines
(SURVEY §7 risk 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import as_cents, round_det


def _win(partition: str, order: list[str]):
    return Window.partitionBy(partition).orderBy(*[F.col(c) for c in order])


def rolling_avg(
    df: DataFrame,
    partition: str,
    order: list[str],
    col: str,
    frame: int = 20,
    out: str = "rolling_avg",
) -> DataFrame:
    """20-row trailing moving average (reference
    ``streamlit_dashboard.py:676-677`` `rolling(20, min_periods=1)`): the
    leading shrinking frame of ROWS BETWEEN N-1 PRECEDING AND CURRENT ROW
    reproduces pandas `min_periods=1` exactly.  The mean is computed over
    the exact integer (cents) representation so the result is independent
    of the engine's frame-summation strategy."""
    w = _win(partition, order).rowsBetween(-(frame - 1), 0)
    mean = F.sum(as_cents(F.col(col))).over(w) / (F.lit(100.0) * F.count(col).over(w))
    return df.withColumn(out, round_det(mean, 4))


def lag_diff(df: DataFrame, partition: str, order: list[str], col: str, out: str = "diff") -> DataFrame:
    """First difference (reference ``streamlit_dashboard.py:689`` `.diff()`)."""
    w = _win(partition, order)
    return df.withColumn(out, round_det(F.col(col) - F.lag(col, 1).over(w), 4))


def topn_per_group(df: DataFrame, partition: str, order_desc: list[str], n: int) -> DataFrame:
    """Latest-N rows per group (reference tail-N `.iloc[-20:]`,
    ``streamlit_dashboard.py:689``). row_number + filter: Spark pushes the
    rank limit into the sort within each partition."""
    w = Window.partitionBy(partition).orderBy(*[F.col(c).desc() for c in order_desc])
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)


def last_per_group(df: DataFrame, key: str, value: str, order: str) -> DataFrame:
    """Last value per group (reference current-temperature read,
    ``streamlit_dashboard.py:719`` `.iloc[-1]`): `max_by` — a single hash
    aggregation, cheaper than sort+row_number at scale."""
    return df.groupBy(key).agg(F.expr(f"max_by({value}, {order})").alias(f"last_{value}"))


def elapsed_seconds(df: DataFrame, partition: str, ts_col: str, out: str = "elapsed_s") -> DataFrame:
    """Seconds since the group's first observation (regression feature,
    reference ``streamlit_dashboard.py:708``)."""
    w = Window.partitionBy(partition)
    e = F.unix_micros(F.col(ts_col))
    return df.withColumn(out, ((e - F.min(e).over(w)) / F.lit(1000000.0)))


def elapsed_micros(df: DataFrame, partition: str, ts_col: str, out: str = "x_us") -> DataFrame:
    """Exact-integer twin of `elapsed_seconds`: microseconds since the
    group's first observation, kept as a long so downstream moment sums
    (`regression.fit_per_group_exact`) stay exact."""
    w = Window.partitionBy(partition)
    e = F.unix_micros(F.col(ts_col))
    return df.withColumn(out, e - F.min(e).over(w))


def rolling_median(
    df: DataFrame,
    partition: str,
    order: list[str],
    col: str,
    frame: int = 5,
    out: str = "rolling_median",
) -> DataFrame:
    """Trailing rolling MEDIAN — the outlier-robust smoother a noisy
    sensor feed needs where the rolling mean chases spikes.  Exact
    interpolated percentile over the trailing frame (both engines use
    linear interpolation, and `grouped_percentiles` already proves the
    formulas agree); partitioned by series, ties broken on the unique
    order key."""
    w = _win(partition, order).rowsBetween(-(frame - 1), 0)
    return df.withColumn(out, round_det(F.expr(f"percentile({col}, 0.5)").over(w), 4))
