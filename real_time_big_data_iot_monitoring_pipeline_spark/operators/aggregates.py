"""Aggregation operators (SURVEY §2.4).

All are single-pass hash aggregations: Spark plans them as partial
(map-side) + final aggregation automatically, so each shuffles only the
distinct group keys — the property that lets the 5-minute rollup survive a
100 TB scan.  Nothing here collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    avg_fixed,
    round_det,
)


def windowed_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("user_id",),
    value_col: str = "value",
    window: str = "5 minutes",
    slide: str | None = None,
) -> DataFrame:
    """The engine's flagship operator: tumbling (or sliding) time-window
    rollup per key — avg/min/max/count, window struct flattened to epoch
    seconds.

    Batch twin of the reference's core streaming aggregation
    (``spark_streaming.py:152-176``); the streaming variant adds a
    watermark (streaming/pipeline.py) but shares this exact shape.
    """
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        df.groupBy(*[F.col(k) for k in keys], win.alias("w"))
        .agg(
            avg_fixed(F.col(value_col)).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.count(F.lit(1)).alias("reading_count"),
        )
        .select(
            *keys,
            F.unix_seconds(F.col("w.start")).alias("window_start"),
            F.unix_seconds(F.col("w.end")).alias("window_end"),
            "avg_value",
            "min_value",
            "max_value",
            "reading_count",
        )
    )


def describe_stats(df: DataFrame, col: str) -> DataFrame:
    """pandas ``describe()`` block + derived stats (reference
    ``streamlit_dashboard.py:632-637``): count, mean, sample std (ddof=1,
    matching pandas), min, q1/median/q3 (exact interpolated percentile —
    NOT approx, so the oracle hash-matches), max, coefficient of
    variation, range."""
    c = F.col(col)
    cc = as_cents(c)
    ccd = cc.cast("decimal(38,0)")  # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
    n = F.count(c).cast("double")
    sx = F.sum(cc).cast("double")
    sxx = F.sum(ccd * ccd).cast("double")
    mean_u = sx / (F.lit(100.0) * F.count(c))
    # try_divide on every 0-able denominator: ANSI mode raises on x/0,
    # while the DuckDB oracle yields NULL — try_divide matches the oracle.
    std_u = F.sqrt(F.try_divide(sxx - sx * sx / n, n - F.lit(1.0))) / F.lit(100.0)
    return df.agg(
        F.count(c).alias("n"),
        round_det(mean_u, 4).alias("mean_v"),
        round_det(std_u, 4).alias("std_v"),
        F.min(c).alias("min_v"),
        # one percentile buffer for all three quartiles (the exact
        # percentile aggregate holds every value of the column, so
        # separate q1/median/q3 calls tripled the aggregation state —
        # round-12 optimization; same interpolation, bit-equal)
        round_det(F.element_at(F.expr(f"percentile({col}, array(0.25, 0.5, 0.75))"), 1), 4).alias("q1"),
        round_det(F.element_at(F.expr(f"percentile({col}, array(0.25, 0.5, 0.75))"), 2), 4).alias("median_v"),
        round_det(F.element_at(F.expr(f"percentile({col}, array(0.25, 0.5, 0.75))"), 3), 4).alias("q3"),
        F.max(c).alias("max_v"),
        round_det(F.try_divide(std_u, mean_u) * 100, 4).alias("cv_pct"),
        round_det(F.max(c) - F.min(c), 4).alias("range_v"),
    )


def corr_pairs(df: DataFrame, cols: Sequence[tuple[str, Column]]) -> DataFrame:
    """Pearson correlation for every unordered pair of the given metric
    expressions (reference 3x3 corr matrix, ``streamlit_dashboard.py:657``).
    One aggregation pass computes all pairs; output is the strict upper
    triangle as rows (m1, m2, corr_v)."""
    named = [(name, expr.alias(name)) for name, expr in cols]
    projected = df.select(*[e for _, e in named])
    aggs = []
    pairs = []
    for i in range(len(named)):
        for j in range(i + 1, len(named)):
            a, b = named[i][0], named[j][0]
            pairs.append((a, b))
            # covar/sqrt(var*var) instead of corr(): Spark's corr raises
            # DIVIDE_BY_ZERO under ANSI when either column is constant.
            corr_expr = F.try_divide(
                F.covar_samp(F.col(a), F.col(b)),
                F.sqrt(F.var_samp(F.col(a)) * F.var_samp(F.col(b))),
            )
            aggs.append(round_det(corr_expr, 4).alias(f"corr_{a}_{b}"))
    wide = projected.agg(*aggs)
    # unpivot the single wide row into (m1, m2, corr_v) rows
    stack_expr = ", ".join(f"'{a}', '{b}', corr_{a}_{b}" for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_expr}) as (m1, m2, corr_v)"
    )


def histogram(df: DataFrame, col: str, nbins: int = 30) -> DataFrame:
    """Fixed-width histogram (reference ``streamlit_dashboard.py:648-649``):
    two aggregation passes (global min/max, then bucketed count) — never a
    driver-side collect.  The 1-row bounds frame is broadcast into the
    binning stage, so the big side streams through untouched.
    The top edge folds into the last bin, matching numpy/plotly."""
    bounds = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
    binned = df.join(F.broadcast(bounds)).select(
        F.least(
            F.floor(F.try_divide(F.col(col) - F.col("lo"), (F.col("hi") - F.col("lo")) / nbins)),
            F.lit(nbins - 1),
        )
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))


def grouping_rollup(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """ROLLUP grouping-sets aggregation — subtotal + grand-total rows in one
    shuffle (Spark expands grouping sets map-side; no extra pass per level)."""
    return (
        df.rollup(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"), avg_fixed(F.col(value_col)).alias("avg_value"))
    )


def grouping_cube(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """CUBE grouping-sets aggregation: all 2^k key subsets in one shuffle
    (Spark expands the sets map-side, same as rollup).  `gid` is
    `grouping_id()` — it disambiguates a genuine NULL key value from the
    "aggregated over this key" NULL, which makes the output joinable and
    the oracle comparison exact."""
    return (
        df.cube(*keys)
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            avg_fixed(F.col(value_col)).alias("avg_value"),
        )
    )


def histogram_equidepth(df: DataFrame, col: str, nbins: int = 10) -> DataFrame:
    """Equi-DEPTH histogram: bucket edges are the (i/nbins)-quantiles, so
    every bucket holds ~the same row count — the shape that stays useful
    when the distribution is skewed (a fixed-width histogram collapses
    into one hot bar).  Same two-pass plan as the fixed-width variant:
    one exact-percentile aggregation produces the nbins-1 interior
    cutpoints as a broadcast 1-row frame; the scan then bins each row by
    counting cutpoints below it (values equal to a cutpoint fall in the
    lower bucket).  The cutpoint doubles are bit-identical cross-engine
    (same linear interpolation — `grouped_percentiles` proves it), so
    bucket membership is exact."""
    qs = [(i + 1) / nbins for i in range(nbins - 1)]
    # ONE exact-percentile buffer for all nbins-1 cutpoints (round-13,
    # guide §5 — the round-12 iqr_bounds consolidation applied here):
    # nbins-1 scalar percentile() calls each hold EVERY value of the
    # column in their own aggregation buffer; the array form computes the
    # identical interpolated cutpoints from a single buffer.
    q_arr = ", ".join(str(q) for q in qs)
    cut_arr = F.expr(f"percentile({col}, array({q_arr}))")
    cuts = df.agg(
        *[F.element_at(cut_arr, i + 1).alias(f"_c{i}") for i in range(len(qs))]
    )
    bin_expr = sum(
        F.when(F.col(col) > F.col(f"_c{i}"), 1).otherwise(0) for i in range(nbins - 1)
    )
    binned = df.join(F.broadcast(cuts)).select(
        bin_expr.cast("long").alias("bin"), F.col(col)
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(col).alias("lo_v"),
        F.max(col).alias("hi_v"),
    )
