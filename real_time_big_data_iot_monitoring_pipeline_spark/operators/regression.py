"""Per-group OLS linear regression + forecast (SURVEY §2.10 M2/M3;
reference ``streamlit_dashboard.py:699-739`` fits sklearn per location).

Spark-first design: the closed form of simple linear regression is pure
aggregation —

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = avg(y) − slope · avg(x)
    r2        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

so the whole "ML" operator is one `groupBy().agg()` — a single shuffle of
group keys, no per-group model fitting, no `applyInPandas`, no driver
loop.  This is the shape that survives 100 TB; an sklearn-per-group path
would move every row through Python.

`fit_per_group_exact` is the catalog path: it takes exact-integer inputs
(x in epoch-microseconds, y fixed-decimal) and accumulates the six
moments in DECIMAL(38,0) — every sum is exact, so the result is
bit-identical regardless of partitioning or summation order, and the
DuckDB oracle (HUGEINT moments, same final IEEE op sequence) matches
hash-for-hash.  x·x at microsecond magnitudes (~2.6e12 µs over a month)
overflows int64 per-row, hence decimal rather than the long-sum trick
`corr_int` uses for cents.  `fit_per_group` remains as the generic
float-x operator for ad-hoc use (dashboard facade, tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    round_det,
)

_DEC = "decimal(38,0)"


def fit_per_group_exact(
    df: DataFrame,
    key: str,
    x_us: str,
    y: str,
    min_rows: int = 10,
    forecast_dx: float | None = None,
    y_decimals: int = 2,
) -> DataFrame:
    """Fit y ~ x per `key` from exact integer moments.

    `x_us` must be an exact integer column in MICROSECONDS (e.g. elapsed
    µs since the group's first observation); `y` a fixed-decimal double
    with `y_decimals` places.  Slope is reported in y-units per SECOND,
    matching the reference's seconds-based feature
    (``streamlit_dashboard.py:708``); groups with fewer than `min_rows`
    observations are dropped (``:703`` requires >=10).  `forecast_dx`
    (seconds) adds the reference's 1-hour-ahead prediction.

    try_divide: a zero-variance group yields NULL (DuckDB semantics)
    instead of an ANSI DIVIDE_BY_ZERO error.
    """
    yscale = 10**y_decimals
    xd = F.col(x_us).cast(_DEC)
    yd = as_cents(F.col(y), y_decimals).cast(_DEC)
    g = (
        df.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(yd).alias("sy"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(xd * yd).alias("sxy"),
            F.sum(yd * yd).alias("syy"),
            F.max(F.col(x_us)).alias("max_x_us"),
        )
        .filter(F.col("n") >= min_rows)
    )
    nd = F.col("n").cast(_DEC)
    # Exact integers until this cast; from here every operand is a
    # correctly-rounded double and the op sequence mirrors the oracle SQL.
    dnum = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dden = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ddeny = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = F.try_divide(dnum, dden) * F.lit(1e6 / yscale)  # y-units per second
    avg_y = F.col("sy").cast("double") / (F.lit(float(yscale)) * F.col("n"))
    avg_x_s = F.col("sx").cast("double") / (F.lit(1e6) * F.col("n"))
    intercept = avg_y - slope * avg_x_s
    r2 = F.try_divide(dnum * dnum, dden * ddeny)
    cols = [
        F.col(key),
        F.col("n"),
        round_det(slope, 8).alias("slope"),
        round_det(intercept, 6).alias("intercept"),
        round_det(r2, 6).alias("r2"),
    ]
    if forecast_dx is not None:
        forecast = intercept + slope * (
            F.col("max_x_us").cast("double") / F.lit(1e6) + F.lit(forecast_dx)
        )
        cols.append(round_det(forecast, 4).alias("forecast"))
    return g.select(*cols)


def fit_per_group_exact_sql(
    table_expr: str,
    key: str,
    ts: str,
    y: str,
    min_rows: int = 10,
    forecast_dx: float | None = None,
    y_decimals: int = 2,
) -> str:
    """DuckDB twin of `fit_per_group_exact`: HUGEINT moments (exact, like
    Spark's DECIMAL(38,0)), then the identical double op sequence."""
    yscale = 10**y_decimals
    mult = f"{10 ** 6 // yscale}.0" if 10**6 % yscale == 0 else f"(1000000.0 / {yscale})"
    slope = f"dnum / dden * {mult}"
    avg_y = f"dsy / ({yscale}.0 * n)"
    avg_x = f"(dsx / (1000000.0 * n))"
    intercept = f"{avg_y} - {slope} * {avg_x}"
    cols = [
        f"{key}",
        "n",
        f"ROUND(({slope}) + 1e-8, 8) AS slope",
        f"ROUND(({intercept}) + 1e-8, 6) AS intercept",
        "ROUND((dnum * dnum / (dden * ddeny)) + 1e-8, 6) AS r2",
    ]
    if forecast_dx is not None:
        cols.append(
            f"ROUND(({intercept} + ({slope}) * (dmaxx / 1000000.0 + {forecast_dx})) + 1e-8, 4)"
            " AS forecast"
        )
    select = ",\n           ".join(cols)
    return f"""
    WITH f AS (
        SELECT {key},
               CAST(round({y} * {yscale}, 0) AS BIGINT) AS yc,
               epoch_us({ts}) - min(epoch_us({ts})) OVER (PARTITION BY {key}) AS xus
        FROM {table_expr}
    ), m AS (
        SELECT {key}, count(*) AS n,
               sum(CAST(xus AS HUGEINT)) AS sx,
               sum(CAST(yc AS HUGEINT)) AS sy,
               sum(CAST(xus AS HUGEINT) * CAST(xus AS HUGEINT)) AS sxx,
               sum(CAST(xus AS HUGEINT) * CAST(yc AS HUGEINT)) AS sxy,
               sum(CAST(yc AS HUGEINT) * CAST(yc AS HUGEINT)) AS syy,
               max(xus) AS maxx
        FROM f GROUP BY {key} HAVING count(*) >= {min_rows}
    ), d AS (
        SELECT {key}, n,
               CAST(n * sxy - sx * sy AS DOUBLE) AS dnum,
               CAST(n * sxx - sx * sx AS DOUBLE) AS dden,
               CAST(n * syy - sy * sy AS DOUBLE) AS ddeny,
               CAST(sx AS DOUBLE) AS dsx,
               CAST(sy AS DOUBLE) AS dsy,
               CAST(maxx AS DOUBLE) AS dmaxx
        FROM m
    )
    SELECT {select}
    FROM d
    """


def fit_per_group(
    df: DataFrame,
    key: str,
    x: str,
    y: str,
    min_rows: int = 10,
    forecast_dx: float | None = None,
) -> DataFrame:
    """Generic float-x variant (ad-hoc / dashboard use; the catalog path
    is `fit_per_group_exact`).  round_det keeps .5-grid rounding
    deterministic even though the float sums themselves are
    summation-order-dependent."""
    slope = F.try_divide(F.covar_samp(x, y), F.var_samp(x))
    intercept = F.avg(F.col(y)) - slope * F.avg(F.col(x))
    r2 = F.try_divide(
        F.covar_samp(x, y) * F.covar_samp(x, y), F.var_samp(x) * F.var_samp(y)
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        round_det(slope, 8).alias("slope"),
        round_det(intercept, 6).alias("intercept"),
        round_det(r2, 6).alias("r2"),
    ]
    if forecast_dx is not None:
        aggs.append(
            round_det(intercept + slope * (F.max(F.col(x)) + F.lit(forecast_dx)), 4).alias(
                "forecast"
            )
        )
    return df.groupBy(key).agg(*aggs).filter(F.col("n") >= min_rows)


def quality_gate(fits: DataFrame) -> DataFrame:
    """Average R² classified good/moderate/poor (reference
    ``streamlit_dashboard.py:730-739``: >0.7 / >0.3 / else).

    The incoming r2 values sit on a 1e-6 grid (rounded upstream), so
    summing their exact 1e6-scaled integer representation makes avg_r2
    independent of summation order; count(r2) skips NULL-r2
    (zero-variance) groups exactly as the oracle's aggregate does."""
    r2c = F.round(F.col("r2") * 1000000, 0).cast("long")
    return fits.agg(
        round_det(
            F.try_divide(F.sum(r2c), F.lit(1e6) * F.count(F.col("r2"))), 6
        ).alias("avg_r2")
    ).select(
        "avg_r2",
        F.when(F.col("avg_r2") > 0.7, "good")
        .when(F.col("avg_r2") > 0.3, "moderate")
        .otherwise("poor")
        .alias("model_quality"),
    )
