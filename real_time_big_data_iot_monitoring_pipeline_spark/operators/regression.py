"""Per-group OLS linear regression + forecast (SURVEY §2.10 M2/M3;
reference ``streamlit_dashboard.py:699-739`` fits sklearn per location).

Spark-first design: the closed form of simple linear regression is pure
aggregation —

    slope     = covar_samp(x, y) / var_samp(x)
    intercept = avg(y) - slope * avg(x)
    r2        = corr(x, y)^2

so the whole "ML" operator is one `groupBy().agg()` — a single shuffle of
group keys, no per-group model fitting, no `applyInPandas`, no driver
loop.  This is the shape that survives 100 TB; an sklearn-per-group path
would move every row through Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_per_group(
    df: DataFrame,
    key: str,
    x: str,
    y: str,
    min_rows: int = 10,
    forecast_dx: float | None = None,
) -> DataFrame:
    """Fit y ~ x per `key`; groups with fewer than `min_rows` observations
    are dropped (reference requires >=10, ``streamlit_dashboard.py:703``).
    If `forecast_dx` is given, also predict y at max(x) + dx (the
    reference's 1-hour-ahead forecast uses dx=3600 seconds)."""
    # try_divide: a zero-variance group yields NULL (DuckDB regr_slope
    # semantics) instead of an ANSI DIVIDE_BY_ZERO error.  r2 uses the
    # covar²/(varx·vary) identity rather than corr(x,y)² because Spark's
    # own `corr` raises DIVIDE_BY_ZERO under ANSI for constant input.
    slope = F.try_divide(F.covar_samp(x, y), F.var_samp(x))
    intercept = F.avg(F.col(y)) - slope * F.avg(F.col(x))
    r2 = F.try_divide(
        F.covar_samp(x, y) * F.covar_samp(x, y), F.var_samp(x) * F.var_samp(y)
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(slope, 8).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ]
    if forecast_dx is not None:
        aggs.append(
            F.round(intercept + slope * (F.max(F.col(x)) + F.lit(forecast_dx)), 4).alias("forecast")
        )
    return df.groupBy(key).agg(*aggs).filter(F.col("n") >= min_rows)


def quality_gate(fits: DataFrame) -> DataFrame:
    """Average R² classified good/moderate/poor (reference
    ``streamlit_dashboard.py:730-739``: >0.7 / >0.3 / else)."""
    return fits.agg(F.round(F.avg("r2"), 6).alias("avg_r2")).select(
        "avg_r2",
        F.when(F.col("avg_r2") > 0.7, "good")
        .when(F.col("avg_r2") > 0.3, "moderate")
        .otherwise("poor")
        .alias("model_quality"),
    )
