"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query on sf0.001; `queries()` exposes the
full catalog (one entry per implemented operator from SURVEY.md §2 plus
the north-star extensions); `oracle_sql()` gives the DuckDB twin for every
SQL-expressible query (rows-only ops — LSH/sketch families — omit it).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY, ordered_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (5-min tumbling-window rollup per sensor — the
    reference's core aggregation, spark_streaming.py:152-176) on the
    sf0.001 fixtures."""
    return REGISTRY["flagship_window_agg"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Iteration order is the driver-checked order: plans.DRIVER_WINDOW
    # (the 50 queries that get value-hash rows this round) first.
    return {name: q.build for name, q in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in ordered_registry().items() if q.oracle is not None}
