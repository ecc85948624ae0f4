"""Data-layout management: date-partitioned parquet at rest.

The reference leans on PostgreSQL B-tree indexes for time-range scans
(``init.sql:29-31``).  The Spark-at-rest analogue is directory
partitioning by a time bucket: a predicate on the partition column prunes
whole directories at planning time (`PartitionFilters` in the plan,
zero I/O for excluded days), and row-group min/max statistics prune
within files.  At 100 TB this layout decision dominates every time-range
query's cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "timestamp",
    mode: str = "overwrite",
) -> None:
    """Write with an `event_date` partition column derived from event
    time — the UTC calendar date of the instant (`utc_naive`), so the
    layout is identical no matter the session timezone of the writer.
    `partitionOverwriteMode=dynamic` keeps re-writes idempotent per
    partition (only touched dates are replaced)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import utc_naive

    (
        df.withColumn("event_date", F.to_date(utc_naive(F.col(ts_col))))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_date_range(
    spark: SparkSession,
    path: str,
    start_date: str,
    end_date: str,
) -> DataFrame:
    """Read back with a partition-column predicate — prunes directories
    at planning time (visible as PartitionFilters in explain)."""
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("event_date") >= F.lit(start_date)) & (F.col("event_date") < F.lit(end_date))
    )
