"""Streaming + time-window extension catalog: sliding windows, session
windows, a real Structured Streaming run (file source → memory sink), and
approximate aggregates.

The streaming query runs in COMPLETE output mode so every window emits
regardless of watermark — making the result equal to its batch twin and
therefore DuckDB-oracle-checkable: the driver's own harness verifies
batch/stream equivalence.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import avg_fixed
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table
from real_time_big_data_iot_monitoring_pipeline_spark.streaming import pipeline


@register(
    "sliding_window_agg",
    oracle="""
    SELECT event_type,
           CAST(floor(epoch(ts) / 300) * 300 - o.off AS BIGINT) AS window_start,
           count(*) AS cnt,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value
    FROM events, (VALUES (0), (300)) o(off)
    GROUP BY 1, 2
    """,
    tags=("streaming", "T2", "sliding"),
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10-min window, 5-min slide) per event_type — the
    natural extension of the reference's tumbling window (SURVEY §2.9 T2).
    Each row lands in exactly 2 windows; the oracle materializes the same
    assignment with a 2-row offset cross join."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), avg_fixed(F.col("value")).alias("avg_value"))
        .select(
            "event_type",
            F.unix_seconds(F.col("w.start")).alias("window_start"),
            "cnt",
            "avg_value",
        )
    )


@register(
    "session_window_agg",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    y AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS grp
        FROM x
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 1800000000 AS session_end_us,
           count(*) AS cnt,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value
    FROM y GROUP BY user_id, grp
    """,
    tags=("streaming", "T2", "session"),
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — Spark's
    `session_window` primitive; the oracle reproduces the semantics with
    a gaps-and-islands construction (break when gap >= 30 min; session
    end = last event + gap)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), avg_fixed(F.col("value")).alias("avg_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "cnt",
            "avg_value",
        )
    )


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT event_type,
           CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(*) AS reading_count
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "T1", "T2", "T3", "equivalence"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming run, oracle-checked: the events table is
    replayed through a file source in multiple micro-batches (forcing
    incremental state), aggregated with the reference's windowed-agg DAG
    (spark_streaming.py:152-176), and collected from a memory sink in
    complete mode.  Result must equal the batch twin — the driver's
    correctness gate doubles as a batch/stream equivalence proof."""
    e = load_table(spark, sf_dir, "events")
    staging = os.path.join(tempfile.gettempdir(), f"rtbd_stream_{uuid.uuid4().hex}")
    # Stage as several files so maxFilesPerTrigger yields real micro-batches.
    e.repartition(8).write.mode("overwrite").parquet(staging)
    stream = pipeline.file_source(spark, staging, schema=e.schema, max_files_per_trigger=2)
    agg = (
        stream.groupBy("event_type", F.window("ts", "5 minutes").alias("w"))
        .agg(
            avg_fixed(F.col("value")).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("reading_count"),
        )
        .select(
            "event_type",
            F.unix_seconds(F.col("w.start")).alias("window_start"),
            "avg_value",
            "min_value",
            "max_value",
            "reading_count",
        )
    )
    name = f"stream_result_{uuid.uuid4().hex[:8]}"
    pipeline.run_stream_to_memory(agg, name, output_mode="complete")
    # the memory sink holds the rows now; the staging replay dir is done
    shutil.rmtree(staging, ignore_errors=True)
    return spark.table(name)


@register(
    "approx_distinct_users",
    oracle=None,  # HLL sketch estimates are engine-specific by design
    tags=("streaming", "approx", "rows-only"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counts + approximate percentiles per
    event_type — the sketch-based variants used at scales where exact
    countDistinct's full shuffle is unaffordable.  Engine-specific
    estimates, so rows-only check; the unit tests bound the error vs
    exact instead."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
    )
