"""Batch table loaders over the driver's parquet fixtures.

Columnar parquet replaces the reference's row-oriented PostgreSQL storage
(``init.sql:2-26``): filters and column projections push into the scan
(Catalyst `PushedFilters` / `ReadSchema`), which at 100 TB is the moral
equivalent of the reference's B-tree range scans (``init.sql:29-31``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing types.

    `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong`` it
    arrives as a LongType nano count.  We convert via integer division to
    microseconds — the same truncation DuckDB applies when it narrows
    TIMESTAMP_NS to its native microsecond TIMESTAMP, so the oracle and the
    engine see identical instants.  (`timestamp_micros` interprets the long
    as a UTC instant: no session-timezone dependence.)
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def events_with_raw_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with BOTH the converted `ts` (timestamp) and the raw `ts_ns`
    (parquet-native long).  Predicates written against `ts_ns` are plain
    column comparisons, so they push into the parquet scan (row-group
    min/max skipping) — a filter on the derived `ts` cannot, because
    Catalyst will not invert `timestamp_micros(ts DIV 1000)`.  At 100 TB
    that pushdown is the difference between scanning a day and scanning
    the table.  Epoch-second bound `t` converts as: ts_ns >= t * 1e9;
    for inclusive upper bounds mirror the oracle's microsecond truncation
    with ts_ns < (t * 1e6 + 1) * 1e3."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        return df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
        )
    # non-nano fixture: synthesize ts_ns from the timestamp
    return df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * 1000)
