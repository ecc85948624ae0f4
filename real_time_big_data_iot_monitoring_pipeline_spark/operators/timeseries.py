"""Time-series resampling and sessionization operators.

The reference is an IoT monitoring pipeline; its dashboard assumes a
dense, regularly-sampled feed (streamlit_dashboard.py:676-696 charts
straight over the raw readings).  Real fleets drop samples, so a
scale-ready engine needs the two canonical repairs:

* `resample_gap_fill` — fixed-width bucket rollup over a per-key dense
  bucket grid, missing buckets forward-filled with the last observed
  aggregate (pandas `resample().ffill()` semantics, distributed).
* `sessionize` — gap-based session assignment (a new session starts when
  the inter-event gap exceeds a threshold), the batch twin of
  `F.session_window` with explicit session ids.

Both are pure DataFrame pipelines: one hash-agg shuffle on (key, bucket)
for the resample, one window shuffle on the key for sessionize.  The
bucket grid is generated per KEY from that key's min/max bucket
(`sequence` + `explode`), so grid size is O(keys * buckets), independent
of the event row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import avg_fixed, sum_fixed

US_PER_SEC = 1_000_000


def resample_gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-key fixed-width resample with forward fill.

    Output: one row per (key, bucket) over the key's own [min, max]
    bucket span — `n_events` (0 on gaps), `avg_value` (NULL on gaps),
    `avg_value_ff` (last non-gap average carried forward), `is_gap`.

    Determinism: buckets are integer epoch quotients; the average is the
    cents-exact `avg_fixed`; the forward fill is a pure carry of already
    rounded values ordered by the unique (key, bucket).  The first bucket
    of every key has data by construction (the grid starts at the key's
    min observed bucket), so the fill never emits NULL.
    """
    bucket_us = bucket_seconds * US_PER_SEC
    # exact integer division (epochs are positive, DIV == floor) — the
    # oracle's `epoch_us(ts) // N`; a double divide + cast would also work
    # at current magnitudes but DIV needs no precision argument at all
    bucket = F.expr(f"unix_micros({ts_col}) DIV {bucket_us}")
    per_bucket = (
        df.groupBy(F.col(key_col), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            avg_fixed(F.col(val_col)).alias("avg_value"),
        )
    )
    # Dense grid per key: sequence(min..max) explodes to one row per
    # bucket — O(keys * span), never touches the event rows again.
    grid = (
        per_bucket.groupBy(key_col)
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(key_col, F.explode(F.sequence("b0", "b1")).alias("bucket"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            (F.col("bucket") * bucket_seconds).alias("bucket_start"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "avg_value",
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_ff"),
            F.when(F.col("n_events").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    gap_seconds: int = 3600,
) -> DataFrame:
    """Gap-based sessions per key: a session breaks when the gap to the
    previous event exceeds `gap_seconds`.  Session ids are per-key
    ordinals (1-based, by start time) — the classic lag → flag → running
    sum construction, all window functions over one shuffle on the key.

    Output per (key, session_id): start/end (epoch micros), n_events,
    sum_value (cents-exact), duration_us.

    Determinism: the window orders by (ts, id) — the unique-tie-break
    contract — and all emitted quantities are integers except the
    cents-exact sum.
    """
    gap_us = gap_seconds * US_PER_SEC
    w_ord = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    tus = F.unix_micros(F.col(ts_col))
    prev = F.lag(tus).over(w_ord)
    is_new = F.when(prev.isNull() | ((tus - prev) > gap_us), F.lit(1)).otherwise(F.lit(0))
    with_sid = df.select(
        F.col(key_col),
        F.col(id_col),
        tus.alias("tus"),
        F.col(val_col),
        F.sum(is_new).over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias(
            "session_id"
        ),
    )
    return (
        with_sid.groupBy(key_col, "session_id")
        .agg(
            F.min("tus").alias("session_start_us"),
            F.max("tus").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            sum_fixed(F.col(val_col)).alias("sum_value"),
        )
        .withColumn("duration_us", F.col("session_end_us") - F.col("session_start_us"))
    )
