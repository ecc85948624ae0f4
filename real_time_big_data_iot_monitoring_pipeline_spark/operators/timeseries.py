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

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import avg_fixed, round_det, sum_fixed

US_PER_SEC = 1_000_000


def _dense_bucket_grid(
    df: DataFrame, key_col: str, ts_col: str, val_col: str, bucket_seconds: int
) -> DataFrame:
    """(key, bucket, n_events, avg_value) over each key's dense
    [min, max] bucket span; gap buckets carry n_events NULL / avg NULL."""
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
    return grid.join(per_bucket, [key_col, "bucket"], "left")


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
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _dense_bucket_grid(df, key_col, ts_col, val_col, bucket_seconds).select(
        key_col,
        "bucket",
        (F.col("bucket") * bucket_seconds).alias("bucket_start"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_ff"),
        F.when(F.col("n_events").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    bucket_seconds: int = 3600,
    out_decimals: int = 4,
) -> DataFrame:
    """Per-key fixed-width resample with LINEAR interpolation across
    gaps: a missing bucket gets
    ``prev + (next - prev) * (bucket - prev_bucket) / (next_bucket -
    prev_bucket)`` from the nearest observed buckets on each side —
    pandas `interpolate(method='linear')` semantics, distributed.

    Interior gaps always have both anchors (the grid spans observed
    buckets), so the interpolation denominator is >= 2 on every gap row
    and the expression never divides by zero.  Determinism: the anchors
    are already-rounded fixed-grid doubles, the bucket offsets are small
    exact integers, and the single rounding happens after the one
    interpolation expression — identical IEEE ops in both engines.
    """
    wb = Window.partitionBy(key_col).orderBy("bucket")
    prev_w = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_w = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    anchor_bucket = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("bucket") - F.col("pb")) / (F.col("nb") - F.col("pb"))
    )
    return (
        _dense_bucket_grid(df, key_col, ts_col, val_col, bucket_seconds)
        .select(
            key_col,
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "avg_value",
            F.last("avg_value", ignorenulls=True).over(prev_w).alias("pv"),
            F.last(anchor_bucket, ignorenulls=True).over(prev_w).alias("pb"),
            F.first("avg_value", ignorenulls=True).over(next_w).alias("nv"),
            F.first(anchor_bucket, ignorenulls=True).over(next_w).alias("nb"),
        )
        .select(
            key_col,
            "bucket",
            "n_events",
            "avg_value",
            F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
            .otherwise(round_det(interp, out_decimals))
            .alias("avg_value_interp"),
            F.when(F.col("avg_value").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
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


def seasonal_anomaly_census(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    z: float = 2.0,
) -> DataFrame:
    """Season-relative anomaly census: per (key, hour-of-day) the
    baseline mean/std come from exact integer cents moments, and an
    event is anomalous when |value - mean| > z * std OF ITS OWN SEASON
    — the detector that catches "hot for 3am" readings a global
    IQR/MAD bound (operators/anomaly.py) calls normal.

    Two passes, both scale-flat: one hash agg builds the 24 x #keys
    baseline (exact moments, partitioning-independent), then the
    baseline broadcast-joins back and a second agg counts deviants.
    Hour-of-day via epoch arithmetic — timezone-free on any session.
    Exactness: mean and std derive from integer sums, so both engines
    compare value against bit-identical doubles; no row's verdict can
    flip across engines or partitionings."""
    cents = F.round(F.col(val_col) * 100, 0).cast("long")
    hod = (F.floor(F.unix_seconds(F.col(ts_col)) / 3600) % 24).cast("int")
    base = (
        df.groupBy(F.col(key_col).alias("k"), hod.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s1"),
            # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
            F.sum(cents.cast("decimal(38,0)") * cents.cast("decimal(38,0)")).alias("s2"),
        )
        .withColumn("mean_v", F.col("s1") / (100.0 * F.col("n")))
        .withColumn(
            "std_v",
            F.sqrt(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("s2")
                    - F.col("s1").cast("decimal(38,0)") * F.col("s1").cast("decimal(38,0)")
                )
                / (F.col("n") * (F.col("n") - F.lit(1)).cast("double"))
            )
            / 100.0,
        )
    )
    flagged = df.select(
        F.col(key_col).alias("k"), hod.alias("h"), F.col(val_col).alias("v")
    ).join(F.broadcast(base), ["k", "h"])
    return (
        flagged.groupBy("k", "h")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.abs(F.col("v") - F.col("mean_v")) > z * F.col("std_v"), 1).otherwise(0)
            ).alias("n_anomalies"),
            F.first("mean_v").alias("mean_v"),
            F.first("std_v").alias("std_v"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("h").alias("hour_of_day"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_anomalies").cast("long").alias("n_anomalies"),
            round_det(F.col("mean_v"), 4).alias("baseline_mean"),
            round_det(F.col("std_v"), 4).alias("baseline_std"),
        )
    )


def debounce(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 3600,
) -> DataFrame:
    """Greedy per-key debounce: keep an event iff at least `gap_seconds`
    have passed since the last KEPT event of the same key (first event
    always kept; ties broken by id).  The kept set depends on the chain
    of previous keeps, so this is NOT a window function — it is the
    canonical sequential per-key scan, implemented as `applyInPandas`
    over key groups (Arrow batch per key partition, one pass over the
    sorted group inside the worker).  Shuffle = one exchange on the key;
    state = one timestamp per key; at 100 TB each group streams through
    a worker independently — the same contract as the streaming
    `applyInPandasWithState` operators (`streaming/stateful.py`), here
    in batch form.  Exact integer-microsecond arithmetic keeps the kept
    set bit-deterministic across engines and partitionings."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    gap_us = gap_seconds * US_PER_SEC
    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField(id_col, LongType()),
            StructField("ts_us", LongType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ts_us", id_col], kind="mergesort")
        ts = pdf["_ts_us"].to_numpy()
        keep = []
        last = None
        for i, t in enumerate(ts):
            if last is None or t - last >= gap_us:
                keep.append(i)
                last = t
        out = pdf.iloc[keep]
        return pd.DataFrame(
            {key_col: out[key_col], id_col: out[id_col], "ts_us": out["_ts_us"]}
        )

    prepared = df.select(
        F.col(key_col), F.col(id_col), F.unix_micros(F.col(ts_col)).alias("_ts_us")
    )
    return prepared.groupBy(key_col).applyInPandas(fn, out_schema)
