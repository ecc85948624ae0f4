"""Reference-parity catalog: the operator inventory of SURVEY.md §2
(reference dashboard/stream analytics) re-expressed over the `events`
fixture (FIXTURES.md maps events ↔ sensor_readings: user_id=sensor_id,
event_type=location, ts=timestamp, value=temperature, props.k=humidity).

Determinism contract for every query here: timestamps emitted as epoch
integers (timezone-proof), float aggregates rounded (order-of-summation-
proof), ordering ties broken on event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    avg_fixed,
    clean_label,
    corr_int,
    corr_int_sql,
    round_det,
)
from real_time_big_data_iot_monitoring_pipeline_spark.operators import aggregates, alerts, anomaly, regression, windows
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

# Alert thresholds scaled to the events.value range (0..490), mirroring the
# reference's temperature/humidity rules (streamlit_dashboard.py:49-51).
V_HIGH, V_LOW, K_HIGH = 400.0, 5.0, 80.0
V_CRIT_HIGH, V_CRIT_LOW, K_CRIT = 450.0, 2.0, 95.0

# Fixed closed time interval for range-scan queries (P3), inside the
# fixture's 2024-01 span; expressed as epoch seconds to stay tz-proof.
T0, T1 = 1704844800, 1705276800  # 2024-01-10 .. 2024-01-15 UTC


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _events_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + the second metric `k` extracted from the props JSON
    (the 'humidity' analogue per FIXTURES.md)."""
    return _events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").cast("double")
    )

_K_SQL = "CAST(json_extract_string(props, '$.k') AS DOUBLE)"


# --------------------------------------------------------------------------
# A1 — the flagship: 5-minute tumbling-window rollup per key
# (reference spark_streaming.py:152-176; batch twin of the stream op)
# --------------------------------------------------------------------------
@register(
    "flagship_window_agg",
    oracle="""
    SELECT user_id,
           CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)       AS window_start,
           CAST(floor(epoch(ts) / 300) * 300 + 300 AS BIGINT) AS window_end,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value,
           min(value)           AS min_value,
           max(value)           AS max_value,
           count(*)             AS reading_count
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("reference", "A1", "windowed-agg", "headline"),
)
def flagship_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-min tumbling window avg/min/max/count per sensor — the reference's
    core streaming aggregation (spark_streaming.py:152-176) in batch form.
    One hash-agg shuffle on (user_id, window); partial aggregation is
    map-side, so shuffle volume is windows, not rows."""
    return aggregates.windowed_aggregate(_events(spark, sf_dir), "ts", ("user_id",), "value")


# --------------------------------------------------------------------------
# Scans / filters / projections / sorts / limits (P1-P8, O1-O4, S7-S9)
# --------------------------------------------------------------------------
@register(
    "scan_recent_topn",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
    tags=("reference", "O1", "O3", "S9"),
)
def scan_recent_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-100 scan (reference fetch path streamlit_dashboard.py:107-113,
    verify_data.py:17): sort+limit compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row merge at the driver side of the
    exchange, never a full sort."""
    e = _events(spark, sf_dir)
    return (
        e.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value")
    )


@register(
    "filter_time_range",
    oracle=f"""
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
    FROM events
    WHERE epoch(ts) >= {T0} AND epoch(ts) <= {T1}
    """,
    tags=("reference", "P3", "P1"),
)
def filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-interval time-range scan (reference
    streamlit_dashboard.py:74-80).  The predicate compares the scan-native
    `ts` column against foldable timestamp literals, so it pushes into the
    parquet scan — `PushedFilters` + row-group min/max skipping, the Spark
    analogue of the reference's B-tree range scan (init.sql:29-31).  A
    filter wrapped in non-invertible arithmetic on `ts` would scan
    everything.  Bounds are closed on both ends, matching the oracle's
    `epoch(ts) BETWEEN T0 AND T1` (DuckDB epoch() keeps the fractional
    part, so `<= T1` means the instant T1 exactly — as does ours)."""
    e = _events(spark, sf_dir)
    return e.filter(
        (F.col("ts") >= F.timestamp_seconds(F.lit(T0)))
        & (F.col("ts") <= F.timestamp_seconds(F.lit(T1)))
    ).select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value")


@register(
    "filter_equality",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'purchase' AND value > 250.0
    """,
    tags=("reference", "P4", "P5", "P6"),
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality + threshold predicates (reference
    streamlit_dashboard.py:420-424 location/sensor filters + :221 alerts)."""
    e = _events(spark, sf_dir)
    return e.filter((F.col("event_type") == "purchase") & (F.col("value") > 250.0)).select(
        "event_id", "user_id", "value"
    )


@register(
    "ingestion_rate_window",
    oracle="""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT count(*) AS recent_count,
           ROUND(count(*) / 60.0, 4) AS per_second
    FROM events, m
    WHERE epoch_us(ts) >= epoch_us(mx) - 60000000
    """,
    tags=("reference", "P8", "T8"),
)
def ingestion_rate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-rate probe (reference streamlit_dashboard.py:149-153
    `NOW() - INTERVAL '1 minute'`), made deterministic by anchoring to
    max(ts) instead of wall-clock now().  1-row max broadcast into the
    filter — no driver round-trip."""
    e = _events(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("mx"))
    return (
        e.join(F.broadcast(mx))
        .filter(F.unix_micros("ts") >= F.unix_micros("mx") - 60000000)
        .agg(F.count(F.lit(1)).alias("recent_count"), F.round(F.count(F.lit(1)) / 60.0, 4).alias("per_second"))
    )


@register(
    "distinct_types_sorted",
    oracle="SELECT DISTINCT event_type FROM events ORDER BY event_type",
    tags=("reference", "O4"),
)
def distinct_types_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted distinct list for filter widgets (reference
    streamlit_dashboard.py:392-395)."""
    return _events(spark, sf_dir).select("event_type").distinct().orderBy("event_type")


@register(
    "clean_labels",
    oracle="""
    SELECT DISTINCT event_type,
           upper(substr(replace(event_type, '_', ' '), 1, 1)) ||
           substr(replace(event_type, '_', ' '), 2) AS label
    FROM events
    """,
    tags=("reference", "F1"),
)
def clean_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`location.replace('_',' ').title()` (reference
    streamlit_dashboard.py:62-64) as a codegen'd expression.  (Oracle
    spells initcap manually — DuckDB lacks the builtin; fixture labels are
    single words so first-letter capitalization is equivalent.)"""
    return _events(spark, sf_dir).select("event_type", clean_label("event_type").alias("label")).distinct()


# --------------------------------------------------------------------------
# Aggregations (A2-A15)
# --------------------------------------------------------------------------
@register(
    "group_type_stats",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("reference", "A2", "A3", "A5"),
)
def group_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-location multi-aggregate (reference streamlit_dashboard.py:555-558,
    759-764)."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            avg_fixed(F.col("value")).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "global_kpis",
    oracle="""
    SELECT count(*) AS n_rows,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_types,
           epoch_us(max(ts)) AS max_ts_us,
           CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000) AS BIGINT) AS span_seconds,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    """,
    tags=("reference", "A4", "A5", "A6", "A7", "A8"),
)
def global_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI tile aggregates (reference streamlit_dashboard.py:444-456 +
    freshness probe :155): one scalar aggregation pass."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        avg_fixed(F.col("value")).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
        F.floor((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1000000)).cast("long").alias("span_seconds"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "describe_stats",
    oracle="""
    WITH m AS (
        SELECT count(value) AS n, min(value) AS min_v, max(value) AS max_v,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) AS sx,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT) * CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) AS sxx,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS p25,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS p75
        FROM events
    )
    SELECT n,
           ROUND(sx / (100.0 * n) + 1e-8, 4) AS mean_v,
           ROUND(sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / 100.0 + 1e-8, 4) AS std_v,
           min_v,
           ROUND(p25 + 1e-8, 4) AS q1,
           ROUND(p50 + 1e-8, 4) AS median_v,
           ROUND(p75 + 1e-8, 4) AS q3,
           max_v,
           ROUND((sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / 100.0)
                 / (sx / (100.0 * n)) * 100 + 1e-8, 4) AS cv_pct,
           ROUND(max_v - min_v + 1e-8, 4) AS range_v
    FROM m
    """,
    tags=("reference", "A9", "A10", "A11"),
)
def describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas describe() block + CV + range (reference
    streamlit_dashboard.py:632-637).  Exact interpolated `percentile`
    matches DuckDB percentile_cont / pandas quantile; stddev_samp matches
    pandas ddof=1."""
    return aggregates.describe_stats(_events(spark, sf_dir), "value")


@register(
    "histogram_value",
    oracle="""
    WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
    SELECT CAST(least(floor((value - lo) / ((hi - lo) / 30)), 29) AS BIGINT) AS bin,
           count(*) AS cnt
    FROM events, b
    GROUP BY 1
    """,
    tags=("reference", "A13"),
)
def histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-bin histogram (reference streamlit_dashboard.py:648-649): bounds
    agg + broadcast, bucket arithmetic is identical IEEE ops in both
    engines so bins match bit-for-bit."""
    return aggregates.histogram(_events(spark, sf_dir), "value", 30)


_CORR_E = f"""SELECT CAST(round(value * 100, 0) AS BIGINT) AS vc,
                      CAST({_K_SQL} AS BIGINT) AS ki,
                      CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS tsec
               FROM events"""


@register(
    "corr_matrix",
    oracle=f"""
    WITH e AS ({_CORR_E})
    SELECT 'value' AS m1, 'k' AS m2, {corr_int_sql('vc', 'ki')} AS corr_v FROM e
    UNION ALL
    SELECT 'value', 'tsec', {corr_int_sql('vc', 'tsec')} FROM e
    UNION ALL
    SELECT 'k', 'tsec', {corr_int_sql('ki', 'tsec')} FROM e
    """,
    tags=("reference", "A12"),
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 Pearson correlation matrix, upper triangle (reference
    streamlit_dashboard.py:657) — all pairs in ONE aggregation pass.
    Pearson corr is shift/scale-invariant, so the metrics are passed as
    exact integers (value cents, k, whole seconds since 2024-01-01):
    every moment sum is exact, making the result order-independent."""
    e = _events_k(spark, sf_dir).select(
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        F.col("k").cast("long").alias("ki"),
        (F.floor(F.unix_seconds("ts")).cast("long") - F.lit(1704067200)).alias("tsec"),
    )
    pairs = [("value", "k", "vc", "ki"), ("value", "tsec", "vc", "tsec"), ("k", "tsec", "ki", "tsec")]
    wide = e.agg(
        *[corr_int(F.col(x), F.col(y)).alias(f"c{i}") for i, (_, _, x, y) in enumerate(pairs)]
    )
    stack_expr = ", ".join(f"'{a}', '{b}', c{i}" for i, (a, b, _, _) in enumerate(pairs))
    return wide.selectExpr(f"stack(3, {stack_expr}) as (m1, m2, corr_v)")


@register(
    "events_per_day",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
           count(*) AS cnt,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value
    FROM events GROUP BY 1
    """,
    tags=("reference", "F4", "A2"),
)
def events_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup via timezone-free epoch-day bucketing (reference day
    bounds F4, streamlit_dashboard.py:358-359)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.floor(F.unix_seconds("ts") / F.lit(86400)).cast("long").alias("day_idx"))
        .agg(F.count(F.lit(1)).alias("cnt"), avg_fixed(F.col("value")).alias("avg_value"))
    )


@register(
    "rollup_type_user",
    oracle="""
    SELECT event_type, user_id, count(*) AS cnt, ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value
    FROM events GROUP BY ROLLUP(event_type, user_id)
    """,
    tags=("extension", "grouping-sets"),
)
def rollup_type_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals and grand total in one shuffle
    (extension beyond the reference's flat group-bys)."""
    return aggregates.grouping_rollup(_events(spark, sf_dir), ["event_type", "user_id"], "value")


@register(
    "json_props_stats",
    oracle=f"""
    SELECT CAST({_K_SQL} AS BIGINT) // 10 AS k_bucket,
           count(*) AS cnt,
           ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4) AS avg_value
    FROM events GROUP BY 1
    """,
    tags=("reference", "F12"),
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + bucketing (reference F12 surface;
    get_json_object stays JVM-side)."""
    e = _events_k(spark, sf_dir)
    return (
        e.groupBy(F.floor(F.col("k").cast("bigint") / 10).cast("long").alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"), avg_fixed(F.col("value")).alias("avg_value"))
    )


# --------------------------------------------------------------------------
# Alert engine + severity + status (M4, A15, F10, F11)
# --------------------------------------------------------------------------
def _alert_rules():
    return [
        alerts.AlertRule("high_value", F.col("value") > V_HIGH, F.col("value") > V_CRIT_HIGH),
        alerts.AlertRule("low_value", F.col("value") < V_LOW, F.col("value") < V_CRIT_LOW),
        alerts.AlertRule("high_k", F.col("k") > K_HIGH, F.col("k") > K_CRIT),
    ]


_ALERTS_SQL = f"""
    WITH e AS (SELECT event_id, user_id, value, {_K_SQL} AS k FROM events),
    al AS (
        SELECT event_id, user_id, value, 'high_value' AS alert_type,
               CASE WHEN value > {V_CRIT_HIGH} THEN 'critical' ELSE 'warning' END AS severity
        FROM e WHERE value > {V_HIGH}
        UNION ALL
        SELECT event_id, user_id, value, 'low_value',
               CASE WHEN value < {V_CRIT_LOW} THEN 'critical' ELSE 'warning' END
        FROM e WHERE value < {V_LOW}
        UNION ALL
        SELECT event_id, user_id, value, 'high_k',
               CASE WHEN k > {K_CRIT} THEN 'critical' ELSE 'warning' END
        FROM e WHERE k > {K_HIGH}
    )
"""


@register(
    "alerts_threshold",
    oracle=_ALERTS_SQL + "SELECT event_id, user_id, value, alert_type, severity FROM al",
    tags=("reference", "M4", "F10"),
)
def alerts_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold alert engine (reference streamlit_dashboard.py:209-266):
    three declarative filters over ONE scan (Catalyst collapses the shared
    subtree), unioned with alert_type + severity columns."""
    e = _events_k(spark, sf_dir)
    return alerts.apply_rules(e, _alert_rules()).select(
        "event_id", "user_id", "value", "alert_type", "severity"
    )


@register(
    "severity_rollup",
    oracle=_ALERTS_SQL + "SELECT alert_type, severity, count(*) AS cnt FROM al GROUP BY 1, 2",
    tags=("reference", "A15"),
)
def severity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Severity roll-up over the alert sets (reference
    streamlit_dashboard.py:268-297)."""
    e = _events_k(spark, sf_dir)
    return alerts.severity_rollup(alerts.apply_rules(e, _alert_rules()))


@register(
    "status_colors",
    oracle="""
    SELECT CASE WHEN value > 400.0 THEN 'red'
                WHEN value < 5.0 THEN 'blue'
                ELSE 'green' END AS status,
           count(*) AS cnt
    FROM events GROUP BY 1
    """,
    tags=("reference", "F11"),
)
def status_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status-color CASE classification (reference
    streamlit_dashboard.py:769-777), thresholds scaled to events.value."""
    e = _events(spark, sf_dir)
    return (
        e.select(
            F.when(F.col("value") > V_HIGH, "red")
            .when(F.col("value") < V_LOW, "blue")
            .otherwise("green")
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "geo_status_map",
    oracle="""
    WITH dim(event_type, lat, lon) AS (
        VALUES ('click', 52.37, 4.89), ('view', 52.52, 13.40),
               ('purchase', 48.85, 2.35), ('signup', 51.50, -0.12),
               ('error', 40.41, -3.70)
    )
    SELECT e.event_type,
           coalesce(d.lat, 0.0) AS lat,
           coalesce(d.lon, 0.0) AS lon,
           ROUND((sum(CAST(round(e.value * 100, 0) AS BIGINT)) / (100.0 * count(e.value))) + 1e-8, 4) AS avg_value,
           count(*) AS cnt,
           CASE WHEN ROUND((sum(CAST(round(e.value * 100, 0) AS BIGINT)) / (100.0 * count(e.value))) + 1e-8, 4) > 60.0 THEN 'red'
                WHEN ROUND((sum(CAST(round(e.value * 100, 0) AS BIGINT)) / (100.0 * count(e.value))) + 1e-8, 4) < 40.0 THEN 'blue'
                ELSE 'green' END AS status
    FROM events e LEFT JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type, d.lat, d.lon
    """,
    tags=("reference", "M6", "J1", "A3"),
)
def geo_status_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo status aggregation (reference streamlit_dashboard.py:746-787):
    per-group aggregates left-joined to a small coordinates dim —
    explicitly broadcast, so the fact side never shuffles for the join."""
    dim = spark.createDataFrame(
        [
            ("click", 52.37, 4.89),
            ("view", 52.52, 13.40),
            ("purchase", 48.85, 2.35),
            ("signup", 51.50, -0.12),
            ("error", 40.41, -3.70),
        ],
        ["event_type", "lat", "lon"],
    )
    agg = (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(avg_fixed(F.col("value")).alias("avg_value"), F.count(F.lit(1)).alias("cnt"))
    )
    return (
        agg.join(F.broadcast(dim), "event_type", "left")
        .select(
            "event_type",
            F.coalesce("lat", F.lit(0.0)).alias("lat"),
            F.coalesce("lon", F.lit(0.0)).alias("lon"),
            "avg_value",
            "cnt",
            F.when(F.col("avg_value") > 60.0, "red")
            .when(F.col("avg_value") < 40.0, "blue")
            .otherwise("green")
            .alias("status"),
        )
    )


# --------------------------------------------------------------------------
# IQR anomaly detection (M1, A11)
# --------------------------------------------------------------------------
@register(
    "iqr_anomaly",
    oracle=f"""
    WITH e AS (SELECT event_id, value, {_K_SQL} AS k FROM events),
    b AS (
        SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1v,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3v,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY k) AS q1k,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY k) AS q3k
        FROM e
    )
    SELECT event_id, value, k,
           (value < q1v - 1.5 * (q3v - q1v) OR value > q3v + 1.5 * (q3v - q1v)) AS value_anomaly,
           (k < q1k - 1.5 * (q3k - q1k) OR k > q3k + 1.5 * (q3k - q1k)) AS k_anomaly
    FROM e, b
    WHERE (value < q1v - 1.5 * (q3v - q1v) OR value > q3v + 1.5 * (q3v - q1v))
       OR (k < q1k - 1.5 * (q3k - q1k) OR k > q3k + 1.5 * (q3k - q1k))
    """,
    tags=("reference", "M1", "A11"),
)
def iqr_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR anomaly detection (reference streamlit_dashboard.py:185-207):
    exact-percentile fences computed as a 1-row aggregate, broadcast into
    a row-level flag pass — no driver collect (SURVEY §7 risk 6)."""
    e = _events_k(spark, sf_dir)
    return anomaly.anomalies(e, ["value", "k"]).select(
        "event_id", "value", "k", "value_anomaly", "k_anomaly"
    )


# --------------------------------------------------------------------------
# Window functions (W1-W5) + trend (M5)
# --------------------------------------------------------------------------
@register(
    "rolling_avg_20",
    oracle="""
    SELECT event_id,
           ROUND(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w
                 / (100.0 * count(value) OVER w) + 1e-8, 4) AS rolling_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    tags=("reference", "W1"),
)
def rolling_avg_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-row trailing moving average per sensor (reference
    streamlit_dashboard.py:676-677, pandas rolling(20, min_periods=1)).
    Partitioned by user_id — never a global orderBy window."""
    e = _events(spark, sf_dir)
    return windows.rolling_avg(e, "user_id", ["ts", "event_id"], "value").select(
        "event_id", "rolling_avg"
    )


@register(
    "ma_diff_trend",
    oracle="""
    WITH ma AS (
        SELECT user_id, ts, event_id,
               ROUND(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w
                     / (100.0 * count(value) OVER w) + 1e-8, 4) AS m
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    t AS (
        SELECT user_id, m,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM ma
    )
    SELECT user_id,
           ROUND((arg_min(m, rn) - arg_max(m, rn)) / (count(*) - 1) + 1e-8, 4) AS mean_diff,
           CASE WHEN ROUND((arg_min(m, rn) - arg_max(m, rn)) / (count(*) - 1) + 1e-8, 4) > 0.01 THEN 'rising'
                WHEN ROUND((arg_min(m, rn) - arg_max(m, rn)) / (count(*) - 1) + 1e-8, 4) < -0.01 THEN 'falling'
                ELSE 'stable' END AS trend
    FROM t WHERE rn <= 21
    GROUP BY user_id HAVING count(*) > 1
    """,
    tags=("reference", "W2", "W3", "A14", "M5"),
)
def ma_diff_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend classification (reference streamlit_dashboard.py:687-696):
    rolling mean -> mean of the last 20 first-differences -> CASE.  The
    mean-of-diffs telescopes to (newest_ma - ma_20_back) / n_diffs, so it
    is computed from exactly two values — no float summation, bit-equal
    across engines.  Window ops share one (user_id) partitioning, so
    Spark plans a single sort+window stage."""
    e = _events(spark, sf_dir)
    ma = windows.rolling_avg(e, "user_id", ["ts", "event_id"], "value", out="m")
    tail = windows.topn_per_group(ma, "user_id", ["ts", "event_id"], 21)
    agg = tail.groupBy("user_id").agg(
        round_det(
            F.try_divide(
                F.expr("min_by(m, rn)") - F.expr("max_by(m, rn)"), F.count(F.lit(1)) - 1
            ),
            4,
        ).alias("mean_diff"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        agg.filter(F.col("_n") > 1)
        .select(
            "user_id",
            "mean_diff",
            F.when(F.col("mean_diff") > 0.01, "rising")
            .when(F.col("mean_diff") < -0.01, "falling")
            .otherwise("stable")
            .alias("trend"),
        )
    )


@register(
    "topn_per_group",
    oracle="""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn <= 5
    """,
    tags=("reference", "W3"),
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-5 per sensor (reference tail-N selection)."""
    e = _events(spark, sf_dir)
    return windows.topn_per_group(e, "user_id", ["ts", "event_id"], 5).select(
        "user_id", "event_id", "value"
    )


@register(
    "last_value_per_group",
    oracle="""
    SELECT user_id, arg_max(value, event_id) AS last_value, max(event_id) AS last_event_id
    FROM events GROUP BY user_id
    """,
    tags=("reference", "W4"),
)
def last_value_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current value per sensor (reference streamlit_dashboard.py:719
    `.iloc[-1]`): max_by — one hash aggregation, no sort.  event_id is the
    ingestion sequence, so max_by(value, event_id) is last-by-time with a
    unique, deterministic key."""
    e = _events(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.expr("max_by(value, event_id)").alias("last_value"),
        F.max("event_id").alias("last_event_id"),
    )


@register(
    "elapsed_seconds_feature",
    oracle="""
    SELECT event_id,
           ROUND((epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id)) / 1000000.0, 6) AS elapsed_s
    FROM events
    """,
    tags=("reference", "W5"),
)
def elapsed_seconds_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds-since-group-start regression feature (reference
    streamlit_dashboard.py:708)."""
    e = windows.elapsed_seconds(_events(spark, sf_dir), "user_id", "ts")
    return e.select("event_id", F.round("elapsed_s", 6).alias("elapsed_s"))


# --------------------------------------------------------------------------
# Per-group OLS regression + forecast + quality gate (M2, M3)
# --------------------------------------------------------------------------
_REG_FIT_SQL = regression.fit_per_group_exact_sql(
    "events", "user_id", "ts", "value", min_rows=10, forecast_dx=3600.0
)

@register(
    "regression_per_group",
    oracle=_REG_FIT_SQL,
    tags=("reference", "M2", "headline"),
)
def regression_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor OLS fit + 1-hour forecast (reference
    streamlit_dashboard.py:699-739 fits sklearn per location).  Closed
    form as pure aggregates over EXACT integer moments (µs × cents in
    DECIMAL(38,0)) — ONE groupBy, no Python in the loop, and the result
    is independent of partitioning / summation order (SURVEY §2.10 M2)."""
    e = windows.elapsed_micros(_events(spark, sf_dir), "user_id", "ts", out="x_us")
    return regression.fit_per_group_exact(
        e, "user_id", "x_us", "value", min_rows=10, forecast_dx=3600.0
    )


@register(
    "regression_quality_gate",
    oracle=f"""
    WITH fits AS ({regression.fit_per_group_exact_sql("events", "user_id", "ts", "value", min_rows=10)})
    SELECT ROUND((CAST(sum(CAST(round(r2 * 1000000, 0) AS BIGINT)) AS DOUBLE)
                  / (1000000.0 * count(r2))) + 1e-8, 6) AS avg_r2,
           CASE WHEN ROUND((CAST(sum(CAST(round(r2 * 1000000, 0) AS BIGINT)) AS DOUBLE)
                            / (1000000.0 * count(r2))) + 1e-8, 6) > 0.7 THEN 'good'
                WHEN ROUND((CAST(sum(CAST(round(r2 * 1000000, 0) AS BIGINT)) AS DOUBLE)
                            / (1000000.0 * count(r2))) + 1e-8, 6) > 0.3 THEN 'moderate'
                ELSE 'poor' END AS model_quality
    FROM fits
    """,
    tags=("reference", "M3"),
)
def regression_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R²-based model-quality gate (reference streamlit_dashboard.py:730-739).
    avg_r2 sums the exact 1e6-scaled integer representation of the
    (already 6-dp-rounded) per-group r2 values, so it is summation-order
    independent."""
    e = windows.elapsed_micros(_events(spark, sf_dir), "user_id", "ts", out="x_us")
    fits = regression.fit_per_group_exact(e, "user_id", "x_us", "value", min_rows=10)
    return regression.quality_gate(fits)
