"""End-to-end test of the dashboard facade: every panel of the reference
dashboard computes over the canonical sensor schema, produces sane
values, and the whole surface runs as a set of lazy plans over one
generated dataset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark import dashboard
from real_time_big_data_iot_monitoring_pipeline_spark.sources import sensors


@pytest.fixture(scope="module")
def readings(spark):
    return sensors.readings(spark, hours=12).cache()


@pytest.fixture(scope="module")
def panels(spark, readings):
    return dashboard.full_dashboard(readings, sensors.location_dim(spark))


def test_every_panel_materializes(panels):
    for name, df in panels.items():
        assert df.count() > 0, name


def test_kpis(readings, panels):
    row = panels["kpis"].collect()[0]
    assert row.n_sensors == sensors.N_SENSORS
    assert row.n_locations == sensors.N_SENSORS
    assert row.n_readings == readings.count()
    assert 10 < row.avg_temperature < 35


def test_alert_feed_fires_all_categories(panels):
    types = {r.alert_type for r in panels["alerts"].select("alert_type").distinct().collect()}
    # the generator injects +-15C anomalies and humidity bumps, so every
    # category must fire (the reference's seeded demo makes the same claim)
    assert types == {"high_temperature", "low_temperature", "high_humidity", "statistical_anomaly"}


def test_geo_map_has_no_default_coords(panels):
    geo = panels["geo"].collect()
    assert len(geo) == sensors.N_SENSORS
    assert all(r.lat != 0.0 for r in geo)
    assert {r.status for r in geo} <= {"red", "green", "blue"}


def test_forecasts_cover_all_locations(panels):
    fc = panels["forecasts"].collect()
    assert len(fc) == sensors.N_SENSORS
    assert all(f.r2 is not None for f in fc)


def test_time_window_filter(spark, readings):
    recent = dashboard.filter_window(readings, hours=2)
    n = recent.count()
    # 2h of 12h at 2-min cadence: 10 sensors * 61 ticks (inclusive anchor)
    assert 0 < n < readings.count()
    span_us = recent.agg(
        (F.unix_micros(F.max("timestamp")) - F.unix_micros(F.min("timestamp"))).alias("s")
    ).collect()[0].s
    assert span_us <= 2 * 3600 * 1000000


def test_whole_surface_is_lazy_single_scan(spark, readings, panels):
    """All panels are plans, not materialized results — building the full
    dashboard triggers no jobs (laziness is what lets a serving layer
    choose caching/scheduling)."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    dashboard.full_dashboard(readings, sensors.location_dim(spark))
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_trend_dense_fills_dropped_samples(spark):
    """The dense trend panel must emit a row for every 5-min bucket even
    when a sensor drops samples, forward-filling the last average."""
    base = sensors.readings(spark, hours=2)
    # drop 30 minutes in the middle for one sensor
    holey = base.filter(
        ~(
            (F.col("sensor_id") == "SENSOR_001")
            & (F.minute("timestamp") >= 20)
            & (F.minute("timestamp") < 50)
            & (F.hour("timestamp") == 0)
        )
    )
    dense = dashboard.trend_series_dense(holey).filter(F.col("sensor_id") == "SENSOR_001")
    rows = {r.bucket: r for r in dense.collect()}
    buckets = sorted(rows)
    # contiguous bucket grid despite the hole
    assert buckets == list(range(buckets[0], buckets[-1] + 1))
    gaps = [r for r in rows.values() if r.is_gap == 1]
    assert gaps and all(r.avg_value_ff is not None for r in gaps)


def test_cli_demo_end_to_end(spark, tmp_path, monkeypatch, capsys):
    """`python -m real_time_big_data_iot_monitoring_pipeline_spark` lifecycle: generate -> replay stream
    -> dual sink -> dashboard panels, in-process with a small feed."""
    import sys

    from real_time_big_data_iot_monitoring_pipeline_spark.__main__ import main

    monkeypatch.setattr(
        sys, "argv",
        ["real_time_big_data_iot_monitoring_pipeline_spark", "--hours", "1", "--rows", "3", "--out", str(tmp_path / "demo")],
    )
    # main() calls spark.stop() on the shared fixture session; neuter it
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    main()
    out = capsys.readouterr().out
    assert "sink row counts" in out
    for panel in ("kpis", "alerts", "severity", "location_stats", "trend", "geo"):
        assert f"=== {panel}" in out, f"panel {panel} missing from CLI output"
    # the raw sink must hold the COMPLETE feed (an overwrite-style raw
    # writer silently keeps only the last micro-batch — regression guard)
    from real_time_big_data_iot_monitoring_pipeline_spark.sources import sensors

    expected = sensors.readings(spark, hours=1).count()
    import re as _re

    raw_n = int(_re.search(r"raw=(\d+)", out).group(1))
    assert raw_n == expected, f"raw sink {raw_n} != generated feed {expected}"

    # the AGG sink must equal the batch twin of the windowed aggregation
    # over the complete feed — the round-3 advice pathology was an
    # out-of-event-time-order replay whose watermark silently dropped most
    # rows, leaving an agg sink computed from a fraction of the data while
    # this test only checked the raw count.  (Append mode still holds back
    # windows the final watermark never seals, so compare on the sealed
    # prefix: every sunk window must match its batch value, and the sunk
    # set must cover all but the trailing watermark horizon.)
    from real_time_big_data_iot_monitoring_pipeline_spark.streaming import pipeline as _pipeline

    feed = sensors.readings(spark, hours=1)
    batch = {
        (r["sensor_id"], r["window_start"]): r
        for r in _pipeline.windowed_aggregate_stream(feed).collect()
    }
    sunk = spark.read.parquet(str(tmp_path / "demo" / "agg")).collect()
    assert sunk, "agg sink is empty"
    for r in sunk:
        b = batch[(r["sensor_id"], r["window_start"])]
        assert (
            r["avg_temperature"] == b["avg_temperature"]
            and r["reading_count"] == b["reading_count"]
        ), f"agg sink row diverges from batch twin: {r} vs {b}"
    # coverage: only windows inside the trailing 10-min watermark horizon
    # (plus the one window the final file may leave unsealed) may be absent
    horizon = max(b["window_end"] for b in batch.values())
    missing = {k for k in batch if k not in {(r["sensor_id"], r["window_start"]) for r in sunk}}
    import datetime as _dt

    for _sid, wstart in missing:
        assert wstart >= horizon - _dt.timedelta(minutes=15), (
            f"window {wstart} missing from agg sink but outside the "
            f"trailing watermark horizon (max batch window end {horizon})"
        )
