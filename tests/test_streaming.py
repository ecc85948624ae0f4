"""Streaming-layer tests: batch/stream equivalence for the reference's
core windowed aggregation, the dual-sink pipeline, watermark append-mode
emission, and streaming dedup.  All run against the deterministic sensor
generator (sources/sensors.py) replayed through a file source — the same
DAG the Kafka path uses (streaming/pipeline.py)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.sources import sensors
from real_time_big_data_iot_monitoring_pipeline_spark.streaming import pipeline


@pytest.fixture(scope="module")
def reading_files(spark, tmp_path_factory):
    """6 hours of sensor readings staged as multiple parquet files."""
    path = str(tmp_path_factory.mktemp("readings"))
    df = sensors.readings(spark, hours=6)
    df.repartition(8).write.mode("overwrite").parquet(path)
    return path, df.schema


def _normalize(df):
    return sorted(tuple(r) for r in df.collect())


def test_batch_stream_equivalence(spark, reading_files):
    """The SAME windowed-agg DAG over the same rows must produce identical
    results in batch and via micro-batched streaming (complete mode emits
    all windows)."""
    path, schema = reading_files
    batch = spark.read.schema(schema).parquet(path)
    expected = _normalize(pipeline.windowed_aggregate_stream(batch))

    stream = pipeline.file_source(spark, path, schema=schema, max_files_per_trigger=2)
    agg = pipeline.windowed_aggregate_stream(stream)
    name = f"equiv_{uuid.uuid4().hex[:8]}"
    pipeline.run_stream_to_memory(agg, name, output_mode="complete")
    got = _normalize(spark.table(name))
    assert got == expected
    assert len(got) > 0


def test_dual_sink_upsert(spark, reading_files, tmp_path):
    """T5 dual-sink fan-out: raw + windowed-agg sinks fed from one parsed
    stream, with the overwrite-by-partition (exactly-once-effective)
    writer.  Both sinks must land complete data."""
    path, schema = reading_files
    raw_dir = str(tmp_path / "raw")
    agg_dir = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")

    stream = pipeline.file_source(spark, path, schema=schema, max_files_per_trigger=4)

    def raw_writer(batch_df, batch_id):
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(raw_dir)

    agg_writer = pipeline.parquet_upsert_writer(agg_dir, partition_col="sensor_id")
    raw_q, agg_q = pipeline.start_dual_sink(stream, raw_writer, agg_writer, ckpt)
    raw_q.processAllAvailable()
    agg_q.processAllAvailable()
    raw_q.stop()
    agg_q.stop()

    n_src = spark.read.schema(schema).parquet(path).count()
    assert spark.read.parquet(raw_dir).count() == n_src
    agg = spark.read.parquet(agg_dir)
    # append mode + watermark: only windows sealed by the watermark emit;
    # with 6h of data and a 10-min watermark nearly all 5-min windows seal.
    assert agg.count() > 0
    assert set(agg.columns) >= {"window_start", "window_end", "avg_temperature", "reading_count"}


def test_append_mode_holds_back_unsealed_windows(spark, reading_files, tmp_path):
    """T4 semantics: in append mode the final (unsealed) window must NOT be
    emitted — the watermark hasn't passed its end."""
    path, schema = reading_files
    stream = pipeline.file_source(spark, path, schema=schema, max_files_per_trigger=1000)
    agg = pipeline.windowed_aggregate_stream(stream)
    name = f"append_{uuid.uuid4().hex[:8]}"
    pipeline.run_stream_to_memory(agg, name, output_mode="append")
    emitted = spark.table(name)
    batch = spark.read.schema(schema).parquet(path)
    all_windows = pipeline.windowed_aggregate_stream(batch)
    # strictly fewer windows than batch: at least the tail is held back
    assert 0 < emitted.count() < all_windows.count()
    # and every emitted row matches its batch twin exactly
    assert emitted.exceptAll(all_windows).count() == 0


def test_streaming_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark removes replayed readings within the
    watermark horizon."""
    base = sensors.readings(spark, hours=1)
    dup_path = str(tmp_path / "dups")
    base.union(base).repartition(4).write.mode("overwrite").parquet(dup_path)

    stream = pipeline.file_source(spark, dup_path, schema=base.schema, max_files_per_trigger=4)
    deduped = pipeline.dedup_stream(stream, ["sensor_id", "timestamp"])
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    pipeline.run_stream_to_memory(deduped, name, output_mode="append")
    assert spark.table(name).count() == base.count()


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (reading x its 30-min calibration
    window) produces exactly the rows of the same join run as a batch —
    watermark + interval bound keep state finite without dropping any
    in-horizon match."""
    base = sensors.readings(spark, hours=1)
    calib = (
        base.select(
            "sensor_id",
            F.timestamp_seconds(
                F.expr("unix_seconds(timestamp) DIV 1800") * 1800
            ).alias("calib_ts"),
        )
        .distinct()
        .withColumn("gain", F.lit(1.5))
    )
    read_path, calib_path = str(tmp_path / "readings"), str(tmp_path / "calib")
    base.repartition(4).write.mode("overwrite").parquet(read_path)
    calib.repartition(2).write.mode("overwrite").parquet(calib_path)

    expected = pipeline.interval_join_stream(
        spark.read.parquet(read_path), spark.read.parquet(calib_path),
        "sensor_id", "timestamp", "calib_ts",
    ).count()
    assert expected >= base.count()  # every reading has its own half-hour row

    ls = pipeline.file_source(spark, read_path, schema=base.schema, max_files_per_trigger=2)
    rs = pipeline.file_source(spark, calib_path, schema=calib.schema, max_files_per_trigger=1)
    joined = pipeline.interval_join_stream(ls, rs, "sensor_id", "timestamp", "calib_ts")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    pipeline.run_stream_to_memory(joined, name, output_mode="append")
    assert spark.table(name).count() == expected


def test_stream_stream_left_outer_join_flushes_unmatched(spark, tmp_path):
    """leftOuter stream-stream join: calibrations exist only for even
    sensors, so odd sensors' readings must surface as null-padded rows —
    emitted once the watermark proves no match can arrive.  The streamed
    result must (a) contain every inner match, (b) be a subset of the
    batch outer join, and (c) actually contain null-padded rows for the
    unmatched region older than the final watermark."""
    base = sensors.readings(spark, hours=1)
    calib = (
        base.filter(F.substring("sensor_id", -1, 1).cast("int") % 2 == 0)
        .select(
            "sensor_id",
            F.timestamp_seconds(
                F.expr("unix_seconds(timestamp) DIV 1800") * 1800
            ).alias("calib_ts"),
        )
        .distinct()
        .withColumn("gain", F.lit(1.5))
    )
    read_path, calib_path = str(tmp_path / "readings"), str(tmp_path / "calib")
    base.repartition(4).write.mode("overwrite").parquet(read_path)
    calib.repartition(2).write.mode("overwrite").parquet(calib_path)

    batch_l, batch_r = spark.read.parquet(read_path), spark.read.parquet(calib_path)
    outer = pipeline.interval_join_stream(
        batch_l, batch_r, "sensor_id", "timestamp", "calib_ts", how="leftOuter"
    )
    batch_keys = {(r.sensor_id, r.timestamp, r.calib_ts) for r in outer.collect()}
    inner_keys = {k for k in batch_keys if k[2] is not None}

    ls = pipeline.file_source(spark, read_path, schema=base.schema, max_files_per_trigger=2)
    rs = pipeline.file_source(spark, calib_path, schema=calib.schema, max_files_per_trigger=1)
    joined = pipeline.interval_join_stream(
        ls, rs, "sensor_id", "timestamp", "calib_ts", how="leftOuter"
    )
    name = f"ssoj_{uuid.uuid4().hex[:8]}"
    pipeline.run_stream_to_memory(joined, name, output_mode="append")
    got = {(r.sensor_id, r.timestamp, r.calib_ts) for r in spark.table(name).collect()}

    assert inner_keys <= got  # no inner match lost
    assert got <= batch_keys  # nothing fabricated
    nulls = [k for k in got if k[2] is None]
    assert nulls and all(int(k[0][-1]) % 2 == 1 for k in nulls)  # odd sensors flushed null-padded


def test_kafka_parse_roundtrip(spark):
    """S4 parse stage: JSON wire format -> strict schema -> flatten, fed
    with synthetic Kafka-shaped rows (value bytes).  Malformed JSON yields
    NULL fields (from_json semantics), not dropped rows."""
    readings = sensors.readings(spark, hours=1).limit(10)
    wire = readings.select(
        F.to_json(
            F.struct("sensor_id", "location", "timestamp", "temperature", "humidity", "pressure")
        ).cast("binary").alias("value")
    )
    bad = spark.createDataFrame([("{not json",), ("42",)], ["s"]).select(
        F.col("s").cast("binary").alias("value")
    )
    parsed = pipeline.parse_kafka_json(wire.union(bad))
    rows = parsed.collect()
    assert len(rows) == 12
    ok = [r for r in rows if r.sensor_id is not None]
    assert len(ok) == 10
    got = {(r.sensor_id, r.timestamp, r.temperature) for r in ok}
    want = {(r.sensor_id, r.timestamp, r.temperature) for r in readings.collect()}
    assert got == want


def test_generator_is_partition_independent(spark):
    """The hash-derived randomness contract: same rows regardless of
    parallelism (the property rand(seed) does NOT have)."""
    a = sensors.readings(spark, hours=2).repartition(1).collect()
    b = sensors.readings(spark, hours=2).repartition(32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stream_replay_cached_per_session(spark, monkeypatch):
    """Catalog streaming queries replay their file-source stream ONCE per
    (session, sf_dir): a second build() must reuse the persisted result
    parquet, never re-run the streaming query (round-3 verdict, "Next
    round" #7 — replay cost is one-time per process, not per call)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import streaming_queries as sq

    calls: list[str] = []
    orig = sq.pipeline.run_stream_to_parquet

    def counting(df, path, output_mode="complete"):
        calls.append(path)
        return orig(df, path, output_mode)

    monkeypatch.setattr(sq.pipeline, "run_stream_to_parquet", counting)
    sf = "/root/testdata/sf0.001"
    n1 = REGISTRY["stream_tumbling_window"].build(spark, sf).count()
    after_first = len(calls)  # 0 if an earlier test in this session already built it
    n2 = REGISTRY["stream_tumbling_window"].build(spark, sf).count()
    assert n2 == n1
    assert len(calls) == after_first, (
        f"second build() re-ran the streaming replay: {calls[after_first:]}"
    )


def test_late_data_audit_matches_engine_dropped_metric(spark):
    """The audit's late_dropped total must equal the engine's own
    numRowsDroppedByWatermark across batches (persisted telemetry), plus
    the audit must actually observe lateness (the staged feed delays
    event_id % 17 == 0 by four files)."""
    from pyspark.sql import functions as F

    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
    from real_time_big_data_iot_monitoring_pipeline_spark.plans.streaming_queries import _stream_dirs

    sf = "/root/testdata/sf0.001"
    audit = REGISTRY["stream_late_data_audit"].build(spark, sf)
    total_late = audit.agg(F.sum("late_dropped")).collect()[0][0]
    _, result = _stream_dirs(sf, "result_late_audit")
    telemetry = spark.read.parquet(result + "_wm")
    engine_dropped = telemetry.agg(F.sum("rows_dropped")).collect()[0][0]
    assert total_late > 0, "staged stragglers should produce dropped late rows"
    assert total_late == engine_dropped, (
        f"audit says {total_late} late-dropped, engine reported {engine_dropped}"
    )


def test_checkpoint_offset_recovery_exactly_once(spark, tmp_path):
    """T7 offset management: a RESTARTED streaming query resuming from
    the same checkpoint must pick up exactly where the stopped one left
    off — files ingested before the stop are not reprocessed (no
    duplicates in the append sink) and files added after it are all
    ingested (no loss)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    base = spark.range(60).select(F.col("id").alias("event_id"), (F.col("id") % 7).alias("k"))
    for i in range(3):
        base.filter(F.col("event_id") % 6 == i).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("event_id long, k long").parquet(src)
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    first = spark.read.parquet(sink).count()
    assert first == 30  # 3 of 6 residue classes

    # "crash" happened between run_once() calls; now more data arrives
    for i in range(3, 6):
        base.filter(F.col("event_id") % 6 == i).coalesce(1).write.mode("append").parquet(src)
    run_once()

    out = spark.read.parquet(sink)
    assert out.count() == 60, "restart lost or duplicated rows"
    assert out.select("event_id").distinct().count() == 60, "restart reprocessed old files"


def test_dag_side_static_join_breaks_on_dim_overwrite(spark, tmp_path):
    """Negative evidence for stream_dim_refresh_join's design note: a
    DAG-side stream-static join against plain parquet caches the static
    side's file index at stream start, so overwriting the dimension
    mid-stream makes later batches fail (file-not-found on the deleted
    files) instead of picking up the new version.  The foreachBatch-side
    join (the catalog query) is the refresh-correct pattern."""
    from pyspark.sql import functions as F

    src, dim, sink = str(tmp_path / "src"), str(tmp_path / "dim"), str(tmp_path / "sink")
    rows = spark.range(40).select(F.col("id").alias("event_id"), (F.col("id") % 4).alias("k"))
    for i in range(4):
        rows.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode("append").parquet(src)
    spark.range(4).select(F.col("id").alias("k"), F.lit(1).alias("v")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(dim)

    static_dim = spark.read.parquet(dim)
    stream = (
        spark.readStream.schema("event_id long, k long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def write(df, bid):
        df.write.mode("append").parquet(sink)
        if bid == 0:
            spark.range(4).select(F.col("id").alias("k"), F.lit(2).alias("v")).coalesce(
                1
            ).write.mode("overwrite").parquet(dim)

    q = stream.join(static_dim, "k").writeStream.outputMode("append").foreachBatch(write).start()
    import pytest as _pytest

    with _pytest.raises(Exception, match="does not exist|FileNotFound|FAILED_READ_FILE"):
        q.processAllAvailable()
    q.stop()
