"""Runnable end-to-end demo — the Spark twin of the reference's
`python spark_streaming.py` + dashboard lifecycle (SURVEY.md §3), in one
command:

    python -m real_time_big_data_iot_monitoring_pipeline_spark [--hours 4] [--out DIR]

1. Generate the synthetic sensor feed (deterministic, hash-derived —
   the reference's `mqtt_producer.py` equivalent) and stage it as files.
2. Replay it through Structured Streaming in micro-batches and run the
   reference pipeline: parse → dual sink (raw append + 5-min windowed
   aggregates with idempotent partition-overwrite upsert).
3. Read the sinks back and print every dashboard panel (KPIs, alert
   feed, severity roll-up, per-location stats, trend, forecast, geo
   map) — the reference's streamlit surface, driven from parquet
   instead of PostgreSQL.

With `--source kafka --brokers ... --topic ...` the same DAG attaches to
a live Kafka topic instead of the file replay (requires the
spark-sql-kafka package on the cluster; not testable in this container).
"""

from __future__ import annotations

import argparse
import os
import tempfile

from real_time_big_data_iot_monitoring_pipeline_spark import dashboard
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session
from real_time_big_data_iot_monitoring_pipeline_spark.sources import sensors
from real_time_big_data_iot_monitoring_pipeline_spark.streaming import pipeline


def main() -> None:
    ap = argparse.ArgumentParser(prog="real_time_big_data_iot_monitoring_pipeline_spark")
    ap.add_argument("--hours", type=int, default=4, help="hours of synthetic feed to generate")
    ap.add_argument("--out", default=None, help="output dir (default: a temp dir)")
    ap.add_argument("--source", choices=["file", "kafka"], default="file")
    ap.add_argument("--brokers", default="localhost:9092")
    ap.add_argument("--topic", default="sensor_data")
    ap.add_argument("--rows", type=int, default=20, help="rows to print per panel")
    args = ap.parse_args()

    out = args.out or tempfile.mkdtemp(prefix="rtbd_demo_")
    staging = os.path.join(out, "staging")
    raw_path = os.path.join(out, "raw")
    agg_path = os.path.join(out, "agg")
    ckpt = os.path.join(out, "checkpoints")

    spark = get_session()
    spark.sparkContext.setLogLevel("WARN")

    # 1. source ---------------------------------------------------------
    feed = sensors.readings(spark, hours=args.hours)
    if args.source == "kafka":
        raw = pipeline.kafka_source(spark, args.brokers, args.topic)
        parsed = pipeline.parse_kafka_json(raw)
    else:
        # Stage as event-time-ordered slices: a round-robin repartition(8)
        # replays out of order, the watermark jumps to ~max-10min after the
        # first micro-batch, and the agg sink silently aggregates a
        # fraction of the feed (round-3 advice; see stage_event_time_slices)
        pipeline.stage_event_time_slices(feed, staging, n_slices=8)
        parsed = pipeline.file_source(spark, staging, schema=feed.schema, max_files_per_trigger=2)

    # 2. streaming pipeline: dual sink ---------------------------------
    raw_q, agg_q = pipeline.start_dual_sink(
        parsed,
        raw_writer=pipeline.parquet_append_writer(raw_path),
        agg_writer=pipeline.parquet_upsert_writer(agg_path, partition_col="window_start"),
        checkpoint_dir=ckpt,
    )
    if args.source == "file":
        raw_q.processAllAvailable()
        agg_q.processAllAvailable()
        raw_q.stop()
        agg_q.stop()
    else:  # live stream: run until interrupted
        spark.streams.awaitAnyTermination()

    # 3. dashboard surface ---------------------------------------------
    readings = spark.read.parquet(raw_path)
    panels = dashboard.full_dashboard(readings, sensors.location_dim(spark))
    aggs = spark.read.parquet(agg_path)
    print(f"\n=== sink row counts: raw={readings.count()} agg={aggs.count()} ===")
    for name, df in panels.items():
        print(f"\n=== {name} ===")
        df.show(args.rows, truncate=False)

    print(f"outputs under: {out}")
    spark.stop()


if __name__ == "__main__":
    main()
