from real_time_big_data_iot_monitoring_pipeline_spark.streaming.pipeline import (
    parse_kafka_json,
    run_stream_to_memory,
    start_dual_sink,
    windowed_aggregate_stream,
)

__all__ = [
    "parse_kafka_json",
    "run_stream_to_memory",
    "start_dual_sink",
    "windowed_aggregate_stream",
]
