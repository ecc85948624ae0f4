from real_time_big_data_iot_monitoring_pipeline_spark.operators import (
    aggregates,
    alerts,
    anomaly,
    dedup,
    multimodal,
    regression,
    similarity,
    text,
    windows,
)

__all__ = [
    "aggregates",
    "alerts",
    "anomaly",
    "dedup",
    "multimodal",
    "regression",
    "similarity",
    "text",
    "windows",
]
