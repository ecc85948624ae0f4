from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    clean_label,
    clip,
    epoch_day,
    epoch_micros,
    epoch_seconds,
    severity,
    status_color,
)

__all__ = [
    "clean_label",
    "clip",
    "epoch_day",
    "epoch_micros",
    "epoch_seconds",
    "severity",
    "status_color",
]
