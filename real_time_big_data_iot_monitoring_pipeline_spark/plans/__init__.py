"""Query catalog: importing this package populates the registry."""

from real_time_big_data_iot_monitoring_pipeline_spark.plans import (  # noqa: F401
    extension_queries,
    join_queries,
    northstar_queries,
    reference_queries,
    streaming_queries,
)
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import REGISTRY, Query, register

__all__ = ["REGISTRY", "Query", "register"]
