"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference IoT monitoring pipeline
(shibliafaq/real-time-big-data-iot-monitoring-pipeline), re-expressed Spark-first.

Layout:
    session    -- SparkSession factory with scale-tuned defaults
    schemas    -- canonical StructTypes (sensor readings, aggregates, events)
    sources    -- table loaders (parquet test fixtures), Kafka builders,
                  deterministic sensor-reading generator
    functions  -- scalar expression library (reference §2.8 surface)
    operators  -- relational/analytic operators (aggregates, windows,
                  anomaly, alerts, regression, dedup, similarity, text,
                  multimodal)
    plans      -- the named query catalog consumed by __spark_entry__
    streaming  -- Structured Streaming pipeline (watermark + tumbling
                  window agg, dual sink, file-source replay for tests)
"""

from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session

__all__ = ["get_session"]
