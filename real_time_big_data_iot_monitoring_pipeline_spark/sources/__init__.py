from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import TABLES, load_table

__all__ = ["TABLES", "load_table"]
