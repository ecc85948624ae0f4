"""Canonical schemas.

The reference enforces a strict StructType on the wire instead of streaming
schema inference (reference ``spark_streaming.py:43-50``; rationale in its
``Project Depth.md:66-68``) — we keep that discipline everywhere: every
source declares its schema, nothing is inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Wire/raw schema of one sensor reading (reference ``spark_streaming.py:43-50``,
#: produced at ``mqtt_producer.py:43-51``, stored by ``init.sql:2-11``).
SENSOR_READING_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("humidity", T.DoubleType(), True),
        T.StructField("pressure", T.DoubleType(), True),
    ]
)

#: Windowed rollup row (reference ``spark_streaming.py:152-176`` flattened at
#: ``:167-169``, stored by ``init.sql:14-26``).
SENSOR_AGGREGATE_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), True),
        T.StructField("window_start", T.TimestampType(), True),
        T.StructField("window_end", T.TimestampType(), True),
        T.StructField("avg_temperature", T.DoubleType(), True),
        T.StructField("avg_humidity", T.DoubleType(), True),
        T.StructField("avg_pressure", T.DoubleType(), True),
        T.StructField("min_temperature", T.DoubleType(), True),
        T.StructField("max_temperature", T.DoubleType(), True),
        T.StructField("reading_count", T.LongType(), True),
    ]
)

#: Driver fixture `events` table after timestamp normalization
#: (sources/tables.py) — the batch stand-in for sensor_readings
#: (FIXTURES.md §B mapping).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: Location -> coordinates dimension (reference
#: ``streamlit_dashboard.py:746-757``; denormalized variant ``app.py:52-63``).
LOCATION_DIM_SCHEMA = T.StructType(
    [
        T.StructField("location", T.StringType(), False),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
    ]
)
