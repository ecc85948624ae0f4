"""Degenerate-input robustness: Spark 4 runs in ANSI mode by default,
where double division by zero is an ERROR (not IEEE inf, not NULL).
Every operator with a data-dependent denominator must survive the
degenerate group that zeroes it — single-row groups, zero variance,
constant columns, zero vectors, empty strings — and agree with DuckDB's
NULL-on-divide-by-zero semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_big_data_iot_monitoring_pipeline_spark.operators import aggregates, regression, similarity, text, windows


def test_regression_zero_variance_group(spark):
    """All-identical x in a group: slope/intercept NULL, no ANSI error."""
    df = spark.createDataFrame(
        [("a", 1.0, float(i)) for i in range(12)], ["g", "x", "y"]
    )
    rows = regression.fit_per_group(df, "g", "x", "y", min_rows=10).collect()
    assert len(rows) == 1
    assert rows[0].slope is None


def test_histogram_constant_column(spark):
    """min == max: zero bin width must not raise."""
    df = spark.createDataFrame([(7.0,)] * 10, ["x"])
    rows = aggregates.histogram(df, "x").collect()
    assert sum(r.cnt for r in rows) == 10


def test_describe_single_row(spark):
    """n=1: stddev denominator (n-1)=0 -> NULL std, NULL cv."""
    df = spark.createDataFrame([(5.0,)], ["x"])
    r = aggregates.describe_stats(df, "x").collect()[0]
    assert r.n == 1 and r.mean_v == 5.0
    assert r.std_v is None and r.cv_pct is None


def test_cosine_zero_vector(spark):
    """A zero-norm embedding scores NULL cosine, never errors."""
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [2.0, 1.0])], schema
    )
    got = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=5)
    rows = {r.cand_id: r.cosine for r in got.collect()}
    assert rows[1] is None or 1 not in rows  # zero vector: NULL score (sorts last)
    assert rows[2] is not None


def test_quality_score_empty_text(spark):
    """Empty document: zero chars must not raise; ratios go NULL."""
    df = spark.createDataFrame([(1, ""), (2, "the cat and the hat")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in text.quality_score(df).collect()}
    assert rows[1].punct_ratio is None
    assert rows[2].quality is not None


def test_single_event_user_trend(spark):
    """ma_diff_trend-shaped fold: 1-row group denominator (count-1)=0.
    Exercised through the catalog query on a 1-row-per-user frame."""
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        # one event per user: every group is degenerate
        df = spark.createDataFrame(
            [(i, i, float(i), "click", '{"k": 1}') for i in range(5)],
            ["event_id", "user_id", "value", "event_type", "props"],
        ).withColumn("ts", F.timestamp_seconds(F.lit(1704067200) + F.col("event_id")))
        df.select("event_id", "ts", "user_id", "event_type", "value", "props").write.parquet(
            os.path.join(d, "events.parquet")
        )
        out = REGISTRY["ma_diff_trend"].build(spark, d)
        assert out.count() == 0  # all groups filtered (n<2), and no ANSI error
