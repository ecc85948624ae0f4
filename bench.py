#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Execution is measured with the noop sink (full plan runs, results
discarded) so timing reflects engine work, not driver-side collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "flagship_window_agg",
    "pricing_summary",
    "join_star_revenue",
    "rolling_avg_20",
    "iqr_anomaly",
    "session_window_agg",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "embedding_cosine_neardups",
    "embedding_ivf_topk",
    "embedding_ivf_kmeans_topk",
    "text_token_stats",
    "asof_join_events",
    "returned_items_report",
    "curation_pipeline",
    "tfidf_top_terms",
    "resample_gap_fill",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
    from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session

    # NOTE: no spark.driver.memory override — measured: a 16g heap makes the
    # array-heavy queries (cosine top-k) 4-10x slower on this JVM (GC regime),
    # and the conf only applies if this is the first session anyway.
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: JVM/codegen/file-listing startup shouldn't be billed
    # to whichever query happens to run first.
    REGISTRY["global_kpis"].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # ... nor should Python-runner startup (worker fork + numpy/pandas
    # import) be billed to the first Arrow-kernel query: warm it with a
    # tiny mapInPandas/pandas_udf pass.
    from pyspark.sql import functions as F
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.similarity import norm2_q
    from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

    load_table(spark, sf_dir, "embeddings").limit(256).select(
        norm2_q(F.col("embedding"))
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        df = q.build(spark, sf_dir)  # warm plan construction (lazy)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
