"""Per-round full-catalog timing sweep (round-1 verdict, next-round #8):
times EVERY catalog query at $SPARK_GRAFT_SF_DIR with the noop sink and
prints a markdown table for PERF.md, so regressions in non-headline
queries stay visible as the catalog grows.

Usage: python tools/perf_all.py [--sort]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmups: JVM/codegen and the Python runner fork.
    REGISTRY["global_kpis"].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F

    from real_time_big_data_iot_monitoring_pipeline_spark.operators.similarity import norm2_q
    from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

    load_table(spark, sf_dir, "embeddings").limit(256).select(
        norm2_q(F.col("embedding"))
    ).write.format("noop").mode("overwrite").save()

    rows = []
    for name in REGISTRY:
        t0 = time.time()
        try:
            REGISTRY[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rows.append((name, round(time.time() - t0, 2), ""))
        except Exception as e:  # keep sweeping; a broken query must be visible
            rows.append((name, round(time.time() - t0, 2), repr(e)[:80]))

    if "--sort" in sys.argv:
        rows.sort(key=lambda r: -r[1])
    print("| query | sec | note |")
    print("|---|---|---|")
    for name, sec, note in rows:
        print(f"| {name} | {sec} | {note} |")
    total = round(sum(r[1] for r in rows), 1)
    print(f"\ntotal: {total}s over {len(rows)} queries at {sf_dir}")
    print(json.dumps({"total_sec": total, "n": len(rows)}))


if __name__ == "__main__":
    main()
