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

    def run_once(name: str) -> tuple[float, str]:
        t0 = time.time()
        try:
            REGISTRY[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 2), ""
        except Exception as e:  # keep sweeping; a broken query must be visible
            return round(time.time() - t0, 2), repr(e)[:80]

    # Two passes: the first includes one-time plan compile / codegen /
    # Python-worker costs; the second is the steady-state data path —
    # the number that actually scales with data volume.
    rows = []
    for name in REGISTRY:
        cold, note = run_once(name)
        warm, note2 = run_once(name)
        rows.append((name, cold, warm, note or note2))

    if "--sort" in sys.argv:
        rows.sort(key=lambda r: -r[2])
    print("| query | cold s | warm s | note |")
    print("|---|---|---|---|")
    for name, cold, warm, note in rows:
        print(f"| {name} | {cold} | {warm} | {note} |")
    total_cold = round(sum(r[1] for r in rows), 1)
    total_warm = round(sum(r[2] for r in rows), 1)
    print(f"\ntotal: cold {total_cold}s / warm {total_warm}s over {len(rows)} queries at {sf_dir}")
    print(json.dumps({"total_cold_sec": total_cold, "total_warm_sec": total_warm, "n": len(rows)}))


if __name__ == "__main__":
    main()
