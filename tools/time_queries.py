"""Targeted per-query timing: build+noop-save each named query REPS
times in one session (cold first pass, then warm medians) with a
calibration probe before and after — the round-13 A/B harness for
non-headline optimizations (run it in the old and new tree, same core
width, and compare medians at comparable probe readings).

Usage: SPARK_GRAFT_CPUS=8 python tools/time_queries.py <reps> <name ...>
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    reps, names = int(sys.argv[1]), sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from bench import _calibration_probe
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
    from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session

    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["global_kpis"].build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    print(f"probe(pre)={_calibration_probe(spark)}")
    for name in names:
        times = []
        for i in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REGISTRY[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        warm = times[1:] or times
        print(
            f"{name}: cold={times[0]} warm_med={statistics.median(warm):.3f} "
            f"all={times}"
        )
    print(f"probe(post)={_calibration_probe(spark)}")
    spark.stop()


if __name__ == "__main__":
    main()
