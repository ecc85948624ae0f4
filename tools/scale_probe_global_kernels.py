"""Scale probe for the global-order kernels in `operators/windows`
(`global_ntile` / `global_row_number` / `global_running_sum` /
`global_running_max`): at fixture scale the swap from a single-task
`Window.orderBy` is invisible, so this probe measures both plans on a
synthetic frame big enough for the single task to hurt — the evidence
that the round-5 NTILE/prefix swap is a real scale fix, not a
plan-shape aesthetic.

Both plans produce identical results (asserted on a sample); timings
compare the kernel (range repartition + per-partition work + P-entry
broadcast offsets, fully parallel) against the naive global window
(every row through ONE task).

Usage: python tools/scale_probe_global_kernels.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import (
    global_ntile,
    global_running_sum,
)
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def timed(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:42s} {dt:7.2f}s")
    return dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = (
        spark.range(n)
        .withColumn("v", F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        .withColumn("wt", F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)) + 1)
    )
    df.write.format("noop").mode("overwrite").save()  # warm the scan

    print(f"rows: {n:,}")
    # --- NTILE(10) ------------------------------------------------------
    t_kernel = timed("global_ntile kernel", global_ntile(df, ["v", "id"], 10, out="b"))
    t_naive = timed(
        "naive Window.orderBy ntile",
        df.select("id", F.ntile(10).over(Window.orderBy("v", "id")).alias("b")),
    )
    print(f"  -> ntile speedup {t_naive / t_kernel:.1f}x\n")

    # --- prefix sum -----------------------------------------------------
    t_kernel = timed(
        "global_running_sum kernel", global_running_sum(df, ["v", "id"], "wt", out="c")
    )
    t_naive = timed(
        "naive Window.orderBy cumsum",
        df.select(
            "id",
            F.sum("wt")
            .over(Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0))
            .alias("c"),
        ),
    )
    print(f"  -> prefix-sum speedup {t_naive / t_kernel:.1f}x\n")

    # correctness spot check at a bounded size — the naive side's single
    # sorter task holds its whole input in one heap, so verifying at the
    # full probe scale would OOM the very plan this probe exists to
    # replace (exact equality at every N is already pinned by
    # tests/test_operators.py on the kernel).
    nv = min(n, 2_000_000)
    small = df.limit(nv)
    k = global_ntile(small, ["v", "id"], 10, out="got")
    w = small.select("id", F.ntile(10).over(Window.orderBy("v", "id")).alias("want"))
    bad = k.join(w, "id").filter(F.col("got") != F.col("want")).count()
    print(f"ntile mismatches vs naive at {nv:,} rows: {bad}")
    assert bad == 0


if __name__ == "__main__" and (len(sys.argv) <= 2 or sys.argv[2] != "max"):
    main()


def extra(n: int = 20_000_000) -> None:
    """Follow-up measurements: the prefix-max kernel and the full
    weighted-median pipeline at probe scale (invoked by running this
    module with `max` as the second argument)."""
    import os
    import sys
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import (
        global_running_max,
        global_running_sum,
    )
    from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n)
        .withColumn("v", F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        .withColumn("wt", F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)) + 1)
    )
    df.write.format("noop").mode("overwrite").save()
    print(f"rows: {n:,}")
    # end-to-end weighted median FIRST: the naive single-task window
    # below leaves the heap fragmented enough to destabilize later jobs
    # (observed GCLocker thrash) — which is itself probe evidence
    t0 = time.time()
    pv = df.groupBy("v").agg(F.sum("wt").alias("wt"))
    c = global_running_sum(pv, ["v"], "wt", out="cum")
    med = c.filter(2 * F.col("cum") >= F.col("_grs_total")).agg(F.min("v")).collect()[0][0]
    print(f"weighted median end-to-end: {time.time() - t0:7.2f}s (median v = {med})")
    t_kernel = timed(
        "global_running_max kernel (exclusive)",
        global_running_max(df, ["v", "id"], "wt", out="m", inclusive=False),
    )
    t_naive = timed(
        "naive Window.orderBy cummax",
        df.select(
            "id",
            F.max("wt")
            .over(Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, -1))
            .alias("m"),
        ),
    )
    print(f"  -> prefix-max speedup {t_naive / t_kernel:.1f}x")


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "max":
    extra(int(sys.argv[1]))
