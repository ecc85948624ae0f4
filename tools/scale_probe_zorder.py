"""Z-order file-skipping probe (round 6): does `layout_zorder_stats`'s
span argument translate into actual FILE SKIPS at scale?

Simulates a zone-map pruner: N synthetic orders rows are laid out into
F equal-count files under (a) a single-key custkey sort and (b) the
Morton z-value sort (same div/mod interleave as the catalog query, 8
bits per dim).  Each file keeps (min, max) per dimension — exactly the
parquet footer stats a scan planner reads.  For a grid of point and
band predicates over BOTH dims, count the files whose box intersects
the predicate, i.e. the files a planner must read.

Usage: python tools/scale_probe_zorder.py [n_rows] [n_files]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_ntile
from real_time_big_data_iot_monitoring_pipeline_spark.plans.engine_queries import _interleave_expr
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic orders: custkey uniform, day correlated with row order
    # (time-ordered ingest, the common real layout) — hash-derived, so
    # deterministic
    base = spark.range(n_rows).select(
        F.col("id"),
        (F.xxhash64(F.col("id")) % 256).alias("cust"),
        ((F.col("id") * 256) / n_rows).cast("long").alias("day"),
    ).withColumn("cust", F.abs("cust"))
    z = base.withColumn("zval", F.expr(_interleave_expr("cust", "day", "div")))

    stats = {}
    for layout, order_cols in (("custkey_sort", ["cust", "id"]), ("zorder", ["zval", "id"])):
        t0 = time.time()
        b = global_ntile(z, order_cols, n_files, out="b")
        rows = (
            b.groupBy("b")
            .agg(
                F.min("cust").alias("c0"),
                F.max("cust").alias("c1"),
                F.min("day").alias("d0"),
                F.max("day").alias("d1"),
            )
            .collect()
        )
        stats[layout] = [(r.c0, r.c1, r.d0, r.d1) for r in rows]
        print(f"{layout}: {n_files} file boxes computed in {time.time() - t0:.1f}s")

    # predicate grid: 64 point queries (cust=c AND day=d) + 16 band
    # queries (8-wide bands on each dim)
    points = [(c, d) for c in range(4, 256, 32) for d in range(4, 256, 32)]
    for layout, boxes in stats.items():
        point_reads = [
            sum(1 for (c0, c1, d0, d1) in boxes if c0 <= c <= c1 and d0 <= d <= d1)
            for c, d in points
        ]
        band_reads = [
            sum(1 for (c0, c1, d0, d1) in boxes if not (c1 < lo or c0 > lo + 7))
            for lo in range(0, 256, 32)
        ] + [
            sum(1 for (c0, c1, d0, d1) in boxes if not (d1 < lo or d0 > lo + 7))
            for lo in range(0, 256, 32)
        ]
        print(
            f"{layout}: point query reads {sum(point_reads) / len(point_reads):.1f}"
            f"/{n_files} files avg (max {max(point_reads)}); "
            f"8-wide band reads cust {sum(band_reads[:8]) / 8:.1f} / "
            f"day {sum(band_reads[8:]) / 8:.1f} files avg"
        )


if __name__ == "__main__":
    main()
