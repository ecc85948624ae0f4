"""Scale probe: k-core peeling round cost and convergence depth on a
synthetic power-law-ish graph much larger than the fixture edge sample.

The catalog query (`kcore_decomposition`) runs 6 fixed rounds on the
co-purchase sample; the scale questions are (a) how per-round cost
behaves as edges grow (each round should be one degree agg + two
semi-joins, edges-sized), and (b) how deep real peeling runs before the
fixpoint, which bounds the round count a production job schedules.

Run: PYTHONPATH=/root/repo python tools/scale_probe_kcore.py [n_edges]
Results recorded in PERF.md (round-6 continuation notes).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def main(n_edges: int = 2_000_000, k: int = 3) -> None:
    spark = get_session(
        master="local[8]", shuffle_partitions=32, extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # power-law-ish endpoints via inverse hash (same recipe as the
    # heavy-hitter probe) over ~n/4 nodes; self-loops dropped.
    e = (
        spark.range(n_edges)
        .select(
            F.least(
                F.floor(4294967296.0 / (((F.col("id") * 2654435761) % 4294967296) + 1)),
                F.lit(n_edges // 4),
            )
            .cast("long")
            .alias("u"),
            (((F.col("id") * 1000003 + 17) % 1000000007) % (n_edges // 4)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym.persist()
    n0 = sym.count() // 2
    print(f"edges={n0} nodes~{n_edges // 4}")
    prev_edges = None
    for r in range(1, 21):
        t0 = time.time()
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("dg"))
        keep = deg.where(F.col("dg") >= k).select(F.col("u").alias("node"))
        sym = (
            sym.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
            .select("u", "v")
        )
        if r % 2 == 0:
            sym = sym.localCheckpoint(eager=False)
        n_edges_now = sym.count() // 2
        dt = time.time() - t0
        print(f"round {r}: edges={n_edges_now} ({dt:.2f}s)")
        if n_edges_now == prev_edges:
            print(f"fixpoint at round {r}")
            break
        prev_edges = n_edges_now
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000)
