"""Scale probe for `graph.pagerank_micro`: synthesizes a weighted
bipartite graph far beyond the fixture trade graph (power-law out-degree
on the left side — the realistic web/trade shape) and measures the
fixed-iteration cost.

The question this answers for the 100 TB design review: is per-iteration
cost exactly two shuffles over the edge table (join on src + agg on
dst), with the edge-build join paid ONCE (localCheckpoint), and does
wall-clock scale linearly in edges while rank-table traffic stays one
slim row per node?

Usage: python tools/scale_probe_pagerank.py [n_left] [avg_degree]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators.graph import pagerank_micro
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_right = max(n_left // 100, 1)

    spark = get_session(
        master="local[32]",
        shuffle_partitions=32,
        # 5M+ exploded edges + a 200k-row broadcast build side need more
        # than the 1g default driver heap (probe-only; bench keeps the
        # default deliberately — see bench.py's GC note)
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "6g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Power-law-ish degrees: node i gets 1 + (avg_deg * 2) * (i mod 7 == 0
    # ? 7 : 1) / 2 edges — hash-derived targets, fully deterministic.
    edges = (
        spark.range(n_left)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.when(F.col("id") % 7 == 0, avg_deg * 4 - 1).otherwise(avg_deg - 1),
                )
            ).alias("j"),
        )
        .select(
            "src",
            (F.lit(10_000_000) + F.pmod(F.xxhash64("src", "j"), F.lit(n_right))).alias("dst"),
            (F.pmod(F.xxhash64("j", "src"), F.lit(5)) + 1).alias("weight"),
        )
    )
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    n_edges = both.count()
    print(f"graph: {n_left} left x {n_right} right nodes, {n_edges} directed edges")

    for iters in (1, 3):
        t = time.perf_counter()
        out = pagerank_micro(both, iterations=iters)
        top = out.orderBy(F.col("rank_micro").desc(), "node").limit(3).collect()
        dt = time.perf_counter() - t
        print(
            f"iterations={iters}: {dt:.2f}s  "
            f"top ranks {[(r.node, r.rank_micro) for r in top]}"
        )
    print(
        "per-iteration marginal cost above is the 2-shuffle loop body; "
        "the iterations=1 run carries the one-time edge checkpoint."
    )


if __name__ == "__main__":
    main()
