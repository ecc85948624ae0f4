"""Scale probe for `dedup.duplicate_components` (min-label propagation):
synthesizes a near-dup pair graph far beyond the fixtures — many small
clusters (the realistic dedup shape), a heavy tail of larger clusters,
and a few long chains (worst-case diameter) — and measures per-round
cost and convergence.

The question this answers for the 100 TB design review: does the
iterative loop's cost stay one join + one agg per round with bounded
rounds, when the pair graph has hundreds of thousands of edges?

Usage: python tools/scale_probe_components.py [n_clusters] [chain_len]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators.dedup import duplicate_components
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Star clusters: cluster c spans ids [10c, 10c + sz); edges hub->spoke.
    # Sizes cycle 2..6 — the realistic dedup distribution (mostly pairs).
    base = spark.range(n_clusters).select(
        (F.col("id") * 10).alias("hub"), ((F.col("id") % 5) + 2).alias("sz")
    )
    stars = base.select(
        "hub", F.explode(F.sequence(F.lit(1), F.col("sz") - 1)).alias("off")
    ).select(F.col("hub").alias("id_a"), (F.col("hub") + F.col("off")).alias("id_b"))
    # One long chain (worst-case diameter) placed above the star id range.
    lo = n_clusters * 10
    chain = spark.range(chain_len).select(
        (F.col("id") + lo).alias("id_a"), (F.col("id") + lo + 1).alias("id_b")
    )
    pairs = stars.union(chain).cache()
    n_edges = pairs.count()
    print(f"edges: {n_edges:,} (clusters={n_clusters:,}, chain diameter={chain_len})")

    t0 = time.time()
    out = duplicate_components(pairs)
    n_nodes = out.count()
    dt = time.time() - t0
    comp = out.groupBy().agg(
        F.countDistinct("component_id").alias("n_components"),
        F.max("component_size").alias("max_size"),
    ).collect()[0]
    print(
        f"components: {comp.n_components:,} over {n_nodes:,} nodes, "
        f"max cluster {comp.max_size} — {dt:.1f}s total "
        f"({n_edges / dt / 1e3:.0f}k edges/s through the full fixpoint loop)"
    )
    expect = n_clusters + 1
    assert comp.n_components == expect, (comp.n_components, expect)
    assert comp.max_size == chain_len + 1


if __name__ == "__main__":
    main()
