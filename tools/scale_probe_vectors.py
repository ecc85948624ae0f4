"""Scale probe for the Arrow vector kernels (PERF.md evidence): replicate
the sf0.1 embedding corpus 20x (100k vectors) and measure the warm
steady-state throughput of (a) brute-force scoring of the corpus against
a 100-query broadcast matrix, (b) L2 nearest-centroid assignment against
64 centroids, (c) the thresholded near-dup kernel against a 1k-doc
broadcast block.  Each measured twice; the second (warm) number is the
one that scales.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators import similarity as S
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

REPLICATE = 250


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            # the probe caches a 256 MB corpus and pushes ~500 MB/pass of
            # Arrow traffic through 32 concurrent tasks: the 1 GiB local
            # defaults for heap AND netty's direct-buffer pool both
            # overflow.  4 GiB is enough without entering the
            # large-heap GC regime that slowed the array kernels at 16g.
            "spark.driver.memory": "4g",
            "spark.driver.extraJavaOptions": "-XX:MaxDirectMemorySize=4g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = S.as_double_vec(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    reps = spark.range(REPLICATE).select(F.col("id").alias("rep"))
    corpus = (
        base.crossJoin(reps)
        .select((F.col("vec_id") * REPLICATE + F.col("rep")).alias("vec_id"), "embedding")
        .repartition(int(cpus))
        .cache()
    )
    n = corpus.count()
    print(f"corpus: {n} vectors x 64 dims")

    queries = [(r[0], r[1]) for r in corpus.limit(100).collect()]
    block = [(r[0], r[1]) for r in corpus.limit(1000).collect()]
    cents = [(r[0], r[1]) for r in corpus.limit(64).collect()]

    def run(label, df, m):
        for i in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            print(f"{label} pass{i}: {dt:.2f}s  ({n / dt / 1e6:.2f}M vec/s, "
                  f"{n * m / dt / 1e6:.0f}M scored pairs/s)")

    run("topk_score_100q", S.score_against_matrix(corpus, queries), 100)

    # Broadcast-ceiling probe (round-2 verdict #5): 10k queries ~ 5 MB of
    # float64 matrix.  As an explicit sc.broadcast it ships once per
    # executor, so per-task overhead stays flat vs the 100-query run —
    # the un-replicated corpus keeps the matmul cost itself small enough
    # that any per-task re-serialization would dominate the timing.
    nb = base.count()
    q10k = [
        (i, queries[i % len(queries)][1]) for i in range(10_000)
    ]
    for i in range(2):
        t0 = time.time()
        S.score_against_matrix(base, q10k, min_cosine=0.999).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        print(
            f"broadcast_10k_queries pass{i}: {dt:.2f}s over {nb} vectors "
            f"({nb * 10_000 / dt / 1e6:.0f}M scored pairs/s)"
        )
    run("assign_64_centroids", S.assign_nearest_centroid(corpus, cents, quantized=False), 64)
    run(
        "neardup_vs_1k_block(thr=.35)",
        S.score_against_matrix(corpus, block, min_cosine=0.35 - 1e-6, upper_only=True),
        1000,
    )

    # Persisted-index serving shape at 500k vectors: one-time build
    # (k-means + assignment pass + cid-partitioned write) then pruned
    # queries that read ~nprobe/k of the corpus.
    import tempfile

    idx = tempfile.mkdtemp(prefix="rtbd_ivf_idx_probe_")
    # keep_vec carries the 512-byte vectors back through Arrow output on
    # 32 concurrent tasks; cap the batch size so direct memory stays
    # bounded (default 10k-row batches x 32 tasks exceeds the 1 GiB
    # default MaxDirectMemorySize on this single-JVM probe)
    spark_sess = corpus.sparkSession
    spark_sess.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
    t0 = time.time()
    S.build_ivf_index(corpus, idx, k=8, iters=1)
    bt = time.time() - t0
    print(f"ivf_index_build(k=8, 1 Lloyd iter): {bt:.2f}s  ({n / bt / 1e6:.2f}M vec/s indexed)")
    spark = corpus.sparkSession
    queries_df = corpus.limit(5)
    for i in range(2):
        t0 = time.time()
        S.query_ivf_index(spark, idx, queries_df, topk=10, nprobe=2).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        print(f"ivf_index_query(5q, nprobe=2) pass{i}: {dt:.2f}s (reads ~2/8 of corpus via partition pruning)")
    spark_sess.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")


if __name__ == "__main__":
    main()
