"""Crossover probe for `dedup_components_incremental` (round-4 verdict
item 3): the catalog fixture runs the incremental closure at a 20% new
batch — OUTSIDE the operator's own payoff condition (delta ≪ corpus) —
and honestly costs more there than the one-shot closure.  This probe
MEASURES the crossover instead of asserting it: it sweeps the new-batch
fraction (20% → 1%) and times

  * one-shot  : full ngram-Jaccard pair gen over ALL docs + full
                min-label closure (what you'd run from scratch), vs
  * incremental: new-batch shingles joined vs the corpus shingle set,
                old endpoints contracted to their persisted component
                labels, closure over the contracted DELTA subgraph
                only, then relabel-join against the store.

Store construction (the corpus-sized work the incremental path
amortizes) is excluded from the timing — it is paid once at bootstrap,
which is exactly the operator's contract.

Usage: python tools/scale_probe_incremental_crossover.py [sf_dir]
Writes one result line per fraction; paste the table into PERF.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators import dedup
from real_time_big_data_iot_monitoring_pipeline_spark.operators.dedup import (
    duplicate_components,
    ngram_jaccard_pairs,
    word_shingles,
)
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def incremental_labels(spark, docs, store, mod: int):
    """The catalog query's plan shape with the batch = doc_id % mod == 0."""
    sh_all = dedup.word_shingles(docs, k=3)
    sh_new = sh_all.filter(F.col("doc_id") % mod == 0)
    sizes = sh_all.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    joined = (
        sh_new.alias("n")
        .join(sh_all.alias("o"), F.col("n.shingle") == F.col("o.shingle"))
        .filter(F.col("n.doc_id") != F.col("o.doc_id"))
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_b"),
            F.col("n.shingle").alias("shingle"),
        )
    )
    inter = joined.groupBy("id_a", "id_b").agg(F.count_distinct("shingle").alias("inter"))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    delta_pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")) >= 0.1)
        .select("id_a", "id_b")
    )
    lbl = store.select(F.col("doc_id").alias("_d"), F.col("component_id").alias("_l"))
    mapped = (
        delta_pairs.join(
            lbl.withColumnRenamed("_d", "id_a").withColumnRenamed("_l", "la"), "id_a", "left"
        )
        .join(lbl.withColumnRenamed("_d", "id_b").withColumnRenamed("_l", "lb"), "id_b", "left")
        .select(
            F.coalesce(F.col("la"), F.col("id_a")).alias("id_a"),
            F.coalesce(F.col("lb"), F.col("id_b")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    solve = duplicate_components(mapped).select(
        F.col("doc_id").alias("node"), F.col("component_id").alias("new_label")
    )
    relabeled = store.join(solve, store.component_id == solve.node, "left").select(
        "doc_id", F.coalesce(F.col("new_label"), F.col("component_id")).alias("component_id")
    )
    return relabeled


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # one-shot baseline: full pair gen + full closure (warm: 2nd run)
    for tag in ("cold", "warm"):
        t0 = time.time()
        full = duplicate_components(ngram_jaccard_pairs(docs, k=3, threshold=0.1))
        n_full = full.count()
        one_shot = time.time() - t0
        print(f"one-shot {tag}: {one_shot:.2f}s  ({n_docs} docs, {n_full} labeled nodes)")

    tmp = tempfile.mkdtemp(prefix="inc_cross_")
    try:
        for mod in (5, 20, 50, 100):
            frac = 100.0 / mod
            old_docs = docs.filter(F.col("doc_id") % mod != 0)
            store_path = os.path.join(tmp, f"store_{mod}")
            # untimed bootstrap: persisted labels for the old slice
            duplicate_components(
                ngram_jaccard_pairs(old_docs, k=3, threshold=0.1)
            ).select("doc_id", "component_id").write.mode("overwrite").parquet(store_path)
            store = spark.read.parquet(store_path)
            # warm the input cache paths once, then time
            for tag in ("cold", "warm"):
                t0 = time.time()
                n = incremental_labels(spark, docs, store, mod).count()
                dt = time.time() - t0
                print(
                    f"incremental {tag} @ {frac:4.1f}% batch (mod {mod}): "
                    f"{dt:.2f}s  ({n} store rows relabeled-or-kept)"
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
