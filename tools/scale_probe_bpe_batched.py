"""Batched-merge BPE probe (round-4 verdict item 5): a production 32k
vocabulary means 32k merge rounds, and the trainer in
`plans/mlprep_queries.py` is deliberately one Spark job per merge — BPE
is inherently sequential.  The known mitigation is BATCHING: per round,
take the top-K pairs, greedily keep a subset whose symbols are pairwise
DISJOINT (if two merges share no symbol, their ',a,b,' windows can
never overlap, so applying them in one pass is order-independent and
byte-identical to applying them one at a time), and apply the whole
batch as chained replaces in a single job.  Canonical BPE re-counts
after every single merge, so batching deviates exactly where a
top-ranked pair's count would have been CHANGED by a higher-ranked
merge sharing a symbol — the disjointness rule excludes those, and the
residual deviation is only rank-order drift among ties.

This probe trains R merges both ways on the sf0.1 documents fixture and
reports wall time, number of Spark rounds, and the merge-set agreement.

Usage: python tools/scale_probe_bpe_batched.py [sf_dir] [R] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def pair_counts(w):
    arr = F.filter(F.split("enc", ","), lambda x: x != F.lit(""))
    return (
        w.select(arr.alias("arr"), "freq")
        .filter(F.size("arr") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("arr") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("arr"), i).alias("a"),
                        F.element_at(F.col("arr"), i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
            "freq",
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def apply_merges(w, batch):
    enc = F.col("enc")
    for a, b in batch:
        enc = F.replace(enc, F.lit(f",{a},{b},"), F.lit(f",{a}{b},"))
    return w.select(enc.alias("enc"), "freq").localCheckpoint(eager=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    enc = F.concat(F.lit(","), F.array_join(F.split("word", ""), ","), F.lit(","))
    base = words.select(enc.alias("enc"), "freq").localCheckpoint(eager=True)

    # --- sequential: one argmax collect + one replace job per merge ----
    t0 = time.time()
    w = base
    seq_merges = []
    for _ in range(R):
        top = pair_counts(w).orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()[0]
        seq_merges.append((top.a, top.b))
        w = apply_merges(w, [(top.a, top.b)])
    t_seq = time.time() - t0
    print(f"sequential: {R} merges in {R} rounds, {t_seq:.2f}s")

    # --- batched: top-K disjoint merges per round ----------------------
    t0 = time.time()
    w = base
    bat_merges: list[tuple[str, str]] = []
    rounds = 0
    while len(bat_merges) < R:
        rounds += 1
        cand = (
            pair_counts(w).orderBy(F.col("cnt").desc(), "a", "b").limit(4 * K).collect()
        )
        used: set[str] = set()
        batch = []
        for row in cand:
            if len(batch) >= K or len(bat_merges) + len(batch) >= R:
                break
            if row.a in used or row.b in used:
                continue
            used.update((row.a, row.b, row.a + row.b))
            batch.append((row.a, row.b))
        bat_merges.extend(batch)
        w = apply_merges(w, batch)
    t_bat = time.time() - t0
    agree = len(set(seq_merges) & set(bat_merges))
    print(
        f"batched(K={K}): {len(bat_merges)} merges in {rounds} rounds, {t_bat:.2f}s "
        f"({t_seq / t_bat:.2f}x faster); merge-set agreement {agree}/{R}"
    )


if __name__ == "__main__":
    main()
