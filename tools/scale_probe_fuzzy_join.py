"""Fuzzy-join selectivity probe (round 6): quantify what the SymSpell
deletion-neighborhood blocking in `fuzzy_join_deletion1` buys over the
naive all-pairs plan as n grows.

For n synthetic 12-char keys (hash-derived digits, so collisions at
edit distance 1 actually occur), measure:
  * candidate pairs the deletion-variant equi-join generates,
  * verified distance-1 pairs surviving `levenshtein`,
  * the n*(n-1)/2 comparisons the cross join would have scored,
  * wall time of the blocking plan (and of the cross join at the
    smallest n only, as the scaling anchor — it is quadratic).

Usage: python tools/scale_probe_fuzzy_join.py [n1 n2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def blocking_pairs(names):
    var = names.select(
        "name",
        F.explode(
            F.expr(
                "transform(sequence(1, length(name)),"
                " i -> concat(substring(name, 1, i - 1), substring(name, i + 1)))"
            )
        ).alias("variant"),
    ).distinct()
    a = var.select(F.col("name").alias("name_a"), "variant")
    b = var.select(F.col("name").alias("name_b"), "variant")
    cand = (
        a.join(b, "variant")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [5_000, 100_000, 500_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        # 7 hash-derived digits (1e7 key space): at n=500k the space is
        # ~5% full, so distance-1 neighbors genuinely occur
        names = spark.range(n).select(
            F.concat(
                F.lit("K"), F.lpad((F.abs(F.xxhash64("id")) % 9_999_999).cast("string"), 7, "0")
            ).alias("name")
        ).distinct().localCheckpoint(eager=True)
        n_names = names.count()

        t0 = time.time()
        cand = blocking_pairs(names).localCheckpoint(eager=True)
        n_cand = cand.count()
        n_pairs = cand.filter(F.levenshtein("name_a", "name_b") == 1).count()
        t_block = time.time() - t0
        naive = n_names * (n_names - 1) // 2
        print(
            f"n={n_names}: candidates {n_cand} ({n_cand / naive:.2e} of the "
            f"{naive} all-pairs), verified d=1 pairs {n_pairs}, blocking {t_block:.1f}s"
        )

        if n == sizes[0]:
            t0 = time.time()
            a = names.select(F.col("name").alias("name_a"))
            b = names.select(F.col("name").alias("name_b"))
            brute = (
                a.crossJoin(b)
                .filter(F.col("name_a") < F.col("name_b"))
                .filter(F.levenshtein("name_a", "name_b") == 1)
                .count()
            )
            t_brute = time.time() - t0
            assert brute == n_pairs, f"blocking missed pairs: {brute} vs {n_pairs}"
            print(
                f"   cross-join anchor at n={n_names}: {t_brute:.1f}s "
                f"({t_brute / t_block:.1f}x blocking) and RECALL VERIFIED equal"
            )


if __name__ == "__main__":
    main()
