"""Scale probe for `dedup.exact_substring_profile`: runs the span-level
dedup on a synthetically amplified corpus (each fixture document cloned
N times — two verbatim clones so cross-document duplicated spans really
exist, the rest suffix-perturbed so they don't trivially collapse).

The question this answers for the 100 TB design review: the rolling
8-gram fan-out is ~1 window row per token — does the plan stay
(map-side window transform) -> (one gram-keyed shuffle) -> (two keyed
joins), with wall-clock linear in token count, when the corpus is 20x
the bench fixture?

Usage: python tools/scale_probe_exact_substring.py [copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators.dedup import (
    exact_substring_profile,
)
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    spark = get_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "6g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    big = (
        docs.select(
            "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("c")
        )
        .select(
            (F.col("doc_id") * copies + F.col("c")).alias("doc_id"),
            # first two copies verbatim (true duplicated spans), the rest
            # perturbed with a per-copy suffix token
            F.when(F.col("c") < 2, F.col("text"))
            .otherwise(F.concat_ws(" ", "text", F.concat(F.lit("uniq"), F.col("c"))))
            .alias("text"),
        )
    )
    n_docs = big.count()
    n_tokens = big.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    print(f"amplified corpus: {n_docs} docs, {n_tokens} tokens ({copies}x sf0.1)")

    for label, hashed in (("string-key (oracle path)", False), ("xxhash64-key (scale path)", True)):
        t = time.perf_counter()
        out = exact_substring_profile(big, n=8, hash_grams=hashed)
        stats = out.agg(
            F.count(F.lit(1)), F.sum("n_spans"), F.sum("n_dup_spans")
        ).collect()[0]
        dt = time.perf_counter() - t
        print(
            f"{label}: {dt:.2f}s  docs={stats[0]} spans={stats[1]} dup_spans={stats[2]}  "
            f"({stats[1] / dt / 1e6:.2f}M windows/s)"
        )


if __name__ == "__main__":
    main()
