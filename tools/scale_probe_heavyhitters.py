"""Scale probe: exact 2-pass heavy hitters (Space-Saving candidates +
verify) vs the naive full-vocabulary GROUP BY, on a synthetic Zipfian
token stream much larger than the fixtures.

Measures (a) wall time of both plans, (b) the candidate-set size the
sketch pass emits (the only data-dependent intermediate), and
(c) agreement of the final answers — the 2-pass plan's exactness claim.

Run: PYTHONPATH=/root/repo python tools/scale_probe_heavyhitters.py [n_tokens]
Results recorded in PERF.md (round-6 continuation notes).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.plans.sketch_queries import (
    _spacesaving_candidates,
)
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def main(n_tokens: int = 5_000_000) -> None:
    spark = get_session(
        master="local[8]", shuffle_partitions=32, extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Zipf head + heavy unique tail: 60% of tokens draw from a ~1/rank
    # head, 40% are near-unique long-tail terms — the regime real
    # corpora live in, where the full GROUP BY must shuffle the entire
    # multi-hundred-million-term vocabulary while the 2-pass plan
    # shuffles only the few hundred sketch candidates.
    toks = (
        spark.range(n_tokens)
        .select(F.col("id"), ((F.col("id") * 2654435761) % 4294967296).alias("h"))
        .select(
            F.when(
                F.col("h") % 10 < 6,
                F.concat(
                    F.lit("tok"),
                    F.least(
                        F.floor(4294967296.0 / (F.col("h") + 1)).cast("long"),
                        F.lit(200000),
                    ).cast("string"),
                ),
            )
            .otherwise(F.concat(F.lit("uniq"), (F.col("id") % (n_tokens // 2)).cast("string")))
            .alias("term")
        )
    )
    toks.persist().count()

    t0 = time.time()
    full = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    tot = full.agg(F.sum("n").alias("nt")).collect()[0]["nt"]
    naive = {
        r["term"]: r["n"]
        for r in full.where(200 * F.col("n") > F.lit(tot)).collect()
    }
    t_naive = time.time() - t0

    t0 = time.time()
    cands = _spacesaving_candidates(toks, m=400)
    n_cands = cands.count()
    exact = (
        toks.withColumn("th", F.xxhash64("term"))
        .join(F.broadcast(cands), "th", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    twopass = {
        r["term"]: r["n"]
        for r in exact.where(200 * F.col("n") > F.lit(tot)).collect()
    }
    t_two = time.time() - t0

    assert twopass == naive, (
        f"2-pass disagreed with naive: {len(twopass)} vs {len(naive)} hitters"
    )
    vocab = full.count()
    print(
        f"n_tokens={n_tokens} vocab={vocab} hitters={len(naive)} "
        f"candidates={n_cands} naive={t_naive:.2f}s twopass={t_two:.2f}s "
        f"(agree: True)"
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000)
