"""Scale probe: sequence packing at 5M documents (~1000x the sf0.1
corpus).  Token counts are synthesized as a column (the post-tokenizer
shape), so the probe measures the packing plan itself — prefix-sum
window per stratum + span explode — with no string processing.

Checks printed:
  * wall time + docs/sec through the full manifest;
  * explode factor (output spans / input docs) vs the theoretical
    1 + total_tokens/budget bound;
  * exact tiling: sum(span_tokens) == total input tokens.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators import sampling
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def main() -> None:
    n_docs = 5_000_000
    budget = 2048
    spark = get_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 16).cast("string").alias("lang"),
            # deterministic pseudo-random doc length 32..2079 tokens —
            # includes docs longer than the budget (multi-span case)
            (F.col("id") * 2654435761 % 2048 + 32).alias("n_tokens"),
        )
    )
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]

    t0 = time.perf_counter()
    manifest = sampling.pack_sequences(
        docs, stratum_col="lang", seq_tokens=budget, tokens_col="n_tokens"
    )
    agg = manifest.agg(
        F.count(F.lit(1)).alias("spans"), F.sum("span_tokens").alias("tokens")
    ).collect()[0]
    dt = time.perf_counter() - t0

    bound = 1 + total_tokens / budget / n_docs
    print(f"docs={n_docs:,} total_tokens={total_tokens:,} budget={budget}")
    print(f"wall={dt:.2f}s  docs/sec={n_docs / dt:,.0f}")
    print(f"spans={agg.spans:,}  explode_factor={agg.spans / n_docs:.4f} (bound {bound:.4f})")
    print(f"tiling_exact={'OK' if agg.tokens == total_tokens else 'MISMATCH'}")
    assert agg.tokens == total_tokens
    assert agg.spans / n_docs <= bound + 1e-9

    # --- overlapping chunking (RAG manifest) at the same 5M docs -------
    # Pure map + explode, no shuffle at all (vs packing's per-stratum
    # prefix-sum window) — the probe shows the shuffle-free plan's
    # throughput and checks the closed-form coverage invariant:
    # every non-final chunk is full, so
    #   sum(tok_len) == total_tokens + (chunks - docs) * (chunk - stride)
    chunk, stride = 512, 384
    t0 = time.perf_counter()
    chunks = sampling.chunk_tokens(docs, tokens_col="n_tokens", chunk=chunk, stride=stride)
    cagg = chunks.agg(
        F.count(F.lit(1)).alias("chunks"), F.sum("tok_len").alias("tokens")
    ).collect()[0]
    cdt = time.perf_counter() - t0
    overlap_tokens = (cagg.chunks - n_docs) * (chunk - stride)
    print(f"chunking: wall={cdt:.2f}s  docs/sec={n_docs / cdt:,.0f}  chunks={cagg.chunks:,}")
    print(
        "coverage_exact="
        + ("OK" if cagg.tokens == total_tokens + overlap_tokens else "MISMATCH")
    )
    assert cagg.tokens == total_tokens + overlap_tokens
    spark.stop()


if __name__ == "__main__":
    main()
