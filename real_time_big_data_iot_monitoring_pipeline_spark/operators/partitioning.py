"""Scan-parallelism guard for compute-heavy map stages.

A parquet file with one row group scans as ONE task no matter how many
cores the cluster has — Spark splits files by byte range, but a split
only materializes the row groups whose midpoint it covers.  The driver
fixtures are single-row-group files, so without intervention every
expression-heavy projection (minhash signatures, regex quality gates)
and every Arrow kernel (similarity matmuls) runs single-threaded while
31 cores idle.

`ensure_min_parallelism` round-robin-repartitions ONLY when the input
has fewer partitions than the session's default parallelism.  On a real
cluster a 100 TB scan arrives as tens of thousands of splits, so the
guard makes this a structural no-op there — no extra exchange is ever
added to an already-parallel plan.  Locally (and for any small
broadcast-side frame that feeds a heavy kernel) it converts the one
shuffle of the input rows into a full-width map stage, which pays for
itself whenever per-row work dominates row movement — exactly the
operators this is applied to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition `df` up to `min_parts` (default: the session's
    `sparkContext.defaultParallelism`) iff it currently has fewer
    partitions; otherwise return it unchanged (no exchange added)."""
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_parts:
        return df
    return df.repartition(min_parts)
