"""Partition-count fuzz for the determinism contract (round-1 verdict,
next-round #5): every oracle-bearing catalog query must produce an
IDENTICAL canonical value hash under different shuffle layouts and input
split sizes.  The 69 green driver hashes ride on the cents/NTZ/round_det
discipline; this catches an order-of-summation regression locally before
a driver round burns on it.

Each query runs under three (shuffle.partitions, maxPartitionBytes)
settings — the conf is runtime-mutable, so one session serves all three.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

# round-13: close-gate-only sweep leg (per-query partition-count fuzz sweep) — see pytest.ini
pytestmark = pytest.mark.slow

from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
from tests.compare import normalize

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)

# (shuffle partitions, file split bytes): 1 partition = single-threaded
# summation order; 7 = odd/uneven; 32 = the production default.  The small
# split size forces multi-split file scans even at sf0.001.
LAYOUTS = (("1", "128m"), ("7", "64k"), ("32", "1m"))

# Computed once per session from a parquet staging replay; cached after
# the first call, so re-running under another layout would not exercise a
# different plan anyway.
SKIP = {"stream_tumbling_window"}


def _value_hash(pdf: pd.DataFrame) -> str:
    canon = normalize(pdf)
    payload = canon.to_csv(index=False, float_format="%.10g").encode()
    return hashlib.sha256(payload).hexdigest()


@pytest.mark.parametrize("name", [n for n in ORACLE_QUERIES if n not in SKIP])
def test_partition_layout_invariant(name, spark, sf_dir):
    q = REGISTRY[name]
    saved_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    saved_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    hashes = {}
    try:
        for nparts, split in LAYOUTS:
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            spark.conf.set("spark.sql.files.maxPartitionBytes", split)
            hashes[(nparts, split)] = _value_hash(q.build(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_shuffle)
        spark.conf.set("spark.sql.files.maxPartitionBytes", saved_split)
    distinct = set(hashes.values())
    assert len(distinct) == 1, f"{name}: layout-dependent results {hashes}"
