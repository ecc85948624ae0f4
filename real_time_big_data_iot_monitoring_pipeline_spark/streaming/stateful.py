"""Custom stateful streaming operator via `applyInPandasWithState` —
the Spark primitive for operators the built-in windowed aggregations
can't express (SURVEY §2.9 notes the reference has none; this is the
engine's extension point for them).

Implemented operator: per-sensor exponentially-weighted moving average
(EWMA) with threshold-crossing detection.  State per key is O(1) — the
running EWMA and a counter — so state-store size scales with sensor
count, not event count: the property that keeps an unbounded stream's
state bounded on a 1000-executor cluster.

The kernel is Arrow-batched pandas (not row-at-a-time), and it is pure
per (key, state, batch), so micro-batch replays after failure recompute
identical state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n_crossings", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n_crossings", T.LongType()),
    ]
)


def ewma_update(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    alpha: float = 0.2,
    threshold: float = 30.0,
) -> Iterator[pd.DataFrame]:
    """Fold a micro-batch of readings into the per-sensor EWMA state.

    Deterministic contract: rows are processed in (timestamp, value)
    order within the batch, so the resulting state is independent of
    upstream partition file ordering.
    """
    if state.exists:
        n_seen, ewma, n_crossings = state.get
    else:
        n_seen, ewma, n_crossings = 0, None, 0

    for pdf in batches:
        pdf = pdf.sort_values(["timestamp", "temperature"])
        for v in pdf["temperature"]:
            prev = ewma
            ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
            if prev is not None and (prev <= threshold) != (ewma <= threshold):
                n_crossings += 1
            n_seen += 1

    state.update((n_seen, float(ewma) if ewma is not None else None, n_crossings))
    yield pd.DataFrame(
        {
            "sensor_id": [key[0]],
            "n_seen": [n_seen],
            "ewma": [round(ewma + 1e-8, 6) if ewma is not None else None],
            "n_crossings": [n_crossings],
        }
    )


def ewma_stream(readings: DataFrame, alpha: float = 0.2, threshold: float = 30.0) -> DataFrame:
    """Attach the stateful EWMA operator to a (streaming) readings frame.
    Emits one updated row per sensor per micro-batch (update mode)."""

    def fn(key, batches, state):
        return ewma_update(key, batches, state, alpha=alpha, threshold=threshold)

    return readings.groupBy("sensor_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
