"""Scale probe: skewed fact-dim join at 20M rows — AQE skew-join
splitting vs the manual salted join vs doing nothing.

The fact table gives 60% of its rows ONE hot key (the viral-sensor
regime); the dim has 2M keys.  Broadcast is disabled so the join must
shuffle — the setup where a hot key turns one reduce task into the
straggler that defines the stage's wall clock.  Three runs of the same
logical join+rollup:

  * `no-mitigation`  — AQE skew handling off: the hot partition lands
    on one task;
  * `aqe-skew`       — `spark.sql.adaptive.skewJoin` on with thresholds
    scaled to the probe (runtime re-plan splits the oversized
    partition; Spark's own answer, zero code changes);
  * `manual-salt`    — `operators.skew.salted_join` (deterministic
    fact-side salt + dim replication; the fallback when AQE's
    heuristics miss or a replayed pipeline needs a deterministic plan).

Printed checks: identical integer results across all three, the
straggler anatomy (hot-key row share), and wall time per strategy.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators.skew import salted_join
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session

N_DIM = 2_000_000
N_FACT = 20_000_000
HOT_FRACTION = 0.6


def main() -> None:
    spark = get_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.driver.memory": "8g",
            # scale AQE's skew thresholds to the probe's partition sizes
            # (defaults are tuned for multi-GB partitions)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    hot_rows = int(N_FACT * HOT_FRACTION)
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise(F.col("id") % N_DIM)
        .alias("key"),
        (F.abs(F.xxhash64(F.col("id"))) % 1000).alias("cents"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("key"), (F.col("id") % 50).alias("grp")
    )

    def rollup(joined):
        return joined.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total_cents")
        )

    def run(label, skew_enabled, salted):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
        if salted:
            q = rollup(salted_join(fact, dim, "key", salt_buckets=32))
        else:
            q = rollup(fact.join(dim, "key"))
        q.write.format("noop").mode("overwrite").save()  # warm codegen
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        rows = sorted(map(tuple, q.orderBy("grp").collect()))
        return dt, rows

    t_none, r_none = run("no-mitigation", skew_enabled=False, salted=False)
    t_aqe, r_aqe = run("aqe-skew", skew_enabled=True, salted=False)
    t_salt, r_salt = run("manual-salt", skew_enabled=False, salted=True)

    assert r_none == r_aqe == r_salt, "mitigation changed the result!"

    print(
        f"rows: {N_FACT:,} fact >< {N_DIM:,} dim; hot key carries "
        f"{hot_rows:,} rows ({HOT_FRACTION:.0%} of the fact table -> one reduce task untreated)"
    )
    print(f"no-mitigation: {t_none:.2f}s   (hot partition = straggler)")
    print(f"aqe-skew:      {t_aqe:.2f}s   ({t_none / t_aqe:.2f}x; runtime split, zero code changes)")
    print(f"manual-salt:   {t_salt:.2f}s   ({t_none / t_salt:.2f}x; deterministic plan, dim replicated 32x)")


if __name__ == "__main__":
    main()
