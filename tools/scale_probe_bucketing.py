"""Scale probe: bucketed co-located join at 20M fact rows (~33x the
sf0.1 lineitem).  Generates an orders-like (2M rows) and lineitem-like
(20M rows) pair keyed on order id, writes each BOTH ways — plain parquet
and bucketed-by-key (`layout.write_bucketed`, 32 buckets) — then runs
the identical join+rollup against each layout.

Checks printed:
  * plan shape: Exchange count below the join (plain: 2 fact shuffles;
    bucketed: 0) and that both scans report `Bucketed: true`;
  * result equality (bucketing is physical layout only);
  * wall time per layout for the same logical query — the delta is the
    pre-paid shuffle, i.e. what bucketing amortizes across every
    downstream join on that key at 100 TB;
  * one-time bucketed write cost (the amortized investment).

Broadcast is disabled for the probe so the 2M-row dim can't be
broadcast — at real scale both sides of a fact-fact join exceed any
broadcast threshold, which is exactly the regime bucketing exists for.
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session
from real_time_big_data_iot_monitoring_pipeline_spark.sources import layout

N_ORDERS = 2_000_000
N_LINES = 20_000_000
N_BUCKETS = 32


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def main() -> None:
    spark = get_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            # fact-fact regime: nothing is broadcastable
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            # 32 concurrent sorted bucket writers need real heap; this is
            # the process's first session so the setting takes effect
            # (probe-only — bench.py documents why IT must not set this)
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="rtbd_bucket_probe_")

    orders = spark.range(N_ORDERS).select(
        F.col("id").alias("o_orderkey"),
        (F.xxhash64(F.col("id")) % 5).alias("o_prio"),
    )
    lines = spark.range(N_LINES).select(
        (F.col("id") % N_ORDERS).alias("l_orderkey"),
        (F.abs(F.xxhash64(F.col("id"))) % 10000).alias("l_cents"),
    )

    t0 = time.perf_counter()
    orders.write.mode("overwrite").parquet(f"{base}/orders_plain")
    lines.write.mode("overwrite").parquet(f"{base}/lines_plain")
    t_plain_write = time.perf_counter() - t0

    t0 = time.perf_counter()
    layout.write_bucketed(
        orders, "probe_orders_b", f"{base}/orders_b", "o_orderkey", N_BUCKETS, sort_col="o_orderkey"
    )
    layout.write_bucketed(
        lines, "probe_lines_b", f"{base}/lines_b", "l_orderkey", N_BUCKETS, sort_col="l_orderkey"
    )
    t_bucket_write = time.perf_counter() - t0

    def join_rollup(o, l):
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_prio")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_cents").alias("total_cents"))
        )

    runs = {}
    plans = {}
    for label, o, l in (
        ("plain", spark.read.parquet(f"{base}/orders_plain"), spark.read.parquet(f"{base}/lines_plain")),
        ("bucketed", spark.table("probe_orders_b"), spark.table("probe_lines_b")),
    ):
        q = join_rollup(o, l)
        plans[label] = plan_of(q)
        q.write.format("noop").mode("overwrite").save()  # warm (codegen, page cache)
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        runs[label] = time.perf_counter() - t0

    # result equality across layouts
    a = join_rollup(
        spark.read.parquet(f"{base}/orders_plain"), spark.read.parquet(f"{base}/lines_plain")
    ).orderBy("o_prio").collect()
    b = join_rollup(spark.table("probe_orders_b"), spark.table("probe_lines_b")).orderBy(
        "o_prio"
    ).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b], "layout changed the result!"

    ex_plain = plans["plain"].count("Exchange hashpartitioning")
    ex_bucket = plans["bucketed"].count("Exchange hashpartitioning")
    assert plans["bucketed"].count("Bucketed: true") == 2, plans["bucketed"]
    # plain: two fact-side exchanges for the join + one for the rollup;
    # bucketed: ONLY the rollup exchange
    assert ex_bucket == 1 and ex_plain == 3, (ex_plain, ex_bucket)

    print(f"rows: {N_LINES:,} lines >< {N_ORDERS:,} orders, {N_BUCKETS} buckets")
    print(f"write: plain {t_plain_write:.1f}s, bucketed {t_bucket_write:.1f}s "
          f"(the pre-paid shuffle, amortized over every keyed join)")
    print(f"exchanges below join+rollup: plain {ex_plain}, bucketed {ex_bucket}")
    print(f"join+rollup warm: plain {runs['plain']:.2f}s, bucketed {runs['bucketed']:.2f}s "
          f"({runs['plain'] / runs['bucketed']:.2f}x)")

    for t in ("probe_orders_b", "probe_lines_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
