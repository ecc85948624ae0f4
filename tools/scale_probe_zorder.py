"""Scale probe: Z-order clustering vs single-column sort at 20M rows.

Events-like data (user 0..9999, day 0..364, payload) written three
ways — unsorted, sorted by user only, Z-ordered on (user, day) via
`layout.zorder_key` — then probed with the three predicate shapes that
distinguish the layouts:

  * user-range only   (single-dim: user-sort should win)
  * day-range only    (single-dim the user-sort CANNOT prune)
  * user AND day box  (two-dim: the Z-order's reason to exist)

Parquet prunes at row-group granularity from min/max statistics.  The
narrow probe table scans too fast for wall time to resolve the skipping,
so the probe measures the pruning DIRECTLY from the parquet footers
(pyarrow metadata): for each layout and predicate, the fraction of row
groups (and of rows) whose [min, max] intervals intersect the predicate
— exactly the set a statistics-pruning reader must decode.  Results are
asserted identical across layouts — the clustering is physical only.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session
from real_time_big_data_iot_monitoring_pipeline_spark.sources.layout import (
    write_clustered,
    zorder_key,
)

N = 20_000_000
N_USERS, N_DAYS = 10_000, 365


def main() -> None:
    spark = get_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="rtbd_zorder_probe_")

    df = spark.range(N).select(
        (F.abs(F.xxhash64(F.col("id"))) % N_USERS).alias("user"),
        (F.abs(F.xxhash64(F.col("id") + 1)) % N_DAYS).alias("day"),
        (F.abs(F.xxhash64(F.col("id") + 2)) % 100000).alias("payload"),
    )
    df.write.mode("overwrite").parquet(f"{base}/plain")
    write_clustered(
        spark.read.parquet(f"{base}/plain"), f"{base}/by_user", F.col("user").cast("long"), n_files=64
    )
    # NORMALIZE both dimensions to the full bit width before
    # interleaving: day tops out at 364 (9 bits), so raw interleave with
    # a 14-bit user leaves day's high bits constant and the Morton order
    # degenerates to user-order (measured: zero day pruning).  Scaling
    # day by 45 spreads it over the same 14-bit range as user.
    write_clustered(
        spark.read.parquet(f"{base}/plain"),
        f"{base}/zorder",
        zorder_key(F.col("user"), F.col("day") * 45, bits=14),
        n_files=64,
    )

    # (col, lo, hi) conjuncts — half-open [lo, hi)
    preds = {
        "user-range": [("user", 100, 200)],
        "day-range": [("day", 10, 30)],
        "user+day box": [("user", 100, 600), ("day", 10, 40)],
    }

    # result invariance across layouts (the clustering is physical only)
    counts = {}
    for layout_name in ("plain", "by_user", "zorder"):
        d = spark.read.parquet(f"{base}/{layout_name}")
        for pname, conj in preds.items():
            p = F.lit(True)
            for col, lo, hi in conj:
                p = p & (F.col(col) >= lo) & (F.col(col) < hi)
            row = d.filter(p).agg(
                F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
            ).collect()[0]
            counts.setdefault(pname, (row["n"], row["s"]))
            assert counts[pname] == (row["n"], row["s"]), f"layout changed result for {pname}"

    # row-group pruning straight from the footers
    import glob

    import pyarrow.parquet as pq

    def rg_stats(path):
        groups = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                stats = {}
                for ci in range(rg.num_columns):
                    c = rg.column(ci)
                    st = c.statistics
                    stats[schema_names[ci]] = (st.min, st.max)
                groups.append((rg.num_rows, stats))
        return groups

    print(f"rows: {N:,}; layouts: plain / sorted-by-user / z-ordered(user,day)")
    print(f"{'predicate':>14} | {'plain':>15} | {'by_user':>15} | {'zorder':>15}   (row groups read, % rows decoded)")
    for pname, conj in preds.items():
        cells = []
        for layout_name in ("plain", "by_user", "zorder"):
            groups = rg_stats(f"{base}/{layout_name}")
            total_rows = sum(n for n, _ in groups)
            kept = [
                (n, st)
                for n, st in groups
                if all(st[c][0] < hi and st[c][1] >= lo for c, lo, hi in conj)
            ]
            cells.append(
                f"{len(kept):3d}/{len(groups):3d} {100.0 * sum(n for n, _ in kept) / total_rows:5.1f}%"
            )
        print(f"{pname:>14} | " + " | ".join(f"{c:>15}" for c in cells))


if __name__ == "__main__":
    main()
