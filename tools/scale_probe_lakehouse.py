"""Lakehouse CoW-verb cost probe (round 7): after the ADVICE hardening
(logical victim reads, eq-delete re-scoping), do `delete_where` and
`merge_upsert` still touch bytes PROPORTIONAL TO THE PREDICATE, not the
table?  And what does carrying pending MoR deletes cost a reader?

Three measurements over an F-file manifest table of N rows (key-sorted
layout so zone maps are tight):

1. delete_where wall time for predicates touching ~1, ~F/4, and F files
   — the narrow delete should cost ~(touched/F) of the full one, plus a
   constant manifest walk.  The returned n_files_rewritten pins the
   pruning itself.
2. merge_upsert wall time for an update batch confined to one file's
   key range vs scattered across all files — same proportionality from
   the key-set range join against broadcast file bounds.
3. read_manifest wall time with 0, 1, and 8 pending MoR eq-deletes —
   the per-group plan expansion `_read_logical` pays (groups = distinct
   applicable-delete sets; 8 stacked table-wide deletes = worst case:
   every file in every scope, still ONE group).

At 100 TB the first two are the difference between a maintenance verb
and a table rewrite; the third bounds the read tax MoR accrues before
`materialize_deletes` clears it.

Measured (16M rows x 32 files, local[32], warmed): rewrite counts pin
the pruning exactly (2 / 9 / 32 files for narrow / quarter / full
predicates; merge confined=1 vs scattered=32) while wall times stay
within ~1.5-2x of each other — at local scale per-job constant costs
(two Spark jobs per verb + manifest walk) dominate the data path, so
BYTES TOUCHED (the rewritten-file counts) is the 100 TB signal, not
local wall clock.  MoR read tax: 0 -> 1 -> 8 pending table-wide
deletes read 0.25 / 0.62 / 0.83 s — the first delete costs the
count-pushdown loss (a filter forces a real scan), further stacked
deletes are near-free filter chain links.

Harness bound: the BUILD step (range -> repartitionByRange -> sorted
write through the Python sink) OOMs the single local JVM around
~64M rows x 32 concurrent sort buffers — a probe-harness limit, not a
sink one (the sink's task writer streams bounded 64k-row chunks).

Usage: python tools/scale_probe_lakehouse.py [n_rows] [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P
from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session


def build_table(spark, n_rows: int, n_files: int) -> str:
    path = os.path.join(tempfile.mkdtemp(prefix="rtbd_probe_lake_"), "t")
    P.register_sink(spark)
    (
        spark.range(n_rows)
        .selectExpr("id AS k", "CAST(id % 97 AS INT) AS s", "id * 3 AS v")
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
        .write.format("rtbd_manifest_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    return path


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    per_file = n_rows // n_files

    # untimed warmup: first-call JVM/codegen/staging costs must not land
    # in the first measured verb (they made a narrow delete read slower
    # than a full one in the un-warmed draft of this probe)
    wpath = build_table(spark, 10_000, 2)
    P.delete_where(spark, wpath, "k", 0, 10)
    P.merge_upsert(
        spark,
        wpath,
        spark.range(5).selectExpr("id AS k", "CAST(0 AS INT) AS s", "id AS v"),
        "k",
    )
    shutil.rmtree(os.path.dirname(wpath), ignore_errors=True)

    # --- 1. delete_where ∝ touched files -------------------------------------
    print(f"# delete_where over {n_files} files x {per_file} rows")
    for label, lo, hi in [
        ("narrow (~1 file)", 10, per_file - 10),
        (f"quarter (~{n_files // 4} files)", 0, n_rows // 4 - 1),
        (f"full ({n_files} files)", 0, n_rows - 1),
    ]:
        path = build_table(spark, n_rows, n_files)
        sec, out = timed(lambda: P.delete_where(spark, path, "k", lo, hi))
        print(
            f"  {label:24s}: {sec:6.2f}s  rewritten={out['n_files_rewritten']:3d} "
            f"untouched={out['n_files_untouched']:3d} deleted={out['n_deleted']}"
        )
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)

    # --- 2. merge_upsert ∝ touched files --------------------------------------
    print(f"# merge_upsert of {per_file // 2} update rows")
    for label, gen in [
        ("confined (~1 file)", f"id + {per_file // 4}"),
        (f"scattered ({n_files} files)", f"id * {n_files * 2}"),
    ]:
        path = build_table(spark, n_rows, n_files)
        upd = spark.range(per_file // 2).selectExpr(
            f"{gen} AS k", "CAST(0 AS INT) AS s", "CAST(-1 AS BIGINT) AS v"
        )
        sec, out = timed(lambda: P.merge_upsert(spark, path, upd, "k"))
        print(
            f"  {label:24s}: {sec:6.2f}s  rewritten={out['n_files_rewritten']:3d} "
            f"updated={out['n_updated']} inserted={out['n_inserted']}"
        )
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)

    # --- 3. read tax of pending MoR deletes -----------------------------------
    print("# read_manifest with pending table-wide MoR deletes")
    path = build_table(spark, n_rows, n_files)
    for n_dels in [0, 1, 8]:
        head = P._latest_snapshot(path)
        while len(head.get("eq_deletes", [])) < n_dels:
            i = len(head["eq_deletes"])
            # tiny disjoint ranges: negligible rows, maximal metadata
            P.delete_where_mor(path, "v", -3 * (i + 1) - 1, -3 * (i + 1))
            head = P._latest_snapshot(path)
        sec, n = timed(lambda: P.read_manifest(spark, path)[0].count())
        print(f"  {n_dels} pending deletes: {sec:6.2f}s  rows={n}")
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
