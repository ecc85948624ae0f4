"""Verb-planning cost probe (round 8): the schema guards added to the
lakehouse verbs (`rename_column` collision/existence, delete/merge
column checks) resolve the table's LOGICAL column set at commit time.
Naively that is O(F) parquet-footer reads per verb — at 100 TB footer
fetches are remote round-trips and F is millions, so committers now
record each file's column names in the manifest (`file_columns`,
captured from footers they already have open for `_footer_stats`) and
`_logical_columns` / `_file_logical_metadata` consult the cache with a
footer-read fallback for legacy manifests.

This probe measures the difference at F files:

1. `_logical_columns` with the manifest cache (the committed path);
2. the same call with the cache stripped (legacy-manifest fallback —
   O(F) footer reads);
3. `_file_logical_metadata` on a renamed table, cached vs stripped
   (the READ-planning walk every logical read of a renamed table does).

Usage: python tools/scale_probe_verb_planning.py [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session
from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P


def timed(fn, reps: int = 5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spark = get_session(
        master="local[8]", shuffle_partitions=8, extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="rtbd_probe_plan_")
    path = os.path.join(base, "t")
    P.register_sink(spark)
    spark.range(n_files * 100).selectExpr(
        "id", "CAST(id % 7 AS INT) AS k", "CAST(id AS INT) AS v"
    ).repartition(n_files).write.format("rtbd_manifest_sink").option("path", path).mode(
        "append"
    ).save()
    head = P._latest_snapshot(path)
    assert len(head["files"]) == n_files, len(head["files"])
    assert set(head.get("file_columns", {})) == set(head["files"])

    cols, t_cached = timed(lambda: P._logical_columns(path, head))
    stripped = {k: v for k, v in head.items() if k != "file_columns"}
    cols2, t_fallback = timed(lambda: P._logical_columns(path, stripped))
    assert cols == cols2 == {"id", "k", "v"}

    P.rename_column(path, "v", "w")
    head2 = P._latest_snapshot(path)
    meta, t_meta_cached = timed(lambda: P._file_logical_metadata(path, head2))
    stripped2 = {k: v for k, v in head2.items() if k != "file_columns"}
    meta2, t_meta_fallback = timed(lambda: P._file_logical_metadata(path, stripped2))
    assert meta == meta2 and all(m[0] == (("v", "w"),) for m in meta.values())

    print(
        f"F={n_files}: _logical_columns cached {t_cached*1e3:.1f} ms vs "
        f"footer-fallback {t_fallback*1e3:.1f} ms ({t_fallback/max(t_cached,1e-9):.0f}x); "
        f"_file_logical_metadata (renamed) cached {t_meta_cached*1e3:.1f} ms vs "
        f"fallback {t_meta_fallback*1e3:.1f} ms"
    )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
