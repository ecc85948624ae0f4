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

    # ---- chunked-manifest section (round-9 verdict item 5) ---------------
    # At F past _MANIFEST_INLINE_MAX (2048) the commit gate externalizes
    # the file list into reused `_filelist-*` chunks: commit metadata is
    # O(new + F/2048) instead of O(F), and repeat head reads hit the
    # resolved-snapshot memo.  Build F files fast via in-process epoch
    # commits (500 part messages per epoch), then measure:
    #   * head manifest JSON size vs the inline equivalent;
    #   * append-commit metadata time on the F-file table;
    #   * cold vs memoized head read;
    #   * verbs still green (delete/merge/time-travel).
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    base2 = tempfile.mkdtemp(prefix="rtbd_probe_chunk_")
    bpath = os.path.join(base2, "t")
    os.makedirs(bpath)
    t0 = time.perf_counter()
    fid = 0
    epoch = 0
    while fid < n_big:
        msgs = []
        for _ in range(min(500, n_big - fid)):
            fn = f"_uncommitted_{fid:07d}.parquet"
            pq.write_table(
                pa.table(
                    {
                        "id": pa.array([fid * 10, fid * 10 + 1], pa.int64()),
                        "v": pa.array([fid, fid], pa.int32()),
                    }
                ),
                os.path.join(bpath, fn),
            )
            msgs.append(P.PartFileCommit(fn, 2))
            fid += 1
        P.ManifestStreamWriter({"path": bpath}).commit(msgs, epoch)
        epoch += 1
    t_build = time.perf_counter() - t0
    raw_head = P._latest_snapshot_raw(bpath)
    assert raw_head.get("files_external"), "expected a chunked manifest at this F"
    head_bytes = os.path.getsize(
        os.path.join(bpath, f"_manifest-v{raw_head['version']}.json")
    )
    resolved = P._latest_snapshot(bpath)
    assert len(resolved["files"]) == n_big
    inline_bytes = len(
        _json.dumps(
            {
                "files": resolved["files"],
                "stats": resolved["stats"],
                "file_columns": resolved["file_columns"],
            }
        )
    )

    # append-commit metadata cost on the big table (one new file)
    def one_append(e):
        fn = f"_uncommitted_tail{e}.parquet"
        pq.write_table(
            pa.table({"id": pa.array([99_000_000 + e], pa.int64()), "v": pa.array([-1], pa.int32())}),
            os.path.join(bpath, fn),
        )
        P.ManifestStreamWriter({"path": bpath}).commit([P.PartFileCommit(fn, 1)], 10_000 + e)

    t0 = time.perf_counter()
    for e in range(3):
        one_append(e)
    t_append = (time.perf_counter() - t0) / 3

    # cold vs memoized head read (cold: drop the caches)
    P._RESOLVED_CACHE.clear()
    P._CHUNK_CACHE.clear()
    t0 = time.perf_counter()
    P._latest_snapshot(bpath)
    t_cold = time.perf_counter() - t0
    _, t_warm = timed(lambda: P._latest_snapshot(bpath), reps=7)

    # verbs green on the chunked table
    P.delete_where_mor(bpath, "v", 0, 0)
    out = P.delete_where(spark, bpath, "v", 1, 2)
    assert out["version"] == P._latest_snapshot(bpath)["version"]
    df, h = P.read_manifest(spark, bpath)
    n_after = df.count()
    assert n_after == 2 * (n_big - 3) + 3, n_after  # ids v in 0..2 dropped
    df_tt, _ = P.read_manifest(spark, bpath, version=raw_head["version"])
    assert df_tt.count() == 2 * n_big

    print(
        f"F={n_big} chunked: build {t_build:.1f}s ({epoch} epochs); head manifest "
        f"{head_bytes} B vs inline-equivalent {inline_bytes/1024:.0f} KiB "
        f"({inline_bytes/max(head_bytes,1):.0f}x smaller); append commit {t_append*1e3:.0f} ms; "
        f"head read cold {t_cold*1e3:.1f} ms / memoized {t_warm*1e3:.3f} ms; "
        f"MoR+CoW delete + time-travel green"
    )

    # ---- commit throughput under REAL contention --------------------------
    # Six uncoordinated threads commit epochs concurrently against the
    # F-file chunked table: every loser re-externalizes and retries
    # through the OCC claim, so this measures the WORST-case commit
    # path (chunk reuse scan + claim + cleanup) end to end.
    import threading

    n_threads, per_thread = 6, 10
    errs: list = []
    barrier = threading.Barrier(n_threads)

    def committer(t: int) -> None:
        try:
            barrier.wait()
            for e in range(per_thread):
                bid = 20_000 + t * 1_000 + e
                fn = f"_uncommitted_c{t}_{e}.parquet"
                pq.write_table(
                    pa.table(
                        {"id": pa.array([bid], pa.int64()), "v": pa.array([-2], pa.int32())}
                    ),
                    os.path.join(bpath, fn),
                )
                P.ManifestStreamWriter({"path": bpath}).commit(
                    [P.PartFileCommit(fn, 1)], bid
                )
        except BaseException as exc:  # noqa: BLE001
            errs.append(exc)

    v_before = P._latest_snapshot(bpath)["version"]
    threads = [threading.Thread(target=committer, args=(t,)) for t in range(n_threads)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    t_contend = time.perf_counter() - t0
    assert not errs, errs
    head2b = P._latest_snapshot(bpath)
    n_commits = n_threads * per_thread
    assert head2b["version"] == v_before + n_commits  # one version per commit
    import glob as _glob

    head_chunks = len(P._latest_snapshot_raw(bpath).get("file_chunks", []))
    n_chunk_files = len(_glob.glob(os.path.join(bpath, "_filelist-*.json")))
    print(
        f"F={n_big} contention: {n_commits} commits from {n_threads} threads in "
        f"{t_contend:.1f}s ({n_commits/t_contend:.0f} commits/s worst-case OCC path); "
        f"head references {head_chunks} chunks (bounded ~2F/{P._MANIFEST_INLINE_MAX}); "
        f"{n_chunk_files} historical chunk files on disk (older versions' — "
        f"time-travel-live until vacuum; losers cleaned up); version chain exact"
    )
    shutil.rmtree(base2, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
