"""Crash-RECOVERY cost probe (round 10, alongside the crash-injection
machine): what does healing cost at metadata scale F ~ 10^4, chunked
manifests?  A 100 TB table wears crash residue constantly (fleets kill
executors and drivers all day), so recovery must be O(1 + lag) metadata
work, never O(F) — otherwise every reader pays a full-listing tax the
moment one writer dies between its claim and the head-pointer move.

Measurements over an F-file chunked-manifest table:

1. head read, pointer FRESH — memoized and cold (chunk resolution);
2. head read, pointer STALE by lag L in {1, 10, 50} (a crashed writer's
   pointer never moved; L-1 more committers then died the same way) —
   the ledger probe should cost ~L extra os.path.exists calls;
3. head read, pointer TORN (truncated JSON) — the documented full-scan
   fallback, the one O(dir) path, priced so the design tradeoff is a
   number, not a guess;
4. the next COMMIT over a stale pointer — discovery + claim + heal;
5. vacuum's stray sweep with 1,000 pieces of crashed-writer residue on
   the F-file directory.

Run: PYTHONPATH=/root/repo python tools/scale_probe_crash_heal.py [F]
"""

from __future__ import annotations

import json as _json
import os
import shutil
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P  # noqa: E402


def timed(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    base = tempfile.mkdtemp(prefix="rtbd_probe_heal_")
    path = os.path.join(base, "t")
    os.makedirs(path)
    t0 = time.perf_counter()
    fid = epoch = 0
    while fid < n_files:
        msgs = []
        for _ in range(min(500, n_files - fid)):
            fn = f"_uncommitted_{fid:07d}.parquet"
            pq.write_table(
                pa.table({"id": pa.array([fid], pa.int64()), "v": pa.array([fid], pa.int32())}),
                os.path.join(path, fn),
            )
            msgs.append(P.PartFileCommit(fn, 1))
            fid += 1
        P.ManifestStreamWriter({"path": path}).commit(msgs, epoch)
        epoch += 1
    print(f"build: F={n_files} in {time.perf_counter() - t0:.1f}s ({epoch} commits)")
    head_raw = P._latest_snapshot_raw(path)
    head_v = head_raw["version"]
    assert head_raw.get("files_external"), "expected chunked manifests at this F"
    cache = os.path.join(path, "manifest.json")
    with open(cache) as f:
        fresh_cache = f.read()

    # 1. fresh pointer
    t_memo = timed(lambda: P._head_snapshot(path))
    def cold():
        P._RESOLVED_CACHE.clear()
        P._CHUNK_CACHE.clear()
        P._head_snapshot(path)
    t_cold = timed(cold)
    print(f"head read, fresh pointer: memoized {t_memo * 1e3:.3f} ms, cold {t_cold * 1e3:.1f} ms")

    # 2. stale pointer by lag L
    for lag in (1, 10, 50):
        if head_v - lag < 1:
            continue
        with open(os.path.join(path, f"_manifest-v{head_v - lag}.json")) as f:
            stale = f.read()
        with open(cache, "w") as f:
            f.write(stale)
        t_lag = timed(lambda: P._head_snapshot(path))
        got = P._head_snapshot(path)["version"]
        assert got == head_v, (got, head_v)
        print(f"head read, pointer stale by {lag:>2}: {t_lag * 1e3:.3f} ms (heals to v{head_v})")

    # 3. torn pointer -> full-scan fallback
    with open(cache, "w") as f:
        f.write(fresh_cache[: len(fresh_cache) // 2])
    t_torn = timed(lambda: P._head_snapshot(path))
    assert P._head_snapshot(path)["version"] == head_v
    print(f"head read, pointer TORN (full-scan fallback over {n_files} entries): {t_torn * 1e3:.1f} ms")

    # 4. next commit over a stale pointer (discovery + claim + heal)
    with open(os.path.join(path, f"_manifest-v{head_v - 1}.json")) as f:
        stale = f.read()
    with open(cache, "w") as f:
        f.write(stale)
    fn = "_uncommitted_heal.parquet"
    pq.write_table(pa.table({"id": pa.array([1], pa.int64()), "v": pa.array([1], pa.int32())}), os.path.join(path, fn))
    t0 = time.perf_counter()
    P.ManifestStreamWriter({"path": path}).commit([P.PartFileCommit(fn, 1)], 99_999)
    t_commit = time.perf_counter() - t0
    with open(cache) as f:
        assert _json.load(f)["version"] == head_v + 1
    print(f"commit over stale pointer (discover + claim + heal cache): {t_commit * 1e3:.1f} ms")

    # 5. stray sweep with 1,000 pieces of residue on the big directory
    for i in range(400):
        open(os.path.join(path, f"_uncommitted_dead{i}.parquet"), "w").close()
    for i in range(300):
        open(os.path.join(path, f"_manifest-v9.json.claim-dead{i}"), "w").close()
    for i in range(300):
        open(os.path.join(path, f"_filelist-dead{i}.json.tmp"), "w").close()
    t0 = time.perf_counter()
    res = P.vacuum(path, keep_versions=10**6, retention_seconds=0)
    t_vac = time.perf_counter() - t0
    print(
        f"vacuum stray sweep over F={n_files} + 1000 residue files: "
        f"{t_vac * 1e3:.0f} ms (n_strays_removed={res['n_strays_removed']})"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
