"""Round-11 machine growth — the three frontier dimensions the round-10
verdict named (items 4-6), extending the crash machine in
tests/test_lakehouse_crash_machine.py:

  A. EXECUTOR-SIDE (task) write-path kills: a Python worker dying
     mid-part-write leaves a half-written `_uncommitted_*` parquet file
     that no abort() ever sees (abort only receives COMPLETED task
     messages) — the one residue class the round-10 driver-side sweeps
     could not reach.  Also: a zombie task attempt racing the committer,
     and a real end-to-end failed write job through the Spark engine.
  B. MULTI-TABLE clone/vacuum crash sweeps: shallow clones share data
     files with their source by relative reference — vacuum on either
     side is killed at every op and cross-table reachability must hold:
     the other table reads byte-identically (or, in the documented
     source-vacuum hazard, fails LOUDLY — never silently partial).
  C. STREAMING READER cursor faults: the manifest-table tail under a
     corrupted / regressed / replayed checkpoint cursor must stay
     deterministic (exactly-once composes from deterministic replay +
     the engine's offset WAL + the sink's epoch ledger), and an
     engine-level forced replay (tampered checkpoint commit log) must
     land exactly once through the sink's batchId ledger.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P
from tests.test_lakehouse_crash_machine import (
    InjectedCrash,
    _append_batch,
    _setup_two_commits,
    _state,
    crash_at,
)


# =============================================================================
# A. executor-side (task) write-path kills
# =============================================================================


def _torn_part(path: str, name: str = None) -> str:
    """Materialize a HALF-WRITTEN task part exactly as a killed Python
    worker leaves it: valid parquet prefix, no footer, `_uncommitted_`
    name (never renamed — the task died before reporting)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    whole = os.path.join(path, "_whole_tmp.parquet")
    pq.write_table(pa.table({"id": list(range(100)), "v": list(range(100))}), whole)
    blob = open(whole, "rb").read()
    os.remove(whole)
    name = name or "_uncommitted_deadbeefdead.parquet"
    torn = os.path.join(path, name)
    with open(torn, "wb") as fh:
        fh.write(blob[: len(blob) // 2])
    return torn


def test_torn_task_part_invisible_and_reclaimed(spark, tmp_path):
    """A worker killed mid-part-write leaves a torn `_uncommitted_*`
    file.  It must be invisible to every reader, must not break later
    commits (footer stats read only COMMITTED files), and vacuum must
    reclaim it past the retention grace."""
    path = str(tmp_path / "torn")
    _setup_two_commits(spark, path)
    torn = _torn_part(path)
    # later commits proceed and read clean
    _append_batch(path, [Row(id=i, v=i * 10) for i in range(6, 9)])
    cols, rows, m = _state(spark, path)
    assert [r[0] for r in rows] == list(range(9))
    # change feed walks the full range over the residue
    df, _ = P.read_change_feed(spark, path, since_version=0)
    assert df.count() == 9
    # reclamation: grace spares it while young...
    P.vacuum(path, keep_versions=50, retention_seconds=600)
    assert os.path.exists(torn), "retention grace must spare a young task part"
    # ...and removes it once aged out
    P.vacuum(path, keep_versions=50, retention_seconds=0)
    assert not os.path.exists(torn), "torn task part leaked past vacuum"
    _state(spark, path)  # table still reads


def test_task_killed_mid_write_part_sweep(spark, tmp_path):
    """Kill `_write_part` ITSELF at each arrow write/close op (the
    in-task equivalent of the driver-side sweep): the dying task leaves
    at most one hidden file, the committer never lists it, a retry of
    the whole batch converges, and vacuum reclaims the residue."""
    import pyarrow.parquet as pq

    rows = [Row(id=i, v=i * 10) for i in range(6, 9)]
    real_write, real_close = pq.ParquetWriter.write_table, pq.ParquetWriter.close
    exercised = 0
    for k in (1, 2):  # 1: write_table, 2: close (one chunk -> two ops)
        path = str(tmp_path / f"k{k}")
        _setup_two_commits(spark, path)
        pre_cols, pre_rows, pre_m = _state(spark, path)
        calls = {"n": 0}

        def dying_write(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] == k:
                raise InjectedCrash("task killed mid write_table")
            return real_write(self, *a, **kw)

        def dying_close(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] == k:
                raise InjectedCrash("task killed at close")
            return real_close(self, *a, **kw)

        pq.ParquetWriter.write_table = dying_write
        pq.ParquetWriter.close = dying_close
        try:
            with pytest.raises(InjectedCrash):
                _append_batch(path, rows)
        finally:
            pq.ParquetWriter.write_table = real_write
            pq.ParquetWriter.close = real_close
        exercised += 1
        # the table is EXACTLY the pre state; residue is hidden only
        cols, now_rows, _ = _state(spark, path)
        assert (cols, now_rows) == (pre_cols, pre_rows), f"k={k}: torn table"
        visible_parts = {
            os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))
        }
        head = P._latest_snapshot(path)
        assert visible_parts == set(head["files"]), f"k={k}: unlisted visible part"
        # retry converges on the post state
        _append_batch(path, rows)
        _, rows_after, _ = _state(spark, path)
        assert [r[0] for r in rows_after] == list(range(9))
        # vacuum reclaims the dead task's hidden residue
        P.vacuum(path, keep_versions=50, retention_seconds=0)
        assert not glob.glob(os.path.join(path, "_uncommitted_*")), f"k={k}: leak"
    assert exercised == 2


def test_zombie_task_attempt_racing_committer(spark, tmp_path):
    """Task retry races the committer: attempt 1 reports and commits,
    the zombie attempt's part (written before OR after the commit) is
    never listed, stays invisible, and vacuum reclaims it."""
    path = str(tmp_path / "zombie")
    _setup_two_commits(spark, path)
    w = P.ManifestParquetWriter({"path": path}, overwrite=False)
    rows = [Row(id=i, v=i * 10) for i in range(6, 9)]
    m1 = w.write(iter(rows))
    zombie_before = w.write(iter(rows))  # zombie attempt, never reported
    w.commit([m1])
    zombie_after = w.write(iter(rows))  # late zombie, post-commit
    cols, got, head = _state(spark, path)
    assert [r[0] for r in got] == list(range(9)), "zombie rows leaked into the table"
    for z in (zombie_before, zombie_after):
        full = os.path.join(path, z.filename)
        assert os.path.exists(full) and z.filename.startswith("_uncommitted_")
        assert z.filename not in head["files"]
    P.vacuum(path, keep_versions=50, retention_seconds=0)
    assert not glob.glob(os.path.join(path, "_uncommitted_*")), "zombie parts leaked"
    _, got2, _ = _state(spark, path)
    assert got2 == got


def test_failed_write_job_end_to_end(spark, tmp_path):
    """A REAL engine write whose task dies mid-stream (poisoned row in
    one partition): the job fails, the table is untouched, the residue
    is hidden-only, vacuum reclaims it, and the clean retry converges —
    the full task-failure lifecycle through Spark itself, not a
    simulated writer."""
    path = str(tmp_path / "e2e")
    P.register_sink(spark)
    base = spark.range(6).selectExpr("id", "id * 10 AS v")
    base.coalesce(1).write.format("rtbd_manifest_sink").option("path", path).mode(
        "append"
    ).save()
    pre_cols, pre_rows, _ = _state(spark, path)
    poison = spark.range(6, 12).select(
        "id",
        F.expr(
            "CASE WHEN id = 9 THEN CAST(assert_true(id <> 9) AS BIGINT) "
            "ELSE id * 10 END"
        ).alias("v"),
    ).repartition(2)
    with pytest.raises(Exception):
        poison.write.format("rtbd_manifest_sink").option("path", path).mode(
            "append"
        ).save()
    cols, rows, head = _state(spark, path)
    assert (cols, rows) == (pre_cols, pre_rows), "failed job mutated the table"
    visible = {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))}
    assert visible == set(head["files"]), "failed job leaked a VISIBLE part"
    P.vacuum(path, keep_versions=50, retention_seconds=0)
    assert not glob.glob(os.path.join(path, "_uncommitted_*"))
    # clean retry converges
    spark.range(6, 12).selectExpr("id", "id * 10 AS v").repartition(2).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    _, rows2, _ = _state(spark, path)
    assert sorted(r[0] for r in rows2) == list(range(12))


# =============================================================================
# B. multi-table clone/vacuum crash sweeps
# =============================================================================


def _src_rows(spark, path):
    return _state(spark, path)[1]


def test_crash_sweep_vacuum_source_spares_clone_live_files(spark, tmp_path):
    """Vacuum on the SOURCE killed at every op, while a shallow clone
    references the source's HEAD files: the vacuum legally reclaims only
    pre-head files, so under every kill point BOTH tables keep reading
    exactly — the clone's referenced files are live in the source's kept
    horizon and must survive any crash prefix of the sweep."""
    for k in range(1, 40):
        src = str(tmp_path / f"s{k}")
        dst = str(tmp_path / f"d{k}")
        _setup_two_commits(spark, src)  # v1, v2 (2 part files)
        # compaction-style overwrite -> v3; v1/v2 files become reclaimable
        w = P.ManifestParquetWriter({"path": src}, overwrite=True)
        w.commit([w.write(iter([Row(id=i, v=i * 10) for i in range(6)]))])
        P.shallow_clone(src, dst)  # references v3's files
        src_rows = _src_rows(spark, src)
        clone_rows = _src_rows(spark, dst)
        assert clone_rows == src_rows
        with crash_at(src, k) as inj:
            try:
                P.vacuum(src, keep_versions=1, retention_seconds=0)
            except InjectedCrash:
                pass
        if inj.fired is None:
            break
        # cross-table reachability after the crash: both read exactly
        assert _src_rows(spark, src) == src_rows, f"k={k}: source torn by vacuum crash"
        assert _src_rows(spark, dst) == clone_rows, (
            f"k={k}: clone lost referenced files to a crashed source vacuum "
            f"at {inj.fired!r}"
        )
        # retry completes; the clone STILL reads (its files are the head's)
        P.vacuum(src, keep_versions=1, retention_seconds=0)
        assert _src_rows(spark, src) == src_rows
        assert _src_rows(spark, dst) == clone_rows, f"k={k}: clone broken post-retry"
    else:
        pytest.fail("vacuum(source) had more than 39 injection points")


def test_crash_sweep_vacuum_source_hazard_is_loud_never_partial(spark, tmp_path):
    """The documented shallow-clone hazard (source vacuum CAN reclaim
    files only a clone still references) under crash injection: at every
    kill point the clone read is either the COMPLETE original rows or a
    loud error — never a silently partial result.  (The sweep leaves the
    source's own head intact throughout.)"""
    saw_loud = saw_complete = False
    for k in range(1, 40):
        src = str(tmp_path / f"s{k}")
        dst = str(tmp_path / f"d{k}")
        # three appends -> three part files, so a mid-sweep crash can
        # leave a PARTIAL deletion of the clone's referenced set
        for lo in (0, 3, 6):
            _append_batch(src, [Row(id=i, v=i * 10) for i in range(lo, lo + 3)])
        P.shallow_clone(src, dst)  # references v3's three files
        clone_rows = _src_rows(spark, dst)
        # source moves on: overwrite -> v4 (clone's files now unreferenced
        # by the source head)
        w = P.ManifestParquetWriter({"path": src}, overwrite=True)
        w.commit([w.write(iter([Row(id=99, v=990)]))])
        src_rows = _src_rows(spark, src)
        with crash_at(src, k) as inj:
            try:
                P.vacuum(src, keep_versions=1, retention_seconds=0)
            except InjectedCrash:
                pass
        if inj.fired is None:
            break
        assert _src_rows(spark, src) == src_rows, f"k={k}: source torn"
        try:
            got = _src_rows(spark, dst)
            assert got == clone_rows, (
                f"k={k}: clone read SILENTLY WRONG after source vacuum crash "
                f"at {inj.fired!r}: {got}"
            )
            saw_complete = True
        except AssertionError:
            raise
        except Exception:
            saw_loud = True  # loud refusal is the documented hazard outcome
    else:
        pytest.fail("vacuum(source) had more than 39 injection points")
    assert saw_complete, "sweep never observed a still-complete clone read"
    assert saw_loud, "sweep never reached the loud-hazard outcome"


def test_crash_sweep_vacuum_clone_never_touches_source(spark, tmp_path):
    """Vacuum on the CLONE killed at every op: the source's directory
    byte-set and rows are invariant under every kill point (the clone's
    vacuum may only reclaim files it owns), and the clone heals."""
    for k in range(1, 40):
        src = str(tmp_path / f"s{k}")
        dst = str(tmp_path / f"d{k}")
        _setup_two_commits(spark, src)
        P.shallow_clone(src, dst)
        _append_batch(dst, [Row(id=77, v=770)])  # divergence: dst-owned file
        # dst compaction -> v3 rewrites everything into dst-owned files;
        # the old dst-owned append + the relative refs leave the head
        w = P.ManifestParquetWriter({"path": dst}, overwrite=True)
        w.commit(
            [w.write(iter([Row(id=i, v=i * 10) for i in range(6)] + [Row(id=77, v=770)]))]
        )
        src_listing = sorted(os.listdir(src))
        src_rows = _src_rows(spark, src)
        dst_rows = _src_rows(spark, dst)
        with crash_at(dst, k) as inj:
            try:
                P.vacuum(dst, keep_versions=1, retention_seconds=0)
            except InjectedCrash:
                pass
        if inj.fired is None:
            break
        assert sorted(os.listdir(src)) == src_listing, (
            f"k={k}: clone vacuum crash touched the SOURCE dir at {inj.fired!r}"
        )
        assert _src_rows(spark, src) == src_rows, f"k={k}: source rows changed"
        assert _src_rows(spark, dst) == dst_rows, f"k={k}: clone torn"
        P.vacuum(dst, keep_versions=1, retention_seconds=0)  # retry heals
        assert _src_rows(spark, dst) == dst_rows
        assert sorted(os.listdir(src)) == src_listing
    else:
        pytest.fail("vacuum(clone) had more than 39 injection points")


# =============================================================================
# C. streaming reader cursor faults
# =============================================================================


def _mk_stream_table(tmp_path, name="st"):
    path = str(tmp_path / name)
    for lo in (0, 3, 6, 9):
        _append_batch(path, [Row(id=i, v=i * 10) for i in range(lo, lo + 3)])
    return path


def _reader(path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    return P.ManifestStreamReader({"path": path}, schema)


def test_stream_cursor_replay_is_deterministic(spark, tmp_path):
    """Exactly-once across engine crashes composes from DETERMINISTIC
    replay: `readBetweenOffsets` over the same WAL'd range returns the
    identical row sequence every time, and a replayed `read(start)`
    (engine died between read and offset commit) is idempotent — same
    rows, same end offset."""
    path = _mk_stream_table(tmp_path)
    r = _reader(path)
    first = list(r.readBetweenOffsets({"version": 1}, {"version": 3}))
    for _ in range(3):
        assert list(r.readBetweenOffsets({"version": 1}, {"version": 3})) == first
    it1, end1 = r.read({"version": 2})
    it2, end2 = r.read({"version": 2})
    assert end1 == end2 and list(it1) == list(it2)


def test_stream_cursor_regression_replays_exact_range(spark, tmp_path):
    """A REGRESSED cursor (corrupted checkpoint rewound to an older
    version) re-serves exactly the rows of (old, head] — the engine's
    offset WAL + the sink's epoch ledger then dedup them — and never
    doubles rows WITHIN the replayed range."""
    path = _mk_stream_table(tmp_path)
    r = _reader(path)
    it, end = r.read({"version": 4})  # cursor at head: nothing new
    assert list(it) == [] and end == {"version": 4}
    it, end = r.read({"version": 2})  # regressed two versions
    rows = list(it)
    assert end == {"version": 4}
    assert sorted(rows) == [(i, i * 10) for i in range(6, 12)], rows
    assert len(rows) == len(set(rows)), "replayed range contains duplicates"


def test_stream_cursor_beyond_head_never_rewinds(spark, tmp_path):
    """A cursor CORRUPTED past the head (e.g. a bit flip) must not
    silently rewind or invent rows: read() returns no rows and leaves
    the cursor where it was (the stream stalls visibly instead of
    re-emitting history), and a malformed offset dict refuses loudly."""
    path = _mk_stream_table(tmp_path)
    r = _reader(path)
    it, end = r.read({"version": 9})
    assert list(it) == [] and end == {"version": 9}
    with pytest.raises((KeyError, TypeError)):
        r.read({"wrong_key": 1})


def test_stream_cursor_vacuumed_regression_refuses(spark, tmp_path):
    """A regressed cursor landing BELOW the vacuum horizon must refuse
    loudly (the round-10 pin covers the WAL replay path; this covers the
    live-cursor path): silently skipping the expired range would drop
    rows."""
    path = _mk_stream_table(tmp_path)
    P.vacuum(path, keep_versions=2, retention_seconds=0)  # v1, v2 expire
    r = _reader(path)
    with pytest.raises(RuntimeError, match="expired by vacuum"):
        list(r.read({"version": 1})[0])


def test_checkpoint_commit_log_tamper_lands_exactly_once(spark, tmp_path):
    """END-TO-END forced replay: run the sensor feed through the
    manifest STREAM sink, then erase the checkpoint's newest
    offsets+commits PAIR — the on-disk state of an engine that crashed
    after the SINK committed the epoch but before the checkpoint
    recorded it (the at-least-once window every streaming engine has).
    On restart the engine re-plans that batch from the prior offset and
    re-commits it under the same batchId; the sink's epoch ledger must
    drop the replay: the table holds the feed EXACTLY once.  (Deleting
    only the commit marker is rejected by Spark itself as concurrent
    checkpoint use — the offsets+commits pair is the honest crash
    image.)"""
    base = str(tmp_path / "tamper")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    P.register(spark)
    P.register_sink(spark)

    def run():
        q = (
            spark.readStream.format("rtbd_sensors")
            .option("n_rows", 6_000)
            .option("n_sensors", 10)
            .option("rows_per_batch", 2_000)
            .load()
            .writeStream.format("rtbd_manifest_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run()
    assert P.read_manifest(spark, out)[0].count() == 6_000
    newest = max(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    )
    for d in ("commits", "offsets"):  # forge the crash window (incl. the
        # Hadoop checksum sidecars — a stale .crc makes the replayed
        # batch's log rename fail as phantom concurrent use)
        for f in (str(newest), f".{newest}.crc"):
            p = os.path.join(ckpt, d, f)
            if os.path.exists(p):
                os.remove(p)
    run()  # restart: engine re-plans + replays the final epoch; ledger dedups
    back, head = P.read_manifest(spark, out)
    assert back.count() == 6_000, "replayed epoch double-counted or dropped"
    assert sorted(head["batches"]) == sorted(set(head["batches"])), "ledger dup"
    got = back.groupBy("sensor_id").count().collect()
    assert all(r["count"] == 600 for r in got)


def _sigkill_victim(path):
    """Runs in a forked child: stream an endless feed through the REAL
    task-side writer so the parent can SIGKILL it mid-write (no
    exception path, no abort — the process just dies)."""
    from pyspark.sql import Row

    from real_time_big_data_iot_monitoring_pipeline_spark.sources import (
        pydatasource as PP,
    )

    def rows():
        i = 0
        while True:
            yield Row(id=i, v=i * 10)
            i += 1

    PP._write_part(path, rows())


def test_sigkilled_worker_leaves_only_reclaimable_residue(spark, tmp_path):
    """The hardest executor-death shape: the worker process is SIGKILLed
    mid-part-write — no Python exception, no abort(), an open parquet
    stream torn at an arbitrary byte.  The residue must be invisible to
    every reader, later commits must proceed, and vacuum must reclaim it
    past the retention grace (and spare it inside the grace window)."""
    import multiprocessing as mp
    import time

    path = str(tmp_path / "sigkill")
    _setup_two_commits(spark, path)
    proc = mp.get_context("fork").Process(target=_sigkill_victim, args=(path,))
    proc.start()
    deadline = time.time() + 30
    torn = []
    while time.time() < deadline:
        torn = [
            f
            for f in glob.glob(os.path.join(path, "_uncommitted_*"))
            if os.path.getsize(f) > 0
        ]
        if torn:
            break
        time.sleep(0.05)
    proc.kill()
    proc.join()
    assert torn, "victim never materialized its uncommitted part"
    # invisible: head read and change feed unaffected
    cols, rows, _ = _state(spark, path)
    assert [r[0] for r in rows] == list(range(6))
    # later commits proceed over the residue
    _append_batch(path, [Row(id=i, v=i * 10) for i in range(6, 9)])
    _, rows2, _ = _state(spark, path)
    assert [r[0] for r in rows2] == list(range(9))
    df, _ = P.read_change_feed(spark, path, since_version=0)
    assert df.count() == 9
    # retention grace spares it; aged-out reclamation removes it
    P.vacuum(path, keep_versions=50, retention_seconds=600)
    assert any(os.path.exists(t) for t in torn), "grace window violated"
    P.vacuum(path, keep_versions=50, retention_seconds=0)
    assert not glob.glob(os.path.join(path, "_uncommitted_*")), "SIGKILL residue leaked"
    _state(spark, path)
