"""Round-12 machine growth — the two frontier dimensions the round-11
verdict named (item 6), extending tests/test_lakehouse_crash_machine.py
and tests/test_round11_machines.py:

  A. MULTI-PART commit kills: a batch whose write produces N>1 parquet
     parts, killed at every write-path op — including strictly BETWEEN
     part K's rename and part K+1's (the round-11 sweeps killed within
     ONE part's ops).  The table must stay all-or-nothing under every
     kill point, for the batch committer AND the streaming epoch
     committer, and replay-after-crash must land exactly once with any
     half-renamed residue invisible and reclaimable.

  B. CONCURRENT STREAMING sinks on ONE table: two engine queries with
     their own checkpoints writing the same manifest table.  BatchIds
     are per-query counters (both queries commit a batchId 0), so the
     pre-round-12 bare-batchId epoch ledger CROSS-DEDUPED the queries —
     the second query's epoch 0 was silently dropped as a "replay" of
     the first's.  Found by this machine; fixed by scoping ledger
     entries to the query's checkpoint identity
     ("<sha1(ckpt)[:12]>:<batchId>", sources/pydatasource.py::
     ManifestStreamWriter).  The sweeps pin: no cross-query dedup, true
     same-query replays still dedup (scoped AND legacy bare-int
     entries), and ledger contention under interleaved/crashing
     committers serializes without loss or duplication.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P
from tests.test_lakehouse_crash_machine import (
    InjectedCrash,
    _append_batch,
    _setup_two_commits,
    _state,
    crash_at,
)


def _part_msgs(path, batches, schema=None):
    """Write one `_uncommitted_` part per row batch (the task-side half
    of an N-part commit), returning the commit messages."""
    return [P._write_part(path, iter(rows), schema) for rows in batches]


def _three_batches(lo=6):
    return [[Row(id=i, v=i * 10) for i in range(b, b + 3)] for b in (lo, lo + 3, lo + 6)]


# =============================================================================
# A. multi-part commit kills (batch committer)
# =============================================================================


def test_crash_sweep_multipart_batch_commit_all_or_nothing(spark, tmp_path):
    """A 3-part batch commit killed at EVERY write-path op — part
    renames, manifest dump, head swap — including the kills that land
    strictly between part K and part K+1 becoming visible.  At every
    kill point the table reads either the FULL pre-state or the full
    post-state (all 9 new rows), never a partial part set; the visible
    file set always equals the head manifest's; a clean retry
    converges."""
    part_rename_kills = 0
    for k in range(1, 60):
        path = str(tmp_path / f"mp{k}")
        _setup_two_commits(spark, path)  # rows 0..5
        pre_cols, pre_rows, _ = _state(spark, path)
        post_rows = sorted(
            pre_rows + [(i, i * 10) for i in range(6, 15)], key=repr
        )
        with crash_at(path, k) as inj:
            try:
                msgs = _part_msgs(path, _three_batches())
                w = P.ManifestParquetWriter({"path": path}, overwrite=False)
                w.commit(msgs)
            except InjectedCrash:
                pass
        if inj.fired is None:
            break
        if inj.fired.startswith(("link:part-", "replace:part-")):
            part_rename_kills += 1
        cols, rows, head = _state(spark, path)
        assert rows in (pre_rows, post_rows), (
            f"k={k}: PARTIAL batch visible after {inj.fired!r}: "
            f"{len(rows)} rows"
        )
        # a kill BETWEEN part renames leaves a new residue class: a
        # part already under its VISIBLE name but referenced by no
        # manifest.  Readers are manifest-driven so it never surfaces
        # (the rows assertion above proves that at every k); vacuum
        # must reclaim it past the grace like any crashed-writer residue
        stray = {
            os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))
        } - set(head["files"])
        # retry converges regardless of where the crash landed
        if rows == pre_rows:
            msgs = _part_msgs(path, _three_batches())
            P.ManifestParquetWriter({"path": path}, overwrite=False).commit(msgs)
        _, rows2, head2 = _state(spark, path)
        assert rows2 == post_rows, f"k={k}: retry did not converge"
        P.vacuum(path, keep_versions=50, retention_seconds=0)
        assert not glob.glob(os.path.join(path, "_uncommitted_*")), (
            f"k={k}: crash residue survived vacuum"
        )
        visible = {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))}
        assert visible == set(P._latest_snapshot(path)["files"]), (
            f"k={k}: renamed-orphan residue {sorted(stray)} leaked past vacuum "
            f"at {inj.fired!r}"
        )
    else:
        pytest.fail("multi-part commit had more than 59 injection points")
    # the sweep must actually have crossed the between-parts boundary:
    # with 3 parts there are >= 3 separate part-visibility ops, so kills
    # strictly between two parts' renames were exercised
    assert part_rename_kills >= 3, (
        f"sweep never killed between part renames ({part_rename_kills} "
        "part-visibility kill points)"
    )


def test_crash_sweep_multipart_stream_epoch_exactly_once(spark, tmp_path):
    """The STREAMING twin: a 3-part epoch commit killed at every op,
    then the engine's replay of the SAME batchId with freshly written
    parts (restart semantics: task re-execution produces new part
    files).  The epoch must land EXACTLY once — half-renamed residue
    from the crashed attempt is invisible (not in any manifest), the
    replay either publishes the fresh parts (crash before the ledger
    recorded the epoch) or drops them (crash after), and vacuum
    reclaims every orphan."""
    for k in range(1, 60):
        path = str(tmp_path / f"se{k}")
        _setup_two_commits(spark, path)  # rows 0..5
        pre_cols, pre_rows, _ = _state(spark, path)
        post_rows = sorted(pre_rows + [(i, i * 10) for i in range(6, 15)], key=repr)
        with crash_at(path, k) as inj:
            try:
                msgs = _part_msgs(path, _three_batches())
                P.ManifestStreamWriter({"path": path}).commit(msgs, 5)
            except InjectedCrash:
                pass
        if inj.fired is None:
            break
        cols, rows, head = _state(spark, path)
        assert rows in (pre_rows, post_rows), (
            f"k={k}: partial epoch visible after {inj.fired!r}"
        )
        # engine replay: same batchId, fresh task attempts' parts
        msgs = _part_msgs(path, _three_batches())
        P.ManifestStreamWriter({"path": path}).commit(msgs, 5)
        _, rows2, head2 = _state(spark, path)
        assert rows2 == post_rows, f"k={k}: epoch missing or doubled after replay"
        assert head2["batches"].count(5) == 1, f"k={k}: ledger dup"
        # every visible file is referenced; orphans reclaim
        P.vacuum(path, keep_versions=50, retention_seconds=0)
        visible = {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))}
        assert visible == set(P._latest_snapshot(path)["files"]), (
            f"k={k}: orphan part survived vacuum"
        )
        assert not glob.glob(os.path.join(path, "_uncommitted_*"))
    else:
        pytest.fail("multi-part epoch commit had more than 59 injection points")


# =============================================================================
# B. concurrent streaming sinks on one table
# =============================================================================


def test_concurrent_engine_queries_one_table_no_cross_dedup(spark, tmp_path):
    """THE FIND: two real engine streaming queries (own checkpoints)
    writing the same manifest table.  Both queries commit a batchId 0;
    the pre-round-12 bare-batchId ledger dropped the second query's
    epoch 0 as a 'replay' of the first's — silent data loss.  With
    checkpoint-scoped ledger entries the table must hold BOTH feeds in
    full."""
    base = str(tmp_path / "two_queries")
    out = os.path.join(base, "out")
    P.register(spark)
    P.register_sink(spark)

    def run(n_rows, ckpt):
        q = (
            spark.readStream.format("rtbd_sensors")
            .option("n_rows", n_rows)
            .option("n_sensors", 10)
            .option("rows_per_batch", 1_000)
            .load()
            .writeStream.format("rtbd_manifest_sink")
            .option("path", out)
            .option("checkpointLocation", os.path.join(base, ckpt))
            .outputMode("append")
            .start()
        )
        return q

    qa = run(2_000, "ckpt_a")
    qb = run(3_000, "ckpt_b")
    for q in (qa, qb):
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
    back, head = P.read_manifest(spark, out)
    # feed A: readings 0..1999, feed B: 0..2999 -> reading 0..1999 twice,
    # 2000..2999 once = 5000 rows total; a cross-deduped epoch 0 loses
    # 1000 rows from whichever query committed second
    assert back.count() == 5_000, (
        f"cross-query epoch dedup lost rows: {back.count()} != 5000"
    )
    counts = {r["reading_id"]: r["n"] for r in
              back.groupBy("reading_id").count().withColumnRenamed("count", "n").collect()}
    assert all(counts[i] == 2 for i in range(0, 2_000, 97)), "feed overlap not doubled"
    assert all(counts[i] == 1 for i in range(2_000, 3_000, 97)), "feed B tail wrong"
    # ledger: every entry distinct, two scopes present
    assert len(head["batches"]) == len(set(head["batches"])), "ledger dup"
    scopes = {str(b).split(":")[0] for b in head["batches"]}
    assert len(scopes) == 2, f"expected two query scopes, got {scopes}"


def test_scoped_ledger_interleaved_committers_no_loss(spark, tmp_path):
    """Direct-API twin at the ledger layer: two SCOPED writers (distinct
    checkpoint identities) interleave epochs 0..2 on one table.  All six
    epochs must land; same-scope replays must drop; the other scope's
    same-numbered batchId must NOT be treated as a replay."""
    path = str(tmp_path / "interleave")
    _append_batch(path, [Row(id=0, v=0)])
    wa = P.ManifestStreamWriter({"path": path, "checkpointlocation": "/ck/a"})
    wb = P.ManifestStreamWriter({"path": path, "checkpointlocation": "/ck/b"})
    rows_for = lambda scope, b: [Row(id=1000 * scope + 10 * b + j, v=j) for j in range(3)]
    for b in range(3):
        wa.commit(_part_msgs(path, [rows_for(1, b)]), b)
        wb.commit(_part_msgs(path, [rows_for(2, b)]), b)
    _, rows, head = _state(spark, path)
    assert len(rows) == 1 + 6 * 3, f"epoch lost under interleaving: {len(rows)}"
    assert len(head["batches"]) == len(set(head["batches"])) == 6
    # replay each scope's epoch 1: both must dedup against THEIR entry
    wa.commit(_part_msgs(path, [rows_for(1, 1)]), 1)
    wb.commit(_part_msgs(path, [rows_for(2, 1)]), 1)
    _, rows2, head2 = _state(spark, path)
    assert len(rows2) == 19 and len(head2["batches"]) == 6, "scoped replay not deduped"


def test_scoped_ledger_crash_sweep_two_committers(spark, tmp_path):
    """Contention under kills: scope A's epoch commit is killed at every
    op; scope B then commits the SAME batchId number; A replays.  At
    every kill point B's epoch must land (never cross-deduped by A's
    residue), A must land exactly once, and the visible file set must
    equal the head's."""
    for k in range(1, 60):
        path = str(tmp_path / f"cc{k}")
        _append_batch(path, [Row(id=0, v=0)])
        wa = P.ManifestStreamWriter({"path": path, "checkpointlocation": "/ck/a"})
        wb = P.ManifestStreamWriter({"path": path, "checkpointlocation": "/ck/b"})
        a_rows = [Row(id=100 + j, v=j) for j in range(3)]
        b_rows = [Row(id=200 + j, v=j) for j in range(3)]
        with crash_at(path, k) as inj:
            try:
                wa.commit(_part_msgs(path, [a_rows]), 0)
            except InjectedCrash:
                pass
        if inj.fired is None:
            break
        wb.commit(_part_msgs(path, [b_rows]), 0)
        wa.commit(_part_msgs(path, [a_rows]), 0)  # A's engine replays epoch 0
        _, rows, head = _state(spark, path)
        ids = sorted(r[0] for r in rows)
        assert ids == [0, 100, 101, 102, 200, 201, 202], (
            f"k={k}: loss or duplication after {inj.fired!r}: {ids}"
        )
        # two scoped entries (the seed is a batch append, no ledger row)
        assert len(head["batches"]) == len(set(head["batches"])) == 2
        P.vacuum(path, keep_versions=50, retention_seconds=0)
        visible = {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))}
        assert visible == set(P._latest_snapshot(path)["files"])
    else:
        pytest.fail("scoped commit had more than 59 injection points")


def test_scoped_writer_dedups_legacy_bare_int_entry(spark, tmp_path):
    """Upgrade compatibility: a pre-round-12 ledger carries bare-int
    entries (written by a checkpointed engine query under the old
    code).  The SAME query restarting post-upgrade replays its batchId
    as a scoped writer — it must treat the legacy int entry as its own
    commit and drop the replay (not double the epoch)."""
    path = str(tmp_path / "legacy")
    _append_batch(path, [Row(id=0, v=0)])
    # legacy entry: unscoped writer (pre-upgrade engine) commits epoch 0
    P.ManifestStreamWriter({"path": path}).commit(
        _part_msgs(path, [[Row(id=100 + j, v=j) for j in range(3)]]), 0
    )
    n_before = _state(spark, path)[1]
    # post-upgrade restart: scoped writer replays epoch 0
    w = P.ManifestStreamWriter({"path": path, "checkpointlocation": "/ck/a"})
    w.commit(_part_msgs(path, [[Row(id=100 + j, v=j) for j in range(3)]]), 0)
    _, rows, head = _state(spark, path)
    assert rows == n_before, "legacy replay doubled the epoch across the upgrade"
    assert head["batches"] == [0]
    # a genuinely NEW scoped epoch still lands
    w.commit(_part_msgs(path, [[Row(id=200, v=1)]]), 1)
    _, rows2, head2 = _state(spark, path)
    assert len(rows2) == len(rows) + 1
    assert head2["batches"] == [0, f"{w.ledger_scope}:1"]
