"""TRUE-THREAD races on the manifest table (round 9, beyond the
injected-serialization machine): N Python threads commit REAL epochs
concurrently with maintenance verbs, with no injection and no
coordination — the only arbiter is `_claim_and_publish`'s atomic
hard-link.  The injected machine (`test_lakehouse_concurrency_model`)
proves the B-then-A algebra; this file proves the OS-level claims the
algebra rests on:

  * exactly-once under contention: every (unique) batchId lands in the
    head `batches` ledger exactly once, and the final row multiset is
    exactly the union of all committed epochs — no commit is lost to a
    race, none is double-applied on retry;
  * the version chain stays contiguous (1..V, one winner per version);
  * physical truth: head `n_rows` equals the summed footer row counts
    of the head file list;
  * no orphans: every part file and filelist chunk on disk is
    referenced by some ledger version; no `_uncommitted_` residue.

Runs both inline and CHUNKED (threshold forced low) — the chunked
commit path writes chunk files before the claim, which is exactly the
window a real race stresses.
"""

from __future__ import annotations

import glob
import json
import os
import threading
import uuid

import pytest

# round-13: close-gate-only sweep leg (true-thread race sweeps) — see pytest.ini
pytestmark = pytest.mark.slow

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P


def _commit_epoch(path: str, batch_id: int, ids: list[int]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    fn = f"_uncommitted_{uuid.uuid4().hex}.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "v": pa.array([i % 97 for i in ids], pa.int32()),
            }
        ),
        os.path.join(path, fn),
    )
    P.ManifestStreamWriter({"path": path}).commit(
        [P.PartFileCommit(fn, len(ids))], batch_id
    )


@pytest.mark.parametrize("inline_max", [2048, 3])
def test_concurrent_epoch_committers_are_exactly_once(
    spark, tmp_path, monkeypatch, inline_max
):
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", inline_max)
    path = str(tmp_path / f"race_{inline_max}")
    os.makedirs(path)
    n_threads, epochs_each = 6, 5
    errors: list[BaseException] = []
    barrier = threading.Barrier(n_threads)

    def worker(t: int) -> None:
        try:
            barrier.wait()
            for e in range(epochs_each):
                bid = t * 100 + e
                _commit_epoch(path, bid, [bid * 10 + j for j in range(4)])
                if e == 2:
                    # maintenance chaos that never changes the row set
                    P.materialize_deletes(spark, path)  # no pending: no-op
                    # keep_versions high: the chaos exercises the
                    # concurrent vacuum WALK, not retention — expiring
                    # manifests mid-test would (correctly) break the
                    # from-v1 contiguity and full-reference asserts below
                    P.vacuum(path, keep_versions=1000, retention_seconds=600.0)
        except BaseException as exc:  # noqa: BLE001 — collected for the assert
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    head = P._latest_snapshot(path)
    expected_bids = {t * 100 + e for t in range(n_threads) for e in range(epochs_each)}
    # exactly-once: each batchId recorded once, none lost
    assert sorted(head["batches"]) == sorted(expected_bids)
    assert len(set(head["batches"])) == len(head["batches"])
    # contiguous version chain, one winner per version
    versions = sorted(
        int(os.path.basename(m)[len("_manifest-v") : -len(".json")])
        for m in glob.glob(os.path.join(path, "_manifest-v*.json"))
    )
    assert versions == list(range(1, head["version"] + 1))
    # physical truth: ledger row count == footer row count == logical count
    import pyarrow.parquet as pq

    n_physical = sum(
        pq.ParquetFile(os.path.join(path, fn)).metadata.num_rows for fn in head["files"]
    )
    assert head["n_rows"] == n_physical == len(expected_bids) * 4
    df, _ = P.read_manifest(spark, path)
    assert df.count() == len(expected_bids) * 4
    ids = {r.id for r in df.select("id").collect()}
    assert ids == {b * 10 + j for b in expected_bids for j in range(4)}
    # no orphans of any kind
    referenced: set[str] = set()
    ref_chunks: set[str] = set()
    for mf in glob.glob(os.path.join(path, "_manifest-v*.json")):
        with open(mf) as f:
            raw = json.load(f)
        referenced |= set(P._resolve_manifest(path, raw)["files"])
        ref_chunks |= set(raw.get("file_chunks", []))
    assert {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))} <= referenced
    assert {
        os.path.basename(c) for c in glob.glob(os.path.join(path, "_filelist-*.json"))
    } <= ref_chunks
    assert not glob.glob(os.path.join(path, "_uncommitted_*"))
    if inline_max == 3:
        assert P._latest_snapshot_raw(path).get("files_external")


def test_concurrent_replayed_epochs_commit_exactly_once(spark, tmp_path, monkeypatch):
    """All threads fight over the SAME batchIds (an engine replaying
    epochs after restart, twice, concurrently): each batchId must land
    exactly once and every losing replay must clean up its parts."""
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 3)
    path = str(tmp_path / "replay_race")
    os.makedirs(path)
    n_threads, n_batches = 5, 6
    errors: list[BaseException] = []
    barrier = threading.Barrier(n_threads)

    def worker(t: int) -> None:
        try:
            barrier.wait()
            for b in range(n_batches):
                _commit_epoch(path, b, [b * 10 + j for j in range(3)])
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    head = P._latest_snapshot(path)
    assert sorted(head["batches"]) == list(range(n_batches))
    df, _ = P.read_manifest(spark, path)
    assert df.count() == n_batches * 3  # replays dropped, never doubled
    assert head["n_rows"] == n_batches * 3
    # every losing replay removed its parts (renamed-visible ones too —
    # the round-9 replay-leak fix under real concurrency)
    referenced: set[str] = set()
    for mf in glob.glob(os.path.join(path, "_manifest-v*.json")):
        with open(mf) as f:
            referenced |= set(P._resolve_manifest(path, json.load(f))["files"])
    on_disk = {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))}
    assert on_disk <= referenced
    assert not glob.glob(os.path.join(path, "_uncommitted_*"))


@pytest.mark.parametrize("inline_max", [2048, 3])
def test_constraint_add_races_violating_append(spark, tmp_path, monkeypatch, inline_max):
    """TRUE-THREAD soundness race: valid batch appenders, ONE poison
    appender (v=999), and ONE thread adding CHECK (v BETWEEN 0 AND 96)
    all fight for claims with no coordination.  Serializability forces
    EXACTLY ONE of {poison commits, constraint lands}: the constraint's
    _enforce_existing proof must refuse if the poison row is already in
    (add-side soundness), and the poison's write-time proof must refuse
    if the constraint is already in (write-side soundness).  Both
    succeeding is an unsound interleaving; both failing is impossible
    against committed-only snapshots.  Plus the standard physical
    invariants: contiguous versions, footer-true n_rows, no orphans."""
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", inline_max)
    path = str(tmp_path / f"crace_{inline_max}")
    os.makedirs(path)

    def _append(batch_base: int, vs: list[int]) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        fn = f"_uncommitted_{uuid.uuid4().hex}.parquet"
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([batch_base + j for j in range(len(vs))], pa.int64()),
                    "v": pa.array(vs, pa.int32()),
                }
            ),
            os.path.join(path, fn),
        )
        P.ManifestParquetWriter({"path": path}, overwrite=False).commit(
            [P.PartFileCommit(fn, len(vs))]
        )

    _append(0, [1, 2, 3, 4])  # the table exists before the race
    n_valid = 3
    outcome = {"poison": None, "constraint": None}
    errors: list[BaseException] = []
    barrier = threading.Barrier(n_valid + 2)

    def valid_worker(t: int) -> None:
        try:
            barrier.wait()
            for e in range(4):
                base = 1000 * (t + 1) + 10 * e
                _append(base, [(base + j) % 97 for j in range(4)])
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def poison_worker() -> None:
        try:
            barrier.wait()
            _append(9000, [999])
            outcome["poison"] = "committed"
        except RuntimeError as exc:
            assert "commit rejected" in str(exc), exc
            outcome["poison"] = "rejected"
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def constraint_worker() -> None:
        try:
            barrier.wait()
            P.add_check_constraint(path, "v_range", "v", lo=0, hi=96)
            outcome["constraint"] = "landed"
        except RuntimeError as exc:
            assert "violates constraint" in str(exc), exc
            outcome["constraint"] = "refused"
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=valid_worker, args=(t,)) for t in range(n_valid)]
    threads += [threading.Thread(target=poison_worker), threading.Thread(target=constraint_worker)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    # the soundness fork: exactly one side won
    assert {outcome["poison"], outcome["constraint"]} in (
        {"committed", "refused"},
        {"rejected", "landed"},
    ), outcome
    head = P._latest_snapshot(path)
    has_constraint = any(c["name"] == "v_range" for c in head.get("constraints", []))
    assert has_constraint == (outcome["constraint"] == "landed")
    df, _ = P.read_manifest(spark, path)
    poison_rows = df.filter("v = 999").count()
    assert poison_rows == (1 if outcome["poison"] == "committed" else 0)
    # valid appends all landed regardless of the fork
    assert df.count() == 4 + n_valid * 4 * 4 + poison_rows

    # physical invariants: contiguous versions, footer-true counts, no orphans
    versions = sorted(
        int(os.path.basename(m)[len("_manifest-v") : -len(".json")])
        for m in glob.glob(os.path.join(path, "_manifest-v*.json"))
    )
    assert versions == list(range(1, head["version"] + 1))
    import pyarrow.parquet as pq

    n_physical = sum(
        pq.ParquetFile(os.path.join(path, fn)).metadata.num_rows for fn in head["files"]
    )
    assert head["n_rows"] == n_physical == df.count()
    referenced: set[str] = set()
    for mf in glob.glob(os.path.join(path, "_manifest-v*.json")):
        with open(mf) as f:
            referenced |= set(P._resolve_manifest(path, json.load(f))["files"])
    assert {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))} <= referenced
    assert not glob.glob(os.path.join(path, "_uncommitted_*"))


def test_mixed_verb_storm_under_true_threads(spark, tmp_path, monkeypatch):
    """CAPSTONE storm: epoch committers, batch appenders, a MoR-delete/
    materialize maintenance loop, and the conflict-safe zorder rewrite
    all race with NO coordination — single-shot losers retry, retry
    families re-plan.  The deletes match nothing, so the final logical
    rows must be EXACTLY the union of every append/epoch, no matter how
    the rewrites interleave (the pre-fix zorder ATE concurrent appends
    here); plus the standard physical invariants."""
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 3)  # chunked throughout
    path = str(tmp_path / "storm")
    os.makedirs(path)
    _commit_epoch(path, 0, [9000 + j for j in range(4)])  # table exists

    def _append(ids: list[int]) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        fn = f"_uncommitted_{uuid.uuid4().hex}.parquet"
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": pa.array([i % 97 for i in ids], pa.int32()),
                }
            ),
            os.path.join(path, fn),
        )
        P.ManifestParquetWriter({"path": path}, overwrite=False).commit(
            [P.PartFileCommit(fn, len(ids))]
        )

    def _retry(fn) -> None:
        for _ in range(30):
            try:
                fn()
                return
            except RuntimeError as exc:
                if "lost the commit race" not in str(exc):
                    raise
        raise AssertionError("verb starved after 30 lost races")

    errors: list[BaseException] = []
    barrier = threading.Barrier(6)

    def epoch_worker(t: int) -> None:
        try:
            barrier.wait()
            for e in range(3):
                bid = t * 10 + e + 1
                _commit_epoch(path, bid, [bid * 100 + j for j in range(4)])
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def append_worker(t: int) -> None:
        try:
            barrier.wait()
            for e in range(3):
                base = 50_000 + t * 1000 + e * 100
                _append([base + j for j in range(4)])
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def maintenance_worker() -> None:
        try:
            barrier.wait()
            for _ in range(2):
                P.delete_where_mor(path, "v", 200, 300)  # matches nothing
                _retry(lambda: P.materialize_deletes(spark, path))
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def zorder_worker() -> None:
        try:
            barrier.wait()
            for _ in range(2):
                _retry(lambda: P.optimize_zorder(spark, path, ("id", "v"), bits=4, n_files=3))
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = (
        [threading.Thread(target=epoch_worker, args=(t,)) for t in range(2)]
        + [threading.Thread(target=append_worker, args=(t,)) for t in range(2)]
        + [threading.Thread(target=maintenance_worker), threading.Thread(target=zorder_worker)]
    )
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    head = P._latest_snapshot(path)
    # exactly-once ledger across every rewrite interleaving
    assert sorted(head["batches"]) == [0] + [t * 10 + e + 1 for t in range(2) for e in range(3)]
    # the final logical rows are the union of every append/epoch
    expected_ids = {9000 + j for j in range(4)}
    expected_ids |= {b * 100 + j for b in head["batches"] if b != 0 for j in range(4)}
    expected_ids |= {50_000 + t * 1000 + e * 100 + j for t in range(2) for e in range(3) for j in range(4)}
    df, _ = P.read_manifest(spark, path)
    assert {r["id"] for r in df.collect()} == expected_ids
    assert not head.get("eq_deletes") or df.count() == len(expected_ids)
    # contiguous version chain, footer-true counts, no orphans
    versions = sorted(
        int(os.path.basename(m)[len("_manifest-v") : -len(".json")])
        for m in glob.glob(os.path.join(path, "_manifest-v*.json"))
    )
    assert versions == list(range(1, head["version"] + 1))
    import pyarrow.parquet as pq

    n_physical = sum(
        pq.ParquetFile(os.path.join(path, fn)).metadata.num_rows for fn in head["files"]
    )
    assert head["n_rows"] == n_physical
    referenced: set[str] = set()
    ref_chunks: set[str] = set()
    for mf in glob.glob(os.path.join(path, "_manifest-v*.json")):
        with open(mf) as f:
            raw = json.load(f)
        referenced |= set(P._resolve_manifest(path, raw)["files"])
        ref_chunks |= set(raw.get("file_chunks", []))
    assert {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))} <= referenced
    assert {
        os.path.basename(c) for c in glob.glob(os.path.join(path, "_filelist-*.json"))
    } <= ref_chunks
    assert not glob.glob(os.path.join(path, "_uncommitted_*"))
    assert not glob.glob(os.path.join(path, "_*staging_*"))
