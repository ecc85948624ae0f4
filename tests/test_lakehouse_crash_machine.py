"""CRASH-INJECTION MACHINE (round-9 verdict "Next round" item 4).

The sequential/race/thread machines cover verb ALGEBRA and
INTERLEAVINGS; the remaining bug class is TORN STATE: a writer killed
mid-commit.  This machine enumerates every driver-side write-path
operation of each verb — part-file renames, `_filelist-*` chunk writes,
the claim tmp JSON, the `os.link` claim itself, the claim-tmp removal,
the head-pointer tmp write and its `os.replace` — and kills the verb at
each one in turn.  JSON writes are killed TORN (half the payload
flushed, then the crash), so truncated chunks and half-written claim
tmps are materialized exactly as power loss would leave them.

After every injected crash, the full reader surface is asserted:

  * ATOMICITY  — the head read sees EXACTLY the pre-crash or the
    post-crash snapshot (columns and row multiset), never a blend;
  * DURABILITY — time-travel to the pre-crash version still returns
    the pre-crash rows bit-for-bit;
  * FEED       — the change feed over the full range still walks
    (the ledger heals a claim-present/pointer-absent crash);
  * LIVENESS   — retrying the verb succeeds and lands on the verb's
    own retry contract (append re-appends its delta; overwrite /
    delete / restore / zorder converge on the post state; a replayed
    STREAM EPOCH lands exactly once via the batch ledger);
  * RECLAMATION — `vacuum(retention_seconds=0)` removes every stray
    (`.claim-*`, `*.tmp`, orphan parts) without touching live state.

Run `pydatasource.py`'s healing path (`_ledger_head_version`: claim
durable, pointer stale) under every crash that lands between the link
and the pointer replace — previously exercised by a single pin.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os

import pytest

# round-13: close-gate-only sweep leg (crash-injection kill-point sweeps) — see pytest.ini
pytestmark = pytest.mark.slow
from pyspark.sql import Row

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P


class InjectedCrash(RuntimeError):
    pass


class _Injector:
    def __init__(self, table: str, nth: int):
        self.table = os.path.abspath(table)
        self.nth = nth
        self.count = 0
        self.fired: str | None = None

    def _qual(self, args) -> bool:
        return any(
            isinstance(a, str) and os.path.abspath(a).startswith(self.table)
            for a in args
        )

    def bump(self, desc: str) -> bool:
        self.count += 1
        if self.count == self.nth:
            self.fired = desc
            return True
        return False


@contextlib.contextmanager
def crash_at(table: str, nth: int):
    """Kill the nth driver-side write-path op under `table`: os.link /
    os.replace / os.remove raise; a JSON dump writes HALF its payload
    first (a torn file, as power loss leaves it)."""
    inj = _Injector(table, nth)
    real = {"link": os.link, "replace": os.replace, "remove": os.remove}

    def mk(name):
        r = real[name]

        def wrapper(*a, **k):
            if inj._qual(a) and inj.bump(f"{name}:{os.path.basename(str(a[-1]))}"):
                raise InjectedCrash(inj.fired)
            return r(*a, **k)

        return wrapper

    real_dump = P._json.dump

    def torn_dump(obj, fp, **k):
        name = getattr(fp, "name", "")
        if isinstance(name, str) and inj._qual((name,)) and inj.bump(
            f"torn-dump:{os.path.basename(name)}"
        ):
            payload = json.dumps(obj)
            fp.write(payload[: max(1, len(payload) // 2)])
            fp.flush()
            raise InjectedCrash(inj.fired)
        return real_dump(obj, fp, **k)

    os.link, os.replace, os.remove = mk("link"), mk("replace"), mk("remove")
    P._json.dump = torn_dump
    try:
        yield inj
    finally:
        os.link, os.replace, os.remove = real["link"], real["replace"], real["remove"]
        P._json.dump = real_dump


# --- state helpers -----------------------------------------------------------


def _state(spark, path, version=None):
    df, m = P.read_manifest(spark, path, version=version)
    cols = sorted(df.columns)
    rows = sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)
    return cols, rows, m


def _append_batch(path, rows):
    w = P.ManifestParquetWriter({"path": path}, overwrite=False)
    w.commit([w.write(iter(rows))])


def _setup_two_commits(spark, path):
    _append_batch(path, [Row(id=i, v=i * 10) for i in range(3)])
    _append_batch(path, [Row(id=i, v=i * 10) for i in range(3, 6)])


# --- the sweep ----------------------------------------------------------------


def _sweep(spark, tmp_path, name, setup, verb, retry_check, max_points=60, check_cdf=True):
    """Run `verb` once per injection point k=1.. until the verb completes
    with no injection left to fire (k exceeded its op count).  Returns
    the number of crash points exercised."""
    # reference run: the verb's uninjected post state
    ref = str(tmp_path / f"{name}-ref")
    setup(spark, ref)
    pre_cols, pre_rows, pre_m = _state(spark, ref)
    verb(spark, ref)
    post_cols, post_rows, _ = _state(spark, ref)

    exercised = 0
    for k in range(1, max_points + 1):
        path = str(tmp_path / f"{name}-{k}")
        setup(spark, path)
        with crash_at(path, k) as inj:
            try:
                verb(spark, path)
                completed = True
            except InjectedCrash:
                completed = False
        if inj.fired is None:
            assert completed
            break
        exercised += 1
        # ATOMICITY: the head is exactly pre or post, never a blend
        cols, rows, head_m = _state(spark, path)
        assert (cols, rows) in ((pre_cols, pre_rows), (post_cols, post_rows)), (
            f"{name}: torn head state after crash at {inj.fired!r}: "
            f"cols={cols} rows={rows[:4]}…"
        )
        crashed_committed = (cols, rows) == (post_cols, post_rows)
        # DURABILITY: the pre-crash version still time-travels exactly
        tcols, trows, _ = _state(spark, path, version=pre_m["version"])
        assert (tcols, trows) == (pre_cols, pre_rows), (
            f"{name}: pre-crash snapshot v{pre_m['version']} damaged by "
            f"crash at {inj.fired!r}"
        )
        # FEED: the full-range walk still works (ledger heals stale
        # heads).  Skipped for verbs that legally EXPIRE old snapshots
        # (vacuum) — there the loud expired-snapshot refusal is correct.
        if check_cdf:
            df, _commits = P.read_change_feed(spark, path, since_version=0)
            assert "_commit_version" in df.columns
            df.count()
        # LIVENESS + verb retry contract
        retry_check(spark, path, crashed_committed, (pre_cols, pre_rows), (post_cols, post_rows))
        # RECLAMATION: vacuum with zero retention clears every stray
        P.vacuum(path, keep_versions=50, retention_seconds=0)
        strays = (
            glob.glob(os.path.join(path, "*.claim-*"))
            + glob.glob(os.path.join(path, "*.claim"))
            + glob.glob(os.path.join(path, "*.mv-*"))
            + glob.glob(os.path.join(path, "*.tmp"))
            + glob.glob(os.path.join(path, "_uncommitted_*"))
        )
        assert not strays, f"{name}: strays survive vacuum after {inj.fired!r}: {strays}"
        # the table still reads after reclamation
        _state(spark, path)
    else:
        pytest.fail(f"{name}: more than {max_points} injection points — raise the cap")
    # every verb has at least tmp-write + atomic-move in its path
    assert exercised >= 2, f"{name}: sweep exercised only {exercised} crash points"
    return exercised


# --- verb cases ----------------------------------------------------------------


def _retry_converges_on_post(runner):
    """Retry must succeed and land the table on the verb's post state."""

    def check(spark, path, crashed_committed, pre, post):
        runner(spark, path)
        cols, rows, _ = _state(spark, path)
        assert (cols, rows) == post

    return check


def test_crash_sweep_append(spark, tmp_path):
    delta = [Row(id=i, v=i * 10) for i in range(6, 9)]

    def verb(spark_, path):
        _append_batch(path, delta)

    def retry(spark_, path, crashed_committed, pre, post):
        # whatever snapshot the crash left, a retry appends the delta
        # ON TOP of it exactly once
        _, rows_at_crash, _ = _state(spark_, path)
        _append_batch(path, delta)
        cols, rows, _ = _state(spark_, path)
        expect = sorted(rows_at_crash + [(r.id, r.v) for r in delta], key=repr)
        assert rows == expect

    _sweep(spark, tmp_path, "append", _setup_two_commits, verb, retry)


def test_crash_sweep_append_chunked(spark, tmp_path, monkeypatch):
    """The same append sweep with the file list externalized into
    `_filelist-*` chunks — the torn-dump points now include truncated
    CHUNK files (the round-9 verdict's named case)."""
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 2)
    P._CHUNK_CACHE.clear()
    P._RESOLVED_CACHE.clear()

    def setup(spark_, path):
        for lo in (0, 3, 6):
            _append_batch(path, [Row(id=i, v=i * 10) for i in range(lo, lo + 3)])

    delta = [Row(id=i, v=i * 10) for i in range(9, 12)]

    def verb(spark_, path):
        _append_batch(path, delta)

    def retry(spark_, path, crashed_committed, pre, post):
        _, rows_at_crash, _ = _state(spark_, path)
        _append_batch(path, delta)
        _, rows, _ = _state(spark_, path)
        assert rows == sorted(rows_at_crash + [(r.id, r.v) for r in delta], key=repr)

    _sweep(spark, tmp_path, "append-chunked", setup, verb, retry)


def test_crash_sweep_overwrite(spark, tmp_path):
    def verb(spark_, path):
        w = P.ManifestParquetWriter({"path": path}, overwrite=True)
        w.commit([w.write(iter([Row(id=100, v=1000)]))])

    _sweep(
        spark,
        tmp_path,
        "overwrite",
        _setup_two_commits,
        verb,
        _retry_converges_on_post(lambda s, p: verb(s, p)),
    )


def test_crash_sweep_rename(spark, tmp_path):
    def verb(spark_, path):
        P.rename_column(path, "v", "w")

    def retry(spark_, path, crashed_committed, pre, post):
        if crashed_committed:
            # the rename landed before the crash; retrying it must refuse
            # (old name gone) and leave the table on the post state
            with pytest.raises(Exception):
                P.rename_column(path, "v", "w")
        else:
            P.rename_column(path, "v", "w")
        cols, rows, _ = _state(spark_, path)
        assert (cols, rows) == post

    _sweep(spark, tmp_path, "rename", _setup_two_commits, verb, retry)


def test_crash_sweep_mor_delete(spark, tmp_path):
    def verb(spark_, path):
        P.delete_where_mor(path, "v", 10, 30)

    _sweep(
        spark,
        tmp_path,
        "mor-delete",
        _setup_two_commits,
        verb,
        _retry_converges_on_post(lambda s, p: P.delete_where_mor(p, "v", 10, 30)),
    )


def test_crash_sweep_cow_delete(spark, tmp_path):
    def verb(spark_, path):
        P.delete_where(spark_, path, "v", 10, 30)

    _sweep(
        spark,
        tmp_path,
        "cow-delete",
        _setup_two_commits,
        verb,
        _retry_converges_on_post(lambda s, p: P.delete_where(s, p, "v", 10, 30)),
    )


def test_crash_sweep_restore(spark, tmp_path):
    def verb(spark_, path):
        P.restore_table(path, 1)

    _sweep(
        spark,
        tmp_path,
        "restore",
        _setup_two_commits,
        verb,
        _retry_converges_on_post(lambda s, p: P.restore_table(p, 1)),
    )


def test_crash_sweep_zorder(spark, tmp_path):
    def verb(spark_, path):
        try:
            P.optimize_zorder(spark_, path, ("id", "v"), bits=4, n_files=2)
        except InjectedCrash:
            raise
        except RuntimeError as exc:
            # "lost the commit race" must not surface here: nothing races
            raise AssertionError(f"zorder refused with no concurrent commit: {exc}")

    def retry(spark_, path, crashed_committed, pre, post):
        # zorder is a pure layout rewrite: whatever side of the crash the
        # table landed on, a retry leaves CONTENT identical to post
        verb(spark_, path)
        cols, rows, _ = _state(spark_, path)
        assert (cols, rows) == post

    _sweep(spark, tmp_path, "zorder", _setup_two_commits, verb, retry)


def test_crash_sweep_stream_epoch_exactly_once(spark, tmp_path):
    """The money case: an epoch commit crashes anywhere in its write
    path, the engine replays the epoch with FRESH task parts (as a real
    restart does), and the batch ledger guarantees the epoch's rows land
    EXACTLY once — never zero, never twice."""
    delta = [Row(id=i, v=i * 10) for i in range(6, 9)]

    def verb(spark_, path):
        w = P.ManifestStreamWriter({"path": path})
        w.commit([w.write(iter(delta))], batchId=7)

    def retry(spark_, path, crashed_committed, pre, post):
        w = P.ManifestStreamWriter({"path": path})  # fresh parts = real replay
        w.commit([w.write(iter(delta))], batchId=7)
        cols, rows, _ = _state(spark_, path)
        assert (cols, rows) == post, (
            "replayed epoch after crash must land exactly once: "
            f"{len(rows)} rows vs expected {len(post[1])}"
        )

    _sweep(spark, tmp_path, "stream-epoch", _setup_two_commits, verb, retry)


def test_crash_sweep_merge_upsert(spark, tmp_path):
    def _updates(spark_):
        return spark_.createDataFrame([Row(id=2, v=222), Row(id=10, v=100)])

    def verb(spark_, path):
        P.merge_upsert(spark_, path, _updates(spark_), "id")

    _sweep(
        spark,
        tmp_path,
        "merge",
        _setup_two_commits,
        verb,
        _retry_converges_on_post(lambda s, p: P.merge_upsert(s, p, _updates(s), "id")),
    )


def test_crash_sweep_materialize_deletes(spark, tmp_path):
    def setup(spark_, path):
        _setup_two_commits(spark_, path)
        P.delete_where_mor(path, "v", 10, 30)

    def verb(spark_, path):
        P.materialize_deletes(spark_, path)

    _sweep(
        spark,
        tmp_path,
        "materialize",
        setup,
        verb,
        _retry_converges_on_post(lambda s, p: P.materialize_deletes(s, p)),
    )


def test_crash_sweep_publish_staged(spark, tmp_path):
    """WAP publish crashed anywhere: the table lands on exactly the
    audited snapshot or stays on the base — and a retry (or the version
    conflict it correctly raises once the claim is durable) converges."""

    def setup(spark_, path):
        _setup_two_commits(spark_, path)
        w = P.ManifestParquetWriter({"path": path, "staged": "true"}, overwrite=False)
        w.commit([w.write(iter([Row(id=50, v=500)]))])

    def verb(spark_, path):
        P.publish_staged(path)

    def retry(spark_, path, crashed_committed, pre, post):
        try:
            P.publish_staged(path)
        except (RuntimeError, FileNotFoundError):
            pass  # claim already durable (conflict) or pointer consumed
        cols, rows, _ = _state(spark_, path)
        assert (cols, rows) == post

    _sweep(spark, tmp_path, "wap-publish", setup, verb, retry)


def test_crash_sweep_create_tag(spark, tmp_path):
    def verb(spark_, path):
        P.create_tag(path, "t1", 1)

    def retry(spark_, path, crashed_committed, pre, post):
        try:
            P.create_tag(path, "t1", 1)
        except RuntimeError as exc:
            assert "already exists" in str(exc)
        assert P.resolve_ref(path, "t1") == 1
        cols, rows, _ = _state(spark_, path)
        assert (cols, rows) == pre  # refs never move data

    _sweep(spark, tmp_path, "tag", _setup_two_commits, verb, retry)


def test_crash_sweep_advance_branch(spark, tmp_path):
    def setup(spark_, path):
        _setup_two_commits(spark_, path)
        P.create_branch(path, "b1", 1)

    def verb(spark_, path):
        P.advance_branch(path, "b1", 2)

    def retry(spark_, path, crashed_committed, pre, post):
        P.advance_branch(path, "b1", 2)  # branch moves are idempotent
        assert P.resolve_ref(path, "b1") == 2
        cols, rows, _ = _state(spark_, path)
        assert (cols, rows) == pre

    _sweep(spark, tmp_path, "branch", setup, verb, retry)


def test_crash_sweep_vacuum_itself(spark, tmp_path):
    """A crash DURING vacuum must never damage live state: the head
    still reads, the retry finishes the reclamation."""

    def setup(spark_, path):
        _setup_two_commits(spark_, path)
        # create reclaimables: a CoW delete expires the originals...
        P.delete_where(spark_, path, "v", 10, 30)
        # ...plus crashed-writer residue of every stripe
        for stray in ("_uncommitted_dead.parquet", "_manifest-v9.json.claim-dead",
                      "_filelist-dead.json.tmp", "_ref-dead.json.claim"):
            with open(os.path.join(path, stray), "w") as f:
                f.write("{")

    def verb(spark_, path):
        P.vacuum(path, keep_versions=1, retention_seconds=0)

    def retry(spark_, path, crashed_committed, pre, post):
        P.vacuum(path, keep_versions=50, retention_seconds=0)
        cols, rows, _ = _state(spark_, path)
        assert (cols, rows) == pre == post  # vacuum never moves data

    _sweep(spark, tmp_path, "vacuum", setup, verb, retry, check_cdf=False)


# --- external corruption of the head-pointer CACHE ---------------------------


def test_truncated_head_cache_heals(spark, tmp_path):
    """manifest.json is a convenience cache, written with os.replace —
    the protocol can't tear it, but disk corruption can.  A truncated
    cache must not break reads (full-scan fallback) and the next commit
    must heal it."""
    path = str(tmp_path / "headcache")
    _setup_two_commits(spark, path)
    _, rows_before, m = _state(spark, path)
    cache = os.path.join(path, "manifest.json")
    with open(cache) as f:
        content = f.read()
    with open(cache, "w") as f:
        f.write(content[: len(content) // 2])
    cols, rows, m2 = _state(spark, path)
    assert rows == rows_before and m2["version"] == m["version"]
    _append_batch(path, [Row(id=99, v=990)])
    with open(cache) as f:
        healed = json.load(f)  # parses again
    assert healed["version"] == m["version"] + 1


# --- chunked-manifest variants of the rewrite verbs ---------------------------


def test_crash_sweep_cow_delete_chunked(spark, tmp_path, monkeypatch):
    """CoW delete with the file list externalized: chunk REUSE decisions
    and new-chunk writes are in the crash path."""
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 2)
    P._CHUNK_CACHE.clear()
    P._RESOLVED_CACHE.clear()

    def setup(spark_, path):
        for lo in (0, 3, 6):
            _append_batch(path, [Row(id=i, v=i * 10) for i in range(lo, lo + 3)])

    def verb(spark_, path):
        P.delete_where(spark_, path, "v", 10, 30)

    _sweep(
        spark,
        tmp_path,
        "cow-delete-chunked",
        setup,
        verb,
        _retry_converges_on_post(lambda s, p: P.delete_where(s, p, "v", 10, 30)),
    )


def test_crash_sweep_restore_chunked(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 2)
    P._CHUNK_CACHE.clear()
    P._RESOLVED_CACHE.clear()

    def setup(spark_, path):
        for lo in (0, 3, 6):
            _append_batch(path, [Row(id=i, v=i * 10) for i in range(lo, lo + 3)])

    def verb(spark_, path):
        P.restore_table(path, 1)

    _sweep(
        spark,
        tmp_path,
        "restore-chunked",
        setup,
        verb,
        _retry_converges_on_post(lambda s, p: P.restore_table(p, 1)),
    )


# --- a CONCURRENT COMMITTER (not just a reader) heals crash residue ----------


def test_claim_durable_pointer_stale_healed_by_next_committer(spark, tmp_path):
    """Crash EXACTLY between the os.link claim and the head-pointer
    update, then let a second writer commit: it must discover the
    durable claim via the ledger probe, build ON TOP of it (never
    clobber its version), and heal the head cache."""
    path = str(tmp_path / "heal")
    _setup_two_commits(spark, path)
    # find the crash point right AFTER the link: its desc is the
    # removal of the claim tmp
    fired = None
    for k in range(1, 20):
        p2 = str(tmp_path / f"heal-{k}")
        _setup_two_commits(spark, p2)
        with crash_at(p2, k) as inj:
            try:
                _append_batch(p2, [Row(id=9, v=90)])
            except InjectedCrash:
                pass
        if inj.fired and inj.fired.startswith("remove:") and ".claim-" in inj.fired:
            fired, path = inj.fired, p2
            break
    assert fired, "never reached the post-link claim-tmp removal op"
    # the claim for v3 is durable; manifest.json still says v2
    with open(os.path.join(path, "manifest.json")) as f:
        assert json.load(f)["version"] == 2
    assert os.path.exists(os.path.join(path, "_manifest-v3.json"))
    # concurrent committer: must land at v4, not clobber v3
    _append_batch(path, [Row(id=10, v=100)])
    with open(os.path.join(path, "manifest.json")) as f:
        healed = json.load(f)
    assert healed["version"] == 4, f"head cache not healed: {healed['version']}"
    cols, rows, m = _state(spark, path)
    assert m["version"] == 4
    assert len(rows) == 8  # 6 setup + crashed-but-durable 1 + concurrent 1
    assert (9, 90) in rows and (10, 100) in rows


# --- DOUBLE crash: the retry itself crashes over the first crash's residue ---


def _double_sweep(spark, tmp_path, name, setup, verb, final_expected, max_points=14):
    """Crash the verb at point i, then crash the RETRY at point j, then
    let a final retry run clean — recovery must work over recovery
    residue, and the final state must be a legal composition."""
    pairs = 0
    for i in range(1, max_points + 1):
        first_fired = None
        for j in range(1, max_points + 1):
            path = str(tmp_path / f"{name}-{i}-{j}")
            setup(spark, path)
            pre_cols, pre_rows, _ = _state(spark, path)
            with crash_at(path, i) as inj1:
                try:
                    verb(spark, path)
                except InjectedCrash:
                    pass
            if inj1.fired is None:
                return pairs  # i exceeded the verb's op count
            first_fired = inj1.fired
            with crash_at(path, j) as inj2:
                try:
                    verb(spark, path)
                except InjectedCrash:
                    pass
            # clean final retry
            verb(spark, path)
            cols, rows, _ = _state(spark, path)
            ok = final_expected(pre_rows, rows, inj1, inj2)
            assert ok, (
                f"{name}: illegal state after crashes at {first_fired!r} then "
                f"{inj2.fired!r}: {len(rows)} rows"
            )
            pairs += 1
            if inj2.fired is None:
                break  # j exceeded the retry's op count
    return pairs


def test_double_crash_stream_epoch_still_exactly_once(spark, tmp_path):
    """Two crashes and three replays of the SAME epoch: the ledger must
    still land its rows exactly once."""
    delta = [Row(id=i, v=i * 10) for i in range(6, 9)]

    def verb(spark_, path):
        w = P.ManifestStreamWriter({"path": path})
        w.commit([w.write(iter(delta))], batchId=7)

    def final_expected(pre_rows, rows, inj1, inj2):
        return rows == sorted(pre_rows + [(r.id, r.v) for r in delta], key=repr)

    pairs = _double_sweep(
        spark, tmp_path, "dbl-epoch", _setup_two_commits, verb, final_expected
    )
    assert pairs >= 10, f"only {pairs} crash pairs exercised"


def test_double_crash_append_deltas_count(spark, tmp_path):
    """Batch appends make no idempotence claim — but every DURABLE claim
    must count exactly once: after two crashed attempts and one clean
    one, the row multiset is pre + k*delta where k = number of attempts
    that got their claim durable (1..3), never a partial delta."""
    delta = [(i, i * 10) for i in range(6, 9)]

    def verb(spark_, path):
        _append_batch(path, [Row(id=i, v=v) for i, v in delta])

    def final_expected(pre_rows, rows, inj1, inj2):
        extra = len(rows) - len(pre_rows)
        if extra % len(delta) != 0:
            return False  # a torn partial delta
        k = extra // len(delta)
        return 1 <= k <= 3 and rows == sorted(pre_rows + delta * k, key=repr)

    pairs = _double_sweep(
        spark, tmp_path, "dbl-append", _setup_two_commits, verb, final_expected
    )
    assert pairs >= 10, f"only {pairs} crash pairs exercised"


# --- crash UNDER true concurrent committers -----------------------------------


@contextlib.contextmanager
def crash_thread_at(table: str, nth: int, thread_name: str = "crasher"):
    """Like crash_at, but only ops issued by the named thread count —
    concurrent committers run the REAL path untouched."""
    import threading

    inj = _Injector(table, nth)
    real = {"link": os.link, "replace": os.replace, "remove": os.remove}

    def mk(name):
        r = real[name]

        def wrapper(*a, **k):
            if (
                threading.current_thread().name == thread_name
                and inj._qual(a)
                and inj.bump(f"{name}:{os.path.basename(str(a[-1]))}")
            ):
                raise InjectedCrash(inj.fired)
            return r(*a, **k)

        return wrapper

    real_dump = P._json.dump

    def torn_dump(obj, fp, **k):
        name = getattr(fp, "name", "")
        if (
            threading.current_thread().name == thread_name
            and isinstance(name, str)
            and inj._qual((name,))
            and inj.bump(f"torn-dump:{os.path.basename(name)}")
        ):
            payload = json.dumps(obj)
            fp.write(payload[: max(1, len(payload) // 2)])
            fp.flush()
            raise InjectedCrash(inj.fired)
        return real_dump(obj, fp, **k)

    os.link, os.replace, os.remove = mk("link"), mk("replace"), mk("remove")
    P._json.dump = torn_dump
    try:
        yield inj
    finally:
        os.link, os.replace, os.remove = real["link"], real["replace"], real["remove"]
        P._json.dump = real_dump


def test_crash_under_concurrent_appenders(spark, tmp_path):
    """One writer crashes at EVERY point of its commit path while two
    uncoordinated writers append concurrently: the survivors' rows land
    exactly once, the crasher's delta lands 0 or 1 times (then exactly
    once more on retry), and the ledger/head heal around the residue."""
    import threading

    delta_a = [(100 + i, 1) for i in range(3)]
    delta_b = [(200 + i, 2) for i in range(3)]
    delta_c = [(300 + i, 3) for i in range(3)]

    for k in range(1, 12):
        path = str(tmp_path / f"cc-{k}")
        _setup_two_commits(spark, path)
        errs: list[BaseException] = []

        def crasher(p=path):
            try:
                _append_batch(p, [Row(id=i, v=v) for i, v in delta_a])
            except InjectedCrash:
                pass
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        def committer(delta, p=path):
            try:
                _append_batch(p, [Row(id=i, v=v) for i, v in delta])
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        with crash_thread_at(path, k) as inj:
            ts = [
                threading.Thread(target=crasher, name="crasher"),
                threading.Thread(target=committer, args=(delta_b,), name="b"),
                threading.Thread(target=committer, args=(delta_c,), name="c"),
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        assert not errs, f"k={k}: survivor committer failed: {errs}"
        if inj.fired is None:
            break  # k exceeded the crasher's op count — sweep done
        cols, rows, m = _state(spark, path)
        ids = [r[0] for r in rows]
        assert len(ids) == len(set(ids)), f"k={k}: duplicated rows: {sorted(rows)}"
        for i, v in delta_b + delta_c:
            assert (i, v) in rows, f"k={k}: survivor row ({i},{v}) LOST after {inj.fired!r}"
        n_a = sum(1 for r in rows if r in delta_a)
        assert n_a in (0, len(delta_a)), f"k={k}: torn crasher delta ({n_a} rows)"
        # retry: the crasher's delta must land exactly once more
        _append_batch(path, [Row(id=i + 1000, v=v) for i, v in delta_a])
        cols2, rows2, m2 = _state(spark, path)
        assert len(rows2) == len(rows) + len(delta_a)
        assert m2["version"] > m["version"]
        # the head cache healed past every racer
        with open(os.path.join(path, "manifest.json")) as f:
            assert json.load(f)["version"] == m2["version"]
    else:
        pytest.fail("crasher had more than 11 injection points")


def test_crash_under_concurrent_epochs_exactly_once(spark, tmp_path):
    """A stream epoch commit crashes at every point while a DIFFERENT
    epoch and a batch append race it: every epoch lands exactly once
    (the crashed one after its replay), the batch rows exactly once."""
    import threading

    delta7 = [(700 + i, 7) for i in range(3)]
    delta8 = [(800 + i, 8) for i in range(3)]
    batch = [(900 + i, 9) for i in range(3)]

    def epoch(p, rows, bid):
        w = P.ManifestStreamWriter({"path": p})
        w.commit([w.write(iter([Row(id=i, v=v) for i, v in rows]))], batchId=bid)

    for k in range(1, 14):
        path = str(tmp_path / f"ce-{k}")
        _setup_two_commits(spark, path)
        errs: list[BaseException] = []

        def crasher(p=path):
            try:
                epoch(p, delta7, 7)
            except InjectedCrash:
                pass
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        def other(p=path):
            try:
                epoch(p, delta8, 8)
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        def appender(p=path):
            try:
                _append_batch(p, [Row(id=i, v=v) for i, v in batch])
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        with crash_thread_at(path, k) as inj:
            ts = [
                threading.Thread(target=crasher, name="crasher"),
                threading.Thread(target=other, name="e8"),
                threading.Thread(target=appender, name="b"),
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        assert not errs, f"k={k}: survivor failed: {errs}"
        if inj.fired is None:
            break
        # replay the crashed epoch with fresh parts (a real restart)
        epoch(path, delta7, 7)
        cols, rows, m = _state(spark, path)
        for i, v in delta7 + delta8 + batch:
            assert (i, v) in rows, f"k={k}: row ({i},{v}) missing after {inj.fired!r}"
        assert len(rows) == 6 + 9, (
            f"k={k}: exactly-once broken after {inj.fired!r}: {len(rows)} rows"
        )
        assert 7 in m.get("batches", []) and 8 in m.get("batches", [])
    else:
        pytest.fail("epoch crasher had more than 13 injection points")


# --- byte-level truncation fuzz of the head-pointer cache ---------------------


def test_head_cache_truncated_at_every_byte(spark, tmp_path):
    """manifest.json truncated at EVERY byte offset: metadata reads must
    heal via the ledger probe at each one (the cache is a hint, never
    the truth), and the next commit repairs the cache."""
    path = str(tmp_path / "fuzzhead")
    _setup_two_commits(spark, path)
    cache = os.path.join(path, "manifest.json")
    with open(cache, "rb") as f:
        payload = f.read()
    for cut in range(len(payload)):
        with open(cache, "wb") as f:
            f.write(payload[:cut])
        head = P._head_snapshot(path)
        assert head["version"] == 2 and head["n_rows"] == 6, (
            f"cut={cut}: ledger probe failed over the torn cache"
        )
    # a torn PREFIX that is itself valid JSON of a wrong shape
    with open(cache, "w") as f:
        f.write('{"version": "not-an-int"}')
    assert P._head_snapshot(path)["version"] == 2
    # the next commit heals the cache
    _append_batch(path, [Row(id=9, v=90)])
    with open(cache) as f:
        assert json.load(f)["version"] == 3


# --- DISK-FULL (ENOSPC): the process survives, the cleanup paths run ---------


@contextlib.contextmanager
def enospc_at(table: str, nth: int):
    """Like crash_at, but the nth op raises OSError(ENOSPC) — the verb's
    own error handling (abort, loser cleanup, staged-file removal) runs,
    which a hard crash never exercises."""
    import errno

    inj = _Injector(table, nth)
    real = {"link": os.link, "replace": os.replace}

    def mk(name):
        r = real[name]

        def wrapper(*a, **k):
            if inj._qual(a) and inj.bump(f"{name}:{os.path.basename(str(a[-1]))}"):
                raise OSError(errno.ENOSPC, "No space left on device (injected)")
            return r(*a, **k)

        return wrapper

    real_dump = P._json.dump

    def failing_dump(obj, fp, **k):
        name = getattr(fp, "name", "")
        if isinstance(name, str) and inj._qual((name,)) and inj.bump(
            f"dump:{os.path.basename(name)}"
        ):
            payload = json.dumps(obj)
            fp.write(payload[: max(1, len(payload) // 2)])
            fp.flush()
            raise OSError(errno.ENOSPC, "No space left on device (injected)")
        return real_dump(obj, fp, **k)

    os.link, os.replace = mk("link"), mk("replace")
    P._json.dump = failing_dump
    try:
        yield inj
    finally:
        os.link, os.replace = real["link"], real["replace"]
        P._json.dump = real_dump


@pytest.mark.parametrize(
    "vname, verb",
    [
        ("append", lambda s, p: _append_batch(p, [Row(id=9, v=90)])),
        ("mor-delete", lambda s, p: P.delete_where_mor(p, "v", 10, 30)),
        ("rename", lambda s, p: P.rename_column(p, "v", "w")),
        ("restore", lambda s, p: P.restore_table(p, 1)),
        (
            "epoch",
            lambda s, p: P.ManifestStreamWriter({"path": p}).commit(
                [P.ManifestStreamWriter({"path": p}).write(iter([Row(id=9, v=90)]))],
                batchId=5,
            ),
        ),
    ],
)
def test_enospc_surfaces_and_table_stays_consistent(spark, tmp_path, vname, verb):
    """Every write-path op hit by ENOSPC: the verb must RAISE (never
    swallow a failed commit into a fake success), the table must read
    exactly pre or post, and the op must be retryable once space is
    back."""
    for k in range(1, 30):
        path = str(tmp_path / f"{vname}-{k}")
        _setup_two_commits(spark, path)
        pre_cols, pre_rows, _ = _state(spark, path)
        with enospc_at(path, k) as inj:
            raised = False
            try:
                verb(spark, path)
            except OSError:
                raised = True
            except RuntimeError as exc:
                # acceptable: the verb wrapped the failure loudly
                raised = True
                assert "space" in str(exc).lower() or "contention" in str(exc).lower(), exc
        if inj.fired is None:
            assert not raised
            break
        cols, rows, m = _state(spark, path)
        committed = (cols, rows) != (pre_cols, pre_rows)
        if not committed:
            assert raised, (
                f"{vname}: ENOSPC at {inj.fired!r} swallowed — verb reported "
                "success but the table never changed (silent data loss)"
            )
        # space comes back; the verb must work again
        try:
            verb(spark, path)
        except Exception as exc:  # noqa: BLE001 - rename-after-commit legally refuses
            assert vname == "rename" and committed, exc
        _state(spark, path)
    else:
        pytest.fail(f"{vname}: more than 29 ENOSPC points")


def test_enospc_cow_verbs_surface_and_stay_consistent(spark, tmp_path):
    """ENOSPC during the Spark-backed rewrite verbs (CoW delete, zorder,
    merge): the verb surfaces the failure, the staged rewrite never
    becomes the head partially, and the verb succeeds once space is
    back."""
    cases = [
        ("cow-delete", lambda s, p: P.delete_where(s, p, "v", 10, 30)),
        ("zorder", lambda s, p: P.optimize_zorder(s, p, ("id", "v"), bits=4, n_files=2)),
        (
            "merge",
            lambda s, p: P.merge_upsert(
                s, p, s.createDataFrame([Row(id=2, v=222)]), "id"
            ),
        ),
    ]
    for vname, verb in cases:
        for k in range(1, 40):
            path = str(tmp_path / f"{vname}-{k}")
            _setup_two_commits(spark, path)
            pre_cols, pre_rows, _ = _state(spark, path)
            with enospc_at(path, k) as inj:
                raised = False
                try:
                    verb(spark, path)
                except (OSError, RuntimeError):
                    raised = True
            if inj.fired is None:
                assert not raised
                break
            cols, rows, _ = _state(spark, path)
            committed = (cols, rows) != (pre_cols, pre_rows)
            if not committed:
                assert raised, (
                    f"{vname}: ENOSPC at {inj.fired!r} swallowed into success"
                )
            verb(spark, path)  # space back: must work
            _state(spark, path)
        else:
            pytest.fail(f"{vname}: more than 39 ENOSPC points")


# --- reader STORM racing a crashing writer ------------------------------------


def test_reader_storm_during_crashing_writers(spark, tmp_path):
    """Four uncoordinated reader threads hammer head reads, time-travel
    and the change feed WHILE a writer crashes at every commit-path op
    and another writer commits normally: no reader may ever see a torn
    snapshot (row multiset not equal to any committed version) or an
    unexpected error."""
    import threading

    path = str(tmp_path / "storm")
    _setup_two_commits(spark, path)
    # committed row counts only ever grow by whole 3-row deltas: any
    # multiple of 3 in [6, 6 + 16*3] is a legal snapshot, anything else
    # is torn (the reader cannot know WHICH commits landed yet, only
    # that every visible state is a whole-delta composition)
    reader_errs: list[BaseException] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                head = P._head_snapshot(path)
                assert head["n_rows"] % 3 == 0 and 6 <= head["n_rows"] <= 54, head["n_rows"]
                # time-travel to the base version stays exact
                base = P._head_snapshot(path, version=2)
                assert base["n_rows"] == 6
                deltas = P._append_deltas(path, 0, head["version"])
                assert deltas[-1]["version"] == head["version"]
            except BaseException as e:  # noqa: BLE001
                reader_errs.append(e)
                return

    readers = [threading.Thread(target=reader, name=f"r{i}") for i in range(4)]
    for t in readers:
        t.start()
    try:

        for k in range(1, 9):
            delta = [Row(id=1000 * k + i, v=k) for i in range(3)]
            with crash_thread_at(path, k) as inj:

                def crasher():
                    try:
                        _append_batch(path, delta)
                    except InjectedCrash:
                        pass

                t = threading.Thread(target=crasher, name="crasher")
                t.start()
                t.join()
            # a clean committer advances the table over the residue
            _append_batch(path, [Row(id=2000 * k + i, v=-k) for i in range(3)])
            if inj.fired is None:
                break
    finally:
        stop.set()
        for t in readers:
            t.join()
    assert not reader_errs, f"reader saw a torn/failed state: {reader_errs[:3]}"


def test_crash_sweep_shallow_clone(spark, tmp_path):
    """Clone killed at every op: the TARGET either has no table at all
    or is the complete clone (never a half-wired reference set); a retry
    refuses on a committed clone and succeeds otherwise; divergence
    isolation holds over the residue."""
    for k in range(1, 30):
        src = str(tmp_path / f"src-{k}")
        dst = str(tmp_path / f"dst-{k}")
        _setup_two_commits(spark, src)
        _, src_rows, _ = _state(spark, src)
        with crash_at(dst, k) as inj:
            try:
                P.shallow_clone(src, dst)
            except InjectedCrash:
                pass
        if inj.fired is None:
            break
        try:
            _, rows, m = _state(spark, dst)
            committed = True
            assert rows == src_rows and m["op"] == "clone", (
                f"k={k}: torn clone after {inj.fired!r}"
            )
        except FileNotFoundError:
            committed = False
        # retry: a committed clone refuses (fresh-target contract),
        # an uncommitted one completes
        try:
            P.shallow_clone(src, dst)
            assert not committed, f"k={k}: double-clone accepted"
        except RuntimeError as exc:
            assert committed and "already has a table" in str(exc), exc
        _, rows, _ = _state(spark, dst)
        assert rows == src_rows
        # divergence isolation over the residue: the clone's own append
        # and vacuum never touch the source
        _append_batch(dst, [Row(id=77, v=770)])
        P.vacuum(dst, keep_versions=50, retention_seconds=0)
        _, src_after, _ = _state(spark, src)
        assert src_after == src_rows, f"k={k}: clone activity mutated the SOURCE"
    else:
        pytest.fail("shallow_clone had more than 29 injection points")


# --- a stream whose CHECKPOINTED offset was vacuumed away ---------------------


def test_stream_tail_over_vacuumed_offsets_refuses_then_resumes(spark, tmp_path):
    """A restarting stream replays from its WAL offset.  If vacuum
    expired that version's manifest while the stream was down, the
    replay must refuse LOUDLY (never silently skip rows), and tailing
    from the earliest surviving snapshot must work."""
    from pyspark.sql import types as T

    path = str(tmp_path / "st")
    for lo in (0, 3, 6, 9):
        _append_batch(path, [Row(id=i, v=i * 10) for i in range(lo, lo + 3)])
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    reader = P.ManifestStreamReader({"path": path}, schema)
    P.vacuum(path, keep_versions=2, retention_seconds=0)  # v1, v2 expire
    with pytest.raises(RuntimeError, match="expired by vacuum"):
        list(reader.readBetweenOffsets({"version": 1}, {"version": 4}))
    rows = list(reader.readBetweenOffsets({"version": 3}, {"version": 4}))
    assert sorted(rows) == [(i, i * 10) for i in range(9, 12)]
    # and the live cursor keeps tailing new appends
    _append_batch(path, [Row(id=99, v=990)])
    it, end = reader.read({"version": 4})
    assert end["version"] == 5 and list(it) == [(99, 990)]
