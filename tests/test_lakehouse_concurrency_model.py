"""Model-based CONCURRENCY test of the manifest-table verb algebra
(round-9 verdict item 4): the sequential machine
(`test_lakehouse_model.py`) pins single-writer sequences; this machine
pins RACING pairs — an interloper verb B commits in the window between
the victim verb A planning its manifest and A claiming its version,
which is exactly the interleaving the OCC claim
(`_claim_and_publish`'s atomic hard-link) exists to arbitrate.

The injection is deterministic: `P._claim_and_publish` is patched so
the FIRST claim attempt of A first runs B to completion (through the
real claim), then proceeds — so B always serializes BEFORE A, and the
pure-Python model replays exactly `base ; B ; A`.

The contract under test, per verb family:
  * retry-loop committers (stream-epoch commit, MoR delete, rename)
    must LOSE the claim, RE-PLAN against B's snapshot, and land a
    manifest that composes with B's — or surface B's semantic block
    (rename onto a table B just gave pending MoR deletes must refuse;
    an epoch B already committed must replay as a no-op that deletes
    its own parts);
  * single-shot CoW rewriters (CoW delete, MERGE upsert, materialize)
    must raise `lost the commit race`, leave the table EXACTLY at B's
    outcome, and remove every file they staged (loser cleanup); the
    caller's documented recovery — re-run the verb — must then land
    `base ; B ; A`.
  * nothing may orphan: every `part-*` file on disk is referenced by
    some ledger version (time-travel files are not orphans), and no
    `_uncommitted_*` staging file survives a completed scenario.

The round-8 sequential machine found a real bug on its first run; the
resurrection-class bugs this machine targets hide in the re-plan step
(a retry that reuses any part of the PRE-race plan — file lists,
eq-delete scopes, batch ledgers — resurrects state B already rewrote).

Round-9 continuation: the alphabet grew from 6 to 10 verbs — batch
append/overwrite (real ManifestParquetWriter, driven in-process so the
claim patch reaches the commit), restore-to-v1, and
add_check_constraint — adding the races the first alphabet could not
express: a constraint B lands mid-claim must be enforced by A's
RE-PLAN ("commit rejected"), a restore must roll data back without
un-processing stream epochs (terminal replay probe), and an overwrite
must reset read-side metadata B just created (renames, MoR scopes)
while carrying the ledger and constraints forward.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import pytest

# round-13: close-gate-only sweep leg (model-based concurrency interleavings) — see pytest.ini
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P

# (tag, payload) verb encodings.  Epoch batch ids are drawn from a tiny
# set so A and B racing the SAME epoch id (the replay-guard path) is a
# reachable state.  Round-9 continuation: the alphabet grew to the
# METADATA verbs — batch append/overwrite (driven through the real
# ManifestParquetWriter, in-process so the claim patch applies),
# restore-to-v1 (may it un-process stream epochs? — the terminal
# replay probe says no), and add_check_constraint (a constraint B
# lands mid-claim must be enforced by A's RE-PLAN, not A's stale plan).
RACE_VERB = st.one_of(
    st.tuples(st.just("epoch"), st.tuples(st.integers(1, 2), st.integers(0, 3))),
    st.tuples(st.just("delete_cow"), st.tuples(st.integers(0, 8), st.integers(0, 8))),
    st.tuples(st.just("delete_mor"), st.tuples(st.integers(0, 8), st.integers(0, 8))),
    st.tuples(st.just("merge"), st.integers(0, 3)),
    st.tuples(st.just("materialize"), st.none()),
    st.tuples(st.just("rename"), st.none()),
    st.tuples(st.just("append"), st.integers(0, 3)),
    st.tuples(st.just("overwrite"), st.integers(0, 3)),
    st.tuples(st.just("restore"), st.none()),
    st.tuples(st.just("constraint"), st.tuples(st.integers(0, 8), st.integers(0, 8))),
    # the round-9 conflict-safe layout rewrite (single-shot CoW) and the
    # WAP publish (its own family: a version guard, not a retry loop)
    st.tuples(st.just("zorder"), st.none()),
    st.tuples(st.just("publish"), st.none()),
)

RETRY_FAMILY = {"epoch", "delete_mor", "rename", "append", "overwrite", "restore", "constraint"}
SINGLE_SHOT = {"delete_cow", "merge", "materialize", "zorder"}


def _batch_rows(batch: int):
    """Deterministic 10-row batch; v is NULL on every 4th row."""
    base = batch * 100
    return [
        (base + i, (base + i) % 5, None if i % 4 == 0 else (base + i) % 9)
        for i in range(10)
    ]


def _write_uncommitted_part(path: str, rows, vcol: str) -> str:
    """One task part under the underscore-hidden contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)  # the sink's task writer does this
    fn = f"_uncommitted_{uuid.uuid4().hex}.parquet"
    tbl = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "k": pa.array([r[1] for r in rows], pa.int32()),
            vcol: pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(path, fn))
    return fn


def _epoch_commit(path: str, batch: int, batch_id: int, vcol: str) -> None:
    """Drive the REAL streaming epoch commit path without a stream: one
    task part written under the underscore-hidden contract, then the
    driver-side `ManifestStreamWriter.commit` (replay guard, constraint
    proof, OCC retry loop — the full epoch discipline)."""
    rows = _batch_rows(batch)
    fn = _write_uncommitted_part(path, rows, vcol)
    P.ManifestStreamWriter({"path": path}).commit(
        [P.PartFileCommit(fn, len(rows))], batch_id
    )


def _batch_commit(path: str, batch: int, vcol: str, overwrite: bool) -> None:
    """Drive the REAL batch writer commit path in-process (the spark
    `.save()` route commits in a separate Python worker, where the
    claim patch cannot reach): one hidden task part, then the
    driver-side `ManifestParquetWriter.commit` — rename-visible,
    constraint proof per attempt, OCC retry loop."""
    rows = _batch_rows(batch)
    fn = _write_uncommitted_part(path, rows, vcol)
    P.ManifestParquetWriter({"path": path}, overwrite=overwrite).commit(
        [P.PartFileCommit(fn, len(rows))]
    )


class Model:
    """Pure-Python twin: logical rows + the metadata the race outcomes
    depend on (committed epoch ids; whether the REAL head carries
    pending MoR deletes is consulted live, same as the sequential
    machine's `mor_pending`)."""

    def __init__(self):
        self.rows: dict[int, tuple] = {}
        self.vcol = "v"
        self.batches: set[int] = set()
        self.seq = 50  # fresh-id counter for merge inserts
        # active CHECK constraints: name -> (col, lo, hi).  In the pair
        # machine every add targets the vcol current at call time, and
        # renames of constrained columns refuse, so col == vcol while
        # a constraint is active.
        self.constraints: dict[str, tuple[str, int, int]] = {}
        self.cn_a = 0  # A-side constraint-name counter ("ca{n}")
        self.cn_b = 0  # B-side counter ("cb{n}") — distinct namespaces,
        # so a constraint/constraint race never collides on the name
        # (the duplicate-name path is the sequential machine's job)
        self.v1_rows: dict[int, tuple] = {}  # state at version 1
        self.v1_vcol = "v"
        self.staged_batch: list[tuple] | None = None  # WAP candidate

    def state_violates(self, rows: dict, state_vcol: str) -> bool:
        """Would `rows` (a logical state whose value column is named
        `state_vcol`) violate any ACTIVE constraint?  A constraint on a
        column the state does not carry is vacuously satisfied
        (absent = all-NULL, and NULL passes a range CHECK — the same
        three-valued rule the footer proof applies)."""
        return any(
            ccol == state_vcol
            and any(v is not None and not (lo <= v <= hi) for _k, v in rows.values())
            for ccol, lo, hi in self.constraints.values()
        )

    def batch_violates(self, batch, batch_vcol: str) -> bool:
        return any(
            ccol == batch_vcol
            and any(v is not None and not (lo <= v <= hi) for _i, _k, v in batch)
            for ccol, lo, hi in self.constraints.values()
        )

    def apply_epoch(self, batch: int, batch_id: int) -> bool:
        """Returns True iff the epoch COMMITS (not a replay)."""
        if batch_id in self.batches:
            return False
        self.batches.add(batch_id)
        self.rows.update({i: (k, v) for i, k, v in _batch_rows(batch)})
        return True

    def apply_delete(self, lo: int, hi: int) -> None:
        # three-valued logic: NULL v survives any range delete
        self.rows = {
            i: (k, v) for i, (k, v) in self.rows.items() if v is None or not (lo <= v <= hi)
        }

    def apply_merge(self, payload: int) -> list[tuple]:
        upd = [(i, 7, (3 * payload + i) % 9) for i in sorted(self.rows)[: 2 + payload]]
        upd.append((9000 + payload, 7, None))  # insert with NULL value
        self.rows.update({i: (k, v) for i, k, v in upd})
        return upd


def _run_verb(spark, path: str, model: Model, tag: str, payload) -> None:
    """Execute a verb for real AND in the model (no race injection —
    used for B inside the patch window and for single-shot re-runs)."""
    if tag == "epoch":
        batch_id, batch = payload
        _epoch_commit(path, batch, batch_id, model.vcol)
        model.apply_epoch(batch, batch_id)
    elif tag == "delete_cow":
        lo, hi = sorted(payload)
        P.delete_where(spark, path, model.vcol, lo, hi)
        model.apply_delete(lo, hi)
    elif tag == "delete_mor":
        lo, hi = sorted(payload)
        P.delete_where_mor(path, model.vcol, lo, hi)
        model.apply_delete(lo, hi)
    elif tag == "merge":
        upd = [
            (i, 7, (3 * payload + i) % 9) for i in sorted(model.rows)[: 2 + payload]
        ]
        upd.append((9000 + payload, 7, None))
        df = spark.createDataFrame(upd, f"id long, k int, {model.vcol} int")
        if model.batch_violates(upd, model.vcol):
            # reachable on the documented single-shot RECOVERY re-run:
            # B landed a constraint the merge's update values violate
            with pytest.raises(RuntimeError, match="commit rejected"):
                P.merge_upsert(spark, path, df, "id")
        else:
            P.merge_upsert(spark, path, df, "id")
            model.rows.update({i: (k, v) for i, k, v in upd})
    elif tag == "materialize":
        P.materialize_deletes(spark, path)
        # physical only: logical rows unchanged
    elif tag == "zorder":
        P.optimize_zorder(spark, path, ("id", "k"), bits=4, n_files=4)
        # physical only: logical rows unchanged (reads logically, resets
        # rename log and MoR entries into the rewritten files)
    elif tag == "publish":
        P.publish_staged(path)
        model.rows.update({i: (k, v) for i, k, v in model.staged_batch})
        model.staged_batch = None
    elif tag == "rename":
        new = "w" if model.vcol == "v" else "v"
        if any(
            d["col"] == model.vcol
            for d in P._latest_snapshot(path).get("eq_deletes", [])
        ):
            with pytest.raises(RuntimeError, match="pending merge-on-read"):
                P.rename_column(path, model.vcol, new)
        elif any(c[0] == model.vcol for c in model.constraints.values()):
            with pytest.raises(RuntimeError, match="CHECK constraints"):
                P.rename_column(path, model.vcol, new)
        else:
            P.rename_column(path, model.vcol, new)
            model.vcol = new
    elif tag == "append":
        batch = _batch_rows(20 + payload)
        if model.batch_violates(batch, model.vcol):
            with pytest.raises(RuntimeError, match="commit rejected"):
                _batch_commit(path, 20 + payload, model.vcol, overwrite=False)
        else:
            _batch_commit(path, 20 + payload, model.vcol, overwrite=False)
            model.rows.update({i: (k, v) for i, k, v in batch})
    elif tag == "overwrite":
        batch = _batch_rows(40 + payload)
        if model.batch_violates(batch, model.vcol):
            with pytest.raises(RuntimeError, match="commit rejected"):
                _batch_commit(path, 40 + payload, model.vcol, overwrite=True)
        else:
            # replaces every row; resets renames + eq-deletes (the new
            # table's schema is the written batch's physical names);
            # constraints and the epoch ledger carry forward
            _batch_commit(path, 40 + payload, model.vcol, overwrite=True)
            model.rows = {i: (k, v) for i, k, v in batch}
    elif tag == "restore":
        # always targets v1 (the setup epoch commit) — the one version
        # every scenario is guaranteed to have; validated against the
        # CURRENT constraint set
        if model.state_violates(model.v1_rows, model.v1_vcol):
            with pytest.raises(RuntimeError, match="violates constraint"):
                P.restore_table(path, 1)
        else:
            P.restore_table(path, 1)
            model.rows = dict(model.v1_rows)
            model.vcol = model.v1_vcol
            # the epoch ledger follows the HEAD: model.batches unchanged
    elif tag == "constraint":
        lo, hi = sorted(payload)
        name = f"cb{model.cn_b}"
        model.cn_b += 1
        if any(v is not None and not (lo <= v <= hi) for _k, v in model.rows.values()):
            with pytest.raises(RuntimeError, match="violates constraint"):
                P.add_check_constraint(path, name, model.vcol, lo=lo, hi=hi)
        else:
            P.add_check_constraint(path, name, model.vcol, lo=lo, hi=hi)
            model.constraints[name] = (model.vcol, lo, hi)
    else:  # pragma: no cover
        raise AssertionError(tag)


def _spark_state(spark, path: str, model: Model) -> dict:
    df, _m = P.read_manifest(spark, path)
    assert sorted(df.columns) == sorted(["id", "k", model.vcol]), df.columns
    return {r["id"]: (r["k"], r[model.vcol]) for r in df.collect()}


def _no_orphans(path: str) -> None:
    """Every part file on disk is referenced by SOME ledger version
    (older versions keep their files for time travel — those are not
    orphans), and no staging residue survives."""
    referenced: set[str] = set()
    ref_chunks: set[str] = set()
    for mf in glob.glob(os.path.join(path, "_manifest-v*.json")) + glob.glob(
        # an in-flight WAP stage legitimately references parts no
        # versioned manifest lists yet (vacuum honors the same rule)
        os.path.join(path, "_staged-manifest.json")
    ):
        with open(mf) as f:
            raw = json.load(f)
        referenced |= set(P._resolve_manifest(path, raw).get("files", []))
        ref_chunks |= set(raw.get("file_chunks", []))
    on_disk = {os.path.basename(p) for p in glob.glob(os.path.join(path, "part-*"))}
    orphans = on_disk - referenced
    assert not orphans, f"orphaned part files after race: {sorted(orphans)}"
    chunk_orphans = {
        os.path.basename(c) for c in glob.glob(os.path.join(path, "_filelist-*.json"))
    } - ref_chunks
    assert not chunk_orphans, f"orphaned filelist chunks after race: {sorted(chunk_orphans)}"
    stray = glob.glob(os.path.join(path, "_uncommitted_*")) + glob.glob(
        os.path.join(path, "_*staging*")
    )
    assert not stray, f"staging residue after race: {stray}"


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pre_mor=st.booleans(),
    chunked=st.booleans(),
    a=RACE_VERB,
    b=RACE_VERB,
    # round-10 crash dimension: when set, the interloper B is REPLACED
    # by an append that CRASHES at write-path op N inside A's claim
    # window — A must compose over B's torn residue exactly as over a
    # clean commit (B serializes before A iff its claim got durable);
    # the residue is vacuum-reclaimed before the orphan audit, which is
    # the documented recovery
    b_crash=st.one_of(st.none(), st.integers(1, 7)),
)
def test_racing_verb_pairs_serialize_as_b_then_a(
    spark, tmp_path_factory, monkeypatch, pre_mor, chunked, a, b, b_crash
):
    a_tag, a_payload = a
    b_tag, b_payload = b
    path = str(tmp_path_factory.mktemp("race") / f"t_{uuid.uuid4().hex[:8]}")
    P.register_sink(spark)
    model = Model()
    # half the examples force CHUNKED manifests (file lists externalized
    # into _filelist-* chunks at every commit) so the whole race algebra
    # also runs against the round-9 manifest-compaction layer
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 2 if chunked else 2048)

    # base state: one committed epoch so the table exists, plus an
    # optional pending MoR delete (forced when either side materializes,
    # so materialize actually reaches its claim instead of no-opping)
    _epoch_commit(path, 99, 0, "v")
    model.apply_epoch(99, 0)
    model.v1_rows = dict(model.rows)  # restore verbs always target v1
    model.v1_vcol = "v"
    assert P._latest_snapshot(path)["version"] == 1
    if pre_mor or "materialize" in (a_tag, b_tag):
        P.delete_where_mor(path, "v", 3, 4)
        model.apply_delete(3, 4)
    if "publish" in (a_tag, b_tag):
        # a WAP stage exists before the race, so publish verbs have a
        # candidate; the pointer is invisible to every head reader
        model.staged_batch = _batch_rows(70)
        fn = _write_uncommitted_part(path, model.staged_batch, "v")
        P.ManifestParquetWriter({"path": path, "staged": "true"}, overwrite=False).commit(
            [P.PartFileCommit(fn, len(model.staged_batch))]
        )

    # ---- the race: B fires inside A's first claim attempt ----------------
    real_claim = P._claim_and_publish
    fired = {"done": False, "b_error": None}

    def racing_claim(p, manifest):
        if not fired["done"]:
            fired["done"] = True
            if b_crash is not None:
                # the interloper CRASHES mid-commit: residue on disk, a
                # version consumed iff its claim got durable — the model
                # branches on the ledger's verdict
                from pyspark.sql import Row

                from test_lakehouse_crash_machine import InjectedCrash, crash_at

                batch = _batch_rows(85)
                before_v = P._latest_snapshot(path)["version"]
                w = P.ManifestParquetWriter({"path": path}, overwrite=False)
                fn = _write_uncommitted_part(path, batch, model.vcol)
                with crash_at(path, b_crash):
                    try:
                        w.commit([P.PartFileCommit(fn, len(batch))])
                    except InjectedCrash:
                        pass
                if P._latest_snapshot(path)["version"] > before_v:
                    model.rows.update({i: (k, v) for i, k, v in batch})
            else:
                try:
                    _run_verb(spark, path, model, b_tag, b_payload)
                except Exception as exc:  # semantic refusals (e.g. rename block)
                    fired["b_error"] = exc
        return real_claim(p, manifest)

    monkeypatch.setattr(P, "_claim_and_publish", racing_claim)
    v_before = P._latest_snapshot(path)["version"]

    if a_tag == "publish":
        # its own family: a pre-claim VERSION GUARD plus one claim — if B
        # commits mid-claim, publish refuses ("re-stage" is the recovery)
        # and the stale pointer survives; if B refused/no-oped, the claim
        # is free and the publish lands.
        try:
            P.publish_staged(path)
            model.rows.update({i: (k, v) for i, k, v in model.staged_batch})
            model.staged_batch = None
        except RuntimeError as exc:
            assert "no longer applies" in str(exc)
            assert P._latest_snapshot(path)["version"] > v_before, (
                f"publish refused without a competing commit: {exc}"
            )
        monkeypatch.setattr(P, "_claim_and_publish", real_claim)
    elif a_tag in SINGLE_SHOT:
        try:
            _run_verb(spark, path, model, a_tag, a_payload)
            a_lost = False
        except RuntimeError as exc:
            assert "lost the commit race" in str(exc)
            a_lost = True
            # the model applied A optimistically inside _run_verb only on
            # success paths; _run_verb raises BEFORE mutating the model
            # for these verbs (the P.* call precedes the model update)
        monkeypatch.setattr(P, "_claim_and_publish", real_claim)
        if a_lost:
            # loser invariants: table is exactly B's outcome, no orphans
            assert fired["done"], "A lost without B committing?"
            assert _spark_state(spark, path, model) == dict(model.rows)
            _no_orphans(path)
            # documented recovery: re-run the verb; it must now compose
            _run_verb(spark, path, model, a_tag, a_payload)
        else:
            # A's claim won => B must not have committed a version under it
            assert P._latest_snapshot(path)["version"] > v_before
    else:
        # retry family: the verb itself re-plans after losing the claim.
        # B may have changed the world mid-claim, so the re-plan can hit
        # a DOCUMENTED semantic refusal the pre-race plan couldn't see:
        # a rename against pending MoR deletes B just created, or a
        # delete/rename whose column B just renamed away.  Each refusal
        # is only legal if B is of the kind that causes it.
        # A's plan is laid with the PRE-race vcol (model.vcol is read at
        # call time, before B mutates it inside the claim) — exactly the
        # stale-plan shape the re-plan discipline must survive
        a_vcol = model.vcol
        try:
            if a_tag == "rename":
                new = "w" if a_vcol == "v" else "v"
                P.rename_column(path, a_vcol, new)
                model.vcol = new
            elif a_tag == "delete_mor":
                lo, hi = sorted(a_payload)
                P.delete_where_mor(path, a_vcol, lo, hi)
                model.apply_delete(lo, hi)
            elif a_tag == "epoch":
                batch_id, batch = a_payload
                _epoch_commit(path, batch, batch_id, a_vcol)
                model.apply_epoch(batch, batch_id)
            elif a_tag == "append":
                _batch_commit(path, 30 + a_payload, a_vcol, overwrite=False)
                model.rows.update(
                    {i: (k, v) for i, k, v in _batch_rows(30 + a_payload)}
                )
            elif a_tag == "overwrite":
                _batch_commit(path, 50 + a_payload, a_vcol, overwrite=True)
                model.rows = {i: (k, v) for i, k, v in _batch_rows(50 + a_payload)}
                # overwrite resets the rename log: the table's logical
                # schema becomes the written batch's physical names —
                # the name A PLANNED with, even if B renamed mid-claim
                model.vcol = a_vcol
            elif a_tag == "restore":
                P.restore_table(path, 1)
                model.rows = dict(model.v1_rows)
                model.vcol = model.v1_vcol
            else:  # constraint
                lo, hi = sorted(a_payload)
                name = f"ca{model.cn_a}"
                model.cn_a += 1
                P.add_check_constraint(path, name, a_vcol, lo=lo, hi=hi)
                model.constraints[name] = (a_vcol, lo, hi)
        except RuntimeError as exc:
            msg = str(exc)
            if "no such column" in msg:
                assert b_tag == "rename", f"spurious column refusal: {msg} (B={b_tag})"
            elif "pending merge-on-read" in msg:
                assert a_tag == "rename" and P._latest_snapshot(path).get(
                    "eq_deletes"
                ), f"spurious MoR refusal: {msg}"
            elif "CHECK constraints" in msg:
                # a rename onto/off a column B just constrained
                assert (
                    a_tag == "rename" and b_tag == "constraint" and model.constraints
                ), f"spurious constraint-rename refusal: {msg}"
            elif "already exists" in msg:
                assert a_tag == "rename" and b_tag == "rename", msg
            elif "violates constraint" in msg:
                # add/restore proven against the post-B state must agree
                # with the model's own arithmetic
                if a_tag == "constraint":
                    lo, hi = sorted(a_payload)
                    assert any(
                        v is not None and not (lo <= v <= hi)
                        for _k, v in model.rows.values()
                    ), f"spurious add-constraint refusal: {msg}"
                else:
                    assert a_tag == "restore" and model.state_violates(
                        model.v1_rows, model.v1_vcol
                    ), f"spurious restore refusal: {msg}"
            elif "commit rejected" in msg:
                # write-side enforcement of a constraint B landed
                # mid-claim: A's re-plan (not A's stale plan) caught it
                batch = {
                    "epoch": _batch_rows(a_payload[1]) if a_tag == "epoch" else None,
                    "append": _batch_rows(30 + a_payload)
                    if a_tag == "append"
                    else None,
                    "overwrite": _batch_rows(50 + a_payload)
                    if a_tag == "overwrite"
                    else None,
                }.get(a_tag)
                assert batch is not None and b_tag == "constraint", msg
                assert model.batch_violates(batch, a_vcol), (
                    f"spurious write rejection: {msg}"
                )
            else:
                raise
            # refused => model unchanged (the verb applied nothing)
        monkeypatch.setattr(P, "_claim_and_publish", real_claim)

    # B's expected refusals are arbitrated INSIDE _run_verb (live-state
    # pytest.raises); anything that reached b_error is a genuine bug
    assert fired["b_error"] is None, (
        f"B={b_tag}({b_payload}) raised unexpectedly inside A={a_tag}'s "
        f"claim: {fired['b_error']!r}"
    )

    # ---- the model arbitrated B-then-A; the table must agree -------------
    assert _spark_state(spark, path, model) == dict(model.rows), (
        f"divergence after race A={a_tag}({a_payload}) B={b_tag}({b_payload}) "
        f"pre_mor={pre_mor} b_crash={b_crash}"
    )
    if b_crash is not None:
        # a crashed interloper legitimately leaves residue (renamed-but-
        # unclaimed parts, torn tmps); the documented recovery is vacuum,
        # after which the orphan audit must hold as usual
        P.vacuum(path, keep_versions=10**6, retention_seconds=0)
        assert _spark_state(spark, path, model) == dict(model.rows)
    _no_orphans(path)

    # terminal: materialize pending deletes and compare physically
    P.materialize_deletes(spark, path)
    assert _spark_state(spark, path, model) == dict(model.rows)
    head = P._latest_snapshot(path)
    assert not head.get("eq_deletes")
    assert set(head.get("file_columns", {})) == set(head["files"])

    # terminal replay probe: every epoch id ever committed must stay in
    # the ledger through ANY race outcome — in particular a restore must
    # not un-process stream epochs (its data rolls back, its ledger
    # follows the head).  Replaying each id with a FRESH batch number
    # must no-op; a dropped id would admit batch 97's rows and diverge.
    for bid in sorted(model.batches):
        _epoch_commit(path, 97, bid, model.vcol)
    assert _spark_state(spark, path, model) == dict(model.rows), (
        f"epoch replay after race A={a_tag} B={b_tag} changed the table "
        "— the ledger lost a committed batch id"
    )
    _no_orphans(path)
