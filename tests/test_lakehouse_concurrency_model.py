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
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P

# (tag, payload) verb encodings.  Epoch batch ids are drawn from a tiny
# set so A and B racing the SAME epoch id (the replay-guard path) is a
# reachable state.
RACE_VERB = st.one_of(
    st.tuples(st.just("epoch"), st.tuples(st.integers(1, 2), st.integers(0, 3))),
    st.tuples(st.just("delete_cow"), st.tuples(st.integers(0, 8), st.integers(0, 8))),
    st.tuples(st.just("delete_mor"), st.tuples(st.integers(0, 8), st.integers(0, 8))),
    st.tuples(st.just("merge"), st.integers(0, 3)),
    st.tuples(st.just("materialize"), st.none()),
    st.tuples(st.just("rename"), st.none()),
)

RETRY_FAMILY = {"epoch", "delete_mor", "rename"}
SINGLE_SHOT = {"delete_cow", "merge", "materialize"}


def _batch_rows(batch: int):
    """Deterministic 10-row batch; v is NULL on every 4th row."""
    base = batch * 100
    return [
        (base + i, (base + i) % 5, None if i % 4 == 0 else (base + i) % 9)
        for i in range(10)
    ]


def _epoch_commit(path: str, batch: int, batch_id: int, vcol: str) -> None:
    """Drive the REAL streaming epoch commit path without a stream: one
    task part written under the underscore-hidden contract, then the
    driver-side `ManifestStreamWriter.commit` (replay guard, constraint
    proof, OCC retry loop — the full epoch discipline)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _batch_rows(batch)
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
    P.ManifestStreamWriter({"path": path}).commit(
        [P.PartFileCommit(fn, len(rows))], batch_id
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
        P.merge_upsert(spark, path, df, "id")
        model.rows.update({i: (k, v) for i, k, v in upd})
    elif tag == "materialize":
        P.materialize_deletes(spark, path)
        # physical only: logical rows unchanged
    elif tag == "rename":
        new = "w" if model.vcol == "v" else "v"
        if any(
            d["col"] == model.vcol
            for d in P._latest_snapshot(path).get("eq_deletes", [])
        ):
            with pytest.raises(RuntimeError, match="pending merge-on-read"):
                P.rename_column(path, model.vcol, new)
        else:
            P.rename_column(path, model.vcol, new)
            model.vcol = new
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
    for mf in glob.glob(os.path.join(path, "_manifest-v*.json")):
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
)
def test_racing_verb_pairs_serialize_as_b_then_a(
    spark, tmp_path_factory, monkeypatch, pre_mor, chunked, a, b
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
    if pre_mor or "materialize" in (a_tag, b_tag):
        P.delete_where_mor(path, "v", 3, 4)
        model.apply_delete(3, 4)

    # ---- the race: B fires inside A's first claim attempt ----------------
    real_claim = P._claim_and_publish
    fired = {"done": False, "b_error": None}

    def racing_claim(p, manifest):
        if not fired["done"]:
            fired["done"] = True
            try:
                _run_verb(spark, path, model, b_tag, b_payload)
            except Exception as exc:  # semantic refusals (e.g. rename block)
                fired["b_error"] = exc
        return real_claim(p, manifest)

    monkeypatch.setattr(P, "_claim_and_publish", racing_claim)
    v_before = P._latest_snapshot(path)["version"]

    if a_tag in SINGLE_SHOT:
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
        try:
            if a_tag == "rename":
                new = "w" if model.vcol == "v" else "v"
                P.rename_column(path, model.vcol, new)
                model.vcol = new
            elif a_tag == "delete_mor":
                lo, hi = sorted(a_payload)
                P.delete_where_mor(path, model.vcol, lo, hi)
                model.apply_delete(lo, hi)
            else:  # epoch
                batch_id, batch = a_payload
                _epoch_commit(path, batch, batch_id, model.vcol)
                model.apply_epoch(batch, batch_id)
        except RuntimeError as exc:
            msg = str(exc)
            if "no such column" in msg:
                assert b_tag == "rename", f"spurious column refusal: {msg} (B={b_tag})"
            elif "pending merge-on-read" in msg:
                assert a_tag == "rename" and P._latest_snapshot(path).get(
                    "eq_deletes"
                ), f"spurious MoR refusal: {msg}"
            elif "already exists" in msg:
                assert a_tag == "rename" and b_tag == "rename", msg
            else:
                raise
            # refused => model unchanged (the verb applied nothing)
        monkeypatch.setattr(P, "_claim_and_publish", real_claim)

    # ---- the model arbitrated B-then-A; the table must agree -------------
    assert _spark_state(spark, path, model) == dict(model.rows), (
        f"divergence after race A={a_tag}({a_payload}) B={b_tag}({b_payload}) "
        f"pre_mor={pre_mor} b_error={fired['b_error']}"
    )
    _no_orphans(path)

    # terminal: materialize pending deletes and compare physically
    P.materialize_deletes(spark, path)
    assert _spark_state(spark, path, model) == dict(model.rows)
    head = P._latest_snapshot(path)
    assert not head.get("eq_deletes")
    assert set(head.get("file_columns", {})) == set(head["files"])
