"""Model-based property test of the manifest-table verb algebra
(round 8; alphabet grown since): hypothesis drives RANDOM SEQUENCES of
lakehouse verbs — append, CoW delete, MoR delete, delete-on-k (reaches
ZERO-FILE states), materialize, rename, MERGE upsert, restore,
overwrite, vacuum, CHECK constraints, refs (immutable tags / movable
branches with precise vacuum-pin expiry), and write-audit-publish
(stage / audit-read / publish-or-refuse / discard) — against two
implementations of the same contract:

  * the real table (`sources/pydatasource.py`, through the sink and
    the public verbs), read back logically after every commit;
  * a pure-Python model (a dict of rows + a snapshot history) applying
    the documented semantics: three-valued-logic range deletes (NULL
    survives), MERGE on key equality (NULL keys insert), renames as
    metadata, restore as a new commit of an old state.

Hand-written tests pin known interleavings; this pins the ALGEBRA — any
verb sequence the generator can reach must agree cell-for-cell.  The
round-7/8 bug classes (MoR resurrection in CoW rewrites, NULL rows
dropped by range deletes, stale rename application) are all reachable
states of this machine."""

from __future__ import annotations

import pytest

# round-13: close-gate-only sweep leg (model-based verb-sequence enumeration) — see pytest.ini
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P

# Each verb is (tag, payload) — payloads drawn small so sequences stay
# fast (every verb is a real Spark commit on a tiny table).
VERB = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 3)),
    st.tuples(st.just("delete_cow"), st.tuples(st.integers(0, 8), st.integers(0, 8))),
    st.tuples(st.just("delete_mor"), st.tuples(st.integers(0, 8), st.integers(0, 8))),
    # deletes on k (never NULL, values 0..4) can EMPTY the table — the
    # zero-file states the round-9 schema_ddl work makes readable
    st.tuples(
        st.just("delete_k"),
        st.tuples(st.integers(0, 4), st.integers(0, 4), st.booleans()),
    ),
    st.tuples(st.just("materialize"), st.none()),
    st.tuples(st.just("rename"), st.none()),
    st.tuples(st.just("merge"), st.integers(0, 3)),
    st.tuples(st.just("restore"), st.integers(1, 6)),
    st.tuples(st.just("overwrite"), st.integers(0, 3)),
    st.tuples(st.just("vacuum"), st.none()),
    st.tuples(st.just("constraint"), st.tuples(st.integers(0, 8), st.integers(0, 8))),
    st.tuples(st.just("drop_constraint"), st.none()),
    st.tuples(st.just("tag"), st.integers(0, 11)),
    st.tuples(st.just("branch"), st.integers(0, 11)),
    st.tuples(st.just("advance"), st.integers(0, 11)),
    st.tuples(st.just("drop_ref"), st.none()),
    # write-audit-publish: stage an invisible append, audit-read it,
    # publish (refused if the head moved since) or discard it
    st.tuples(st.just("stage"), st.integers(0, 3)),
    st.tuples(st.just("publish"), st.none()),
    st.tuples(st.just("discard"), st.none()),
    # layout rewrite: logical rows unchanged, one overwrite commit that
    # implicitly materializes pending MoR deletes (the input is read
    # logically) and resets the rename log
    st.tuples(st.just("zorder"), st.none()),
    # CRASH CHAOS: regress the manifest.json pointer CACHE to an older
    # version (a committer died between claim and head move) — the
    # ledger is the source of truth, so nothing downstream may notice
    st.tuples(st.just("stale_head"), st.integers(0, 11)),
    # TORN CRASH verbs (round 10, from the crash-injection machine): an
    # append / a stream epoch killed at write-path op N — residue (torn
    # claim tmps, renamed-but-unclaimed parts, stale pointers) now
    # interacts with EVERY LATER VERB in the sequence, which the
    # machine's one-shot sweeps cannot reach.  The model branches on the
    # LEDGER's verdict (version consumed or not); the epoch verb replays
    # itself and must land exactly once either way.
    st.tuples(st.just("crashed_append"), st.tuples(st.integers(0, 3), st.integers(1, 7))),
    st.tuples(st.just("crashed_epoch"), st.tuples(st.integers(0, 3), st.integers(1, 9))),
)


def _batch_rows(batch: int):
    """Deterministic 12-row batch; v is NULL on every 4th row."""
    base = batch * 100
    return [
        (base + i, (base + i) % 5, None if i % 4 == 0 else (base + i) % 9)
        for i in range(12)
    ]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(verbs=st.lists(VERB, min_size=3, max_size=7), chunked=st.booleans())
def test_verb_sequences_match_model(spark, tmp_path_factory, monkeypatch, verbs, chunked):
    import uuid

    path = str(tmp_path_factory.mktemp("model") / f"t_{uuid.uuid4().hex[:8]}")
    P.register_sink(spark)
    # half the examples force CHUNKED manifests (file lists externalized
    # into _filelist-* chunks at every commit) so the whole sequential
    # algebra — incl. restore/refs/WAP/stale-head — also runs against
    # the round-9 manifest-compaction layer (the race machine already
    # did; the sequential machine only ever saw inline manifests)
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 2 if chunked else 2048)

    # ---- model state ----
    rows: dict[int, tuple] = {}  # id -> (k, v)
    vcol = "v"  # current logical name of the value column
    seq = 0  # append sequence: every append is a FRESH id range (append
    # is not upsert — a repeated range would put duplicate rows in the
    # table that the dict-shaped compare below cannot see)
    history: list[tuple[dict, str]] = []  # per committed version

    constraints: dict[str, tuple[str, int, int]] = {}  # name -> (col, lo, hi)
    cn = 0
    # PRECISE expiry model (round-9 extension): `removed` is exactly the
    # set of versions whose manifests vacuum has deleted — a version
    # expires iff it was below the horizon AND unpinned at some vacuum.
    # Refs (immutable tags + movable branches) pin versions; MOVING a
    # branch or DROPPING a ref un-pins, making the version vacuumable
    # at the NEXT vacuum but not retroactively — which a simple
    # monotone-horizon model cannot express.
    removed: set[int] = set()
    refs_model: dict[str, tuple[str, int]] = {}  # name -> (kind, version)
    tn = bn = 0
    # change-feed ledger: (version, physical value-col name, batch) for
    # every APPEND-op commit — the only op the append-feed emits rows
    # for (merge/overwrite/restore/delete are dataChange=false)
    cdf_log: list[tuple[int, str, list[tuple]]] = []
    # WAP state: (batch, base version at stage time, vcol at stage time)
    # or None; a newer stage REPLACES the pointer (the old stage's parts
    # are unreferenced until vacuum — invisible to every head reader)
    staged: tuple[list[tuple], int, str] | None = None

    def batch_violates(batch, col) -> bool:
        """Does writing `batch` under column name `col` violate any
        ACTIVE constraint?  A constraint whose column name is not the
        current value column is vacuously satisfied (the column is
        absent from the write = all-NULL, and NULL passes a range
        CHECK — mirrors the footer proof exactly)."""
        return any(
            ccol == col and any(v is not None and not (lo <= v <= hi) for _i, _k, v in batch)
            for ccol, lo, hi in constraints.values()
        )

    def rows_violate(state_rows, col) -> bool:
        return any(
            ccol == col and any(v is not None and not (lo <= v <= hi) for _k, v in state_rows.values())
            for ccol, lo, hi in constraints.values()
        )

    def mor_pending() -> bool:
        return bool(P._latest_snapshot(path).get("eq_deletes"))

    def snap():
        history.append((dict(rows), vcol))

    def spark_state():
        df, _m = P.read_manifest(spark, path)
        assert sorted(df.columns) == sorted(["id", "k", vcol]), df.columns
        return {r["id"]: (r["k"], r[vcol]) for r in df.collect()}

    def model_state():
        return dict(rows)

    # every sequence starts with one append so the table exists
    first = _batch_rows(99)
    spark.createDataFrame(first, "id long, k int, v int").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    rows.update({i: (k, v) for i, k, v in first})
    snap()
    cdf_log.append((len(history), "v", first))

    for tag, payload in verbs:
        if tag == "append":
            batch = _batch_rows(seq + 2 * payload)
            seq += 10
            df = spark.createDataFrame(batch, f"id long, k int, {vcol} int")
            if batch_violates(batch, vcol):
                with pytest.raises(Exception, match="constraint"):
                    df.coalesce(1).write.format("rtbd_manifest_sink").option(
                        "path", path
                    ).mode("append").save()
                # rejected commit: table untouched, no version consumed
            else:
                df.coalesce(1).write.format("rtbd_manifest_sink").option(
                    "path", path
                ).mode("append").save()
                rows.update({i: (k, v) for i, k, v in batch})
                snap()
                cdf_log.append((len(history), vcol, batch))
        elif tag in ("crashed_append", "crashed_epoch"):
            import pyarrow as pa
            from pyspark.sql import Row

            from test_lakehouse_crash_machine import InjectedCrash, crash_at

            batch_i, point = payload
            batch = _batch_rows(seq + 2 * batch_i)
            seq += 10
            if batch_violates(batch, vcol):
                continue  # constraint rejection is the append verb's turf
            arrow_schema = pa.schema(
                [("id", pa.int64()), ("k", pa.int32()), (vcol, pa.int32())]
            )
            brows = [Row(**{"id": i, "k": k, vcol: v}) for i, k, v in batch]
            before_v = P._latest_snapshot(path)["version"]
            if tag == "crashed_append":
                w = P.ManifestParquetWriter({"path": path}, overwrite=False)
                w.arrow_schema = arrow_schema
                with crash_at(path, point):
                    try:
                        w.commit([w.write(iter(brows))])
                    except InjectedCrash:
                        pass
                committed = P._latest_snapshot(path)["version"] > before_v
            else:
                bid = 50_000 + seq  # unique epoch id per verb instance

                def _epoch():
                    w = P.ManifestStreamWriter({"path": path})
                    w.arrow_schema = arrow_schema
                    w.commit([w.write(iter(brows))], batchId=bid)

                with crash_at(path, point):
                    try:
                        _epoch()
                    except InjectedCrash:
                        pass
                _epoch()  # replay with fresh parts — must land exactly once
                assert P._latest_snapshot(path)["version"] == before_v + 1
                committed = True
            if committed:
                rows.update({i: (k, v) for i, k, v in batch})
                snap()
                cdf_log.append((len(history), vcol, batch))
        elif tag in ("delete_cow", "delete_mor"):
            lo, hi = sorted(payload)
            if tag == "delete_cow":
                P.delete_where(spark, path, vcol, lo, hi)
            else:
                P.delete_where_mor(path, vcol, lo, hi)
            # three-valued logic: NULL v survives any range delete
            rows = {
                i: (k, v)
                for i, (k, v) in rows.items()
                if v is None or not (lo <= v <= hi)
            }
            snap()
        elif tag == "delete_k":
            lo, hi = sorted(payload[:2])
            if payload[2]:
                P.delete_where_mor(path, "k", lo, hi)
            else:
                P.delete_where(spark, path, "k", lo, hi)
            # k is never NULL; [0, 4] removes EVERY row — the table may
            # go zero-file and must stay readable under schema_ddl
            rows = {i: (k, v) for i, (k, v) in rows.items() if not (lo <= k <= hi)}
            snap()
        elif tag == "materialize":
            had_pending = mor_pending()
            m = P.materialize_deletes(spark, path)
            if had_pending:  # a real commit happened
                snap()
            else:
                assert m["n_files_rewritten"] == 0  # no-op: no commit
        elif tag == "rename":
            new = "w" if vcol == "v" else "v"
            head_live = P._latest_snapshot(path)
            blocked = (
                # only eq-deletes ON THE RENAMED COLUMN block (a pending
                # MoR delete on k does not pin v/w); zero-file tables
                # rename via the recorded schema_ddl, so emptiness does
                # not block
                any(d["col"] == vcol for d in head_live.get("eq_deletes", []))
                or any(c[0] == vcol for c in constraints.values())  # from-guard
                or any(c[0] == new for c in constraints.values())  # to-guard
            )
            if blocked:
                with pytest.raises(
                    RuntimeError,
                    match="pending merge-on-read|CHECK constraints",
                ):
                    P.rename_column(path, vcol, new)
            else:
                P.rename_column(path, vcol, new)
                vcol = new
                snap()
        elif tag == "merge":
            upd = [(i, 7, (3 * payload + i) % 9) for i in sorted(rows)[: 2 + payload]]
            upd.append((9000 + payload, 7, None))  # insert, NULL value
            df = spark.createDataFrame(upd, f"id long, k int, {vcol} int")
            if batch_violates(upd, vcol):
                with pytest.raises(Exception, match="constraint"):
                    P.merge_upsert(spark, path, df, "id")
            else:
                P.merge_upsert(spark, path, df, "id")
                rows.update({i: (k, v) for i, k, v in upd})
                snap()
        elif tag == "restore":
            v = 1 + (payload % len(history))
            if v in removed:
                # the target snapshot was vacuumed away: refuse loudly,
                # commit nothing (Iceberg expire_snapshots behavior).
                # A version PINNED at vacuum time is not in `removed` —
                # its manifest and files survive, so restore succeeds
                # (the elif/else paths below) even below the horizon.
                with pytest.raises(RuntimeError, match="cannot restore"):
                    P.restore_table(path, v)
            elif rows_violate(history[v - 1][0], history[v - 1][1]):
                # restore is validated against the CURRENT constraints:
                # a target state violating one is refused, no commit
                with pytest.raises(RuntimeError, match="violates constraint"):
                    P.restore_table(path, v)
            else:
                P.restore_table(path, v)
                rows, vcol = dict(history[v - 1][0]), history[v - 1][1]
                snap()
        elif tag == "overwrite":
            # overwrite replaces every data file and RESETS read-side
            # metadata (renames, eq-deletes) but CARRIES constraints
            # (table metadata); written under the CURRENT logical name
            batch = _batch_rows(seq + 2 * payload)
            seq += 10
            df = spark.createDataFrame(batch, f"id long, k int, {vcol} int")
            if batch_violates(batch, vcol):
                with pytest.raises(Exception, match="constraint"):
                    df.coalesce(1).write.format("rtbd_manifest_sink").option(
                        "path", path
                    ).mode("overwrite").save()
            else:
                df.coalesce(1).write.format("rtbd_manifest_sink").option(
                    "path", path
                ).mode("overwrite").save()
                rows = {i: (k, v) for i, k, v in batch}
                snap()
        elif tag == "vacuum":
            res = P.vacuum(path, keep_versions=3, retention_seconds=0.0)
            # no commit: vacuum reclaims, it does not change the table.
            # Model the exact expiry: below-horizon versions unpinned
            # RIGHT NOW are gone; pinned ones survive this vacuum.
            pins = {v for _k, v in refs_model.values()}
            removed |= {
                v
                for v in range(1, len(history) + 1)
                if v < res["horizon_version"] and v not in pins
            }
        elif tag == "constraint":
            lo, hi = sorted(payload)
            name = f"c{cn}"
            cn += 1
            if any(v is not None and not (lo <= v <= hi) for _k, v in rows.values()):
                with pytest.raises(RuntimeError, match="violates constraint"):
                    P.add_check_constraint(path, name, vcol, lo=lo, hi=hi)
            else:
                P.add_check_constraint(path, name, vcol, lo=lo, hi=hi)
                constraints[name] = (vcol, lo, hi)
                snap()  # alter commits a version; rows unchanged
        elif tag == "drop_constraint":
            if constraints:
                name = sorted(constraints)[0]
                P.drop_check_constraint(path, name)
                del constraints[name]
                snap()  # alter commit
            else:
                with pytest.raises(RuntimeError, match="no such constraint"):
                    P.drop_check_constraint(path, "c999")
        elif tag == "tag":
            v = 1 + (payload % len(history))
            name = f"t{tn}"
            tn += 1
            if v in removed:
                # version already expired by vacuum: tagging refuses
                with pytest.raises(RuntimeError, match="no such committed snapshot"):
                    P.create_tag(path, name, v)
            else:
                P.create_tag(path, name, v)
                refs_model[name] = ("tag", v)
                # no snap: refs are side files, not table commits.
                # Spot-check the ref read path: AS OF 'tag' sees that
                # version's row count exactly.
                df_ref, _ = P.read_manifest_ref(spark, path, name)
                assert df_ref.count() == len(history[v - 1][0])
        elif tag == "branch":
            v = 1 + (payload % len(history))
            name = f"b{bn}"
            bn += 1
            if v in removed:
                with pytest.raises(RuntimeError, match="no such committed snapshot"):
                    P.create_branch(path, name, v)
            else:
                P.create_branch(path, name, v)
                refs_model[name] = ("branch", v)
        elif tag == "advance":
            branches = sorted(n for n, (k, _v) in refs_model.items() if k == "branch")
            v = 1 + (payload % len(history))
            if not branches:
                with pytest.raises(FileNotFoundError):
                    P.advance_branch(path, "b999", v)
            elif v in removed:
                # moving onto an expired snapshot refuses; the branch
                # stays where it was (still pinning its old target)
                with pytest.raises(RuntimeError, match="cannot advance"):
                    P.advance_branch(path, branches[0], v)
            else:
                P.advance_branch(path, branches[0], v)
                refs_model[branches[0]] = ("branch", v)
        elif tag == "stage":
            batch = _batch_rows(seq + 2 * payload)
            seq += 10
            df = spark.createDataFrame(batch, f"id long, k int, {vcol} int")
            writer = (
                df.coalesce(1)
                .write.format("rtbd_manifest_sink")
                .option("path", path)
                .option("staged", "true")
                .mode("append")
            )
            if batch_violates(batch, vcol):
                # stage-time enforcement: a violating candidate never
                # even reaches the audit (parts removed, no pointer)
                with pytest.raises(Exception, match="constraint"):
                    writer.save()
            else:
                writer.save()
                staged = (batch, len(history), vcol)
                # the stage is INVISIBLE to head readers (the loop-end
                # compare asserts that); the AUDIT read must see exactly
                # base-rows ∪ candidate under current logical names
                sdf, _sm = P.read_staged(spark, path)
                audit = {r["id"]: (r["k"], r[vcol]) for r in sdf.collect()}
                expect_audit = dict(rows)
                expect_audit.update({i: (k, v) for i, k, v in batch})
                assert audit == expect_audit, "audit read diverges from stage"
        elif tag == "publish":
            if staged is None:
                with pytest.raises(FileNotFoundError):
                    P.publish_staged(path)
            elif staged[1] != len(history):
                # the head moved since the stage was written: publish
                # refuses (re-stage is the documented recovery) and the
                # stale pointer SURVIVES the refusal
                with pytest.raises(RuntimeError, match="no longer applies"):
                    P.publish_staged(path)
            else:
                P.publish_staged(path)
                batch, _base, svcol = staged
                rows.update({i: (k, v) for i, k, v in batch})
                snap()
                # a published stage is an append commit to the feed
                cdf_log.append((len(history), svcol, batch))
                staged = None
        elif tag == "discard":
            if staged is None:
                with pytest.raises(FileNotFoundError):
                    P.discard_staged(path)
            else:
                P.discard_staged(path)
                staged = None  # table untouched
        elif tag == "zorder":
            v0 = P._latest_snapshot(path)["version"]
            P.optimize_zorder(spark, path, ("id", "k"), bits=4, n_files=4)
            if P._latest_snapshot(path)["version"] > v0:
                # one overwrite commit; logical rows identical (pending
                # MoR deletes were applied by the logical input read and
                # the entry list reset — physical becomes logical)
                snap()
                assert not P._latest_snapshot(path).get("eq_deletes")
            # zero-file table: documented no-op, no version consumed
        elif tag == "stale_head":
            # pick any still-loadable older version and overwrite the
            # pointer cache with ITS manifest — the table must not
            # change (ledger probe discovers the true head), and every
            # later verb must plan against the ledger, not the cache
            import os as _os

            candidates = [
                v
                for v in range(1, len(history) + 1)
                if v not in removed
            ]
            v = candidates[payload % len(candidates)]
            with open(_os.path.join(path, f"_manifest-v{v}.json")) as f:
                stale = f.read()
            with open(_os.path.join(path, "manifest.json"), "w") as f:
                f.write(stale)
            assert P._latest_snapshot(path)["version"] == len(history)
            # no model change, no snap: nothing was committed
        elif tag == "drop_ref":
            if refs_model:
                name = sorted(refs_model)[0]
                P.drop_ref(path, name)
                del refs_model[name]
                # the version it pinned becomes vacuumable at the NEXT
                # vacuum — not retroactively (`removed` is unchanged)
            else:
                with pytest.raises(FileNotFoundError):
                    P.drop_ref(path, "t999")
        assert spark_state() == model_state(), f"divergence after {tag}({payload})"

    # terminal: every live ref resolves to EXACTLY its pinned version's
    # logical state (that version's rename chain and MoR deletes applied
    # under its own column names) — tags after arbitrary later verbs,
    # branches after advances, all guaranteed readable by vacuum pinning
    for name, (_kind, v) in refs_model.items():
        rows_v, vcol_v = history[v - 1]
        df_ref, _m = P.read_manifest_ref(spark, path, name)
        assert {r["id"]: (r["k"], r[vcol_v]) for r in df_ref.collect()} == rows_v, (
            f"ref {name} diverges from version {v}"
        )

    # terminal: a shallow clone of the FINAL state — whatever it is
    # (pending MoR deletes, rename chains, constraints, zero files) —
    # must read cell-identical to the source before any materialize
    import uuid as _uuid

    clone = f"{path}_clone_{_uuid.uuid4().hex[:6]}"
    P.shallow_clone(path, clone)
    cdf_clone, _cm = P.read_manifest(spark, clone)
    assert {r["id"]: (r["k"], r[vcol]) for r in cdf_clone.collect()} == model_state()

    # terminal: materialize everything and compare once more physically
    P.materialize_deletes(spark, path)
    assert spark_state() == model_state()
    head = P._latest_snapshot(path)
    assert not head.get("eq_deletes")
    assert set(head["file_columns"]) == set(head["files"])

    # CHANGE-FEED replay invariant (round-9 continuation; wiring it
    # found the rename-spanning union bug): over every still-loadable
    # version the append feed must emit EXACTLY the rows of append-op
    # commits in range, tagged with their commit version — deletes,
    # merges, overwrites, restores and rewrites contribute nothing.
    # A range whose appends resolve to DIFFERENT naming epochs (a
    # rename log later reset by restore/overwrite) must refuse loudly
    # with the schema-reset error instead of failing inside the union.
    since0 = max(removed) + 1 if removed else 0
    in_range = [(v, p, b) for v, p, b in cdf_log if v > since0]
    renames = head.get("renames", [])

    def resolved(pname: str) -> str:
        # the same hop-by-hop replay _file_logical_metadata applies to
        # a file physically carrying {id, k, pname}
        cur, name = {"id", "k", pname}, pname
        for r in renames:
            if r["from"] in cur:
                cur.discard(r["from"])
                cur.add(r["to"])
                if name == r["from"]:
                    name = r["to"]
        return name

    names = {resolved(p) for _v, p, _b in in_range}
    if len(names) > 1:
        with pytest.raises(RuntimeError, match="incompatible schema change"):
            P.read_change_feed(spark, path, since0)
    else:
        feed, _commits = P.read_change_feed(spark, path, since0)
        name = names.pop() if names else vcol
        got = {
            (r["id"], r["k"], r[name], r["_commit_version"]) for r in feed.collect()
        }
        expect = {(i, k, v, ver) for ver, _p, batch in in_range for i, k, v in batch}
        assert got == expect, f"change-feed divergence since v{since0}"
