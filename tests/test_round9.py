"""Round-9 pins: write-path constraint proofs resolve rename chains,
verb guards admit zero-file snapshots, and verb part-file prefixes can
never collide with appended `part-{uuid4hex}` names.

Targets (round-8 ADVICE + verdict):
  * ADVICE medium — `_enforce_constraints`' all-NULL vacuous pass for
    range CHECKs inferred "absent => all-NULL" from the file's PHYSICAL
    footer, so a stale-schema append (physical pre-rename name) after
    rename_column(old->new) silently admitted real out-of-range values
    that every logical read surfaces via the rename chain.
  * ADVICE low — `_logical_columns` guards in delete_where /
    delete_where_mor / merge_upsert rejected every column on a
    zero-file snapshot (empty column union), breaking merge-as-insert
    bootstrap into an emptied table.
  * verdict "What's wrong #1" — the `part-d{v}-` rewrite prefix was a
    hex continuation of appended uuid names (~1/16 of appends), making
    the round-7 scope test genuinely flaky; prefixes are now full
    non-hex-continuable words.
"""

from __future__ import annotations

import os
import re
import uuid

import pytest

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P


def _write(spark, path, df, mode="append"):
    df.write.format("rtbd_manifest_sink").option("path", path).mode(mode).save()


@pytest.fixture()
def renamed_constrained(spark, tmp_path):
    """Table: id,v in [100,109]; renamed v->w; range CHECK on w."""
    path = str(tmp_path / "t9")
    P.register_sink(spark)
    _write(
        spark,
        path,
        spark.range(10).selectExpr("id", "CAST(id + 100 AS INT) AS v").coalesce(1),
    )
    P.rename_column(path, "v", "w")
    P.add_check_constraint(path, "w_range", "w", lo=0, hi=200)
    return path


# --- 1. write-path constraint proofs are rename-aware ------------------------


def test_stale_schema_append_out_of_range_rejected(spark, renamed_constrained):
    """A writer holding the pre-rename schema appends physical column
    'v' with values outside the CHECK on 'w'.  The content-based chain
    rule surfaces those values as 'w' on every logical read, so the
    write-time proof must resolve w -> v and REJECT — pre-fix the
    absent-'w' footer passed vacuously as all-NULL."""
    path = renamed_constrained
    bad = spark.range(3).selectExpr("id + 50 AS id", "CAST(500 AS INT) AS v").coalesce(1)
    with pytest.raises(Exception, match="w_range"):
        _write(spark, path, bad)
    # the table is untouched: 10 rows, constraint still provable
    df, head = P.read_manifest(spark, path)
    assert df.count() == 10
    assert head["n_rows"] == 10


def test_stale_schema_append_in_range_accepted_and_read_as_renamed(
    spark, renamed_constrained
):
    """The same stale-schema append with IN-range values must commit,
    and logical reads surface them under the current name 'w'."""
    path = renamed_constrained
    ok = spark.range(3).selectExpr("id + 50 AS id", "CAST(150 AS INT) AS v").coalesce(1)
    _write(spark, path, ok)
    df, _ = P.read_manifest(spark, path)
    assert df.count() == 13
    assert df.filter("w = 150").count() == 3
    assert "v" not in df.columns


def test_stale_schema_append_not_null_resolves_chain(spark, tmp_path):
    """NOT NULL on a renamed column: a stale-schema append with zero
    nulls in the physical pre-rename column is PROVABLE and must commit
    (pre-fix: spurious all-NULL violation); one with real nulls must
    still reject."""
    path = str(tmp_path / "t9nn")
    P.register_sink(spark)
    _write(spark, path, spark.range(5).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1))
    P.rename_column(path, "v", "w")
    P.add_check_constraint(path, "w_nn", "w", not_null=True)
    _write(spark, path, spark.range(5, 8).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1))
    df, _ = P.read_manifest(spark, path)
    assert df.count() == 8 and df.filter("w IS NULL").count() == 0
    bad = spark.range(8, 11).selectExpr(
        "id", "CAST(CASE WHEN id = 9 THEN NULL ELSE id END AS INT) AS v"
    ).coalesce(1)
    with pytest.raises(Exception, match="w_nn"):
        _write(spark, path, bad)


# --- 2. zero-file snapshots don't trip the column guards ---------------------


@pytest.fixture()
def emptied_table(spark, tmp_path):
    """Table whose only file was removed by a full-range CoW delete —
    head snapshot lists zero files."""
    path = str(tmp_path / "t9e")
    P.register_sink(spark)
    _write(
        spark,
        path,
        spark.range(6).selectExpr("id", "CAST(id % 3 AS INT) AS k", "CAST(id * 2 AS INT) AS v").coalesce(1),
    )
    P.delete_where(spark, path, "v", 0, 1000)
    head = P._latest_snapshot(path)
    assert head["files"] == [] and head["n_rows"] == 0
    return path


def test_merge_upsert_into_emptied_table_bootstraps(spark, emptied_table):
    upd = spark.range(4).selectExpr(
        "id", "CAST(id % 3 AS INT) AS k", "CAST(99 AS INT) AS v"
    )
    out = P.merge_upsert(spark, emptied_table, upd, "id")
    df, head = P.read_manifest(spark, emptied_table)
    assert df.count() == 4
    assert head["n_rows"] == 4
    assert out["version"] == head["version"]


def test_delete_verbs_noop_on_emptied_table(spark, emptied_table):
    v0 = P._latest_snapshot(emptied_table)["version"]
    out = P.delete_where(spark, emptied_table, "v", 0, 10)
    assert out.get("n_deleted", 0) == 0
    mor = P.delete_where_mor(emptied_table, "v", 0, 10)
    # no empty-scope eq-delete entry is recorded
    assert mor["eq_deletes"] == []
    head = P._latest_snapshot(emptied_table)
    assert head["files"] == [] and head["n_rows"] == 0
    assert head["version"] > v0


def test_guards_still_reject_unknown_columns_on_nonempty_tables(spark, tmp_path):
    path = str(tmp_path / "t9g")
    P.register_sink(spark)
    _write(spark, path, spark.range(3).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1))
    with pytest.raises(RuntimeError, match="no such column"):
        P.delete_where(spark, path, "nope", 0, 1)
    with pytest.raises(RuntimeError, match="no such column"):
        P.delete_where_mor(path, "nope", 0, 1)
    with pytest.raises(RuntimeError, match="no such column"):
        P.merge_upsert(spark, path, spark.range(1).selectExpr("id", "CAST(1 AS INT) AS v"), "nope")


# --- 2b. replayed epoch after a lost claim leaves no orphans ------------------


def test_replayed_epoch_after_lost_claim_drops_renamed_parts(spark, tmp_path, monkeypatch):
    """Round-9 concurrency-machine find (its first run): an epoch commit
    that loses its claim to a CONCURRENT committer of the SAME batchId
    has already renamed its parts visible; the retry's replay guard
    deleted by the stale `_uncommitted_` names only, leaking the
    renamed files forever (invisible to readers, but permanent disk
    orphans no manifest references)."""
    import glob as _glob
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "t9r")
    os.makedirs(path)

    def epoch_parts(tag: str):
        fn = f"_uncommitted_{tag}.parquet"
        pq.write_table(
            pa.table({"id": pa.array([1, 2], pa.int64()), "v": pa.array([5, 6], pa.int32())}),
            os.path.join(path, fn),
        )
        return [P.PartFileCommit(fn, 2)]

    P.ManifestStreamWriter({"path": path}).commit(epoch_parts("seed"), 0)

    real_claim = P._claim_and_publish
    fired = {}

    def racing(p, manifest):
        if not fired:
            fired["x"] = 1
            # a concurrent committer lands the SAME epoch first
            P.ManifestStreamWriter({"path": path}).commit(epoch_parts("winner"), 7)
        return real_claim(p, manifest)

    monkeypatch.setattr(P, "_claim_and_publish", racing)
    P.ManifestStreamWriter({"path": path}).commit(epoch_parts("loser"), 7)
    monkeypatch.setattr(P, "_claim_and_publish", real_claim)

    head = P._latest_snapshot(path)
    assert head["batches"] == [0, 7]
    df, _ = P.read_manifest(spark, path)
    assert df.count() == 4  # seed + winner, loser replay dropped
    referenced = set()
    for mf in _glob.glob(os.path.join(path, "_manifest-v*.json")):
        referenced |= set(_json.load(open(mf)).get("files", []))
    on_disk = {os.path.basename(f) for f in _glob.glob(os.path.join(path, "part-*"))}
    assert on_disk == referenced  # pre-fix: the loser's renamed part leaked
    assert not _glob.glob(os.path.join(path, "_uncommitted_*"))


# --- 2c. chunked manifests (Iceberg manifest-list shape) ----------------------


def _raw_manifest(path, version):
    import json as _json

    with open(os.path.join(path, f"_manifest-v{version}.json")) as f:
        return _json.load(f)


def test_chunked_manifest_externalizes_and_reuses_chunks(spark, tmp_path, monkeypatch):
    """Past `_MANIFEST_INLINE_MAX` files a commit writes `_filelist-*`
    chunks instead of inlining O(F) metadata, REUSING every chunk whose
    files all survive — an append's manifest write is O(new + F/chunk).
    Readers resolve behind the same snapshot API; vacuum GCs orphaned
    chunks.  Threshold forced to 4 so a tiny table exercises it all."""
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 4)
    path = str(tmp_path / "t9c")
    P.register_sink(spark)
    os.makedirs(path, exist_ok=True)
    batch_counter = {"n": 0}

    def append(lo, hi, nparts):
        # in-process epoch commits (the sink's commit runs in a Python
        # DataSource worker where the monkeypatched threshold is
        # invisible; the epoch path is the same commit discipline)
        import pyarrow as pa
        import pyarrow.parquet as pq

        ids = list(range(lo, hi))
        msgs = []
        for p in range(nparts):
            chunk_ids = ids[p::nparts]
            fn = f"_uncommitted_{uuid.uuid4().hex}.parquet"
            pq.write_table(
                pa.table(
                    {
                        "id": pa.array(chunk_ids, pa.int64()),
                        "k": pa.array([i % 3 for i in chunk_ids], pa.int32()),
                        "v": pa.array(chunk_ids, pa.int32()),
                    }
                ),
                os.path.join(path, fn),
            )
            msgs.append(P.PartFileCommit(fn, len(chunk_ids)))
        batch_counter["n"] += 1
        P.ManifestStreamWriter({"path": path}).commit(msgs, batch_counter["n"])

    append(0, 9, 3)  # 3 files: inline
    raw1 = _raw_manifest(path, 1)
    assert "files" in raw1 and not raw1.get("files_external")

    append(9, 18, 3)  # 6 files: externalizes
    raw2 = _raw_manifest(path, 2)
    assert raw2.get("files_external") and "files" not in raw2
    assert "stats" not in raw2 and "file_columns" not in raw2
    head = P._latest_snapshot(path)
    assert len(head["files"]) == 6 and head["n_rows"] == 18
    assert set(head["file_columns"]) == set(head["files"])

    append(18, 27, 3)  # 9 files: v2's chunks all survive -> all reused
    raw3 = _raw_manifest(path, 3)
    assert set(raw2["file_chunks"]) <= set(raw3["file_chunks"])
    head = P._latest_snapshot(path)
    assert len(head["files"]) == 9 and head["n_rows"] == 27

    # the whole verb surface works unchanged on a chunked table
    P.rename_column(path, "v", "w")
    P.delete_where_mor(path, "w", 0, 2)  # ids 0..2 logically gone
    df, _ = P.read_manifest(spark, path)
    assert df.count() == 24 and "w" in df.columns
    P.delete_where(spark, path, "w", 20, 23)  # CoW: ids 20..23
    df, _ = P.read_manifest(spark, path)
    assert df.count() == 20
    P.materialize_deletes(spark, path)
    upd = spark.range(3, 6).selectExpr("id", "CAST(9 AS INT) AS k", "CAST(99 AS INT) AS w")
    P.merge_upsert(spark, path, upd, "id")
    df, head = P.read_manifest(spark, path)
    assert df.count() == 20 and df.filter("w = 99").count() == 3
    # time travel to v3 still resolves its chunks
    df3, _ = P.read_manifest(spark, path, version=3)
    assert df3.count() == 27
    # stats flow into chunks and back out (zone-map pruning intact)
    assert any(head.get("stats", {}).values())

    # vacuum: expired manifests' chunks are GC'd, live ones survive
    res = P.vacuum(path, keep_versions=2, retention_seconds=0.0)
    assert res["n_chunks_removed"] >= 0
    import glob as _glob
    import json as _json

    live_chunks = set()
    for mf in _glob.glob(os.path.join(path, "_manifest-v*.json")):
        live_chunks |= set(_json.load(open(mf)).get("file_chunks", []))
    on_disk = {os.path.basename(c) for c in _glob.glob(os.path.join(path, "_filelist-*.json"))}
    assert on_disk == live_chunks
    df, _ = P.read_manifest(spark, path)
    assert df.count() == 20


def test_chunked_manifest_cow_delete_rewrites_only_touched_chunks(
    spark, tmp_path, monkeypatch
):
    """A delete touching one file must not rewrite chunks whose files
    all survive — chunk reuse is what bounds commit metadata I/O."""
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 2)
    path = str(tmp_path / "t9d")
    P.register_sink(spark)
    os.makedirs(path, exist_ok=True)
    # 6 single-id files, ids 0..5 (v == id), via in-process epoch commits
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(6):
        fn = f"_uncommitted_{uuid.uuid4().hex}.parquet"
        pq.write_table(
            pa.table({"id": pa.array([i], pa.int64()), "v": pa.array([i], pa.int32())}),
            os.path.join(path, fn),
        )
        P.ManifestStreamWriter({"path": path}).commit([P.PartFileCommit(fn, 1)], i)
    rawN = _raw_manifest(path, 6)
    assert rawN.get("files_external")
    P.delete_where(spark, path, "v", 5, 5)  # touches exactly one file
    rawD = _raw_manifest(path, 7)
    surviving = [
        c
        for c in rawN["file_chunks"]
        if set(P._load_chunk(path, c)["files"]) <= set(P._latest_snapshot(path)["files"])
    ]
    # every fully-surviving chunk was reused verbatim
    assert set(surviving) <= set(rawD["file_chunks"])
    df, _ = P.read_manifest(spark, path)
    assert df.count() == 5


def test_chunked_manifest_pinned_ref_protects_chunks_from_vacuum(
    spark, tmp_path, monkeypatch
):
    """A tag pins its snapshot through vacuum (Iceberg retain-ref rule);
    on a chunked table that must extend to the snapshot's `_filelist-*`
    chunks, or the pinned version's file list evaporates."""
    monkeypatch.setattr(P, "_MANIFEST_INLINE_MAX", 2)
    path = str(tmp_path / "t9v")
    P.register_sink(spark)
    os.makedirs(path, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(8):
        fn = f"_uncommitted_{uuid.uuid4().hex}.parquet"
        pq.write_table(
            pa.table({"id": pa.array([i], pa.int64()), "v": pa.array([i], pa.int32())}),
            os.path.join(path, fn),
        )
        P.ManifestStreamWriter({"path": path}).commit([P.PartFileCommit(fn, 1)], i)
    P.create_tag(path, "keep4", version=4)
    # churn far past the retention horizon
    P.delete_where(spark, path, "v", 6, 7)
    P.merge_upsert(
        spark, path, spark.range(100, 103).selectExpr("id", "CAST(0 AS INT) AS v"), "id"
    )
    res = P.vacuum(path, keep_versions=1, retention_seconds=0.0)
    assert res["horizon_version"] > 4
    # the pinned snapshot still time-travels with its full file list
    df4, _ = P.read_manifest(spark, path, version=4)
    assert df4.count() == 4 and sorted(r.id for r in df4.collect()) == [0, 1, 2, 3]


# --- 2d. constraint proofs see LOGICAL data under pending MoR deletes ---------


def test_constraint_add_sees_logical_rows_under_pending_mor(spark, tmp_path):
    """Round-9 model-machine find (latent since round 8): the
    footer-stat proof behind add_check_constraint still saw
    MoR-DELETED rows, so a logically-clean table was falsely refused
    whenever the deleted rows fell outside the range.  Delete-scoped
    files now get an exact column-pruned logical micro-scan."""
    path = str(tmp_path / "t9m")
    P.register_sink(spark)
    # v in 0..8 plus NULLs; physically one file.  Logical survivors of
    # the MoR delete below: 5 NULLs (ids 0,4,8,12,16) and v=8 (id 17).
    _write(
        spark,
        path,
        spark.range(18).selectExpr(
            "id", "CAST(CASE WHEN id % 4 = 0 THEN NULL ELSE id % 9 END AS INT) AS v"
        ).coalesce(1),
    )
    P.delete_where_mor(path, "v", 0, 7)
    # pre-fix: "violates constraint" from the physical [0,8] footer range
    P.add_check_constraint(path, "v_hi", "v", lo=8, hi=8)
    # and a constraint the LOGICAL data does violate still refuses
    with pytest.raises(RuntimeError, match="violates constraint"):
        P.add_check_constraint(path, "v_zero", "v", lo=0, hi=0)
    # NOT NULL keeps refusing (NULL rows survive the range delete)
    with pytest.raises(RuntimeError, match="violates constraint"):
        P.add_check_constraint(path, "v_nn", "v", not_null=True)


def test_restore_validates_target_logically_under_pending_mor(spark, tmp_path):
    """Restore to a version that carried pending MoR deletes: the
    CURRENT constraints must be proven against that version's LOGICAL
    rows, not its physical footers (which still contain rows the
    pending deletes remove)."""
    path = str(tmp_path / "t9n")
    P.register_sink(spark)
    _write(
        spark,
        path,
        spark.range(18).selectExpr(
            "id", "CAST(CASE WHEN id % 4 = 0 THEN NULL ELSE id % 9 END AS INT) AS v"
        ).coalesce(1),
    )
    P.delete_where_mor(path, "v", 0, 7)  # v2: logical = 5 NULLs + v=8, pending
    v2 = P._latest_snapshot(path)["version"]
    P.materialize_deletes(spark, path)  # v3: physically clean
    P.add_check_constraint(path, "v_hi", "v", lo=8, hi=8)  # passes on v3
    # pre-fix: refused — v2's physical files still hold v in 0..7
    out = P.restore_table(path, v2)
    df, head = P.read_manifest(spark, path)
    assert out["version"] == head["version"]
    assert df.filter("v IS NOT NULL").select("v").distinct().count() == 1
    assert df.count() == 6  # 5 NULLs + the one v=8 row (id 17)


# --- 3. verb part prefixes are not hex-continuable ----------------------------

UUID_HEX = set("0123456789abcdef")
VERB_PREFIXES = ("del", "mat", "mrg", "batch")


def test_verb_prefixes_cannot_collide_with_append_uuid_names():
    """Appended files are `part-{uuid4hex}...`: a verb prefix is
    ambiguous iff it is a string of hex digits (the round-8 'part-d'
    flake).  Every verb prefix must contain a non-hex character."""
    for p in VERB_PREFIXES:
        assert any(ch not in UUID_HEX for ch in p), p


def test_rewrite_names_use_word_prefixes(spark, tmp_path):
    path = str(tmp_path / "t9p")
    P.register_sink(spark)
    _write(
        spark,
        path,
        spark.range(20).selectExpr("id", "CAST(id AS INT) AS v").repartition(2),
    )
    P.delete_where(spark, path, "v", 0, 4)
    P.merge_upsert(
        spark,
        path,
        spark.range(2).selectExpr("id", "CAST(77 AS INT) AS v"),
        "id",
    )
    P.delete_where_mor(path, "v", 77, 77)
    P.materialize_deletes(spark, path)
    files = P._latest_snapshot(path)["files"]
    pats = [
        re.compile(r"^part-del\d+-[0-9a-f]{8}-\d{5}\.parquet$"),
        re.compile(r"^part-mrg\d+-[0-9a-f]{8}-\d{5}\.parquet$"),
        re.compile(r"^part-mat\d+-[0-9a-f]{8}-\d{3}-\d{5}\.parquet$"),
        re.compile(r"^part-[0-9a-f]{8,}"),  # plain appends
    ]
    for fn in files:
        assert any(p.match(fn) for p in pats), fn
