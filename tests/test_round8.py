"""Round-8 ADVICE + verdict regression pins on the manifest table format
(sources/pydatasource.py):

  1. (medium) `_spark_to_arrow_schema` maps EVERY field nullable=True:
     Spark's nullable=False is advisory and occasionally wrong (joins,
     UDF outputs), and Arrow's from_pylist does not validate
     nullability — a None in a required int64 column silently
     round-tripped as 0 through the schema'd write path.
  2. (low) range deletes are NULL-safe in every path that applies an
     eq-delete predicate: a row whose delete-column is NULL does not
     match `col BETWEEN lo AND hi` and must SURVIVE — the bare
     `~between()` evaluated to NULL and silently dropped it in
     (a) the logical reader, (b) delete_where's CoW rewrite,
     (c) materialize_deletes, (d) the Arrow format reader.
  3. (low) materialize_deletes plans in O(D*F), not O(D*F^2): the
     live-file set is hoisted out of the per-delete per-file loop.
"""

from __future__ import annotations

import pytest

from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource as P


@pytest.fixture()
def null_table(spark, tmp_path):
    """20 rows; v is NULL on every 5th row (ids 0,5,10,15), else id*3."""
    path = str(tmp_path / "t8")
    P.register_sink(spark)
    df = spark.range(20).selectExpr(
        "id",
        "CAST(id % 7 AS INT) AS k",
        "CAST(CASE WHEN id % 5 = 0 THEN NULL ELSE id * 3 END AS INT) AS v",
    )
    df.coalesce(2).write.format("rtbd_manifest_sink").option("path", path).mode(
        "append"
    ).save()
    return path


NULL_IDS = {0, 5, 10, 15}


# --- 1. Arrow schema nullability ---------------------------------------------


def test_spark_to_arrow_schema_always_nullable():
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), nullable=False),
            T.StructField("b", T.StringType(), nullable=True),
        ]
    )
    arrow = P._spark_to_arrow_schema(schema)
    assert arrow is not None
    assert all(f.nullable for f in arrow), arrow


def test_nonnullable_claimed_none_roundtrips_as_null(spark, tmp_path):
    """A None landing in a column Spark CLAIMS non-nullable must come
    back NULL, not 0 — the pre-fix required-int64 schema let pyarrow
    write it as 0 silently."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType(), nullable=False)])
    arrow = P._spark_to_arrow_schema(schema)
    rows = [Row(a=7), Row(a=None), Row(a=9)]
    part = P._write_part(str(tmp_path), iter(rows), schema=arrow)
    import pyarrow.parquet as pq

    # the part file is underscore-hidden (uncommitted) — read it directly
    got = pq.read_table(str(tmp_path / part.filename)).column("a").to_pylist()
    assert got == [7, None, 9], f"None must round-trip as NULL, got {got}"


# --- 2. NULL-safe range deletes in all four paths -----------------------------


def test_delete_where_cow_keeps_null_rows(spark, null_table):
    # delete v in [0, 27] -> ids 1..9 with non-null v (1,2,3,4,6,7,8,9);
    # ids 0,5 have NULL v and MUST survive the CoW rewrite
    res = P.delete_where(spark, null_table, "v", 0, 27)
    df, _m = P.read_manifest(spark, null_table)
    surv = {r.id for r in df.collect()}
    assert NULL_IDS <= surv, f"NULL-v rows deleted by a range predicate: {surv}"
    assert surv == {0, 5, 10, 15} | set(range(10, 20)), surv
    assert res["n_deleted"] == 8


def test_delete_where_mor_logical_read_keeps_null_rows(spark, null_table):
    P.delete_where_mor(null_table, "v", 0, 27)
    df, _m = P.read_manifest(spark, null_table)
    surv = {r.id for r in df.collect()}
    assert NULL_IDS <= surv, f"NULL-v rows dropped by the MoR logical read: {surv}"
    assert surv == {0, 5, 10, 15} | set(range(10, 20)), surv


def test_materialize_deletes_keeps_null_rows(spark, null_table):
    P.delete_where_mor(null_table, "v", 0, 27)
    P.materialize_deletes(spark, null_table)
    head = P._latest_snapshot(null_table)
    assert not head.get("eq_deletes"), "materialize must clear the delete log"
    df, _m = P.read_manifest(spark, null_table)
    surv = {r.id for r in df.collect()}
    assert NULL_IDS <= surv, f"NULL-v rows dropped by the physical rewrite: {surv}"
    assert surv == {0, 5, 10, 15} | set(range(10, 20)), surv


def test_format_reader_arrow_path_keeps_null_rows(spark, null_table):
    P.delete_where_mor(null_table, "v", 0, 27)
    P.register(spark)
    fmt = spark.read.format("rtbd_manifest_table").option("path", null_table).load()
    surv = {r.id for r in fmt.collect()}
    assert NULL_IDS <= surv, f"NULL-v rows dropped by the Arrow format reader: {surv}"
    assert surv == {0, 5, 10, 15} | set(range(10, 20)), surv


def test_all_read_paths_agree_on_null_survivors(spark, null_table):
    """CoW on one copy must equal MoR-then-materialize on the same data:
    the delete semantics are a TABLE contract, not a per-path accident."""
    import os

    cow_dir = os.path.join(os.path.dirname(null_table), "t8_cow")
    src, _m = P.read_manifest(spark, null_table)
    src.coalesce(2).write.format("rtbd_manifest_sink").option("path", cow_dir).mode(
        "append"
    ).save()
    P.delete_where(spark, cow_dir, "v", 0, 27)
    P.delete_where_mor(null_table, "v", 0, 27)
    P.materialize_deletes(spark, null_table)
    a, _ = P.read_manifest(spark, cow_dir)
    b, _ = P.read_manifest(spark, null_table)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


# --- 3. materialize_deletes planning is O(D*F) --------------------------------


def test_materialize_deletes_hoists_live_set():
    """Structural pin: the set(head['files']) build sits ABOVE the
    delete loop (O(D*F^2) regression guard — same class as the round-7
    _file_logical_metadata fix)."""
    import inspect
    import textwrap

    src = textwrap.dedent(inspect.getsource(P.materialize_deletes))
    loop = src.index("for d in deletes:")
    assert "live = set(head[\"files\"])" in src[:loop], (
        "live-file set must be hoisted above the per-delete loop"
    )
    assert "set(head[\"files\"])" not in src[loop:], (
        "per-iteration set() rebuild reintroduced"
    )


# --- range CHECK constraints under SQL three-valued logic ---------------------


def test_range_check_constraint_null_semantics(spark, tmp_path):
    """CHECK (v BETWEEN lo AND hi) under three-valued logic: NULL rows
    SATISFY the check (predicate not FALSE), so (a) a mixed null/valid
    file commits, (b) an ALL-NULL file commits — proven vacuously valid
    from footer null counts, where the pre-fix 'no min/max stats ->
    unprovable' rule wrongly rejected it, (c) an out-of-range value
    still rejects, and (d) add_check_constraint accepts EXISTING
    all-null files the same way."""
    path = str(tmp_path / "t8c")
    P.register_sink(spark)
    spark.range(10).selectExpr(
        "id", "CAST(CASE WHEN id % 2 = 0 THEN NULL ELSE id + 100 END AS INT) AS v"
    ).coalesce(1).write.format("rtbd_manifest_sink").option("path", path).mode(
        "append"
    ).save()
    P.add_check_constraint(path, "v_range", "v", lo=100, hi=200)
    # (a) mixed nulls + in-range values
    spark.sql(
        "SELECT CAST(20 AS BIGINT) AS id, CAST(NULL AS INT) AS v "
        "UNION ALL SELECT 21, 150"
    ).coalesce(1).write.format("rtbd_manifest_sink").option("path", path).mode(
        "append"
    ).save()
    # (b) all-NULL file: vacuously valid
    spark.sql(
        "SELECT CAST(30 AS BIGINT) AS id, CAST(NULL AS INT) AS v"
    ).coalesce(1).write.format("rtbd_manifest_sink").option("path", path).mode(
        "append"
    ).save()
    df, _h = P.read_manifest(spark, path)
    assert df.count() == 13
    # (c) out-of-range value still rejected, table untouched
    with pytest.raises(Exception, match="constraint"):
        spark.sql(
            "SELECT CAST(40 AS BIGINT) AS id, CAST(999 AS INT) AS v"
        ).coalesce(1).write.format("rtbd_manifest_sink").option("path", path).mode(
            "append"
        ).save()
    assert P.read_manifest(spark, path)[0].count() == 13
    # (d) existing all-null data accepts a new range constraint
    path2 = str(tmp_path / "t8c2")
    spark.sql(
        "SELECT CAST(1 AS BIGINT) AS id, CAST(NULL AS INT) AS v"
    ).coalesce(1).write.format("rtbd_manifest_sink").option("path", path2).mode(
        "append"
    ).save()
    P.add_check_constraint(path2, "v_range", "v", lo=0, hi=1)


# --- schema guards on the lakehouse verbs (round-8 self-review) ---------------


def test_rename_guards_existence_and_collision(spark, tmp_path):
    """rename_column must refuse (a) renaming a column that does not
    exist (the reader's withColumnRenamed would silently no-op, leaving
    a useless committed rename) and (b) renaming ONTO an existing name
    (duplicate logical columns break every later select by name)."""
    path = str(tmp_path / "tg1")
    P.register_sink(spark)
    spark.range(10).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    with pytest.raises(RuntimeError, match="no such column"):
        P.rename_column(path, "nope", "x")
    with pytest.raises(RuntimeError, match="already exists"):
        P.rename_column(path, "id", "v")
    P.rename_column(path, "v", "w")  # legitimate rename still works
    assert "w" in P.read_manifest(spark, path)[0].columns


def test_delete_verbs_guard_nonexistent_column(spark, tmp_path):
    """Both delete verbs fail at COMMIT time on a typo'd column — a
    committed MoR delete on a missing column would break every later
    logical read; the CoW verb would die mid-rewrite instead."""
    path = str(tmp_path / "tg2")
    P.register_sink(spark)
    spark.range(10).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    v_before = P._latest_snapshot(path)["version"]
    with pytest.raises(RuntimeError, match="no such column"):
        P.delete_where_mor(path, "nope", 0, 5)
    with pytest.raises(RuntimeError, match="no such column"):
        P.delete_where(spark, path, "nope", 0, 5)
    with pytest.raises(RuntimeError, match="no such column"):
        P.add_check_constraint(path, "c1", "nope", lo=0)
    head = P._latest_snapshot(path)
    assert head["version"] == v_before  # nothing committed
    assert P.read_manifest(spark, path)[0].count() == 10


def test_not_null_constraint_sees_schema_evolved_files(spark, tmp_path):
    """Files written BEFORE a column existed are all-NULL for it on the
    merged read, so a NOT NULL constraint on the evolved column must be
    REFUSED — the pre-fix footer walk returned null_count 0 for a
    column absent from the file and unsoundly accepted it."""
    path = str(tmp_path / "tg3")
    P.register_sink(spark)
    spark.range(5).selectExpr("id").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    spark.range(5, 10).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    with pytest.raises(RuntimeError, match="null"):
        P.add_check_constraint(path, "v_nn", "v", not_null=True)
    # a RANGE constraint on the same column is vacuously fine for the
    # old files (NULL satisfies a range CHECK) and proven for the new
    P.add_check_constraint(path, "v_range", "v", lo=0, hi=100)


def test_constraint_on_renamed_column_resolves_physical_stats(spark, tmp_path):
    """add_check_constraint AFTER a rename: the proof must resolve each
    file's PHYSICAL footer name through the rename chain — pre-fix the
    range proof found no stats (spurious unprovable) and the NOT NULL
    proof found a zero null count it never measured (unsound accept)."""
    path = str(tmp_path / "tg4")
    P.register_sink(spark)
    spark.range(10).selectExpr("id", "CAST(id + 100 AS INT) AS v").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    P.rename_column(path, "v", "w")
    P.add_check_constraint(path, "w_nn", "w", not_null=True)  # provable via 'v' footers
    P.add_check_constraint(path, "w_range", "w", lo=100, hi=109)
    with pytest.raises(RuntimeError, match="violates"):
        P.add_check_constraint(path, "w_tight", "w", lo=100, hi=105)
    # NOT NULL on a renamed column with real nulls still rejects
    path2 = str(tmp_path / "tg4b")
    spark.range(4).selectExpr(
        "id", "CAST(CASE WHEN id = 2 THEN NULL ELSE id END AS INT) AS v"
    ).coalesce(1).write.format("rtbd_manifest_sink").option("path", path2).mode(
        "append"
    ).save()
    P.rename_column(path2, "v", "w")
    with pytest.raises(RuntimeError, match="null"):
        P.add_check_constraint(path2, "w_nn", "w", not_null=True)


def test_delete_where_plans_against_ledger_not_head_cache(spark, tmp_path):
    """delete_where must plan against the versioned ledger: with the
    manifest.json convenience cache missing (crash between claim and
    head-pointer update), the verb still sees the latest snapshot."""
    import os

    path = str(tmp_path / "tg5")
    P.register_sink(spark)
    spark.range(100).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    os.remove(os.path.join(path, "manifest.json"))  # simulate lagging cache
    res = P.delete_where(spark, path, "v", 0, 49)
    assert res["n_deleted"] == 50
    assert P.read_manifest(spark, path)[0].count() == 50


def test_merge_upsert_null_keys_and_column_guard(spark, tmp_path):
    """MERGE semantics under NULLs (standard SQL): a NULL-keyed update
    row never matches (inserted), a NULL-keyed target row never matches
    (kept, not updated); and a typo'd merge key fails at commit time."""
    path = str(tmp_path / "tg6")
    P.register_sink(spark)
    spark.sql(
        "SELECT * FROM VALUES (CAST(1 AS BIGINT), 10), (2, 20), (CAST(NULL AS BIGINT), 30) AS t(k, v)"
    ).coalesce(1).write.format("rtbd_manifest_sink").option("path", path).mode(
        "append"
    ).save()
    updates = spark.sql(
        "SELECT * FROM VALUES (CAST(2 AS BIGINT), 99), (CAST(NULL AS BIGINT), 77) AS t(k, v)"
    )
    res = P.merge_upsert(spark, path, updates, "k")
    assert res["n_updated"] == 1 and res["n_inserted"] == 1, res
    rows = {(r.k, r.v) for r in P.read_manifest(spark, path)[0].collect()}
    assert rows == {(1, 10), (2, 99), (None, 30), (None, 77)}, rows
    with pytest.raises(RuntimeError, match="no such column"):
        P.merge_upsert(spark, path, updates.withColumnRenamed("k", "kk"), "kk")


def test_file_columns_cache_maintained_and_consulted(spark, tmp_path):
    """Every commit records its files' column names in the manifest
    (`file_columns`) so verb planning never re-reads O(F) footers; the
    cache survives append/delete/merge/materialize/restore/clone, and a
    legacy manifest without it still plans correctly via the footer
    fallback."""
    import json
    import os

    path = str(tmp_path / "tfc")
    P.register_sink(spark)
    spark.range(100).selectExpr("id", "CAST(id AS INT) AS v").coalesce(2).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    head = P._latest_snapshot(path)
    assert set(head["file_columns"]) == set(head["files"])
    assert all(sorted(c) == ["id", "v"] for c in head["file_columns"].values())

    P.delete_where(spark, path, "v", 0, 9)
    P.delete_where_mor(path, "v", 90, 99)
    P.materialize_deletes(spark, path)
    P.merge_upsert(
        spark, path, spark.range(5).selectExpr("id", "CAST(99 AS INT) AS v"), "id"
    )
    head = P._latest_snapshot(path)
    assert set(head["file_columns"]) == set(head["files"]), "cache drifted from file list"
    P.restore_table(path, 1)
    head = P._latest_snapshot(path)
    assert set(head["file_columns"]) == set(head["files"])

    # legacy manifest (cache stripped) still resolves logical columns
    mf = os.path.join(path, f"_manifest-v{head['version']}.json")
    m = json.load(open(mf))
    m.pop("file_columns")
    json.dump(m, open(mf, "w"))
    if os.path.exists(os.path.join(path, "manifest.json")):
        json.dump(m, open(os.path.join(path, "manifest.json"), "w"))
    assert P._logical_columns(path, P._latest_snapshot(path)) == {"id", "v"}


def test_file_columns_cache_rides_clone_and_stream(spark, tmp_path):
    from pyspark.sql import Row

    path = str(tmp_path / "tfc2")
    w = P.ManifestStreamWriter({"path": path})
    msg = w.write(iter(Row(id=j, v=j) for j in range(50)))
    w.commit([msg], 0)
    head = P._latest_snapshot(path)
    assert set(head["file_columns"]) == set(head["files"])
    dst = str(tmp_path / "tfc2_clone")
    P.shallow_clone(path, dst)
    chead = P._latest_snapshot(dst)
    assert set(chead["file_columns"]) == set(chead["files"])
    assert P._logical_columns(dst, chead) == {"id", "v"}


def test_readers_see_ledger_head_not_stale_cache(spark, tmp_path):
    """Every read path resolves the LEDGER head even when the
    manifest.json convenience cache lags (crash between claim and
    head-pointer update): batch read, pruned read, format read, CDF
    default bound, and the stream reader's head version."""
    import json
    import os

    path = str(tmp_path / "tstale")
    P.register_sink(spark)
    spark.range(50).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    spark.range(50, 100).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    # simulate the lagging cache: head pointer rolled back to v1
    v1 = json.load(open(os.path.join(path, "_manifest-v1.json")))
    json.dump(v1, open(os.path.join(path, "manifest.json"), "w"))

    assert P.read_manifest(spark, path)[0].count() == 100
    df, n_scanned, n_total = P.read_manifest_pruned(spark, path, "v", 0, 99)
    assert n_total == 2 and df.count() == 100
    P.register(spark)
    fmt = spark.read.format("rtbd_manifest_table").option("path", path).load()
    assert fmt.count() == 100
    deltas = P._append_deltas(path, 0, P._head_snapshot(path)["version"])
    assert [d["version"] for d in deltas] == [1, 2]


def test_materialize_after_rename_applies_chain(spark, tmp_path):
    """Found by the model-based verb-sequence test: rename v->w, MoR
    delete on w, then materialize — the physical rewrite must read each
    file LOGICALLY (rename chain applied) or the predicate on the
    current name fails to resolve against the file's pre-rename
    columns.  The rewritten files land under current names and the
    retained rename entry no-ops on them."""
    path = str(tmp_path / "tmrn")
    P.register_sink(spark)
    spark.range(20).selectExpr("id", "CAST(id AS INT) AS v").coalesce(2).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    P.rename_column(path, "v", "w")
    P.delete_where_mor(path, "w", 5, 9)
    P.materialize_deletes(spark, path)
    df, head = P.read_manifest(spark, path)
    assert not head.get("eq_deletes")
    assert sorted(df.columns) == ["id", "w"]
    assert sorted(r.w for r in df.collect()) == [v for v in range(20) if not 5 <= v <= 9]
    # the same shape through the Arrow format reader
    P.register(spark)
    fmt = spark.read.format("rtbd_manifest_table").option("path", path).load()
    assert sorted(fmt.columns) == ["id", "w"] and fmt.count() == 15


def test_rename_onto_constraint_referenced_name_refused(spark, tmp_path):
    """Found by the model machine's state space: renaming a column ONTO
    a name an existing CHECK constraint references would re-activate
    that constraint against data it never validated (reachable via
    rename -> constrain -> restore -> re-rename).  The to-guard refuses
    symmetrically with the from-guard."""
    path = str(tmp_path / "tg7")
    P.register_sink(spark)
    spark.range(9).selectExpr("id", "CAST(id AS INT) AS v").coalesce(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    P.rename_column(path, "v", "w")  # v1 data now logically 'w'
    P.add_check_constraint(path, "w_range", "w", lo=0, hi=8)
    P.restore_table(path, 1)  # back to column 'v'; constraint on 'w' dormant
    with pytest.raises(RuntimeError, match="CHECK constraints reference 'w'"):
        P.rename_column(path, "v", "w")
    P.drop_check_constraint(path, "w_range")
    P.rename_column(path, "v", "w")  # allowed once the constraint is gone
    assert "w" in P.read_manifest(spark, path)[0].columns
