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
