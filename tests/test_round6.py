"""Round-6 regression tests.

Pins the advice-driven fixes:
  * hierarchy_subtree_rollup — TRUE pointer doubling must resolve nodes
    deeper than the number of join rounds (the old static-parent-map
    plan climbed only 3 levels, stranding custkeys >= 10000 at a
    non-root ancestor at sf0.1);
  * SensorFleetDataSource pushFilters — out-of-domain EqualTo values
    must yield zero rows, not a stride over the wrong sensor;
  * hysteresis_update — multi-chunk groups must fold in (ts, event_id)
    order;
  * ManifestParquetWriter overwrite — version numbering continues and
    no committed manifest is clobbered.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.compare import assert_frames_match


def test_hierarchy_rollup_depth4_pointer_doubling(spark, tmp_path):
    """Dense custkeys 1..15000 (depth 4: 14999 -> 1499 -> 149 -> 14 -> 1).
    A static one-step parent map joined 3 times climbs only 3 levels and
    strands 14999 at ancestor 14; true doubling (reach 2^3 = 8) must
    agree with the recursive-CTE oracle cell-for-cell."""
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY

    n = 15_000
    cust = spark.range(1, n + 1).select(F.col("id").alias("c_custkey"))
    cust.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = (
        spark.range(1, n + 1, 7)
        .select(
            F.col("id").alias("o_custkey"),
            (F.col("id") * 0.01).alias("o_totalprice"),
        )
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    q = REGISTRY["hierarchy_subtree_rollup"]
    got = q.build(spark, str(tmp_path)).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{tmp_path}/customer.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    want = con.execute(q.oracle).fetch_df()
    con.close()

    # every root must be < 10 — the precise failure mode of the linear
    # climb was roots like 14 leaking through
    assert (got["root"] < 10).all(), f"non-root ancestors: {sorted(got['root'])}"
    assert_frames_match(got, want, "hierarchy_subtree_rollup@depth4")


def test_pyds_pushdown_out_of_domain_sensor_yields_empty():
    """EqualTo('sensor_id', k) with k outside [0, n_sensors) must NOT be
    consumed (the modular stride would return the congruent sensor's
    rows); Spark keeps the predicate and the result is empty.  The
    generator guard is belt-and-braces: an out-of-range only_sensor
    yields nothing."""
    from pyspark.sql.datasource import EqualTo

    from real_time_big_data_iot_monitoring_pipeline_spark.sources.pydatasource import (
        SensorBatchReader,
        gen_rows,
    )

    for bad in (10, -1, 999):
        r = SensorBatchReader({"n_rows": "1000", "n_sensors": "10"})
        leftover = list(r.pushFilters([EqualTo(("sensor_id",), bad)]))
        assert r.only_sensor is None, f"consumed out-of-domain value {bad}"
        assert len(leftover) == 1 and isinstance(leftover[0], EqualTo)
        assert list(gen_rows(0, 500, 10, only_sensor=bad)) == []

    # in-domain value still consumed and strided
    r = SensorBatchReader({"n_rows": "1000", "n_sensors": "10"})
    assert list(r.pushFilters([EqualTo(("sensor_id",), 9)])) == []
    assert r.only_sensor == 9


class _FakeGroupState:
    """Minimal GroupState stand-in for driving applyInPandasWithState
    update functions directly in unit tests."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.exists, self._v = True, v


def test_hysteresis_multi_chunk_group_folds_in_global_order():
    """A key whose micro-batch rows span several Arrow chunks — with
    chunk boundaries cutting ACROSS event-time order — must fold
    identically to the single-sorted walk.  Per-chunk sorting (the old
    code) fires/clears on the chunk-local zigzag and gets n_fired=3."""
    from real_time_big_data_iot_monitoring_pipeline_spark.streaming.stateful import hysteresis_update

    # global (ts-sorted) value walk: 150 -> 10 -> 160 -> 20 => fired 2, cleared 2
    rows = [
        (1, 1, 150.0),  # fire
        (2, 2, 10.0),  # clear
        (3, 3, 160.0),  # fire
        (4, 4, 20.0),  # clear
    ]
    # deal rows into chunks so each chunk is internally ts-sorted but the
    # concatenation is interleaved: chunk A = ts 1,4 ; chunk B = ts 2,3.
    # Per-chunk folding walks 150,20,10,160 => fired 2 cleared 1 in_alert True.
    chunk_a = pd.DataFrame(
        [rows[0], rows[3]], columns=["ts", "event_id", "value"]
    )
    chunk_b = pd.DataFrame(
        [rows[1], rows[2]], columns=["ts", "event_id", "value"]
    )
    state = _FakeGroupState()
    (out,) = hysteresis_update((7,), iter([chunk_a, chunk_b]), state)
    assert out["n_seen"].iloc[0] == 4
    assert out["n_fired"].iloc[0] == 2
    assert out["n_cleared"].iloc[0] == 2
    assert not out["in_alert"].iloc[0]

    # state carries across calls: second micro-batch continues the walk
    (out2,) = hysteresis_update(
        (7,),
        iter([pd.DataFrame([(5, 5, 200.0)], columns=["ts", "event_id", "value"])]),
        state,
    )
    assert out2["n_fired"].iloc[0] == 3 and out2["in_alert"].iloc[0]

    # all-empty chunks: counters unchanged, state still written
    s2 = _FakeGroupState()
    (out3,) = hysteresis_update((8,), iter([pd.DataFrame(columns=["ts", "event_id", "value"])]), s2)
    assert out3["n_seen"].iloc[0] == 0 and s2.exists


def test_png_codec_roundtrip_and_handcrafted_filters():
    """The round-6 PNG codec: (a) encode->decode roundtrips across odd
    shapes (the per-row filter cycle exercises all five PNG filters on
    any image >= 5 rows); (b) decode reconstructs INDEPENDENTLY
    handcrafted payloads whose filter bytes were computed by hand — so
    a shared encoder/decoder bug cannot self-confirm; (c) chunk CRC
    corruption is loud; (d) nearest-neighbor resize is index striding."""
    import struct
    import zlib

    import numpy as np

    from real_time_big_data_iot_monitoring_pipeline_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        _synth_pixels,
        png_decode,
        png_encode,
        png_resize_nearest,
    )

    for h, w in ((1, 1), (3, 7), (32, 32), (13, 5)):
        px = _synth_pixels(12345, h, w)
        assert (png_decode(png_encode(px)) == px).all(), (h, w)

    w, h = 3, 2
    px = np.array([[10, 200, 30], [255, 0, 128]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def craft(raw):
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # filter 0 (None) rows, bytes laid out by hand
    raw0 = b"\x00" + bytes([10, 200, 30]) + b"\x00" + bytes([255, 0, 128])
    assert (png_decode(craft(raw0)) == px).all()
    # filter 1 (Sub) then filter 2 (Up), deltas computed by hand
    raw12 = (
        b"\x01"
        + bytes([10, (200 - 10) % 256, (30 - 200) % 256])
        + b"\x02"
        + bytes([(255 - 10) % 256, (0 - 200) % 256, (128 - 30) % 256])
    )
    assert (png_decode(craft(raw12)) == px).all()

    bad = bytearray(png_encode(px))
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))

    big = _synth_pixels(7, 32, 32)
    small = png_resize_nearest(big, 8, 8)
    assert small.shape == (8, 8) and (small == big[::4, ::4]).all()


def test_manifest_sink_overwrite_preserves_snapshot_history(spark, tmp_path):
    """Overwrite resets the cumulative file list but CONTINUES version
    numbering: earlier _manifest-v{k}.json files stay byte-immutable and
    time-travel reads of pre-overwrite versions keep working (the old
    code reset to v1 and os.replace'd the committed v1 manifest)."""
    import json
    import os

    from pyspark.sql import Row

    from real_time_big_data_iot_monitoring_pipeline_spark.sources.pydatasource import (
        ManifestParquetWriter,
        read_manifest,
    )

    path = str(tmp_path / "ow")
    w = ManifestParquetWriter({"path": path}, overwrite=False)
    w.commit([w.write(iter([Row(a=1), Row(a=2)]))])
    w.commit([w.write(iter([Row(a=3)]))])
    with open(os.path.join(path, "_manifest-v1.json")) as f:
        v1_before = json.load(f)

    ow = ManifestParquetWriter({"path": path}, overwrite=True)
    ow.commit([ow.write(iter([Row(a=99)]))])

    head, mh = read_manifest(spark, path)
    assert mh["version"] == 3, "overwrite must continue version numbering"
    assert mh["n_rows"] == 1 and head.count() == 1
    assert [r.a for r in head.collect()] == [99]

    # pre-overwrite snapshots: manifests untouched, data still readable
    with open(os.path.join(path, "_manifest-v1.json")) as f:
        assert json.load(f) == v1_before
    v1, m1 = read_manifest(spark, path, version=1)
    v2, m2 = read_manifest(spark, path, version=2)
    assert (m1["version"], v1.count()) == (1, 2)
    assert (m2["version"], v2.count()) == (2, 3)
    # overwrite snapshot shares no files with the pre-overwrite table
    assert not set(mh["files"]) & set(m2["files"])


def test_udtf_chunk_empty_and_exact_multiple(spark):
    """Chunking UDTF edge cases: empty/whitespace text yields zero
    chunks (not a single empty one); an exact multiple of the chunk
    size has no ragged tail."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_id int, n_tokens int, first_word string, last_word string",
        useArrow=True,
    )
    class ChunkText:
        def eval(self, text: str):
            words = [w for w in (text or "").split(" ") if w]
            for i in range(0, len(words), 10):
                chunk = words[i : i + 10]
                yield i // 10, len(chunk), chunk[0], chunk[-1]

    spark.udtf.register("rtbd_chunk_text_t", ChunkText)
    spark.createDataFrame(
        [(0, ""), (1, "   "), (2, " ".join(f"w{i}" for i in range(20)))],
        "doc_id long, text string",
    ).createOrReplaceTempView("v_chunk_t")
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM v_chunk_t d, LATERAL rtbd_chunk_text_t(d.text) c"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 0 not in by_doc and 1 not in by_doc
    assert len(by_doc[2]) == 2
    assert all(r.n_tokens == 10 for r in by_doc[2])
    assert by_doc[2][1].first_word == "w10" and by_doc[2][1].last_word == "w19"


def test_session_dynamic_gap_short_event_inside_long_session(spark):
    """A short-gap (error) event inside a long session must NOT split it
    when an earlier long-gap event's window still covers the follower —
    the running-max-of-ends merge semantics, which a naive
    'gap from previous event only' replay would get wrong."""
    import datetime

    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, etype):
        return (eid, base + datetime.timedelta(minutes=minutes), 1, etype, 1.0, "{}")

    # view@t0 holds session open to t0+30; error@t5 alone would only
    # hold to t5+10=15; click@t20 is beyond the error's reach but inside
    # the view's -> ONE session under merge semantics
    rows = [ev(1, 0, "view"), ev(2, 5, "error"), ev(3, 20, "click")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    gap = F.when(F.col("event_type") == "error", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    got = (
        df.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert len(got) == 1 and got[0].cnt == 3, got

    # and the catalog oracle's replay agrees on the same fixture
    import duckdb

    con = duckdb.connect()
    con.register("events", df.toPandas())
    want = con.execute(REGISTRY["session_window_dynamic_gap"].oracle).fetch_df()
    assert len(want) == 1 and int(want["cnt"].iloc[0]) == 3


def test_stream_sink_epoch_commit_idempotent(spark, tmp_path):
    """The streaming manifest sink's exactly-once discipline: a replayed
    epoch (same batchId committed twice — restart after sink commit,
    before engine checkpoint) must leave the table unchanged and remove
    the replayed parts; a fresh epoch appends a new version; abort
    deletes its uncommitted parts."""
    import glob
    import json
    import os

    from pyspark.sql import Row

    from real_time_big_data_iot_monitoring_pipeline_spark.sources.pydatasource import (
        ManifestStreamWriter,
        read_manifest,
    )

    path = str(tmp_path / "ss")
    w = ManifestStreamWriter({"path": path})

    w.commit([w.write(iter([Row(a=1), Row(a=2)]))], batchId=0)
    head0 = json.load(open(os.path.join(path, "manifest.json")))
    assert head0["version"] == 1 and head0["batches"] == [0] and head0["n_rows"] == 2

    # replayed epoch 0: same rows re-written by the retried tasks
    w.commit([w.write(iter([Row(a=1), Row(a=2)]))], batchId=0)
    head1 = json.load(open(os.path.join(path, "manifest.json")))
    assert head1 == head0, "replayed epoch must not change the table"
    assert not glob.glob(os.path.join(path, "_uncommitted_*")), "replay parts not cleaned"
    df, _ = read_manifest(spark, path)
    assert df.count() == 2

    # fresh epoch 1 appends
    w.commit([w.write(iter([Row(a=3)]))], batchId=1)
    head2 = json.load(open(os.path.join(path, "manifest.json")))
    assert head2["version"] == 2 and head2["batches"] == [0, 1] and head2["n_rows"] == 3
    df, _ = read_manifest(spark, path)
    assert sorted(r.a for r in df.collect()) == [1, 2, 3]

    # abort cleans its epoch's parts, table untouched
    msg = w.write(iter([Row(a=99)]))
    w.abort([msg], batchId=2)
    assert not glob.glob(os.path.join(path, "_uncommitted_*"))
    df, _ = read_manifest(spark, path)
    assert df.count() == 3


def test_schema_evolution_plain_read_loses_column(spark, tmp_path):
    """The trap parquet_schema_evolution exists to avoid: WITHOUT
    mergeSchema, the read takes one footer's schema and a generation's
    column silently vanishes; with it, both generations' columns
    survive with nulls where absent."""
    spark.createDataFrame([(1, 10)], "k long, a long").write.parquet(str(tmp_path / "t"))
    spark.createDataFrame([(2, 20)], "k long, b long").write.mode("append").parquet(
        str(tmp_path / "t")
    )
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"k", "a", "b"}
    rows = {r.k: (r.a, r.b) for r in merged.collect()}
    assert rows == {1: (10, None), 2: (None, 20)}
    plain = spark.read.parquet(str(tmp_path / "t"))
    assert set(plain.columns) != {"k", "a", "b"}, "plain read unexpectedly merged schemas"


def test_fuzzy_deletion_blocking_complete_for_d1(spark):
    """Deletion-neighborhood completeness on a hand-built d<=1 universe:
    every substitution/insertion/deletion pair is found, and the d=2
    collision ('ab'/'ba') is generated as a candidate but rejected by
    the levenshtein verify — exactly the construction's contract."""
    from pyspark.sql import functions as F

    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY

    names = ["abc", "abd", "ab", "abcd", "ba", "xyz"]
    # levenshtein-1 pairs by hand:
    want = {("ab", "abc"), ("ab", "abd"), ("abc", "abd"), ("abc", "abcd"),
            ("ab", "ba"), ("abd", "abcd")}
    # 'ab'-'ba' IS distance 2... verify with a quick python check
    def lev(a, b):
        import numpy as np
        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return int(d[-1])

    want = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if lev(*sorted((a, b))) == 1
    }
    df = spark.createDataFrame([(n,) for n in names], "c_name string")
    import real_time_big_data_iot_monitoring_pipeline_spark.plans.engine_queries as eq

    # drive the registered builder against a temp dir holding this tiny
    # customer table
    import tempfile, os
    d = tempfile.mkdtemp(prefix="rtbd_fuzzy_t_")
    df.write.parquet(os.path.join(d, "customer.parquet"))
    hist = REGISTRY["fuzzy_join_deletion1"].build(spark, d).collect()
    total_pairs = sum(r.n_neighbors * r.n_names for r in hist) // 2
    assert total_pairs == len(want), (total_pairs, sorted(want))


def test_bitmap_rollup_bucket_boundary(spark):
    """Bitmap distinct algebra across a bucket boundary: ids straddling
    the bitmap bucket width must still count exactly once after the
    OR-fold."""
    from pyspark.sql import functions as F

    ids = [0, 1, 32767, 32768, 32769, 65536, 1_000_000]
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    daily = df.groupBy(F.bitmap_bucket_number("user_id").alias("bucket")).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    total = daily.agg(F.sum(F.bitmap_count("bm")).alias("n")).collect()[0].n
    assert total == len(ids)


def test_merge_into_clause_semantics(spark):
    """Generic MERGE operator: clause precedence (delete before update),
    conditional update gates, conditional insert gates, and pass-through
    of unmatched target rows — pinned on a hand-computable table."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "a"), (4, 40, "a")],
        "k long, v long, tag string",
    )
    # ops: k=1 update (v below gate -> unchanged), k=2 update (fires),
    # k=3 delete, k=9 insert (gate passes), k=8 insert (gate fails)
    source = spark.createDataFrame(
        [
            (1, 100, "u", "U"),
            (2, 200, "u", "U"),
            (3, 0, "d", "D"),
            (9, 90, "i", "I"),
            (8, 80, "i", "X"),
        ],
        "k long, v long, tag string, op string",
    )
    out = merge_into(
        target,
        source,
        ["k"],
        update_set={"v": F.col("s.v"), "tag": F.lit("upd")},
        update_cond=(F.col("s.op") == "U") & (F.col("t.v") >= 15),
        delete_cond=F.col("s.op") == "D",
        insert_cond=F.col("s.op") == "I",
    )
    rows = {r["k"]: (r["v"], r["tag"]) for r in out.collect()}
    assert rows == {
        1: (10, "a"),     # matched, update gate failed -> unchanged
        2: (200, "upd"),  # matched, update fired
        4: (40, "a"),     # no source row -> pass-through
        9: (90, "i"),     # not matched, insert gate passed
    }


def test_merge_into_delete_beats_update(spark):
    """A matched pair satisfying BOTH clauses deletes (SQL clause order)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.merge import merge_into

    target = spark.createDataFrame([(1, 10)], "k long, v long")
    source = spark.createDataFrame([(1, 99)], "k long, v long")
    out = merge_into(
        target,
        source,
        ["k"],
        update_set={"v": F.col("s.v")},
        update_cond=F.lit(True),
        delete_cond=F.lit(True),
    )
    assert out.count() == 0


def test_bfs_unreachable_nodes_absent(spark, sf_dir):
    """BFS result never reports distance > cap and every level's node
    count is positive (seeds exist at the test scale)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY

    pdf = REGISTRY["bfs_shortest_hops"].build(spark, sf_dir).toPandas()
    assert pdf["dist"].between(0, 4).all()
    assert (pdf["n_nodes"] > 0).any()


def test_manifest_stats_pruning_edges(spark, tmp_path):
    """Zone-map pruning: boundary-touching ranges stay scanned (closed
    intervals), disjoint ranges prune, and a column with no recorded
    stats never prunes."""
    from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource

    pydatasource.register_sink(spark)
    path = str(tmp_path / "tbl")
    for lo, hi in [(0, 100), (100, 200), (200, 300)]:
        spark.range(lo, hi).selectExpr("id AS k", "CAST(id AS STRING) AS s").repartition(
            1
        ).write.format("rtbd_manifest_sink").option("path", path).mode("append").save()

    df, scanned, total = pydatasource.read_manifest_pruned(spark, path, "k", 150, 150)
    assert (scanned, total) == (1, 3)
    assert df.filter("k = 150").count() == 1
    # boundary: hi of file 0 is 99 -> [99, 99] scans exactly file 0
    _, scanned, _ = pydatasource.read_manifest_pruned(spark, path, "k", 99, 99)
    assert scanned == 1
    # straddling range scans both files it overlaps
    _, scanned, _ = pydatasource.read_manifest_pruned(spark, path, "k", 95, 105)
    assert scanned == 2
    # out-of-domain range prunes everything
    _, scanned, _ = pydatasource.read_manifest_pruned(spark, path, "k", 1000, 2000)
    assert scanned == 0
    # string column has no numeric stats -> never prunable
    _, scanned, _ = pydatasource.read_manifest_pruned(spark, path, "s", 0, 0)
    assert scanned == 3


def test_wap_publish_version_conflict_refused(spark, tmp_path):
    """A staged snapshot whose base head moved underneath it must refuse
    to publish (the WAP conflict rule), and a discarded stage removes
    only its own part files."""
    import os

    from real_time_big_data_iot_monitoring_pipeline_spark.sources import pydatasource

    pydatasource.register_sink(spark)
    path = str(tmp_path / "tbl")
    base = spark.range(0, 100).selectExpr("id AS k")
    base.repartition(1).write.format("rtbd_manifest_sink").option("path", path).mode(
        "append"
    ).save()
    # stage on top of v1 ...
    spark.range(100, 200).selectExpr("id AS k").repartition(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).option("staged", "true").mode("append").save()
    # ... then another commit moves the head to v2
    spark.range(200, 300).selectExpr("id AS k").repartition(1).write.format(
        "rtbd_manifest_sink"
    ).option("path", path).mode("append").save()
    with pytest.raises(RuntimeError, match="no longer applies"):
        pydatasource.publish_staged(path)
    removed = pydatasource.discard_staged(path)
    assert removed == 1
    df, m = pydatasource.read_manifest(spark, path)
    assert m["version"] == 2 and df.count() == 200
    # every manifest-listed file still exists (discard didn't over-delete)
    for fn in m["files"]:
        assert os.path.exists(os.path.join(path, fn))


def test_hilbert_curve_is_bijective_and_adjacent():
    """The unrolled div/mod xy2d stages (`engine_queries._hilbert_stage`)
    must BE a Hilbert curve: evaluating the same per-level arithmetic in
    Python over the full 256x256 grid must visit every cell exactly once
    with every consecutive pair grid-adjacent (the locality property the
    layout audit's bbox numbers rest on)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.plans.engine_queries import _HGRID

    def xy2d(x, y):
        d = 0
        s = _HGRID // 2
        while s > 0:
            rx = (x // s) % 2
            ry = (y // s) % 2
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = _HGRID - 1 - x, _HGRID - 1 - y
                x, y = y, x
            s //= 2
        return d

    cells = {}
    for x in range(_HGRID):
        for y in range(_HGRID):
            cells[xy2d(x, y)] = (x, y)
    assert len(cells) == _HGRID * _HGRID
    for d in range(_HGRID * _HGRID - 1):
        x1, y1 = cells[d]
        x2, y2 = cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_stage_matches_python_twin(spark):
    """The SQL expression chain and the Python reference agree cell-for
    -cell on a sampled grid (the generated CASE arithmetic is the thing
    under test, not the curve maths)."""
    from pyspark.sql import functions as F

    from real_time_big_data_iot_monitoring_pipeline_spark.plans.engine_queries import (
        _HGRID,
        _hilbert_stage,
    )

    def xy2d(x, y):
        d = 0
        s = _HGRID // 2
        while s > 0:
            rx = (x // s) % 2
            ry = (y // s) % 2
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = _HGRID - 1 - x, _HGRID - 1 - y
                x, y = y, x
            s //= 2
        return d

    grid = spark.range(0, 4096).select(
        (F.col("id") % 256).alias("gx"), ((F.col("id") * 37) % 256).alias("gy")
    )
    h = grid.select(
        "gx", "gy", F.col("gx").alias("hx"), F.col("gy").alias("hy"), F.lit(0).alias("hd")
    )
    s = _HGRID // 2
    while s > 0:
        d, x, y = _hilbert_stage(s, "div")
        h = h.select(
            "gx", "gy", F.expr(x).alias("hx"), F.expr(y).alias("hy"), F.expr(d).alias("hd")
        )
        s //= 2
    for r in h.collect():
        assert r["hd"] == xy2d(r["gx"], r["gy"])


def test_hilbert_beats_zorder_bbox_area(spark, sf_dir):
    """The audit's headline claim on the real fixture: equal-count file
    splits along the Hilbert curve give total bounding-box area no worse
    than the z-order split."""
    from real_time_big_data_iot_monitoring_pipeline_spark.plans.engine_queries import (
        layout_hilbert_stats,
    )

    rows = {r["layout"]: r for r in layout_hilbert_stats(spark, sf_dir).collect()}
    assert rows["hilbert"]["total_bbox_area"] <= rows["zorder"]["total_bbox_area"]


def test_no_decimal_literal_arithmetic_in_spark_exprs():
    """Spark SQL parses `1.0` as DECIMAL while DuckDB's division rules
    promote to DOUBLE — a real hash flake was caught when
    `F.expr("... / (1.0 * (n*sxx - sx*sx))")` produced DECIMAL(38,17)
    arithmetic in Spark against double arithmetic in the oracle
    (kfold_regression_stability, fixed with explicit CAST AS DOUBLE).
    This lint pins the lesson: no F.expr string in the catalog may use
    a bare decimal literal in ARITHMETIC (function arguments like
    percentile(x, 0.5) are fine — they don't change the expression's
    arithmetic type).  The long-stable Poisson divisor is allowlisted:
    its uniform only meets CASE breakpoints, quantized far from
    boundaries."""
    import pathlib
    import re

    plans = pathlib.Path(
        "real_time_big_data_iot_monitoring_pipeline_spark"
    )
    # dangerous: a decimal literal adjacent to an arithmetic operator
    # inside an F.expr / selectExpr string
    danger = re.compile(
        r"""F\.expr\(\s*f?"[^"]*(?:[-+*/]\s*\d+\.\d|\d\.\d+\s*[-+*/])[^"]*\""""
    )
    # allowlisted: the _pois1_case divisor (driver-green r5) and the
    # standard `+ 0.5 + 1e-8` quantization epsilon, which is only ever
    # added to an already-DOUBLE expression (double wins Spark's
    # decimal/double coercion, so no decimal arithmetic is introduced)
    allow = ("4294967296.0", "0.5 + 1e-8")
    offenders = []
    for py in plans.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            m = danger.search(line)
            if m and not any(a in line for a in allow):
                offenders.append(f"{py}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
