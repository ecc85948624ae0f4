"""Bucketed-storage query shapes (round-4 widening).

The reference's storage story is PostgreSQL B-trees (``init.sql:29-31``);
the engine's date-partitioned layout covers its time-range scans
(`sources/layout.py`).  This module adds the OTHER at-rest clustering a
100 TB deployment leans on: HASH BUCKETING on the big join key.  Both
fact tables are staged once per (session, sf_dir) as parquet tables
bucketed by order key (`layout.write_bucketed` — the same build-once /
query-many shape as the persisted IVF index), and the catalog queries
then prove the two payoffs:

* `bucketed_join_revenue` — a fact-fact join with ZERO Exchange ahead
  of it (the bucketing IS the shuffle, paid once at write time);
* `bucketed_key_lookup` — an equality predicate on the bucket column
  prunes the scan to 1/n of the files at planning time
  (`SelectedBucketsCount` in the plan).

Correctness: bucketing is pure physical layout, so both queries
value-hash against oracles over the ORIGINAL unbucketed parquet —
identical results, different (cheaper) plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    round_det,
)
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources import layout
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

_N_BUCKETS = 8

# session-lifetime staging: sf_dir -> (orders_table, lineitem_table)
_BUCKETED: dict[str, tuple[str, str]] = {}


def bucketed_fact_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage (once per session+sf_dir) orders and lineitem as parquet
    tables bucketed by order key, and return their catalog names."""
    if sf_dir not in _BUCKETED:
        import hashlib
        import tempfile

        # Keep bucket-aware scans ON for point lookups: Spark's
        # DisableUnnecessaryBucketedScan rule models only distribution
        # requirements (joins/aggs), so left to itself it turns a
        # `WHERE bucket_col = k` scan back into a read-everything scan
        # and silently discards the 1-of-n bucket pruning (verified on
        # the explain output).  Scoped in effect to this module: only
        # the bucketed staging tables are affected by the flag.
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        tag = "b" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        base = tempfile.mkdtemp(prefix="rtbd_bucketed_")
        ot, lt = f"rtbd_orders_{tag}", f"rtbd_lineitem_{tag}"
        layout.write_bucketed(
            load_table(spark, sf_dir, "orders"),
            ot,
            f"{base}/orders",
            bucket_col="o_orderkey",
            n_buckets=_N_BUCKETS,
            sort_col="o_orderkey",
        )
        layout.write_bucketed(
            load_table(spark, sf_dir, "lineitem"),
            lt,
            f"{base}/lineitem",
            bucket_col="l_orderkey",
            n_buckets=_N_BUCKETS,
            sort_col="l_orderkey",
        )
        _BUCKETED[sf_dir] = (ot, lt)
    return _BUCKETED[sf_dir]


@register(
    "bucketed_join_revenue",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           ROUND(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 + 1e-8, 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("storage", "bucketing", "colocated-join"),
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join (lineitem><orders on the order key) over tables
    BUCKETED on that key: the plan contains no Exchange below the join —
    both scans already satisfy the join's distribution requirement, so
    the only shuffle in the whole query is the tiny 5-group rollup.  The
    `merge` hint pins a sort-merge join (a broadcast at toy scale would
    hide the property being demonstrated; at 100 TB sort-merge IS the
    only option for two fact tables).  Result is value-hashed against
    the identical join over the unbucketed parquet."""
    ot, lt = bucketed_fact_tables(spark, sf_dir)
    o = spark.table(ot).select("o_orderkey", "o_orderpriority")
    l = spark.table(lt).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = as_cents(F.col("l_extendedprice")) * (100 - as_cents(F.col("l_discount")))
    return (
        l.join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            round_det(F.sum(rev) / 10000.0, 2).alias("revenue"),
        )
    )


@register(
    "bucketed_key_lookup",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           ROUND(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) / 10000.0 + 1e-8, 2) AS net_price
    FROM lineitem l
    WHERE l.l_orderkey = (SELECT min(l_orderkey) + 41 FROM lineitem)
    """,
    tags=("storage", "bucketing", "bucket-pruning"),
)
def bucketed_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on the bucket column: the scan reads ONLY the one
    file-bucket the key hashes to (`SelectedBucketsCount: 1 out of 8` in
    the plan) — the parquet analogue of the reference's B-tree point
    lookup (``init.sql:29-31``), with I/O 1/n of the table at any scale.
    The probed key is derived from the data (min+41) so the query is
    fixture-independent; the derivation runs on the ORIGINAL table and
    collapses to a literal before planning the bucketed scan."""
    ot, lt = bucketed_fact_tables(spark, sf_dir)
    # 1-row driver lookup to produce the literal the bucketed scan prunes
    # on (bounded by contract: one aggregate value, never data rows).
    base = load_table(spark, sf_dir, "lineitem")
    key = base.agg((F.min("l_orderkey") + 41).alias("k")).collect()[0]["k"]
    l = spark.table(lt)
    rev = as_cents(F.col("l_extendedprice")) * (100 - as_cents(F.col("l_discount")))
    return l.filter(F.col("l_orderkey") == F.lit(int(key))).select(
        "l_orderkey",
        "l_linenumber",
        round_det(rev / 10000.0, 2).alias("net_price"),
    )


# --- schema-on-read JSONL ingestion (batch twin of the stream
# dead-letter path) ------------------------------------------------------
import os as _os
import tempfile as _tempfile

_JSONL_PATH = _os.path.join(_tempfile.gettempdir(), f"rtbd_stage_events_jsonl_{_os.getpid()}")
_JSONL_STAGED: dict[str, str] = {}


def _stage_jsonl(spark: SparkSession, sf_dir: str) -> None:
    """Stage the events table as JSON-lines with a deterministic subset
    of malformed records (event_id % 97 == 0 -> closing chars cut)."""
    if _JSONL_STAGED.get("path") == sf_dir and _os.path.exists(_JSONL_PATH):
        return
    e = load_table(spark, sf_dir, "events")
    j = F.to_json(F.struct("event_id", "event_type", "value"))
    line = F.when(
        F.col("event_id") % 97 == 0, F.substring(j, 1, F.length(j) - 5)
    ).otherwise(j)
    e.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(_JSONL_PATH)
    _JSONL_STAGED["path"] = sf_dir


@register(
    "jsonl_ingest_audit",
    oracle="""
    SELECT event_type, count(*) AS n_rows,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events WHERE event_id % 97 <> 0
    GROUP BY event_type
    UNION ALL
    SELECT '_corrupt' AS event_type, count(*) AS n_rows,
           CAST(NULL AS BIGINT) AS sum_value_cents
    FROM events WHERE event_id % 97 = 0
    """,
    tags=("storage", "source", "json", "schema-on-read", "dead-letter"),
)
def jsonl_ingest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-enforced JSON-lines ingestion with corrupt-record capture —
    the BATCH twin of the streaming dead-letter path (SURVEY §1.3: the
    reference's `from_json` silently nulls malformed payloads; this
    keeps them observable).  The events table is staged once per session
    as JSONL with a deterministic ~1% of lines truncated mid-record;
    the query re-reads it with an explicit schema in PERMISSIVE mode
    (`columnNameOfCorruptRecord`) and reports per-type good-row counts +
    exact value sums plus the '_corrupt' bucket.  The oracle derives
    the same audit from the original table and the corruption rule, so
    a value-hash match proves the full serialize -> corrupt -> parse ->
    quarantine path: every good row's fields survive the JSON round
    trip exactly (doubles re-parse bit-identically) and every corrupt
    line is quarantined, never silently dropped or nulled.  Scale: JSON
    scan is a pure map; the audit agg is a handful of groups."""
    _stage_jsonl(spark, sf_dir)
    schema = "event_id long, event_type string, value double, _corrupt string"
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(_JSONL_PATH)
    )
    tag = F.when(F.col("_corrupt").isNotNull(), F.lit("_corrupt")).otherwise(F.col("event_type"))
    return parsed.groupBy(tag.alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_corrupt").isNull(), as_cents(F.col("value")))).alias(
            "sum_value_cents"
        ),
    )


# Staged-fixture dirs keyed by sf_dir (stage once per session+dataset).
# NOT a bare function attribute: these stage sf_dir-DERIVED content, so a
# scale-blind cache poisons any later call at another scale in the same
# session (found by the round-12 sf0.1 rotation: the sf0.001 oracle-parity
# leg staged binaryfile_image_census's 25-file corpus first, and the sf0.1
# leg then read it back against a 250-row oracle).
_SCHEMA_EVO_STAGED: dict[str, str] = {}
_BINFILE_STAGED: dict[str, str] = {}


@register(
    "parquet_schema_evolution",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
        SELECT o_orderkey, o_custkey, CAST(NULL AS BIGINT) AS price_cents,
               o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    ),
    u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(price_cents) AS BIGINT) AS n_with_price,
           CAST(count(o_orderpriority) AS BIGINT) AS n_with_priority,
           CAST(sum(price_cents) AS BIGINT) AS price_cents_total,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM u
    """,
    tags=("storage", "schema-evolution", "mergeSchema", "parquet"),
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET SCHEMA EVOLUTION — the table whose columns changed
    mid-history: generation v1 wrote (key, custkey, price_cents),
    generation v2 dropped the price and added a priority column.  A
    plain read takes ONE footer's schema and silently loses the other
    generation's column; `mergeSchema` unions the footers so every file
    contributes its columns and absent ones read as NULL — the
    evolution contract every long-lived table needs (and what
    Delta/Iceberg formalize in metadata; here it is the raw-parquet
    version).  The audit counts per-generation presence and the exact
    cents total over the generation that HAS the column — a dropped or
    misaligned column breaks the hash.  Staged once per session PER
    DATASET (keyed by sf_dir — a session-wide cache would serve one
    dataset's staging to a query over another, the cross-scale
    contamination the sf0.1 rotation caught in binaryfile_image_census);
    the read is the query."""
    import os
    import tempfile

    path = _SCHEMA_EVO_STAGED.get(sf_dir)
    if path is None or not os.path.exists(path):
        path = tempfile.mkdtemp(prefix="rtbd_schema_evo_") + "/t"
        o = load_table(spark, sf_dir, "orders")
        v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", as_cents(F.col("o_totalprice")).alias("price_cents")
        )
        v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        v1.write.mode("overwrite").parquet(path)
        v2.write.mode("append").parquet(path)
        _SCHEMA_EVO_STAGED[sf_dir] = path
    t = spark.read.option("mergeSchema", "true").parquet(path)
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("price_cents").cast("long").alias("n_with_price"),
        F.count("o_orderpriority").cast("long").alias("n_with_priority"),
        F.sum("price_cents").cast("long").alias("price_cents_total"),
        F.count_distinct("o_orderpriority").cast("long").alias("n_priorities"),
    )


@register(
    "binaryfile_image_census",
    oracle="""
    WITH ids AS (
        SELECT doc_id FROM documents WHERE doc_id % 20 = 0
    ),
    g AS (
        SELECT doc_id, unnest(generate_series(0, 15)) AS r FROM ids
    ),
    px AS (
        SELECT doc_id, (doc_id * 7 + r * 13 + c.c * 5) % 256 AS p
        FROM g, (SELECT unnest(generate_series(0, 15)) AS c) c
    )
    SELECT doc_id,
           CAST(16 AS BIGINT) AS width,
           CAST(16 AS BIGINT) AS height,
           ROUND(sum(p) / CAST(count(*) AS DOUBLE) + 1e-8, 4) AS mean_luma,
           CAST(count(*) FILTER (WHERE p >= 128) AS BIGINT) AS n_bright,
           CAST(min(p) AS BIGINT) AS luma_min,
           CAST(max(p) AS BIGINT) AS luma_max
    FROM px GROUP BY doc_id
    """,
    tags=("storage", "binaryFile", "source-format", "multimodal", "real-codec"),
)
def binaryfile_image_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` SOURCE FORMAT — how real image/audio corpora
    actually arrive (a directory of files, not a parquet column): every
    20th document's 16x16 PNG is written ONCE as an individual
    `<doc_id>.png` file, then read back with
    `spark.read.format("binaryFile")` — path, length, and content
    columns straight from the file system, with Spark parallelizing
    over files — decoded by the real PNG parser and reduced to the
    same luma census as `image_png_pipeline`.  The doc id rides the
    FILENAME (regexp off the path column), the provenance pattern every
    file-corpus ingest uses.  The oracle regenerates the pixel formula
    directly; a file/row mismatch, content truncation, or filename
    mis-parse breaks the hash.  At 100 TB binaryFile is the landing
    zone: this query is the ingest step that turns a file corpus into
    the binary-column tables the multimodal family processes."""
    import os
    import tempfile

    from real_time_big_data_iot_monitoring_pipeline_spark.operators import multimodal

    path = _BINFILE_STAGED.get(sf_dir)
    if path is None or not os.path.exists(path):
        path = tempfile.mkdtemp(prefix="rtbd_binfile_") + "/imgs"
        os.makedirs(path, exist_ok=True)
        ids = [
            r.doc_id
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") % 20 == 0)
            .collect()
        ]
        # bounded driver loop: one small file per sampled doc — the
        # fixture-staging step, not the query (a real corpus lands here
        # from its own producer)
        for doc_id in ids:
            payload = multimodal.png_encode(multimodal._synth_pixels(int(doc_id), 16, 16))
            with open(os.path.join(path, f"{doc_id}.png"), "wb") as f:
                f.write(payload)
        _BINFILE_STAGED[sf_dir] = path
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.png$", 1).cast("long").alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    feats = multimodal.png_features(
        files.select("doc_id", "payload", F.lit(None).cast(
            "struct<mime:string,width:int,height:int>"
        ).alias("meta"))
    )
    return feats


_DPO_STAGED: dict[str, str] = {}


@register(
    "dynamic_partition_overwrite",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(CASE WHEN event_type = 'click'
                          THEN CAST(round(value * 100, 0) AS BIGINT) * 2
                          ELSE CAST(round(value * 100, 0) AS BIGINT) END) / 100.0
                 + 1e-8, 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("storage", "partitioned-layout", "dynamic-overwrite", "insert-overwrite"),
)
def dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE — the partitioned-table revise verb
    (`INSERT OVERWRITE ... PARTITION` with
    `partitionOverwriteMode=dynamic`): writing a frame that contains
    ONLY 'click' rows replaces ONLY the event_type=click partition
    directory; the other four partitions' files are never rewritten or
    deleted.  (In STATIC mode the same write would TRUNCATE THE WHOLE
    TABLE first — the classic data-loss foot-gun this mode exists to
    fix, and the reason every backfill job sets it.)  The staged table
    partitions events by type; the overwrite pass doubles click values
    (exact cents); the readback rollup must show doubled clicks AND
    bit-identical other types — a static-mode truncation would vanish
    them, a non-click rewrite would double the wrong rows.  At 100 TB
    this is the daily-backfill contract: recompute one day/type
    partition, swap it atomically at the directory level, touch
    nothing else.  The write option (not a global conf) scopes the
    behavior to this writer — session config stays untouched."""
    if sf_dir not in _DPO_STAGED:
        import os
        import tempfile

        path = os.path.join(tempfile.mkdtemp(prefix="rtbd_dpo_"), "events_by_type")
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", as_cents(F.col("value")).alias("cents"), "event_type"
        )
        e.write.partitionBy("event_type").mode("overwrite").parquet(path)
        clicks = e.filter(F.col("event_type") == "click").withColumn(
            "cents", F.col("cents") * 2
        )
        (
            clicks.write.partitionBy("event_type")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )
        _DPO_STAGED[sf_dir] = path
    back = spark.read.parquet(_DPO_STAGED[sf_dir])
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        round_det(F.sum("cents") / 100.0, 2).alias("total_value"),
    )
