"""Incremental aggregate maintenance (round-4 widening).

The reference maintains its `sensor_aggregates` table incrementally —
each micro-batch appends that window's rollup (``spark_streaming.py:
152-181``) — but can never REVISE a window once written, and a batch
recompute starts from zero.  This module adds the warehouse-grade
version of the same idea: a persisted daily rollup in PARTIAL-AGGREGATE
form (count/sum/min/max — the commutative merge-able statistics), plus a
merge query that folds a new batch of events into it without rescanning
history.

The partial-aggregate trick is the whole design: avg is NOT merge-able,
(count, sum) is.  The store keeps (cnt, sum_cents, vmin, vmax) per
(day, event_type); merging a batch is `union` + one re-aggregate, and
late rows that land on an already-stored day combine correctly because
every stored statistic commutes.  At 100 TB the store is day-partitioned
parquet, the batch aggregate touches only the batch, and the final merge
shuffles #(days x types) partial rows — bytes, not data.

The oracle recomputes the rollup from the raw events table from scratch;
hash-equality proves store + batch == full recompute, i.e. the
incremental path loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    sum_product_exact,
    round_det,
    utc_ts,
)
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

# Store/batch boundary: mid-day, so the boundary day exists in BOTH the
# persisted store and the new batch and the merge must genuinely combine
# partials (a midnight cutoff would make the merge a trivial append).
_CUTOFF = "2024-01-23 12:00:00"

_STORE_DIRS: dict[str, str] = {}


def _partials(df: DataFrame) -> DataFrame:
    """Merge-able partial statistics per (day, event_type)."""
    return df.groupBy(
        F.floor(F.unix_seconds("ts") / F.lit(86400)).cast("long").alias("day_idx"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(as_cents(F.col("value"))).alias("sum_cents"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


def agg_store_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per session+sf_dir) the persisted daily rollup of all
    events BEFORE the cutoff, as day-partitioned parquet in partial form."""
    if sf_dir not in _STORE_DIRS:
        import tempfile

        path = tempfile.mkdtemp(prefix="rtbd_aggstore_")
        history = load_table(spark, sf_dir, "events").filter(F.col("ts") < utc_ts(_CUTOFF))
        _partials(history).write.mode("overwrite").partitionBy("day_idx").parquet(path)
        _STORE_DIRS[sf_dir] = path
    return _STORE_DIRS[sf_dir]


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) AS day_idx,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           ROUND(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 + 1e-8, 2) AS total,
           ROUND(sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(*)) + 1e-8, 4) AS avg_value,
           min(value) AS vmin,
           max(value) AS vmax
    FROM events
    GROUP BY day_idx, event_type
    """,
    tags=("incremental", "materialized-rollup", "merge"),
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold a new event batch (everything at/after the cutoff) into the
    persisted pre-cutoff daily rollup and return the up-to-date rollup.
    History is NEVER rescanned: the store contributes partial rows
    (#days x #types of them), the batch is aggregated alone, and one
    re-aggregate merges the two — count/sum/min/max all commute, and
    avg is derived from (sum, count) only at the end.  Hash-checked
    against a from-scratch recompute over the raw table."""
    store = spark.read.parquet(agg_store_dir(spark, sf_dir))
    batch = load_table(spark, sf_dir, "events").filter(F.col("ts") >= utc_ts(_CUTOFF))
    merged = (
        store.select("day_idx", "event_type", "cnt", "sum_cents", "vmin", "vmax")
        .unionByName(_partials(batch))
        .groupBy("day_idx", "event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
    return merged.select(
        "day_idx",
        "event_type",
        "cnt",
        round_det(F.col("sum_cents") / 100.0, 2).alias("total"),
        round_det(F.col("sum_cents") / (100.0 * F.col("cnt")), 4).alias("avg_value"),
        "vmin",
        "vmax",
    )


@register(
    "scd2_customer_history",
    oracle="""
    WITH snap1 AS (
        SELECT c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
               1 AS version
        FROM customer
    ), snap2 AS (
        SELECT c_custkey,
               CAST(round(c_acctbal * 100, 0) AS BIGINT)
               + CASE WHEN c_custkey % 7 = 0 THEN 10000 ELSE 0 END AS bal_cents,
               2 AS version
        FROM customer
    ), snaps AS (
        SELECT * FROM snap1 UNION ALL SELECT * FROM snap2
    ), changed AS (
        SELECT c_custkey, bal_cents, version,
               lag(bal_cents) OVER w AS prev_bal
        FROM snaps
        WINDOW w AS (PARTITION BY c_custkey ORDER BY version)
    ), hist AS (
        SELECT c_custkey, bal_cents, version AS valid_from,
               lead(version) OVER (PARTITION BY c_custkey ORDER BY version) AS next_from
        FROM changed
        WHERE prev_bal IS NULL OR bal_cents <> prev_bal
    )
    SELECT c_custkey,
           ROUND(bal_cents / 100.0 + 1e-8, 2) AS acctbal,
           CAST(valid_from AS BIGINT) AS valid_from,
           CAST(next_from - 1 AS BIGINT) AS valid_to,
           next_from IS NULL AS is_current
    FROM hist
    """,
    tags=("incremental", "scd2", "dimension-history"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from versioned snapshots:
    union the snapshots, keep only rows whose tracked attribute CHANGED
    vs the previous version (lag), then derive [valid_from, valid_to]
    intervals with lead — every unchanged snapshot row collapses away,
    which is what keeps an SCD2 table proportional to CHANGES, not
    snapshots x rows.  All three windows share one partition key
    (c_custkey), so the whole build rides a single exchange.  The second
    snapshot is derived deterministically (+100.00 for every 7th key) so
    the oracle replays the identical history."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    bal = as_cents(F.col("c_acctbal"))
    snap1 = c.select("c_custkey", bal.alias("bal_cents"), F.lit(1).alias("version"))
    snap2 = c.select(
        "c_custkey",
        (bal + F.when(F.col("c_custkey") % 7 == 0, 10000).otherwise(0)).alias("bal_cents"),
        F.lit(2).alias("version"),
    )
    w = Window.partitionBy("c_custkey").orderBy("version")
    changed = (
        snap1.unionByName(snap2)
        .withColumn("prev_bal", F.lag("bal_cents").over(w))
        .filter(F.col("prev_bal").isNull() | (F.col("bal_cents") != F.col("prev_bal")))
    )
    hist = changed.withColumn("next_from", F.lead("version").over(w))
    return hist.select(
        "c_custkey",
        round_det(F.col("bal_cents") / 100.0, 2).alias("acctbal"),
        F.col("version").cast("long").alias("valid_from"),
        (F.col("next_from") - 1).cast("long").alias("valid_to"),
        F.col("next_from").isNull().alias("is_current"),
    )


@register(
    "scd2_asof_lookup",
    oracle="""
    WITH b AS (
        SELECT min(epoch_us(ts)) AS lo,
               (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        FROM events
    ),
    hist AS (
        SELECT c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
               CAST('-9223372036854775808' AS BIGINT) AS from_us,
               (SELECT mid FROM b) AS to_us
        FROM customer
        UNION ALL
        SELECT c_custkey,
               CAST(round(c_acctbal * 100, 0) AS BIGINT)
               + CASE WHEN c_custkey % 7 = 0 THEN 10000 ELSE 0 END,
               (SELECT mid FROM b),
               9223372036854775807
        FROM customer
    )
    SELECT e.event_id, e.user_id,
           ROUND(h.bal_cents / 100.0 + 1e-8, 2) AS acctbal_asof
    FROM events e
    JOIN hist h
      ON h.c_custkey = e.user_id
     AND epoch_us(e.ts) >= h.from_us AND epoch_us(e.ts) < h.to_us
    """,
    tags=("incremental", "scd2", "point-in-time", "asof"),
)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME lookup against a type-2 dimension: every event
    reads the customer-balance version that was valid AT ITS OWN event
    time — the query every SCD2 table exists to answer, and the one a
    plain snapshot join silently gets wrong (it backdates today's
    values onto yesterday's facts).  The dimension carries two versions
    split at the feed's midpoint instant (exact integer micros, so both
    engines cut identically).  Plan: the interval predicate rides a
    plain EQUI-join on the customer key — versions-per-key is bounded
    (here 2, in production rarely >tens), so the join fans out
    key-matched candidates and the validity filter keeps exactly one;
    the dim broadcasts, the fact side never shuffles.  This composes
    `scd2_customer_history`'s build with the as-of family's temporal
    semantics."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    bounds = F.broadcast(
        e.agg(
            ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
            .cast("long")
            .alias("mid")
        )
    )
    bal = as_cents(F.col("c_acctbal"))
    v1 = c.crossJoin(bounds).select(
        "c_custkey",
        bal.alias("bal_cents"),
        F.lit(-(2**63)).cast("long").alias("from_us"),
        F.col("mid").alias("to_us"),
    )
    v2 = c.crossJoin(bounds).select(
        "c_custkey",
        (bal + F.when(F.col("c_custkey") % 7 == 0, 10000).otherwise(0)).alias("bal_cents"),
        F.col("mid").alias("from_us"),
        F.lit(2**63 - 1).cast("long").alias("to_us"),
    )
    hist = v1.unionByName(v2)
    us = F.unix_micros(F.col("ts"))
    return (
        e.join(
            F.broadcast(hist),
            (F.col("user_id") == F.col("c_custkey")) & (us >= F.col("from_us")) & (us < F.col("to_us")),
        )
        .select(
            "event_id",
            "user_id",
            round_det(F.col("bal_cents") / 100.0, 2).alias("acctbal_asof"),
        )
    )


@register(
    "bitemporal_asof_belief",
    oracle="""
    WITH b AS (
        SELECT min(epoch_us(ts)) AS lo,
               (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        FROM events
    ),
    versions AS (
        -- original records: transaction time = valid time
        SELECT event_id, user_id, epoch_us(ts) AS valid_us, epoch_us(ts) AS tx_us,
               CAST(round(value * 100, 0) AS BIGINT) AS val_cents
        FROM events
        UNION ALL
        -- corrections: every 7th event restated (+10.00) one hour later
        SELECT event_id, user_id, epoch_us(ts), epoch_us(ts) + 3600000000,
               CAST(round(value * 100, 0) AS BIGINT) + 1000
        FROM events WHERE event_id % 7 = 0
    ),
    belief AS (
        SELECT v.event_id, v.user_id, v.valid_us, v.val_cents,
               row_number() OVER (PARTITION BY v.event_id
                                  ORDER BY v.tx_us DESC) AS rn
        FROM versions v, b
        WHERE v.tx_us <= b.mid
    )
    SELECT event_id, user_id,
           ROUND(val_cents / 100.0 + 1e-8, 2) AS believed_value
    FROM belief WHERE rn = 1
    """,
    tags=("incremental", "bitemporal", "asof", "corrections"),
)
def bitemporal_asof_belief(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL as-of query — "what did we BELIEVE at time T?": every
    7th event is restated (+10.00) one hour after it happened, giving
    each record up to two versions on the TRANSACTION-time axis, and
    the query reconstructs the belief state at the feed's midpoint —
    records whose correction had not yet arrived by then still show
    their original value.  This is the audit/compliance twin of
    `scd2_asof_lookup` (which travels the VALID-time axis): corrections
    never destroy history, reads pin a transaction-time watermark.
    Plan: versions are a deterministic union (no second scan of a
    mutation log), the belief filter is a scan-level predicate on
    tx_us, and latest-version-wins is `max_by` over the bounded
    versions-per-record set — one event-keyed aggregation, no window
    over data-sized partitions."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    us = F.unix_micros(F.col("ts"))
    mid = F.broadcast(
        e.agg((((F.min(us) + F.max(us)) / 2).cast("long")).alias("mid"))
    )
    originals = e.select(
        "event_id", "user_id", us.alias("tx_us"), as_cents(F.col("value")).alias("val_cents")
    )
    corrections = (
        e.filter(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            "user_id",
            (us + 3600000000).alias("tx_us"),
            (as_cents(F.col("value")) + 1000).alias("val_cents"),
        )
    )
    versions = originals.unionByName(corrections).crossJoin(mid).filter(
        F.col("tx_us") <= F.col("mid")
    )
    return versions.groupBy("event_id", "user_id").agg(
        round_det(F.expr("max_by(val_cents, tx_us)") / 100.0, 2).alias("believed_value")
    )


@register(
    "merge_into_orders",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               o_orderstatus
        FROM orders
    )
    SELECT o_orderkey, o_custkey,
           ROUND(cents / 100.0 + 1e-8, 2) AS price, o_orderstatus AS status
    FROM t WHERE o_orderkey % 10 NOT IN (0, 1)
    UNION ALL
    SELECT o_orderkey, o_custkey,
           ROUND(CAST(floor(cents * 11 / 10) AS BIGINT) / 100.0 + 1e-8, 2), 'P'
    FROM t WHERE o_orderkey % 10 = 0 AND cents >= 10000
    UNION ALL
    SELECT o_orderkey, o_custkey, ROUND(cents / 100.0 + 1e-8, 2), o_orderstatus
    FROM t WHERE o_orderkey % 10 = 0 AND cents < 10000
    UNION ALL
    SELECT -o_orderkey, o_custkey, ROUND(cents / 100.0 + 1e-8, 2), 'N'
    FROM t WHERE o_orderkey % 10 = 2
    """,
    tags=("incremental", "merge-into", "cdc", "upsert", "single-shuffle"),
)
def merge_into_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL MERGE INTO surface (`operators/merge.merge_into`) — the one
    statement lakehouse tables use for upsert + CDC apply + conditional
    delete, executed as a single full-outer key join with JVM-side
    clause dispatch (the same physical shape Delta's MERGE lowers to).
    A deterministic change feed derived from `orders` exercises every
    clause: keys =0 mod 10 arrive as updates (+10% price, status 'P')
    but the WHEN MATCHED AND condition only fires for orders of >= $100
    — cheaper matched rows must survive UNCHANGED (clause-condition
    semantics, not blanket upsert); keys =1 mod 10 arrive as deletes;
    negated keys =2 mod 10 are unseen -> insert with status 'N'; all
    other target rows pass through untouched.  Prices stay in exact
    integer cents through the +10% bump (floor(cents*11/10) in both
    engines).  The oracle rebuilds the post-merge table as four
    disjoint set expressions — any clause misfire (dropped pass-through,
    update below the gate, resurrected delete, doubled insert) changes
    the row set.  Scale: one key-partitioned shuffle; at 100 TB the
    manifest sink's file stats would prune the untouched partitions
    first, leaving the same clause algebra over the matched slice."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.merge import merge_into

    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        as_cents(F.col("o_totalprice")).alias("cents"),
        F.col("o_orderstatus").alias("status"),
    )
    k = F.col("o_orderkey")
    updates = t.filter(k % 10 == 0).select(
        "o_orderkey", "o_custkey", "cents", "status", F.lit("U").alias("op")
    )
    deletes = t.filter(k % 10 == 1).select(
        "o_orderkey", "o_custkey", "cents", "status", F.lit("D").alias("op")
    )
    inserts = t.filter(k % 10 == 2).select(
        (-k).alias("o_orderkey"), "o_custkey", "cents", F.lit("N").alias("status"),
        F.lit("I").alias("op"),
    )
    source = updates.unionByName(deletes).unionByName(inserts)
    merged = merge_into(
        t,
        source,
        ["o_orderkey"],
        update_set={
            "cents": F.floor(F.col("t.cents") * 11 / 10).cast("long"),
            "status": F.lit("P"),
        },
        update_cond=(F.col("s.op") == "U") & (F.col("t.cents") >= 10000),
        delete_cond=F.col("s.op") == "D",
        insert_cond=F.col("s.op") == "I",
    )
    return merged.select(
        "o_orderkey",
        "o_custkey",
        round_det(F.col("cents") / 100.0, 2).alias("price"),
        "status",
    )


# Join-view split instant: both fact tables have real mass on each side
# (orders 1995-2001 by o_orderdate, lineitem by l_shipdate), so all four
# delta quadrants are non-empty and the merge genuinely combines them.
_JOIN_CUTOFF = "1999-01-01 00:00:00"

_JOIN_STORE_DIRS: dict[str, str] = {}


def _join_partials(o: DataFrame, li: DataFrame) -> DataFrame:
    """Merge-able partial statistics of the order-priority revenue VIEW
    over one (orders-slice x lineitem-slice) quadrant."""
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
            sum_product_exact(
                as_cents(F.col("l_extendedprice")) * (100 - as_cents(F.col("l_discount")))
            ).alias("rev_micro"),
        )
    )


@register(
    "incremental_join_delta",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0
                 + 1e-8, 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("incremental", "materialized-view", "join-delta", "ivm"),
)
def incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MAINTENANCE OF A JOIN VIEW — the delta-propagation
    algebra (classic IVM: d(A JOIN B) = dA JOIN B_old + A_old JOIN dB +
    dA JOIN dB) that `incremental_agg_merge` needs once the maintained
    view contains a JOIN, not just an aggregate.  The priority-revenue
    view over orders JOIN lineitem is split at a cutoff instant on EACH
    side's own event time (o_orderdate / l_shipdate — deliberately
    different columns, so order/item pairs genuinely straddle: old
    orders keep receiving new shipments and vice versa).  The
    pre-cutoff quadrant's partials are PERSISTED once; refresh joins
    only the three delta quadrants — each a (small delta) x (static
    side) join — and one re-aggregate folds all partials (count +
    micro-cents sum, both commutative).  O_old JOIN L_old is never
    recomputed: at 100 TB that quadrant is the table, the deltas are a
    day's partition, and the three delta joins prune to matching keys
    (bucketed layout makes them shuffle-free).  The oracle recomputes
    the view from scratch over the raw tables; hash-equality proves
    store + delta algebra == full recompute.  Reference parity: the
    incremental sensor_aggregates idea (ref:spark_streaming.py:152-181)
    lifted to a multi-table view."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    cut = utc_ts(_JOIN_CUTOFF)
    o_old, o_new = o.filter(F.col("o_orderdate") < cut), o.filter(F.col("o_orderdate") >= cut)
    l_old, l_new = li.filter(F.col("l_shipdate") < cut), li.filter(F.col("l_shipdate") >= cut)
    if sf_dir not in _JOIN_STORE_DIRS:
        import tempfile

        path = tempfile.mkdtemp(prefix="rtbd_joinstore_")
        _join_partials(o_old, l_old).write.mode("overwrite").parquet(path)
        _JOIN_STORE_DIRS[sf_dir] = path
    store = spark.read.parquet(_JOIN_STORE_DIRS[sf_dir])
    merged = (
        store.unionByName(_join_partials(o_new, l_old))
        .unionByName(_join_partials(o_old, l_new))
        .unionByName(_join_partials(o_new, l_new))
        .groupBy("o_orderpriority")
        .agg(F.sum("n_items").alias("n_items"), F.sum("rev_micro").alias("rev_micro"))
    )
    return merged.select(
        "o_orderpriority",
        "n_items",
        round_det(F.col("rev_micro") / 10000.0, 2).alias("revenue"),
    )
