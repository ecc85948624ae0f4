"""SQL-surface + data-management widening (round 6).

Five capability corners a warehouse migrator expects that had no catalog
entry yet, each a declarative plan with a DuckDB oracle:

* sliding COUNT DISTINCT    (7-day distinct-user window — neither engine
                             allows DISTINCT window aggregates, so the
                             scalable rewrite is the (user, day) dedup +
                             day->window fan-out both can check)
* CDC changelog apply       (SCD1 MERGE: insert/update/delete changelog
                             folded into a base snapshot in one pass —
                             the write-side twin of `snapshot_cdc_diff`)
* LATERAL correlated join   (per-customer top-3 orders via a LATERAL
                             subquery — the SQL surface itself, planned
                             by both engines from the same text)
* generic table profiler    (per-column null rate / distinct count /
                             min / max via unpivot — the first query a
                             data engineer runs on an unknown table)
* last-touch attribution    (each purchase credited to the user's most
                             recent preceding event type — the marketing
                             attribution window everyone implements)

Scale rule as everywhere in this package: shuffles key on real
high-cardinality columns, fan-outs are bounded constants (7 window
slots), and nothing collects unbounded rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import as_cents, round_det
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "sliding_distinct_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    win AS (
        SELECT d.day AS win_day, ud.user_id
        FROM days d JOIN ud ON ud.day BETWEEN d.day - 6 AND d.day
    )
    SELECT win_day AS day,
           win_day * 86400 AS day_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users_7d
    FROM win GROUP BY win_day
    """,
    tags=("engine", "window", "distinct", "sliding", "fan-out"),
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day SLIDING COUNT DISTINCT — the rolling-active-users metric.
    Neither Spark nor DuckDB allows a DISTINCT aggregate inside a window
    frame, so the scalable rewrite is explicit: dedup to (user, day)
    first (one hash agg — the raw event volume is touched exactly once),
    then fan each row out to the <=7 window slots it participates in
    (a bounded constant-factor explode, NOT data-dependent) and count
    distinct per slot.  At 100 TB the fan-out operates on the deduped
    user-day table (|users| x |days|, orders of magnitude below raw
    events), and the final distinct agg is a two-level hash Spark plans
    with partial aggregation.  The oracle runs the identical rewrite as
    a range self-join.  Only days present in the data appear (a dense
    calendar spine is `resample_gap_fill`'s subject)."""
    e = _t(spark, sf_dir, "events")
    ud = (
        e.select("user_id", (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"))
        .distinct()
    )
    days = ud.select("day").distinct()
    fan = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("win_day"),
    ).join(days.withColumnRenamed("day", "win_day"), "win_day")
    return fan.groupBy(F.col("win_day").alias("day")).agg(
        (F.col("win_day") * 86400).alias("day_start"),
        F.count_distinct("user_id").cast("long").alias("active_users_7d"),
    ).select("day", (F.col("day") * 86400).alias("day_start"), "active_users_7d")


_CDC_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
               o_orderstatus
        FROM orders WHERE o_orderkey % 4 <> 0
    ),
    chg AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 0 THEN 'I'
                    WHEN o_orderkey % 7 = 0 THEN 'D'
                    ELSE 'U' END AS op,
               o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) + 500 AS price_cents,
               o_orderstatus
        FROM orders WHERE o_orderkey % 4 = 0 OR o_orderkey % 7 = 0 OR o_orderkey % 5 = 0
    ),
    merged AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
               CASE WHEN c.o_orderkey IS NULL THEN b.price_cents ELSE c.price_cents END AS price_cents,
               COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus
        FROM base b FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(price_cents) AS BIGINT) AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM merged GROUP BY o_orderstatus
"""


@register(
    "cdc_apply_scd1",
    oracle=_CDC_ORACLE,
    tags=("engine", "cdc", "merge", "scd1", "upsert"),
)
def cdc_apply_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 CHANGELOG APPLY — the MERGE INTO everyone migrating off a
    warehouse asks for: fold an insert/update/delete changelog into a
    base snapshot so the result is the post-merge table (last-write-
    wins, hard deletes).  `snapshot_cdc_diff` derives the changelog
    from two snapshots; this is the write-side inverse, and together
    they close the CDC round trip.  The changelog is synthesized
    deterministically from orders (keys %4=0 insert — absent from the
    base by construction; %7=0 delete; %5=0 update at +5.00), so the
    merge exercises all three ops including key overlap (a key can
    match %7 and %5: delete wins via the CASE priority, same on both
    engines).  Plan: ONE full-outer join on the key — the canonical
    distributed merge (Delta/Iceberg MERGE compiles to exactly this) —
    then the delete filter; no driver-side row handling.  At 100 TB
    both sides shuffle-partition on o_orderkey, and with a bucketed
    base (`sources/layout.py`) the exchange on the base side
    disappears.  Output is the post-merge per-status census (count,
    cents-exact total, key span) so the hash pins every op's effect."""
    o = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey",
        "o_custkey",
        as_cents(F.col("o_totalprice")).alias("price_cents"),
        "o_orderstatus",
    )
    chg = (
        o.filter(
            (F.col("o_orderkey") % 4 == 0)
            | (F.col("o_orderkey") % 7 == 0)
            | (F.col("o_orderkey") % 5 == 0)
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 4 == 0, F.lit("I"))
            .when(F.col("o_orderkey") % 7 == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "o_custkey",
            (as_cents(F.col("o_totalprice")) + 500).alias("price_cents"),
            "o_orderstatus",
        )
    )
    b, c = base.alias("b"), chg.alias("c")
    merged = (
        b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("c.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
            F.when(F.col("c.o_orderkey").isNull(), F.col("b.price_cents"))
            .otherwise(F.col("c.price_cents"))
            .alias("price_cents"),
            F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
                "o_orderstatus"
            ),
        )
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("price_cents").cast("long").alias("total_cents"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.price_cents, t.rk
    FROM {customer} c, LATERAL (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS price_cents,
               CAST(row_number() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rk
        FROM {orders} o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 3
    ) t
    WHERE c.c_custkey % 100 = 0
"""


@register(
    "lateral_top3_orders",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
    tags=("engine", "sql-surface", "lateral", "correlated", "topk"),
)
def lateral_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the per-row top-N SQL surface
    itself: each sampled customer's 3 most expensive orders via a
    correlated `LATERAL (... ORDER BY ... LIMIT 3)`.  The SAME query
    text runs through `spark.sql` and DuckDB (`topn_per_group` covers
    the DataFrame row_number route; this pins the SQL dialect corner a
    migrator's existing queries arrive in).  Spark 4 plans the lateral
    as a rewritten窗-free correlated join — DecorrelateInnerQuery turns
    it into a window + filter over one key-shuffle, NOT a per-customer
    loop, which is exactly the 100 TB-safe plan; the explicit
    row_number in the subquery doubles as the deterministic tie-break
    both engines share."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_lat_orders")
    return spark.sql(_LATERAL_SQL.format(customer="v_lat_customer", orders="v_lat_orders"))


_PROFILE_COLS = (
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
)


@register(
    "table_profile_lineitem",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_repr,
           CAST(max({c}) AS VARCHAR) AS max_repr
    FROM lineitem"""
        for c, _ in _PROFILE_COLS
    ),
    tags=("engine", "data-quality", "profiler", "unpivot"),
)
def table_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic TABLE PROFILER — the first query run against an unknown
    table: per-column row count, null count, distinct count, and
    min/max (rendered as strings so one result schema covers numeric
    and text columns alike).  The profile is computed in ONE scan: the
    columns unpivot via `stack` into (col_name, value_repr) rows and a
    single groupBy aggregates all six columns' stats — versus the naive
    six separate scans the oracle's UNION ALL spells (same answer,
    6x the IO; the unpivot shape is the one that survives a 100-column
    table at 100 TB).  Numeric min/max compare numerically BEFORE
    rendering (the string '9' > '10' trap), so numerics aggregate
    typed and render after."""
    li = _t(spark, sf_dir, "lineitem").select([c for c, _ in _PROFILE_COLS])
    # typed per-column pre-aggregation in one scan: for each column emit
    # (col_name, value-as-string for distinct, is_null, typed min/max
    # carried via separate conditional aggregates)
    stack_expr = "stack({n}, {args}) as (col_name, val_str, val_num)".format(
        n=len(_PROFILE_COLS),
        args=", ".join(
            (
                f"'{c}', cast({c} as string), cast({c} as double)"
                if kind == "num"
                else f"'{c}', cast({c} as string), cast(null as double)"
            )
            for c, kind in _PROFILE_COLS
        ),
    )
    kinds = {c: kind for c, kind in _PROFILE_COLS}
    num_cols = [c for c, k in _PROFILE_COLS if k == "num"]
    unp = li.select(F.expr(stack_expr))
    prof = unp.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val_str")).cast("long").alias("n_null"),
        F.count_distinct("val_str").cast("long").alias("n_distinct"),
        F.min("val_str").alias("min_str"),
        F.max("val_str").alias("max_str"),
        F.min("val_num").alias("min_num"),
        F.max("val_num").alias("max_num"),
    )
    is_num = F.col("col_name").isin(num_cols)
    # numeric columns render like SQL's CAST(double AS VARCHAR)
    def _render(col):  # noqa: ANN001
        return F.when(
            col == col.cast("long").cast("double"),
            F.concat(col.cast("long").cast("string"), F.lit(".0")),
        ).otherwise(col.cast("string"))

    return prof.select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        F.when(is_num, _render(F.col("min_num"))).otherwise(F.col("min_str")).alias("min_repr"),
        F.when(is_num, _render(F.col("max_num"))).otherwise(F.col("max_str")).alias("max_repr"),
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
               lag(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS touch
        FROM events
    )
    SELECT COALESCE(touch, '(none)') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("engine", "attribution", "window", "ignore-nulls"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION — every purchase credited to the user's
    most recent PRECEDING non-purchase event (the marketing channel
    model): a lag(...) IGNORE NULLS window over each user's event-time
    stream, where non-purchase types project to themselves and
    purchases to NULL so consecutive purchases attribute through to the
    same touch.  Purchases with no prior event land in '(none)' —
    the unattributable bucket a real report must surface, not drop.
    One key-shuffle on user_id (bounded per-user partitions), one
    aggregation; (ts, event_id) ordering makes simultaneous events
    deterministic.  The engines' shared IGNORE NULLS semantics carry
    the whole query."""
    e = _t(spark, sf_dir, "events")
    # SQL's lag(...) IGNORE NULLS == last(..., ignorenulls) over the
    # strictly-preceding frame (the DataFrame API's lag has no
    # IGNORE NULLS variant)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")), ignorenulls=True
    ).over(w)
    s = e.select("user_id", "event_type", touch.alias("touch"))
    return (
        s.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("(none)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )
