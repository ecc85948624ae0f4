"""SQL-surface + data-management widening (round 6).

Capability corners a warehouse migrator expects that had no catalog
entry yet, each a declarative plan with a DuckDB oracle:

* sliding COUNT DISTINCT     ((user, day) dedup + bounded day->window
                              fan-out — neither engine allows DISTINCT
                              window aggregates)
* CDC changelog apply        (SCD1 MERGE via one full-outer join — the
                              write-side twin of `snapshot_cdc_diff`)
* LATERAL correlated join    (the SQL surface itself, one text planned
                              by both engines)
* generic table profiler     (per-column stats in ONE scan via unpivot)
* last-touch attribution     (IGNORE-NULLS window over the preceding
                              frame)
* Z-order layout audit       (Morton interleave + global_ntile file
                              assignment; per-file min-max spans — the
                              zone-map pruning quantity)
* fuzzy d<=1 self-join       (SymSpell deletion-neighborhood blocking,
                              exact recall by construction)
* array HOF surface          (transform/filter/aggregate/zip_with/
                              reverse/exists, q6-integer exact)
* dynamic-gap sessions       (per-event-class inactivity windows,
                              running-max merge semantics)
* Arrow Python UDTF          (LATERAL context-window chunking — the
                              1-row-in/N-rows-out imperative fan-out)
* spatial radius join        (grid cells + 3x3 neighborhood fan-out,
                              exact integer distance verify)
* group-median imputation    (exact per-group percentile fill + audit)
* prefix-filtered setsim     (SSJoin/PPJoin pigeonhole candidate rule)
* positional phrase search   (posting-list (doc, pos+1) self-join)
* changepoint detection      (one-level binary segmentation over
                              day-grain prefix sums)

Scale rule as everywhere in this package: shuffles key on real
high-cardinality columns, fan-outs are bounded constants, and nothing
collects unbounded rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import as_cents, round_det, utc_naive
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
    # typed per-column pre-aggregation in one scan: numeric columns stay
    # in the DOUBLE slot and string columns in the STRING slot (never
    # both) — distinct-counting numerics through their string rendering
    # was measured 3x slower at sf0.1 (wide-string hash dedup over ~600k
    # distinct prices); summing the two slot-local distinct counts is
    # exact because each group populates exactly one slot
    stack_expr = "stack({n}, {args}) as (col_name, val_str, val_num)".format(
        n=len(_PROFILE_COLS),
        args=", ".join(
            (
                f"'{c}', cast(null as string), cast({c} as double)"
                if kind == "num"
                else f"'{c}', cast({c} as string), cast(null as double)"
            )
            for c, kind in _PROFILE_COLS
        ),
    )
    num_cols = [c for c, k in _PROFILE_COLS if k == "num"]
    unp = li.select(F.expr(stack_expr))
    # explicit dedup-then-count: ONE shuffle keyed on (col, value) with
    # map-side partial counts, then a per-column rollup over the
    # distinct-value table.  (count_distinct here would be fine alone,
    # but any SECOND distinct aggregate makes Spark expand every input
    # row per aggregate — measured 2x the whole query; the manual
    # two-level form keeps one pass and also computes min/max over the
    # already-deduped values.)
    lvl1 = unp.groupBy("col_name", "val_str", "val_num").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is_present = F.col("val_str").isNotNull() | F.col("val_num").isNotNull()
    prof = lvl1.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(~is_present, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_null"),
        F.count(F.when(is_present, 1)).cast("long").alias("n_distinct"),
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


# --- Z-order layout audit --------------------------------------------------

_ZBITS = 8


def _interleave_expr(cust: str, day: str, intdiv: str) -> str:
    """Morton/Z-value bit interleave as pure div/mod arithmetic — the
    one integer formula both engines evaluate identically (`intdiv` is
    'div' for Spark SQL, '//' for DuckDB)."""
    terms = []
    for i in range(_ZBITS):
        p = 1 << i
        terms.append(f"(({cust} {intdiv} {p}) % 2) * {4 ** i}")
        terms.append(f"(({day} {intdiv} {p}) % 2) * {2 * 4 ** i}")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
    WITH d AS (
        SELECT o_orderkey,
               o_custkey % 256 AS cust,
               (epoch_us(o_orderdate) // 86400000000) % 256 AS day
        FROM orders
    ),
    z AS (
        SELECT o_orderkey, cust, day,
               {_interleave_expr('cust', 'day', '//')} AS zval
        FROM d
    ),
    l1 AS (
        SELECT cust, day, ntile(64) OVER (ORDER BY cust, o_orderkey) AS b FROM z
    ),
    l2 AS (
        SELECT cust, day, ntile(64) OVER (ORDER BY zval, o_orderkey) AS b FROM z
    ),
    s AS (
        SELECT 'custkey_sort' AS layout, b,
               max(cust) - min(cust) AS sc, max(day) - min(day) AS sd
        FROM l1 GROUP BY b
        UNION ALL
        SELECT 'zorder', b, max(cust) - min(cust), max(day) - min(day)
        FROM l2 GROUP BY b
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(sc) AS BIGINT) AS total_span_cust,
           CAST(sum(sd) AS BIGINT) AS total_span_day,
           CAST(max(sc) AS BIGINT) AS max_span_cust,
           CAST(max(sd) AS BIGINT) AS max_span_day
    FROM s GROUP BY layout
"""


@register(
    "layout_zorder_stats",
    oracle=_ZORDER_ORACLE,
    tags=("engine", "layout", "zorder", "data-skipping", "global-ntile"),
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER LAYOUT AUDIT — the multi-column data-skipping argument,
    measured inside the engine: interleave the bits of (custkey mod
    256, order-day mod 256) into a Morton z-value (pure div/mod
    arithmetic, no bit intrinsics, so both engines compute it
    identically), split the table into 64 equal-count 'files' under
    (a) a single-key custkey sort and (b) the z-value sort, and report
    each file's min-max SPAN per dimension — the exact quantity a
    min/max-zone-map file skipper prunes on.  The custkey sort gives
    perfect custkey spans and useless day spans (every file covers the
    whole day range); z-order bounds BOTH to ~sqrt regions — why
    Delta/Iceberg OPTIMIZE ZORDER exists.  File assignment rides
    `windows.global_ntile` (range repartition + broadcast offsets, no
    single-task sort — bit-equal to NTILE by its round-5 tests), so
    the audit itself is the layout job's real plan at any scale."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_ntile

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("cust"),
        ((F.unix_micros("o_orderdate") / F.lit(86_400_000_000)).cast("long") % 256).alias(
            "day"
        ),
    )
    z = o.withColumn("zval", F.expr(_interleave_expr("cust", "day", "div")))
    spans = None
    for layout, order_cols in (
        ("custkey_sort", ["cust", "o_orderkey"]),
        ("zorder", ["zval", "o_orderkey"]),
    ):
        b = global_ntile(z, order_cols, 64, out="b")
        s = b.groupBy("b").agg(
            (F.max("cust") - F.min("cust")).alias("sc"),
            (F.max("day") - F.min("day")).alias("sd"),
        ).select(F.lit(layout).alias("layout"), "sc", "sd")
        spans = s if spans is None else spans.unionByName(s)
    return spans.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("sc").cast("long").alias("total_span_cust"),
        F.sum("sd").cast("long").alias("total_span_day"),
        F.max("sc").cast("long").alias("max_span_cust"),
        F.max("sd").cast("long").alias("max_span_day"),
    )


# --- SymSpell-style fuzzy join ---------------------------------------------


@register(
    "fuzzy_join_deletion1",
    oracle="""
    WITH names AS (SELECT DISTINCT c_name AS name FROM customer),
    var AS (
        SELECT name,
               substring(name, 1, i - 1) || substring(name, i + 1) AS variant
        FROM names, unnest(generate_series(1, length(name))) AS g(i)
    ),
    cand AS (
        SELECT DISTINCT a.name AS name_a, b.name AS name_b
        FROM var a JOIN var b ON a.variant = b.variant AND a.name < b.name
        UNION
        SELECT DISTINCT v.name AS name_a, n.name AS name_b
        FROM var v JOIN names n ON v.variant = n.name AND v.name < n.name
        UNION
        SELECT DISTINCT n.name AS name_a, v.name AS name_b
        FROM var v JOIN names n ON v.variant = n.name AND n.name < v.name
    ),
    pairs AS (
        SELECT name_a, name_b FROM cand WHERE levenshtein(name_a, name_b) = 1
    ),
    deg AS (
        SELECT name, count(*) AS n_neighbors FROM (
            SELECT name_a AS name FROM pairs
            UNION ALL SELECT name_b FROM pairs
        ) GROUP BY name
    )
    SELECT CAST(n_neighbors AS BIGINT) AS n_neighbors,
           CAST(count(*) AS BIGINT) AS n_names
    FROM deg GROUP BY n_neighbors
    """,
    tags=("engine", "fuzzy-join", "symspell", "deletion-neighborhood", "edit-distance"),
)
def fuzzy_join_deletion1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY (edit-distance-1) SELF-JOIN without the n^2 cross join —
    the SymSpell deletion-neighborhood construction: every name emits
    its |name| single-character-deletion variants (a bounded map-side
    fan-out), candidates are pairs sharing a variant (substitutions:
    deleting the differing position from both sides collides) plus
    pairs where one name IS the other's variant (insertions/deletions),
    and only candidates are verified with the real `levenshtein` —
    exact distance-1 recall at O(n * len) candidate keys instead of
    O(n^2) comparisons, the spell-correction / entity-matching join at
    corpus scale.  (A shared variant does not imply distance 1 — 'ab'/
    'ba' collide at distance 2 — hence the verify filter; the blocking
    is complete BY CONSTRUCTION for distance <= 1, unlike the sorted-
    neighborhood heuristic in `entity_match_sorted_neighborhood`.)
    Customer names differing in one digit give a non-degenerate pair
    graph; output is the neighbor-count histogram — the 'how collision-
    prone is my key space' audit."""
    names = _t(spark, sf_dir, "customer").select(F.col("c_name").alias("name")).distinct()
    # Round-13 restructure (guide §2.3 "shuffle keys and metadata", §2.4;
    # round-12 verdict next-round #3 — the candidate-pair distinct was
    # 1.9 s of the 3.75 s decomposition).  Three shuffles leave the plan:
    #   1. the global var .distinct() — repeated characters (zero runs)
    #      emit IDENTICAL variants, but only WITHIN one name's own
    #      deletion array, so `array_distinct` before the explode dedups
    #      map-side (the word_shingles discipline) and the full
    #      (name, variant) string exchange disappears;
    #   2. the candidate joins key on xxhash64(variant) — 8 fixed bytes
    #      ride the exchange instead of the variant string.  Equal
    #      variants always collide (recall is preserved BY CONSTRUCTION);
    #      a 64-bit collision can only ADD a candidate pair, and the
    #      exact banded verify removes it — precision is restored exactly;
    #   3. the full-width candidate-pair .distinct() — the verify runs
    #      FIRST (banded levenshtein is map-side and cheap; round-12
    #      measured verify-before-distinct a wash while the distinct
    #      still followed), and dedup folds into count_distinct at the
    #      degree aggregation, which operates on the verified TRUE pairs
    #      (orders of magnitude fewer rows than the candidate set).
    var = names.select(
        "name",
        F.explode(F.expr(
            "array_distinct(transform(sequence(1, length(name)),"
            " i -> concat(substring(name, 1, i - 1), substring(name, i + 1))))"
        )).alias("variant"),
    )
    vh = var.select("name", F.xxhash64("variant").alias("vh"))
    a = vh.select(F.col("name").alias("name_a"), "vh")
    b = vh.select(F.col("name").alias("name_b"), "vh")
    sub_pairs = (
        a.join(b, "vh")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
    )
    n2 = names.select(F.col("name").alias("nm"), F.xxhash64("name").alias("vh"))
    indel = vh.join(n2, "vh").select(
        F.least(F.col("name"), F.col("nm")).alias("name_a"),
        F.greatest(F.col("name"), F.col("nm")).alias("name_b"),
    )
    pairs = (
        sub_pairs.unionByName(indel)
        # banded verify (round-12): levenshtein with threshold=1 runs the
        # O(band*n) early-exit DP and returns -1 past the band — the ==1
        # predicate is value-identical to the unbounded distance.  Also
        # kills every hash-collision false candidate (and the lev=0 self
        # rows a collision in the indel branch could fabricate).
        .filter(F.levenshtein("name_a", "name_b", 1) == 1)
    )
    deg = (
        pairs.select(F.col("name_a").alias("name"), F.col("name_b").alias("partner"))
        .unionByName(
            pairs.select(F.col("name_b").alias("name"), F.col("name_a").alias("partner"))
        )
        .groupBy("name")
        .agg(F.count_distinct("partner").alias("n_neighbors"))
    )
    return deg.groupBy(F.col("n_neighbors").cast("long").alias("n_neighbors")).agg(
        F.count(F.lit(1)).cast("long").alias("n_names")
    )


# --- array higher-order-function surface -----------------------------------


@register(
    "array_hof_surface",
    oracle="""
    WITH q AS (
        SELECT label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000000.0 + (0.5 + 1e-8)) AS BIGINT)) AS v
        FROM embeddings
    ),
    x AS (
        SELECT label,
               len(list_filter(v, e -> e > 0)) AS n_pos,
               list_aggregate(list_transform(v, e -> e * e), 'sum') AS q_norm2,
               list_aggregate(list_transform(generate_series(1, len(v)),
                                             i -> v[i] * v[len(v) + 1 - i]), 'sum') AS q_dotrev,
               CASE WHEN len(list_filter(v, e -> abs(e) > 500000)) > 0 THEN 1 ELSE 0 END AS has_extreme
        FROM q
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(n_pos) AS BIGINT) AS pos_elems_total,
           CAST(sum(q_norm2) AS BIGINT) AS q_norm2_total,
           CAST(sum(q_dotrev) AS BIGINT) AS q_dotrev_total,
           CAST(sum(has_extreme) AS BIGINT) AS n_has_extreme
    FROM x GROUP BY label
    """,
    tags=("engine", "sql-surface", "higher-order-functions", "arrays"),
)
def array_hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY HIGHER-ORDER FUNCTIONS as a first-class surface —
    transform / filter / aggregate / zip_with / reverse / exists over
    the embedding column, the JVM-side lambda toolkit that keeps
    vector math OUT of Python (`F.aggregate` et al. run inside
    whole-stage codegen; the Pandas-UDF route exists in `similarity`
    for kernels these cannot express).  Per vector: positive-element
    count (filter + size), exact q6-integer norm-squared (transform +
    aggregate), the dot product with its own REVERSAL (zip_with +
    reverse — the palindrome-correlation toy that exercises dual-array
    lambdas; the oracle computes it by index since DuckDB's zip names
    struct fields differently), and an exists-style extreme-value
    flag.  Elements quantize to q6 integers FIRST so every sum is
    exact under any partitioning.  Bounded output per label."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        F.expr(
            "transform(cast(embedding as array<double>),"
            " x -> cast(floor(x * 1000000.0 + (0.5 + 1e-8)) as bigint))"
        ).alias("v"),
    )
    x = q.select(
        "label",
        F.size(F.filter("v", lambda e_: e_ > 0)).alias("n_pos"),
        F.aggregate(
            F.transform("v", lambda e_: e_ * e_), F.lit(0).cast("long"), lambda acc, e_: acc + e_
        ).alias("q_norm2"),
        F.aggregate(
            F.zip_with("v", F.reverse("v"), lambda p, r: p * r),
            F.lit(0).cast("long"),
            lambda acc, e_: acc + e_,
        ).alias("q_dotrev"),
        F.exists("v", lambda e_: F.abs(e_) > 500000).cast("int").alias("has_extreme"),
    )
    return x.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("n_pos").cast("long").alias("pos_elems_total"),
        F.sum("q_norm2").cast("long").alias("q_norm2_total"),
        F.sum("q_dotrev").cast("long").alias("q_dotrev_total"),
        F.sum("has_extreme").cast("long").alias("n_has_extreme"),
    )


# --- dynamic-gap session windows -------------------------------------------


@register(
    "session_window_dynamic_gap",
    oracle="""
    WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               CASE WHEN event_type = 'error' THEN 600000000
                    ELSE 1800000000 END AS gap
        FROM events
    ),
    y AS (
        SELECT *, max(tus + gap) OVER (
                   PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        FROM x
    ),
    z AS (
        SELECT *, CASE WHEN prev_end IS NULL OR tus >= prev_end THEN 1 ELSE 0 END AS brk
        FROM y
    ),
    w AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) AS grp
        FROM z
    )
    SELECT user_id,
           min(tus) AS session_start_us,
           max(tus + gap) AS session_end_us,
           CAST(count(*) AS BIGINT) AS cnt
    FROM w GROUP BY user_id, grp
    """,
    tags=("engine", "session", "dynamic-gap", "T2-ext"),
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION WINDOWS WITH A PER-EVENT GAP — `session_window`'s dynamic
    form (`session_window_agg` covers the fixed 30-min gap): error
    events keep the session alive only 10 minutes, everything else 30 —
    the per-event-class inactivity policy real clickstream sessionizers
    need (an error burst should not glue two browsing sessions
    together).  Semantics under merge: each event extends its session
    to ts + gap(event) and windows merge while they overlap, so the
    session end is the RUNNING MAX of per-event ends, not the last
    event's end — exactly what the oracle's gaps-and-islands replay
    computes (break when ts >= max over preceding of (ts + gap)).
    Same one-key-shuffle plan as the fixed-gap query."""
    e = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "cnt",
        )
    )


# --- Python UDTF (Spark 4 API surface): context-window chunking ------------


@register(
    "udtf_chunk_text",
    oracle="""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    c AS (
        SELECT doc_id, ws, unnest(generate_series(0, (len(ws) - 1) // 10)) AS chunk_id
        FROM w WHERE len(ws) > 0
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(LEAST(10, len(ws) - chunk_id * 10) AS INT) AS n_tokens,
           ws[chunk_id * 10 + 1] AS first_word,
           ws[LEAST(len(ws), chunk_id * 10 + 10)] AS last_word
    FROM c
    """,
    tags=("engine", "udtf", "spark4-surface", "chunking", "mlprep"),
)
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4's user-defined TABLE function, Arrow-
    optimized) doing CONTEXT-WINDOW CHUNKING — the document -> training-
    context split every LLM data pipeline runs: each document explodes
    into 10-token chunks (last chunk ragged) via a lateral UDTF call in
    SQL (`FROM docs, LATERAL chunk_text(text)`), the one-row-in/N-rows-
    out shape scalar UDFs cannot express and explode-based rewrites
    express awkwardly when the expansion logic is imperative.  The UDTF
    runs with `useArrow=True` (batched Arrow transfer, keeping the
    catalog's no-row-at-a-time-pickling rule); the chunk rule itself is
    deterministic, so the DuckDB oracle replays it with generate_series
    over the word array.  At 100 TB this is a map-side fan-out — no
    shuffle until whatever aggregates the chunks."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_tokens int, first_word string, last_word string", useArrow=True)
    class ChunkText:
        def eval(self, text: str):
            words = [w for w in (text or "").split(" ") if w]
            for i in range(0, len(words), 10):
                chunk = words[i : i + 10]
                yield i // 10, len(chunk), chunk[0], chunk[-1]

    spark.udtf.register("rtbd_chunk_text", ChunkText)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("v_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.n_tokens, c.first_word, c.last_word "
        "FROM v_udtf_docs d, LATERAL rtbd_chunk_text(d.text) c"
    )


# --- spatial grid-bucketed neighbor join -----------------------------------

_SPATIAL_COORDS = """
        SELECT c_custkey AS pid,
               (c_custkey * 2654435761) % 4294967296 % 30000 AS x,
               (c_custkey * 40503 + 2654435761) % 4294967296 % 30000 AS y
        FROM customer
"""


@register(
    "spatial_grid_neighbor_join",
    oracle=f"""
    WITH p AS ({_SPATIAL_COORDS}),
    pairs AS (
        SELECT a.pid AS pid_a, b.pid AS pid_b
        FROM p a JOIN p b
          ON a.pid < b.pid
         AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 250000
    ),
    deg AS (
        SELECT pid, count(*) AS n_neighbors FROM (
            SELECT pid_a AS pid FROM pairs UNION ALL SELECT pid_b FROM pairs
        ) GROUP BY pid
    )
    SELECT CAST(n_neighbors AS BIGINT) AS n_neighbors,
           CAST(count(*) AS BIGINT) AS n_points
    FROM deg GROUP BY n_neighbors
    """,
    tags=("engine", "spatial", "grid-join", "radius-search"),
)
def spatial_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL RADIUS SELF-JOIN via grid bucketing — the geo family's
    missing core: points within distance r of each other, found by
    hashing each point to an r-sized grid cell and joining each point's
    cell against its 3x3 CELL NEIGHBORHOOD (one side fans out 9 cell
    keys — a bounded map-side explode — the other stays put), then
    verifying exact squared distance.  Every true pair lies in adjacent
    cells BY CONSTRUCTION (two points <= r apart differ by < 1 cell per
    axis), so recall is exact with O(n * density) candidates, never the
    n^2 cross join the ORACLE deliberately runs as the independent
    check (feasible at oracle scale; the grid plan is what survives
    100 TB).  Coordinates derive from the custkey via Knuth
    multiplicative hashes — pure BIGINT arithmetic both engines compute
    identically.  Output is the neighbor-count histogram."""
    c = _t(spark, sf_dir, "customer")
    p = c.select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 2654435761) % 4294967296 % 30000).alias("x"),
        ((F.col("c_custkey") * 40503 + 2654435761) % 4294967296 % 30000).alias("y"),
    )
    r = 500
    cell = lambda v: (v / F.lit(r)).cast("long")  # noqa: E731
    a = p.select(
        F.col("pid").alias("pid_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        cell(F.col("x")).alias("cx"),
        cell(F.col("y")).alias("cy"),
    )
    # fan side: each point claims its 3x3 neighborhood
    b = (
        p.select(
            F.col("pid").alias("pid_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            cell(F.col("x")).alias("cx0"),
            cell(F.col("y")).alias("cy0"),
        )
        .select(
            "pid_b",
            "xb",
            "yb",
            F.explode(
                F.expr("sequence(cx0 - 1, cx0 + 1)")
            ).alias("cx"),
            "cy0",
        )
        .select(
            "pid_b", "xb", "yb", "cx", F.explode(F.expr("sequence(cy0 - 1, cy0 + 1)")).alias("cy")
        )
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    pairs = (
        a.join(b, ["cx", "cy"])
        .filter(F.col("pid_a") < F.col("pid_b"))
        .filter(d2 <= r * r)
        .select("pid_a", "pid_b")
    )
    deg = (
        pairs.select(F.col("pid_a").alias("pid"))
        .unionByName(pairs.select(F.col("pid_b").alias("pid")))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
    return deg.groupBy(F.col("n_neighbors").cast("long").alias("n_neighbors")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )


# --- group-median imputation -----------------------------------------------


@register(
    "impute_group_median",
    oracle="""
    WITH x AS (
        SELECT event_type, value,
               CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS v
        FROM events
    ),
    med AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med
        FROM x WHERE v IS NOT NULL GROUP BY event_type
    )
    SELECT x.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(x.v) AS BIGINT) AS n_imputed,
           ROUND(med.med + 1e-8, 4) AS imputed_value,
           ROUND(sum(COALESCE(x.v, med.med)) / count(*) + 1e-8, 4) AS mean_after_impute
    FROM x JOIN med ON x.event_type = med.event_type
    GROUP BY x.event_type, med.med
    """,
    tags=("engine", "data-quality", "imputation", "median"),
)
def impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-MEDIAN IMPUTATION — the standard numeric-repair step of a
    feature pipeline: nulls (synthesized deterministically: every 17th
    event's value treated as missing) are filled with their GROUP's
    exact median, never a global constant (per-type value regimes
    differ — a global fill biases every group).  Plan: one hash agg
    computes each group's exact `percentile` over the present values
    (per-group sort inside the agg, no global order), the bounded
    per-group median frame broadcasts back onto the fact rows, and the
    audit aggregates in the same pass — the fact table is scanned
    twice, shuffled once.  Output pins the count imputed, the fill
    value, and the post-impute mean per group."""
    e = _t(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        F.when(F.col("event_id") % 17 == 0, F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    med = (
        x.filter(F.col("v").isNotNull())
        .groupBy("event_type")
        .agg(F.expr("percentile(v, 0.5)").alias("med"))
    )
    return (
        x.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count("v")).cast("long").alias("n_imputed"),
            round_det(
                F.sum(F.coalesce(F.col("v"), F.col("med"))) / F.count(F.lit(1)), 4
            ).alias("mean_after_impute"),
        )
        .select(
            "event_type",
            "n_rows",
            "n_imputed",
            round_det(F.col("med"), 4).alias("imputed_value"),
            "mean_after_impute",
        )
    )


# --- prefix-filtered set-similarity join (SSJoin/PPJoin family) ------------


@register(
    "setsim_prefix_filter_join",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    idx AS (
        SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
        FROM w WHERE len(ws) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
        FROM idx
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) + 1e-8, 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) + 1e-8, 6) >= 0.5
    """,
    tags=("engine", "dedup", "setsim", "prefix-filter", "ppjoin"),
)
def setsim_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX-FILTERED set-similarity join (the SSJoin/PPJoin candidate
    rule) — the third candidate-generation strategy in the near-dup
    family, next to full shingle joining (`dedup_ngram_jaccard`) and
    MinHash banding (`dedup_minhash_lsh`): order each document's
    shingles GLOBALLY RAREST-FIRST (ascending document frequency, tie
    on the shingle), keep only the first |d| - ceil(t*|d|) + 1 as join
    keys, and join on those.  Pigeonhole guarantee: two sets with
    Jaccard >= t overlap in more than |d| - prefix elements, so they
    MUST share a prefix element — exact recall, but candidates now key
    on the RARE end of the Zipf curve, so the hot-shingle buckets that
    dominate the full join's shuffle disappear.  Candidates verify with
    the exact intersection (join restricted to candidate pairs).  The
    oracle is the unfiltered quadratic-candidate plan — equality proves
    the prefix rule lost nothing at t=0.5.  100 TB note: prefix length
    shrinks as t grows (t=0.9 -> ~10% of shingles join), the knob that
    makes high-threshold dedup cheap."""
    t = 0.5
    docs = _t(spark, sf_dir, "documents")
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, k=3)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # Round-13 restructure (guide §2.3/§2.4, round-12 verdict next-round
    # #3): ONE doc-keyed aggregation replaces the per-doc rank WINDOW
    # (exchange + sort), the separate sizes aggregation (+ two closing
    # joins), and the exploded posting-list verify.  `array_sort` over
    # (df, shingle) structs IS the rarest-first total order the window
    # produced (struct ordering = lexicographic on fields; shingle is
    # unique within a doc, so the order is total and identical to
    # row_number over ORDER BY df, shingle); the prefix is a slice, the
    # set size is the array length, and the exact intersection is
    # `array_intersect` on the per-doc shingle arrays (distinct by
    # construction in word_shingles).  The verify now shuffles each
    # doc's bounded shingle array once per side instead of candidate ×
    # posting-list rows — at 100 TB the candidate-pair explosion never
    # rides an exchange.  Arrays are doc-length-bounded, the same
    # per-doc state bound the minhash signature build carries.
    base = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("p"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    plen = (F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1).cast("int")
    prefix = base.select(
        "doc_id", F.explode(F.slice("p", F.lit(1), plen)).alias("s")
    ).select("doc_id", F.col("s.shingle").alias("shingle"))
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    arrs = base.select(
        "doc_id", F.expr("transform(p, x -> x.shingle)").alias("ws"), "sz"
    )
    wa = arrs.select(
        F.col("doc_id").alias("id_a"), F.col("ws").alias("ws_a"), F.col("sz").alias("sz_a")
    )
    wb = arrs.select(
        F.col("doc_id").alias("id_b"), F.col("ws").alias("ws_b"), F.col("sz").alias("sz_b")
    )
    inter_c = F.size(F.array_intersect("ws_a", "ws_b")).cast("long")
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .select("id_a", "id_b", "sz_a", "sz_b", inter_c.alias("inter"))
        .filter(round_det(jac, 6) >= t)
        .select("id_a", "id_b", round_det(jac, 6).alias("jaccard"))
    )


# --- positional inverted index + phrase query ------------------------------


@register(
    "phrase_search_postings",
    oracle="""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    hits AS (
        SELECT doc_id,
               len(list_filter(generate_series(1, len(ws) - 1),
                               i -> ws[i] = 'table' AND ws[i + 1] = 'hash')) AS n
        FROM w WHERE len(ws) >= 2
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_occurrences
    FROM hits WHERE n > 0
    """,
    tags=("engine", "search", "postings", "phrase", "inverted-index"),
)
def phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHRASE QUERY over a POSITIONAL inverted index — the search-engine
    primitive BM25 ranking (`bm25_search_topk`) sits on top of: build
    (term, doc, position) postings, then answer the phrase "table hash"
    by SELF-JOINING the two terms' posting lists on (doc, pos + 1 = pos)
    — adjacency via the index, never a rescan of the text.  This is how
    phrase search scales: the join touches only the two terms' postings
    (Zipf-bounded slices of the corpus), and a k-word phrase chains
    k-1 such joins.  The oracle recomputes adjacency directly on the
    word arrays; equality proves the postings construction preserves
    positions exactly."""
    docs = _t(spark, sf_dir, "documents")
    post = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda x: x != F.lit(""))).alias(
            "pos", "term"
        ),
    )
    t1 = post.filter(F.col("term") == "table").select("doc_id", F.col("pos").alias("p1"))
    t2 = post.filter(F.col("term") == "hash").select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
    )
    return (
        t1.join(t2, (t1.doc_id == t2.d2) & (t1.p1 + 1 == t2.p2))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )


# --- changepoint detection (binary segmentation, one level) ----------------


@register(
    "changepoint_binary_segmentation",
    oracle="""
    WITH d AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(round(value * 100, 0) AS BIGINT)
                 + CASE WHEN epoch_us(ts) // 86400000000 >= 19737 THEN 4000 ELSE 0 END AS cents
        FROM events
    ),
    g AS (
        SELECT event_type, day,
               CAST(sum(cents) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        FROM d GROUP BY 1, 2
    ),
    p AS (
        SELECT event_type, day, s, n,
               sum(s) OVER w AS cs, sum(n) OVER w AS cn,
               sum(s) OVER t AS ts_, sum(n) OVER t AS tn,
               row_number() OVER w AS rk,
               count(*) OVER t AS nd
        FROM g
        WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING),
               t AS (PARTITION BY event_type)
    ),
    gains AS (
        SELECT event_type, day,
               (CAST(cs AS DOUBLE) * cs) / cn
                 + (CAST(ts_ - cs AS DOUBLE) * (ts_ - cs)) / (tn - cn)
                 - (CAST(ts_ AS DOUBLE) * ts_) / tn AS gain,
               cs, cn, ts_, tn
        FROM p WHERE rk < nd
    )
    SELECT event_type,
           CAST(day AS BIGINT) AS split_day,
           ROUND(gain / 10000.0 + 1e-8, 2) AS gain_dollars2,
           ROUND(cs / (100.0 * cn) + 1e-8, 4) AS mean_before,
           ROUND((ts_ - cs) / (100.0 * (tn - cn)) + 1e-8, 4) AS mean_after
    FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY gain DESC, day) AS r
        FROM gains
    ) WHERE r = 1
    """,
    tags=("engine", "changepoint", "timeseries", "prefix-sum"),
)
def changepoint_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGEPOINT DETECTION — one level of binary segmentation, the
    batch twin of the streaming CUSUM operator (`stateful.cusum_stream`
    detects drift online; this LOCATES the break offline): per event
    type, choose the day boundary maximizing the variance-reduction
    gain S_L^2/n_L + S_R^2/n_R - S^2/n over the daily series (the
    classic L2 segmentation objective; recursing on each side yields
    multi-changepoint segmentation, each level one more pass over the
    day-grain table).  A deterministic +40.00 level shift is planted
    mid-series (day >= 19737) so the argmax is signal, not noise — and
    the detector must recover exactly that boundary.  Scale shape: the
    raw events collapse to (type, day) in ONE shuffle; prefix sums run
    over the BOUNDED day-grain frame (a window over ~30 rows per type,
    nothing data-sized); gains are exact-integer-fed doubles; argmax is
    a row_number over the same bounded frame.  The planted step also
    doubles as an audit: mean_after - mean_before must straddle +40."""
    e = _t(spark, sf_dir, "events")
    day = (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long")
    d = e.select(
        "event_type",
        day.alias("day"),
        (as_cents(F.col("value")) + F.when(day >= 19737, F.lit(4000)).otherwise(F.lit(0))).alias(
            "cents"
        ),
    )
    g = d.groupBy("event_type", "day").agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = Window.partitionBy("event_type")
    p = g.select(
        "event_type",
        "day",
        F.sum("s").over(w).alias("cs"),
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(t).alias("ts_"),
        F.sum("n").over(t).alias("tn"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")).alias("rk"),
        F.count(F.lit(1)).over(t).alias("nd"),
    ).filter(F.col("rk") < F.col("nd"))
    gain = (
        (F.col("cs").cast("double") * F.col("cs")) / F.col("cn")
        + (F.col("ts_") - F.col("cs")).cast("double") * (F.col("ts_") - F.col("cs"))
        / (F.col("tn") - F.col("cn"))
        - (F.col("ts_").cast("double") * F.col("ts_")) / F.col("tn")
    )
    ranked = p.select(
        "event_type", "day", gain.alias("gain"), "cs", "cn", "ts_", "tn"
    ).withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.col("gain").desc(), "day")
        ),
    )
    return ranked.filter(F.col("r") == 1).select(
        "event_type",
        F.col("day").cast("long").alias("split_day"),
        round_det(F.col("gain") / 10000.0, 2).alias("gain_dollars2"),
        round_det(F.col("cs") / (100.0 * F.col("cn")), 4).alias("mean_before"),
        round_det(
            (F.col("ts_") - F.col("cs")) / (100.0 * (F.col("tn") - F.col("cn"))), 4
        ).alias("mean_after"),
    )


# --- error-tolerant parsing (try_cast family) -------------------------------


@register(
    "try_cast_dirty_parse",
    oracle="""
    WITH raw AS (
        SELECT event_id, event_type,
               CASE event_id % 5
                 WHEN 0 THEN CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR)
                 WHEN 1 THEN ' ' || CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR) || ' '
                 WHEN 2 THEN CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR) || 'c'
                 WHEN 3 THEN 'N/A'
                 ELSE ''
               END AS cents_str
        FROM events
    ),
    parsed AS (
        SELECT event_type, TRY_CAST(trim(cents_str) AS BIGINT) AS cents FROM raw
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(cents) AS BIGINT) AS n_parsed,
           CAST(count(*) - count(cents) AS BIGINT) AS n_rejected,
           CAST(sum(cents) AS BIGINT) AS cents_total
    FROM parsed GROUP BY event_type
    """,
    tags=("engine", "data-quality", "try-cast", "dirty-data"),
)
def try_cast_dirty_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERROR-TOLERANT PARSING — the ingest reality every pipeline meets:
    a numeric column arriving as strings that are clean, padded,
    unit-suffixed, sentinel ('N/A'), or empty (synthesized
    deterministically by event_id mod 5 so both engines see identical
    bytes).  `try_cast` turns each failure into NULL instead of a job
    abort — ANSI mode's safe-parse escape hatch, the semantic twin of
    the dead-letter split in the streaming path (S4) applied
    column-wise.  `trim` first (padding is recoverable; suffixes and
    sentinels are not), then one aggregation audits parsed/rejected
    counts and the exact parsed total per group.  Pure map + one
    shuffle at any scale."""
    e = _t(spark, sf_dir, "events")
    cents = as_cents(F.col("value")).cast("string")
    raw = e.select(
        "event_type",
        F.when(F.col("event_id") % 5 == 0, cents)
        .when(F.col("event_id") % 5 == 1, F.concat(F.lit(" "), cents, F.lit(" ")))
        .when(F.col("event_id") % 5 == 2, F.concat(cents, F.lit("c")))
        .when(F.col("event_id") % 5 == 3, F.lit("N/A"))
        .otherwise(F.lit(""))
        .alias("cents_str"),
    )
    parsed = raw.select(
        "event_type", F.expr("try_cast(trim(cents_str) as bigint)").alias("cents")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("cents").cast("long").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("cents")).cast("long").alias("n_rejected"),
        F.sum("cents").cast("long").alias("cents_total"),
    )


# --- FILTER-clause aggregates (one-scan segmented rollup) -------------------

_FILTERED_AGG_SQL = """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS finished_cents,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                FILTER (WHERE o_custkey % 2 = 0) AS BIGINT) AS even_cust_cents
    FROM {orders}
    GROUP BY o_orderpriority
"""


@register(
    "filtered_aggregates_sql",
    oracle=_FILTERED_AGG_SQL.format(orders="orders"),
    tags=("engine", "sql-surface", "filter-clause", "segmented-agg"),
)
def filtered_aggregates_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI FILTER clause — five differently-conditioned aggregates
    in ONE scan and ONE hash agg, the idiom that replaces both the
    5-way self-join and the CASE-WHEN-wrapped sums a migrator's
    reports are full of.  Runs the SAME SQL text through `spark.sql`
    and DuckDB (`lateral_top3_orders`' dialect-surface contract); Spark
    compiles each FILTER into the aggregate's own predicate, so the
    fact table is read once regardless of how many segments the report
    slices."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_fagg_orders")
    return spark.sql(_FILTERED_AGG_SQL.format(orders="v_fagg_orders"))


# --- map-typed column + map higher-order functions --------------------------


@register(
    "map_hof_surface",
    oracle="""
    WITH m AS (
        SELECT event_type,
               user_id % 5 AS a, user_id % 7 AS b, user_id % 11 AS c
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum((a > 2)::INT + (b > 2)::INT + (c > 2)::INT) AS BIGINT) AS kept_entries,
           CAST(sum(a + b + c) AS BIGINT) AS value_total,
           CAST(sum(CASE WHEN a > 2 THEN a ELSE 0 END
                  + CASE WHEN b > 2 THEN b ELSE 0 END
                  + CASE WHEN c > 2 THEN c ELSE 0 END) AS BIGINT) AS kept_total
    FROM m GROUP BY event_type
    """,
    tags=("engine", "sql-surface", "map-type", "higher-order-functions"),
)
def map_hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed columns + map higher-order functions — the key-value
    payload surface (`array_hof_surface` covers arrays): build a real
    `map<string,bigint>` per row, then `map_filter` (keep entries with
    value > 2), `map_values` + `aggregate` for totals, and `size` for
    entry counts — all JVM-side lambdas over the map type.  The oracle
    replays the same arithmetic on the flat columns (DuckDB's MAP
    lambda surface differs; the CONTENT is what must match), so the
    hash pins that Spark's map construction/filter/fold semantics
    compute exactly the declared per-entry rule.  Pure map stage + one
    aggregation."""
    e = _t(spark, sf_dir, "events")
    m = e.select(
        "event_type",
        F.create_map(
            F.lit("a"), F.col("user_id") % 5,
            F.lit("b"), F.col("user_id") % 7,
            F.lit("c"), F.col("user_id") % 11,
        ).alias("kv"),
    )
    kept = F.map_filter("kv", lambda k, v: v > 2)
    fold = lambda mp: F.aggregate(  # noqa: E731
        F.map_values(mp), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    x = m.select(
        "event_type",
        F.size(kept).alias("n_kept"),
        fold(F.col("kv")).alias("total"),
        fold(kept).alias("kept_total"),
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("n_kept").cast("long").alias("kept_entries"),
        F.sum("total").cast("long").alias("value_total"),
        F.sum("kept_total").cast("long").alias("kept_total"),
    )


# --- collation-aware semantics (Spark 4 surface) ----------------------------


@register(
    "collation_caseinsensitive_stats",
    oracle="""
    WITH s AS (
        SELECT event_id,
               CASE WHEN event_id % 3 = 0 THEN upper(event_type)
                    WHEN event_id % 3 = 1 THEN event_type
                    ELSE concat(upper(substring(event_type, 1, 1)),
                                substring(event_type, 2))
               END AS label
        FROM events
    )
    SELECT CAST(count(DISTINCT label) AS BIGINT) AS n_distinct_binary,
           CAST(count(DISTINCT lower(label)) AS BIGINT) AS n_distinct_ci,
           CAST(count(*) FILTER (WHERE lower(label) = 'purchase') AS BIGINT)
               AS n_purchase_ci,
           CAST(count(*) FILTER (WHERE label = 'purchase') AS BIGINT)
               AS n_purchase_binary
    FROM s
    """,
    tags=("engine", "collation", "spark4-surface", "case-insensitive"),
)
def collation_caseinsensitive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-aware comparison (Spark 4's `collate`/UTF8_LCASE) —
    case-insensitive equality as a COLUMN TYPE PROPERTY instead of
    `lower()` scattered through every predicate: the label column
    (deterministically case-mangled three ways) is compared and
    DISTINCT-counted under both BINARY and UTF8_LCASE collations in one
    pass.  Under UTF8_LCASE the three casings of each type collapse to
    one distinct value and match the literal regardless of its case;
    under BINARY they stay separate — both facts value-hash-pinned.
    The oracle expresses the same semantics via lower() (DuckDB's
    collation surface differs; the SEMANTICS are the contract).  Why
    it matters at 100 TB: a collated column comparison stays a hash
    join/agg key with no wrapping expression, so Catalyst can still
    prune/push/broadcast on it — `lower()`-wrapped keys lose stats and
    pushdown."""
    e = _t(spark, sf_dir, "events")
    label = (
        F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("event_id") % 3 == 1, F.col("event_type"))
        .otherwise(F.initcap("event_type"))
    )
    s = e.select(label.alias("label"))
    ci = F.collate(F.col("label"), "UTF8_LCASE")
    return s.agg(
        F.count_distinct(F.col("label")).cast("long").alias("n_distinct_binary"),
        F.count_distinct(ci).cast("long").alias("n_distinct_ci"),
        F.count(F.when(ci == F.lit("purchase"), 1)).cast("long").alias("n_purchase_ci"),
        F.count(F.when(F.col("label") == F.lit("purchase"), 1))
        .cast("long")
        .alias("n_purchase_binary"),
    )


# --- XML ingestion (Spark 4 from_xml) ---------------------------------------


@register(
    "xml_ingest_extract",
    oracle="""
    WITH x AS (
        SELECT event_id,
               '<reading sensor="s' || CAST(user_id % 50 AS VARCHAR)
                 || '"><temp>' || CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR)
                 || '</temp><seq>' || CAST(event_id AS VARCHAR) || '</seq></reading>'
               AS payload
        FROM events
    )
    SELECT regexp_extract(payload, 'sensor="([^"]+)"', 1) AS sensor,
           CAST(count(*) AS BIGINT) AS n_readings,
           CAST(sum(CAST(regexp_extract(payload, '<temp>(-?[0-9]+)</temp>', 1) AS BIGINT))
                AS BIGINT) AS temp_cents_total,
           CAST(max(CAST(regexp_extract(payload, '<seq>([0-9]+)</seq>', 1) AS BIGINT))
                AS BIGINT) AS max_seq
    FROM x GROUP BY 1
    """,
    tags=("engine", "xml", "spark4-surface", "semi-structured"),
)
def xml_ingest_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML INGESTION via Spark 4's native `from_xml` — the third
    semi-structured decoder next to JSON (`json_props_stats`) and
    VARIANT (`props_variant_*`): industrial feeds (SCADA, finance
    FpML, health HL7) still arrive as XML, and the engine parses it
    JVM-side with a declared schema — attribute (`_sensor`) and
    element (`temp`, `seq`) extraction typed at parse time.  The
    payload is synthesized deterministically from event columns (both
    engines build identical bytes); DuckDB has no XML reader, so the
    oracle extracts the same fields by regexp — parser-independent
    agreement on the decoded CONTENT.  Pure map + one shuffle."""
    e = _t(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('<reading sensor="s'),
        (F.col("user_id") % 50).cast("string"),
        F.lit('"><temp>'),
        as_cents(F.col("value")).cast("string"),
        F.lit("</temp><seq>"),
        F.col("event_id").cast("string"),
        F.lit("</seq></reading>"),
    )
    parsed = e.select(
        F.from_xml(
            payload, "struct<_sensor:string, temp:bigint, seq:bigint>"
        ).alias("r")
    )
    return parsed.groupBy(F.col("r._sensor").alias("sensor")).agg(
        F.count(F.lit(1)).cast("long").alias("n_readings"),
        F.sum("r.temp").cast("long").alias("temp_cents_total"),
        F.max("r.seq").cast("long").alias("max_seq"),
    )


# --- null-preserving explode semantics ---------------------------------------


@register(
    "explode_outer_surface",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN []
                    WHEN o_orderkey % 3 = 1 THEN [o_orderkey % 10]
                    ELSE [o_orderkey % 10, o_orderkey % 7]
               END AS tags
        FROM orders
    ),
    inner_x AS (
        SELECT count(*) AS n FROM base, unnest(tags) AS u(tag)
    ),
    outer_x AS (
        SELECT base.o_orderkey, u.tag
        FROM base LEFT JOIN unnest(tags) AS u(tag) ON TRUE
    )
    SELECT CAST((SELECT n FROM inner_x) AS BIGINT) AS n_inner_rows,
           CAST(count(*) AS BIGINT) AS n_outer_rows,
           CAST(count(*) - count(tag) AS BIGINT) AS n_null_padded,
           CAST(sum(tag) AS BIGINT) AS tag_total
    FROM outer_x
    """,
    tags=("engine", "sql-surface", "explode-outer", "null-semantics"),
)
def explode_outer_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLODE vs EXPLODE_OUTER — the silent-row-loss trap: a plain
    explode DROPS rows whose array is empty (a third of the synthesized
    tag arrays here), so any per-parent accounting downstream quietly
    undercounts; explode_outer keeps them as one null-padded row, the
    LEFT-JOIN-unnest semantics a fan-out that must preserve parents
    needs.  Both row counts, the null-padding count, and the exploded
    value total land in one hashed result, pinning the semantic
    difference (inner = outer - padded).  The oracle spells the two
    semantics as CROSS vs LEFT JOIN unnest."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.array().cast("array<bigint>"))
        .when(F.col("o_orderkey") % 3 == 1, F.array(F.col("o_orderkey") % 10))
        .otherwise(F.array(F.col("o_orderkey") % 10, F.col("o_orderkey") % 7))
        .alias("tags"),
    )
    n_inner = base.select(F.explode("tags").alias("tag")).count()
    outer = base.select(F.explode_outer("tags").alias("tag"))
    return outer.agg(
        F.lit(n_inner).cast("long").alias("n_inner_rows"),
        F.count(F.lit(1)).cast("long").alias("n_outer_rows"),
        (F.count(F.lit(1)) - F.count("tag")).cast("long").alias("n_null_padded"),
        F.sum("tag").cast("long").alias("tag_total"),
    )


# --- bitmap exact-distinct rollup (Spark 4 bitmap functions) ----------------


@register(
    "bitmap_distinct_users",
    oracle="""
    WITH d AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day, user_id FROM events
    ),
    daily AS (
        SELECT event_type, day, count(DISTINCT user_id) AS day_users FROM d GROUP BY 1, 2
    ),
    total AS (
        SELECT event_type, count(DISTINCT user_id) AS total_users FROM d GROUP BY 1
    )
    SELECT t.event_type,
           CAST(t.total_users AS BIGINT) AS total_users,
           CAST(sum(dl.day_users) AS BIGINT) AS sum_daily_users
    FROM total t JOIN daily dl ON t.event_type = dl.event_type
    GROUP BY t.event_type, t.total_users
    """,
    tags=("engine", "bitmap", "exact-distinct", "mergeable", "spark4-surface"),
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via BITMAPS (Spark 4's bitmap_* family) —
    the warehouse rollup trick between naive count-distinct and
    HLL sketches (`distinct_users_hll_daily`): per (type, day, bucket)
    each user sets one BIT (`bitmap_bit_position` within
    `bitmap_bucket_number` buckets), daily bitmaps OR together
    losslessly (`bitmap_or_agg`), and `bitmap_count` reads the exact
    cardinality back — so the day-grain table is MERGEABLE like a
    sketch but with zero error: the total per type is computed by
    OR-ing the PERSISTED daily bitmaps, never rescanning the events.
    At 100 TB this is the nightly-rollup pattern: the raw scan happens
    once per day partition; every wider rollup (week, month, total)
    folds bitmaps.  The oracle computes both grains with plain
    COUNT(DISTINCT) — equality proves the bitmap algebra is exact,
    including users spanning many days and bucket boundaries."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
        "user_id",
    )
    daily = d.groupBy(
        "event_type", "day", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    per_day = daily.groupBy("event_type", "day").agg(
        F.sum(F.bitmap_count("bm")).alias("day_users")
    )
    total = (
        daily.groupBy("event_type", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("total_users"))
    )
    return total.join(per_day, "event_type").groupBy(
        "event_type", F.col("total_users").cast("long").alias("total_users")
    ).agg(F.sum("day_users").cast("long").alias("sum_daily_users")).select(
        "event_type", "total_users", "sum_daily_users"
    )


# --- UDTF with TABLE argument (partitioned-input table function) ------------


@register(
    "udtf_longest_streak",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts), event_id) AS grp
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type,
               count(*) AS run_len, min(us) AS start_us
        FROM s GROUP BY user_id, event_type, grp
    )
    SELECT user_id,
           CAST(run_len AS BIGINT) AS streak_len,
           event_type AS streak_type,
           CAST(start_us AS BIGINT) AS streak_start_us
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY run_len DESC, start_us) AS r
        FROM runs
    ) WHERE r = 1
    """,
    tags=("engine", "udtf", "table-argument", "spark4-surface", "streaks"),
)
def udtf_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over a TABLE ARGUMENT — `FROM streaks(TABLE(events)
    PARTITION BY user_id ORDER BY ts)`: the engine hands the UDTF each
    user's rows IN ORDER and calls `terminate()` at partition end, the
    fourth Python-compute surface next to pandas_udf, mapInPandas/
    applyInPandas(WithState), and the lateral UDTF — and the one whose
    shape matches imperative per-entity walks (the fold here: longest
    consecutive same-event-type streak, first-reached on ties).  The
    partitioning/ordering contract is the ENGINE's (one shuffle on
    user_id, sort within partition), not the UDTF's — exactly how a
    per-entity sequential pass scales.  The oracle recomputes streaks
    with the gaps-and-islands double row_number; equality pins both the
    fold AND Spark's partition/order delivery."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "user_id long, streak_len long, streak_type string, streak_start_us long"
        )
    )
    class LongestStreak:
        def __init__(self):
            self.user = None
            self.cur_type = None
            self.cur_len = 0
            self.cur_start = 0
            self.best_len = 0
            self.best_type = None
            self.best_start = 0

        def eval(self, row):
            self.user = row["user_id"]
            t, us = row["event_type"], row["us"]
            if t == self.cur_type:
                self.cur_len += 1
            else:
                self.cur_type, self.cur_len, self.cur_start = t, 1, us
            if self.cur_len > self.best_len:
                self.best_len = self.cur_len
                self.best_type = self.cur_type
                self.best_start = self.cur_start

        def terminate(self):
            if self.user is not None:
                yield self.user, self.best_len, self.best_type, self.best_start

    spark.udtf.register("rtbd_longest_streak", LongestStreak)
    load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    ).createOrReplaceTempView("v_streak_events")
    return spark.sql(
        "SELECT * FROM rtbd_longest_streak(TABLE(v_streak_events) "
        "PARTITION BY user_id ORDER BY (us, event_id))"
    )


# --- URL parsing surface ----------------------------------------------------


@register(
    "url_parse_census",
    oracle="""
    WITH u AS (
        SELECT event_id,
               'https://shard' || CAST(user_id % 8 AS VARCHAR)
                 || '.example.com/api/v' || CAST(event_id % 3 + 1 AS VARCHAR)
                 || '/events?type=' || event_type
                 || '&page=' || CAST(event_id % 20 AS VARCHAR) AS url
        FROM events
    )
    SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           CAST(count(*) AS BIGINT) AS n_requests,
           CAST(count(DISTINCT regexp_extract(url, 'type=([^&]+)', 1)) AS BIGINT)
               AS n_types,
           CAST(sum(CAST(regexp_extract(url, 'page=([0-9]+)', 1) AS BIGINT)) AS BIGINT)
               AS page_total
    FROM u GROUP BY 1, 2
    """,
    tags=("engine", "url", "parse_url", "scalar-surface"),
)
def url_parse_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL PARSING — the web-log staple: host, path, and query
    parameters pulled from a URL column with `parse_url` (JVM-side,
    spec-aware — handles ports/fragments/encoding the way regexes
    eventually don't), aggregated into the per-endpoint traffic census
    every clickstream pipeline starts with.  URLs are synthesized
    deterministically (8 shard hosts x 3 API versions x query params
    from event columns); DuckDB has no parse_url, so the oracle
    extracts the same pieces by regexp — parser-independent agreement,
    the `xml_ingest_extract` pattern applied to URLs."""
    e = _t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://shard"),
        (F.col("user_id") % 8).cast("string"),
        F.lit(".example.com/api/v"),
        (F.col("event_id") % 3 + 1).cast("string"),
        F.lit("/events?type="),
        F.col("event_type"),
        F.lit("&page="),
        (F.col("event_id") % 20).cast("string"),
    )
    u = e.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("type")).alias("qtype"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).cast("long").alias("page"),
    )
    return u.groupBy("host", "path").agg(
        F.count(F.lit(1)).cast("long").alias("n_requests"),
        F.count_distinct("qtype").cast("long").alias("n_types"),
        F.sum("page").cast("long").alias("page_total"),
    )


# --- cross-engine cryptographic hash agreement ------------------------------


@register(
    "hash_integrity_census",
    oracle="""
    WITH h AS (SELECT md5(text) AS digest FROM documents)
    SELECT substring(digest, 1, 1) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct_digests,
           min(digest) AS min_digest
    FROM h GROUP BY 1
    """,
    tags=("engine", "hashing", "md5", "integrity", "cross-engine"),
)
def hash_integrity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRYPTOGRAPHIC-HASH AGREEMENT across engines — the foundation
    every content-addressed system (dedup stores, cache keys, transfer
    integrity manifests) rests on: md5 hex digests of the document
    texts, bucketed by leading nibble, with per-bucket distinct-digest
    counts and the minimum digest value-hash-pinned.  If Spark and
    DuckDB ever disagreed on a single byte of encoding, normalization,
    or hex rendering, the digests — and this query's hash — would
    diverge; agreement certifies the engine's hash column as a portable
    content address (the `dedup_exact_stats` family keys on exactly
    such digests).  One scan, one tiny bucket-keyed aggregation."""
    d = _t(spark, sf_dir, "documents")
    h = d.select(F.md5("text").alias("digest"))
    return h.groupBy(F.substring("digest", 1, 1).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("digest").cast("long").alias("n_distinct_digests"),
        F.min("digest").alias("min_digest"),
    )


# --- Observation API (inline metrics, zero extra scans) ---------------------


@register(
    "observe_metrics_audit",
    oracle="""
    WITH q AS (
        SELECT event_type, value FROM events WHERE value >= 50
    ),
    metrics AS (
        SELECT count(*) AS rows_kept,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents_kept
        FROM q
    ),
    result AS (
        SELECT count(*) AS n_groups FROM (SELECT DISTINCT event_type FROM q)
    )
    SELECT CAST(m.rows_kept AS BIGINT) AS rows_kept,
           m.cents_kept,
           CAST(r.n_groups AS BIGINT) AS n_groups
    FROM metrics m, result r
    """,
    tags=("engine", "observe", "inline-metrics", "data-quality"),
)
def observe_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OBSERVATION API — pipeline metrics WITHOUT a second scan:
    `df.observe(...)` attaches aggregate accumulators to a plan node,
    so the row count and cents total of the filtered stream are
    collected AS the query runs — the engine-native way to monitor an
    ETL step (row-yield, null-rate, total checks) where the naive
    approach pays one extra scan per metric.  Here the observed node
    is the value >= 50 filter feeding a distinct-count; the observed
    metrics and the query result land in ONE hashed row, and the
    oracle recomputes both — a drift between the observed stream and
    the direct aggregates would break the hash.  The observation
    itself is driver-bounded (one row of metrics), exactly like a
    Spark accumulator."""
    from pyspark.sql import Observation

    e = _t(spark, sf_dir, "events")
    obs = Observation()
    q = e.filter(F.col("value") >= 50).observe(
        obs,
        F.count(F.lit(1)).alias("rows_kept"),
        F.sum(as_cents(F.col("value"))).alias("cents_kept"),
    )
    n_groups = q.select("event_type").distinct().count()  # the action
    m = obs.get
    return spark.createDataFrame(
        [(int(m["rows_kept"]), int(m["cents_kept"]), int(n_groups))],
        "rows_kept long, cents_kept long, n_groups long",
    )


# --- parameterized SQL (named parameter markers) ----------------------------

_PARAM_SQL = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
    FROM {orders}
    WHERE o_totalprice >= {lo} AND o_orderstatus = {status}
    GROUP BY o_orderpriority
"""


@register(
    "parameterized_sql_surface",
    oracle=_PARAM_SQL.format(orders="orders", lo="1000.0", status="'F'"),
    tags=("engine", "sql-surface", "parameterized", "injection-safe"),
)
def parameterized_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL — named parameter markers bound through
    `spark.sql(query, args=...)`: the injection-safe templating surface
    applications use instead of string-formatting values into query
    text (a quoting bug in a formatted literal is both a correctness
    and a security hole; bound parameters are typed and never parsed
    as SQL).  The marker form also keeps the PLAN cache keyed on the
    template.  Same predicate constants baked literally into the
    oracle text — the results must agree exactly."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_param_orders")
    return spark.sql(
        _PARAM_SQL.format(orders="v_param_orders", lo=":lo", status=":status"),
        args={"lo": 1000.0, "status": "F"},
    )


# --- one-pass weighted sampling without replacement (priority sampling) -----


@register(
    "priority_sample_topk",
    oracle="""
    WITH w AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS weight,
               (doc_id * 2654435761) % 4294967296 AS h
        FROM documents
    ),
    p AS (
        SELECT doc_id, weight,
               weight * 8589934592 // (2 * h + 1) AS priority
        FROM w
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rk FROM p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(weight) AS BIGINT) AS weight_total,
           CAST(min(priority) AS BIGINT) AS min_priority,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id,
           CAST((SELECT priority FROM ranked WHERE rk = 51) AS BIGINT) AS tau
    FROM ranked WHERE rk <= 50
    """,
    tags=("engine", "sampling", "priority-sampling", "without-replacement", "one-pass"),
)
def priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED SAMPLING WITHOUT REPLACEMENT in one pass — PRIORITY
    SAMPLING (Duffield-Lund-Thorup): each row gets priority w/u for a
    per-row uniform u, the k largest priorities form the sample, and
    the (k+1)-th priority tau makes per-item inclusion weights
    max(w, tau) an unbiased subset-sum estimator — the principled way
    to keep a weighted sketch of a 100 TB corpus in one scan (the
    `corpus_weighted_sample` family draws WITH replacement; this is the
    without-replacement counterpart, and unlike rejection approaches it
    needs no second pass).  Determinism without transcendentals: u
    derives from a Knuth hash and the priority is computed as ONE
    integer FLOOR-DIVISION w * 2^33 div (2h + 1) — exact on both
    engines (float division + cast was measured off-by-one on 231/500
    rows: DuckDB's cast rounds where Spark's truncates), no ln/pow ulp
    divergence to flip a rank-boundary tie.
    Top-k is a TakeOrdered over bounded k, never a full sort."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.length("text").cast("long").alias("weight"),
        ((F.col("doc_id") * 2654435761) % 4294967296).alias("h"),
    )
    p = w.select(
        "doc_id",
        "weight",
        F.expr("weight * 8589934592L div (2 * h + 1)").alias("priority"),
    )
    top51 = p.orderBy(F.col("priority").desc(), "doc_id").limit(51).collect()
    tau = int(top51[50].priority) if len(top51) > 50 else None
    sample = top51[:50]
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "n_sampled": [len(sample)],
                "weight_total": [sum(int(r.weight) for r in sample)],
                "min_priority": [min(int(r.priority) for r in sample)],
                "max_doc_id": [max(int(r.doc_id) for r in sample)],
                "tau": [tau],
            }
        ),
        "n_sampled long, weight_total long, min_priority long, max_doc_id long, tau long",
    )


@register(
    "bitmap_retention_intersect",
    oracle="""
    WITH d AS (
        SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
        FROM events
    ),
    c AS (SELECT day, CAST(count(*) AS BIGINT) AS users FROM d GROUP BY day),
    r AS (
        SELECT a.day, CAST(count(*) AS BIGINT) AS retained
        FROM d a JOIN d b ON b.user_id = a.user_id AND b.day = a.day + 1
        GROUP BY a.day
    )
    SELECT r.day, c0.users AS day_users, c1.users AS next_day_users, retained,
           ROUND(retained / CAST(c0.users AS DOUBLE) + 1e-8, 6) AS retention_rate
    FROM r JOIN c c0 ON c0.day = r.day JOIN c c1 ON c1.day = r.day + 1
    WHERE retained > 0
    """,
    tags=("engine", "bitmap", "set-intersection", "retention", "inclusion-exclusion"),
)
def bitmap_retention_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-OVER-DAY RETENTION as BITMAP SET ALGEBRA — the intersection
    counterpart of `bitmap_distinct_users`' union rollup, and the query
    shape (cohort retention, cross-segment overlap) that makes exact
    mergeable bitmaps worth persisting: |A∩B| never needs an AND
    operator because inclusion-exclusion gives it from the pieces the
    union rollup already maintains, |A| + |B| - |A∪B| per bucket.  Each
    day's users live in per-bucket bitmaps; every daily row is streamed
    into two pair-keys (its own day as the 'today' member, day-1 as the
    'tomorrow' member), one OR-fold per (pair, bucket) computes the
    union, and buckets present on only one side contribute zero to the
    intersection but still count toward the day totals.  The raw table
    is touched ONCE (the daily bitmap build); every pairwise overlap
    after that folds persisted bitmaps — at 100 TB, retention over any
    day range is bitmap algebra over the rollup, never a re-scan or a
    user-level self-join.  The oracle IS the user-level distinct
    self-join; equality proves the per-bucket inclusion-exclusion is
    exact across bucket boundaries and missing buckets."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
            "user_id",
        )
        .groupBy("day", F.bitmap_bucket_number("user_id").alias("bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
        .withColumn("cnt", F.bitmap_count("bm"))
    )
    a = daily.select("day", "bucket", "bm", "cnt", F.lit(0).alias("role"))
    b = daily.select(
        (F.col("day") - 1).alias("day"), "bucket", "bm", "cnt", F.lit(1).alias("role")
    )
    g = (
        a.unionByName(b)
        .groupBy("day", "bucket")
        .agg(
            F.bitmap_count(F.bitmap_or_agg("bm")).alias("or_cnt"),
            F.sum("cnt").alias("sum_cnt"),
            F.count(F.lit(1)).alias("n_roles"),
            F.sum(F.when(F.col("role") == 0, F.col("cnt")).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("role") == 1, F.col("cnt")).otherwise(0)).alias("cnt_b"),
        )
    )
    per_day = g.groupBy("day").agg(
        F.sum(
            F.when(F.col("n_roles") == 2, F.col("sum_cnt") - F.col("or_cnt")).otherwise(0)
        ).cast("long").alias("retained"),
        F.sum("cnt_a").cast("long").alias("day_users"),
        F.sum("cnt_b").cast("long").alias("next_day_users"),
    )
    return per_day.filter(F.col("retained") > 0).select(
        "day",
        "day_users",
        "next_day_users",
        "retained",
        round_det(F.col("retained") / F.col("day_users").cast("double"), 6).alias(
            "retention_rate"
        ),
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               CAST(count(*) AS BIGINT) AS grp
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(grp) AS BIGINT) AS n_rows,
           CAST(min(grp) AS BIGINT) AS min_k,
           CAST(count(*) FILTER (WHERE grp < 5) AS BIGINT) AS classes_below_5,
           CAST(COALESCE(sum(grp) FILTER (WHERE grp < 5), 0) AS BIGINT) AS rows_below_5,
           ROUND(COALESCE(sum(grp) FILTER (WHERE grp < 5), 0)
                 / CAST(sum(grp) AS DOUBLE) + 1e-8, 6)
               AS reidentifiable_rate
    FROM g
    """,
    tags=("engine", "data-governance", "k-anonymity", "privacy-audit"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY AUDIT over quasi-identifiers — the privacy-governance
    number a dataset release (or a training-corpus export) is gated on:
    with QI = (nation, market segment, account-balance band), every
    equivalence class smaller than k=5 is a re-identification risk, and
    the audit reports how much of the table sits in such classes.  One
    hash aggregation builds the class sizes, a second 1-row fold
    summarizes — both map-side-combinable; at 100 TB the QI rollup is
    the only data-sized stage.  Pairs with the row-level redaction
    operators (`text_pii_scrub`, `text_redact_terms`): those fix
    payload leaks, this measures STRUCTURAL linkability, which no
    per-row scrub can see.  The oracle is the same two-level aggregate
    in SQL; class-count, min-k, and rate all shift if banding or
    grouping drifts by a single row."""
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("grp"))
    below = F.col("grp") < 5
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("grp").cast("long").alias("n_rows"),
        F.min("grp").cast("long").alias("min_k"),
        F.sum(F.when(below, 1).otherwise(0)).cast("long").alias("classes_below_5"),
        F.sum(F.when(below, F.col("grp")).otherwise(0)).cast("long").alias("rows_below_5"),
        round_det(
            F.sum(F.when(below, F.col("grp")).otherwise(0))
            / F.sum("grp").cast("double"),
            6,
        ).alias("reidentifiable_rate"),
    )


# --- pivot/unpivot round trip (melt surface) ---------------------------------


@register(
    "unpivot_day_type_counts",
    oracle="""
    WITH d AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events),
    t AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type),
    c AS (
        SELECT epoch_us(ts) // 86400000000 AS day, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n_events
    FROM d CROSS JOIN t LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
    """,
    tags=("engine", "sql-surface", "pivot", "unpivot", "melt"),
)
def unpivot_day_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT -> UNPIVOT round trip — the melt verb (`df.unpivot` /
    SQL UNPIVOT) that turns a wide per-day metrics block back into the
    long form every downstream aggregation wants.  The subtlety this
    pins: the round trip is NOT the identity — pivoting materializes
    the full day x type grid (absent combinations become null, filled
    to 0 here), so unpivot emits zero rows a direct GROUP BY would
    omit; the oracle spells that densification as DISTINCT-days CROSS
    JOIN the type dimension LEFT JOIN the sparse counts.  A melt that
    dropped zero cells, mis-ordered its value columns, or mangled the
    id column would change the row count or pair values and break the
    hash.  Plan: one map-side-combinable pivot aggregation (explicit
    value list — no distinct-scan job), then unpivot is a zero-shuffle
    generator over the wide rows.  Scale: wide is #days-sized; the
    grid is days x 5."""
    e = _t(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"), "event_type"
    )
    wide = (
        e.groupBy("day")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )
    return wide.unpivot(
        ["day"],
        ["click", "error", "purchase", "signup", "view"],
        "event_type",
        "n_events",
    )


# --- listagg / GROUP BY ALL (Spark 4 SQL surfaces) ---------------------------


@register(
    "listagg_group_by_all",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n_nations,
           CAST(sum(length(n.n_name)) AS BIGINT) AS name_chars
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ALL
    """,
    tags=("engine", "sql-surface", "listagg", "group-by-all"),
)
def listagg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Spark 4 SQL surfaces in one hash: `listagg(...) WITHIN GROUP
    (ORDER BY ...)` — the ANSI ordered string aggregation every report
    migration hits (Oracle/Snowflake LISTAGG, Postgres string_agg) —
    and `GROUP BY ALL`, which infers the grouping set from the
    non-aggregate select list.  The WITHIN GROUP ordering is the
    correctness point: an unordered concat is nondeterministic across
    partitions and would flake the hash; the oracle's `string_agg(...,
    ORDER BY ...)` is DuckDB's spelling of the same contract, so the
    hash pins that both engines produce the identical ordered string.
    Scale: Spark executes ordered listagg as a sort-based aggregate
    per group — group-parallel, and the dim-side cardinality (5
    regions x 25 nations) is where an ordered concat belongs; an
    unbounded fact-side listagg is the anti-pattern (collect_list of a
    fact table), which is why the catalog pins it on dims."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("v_la_nation")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("v_la_region")
    return spark.sql("""
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations,
               CAST(count(*) AS BIGINT) AS n_nations,
               CAST(sum(length(n.n_name)) AS BIGINT) AS name_chars
        FROM v_la_nation n JOIN v_la_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ALL
    """)


@register(
    "from_csv_permissive_surface",
    oracle="""
    WITH src AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    parsed AS (
        SELECT status,
               CASE WHEN k % 11 = 0 OR k % 7 = 0 THEN NULL ELSE cents END
                   AS total_cents,
               (k % 11 = 0 OR k % 7 = 0) AS corrupt
        FROM src
    )
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(total_cents) AS BIGINT) AS n_parsed,
           CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(coalesce(sum(total_cents), 0) AS BIGINT) AS sum_cents
    FROM parsed GROUP BY status
    """,
    tags=("engine", "sql-surface", "csv", "permissive", "dead-letter"),
)
def from_csv_permissive_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV parsing with corrupt-record capture — the
    dead-letter contract of every landing-zone ingest
    (`stream_dead_letter_rate` is the streaming JSON twin;
    ref:spark_streaming.py's schema enforcement is the anchor): orders
    are re-encoded as CSV lines with two deterministic corruption
    classes (every 7th key a non-numeric amount, every 11th a SHORT
    row), then parsed back through the REAL `from_csv` parser in
    PERMISSIVE mode with `columnNameOfCorruptRecord` — malformed fields
    null out, the raw line lands in the corrupt column, and NO ROW IS
    DROPPED.  The oracle recomputes the census from the corruption rule
    directly (ground truth, parser-independent), so the hash pins the
    PARSER's permissive semantics: a parser that dropped corrupt rows
    breaks n_rows, one that zero-filled instead of nulling breaks
    sum_cents, one that missed short rows breaks n_corrupt.  The
    amounts travel as integer CENTS in the CSV text because double
    rendering differs across engines — the encode side of the same
    exactness discipline every oracle here uses.  Plan: pure map
    (encode + parse) + one hash agg; at scale this is exactly the
    spark.read.csv PERMISSIVE path, expression-level."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        as_cents(F.col("o_totalprice")).alias("cents"),
    )
    line = (
        F.when(F.col("k") % 11 == 0, F.concat_ws(",", "k", "status"))
        .when(F.col("k") % 7 == 0, F.concat_ws(",", "k", "status", F.lit("N/A")))
        .otherwise(F.concat_ws(",", "k", "status", "cents"))
    )
    parsed = o.select(
        F.from_csv(
            line,
            "k bigint, status string, total_cents bigint, _bad string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_bad"},
        ).alias("p")
    ).select("p.*")
    return parsed.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("total_cents").cast("long").alias("n_parsed"),
        F.sum(F.col("_bad").isNotNull().cast("long")).cast("long").alias("n_corrupt"),
        F.coalesce(F.sum("total_cents"), F.lit(0)).cast("long").alias("sum_cents"),
    )


@register(
    "ranking_semantics_surface",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           CAST(rank() OVER w_ties AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w_ties AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w_ties + 1e-8, 6) AS pct_rank,
           ROUND(cume_dist() OVER w_ties + 1e-8, 6) AS cume,
           CAST(ntile(4) OVER w_total AS INT) AS tile4
    FROM part
    WINDOW w_ties AS (PARTITION BY p_brand ORDER BY p_size),
           w_total AS (PARTITION BY p_brand ORDER BY p_size, p_partkey)
    """,
    tags=("engine", "sql-surface", "ranking", "window"),
)
def ranking_semantics_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIVE ranking functions' tie semantics in one hash — rank
    (gaps), dense_rank (no gaps), percent_rank ((r-1)/(n-1)), cume_dist
    (rows<=peer/n), ntile (equal-ish buckets) — over a column with
    heavy ties (p_size within p_brand).  The deliberate detail is TWO
    window specs: the four tie-aware functions order by the TIED key
    alone, so peers share values (an implementation that tie-broke
    internally would break the hash), while ntile orders by a UNIQUE
    total order (size, partkey) because its bucket assignment is
    row-positional — running ntile on the tied order would be
    nondeterministic across partitions/engines.  That split IS the
    correctness contract every ranking migration gets wrong first.
    Window functions shuffle once per distinct (partition, order) —
    Spark computes the four w_ties functions in ONE window stage, the
    w_total ntile in a second over the same hash partitioning (no extra
    exchange, sort-only)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_rank_part")
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det_sql

    return spark.sql(f"""
        SELECT p_partkey, p_brand, p_size,
               CAST(rank() OVER w_ties AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w_ties AS BIGINT) AS drnk,
               {round_det_sql('percent_rank() OVER w_ties', 6)} AS pct_rank,
               {round_det_sql('cume_dist() OVER w_ties', 6)} AS cume,
               CAST(ntile(4) OVER w_total AS INT) AS tile4
        FROM v_rank_part
        WINDOW w_ties AS (PARTITION BY p_brand ORDER BY p_size),
               w_total AS (PARTITION BY p_brand ORDER BY p_size, p_partkey)
    """)


@register(
    "attribution_position_weighted",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid,
               epoch_us(ts) AS us
        FROM events
    ),
    touches AS (
        SELECT user_id, jid, event_type AS channel,
               row_number() OVER (PARTITION BY user_id, jid ORDER BY us, event_id) AS pos,
               count(*) OVER (PARTITION BY user_id, jid) AS n
        FROM seq WHERE event_type <> 'purchase'
    ),
    purchases AS (
        SELECT user_id, jid FROM seq WHERE event_type = 'purchase'
    ),
    credited AS (
        SELECT t.channel,
               CASE WHEN t.n = 1 THEN 10000
                    WHEN t.n = 2 THEN 5000
                    WHEN t.pos = 1 OR t.pos = t.n THEN 4000
                    ELSE 2000 // (t.n - 2)
                         + CASE WHEN t.pos - 1 <= 2000 % (t.n - 2) THEN 1 ELSE 0 END
               END AS bp
        FROM purchases p JOIN touches t
          ON p.user_id = t.user_id AND p.jid = t.jid
        UNION ALL
        SELECT '(none)' AS channel, 10000 AS bp
        FROM purchases p ANTI JOIN touches t
          ON p.user_id = t.user_id AND p.jid = t.jid
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touchpoints,
           CAST(sum(bp) AS BIGINT) AS credited_bp,
           ROUND(sum(bp) / 10000.0 + 1e-8, 4) AS credited_purchases
    FROM credited GROUP BY channel
    """,
    tags=("engine", "attribution", "multi-touch", "window"),
)
def attribution_position_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-SHAPED (position-weighted) MULTI-TOUCH ATTRIBUTION — each
    purchase's credit splits over its whole journey (the touches since
    the user's previous purchase): 40% first touch, 40% last, 20%
    across the middles; 100%/50-50 for 1- and 2-touch journeys;
    touchless purchases surface as '(none)'.  Credits are EXACT INTEGER
    BASIS POINTS with the middle remainder dealt largest-remainder
    style to the earliest middles (the `sample_allocation_hamilton`
    rule, per journey), so every purchase's credits sum to exactly
    10000 and the report is integer-exact — the invariant float-weight
    attribution silently violates, and the complement of
    `attribution_last_touch`'s single-touch model.  Journeys come from
    a running purchase count over the STRICTLY-PRECEDING frame (a
    purchase closes its own journey); one user_id shuffle carries the
    whole query, the join is journey-keyed, and the census is one hash
    agg."""
    e = _t(spark, sf_dir, "events")
    wj = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(wj),
            F.lit(0),
        ).alias("jid"),
        F.unix_micros("ts").alias("us"),
    )
    wt = Window.partitionBy("user_id", "jid").orderBy("us", "event_id")
    wn = Window.partitionBy("user_id", "jid")
    touches = (
        seq.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            "jid",
            F.col("event_type").alias("channel"),
            F.row_number().over(wt).alias("pos"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
    )
    purchases = seq.filter(F.col("event_type") == "purchase").select("user_id", "jid")
    bp = (
        F.when(F.col("n") == 1, F.lit(10000))
        .when(F.col("n") == 2, F.lit(5000))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(4000)
        )
        .otherwise(
            F.expr("2000 div (n - 2)")
            + F.when(F.col("pos") - 1 <= 2000 % (F.col("n") - 2), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
    )
    hit = purchases.join(touches, ["user_id", "jid"]).select(
        "channel", bp.cast("long").alias("bp")
    )
    none = (
        purchases.join(touches, ["user_id", "jid"], "left_anti")
        .select(F.lit("(none)").alias("channel"), F.lit(10000).cast("long").alias("bp"))
    )
    return (
        hit.unionByName(none)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touchpoints"),
            F.sum("bp").cast("long").alias("credited_bp"),
            round_det(F.sum("bp") / 10000.0, 4).alias("credited_purchases"),
        )
    )


# --- Hilbert-curve layout audit ----------------------------------------------

_HGRID = 256  # 8-bit per dimension, matching the z-order audit's domain


def _hilbert_stage(s: int, intdiv: str) -> tuple[str, str, str]:
    """One xy2d level (Wikipedia's arithmetic, bit-ops replaced by
    div/mod so both engines evaluate it identically; the Python twin is
    property-tested bijective + unit-step adjacent in
    tests/test_round6.py): returns (d, x, y) expression strings over
    columns hd, hx, hy."""
    rx = f"((hx {intdiv} {s}) % 2)"
    ry = f"((hy {intdiv} {s}) % 2)"
    quad = (
        f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 WHEN {rx} = 0 THEN 1 "
        f"WHEN {ry} = 0 THEN 3 ELSE 2 END"
    )
    d = f"hd + {s * s} * ({quad})"
    x = f"CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1 THEN {_HGRID - 1} - hy ELSE hy END"
    y = f"CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1 THEN {_HGRID - 1} - hx ELSE hx END"
    return d, x, y


def _hilbert_sql_ctes(src: str, intdiv: str) -> str:
    """Chained per-level CTEs h0..h8 computing hval from (cust, day)."""
    parts = [f"h0 AS (SELECT o_orderkey, cust, day, cust AS hx, day AS hy, 0 AS hd FROM {src})"]
    lvl = 0
    s = _HGRID // 2
    while s > 0:
        d, x, y = _hilbert_stage(s, intdiv)
        parts.append(
            f"h{lvl + 1} AS (SELECT o_orderkey, cust, day, {x} AS hx, {y} AS hy, "
            f"{d} AS hd FROM h{lvl})"
        )
        lvl += 1
        s //= 2
    return ",\n    ".join(parts)


_HILBERT_ORACLE = f"""
    WITH d AS (
        SELECT o_orderkey,
               o_custkey % {_HGRID} AS cust,
               (epoch_us(o_orderdate) // 86400000000) % {_HGRID} AS day
        FROM orders
    ),
    {_hilbert_sql_ctes('d', '//')},
    z AS (
        SELECT o_orderkey, cust, day,
               {_interleave_expr('cust', 'day', '//')} AS zval,
               hd AS hval
        FROM h8
    ),
    l1 AS (SELECT cust, day, ntile(64) OVER (ORDER BY zval, o_orderkey) AS b FROM z),
    l2 AS (SELECT cust, day, ntile(64) OVER (ORDER BY hval, o_orderkey) AS b FROM z),
    s AS (
        SELECT 'zorder' AS layout, b,
               max(cust) - min(cust) AS sc, max(day) - min(day) AS sd
        FROM l1 GROUP BY b
        UNION ALL
        SELECT 'hilbert', b, max(cust) - min(cust), max(day) - min(day)
        FROM l2 GROUP BY b
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(sc) AS BIGINT) AS total_span_cust,
           CAST(sum(sd) AS BIGINT) AS total_span_day,
           CAST(sum(sc * sd) AS BIGINT) AS total_bbox_area,
           CAST(max(sc * sd) AS BIGINT) AS max_bbox_area
    FROM s GROUP BY layout
"""


@register(
    "layout_hilbert_stats",
    oracle=_HILBERT_ORACLE,
    tags=("engine", "layout", "hilbert", "data-skipping", "global-ntile"),
)
def layout_hilbert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT-CURVE layout audit, head-to-head against z-order on the
    same (custkey mod 256, order-day mod 256) domain: the Hilbert curve
    never takes the long diagonal jumps Morton interleaving does (its
    consecutive cells are always grid-adjacent — property-tested in
    tests/test_round6.py), so equal-count file splits along the curve
    get TIGHTER per-file bounding boxes, i.e. better min/max zone-map
    skipping for the same sort cost — why Iceberg offers hilbert
    alongside zorder in its rewrite action.  The curve index is the
    standard xy2d per-level arithmetic unrolled into EIGHT chained
    integer stages (div/mod/CASE only — no bit intrinsics, both
    engines evaluate the identical formula; Spark fuses the chain into
    one codegen'd projection).  File assignment rides
    `windows.global_ntile` (no single-task sort); the hashed census
    reports per-dimension spans plus the BBOX AREA totals where
    Hilbert's locality advantage over z-order actually shows.
    `layout_zorder_stats` is the single-key-vs-zorder half of this
    argument."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_ntile

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % _HGRID).alias("cust"),
        ((F.unix_micros("o_orderdate") / F.lit(86_400_000_000)).cast("long") % _HGRID).alias(
            "day"
        ),
    )
    h = o.withColumn("hx", F.col("cust")).withColumn("hy", F.col("day")).withColumn(
        "hd", F.lit(0)
    )
    s = _HGRID // 2
    while s > 0:
        d, x, y = _hilbert_stage(s, "div")
        h = h.select(
            "o_orderkey",
            "cust",
            "day",
            F.expr(x).alias("hx"),
            F.expr(y).alias("hy"),
            F.expr(d).alias("hd"),
        )
        s //= 2
    z = h.select(
        "o_orderkey",
        "cust",
        "day",
        F.expr(_interleave_expr("cust", "day", "div")).alias("zval"),
        F.col("hd").alias("hval"),
    )
    spans = None
    for layout, order_cols in (("zorder", ["zval", "o_orderkey"]), ("hilbert", ["hval", "o_orderkey"])):
        b = global_ntile(z, order_cols, 64, out="b")
        st = b.groupBy("b").agg(
            (F.max("cust") - F.min("cust")).alias("sc"),
            (F.max("day") - F.min("day")).alias("sd"),
        ).select(F.lit(layout).alias("layout"), "sc", "sd")
        spans = st if spans is None else spans.unionByName(st)
    return spans.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("sc").cast("long").alias("total_span_cust"),
        F.sum("sd").cast("long").alias("total_span_day"),
        F.sum(F.col("sc") * F.col("sd")).cast("long").alias("total_bbox_area"),
        F.max(F.col("sc") * F.col("sd")).cast("long").alias("max_bbox_area"),
    )


# --- Luhn (mod-10) PAN validation -------------------------------------------


def _luhn_digit(col: str, i: int) -> str:
    return f"CAST(substr({col}, {i}, 1) AS INT)"


def _luhn_sum_payload(col: str) -> str:
    """Luhn contribution of a 15-digit payload (check digit appended at
    position 16): from-right index r = 17 - i, doubled when r is even,
    i.e. when the 1-based position i is odd."""
    terms = []
    for i in range(1, 16):
        d = _luhn_digit(col, i)
        if i % 2 == 1:  # doubled, fold > 9 by subtracting 9
            terms.append(f"(CASE WHEN {d} < 5 THEN 2 * {d} ELSE 2 * {d} - 9 END)")
        else:
            terms.append(d)
    return " + ".join(terms)


def _luhn_sum_full(col: str) -> str:
    """Luhn sum of a full 16-digit string (validator side): r = 17 - i,
    doubled when r even."""
    terms = []
    for i in range(1, 17):
        d = _luhn_digit(col, i)
        if (17 - i) % 2 == 0:
            terms.append(f"(CASE WHEN {d} < 5 THEN 2 * {d} ELSE 2 * {d} - 9 END)")
        else:
            terms.append(d)
    return " + ".join(terms)


_LUHN_ORACLE = f"""
    WITH pan AS (
        SELECT c_custkey AS k,
               concat('4',
                      lpad(CAST((c_custkey * 2654435761) % 4294967296 AS VARCHAR), 10, '0'),
                      lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS p15
        FROM customer
    ),
    carded AS (
        SELECT k, concat(p15, CAST(
                   CASE WHEN k % 2 = 0
                        THEN (10 - ({_luhn_sum_payload('p15')}) % 10) % 10
                        ELSE ((10 - ({_luhn_sum_payload('p15')}) % 10) % 10 + 1) % 10
                   END AS VARCHAR)) AS pan16
        FROM pan
    ),
    checked AS (
        SELECT k, (({_luhn_sum_full('pan16')}) % 10 = 0) AS is_valid FROM carded
    )
    SELECT is_valid,
           CAST(count(*) AS BIGINT) AS n_cards,
           CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even_keys
    FROM checked GROUP BY is_valid
"""


@register(
    "pii_luhn_validation",
    oracle=_LUHN_ORACLE,
    tags=("engine", "pii", "luhn", "validation"),
)
def pii_luhn_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN (mod-10) check-digit validation — the algorithm that turns
    'looks like a card number' regexes (`text_pii_scrub`) into REAL
    PAN detection with a ~90% false-positive cut, which is how
    production PII scanners decide whether a 16-digit string actually
    needs redaction.  Both engines synthesize the same PANs from
    customer keys (even keys get the CORRECT check digit computed by
    the same Luhn arithmetic, odd keys get it off by one), then an
    INDEPENDENT full-string validator re-checks every card: the hash
    pins that validity == key-parity exactly — a doubling-fold slip,
    an off-by-one in the from-right indexing, or a wrong fold constant
    flips a census bucket.  The digit-position expressions are
    generated once in Python and formatted into both dialects
    (`layout_hilbert_stats` discipline); everything is a pure map +
    one hash agg — scan-speed at any scale."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_luhn_customer")
    return spark.sql(f"""
        WITH pan AS (
            SELECT c_custkey AS k,
                   concat('4',
                          lpad(CAST((c_custkey * 2654435761) % 4294967296 AS STRING), 10, '0'),
                          lpad(CAST(c_custkey % 10000 AS STRING), 4, '0')) AS p15
            FROM v_luhn_customer
        ),
        carded AS (
            SELECT k, concat(p15, CAST(
                       CASE WHEN k % 2 = 0
                            THEN (10 - ({_luhn_sum_payload('p15')}) % 10) % 10
                            ELSE ((10 - ({_luhn_sum_payload('p15')}) % 10) % 10 + 1) % 10
                       END AS STRING)) AS pan16
            FROM pan
        ),
        checked AS (
            SELECT k, (({_luhn_sum_full('pan16')}) % 10 = 0) AS is_valid FROM carded
        )
        SELECT is_valid,
               CAST(count(*) AS BIGINT) AS n_cards,
               CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even_keys
        FROM checked GROUP BY is_valid
    """)


@register(
    "iso_weekday_semantics",
    oracle="""
    WITH d AS (
        SELECT CAST(floor(EXTRACT(epoch FROM o_orderdate) / 86400) AS BIGINT) AS ed,
               isodow(CAST(o_orderdate AS DATE)) AS builtin_iso,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    )
    SELECT CAST((ed + 3) % 7 + 1 AS INT) AS iso_dow,
           CAST(max(builtin_iso) AS INT) AS builtin_iso,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           ((ed + 3) % 7 + 1 <= 5) AS is_business_day
    FROM d GROUP BY iso_dow, is_business_day
    """,
    tags=("engine", "sql-surface", "calendar", "timezone-proof"),
)
def iso_weekday_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO WEEKDAY numbering pinned across engines — the calendar trap
    every cross-engine migration hits once: Spark's dayofweek() is
    1=Sunday, its weekday() is 0=Monday, DuckDB's dayofweek() is
    0=Sunday, and only DuckDB ships isodow().  This query derives the
    ISO day (1=Monday..7=Sunday) from EPOCH-DAY INTEGER ARITHMETIC —
    (epoch_day + 3) % 7 + 1, anchored on 1970-01-01 being a Thursday —
    which is simultaneously engine-neutral AND session-timezone-proof
    (no field extraction on a timestamp; the repo's tz-robustness rule),
    then CROSS-CHECKS it against each engine's own builtin (weekday()+1
    on the tz-normalized date in Spark, isodow() in DuckDB): the
    max(builtin) column hash-matches the derived key only if both
    builtins agree with the arithmetic on every row.  Business-day
    revenue rollup rides along as the practical payload."""
    o = load_table(spark, sf_dir, "orders")
    ed = F.floor(F.unix_seconds(F.col("o_orderdate")) / 86400).cast("long")
    d = o.select(
        ed.alias("ed"),
        (F.weekday(F.to_date(utc_naive(F.col("o_orderdate")))) + 1).alias("builtin_iso"),
        as_cents(F.col("o_totalprice")).alias("cents"),
    )
    iso = ((F.col("ed") + 3) % 7 + 1).cast("int")
    return (
        d.withColumn("iso_dow", iso)
        .withColumn("is_business_day", F.col("iso_dow") <= 5)
        .groupBy("iso_dow", "is_business_day")
        .agg(
            F.max("builtin_iso").cast("int").alias("builtin_iso"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select("iso_dow", "builtin_iso", "n_orders", "revenue_cents", "is_business_day")
    )


_FRAME_SQL = """
    SELECT p_brand, p_partkey,
           last_value(p_size) OVER (PARTITION BY p_brand ORDER BY p_partkey)
               AS lv_default,
           last_value(p_size) OVER (PARTITION BY p_brand ORDER BY p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv_full,
           first_value(p_size) OVER (PARTITION BY p_brand ORDER BY p_partkey)
               AS fv_default,
           nth_value(p_size, 3) OVER (PARTITION BY p_brand ORDER BY p_partkey)
               AS nth3_default
    FROM {part}
"""


@register(
    "frame_semantics_surface",
    oracle=_FRAME_SQL.format(part="part"),
    tags=("engine", "sql-surface", "window", "frame-semantics"),
)
def frame_semantics_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOW DEFAULT-FRAME semantics pinned — the single most-filed
    window-function bug in every SQL engine's tracker: with an ORDER BY
    and no explicit frame, the standard default is RANGE UNBOUNDED
    PRECEDING TO CURRENT ROW, so `last_value` returns the CURRENT row's
    value (useless-looking, standard-correct) and `nth_value(x, 3)` is
    NULL until the third row — while the explicit UNBOUNDED FOLLOWING
    frame gives the partition-wide answer people expect.  The SAME SQL
    text runs through spark.sql and DuckDB (`lateral_top3_orders`'
    dialect-surface contract), and the hash pins all four columns
    row-by-row over a tied, multi-partition input — an engine that
    defaulted to the full frame (as several pre-standard databases
    did) breaks lv_default on every non-final row.  Companion to
    `ranking_semantics_surface`'s tie rules; together they pin the
    window-function contract migrations trip on."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_frame_part")
    return spark.sql(_FRAME_SQL.format(part="v_frame_part"))


@register(
    "nulls_ordering_surface",
    oracle="""
    WITH v AS (
        SELECT CASE WHEN l_linenumber = 1 THEN NULL
                    ELSE CAST(round(l_quantity * 100, 0) AS BIGINT) END AS val,
               l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS lnum
        FROM lineitem WHERE l_orderkey <= 640
    )
    SELECT 'asc_nulls_first' AS variant, val, okey, lnum FROM
        (SELECT * FROM v ORDER BY val ASC NULLS FIRST, okey, lnum LIMIT 3)
    UNION ALL
    SELECT 'asc_nulls_last', val, okey, lnum FROM
        (SELECT * FROM v ORDER BY val ASC NULLS LAST, okey, lnum LIMIT 3)
    UNION ALL
    SELECT 'desc_nulls_first', val, okey, lnum FROM
        (SELECT * FROM v ORDER BY val DESC NULLS FIRST, okey, lnum LIMIT 3)
    UNION ALL
    SELECT 'desc_nulls_last', val, okey, lnum FROM
        (SELECT * FROM v ORDER BY val DESC NULLS LAST, okey, lnum LIMIT 3)
    """,
    tags=("engine", "sql-surface", "nulls-ordering", "semantics-pin"),
)
def nulls_ordering_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-ORDERING semantics pin — the cross-engine trap next to
    `ranking_semantics_surface`/`frame_semantics_surface`: Spark's bare
    ASC sorts nulls FIRST, DuckDB's sorts them LAST, so any bare
    ORDER BY over a nullable key silently reorders between engines.
    The fix this query pins is EXPLICIT `NULLS FIRST/LAST` on every
    nullable ordering (all four variants, top-3 each, unique
    tie-breaks); the engine side uses the typed `asc_nulls_first()`
    family.  A migration that drops one modifier flips rows into or
    out of the LIMIT and breaks the hash.  Plan: pushdown-filtered
    scan + 4 TakeOrdered(3) — no full sort."""
    v = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= 640)
        .select(
            F.when(F.col("l_linenumber") == 1, F.lit(None).cast("long"))
            .otherwise(as_cents(F.col("l_quantity")))
            .alias("val"),
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").cast("long").alias("lnum"),
        )
    )
    variants = [
        ("asc_nulls_first", F.col("val").asc_nulls_first()),
        ("asc_nulls_last", F.col("val").asc_nulls_last()),
        ("desc_nulls_first", F.col("val").desc_nulls_first()),
        ("desc_nulls_last", F.col("val").desc_nulls_last()),
    ]
    frames = [
        v.orderBy(order, F.col("okey"), F.col("lnum"))
        .limit(3)
        .select(F.lit(name).alias("variant"), "val", "okey", "lnum")
        for name, order in variants
    ]
    out = frames[0]
    for extra in frames[1:]:
        out = out.unionByName(extra)
    return out


@register(
    "l_diversity_audit",
    oracle="""
    WITH rel AS (
        SELECT c.c_nationkey, c.c_mktsegment,
               CAST(floor(c.c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               o.o_orderpriority AS sensitive
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (
        SELECT c_nationkey, c_mktsegment, bal_band,
               CAST(count(*) AS BIGINT) AS grp,
               CAST(count(DISTINCT sensitive) AS BIGINT) AS l
        FROM rel GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(grp) AS BIGINT) AS n_rows,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(count(*) FILTER (WHERE l < 3) AS BIGINT) AS classes_below_3,
           CAST(COALESCE(sum(grp) FILTER (WHERE l < 3), 0) AS BIGINT) AS rows_below_3,
           ROUND(COALESCE(sum(grp) FILTER (WHERE l < 3), 0)
                 / CAST(sum(grp) AS DOUBLE) + 1e-8, 6)
               AS homogeneous_rate
    FROM g
    """,
    tags=("engine", "data-governance", "l-diversity", "privacy-audit"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY AUDIT — the privacy check k-anonymity misses
    (`k_anonymity_audit` counts class SIZES; a class of 50 rows that
    all share one sensitive value still leaks it — the homogeneity
    attack): per quasi-identifier class over the released
    orders-with-customer-attributes relation, count DISTINCT sensitive
    values (order priority) and report classes below l=3, the rows
    they expose, and the homogeneous-exposure rate.  Same two-level
    aggregation shape as the k audit — one QI rollup (now with a
    distinct-count), one 1-row fold; the join side is the only
    data-sized stage at 100 TB and the dimension broadcasts."""
    rel = (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(_t(spark, sf_dir, "customer")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
            F.col("o_orderpriority").alias("sensitive"),
        )
    )
    g = rel.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("grp"),
        F.count_distinct("sensitive").alias("l"),
    )
    below = F.col("l") < 3
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("grp").cast("long").alias("n_rows"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(below, 1).otherwise(0)).cast("long").alias("classes_below_3"),
        F.sum(F.when(below, F.col("grp")).otherwise(0)).cast("long").alias("rows_below_3"),
        round_det(
            F.sum(F.when(below, F.col("grp")).otherwise(0)) / F.sum("grp").cast("double"), 6
        ).alias("homogeneous_rate"),
    )


@register(
    "dedup_canonical_url",
    oracle="""
    WITH raw AS (
        SELECT event_id,
               (CASE WHEN event_id % 2 = 0 THEN 'https://Shard' ELSE 'https://shard' END)
               || CAST(user_id % 8 AS VARCHAR) || '.Example.COM/catalog/item'
               || CAST(event_id % 40 AS VARCHAR)
               || (CASE WHEN event_id % 3 = 0 THEN '/' ELSE '' END)
               || '?' ||
               (CASE WHEN event_id % 2 = 0
                     THEN 'ref=' || event_type || '&utm_source=mail&page=' || CAST(event_id % 5 AS VARCHAR)
                     ELSE 'page=' || CAST(event_id % 5 AS VARCHAR) || '&ref=' || event_type END)
               AS url
        FROM events
    ),
    canon AS (
        SELECT event_id,
               lower(regexp_extract(url, '^https://([^/]+)', 1)) AS host,
               regexp_replace(regexp_extract(url, '^https://[^/]+([^?]*)', 1), '/$', '') AS path,
               array_to_string(
                   list_sort(list_filter(string_split(regexp_extract(url, '\\?(.*)$', 1), '&'),
                                         p -> p NOT LIKE 'utm_%')),
                   '&') AS qs
        FROM raw
    ),
    keys AS (
        SELECT host, path, host || path || '?' || qs AS ckey FROM canon
    )
    SELECT host, path,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(DISTINCT ckey) AS BIGINT) AS n_canonical,
           CAST(count(*) - count(DISTINCT ckey) AS BIGINT) AS n_collapsed
    FROM keys GROUP BY 1, 2
    ORDER BY host, path
    """,
    tags=("engine", "url-canonicalization", "dedup", "web-curation"),
)
def dedup_canonical_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANONICAL-URL DEDUPLICATION — the web-crawl curation step before
    any content dedup: the same resource hides behind host case,
    trailing slashes, tracking parameters, and query-string order.
    The synthesized feed plants all four dirt patterns
    deterministically; canonicalization lowercases the host, strips a
    trailing slash, DROPS utm_* parameters, and SORTS the remaining
    query params, so the per-(host, path) census pins exactly how many
    raw URLs collapse into how many canonical resources — a
    canonicalizer that misses one rule changes n_canonical.  All string
    ops are JVM-side codegen (regexp/split/array_sort/concat — the
    same family as `url_parse_census`); the dedup itself is one
    hash-agg distinct.  At crawl scale this is a pure map + one
    canonical-key aggregation."""
    e = _t(spark, sf_dir, "events")
    url = F.concat(
        F.when(F.col("event_id") % 2 == 0, F.lit("https://Shard")).otherwise(
            F.lit("https://shard")
        ),
        (F.col("user_id") % 8).cast("string"),
        F.lit(".Example.COM/catalog/item"),
        (F.col("event_id") % 40).cast("string"),
        F.when(F.col("event_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(
                F.lit("ref="),
                F.col("event_type"),
                F.lit("&utm_source=mail&page="),
                (F.col("event_id") % 5).cast("string"),
            ),
        ).otherwise(
            F.concat(
                F.lit("page="),
                (F.col("event_id") % 5).cast("string"),
                F.lit("&ref="),
                F.col("event_type"),
            )
        ),
    )
    raw = e.select("event_id", url.alias("url"))
    canon = raw.select(
        F.lower(F.regexp_extract("url", "^https://([^/]+)", 1)).alias("host"),
        F.regexp_replace(
            F.regexp_extract("url", "^https://[^/]+([^?]*)", 1), "/$", ""
        ).alias("path"),
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split(F.regexp_extract("url", "\\?(.*)$", 1), "&"),
                    lambda p: ~p.startswith("utm_"),
                )
            ),
            "&",
        ).alias("qs"),
    )
    keys = canon.select(
        "host", "path", F.concat(F.col("host"), F.col("path"), F.lit("?"), F.col("qs")).alias("ckey")
    )
    return (
        keys.groupBy("host", "path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.count_distinct("ckey").cast("long").alias("n_canonical"),
            (F.count(F.lit(1)) - F.count_distinct("ckey")).cast("long").alias("n_collapsed"),
        )
        .orderBy("host", "path")
    )


@register(
    "intdiv_mod_semantics_surface",
    oracle="""
    WITH a AS (SELECT unnest(generate_series(-9, 9)) AS a),
    b AS (SELECT unnest([-4, -3, 3, 4]) AS b)
    SELECT CAST(a.a AS BIGINT) AS a, CAST(b.b AS BIGINT) AS b,
           CAST(a.a % b.b AS BIGINT) AS c_mod,
           CAST(CASE WHEN a.a % b.b < 0 THEN ((a.a % b.b) + b.b) % b.b
                     ELSE a.a % b.b END AS BIGINT) AS positive_mod,
           CAST(a.a // b.b AS BIGINT) AS trunc_div,
           CAST(floor(a.a / (1.0 * b.b)) AS BIGINT) AS floor_div
    FROM a CROSS JOIN b
    ORDER BY a, b
    """,
    tags=("engine", "sql-surface", "integer-division", "semantics-pin"),
)
def intdiv_mod_semantics_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTEGER DIVISION / MODULO semantics pin on negative operands —
    the arithmetic traps between engines and languages: Spark `div` and
    DuckDB `//` both TRUNCATE toward zero (C semantics — NOT Python's
    flooring `//`, the assumption this query was written to test and
    itself got wrong on the first draft), `%` follows the DIVIDEND's
    sign in both, FLOOR division must be spelled explicitly in both
    (floor of the real quotient: -7 vs 2 gives -4 where div gives -3),
    and only Spark ships `pmod` — whose exact rule is "when the C
    remainder is negative, return ((r + b) % b), else r unchanged" (so
    pmod(1, -4) = 1 and pmod(-9, -4) = -1; both the unconditional
    ((a%b)+b)%b a math-mod port would write AND the simpler r+b fixup
    are wrong on one quadrant each — traps this query's own first two
    drafts hit).  Each
    output column pins one semantic under both spellings; a port that
    assumes Python's // or swaps trunc for floor flips values on half
    the negative grid and breaks the hash.  The 19x4 operand grid
    covers both signs and both parities; pure literal fan-out, no
    table scan."""
    a = spark.range(-9, 10).select(F.col("id").alias("a"))
    b = spark.createDataFrame([(-4,), (-3,), (3,), (4,)], "b long")
    return (
        a.crossJoin(F.broadcast(b))
        .select(
            "a",
            "b",
            (F.col("a") % F.col("b")).cast("long").alias("c_mod"),
            F.pmod(F.col("a"), F.col("b")).cast("long").alias("positive_mod"),
            F.expr("a div b").cast("long").alias("trunc_div"),
            F.floor(F.col("a") / (1.0 * F.col("b"))).cast("long").alias("floor_div"),
        )
        .orderBy("a", "b")
    )


# CIDR blocks for the containment census: (label, network int, prefix).
# Integer forms precomputed in Python once; both dialects receive the
# same literals (the shared-literal discipline).
_CIDR_BLOCKS = [
    ("10.0.0.0/10", (10 << 24) | (0 << 16), 10),
    ("10.64.0.0/10", (10 << 24) | (64 << 16), 10),
    ("10.128.0.0/9", (10 << 24) | (128 << 16), 9),
    ("10.42.0.0/16", (10 << 24) | (42 << 16), 16),
    ("10.42.7.0/24", (10 << 24) | (42 << 16) | (7 << 8), 24),
]
_CIDR_SQL_VALUES = ", ".join(
    f"('{lbl}', {net}, {pfx}, {net + (1 << (32 - pfx))})" for lbl, net, pfx in _CIDR_BLOCKS
)


@register(
    "cidr_containment_census",
    oracle=f"""
    WITH ips AS (
        SELECT event_id, user_id,
               (10 * 16777216) + (user_id % 256) * 65536
               + (event_id % 256) * 256 + (user_id * 7 + event_id) % 256 AS ip
        FROM events
    ),
    blocks(label, net, prefix, net_end) AS (VALUES {_CIDR_SQL_VALUES}),
    hits AS (
        SELECT b.label, b.prefix, i.event_id, i.user_id,
               row_number() OVER (PARTITION BY i.event_id
                                  ORDER BY b.prefix DESC, b.label) AS spec_rank
        FROM ips i JOIN blocks b ON i.ip >= b.net AND i.ip < b.net_end
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_contained,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE spec_rank = 1) AS BIGINT) AS n_longest_prefix
    FROM hits GROUP BY label ORDER BY label
    """,
    tags=("engine", "cidr", "network-analytics", "longest-prefix-match"),
)
def cidr_containment_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR CONTAINMENT + LONGEST-PREFIX MATCH census — the network/
    security-log staple (which subnets does traffic fall in; which is
    the MOST SPECIFIC route): synthesized 10.x.y.z addresses as pure
    int32 arithmetic (no string IP parsing — the integer form is the
    scale-safe representation anyway), block membership as an integer
    range predicate against a broadcast 5-row CIDR table whose
    [net, net + 2^(32-prefix)) bounds are precomputed ONCE in Python
    into both dialects, and per-address longest-prefix winners via an
    event-partitioned rank over its (few) matching blocks.  Overlapping
    blocks (the /16 inside the /10, the /24 inside the /16) make
    containment and LPM counts genuinely different — a join that
    deduplicates matches or a rank ordered the wrong way breaks one
    column but not the other.  Plan: one scan, broadcast range join,
    bounded per-event rank."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (
            F.lit(10 * 16777216)
            + (F.col("user_id") % 256) * 65536
            + (F.col("event_id") % 256) * 256
            + (F.col("user_id") * 7 + F.col("event_id")) % 256
        ).alias("ip"),
    )
    blocks = F.broadcast(
        spark.createDataFrame(
            [(lbl, net, pfx, net + (1 << (32 - pfx))) for lbl, net, pfx in _CIDR_BLOCKS],
            "label string, net long, prefix int, net_end long",
        )
    )
    hits = e.join(blocks, (F.col("ip") >= F.col("net")) & (F.col("ip") < F.col("net_end")))
    w = Window.partitionBy("event_id").orderBy(F.col("prefix").desc(), F.col("label"))
    ranked = hits.withColumn("spec_rank", F.row_number().over(w))
    return (
        ranked.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_contained"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.sum(F.when(F.col("spec_rank") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_longest_prefix"),
        )
        .orderBy("label")
    )


@register(
    "schema_contract_audit",
    oracle="""
    WITH raw AS (
        SELECT 'lineitem' AS tbl, column_name AS col, column_type AS t FROM (DESCRIBE lineitem)
        UNION ALL SELECT 'orders', column_name, column_type FROM (DESCRIBE orders)
        UNION ALL SELECT 'customer', column_name, column_type FROM (DESCRIBE customer)
        UNION ALL SELECT 'events', column_name, column_type FROM (DESCRIBE events)
        UNION ALL SELECT 'documents', column_name, column_type FROM (DESCRIBE documents)
    )
    SELECT tbl, col,
           CASE t WHEN 'BIGINT' THEN 'int64' WHEN 'INTEGER' THEN 'int32'
                  WHEN 'DOUBLE' THEN 'float64' WHEN 'VARCHAR' THEN 'string'
                  WHEN 'TIMESTAMP' THEN 'timestamp'
                  ELSE lower(t) END AS canonical_type
    FROM raw ORDER BY tbl, col
    """,
    tags=("engine", "data-contract", "schema-audit", "metadata"),
)
def schema_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA CONTRACT audit — both engines independently introspect
    the SAME parquet fixtures and must land on the SAME canonical
    column typing (int64/int32/float64/string/timestamp): the
    data-contract check an ingest pipeline runs before trusting a feed,
    and here also a standing regression net around the loader itself —
    if `sources/tables.load_table`'s timestamp handling (NTZ inference,
    the round-3 TIMESTAMP(NANOS) migration) ever drifts a type, the
    Spark side's contract rows diverge from DuckDB's DESCRIBE and the
    hash breaks.  The Spark side is pure planning metadata
    (df.dtypes — no data read); the oracle is DuckDB's own catalog
    introspection.  Embeddings' nested list column is excluded (typed
    differently by design across engines)."""
    canon = {
        "bigint": "int64",
        "int": "int32",
        "double": "float64",
        "string": "string",
        "timestamp": "timestamp",
    }
    rows = []
    for tbl in ("lineitem", "orders", "customer", "events", "documents"):
        for col, dt in _t(spark, sf_dir, tbl).dtypes:
            rows.append((tbl, col, canon.get(dt, dt)))
    return spark.createDataFrame(
        rows, "tbl string, col string, canonical_type string"
    ).orderBy("tbl", "col")
