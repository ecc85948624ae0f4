"""Evaluation & association statistics (round-6 continuation wave).

The reference stops at means/corr/regression (``app.py:360-420``,
SURVEY §2.9); a production analytics engine is also asked to *judge*
things: is a classifier better than chance (kappa, AUC), are two
categoricals associated (Cramér's V), is a ledger's digit distribution
organic (Benford), how is inequality split across groups (Theil), and
is a feature encoding leaking its own row (leave-one-out target
encoding).  Each lands here as a catalog query with a DuckDB oracle.

Shared numeric discipline (see ``functions/scalars.py``): every count,
margin and rank is an exact int64; transcendental terms (ln, sqrt,
chi-square cells) are computed from identically-derived doubles in both
engines and micro/nano-quantized per bounded element BEFORE summing, so
every statistic is an order-independent integer sum + one final
division.  Scale notes per query docstring — nothing here materializes
more than a (groups x categories)-sized frame after its first
aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import (
    as_cents,
    round_det,
)
from real_time_big_data_iot_monitoring_pipeline_spark.operators import text
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# Benford expected first-digit shares log10(1 + 1/d), micro-quantized
# ONCE in Python and emitted as the same integer literals into both
# engines (the fellegi_sunter shared-literal pattern).
_BENFORD_MICRO = {d: int(math.floor(math.log10(1 + 1 / d) * 1_000_000 + 0.5)) for d in range(1, 10)}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {m}" for d, m in _BENFORD_MICRO.items()
) + " END"


@register(
    "benford_digit_census",
    oracle=f"""
    WITH v AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders WHERE o_totalprice > 0
    ),
    d AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM v GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM d)
    SELECT digit, n,
           (n * 1000000) // nt AS share_micro,
           {_BENFORD_SQL_CASE} AS expected_micro,
           abs((n * 1000000) // nt - ({_BENFORD_SQL_CASE})) AS dev_micro,
           CAST(floor(
               (CAST(n AS DOUBLE) - nt * (({_BENFORD_SQL_CASE}) / 1000000.0))
               * (CAST(n AS DOUBLE) - nt * (({_BENFORD_SQL_CASE}) / 1000000.0))
               / (nt * (({_BENFORD_SQL_CASE}) / 1000000.0))
               * 1000000 + 0.5 + 1e-8) AS BIGINT) AS chi2_micro
    FROM d CROSS JOIN tot
    ORDER BY digit
    """,
    tags=("evaluation", "benford", "data-quality", "forensics"),
)
def benford_digit_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit census over order totals — the
    forensic-accounting screen for fabricated or truncated monetary
    data (synthetic uniform-ish prices FAIL Benford, which is exactly
    what the hash pins; an organic ledger would track it).  The first
    significant digit is taken from the EXACT integer cents rendered as
    a string — integer-to-string is portable where double-to-string is
    not, and x100 never changes the leading significant digit.
    Expected shares log10(1+1/d) are micro-quantized once in Python and
    formatted into both dialects as the same 9 literals; observed
    shares use exact integer floor-division; each digit's chi-square
    cell is micro-quantized from identically-derived doubles.  Plan:
    one scan -> 9-row digit census; the total attaches by broadcast.
    Scale: output is 9 rows at any data size."""
    v = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0).select(
        as_cents(F.col("o_totalprice")).alias("cents")
    )
    d = v.select(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = F.broadcast(d.agg(F.sum("n").alias("nt")))
    exp_micro = F.lit(None).cast("long")
    for dig, m in _BENFORD_MICRO.items():
        exp_micro = F.when(F.col("digit") == dig, F.lit(m)).otherwise(exp_micro)
    share_micro = F.expr("(n * 1000000L) div nt")
    exp_n = F.col("nt") * (exp_micro / F.lit(1000000.0))
    diff = F.col("n").cast("double") - exp_n
    chi2_micro = F.floor(diff * diff / exp_n * 1000000 + F.lit(0.5 + 1e-8)).cast("long")
    return (
        d.crossJoin(tot)
        .select(
            "digit",
            "n",
            share_micro.alias("share_micro"),
            exp_micro.alias("expected_micro"),
            F.abs(share_micro - exp_micro).alias("dev_micro"),
            chi2_micro.alias("chi2_micro"),
        )
        .orderBy("digit")
    )


@register(
    "cramers_v_association",
    oracle="""
    WITH obs AS (
        SELECT CAST(c_nationkey AS BIGINT) AS r_key, c_mktsegment AS c_key,
               CAST(count(*) AS BIGINT) AS o
        FROM customer GROUP BY 1, 2
    ),
    rt AS (SELECT r_key, sum(o) AS r FROM obs GROUP BY 1),
    ct AS (SELECT c_key, sum(o) AS c FROM obs GROUP BY 1),
    n AS (SELECT sum(o) AS n FROM obs),
    cells AS (
        SELECT CAST(floor(
                   CAST(obs.o * n.n - rt.r * ct.c AS DOUBLE)
                   * CAST(obs.o * n.n - rt.r * ct.c AS DOUBLE)
                   / (CAST(n.n AS DOUBLE) * rt.r * ct.c)
                   * 1000000 + 0.5 + 1e-8) AS BIGINT) AS term_micro
        FROM obs JOIN rt USING (r_key) JOIN ct USING (c_key) CROSS JOIN n
    ),
    dims AS (
        SELECT (SELECT count(*) FROM rt) AS n_rows,
               (SELECT count(*) FROM ct) AS n_cols,
               (SELECT n FROM n) AS n,
               (SELECT sum(term_micro) FROM cells) AS chi2_micro
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_cols AS BIGINT) AS n_cols,
           ROUND(chi2_micro / 1000000.0 + 1e-8, 4) AS chi2,
           ROUND(sqrt((chi2_micro / 1000000.0)
                      / (n * least(n_rows - 1, n_cols - 1))) + 1e-8, 6) AS cramers_v
    FROM dims
    """,
    tags=("evaluation", "association", "cramers-v", "chi-square"),
)
def cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMER'S V effect size for the nation x market-segment
    contingency table — chi-square (`chi2_type_value`) answers "is
    there association?"; V answers "how much?", normalized to [0,1] so
    it is comparable across tables of different shape.  The chi-square
    sum reuses the exact (o*N - r*c)^2/(N*r*c) integer-numerator cell
    discipline, micro-quantized per cell; V derives from that SAME
    quantized sum (sqrt of exact-int ratios) so both engines round the
    same float.  Plan: one customer scan -> cell counts; margins
    re-aggregate the cell table; the V row is a 1-row reduce.  Scale:
    cell table is |nations| x |segments| at any data size."""
    obs = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").cast("long").alias("r_key"), F.col("c_mktsegment").alias("c_key"))
        .groupBy("r_key", "c_key")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = obs.groupBy("r_key").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("c_key").agg(F.sum("o").alias("c"))
    n = F.broadcast(obs.agg(F.sum("o").alias("n")))
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = diff * diff / (F.col("n").cast("double") * F.col("r") * F.col("c"))
    cells = (
        obs.join(F.broadcast(rt), "r_key")
        .join(F.broadcast(ct), "c_key")
        .crossJoin(n)
        .select(
            "n",
            "r_key",
            "c_key",
            F.floor(term * 1000000 + F.lit(0.5 + 1e-8)).cast("long").alias("term_micro"),
        )
    )
    agg = cells.agg(
        F.first("n").alias("n"),
        F.count_distinct("r_key").alias("n_rows"),
        F.count_distinct("c_key").alias("n_cols"),
        F.sum("term_micro").alias("chi2_micro"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_cols").cast("long").alias("n_cols"),
        round_det(F.col("chi2_micro") / 1000000.0, 4).alias("chi2"),
        round_det(
            F.sqrt(
                (F.col("chi2_micro") / 1000000.0)
                / (F.col("n") * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# Shared lang-id SQL fragment: MUST mirror operators/text.py LANG_MARKERS
# and its argmax tie-break order (de, en, es, fr — see
# lang_id_confusion_matrix in northstar_queries.py, driver-green r5).
_LANG_PRED_SQL = """
    s AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(lower(text), '\\b(the|and|of)\\b'))  AS score_en,
               len(regexp_extract_all(lower(text), '\\b(der|und|die)\\b')) AS score_de,
               len(regexp_extract_all(lower(text), '\\b(el|los|que)\\b'))  AS score_es,
               len(regexp_extract_all(lower(text), '\\b(le|les|des)\\b'))  AS score_fr
        FROM documents
    ),
    p AS (
        SELECT doc_id, lang AS true_lang,
               CASE WHEN greatest(score_en, score_de, score_es, score_fr) = 0 THEN 'und'
                    WHEN score_de = greatest(score_en, score_de, score_es, score_fr) THEN 'de'
                    WHEN score_en = greatest(score_en, score_de, score_es, score_fr) THEN 'en'
                    WHEN score_es = greatest(score_en, score_de, score_es, score_fr) THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM s
    )
"""


@register(
    "cohens_kappa_agreement",
    oracle="WITH " + _LANG_PRED_SQL + """,
    cells AS (
        SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS o
        FROM p GROUP BY 1, 2
    ),
    rm AS (SELECT true_lang AS cls, sum(o) AS r FROM cells GROUP BY 1),
    cm AS (SELECT pred_lang AS cls, sum(o) AS c FROM cells GROUP BY 1),
    tot AS (
        SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(sum(CASE WHEN true_lang = pred_lang THEN o ELSE 0 END) AS BIGINT) AS d
        FROM cells
    ),
    ex AS (
        SELECT CAST(sum(coalesce(rm.r, 0) * coalesce(cm.c, 0)) AS BIGINT) AS s
        FROM rm FULL OUTER JOIN cm USING (cls)
    )
    SELECT tot.n AS n_docs, tot.d AS n_agree,
           ROUND(tot.d / CAST(tot.n AS DOUBLE) + 1e-8, 6) AS po,
           ROUND(ex.s / (CAST(tot.n AS DOUBLE) * tot.n) + 1e-8, 6) AS pe,
           ROUND((tot.d * tot.n - ex.s) / CAST(tot.n * tot.n - ex.s AS DOUBLE) + 1e-8, 6) AS kappa
    FROM tot CROSS JOIN ex
    """,
    tags=("evaluation", "kappa", "agreement", "ml-eval"),
)
def cohens_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA chance-corrected agreement between the stopword
    lang-id heuristic and the corpus's labeled `lang` — the statistic
    that says whether the classifier beats the agreement a
    marginals-matching coin would get (`lang_id_confusion_matrix` shows
    WHERE it errs; kappa scores it).  Exactness: observed agreement d,
    total n, and the expected-agreement mass s = sum_c(row_c * col_c)
    are all exact int64 off the bounded confusion-cell table, so
    kappa = (d*n - s)/(n*n - s) is one float division of exact
    integers — no intermediate float sums to drift.  Plan: prediction
    is a pure map; cells/margins are |langs|^2-sized; a full outer join
    on the class label aligns margins for classes one side never
    emits."""
    docs = _t(spark, sf_dir, "documents")
    pred = text.lang_id(docs).select("doc_id", "lang_pred")
    p = (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .select("true_lang", F.col("lang_pred").alias("pred_lang"))
    )
    cells = p.groupBy("true_lang", "pred_lang").agg(F.count(F.lit(1)).alias("o"))
    rm = cells.groupBy(F.col("true_lang").alias("cls")).agg(F.sum("o").alias("r"))
    cm = cells.groupBy(F.col("pred_lang").alias("cls")).agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.sum(F.when(F.col("true_lang") == F.col("pred_lang"), F.col("o")).otherwise(0)).alias("d"),
    )
    ex = (
        rm.join(cm, "cls", "full_outer")
        .select((F.coalesce(F.col("r"), F.lit(0)) * F.coalesce(F.col("c"), F.lit(0))).alias("rc"))
        .agg(F.sum("rc").alias("s"))
    )
    return (
        tot.crossJoin(F.broadcast(ex))
        .select(
            F.col("n").cast("long").alias("n_docs"),
            F.col("d").cast("long").alias("n_agree"),
            round_det(F.col("d") / F.col("n").cast("double"), 6).alias("po"),
            round_det(F.col("s") / (F.col("n").cast("double") * F.col("n")), 6).alias("pe"),
            round_det(
                (F.col("d") * F.col("n") - F.col("s"))
                / (F.col("n") * F.col("n") - F.col("s")).cast("double"),
                6,
            ).alias("kappa"),
        )
    )


@register(
    "roc_auc_doclen_lang",
    oracle="""
    WITH g AS (
        SELECT source, CAST(n_chars AS BIGINT) AS score,
               CAST(count(*) AS BIGINT) AS n_tot,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        FROM documents GROUP BY 1, 2
    ),
    r AS (
        SELECT source, n_tot, n_pos,
               2 * coalesce(sum(n_tot) OVER (PARTITION BY source ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + n_tot + 1 AS midrank2
        FROM g
    ),
    a AS (
        SELECT source,
               CAST(sum(n_tot) AS BIGINT) AS n,
               CAST(sum(n_pos) AS BIGINT) AS n1,
               CAST(sum(n_tot) - sum(n_pos) AS BIGINT) AS n0,
               CAST(sum(n_pos * midrank2) AS BIGINT) AS s2
        FROM r GROUP BY 1
    )
    SELECT source, n, n1, n0,
           ROUND((s2 - n1 * (n1 + 1)) / (2.0 * n1 * n0) + 1e-8, 6) AS auc
    FROM a WHERE n1 > 0 AND n0 > 0
    ORDER BY source
    """,
    tags=("evaluation", "roc-auc", "rank-statistic", "ml-eval"),
)
def roc_auc_doclen_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC (ties handled by midranks) of document length as a
    predictor of lang='en', per source — the threshold-free classifier
    metric next to the thresholded confusion matrix and the
    calibration-oriented ECE.  AUC is computed by the Mann-Whitney
    rank-sum identity with AVERAGE ranks for ties: grouping by DISTINCT
    score first makes 2*midrank = 2*cum_before + n_tot + 1 an exact
    integer, so the positives' rank mass s2 is an exact int64 and AUC
    = (s2 - n1(n1+1)) / (2*n1*n0) is one final division.  Plan: one
    scan -> (source, score) cells, a source-PARTITIONED cumulative
    window over the bounded distinct-score table, one per-source
    reduce.  Degenerate sources (no positives or no negatives) are
    excluded by both engines.  Scale: everything after the first agg is
    distinct-score-sized and partitioned by source."""
    g = (
        _t(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").cast("long").alias("score"))
        .agg(
            F.count(F.lit(1)).alias("n_tot"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_pos"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.select(
        "source",
        "n_tot",
        "n_pos",
        (2 * F.coalesce(F.sum("n_tot").over(w), F.lit(0)) + F.col("n_tot") + 1).alias("midrank2"),
    )
    a = r.groupBy("source").agg(
        F.sum("n_tot").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("n1"),
        (F.sum("n_tot") - F.sum("n_pos")).cast("long").alias("n0"),
        # decimal(38,0): rank-sum is n^2-law (round-11 scale audit)
        F.sum(
            F.col("n_pos").cast("decimal(38,0)") * F.col("midrank2").cast("decimal(38,0)")
        ).alias("s2"),
    )
    return (
        a.where((F.col("n1") > 0) & (F.col("n0") > 0))
        .select(
            "source",
            "n",
            "n1",
            "n0",
            round_det(
                (
                    F.col("s2")
                    - F.col("n1").cast("decimal(38,0)")
                    * (F.col("n1") + 1).cast("decimal(38,0)")
                )
                / (2.0 * F.col("n1") * F.col("n0")),
                6,
            ).alias("auc"),
        )
        .orderBy("source")
    )


@register(
    "theil_index_decomposition",
    oracle="""
    WITH x AS (
        SELECT c.c_nationkey AS g,
               o.o_custkey AS id,
               sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS xi
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, CAST(sum(xi) AS BIGINT) AS xg FROM x GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(xi) AS BIGINT) AS xt FROM x),
    per AS (
        SELECT
            CAST(floor((CAST(x.xi AS DOUBLE) / tot.xt)
                       * ln(CAST(x.xi * tot.n AS DOUBLE) / tot.xt)
                       * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano_total,
            CAST(floor((CAST(x.xi AS DOUBLE) / tot.xt)
                       * ln(CAST(x.xi * grp.ng AS DOUBLE) / grp.xg)
                       * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano_within
        FROM x JOIN grp USING (g) CROSS JOIN tot
    ),
    btw AS (
        SELECT CAST(floor((CAST(grp.xg AS DOUBLE) / tot.xt)
                          * ln((CAST(grp.xg AS DOUBLE) * tot.n) / (CAST(tot.xt AS DOUBLE) * grp.ng))
                          * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano_between
        FROM grp CROSS JOIN tot
    )
    SELECT (SELECT n FROM tot) AS n_customers,
           (SELECT count(*) FROM grp) AS n_groups,
           ROUND((SELECT sum(nano_total) FROM per) / 1000000000.0 + 1e-8, 6) AS theil_total,
           ROUND((SELECT sum(nano_within) FROM per) / 1000000000.0 + 1e-8, 6) AS theil_within,
           ROUND((SELECT sum(nano_between) FROM btw) / 1000000000.0 + 1e-8, 6) AS theil_between
    """,
    tags=("evaluation", "inequality", "theil", "decomposition"),
)
def theil_index_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL T inequality index of customer spend, DECOMPOSED into
    within-nation and between-nation components — the additive property
    Gini lacks (`customer_spend_gini` gives the headline number; Theil
    says whether inequality lives inside groups or across them).
    Per-customer contribution (xi/X)ln(xi*n/X), within-group twin
    (xi/X)ln(xi*ng/Xg), per-group between term (Xg/X)ln(Xg*n/(X*ng)) —
    every numerator/denominator an exact int64 product BEFORE the one
    cast to double, each element nano-quantized, so all three sums are
    order-independent.  T_total ~= T_within + T_between up to
    per-element quantization (each component is hashed independently,
    not derived from the others).  Plan: one per-customer agg, group
    margins re-aggregate the customer table, margins broadcast; the
    between term is groups-sized."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    x = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("g"), F.col("o_custkey").alias("id"))
        .agg(F.sum(as_cents(F.col("o_totalprice"))).alias("xi"))
    )
    grp = x.groupBy("g").agg(F.count(F.lit(1)).alias("ng"), F.sum("xi").alias("xg"))
    tot = F.broadcast(x.agg(F.count(F.lit(1)).alias("n"), F.sum("xi").alias("xt")))
    per = (
        x.join(F.broadcast(grp), "g")
        .crossJoin(tot)
        .select(
            F.floor(
                (F.col("xi").cast("double") / F.col("xt"))
                * F.log((F.col("xi") * F.col("n")).cast("double") / F.col("xt"))
                * 1000000000
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("nano_total"),
            F.floor(
                (F.col("xi").cast("double") / F.col("xt"))
                * F.log((F.col("xi") * F.col("ng")).cast("double") / F.col("xg"))
                * 1000000000
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("nano_within"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("nano_total").alias("s_total"),
            F.sum("nano_within").alias("s_within"),
        )
    )
    btw = (
        grp.crossJoin(tot)
        .select(
            F.floor(
                (F.col("xg").cast("double") / F.col("xt"))
                * F.log(
                    (F.col("xg").cast("double") * F.col("n"))
                    / (F.col("xt").cast("double") * F.col("ng"))
                )
                * 1000000000
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("nano_between")
        )
        .agg(F.count(F.lit(1)).alias("n_groups"), F.sum("nano_between").alias("s_between"))
    )
    return per.crossJoin(F.broadcast(btw)).select(
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("n_groups").cast("long").alias("n_groups"),
        round_det(F.col("s_total") / 1000000000.0, 6).alias("theil_total"),
        round_det(F.col("s_within") / 1000000000.0, 6).alias("theil_within"),
        round_det(F.col("s_between") / 1000000000.0, 6).alias("theil_between"),
    )


@register(
    "target_encode_loo",
    oracle="""
    WITH o AS (
        SELECT c.c_mktsegment AS segment, o.o_orderkey,
               CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    m AS (SELECT segment, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
          FROM o GROUP BY 1),
    ranked AS (
        SELECT o.segment, o.o_orderkey, o.cents, m.n, m.s,
               row_number() OVER (PARTITION BY o.segment
                                  ORDER BY o.cents DESC, o.o_orderkey) AS rk
        FROM o JOIN m USING (segment)
    )
    SELECT segment, o_orderkey,
           ROUND(cents / 100.0 + 1e-8, 2) AS price,
           ROUND((s - cents) / (CAST(n - 1 AS DOUBLE) * 100.0) + 1e-8, 4) AS loo_enc,
           n AS segment_n
    FROM ranked WHERE rk <= 3
    ORDER BY segment, o_orderkey
    """,
    tags=("evaluation", "target-encoding", "leakage-safe", "ml-prep"),
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding of market segment against order
    total — the leakage-safe categorical encoder (plain mean encoding
    lets each row see its own target; LOO subtracts it:
    enc_i = (S_g - x_i)/(n_g - 1)).  The hash pins the rows where
    leakage would bite hardest: each segment's 3 most extreme orders,
    whose LOO encodings differ most from the plain mean.  Exactness:
    segment sums and counts are exact cents/int64; each encoding is one
    division of exact integers.  Plan: one join + one segment-margin
    agg that BROADCASTS back (margins are |segments|-sized), a
    segment-partitioned top-k window — no per-row second scan, no
    fold-level shuffle.  Scale: the window sorts within segments only;
    margins stay tiny at any data size."""
    o = (
        _t(spark, sf_dir, "orders")
        .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            as_cents(F.col("o_totalprice")).alias("cents"),
        )
    )
    m = o.groupBy("segment").agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    w = Window.partitionBy("segment").orderBy(F.col("cents").desc(), F.col("o_orderkey"))
    return (
        o.join(F.broadcast(m), "segment")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "segment",
            "o_orderkey",
            round_det(F.col("cents") / 100.0, 2).alias("price"),
            round_det(
                (F.col("s") - F.col("cents")) / ((F.col("n") - 1).cast("double") * 100.0), 4
            ).alias("loo_enc"),
            F.col("n").alias("segment_n"),
        )
        .orderBy("segment", "o_orderkey")
    )


@register(
    "stratified_split_assignment",
    oracle="""
    WITH a AS (
        SELECT source,
               CASE WHEN ((doc_id % 1000000007) * 1000003) % 1000000007 % 10 < 8 THEN 'train'
                    WHEN ((doc_id % 1000000007) * 1000003) % 1000000007 % 10 = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    c AS (SELECT source, split, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1, 2),
    t AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1)
    SELECT c.source, c.split, c.n,
           ROUND(c.n / CAST(t.nt AS DOUBLE) + 1e-8, 6) AS share
    FROM c JOIN t USING (source)
    ORDER BY source, split
    """,
    tags=("evaluation", "train-test-split", "deterministic-hash", "ml-prep"),
)
def stratified_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC 80/10/10 train/val/test assignment by an
    engine-neutral multiplicative hash of the document id, audited per
    source stratum — the split step every training pipeline runs, made
    reproducible (re-running on a grown corpus never reassigns an
    existing doc, unlike any sample()-based split).  The hash is
    (id % p) * 1000003 % p % 10 with p = 1e9+7: mod-first keeps the
    product under 2^63 at ANY id scale, and both engines evaluate the
    same integer arithmetic (never a builtin string/hash function,
    which differ per engine).  Plan: pure map + one (source x split)
    census; per-source totals re-aggregate the census.  Scale: output
    is 3 rows per source at any corpus size."""
    bucket = ((F.col("doc_id") % 1000000007) * 1000003) % 1000000007 % 10
    a = _t(spark, sf_dir, "documents").select(
        "source",
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias("split"),
    )
    c = a.groupBy("source", "split").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("nt"))
    return (
        c.join(F.broadcast(t), "source")
        .select(
            "source",
            "split",
            "n",
            round_det(F.col("n") / F.col("nt").cast("double"), 6).alias("share"),
        )
        .orderBy("source", "split")
    )


@register(
    "grouped_mode_exact",
    oracle="""
    WITH c AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_quantity * 100, 0) AS BIGINT) AS qc,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    r AS (
        SELECT flag, qc, cnt,
               row_number() OVER (PARTITION BY flag ORDER BY cnt DESC, qc) AS rk,
               count(*) OVER (PARTITION BY flag) AS n_distinct
        FROM c
    )
    SELECT flag,
           ROUND(qc / 100.0 + 1e-8, 2) AS mode_qty,
           cnt AS n_occurrences,
           CAST(n_distinct AS BIGINT) AS n_distinct_values
    FROM r WHERE rk = 1
    ORDER BY flag
    """,
    tags=("evaluation", "mode", "exact", "aggregate"),
)
def grouped_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group MODE (most frequent value) of lineitem quantity
    per return flag, with a deterministic smallest-value tie-break —
    the aggregate Spark only ships as the approximate `mode()`
    expression whose tie behavior is undefined; an exact, pinned-tie
    mode is what a data-profiling pass actually needs.  Two hash
    aggregations: value counts (map-side combinable), then a
    flag-partitioned argmax window over the DISTINCT-VALUE table —
    never the fact table.  Values compare as exact integer cents.
    Scale: the window input is (groups x distinct values), independent
    of row count."""
    c = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            as_cents(F.col("l_quantity")).alias("qc"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("flag").orderBy(F.col("cnt").desc(), F.col("qc"))
    wc = Window.partitionBy("flag")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .withColumn("n_distinct", F.count(F.lit(1)).over(wc))
        .where(F.col("rk") == 1)
        .select(
            "flag",
            round_det(F.col("qc") / 100.0, 2).alias("mode_qty"),
            F.col("cnt").alias("n_occurrences"),
            F.col("n_distinct").cast("long").alias("n_distinct_values"),
        )
        .orderBy("flag")
    )


@register(
    "effect_size_cohens_d",
    oracle="""
    WITH arms AS (
        SELECT CAST(user_id % 2 AS INT) AS arm,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
    ),
    m AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(vc) AS BIGINT) AS s,
               CAST(sum(vc * vc) AS BIGINT) AS q
        FROM arms GROUP BY arm
    ),
    w AS (
        SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
               max(CASE WHEN arm = 0 THEN s END) AS s0,
               max(CASE WHEN arm = 0 THEN q END) AS q0,
               max(CASE WHEN arm = 1 THEN n END) AS n1,
               max(CASE WHEN arm = 1 THEN s END) AS s1,
               max(CASE WHEN arm = 1 THEN q END) AS q1
        FROM m
    ),
    c AS (
        SELECT n0, n1,
               (s1 / (1.0 * n1)) - (s0 / (1.0 * n0)) AS diff,
               sqrt(((q1 - (CAST(s1 AS DOUBLE) * s1) / n1)
                     + (q0 - (CAST(s0 AS DOUBLE) * s0) / n0))
                    / (n1 + n0 - 2)) AS sp
        FROM w
    )
    SELECT n0, n1,
           ROUND(diff / 100.0 + 1e-8, 4) AS mean_diff,
           ROUND(sp / 100.0 + 1e-8, 4) AS pooled_sd,
           ROUND(diff / sp + 1e-8, 6) AS cohens_d,
           ROUND((diff / sp) * (1.0 - 3.0 / (4.0 * (n1 + n0) - 9.0)) + 1e-8, 6) AS hedges_g
    FROM c
    """,
    tags=("evaluation", "effect-size", "cohens-d", "ab-testing"),
)
def effect_size_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S D and HEDGES' G standardized effect sizes for the A/B
    split — the number a result writeup must carry NEXT TO the p-value
    (`ab_conversion_ztest` says "is it real?"; d says "is it big
    enough to matter?", and g corrects d's small-sample bias with the
    (1 - 3/(4N-9)) factor).  Everything derives from exact integer
    cents moments — per-arm n/sum/sum-of-squares — through one
    identical double expression (pooled SD, then the two ratios), so a
    single division chain produces both engines' rounded values.
    Plan: one scan, one 2-row map-side-combinable aggregate, 1-row
    arithmetic."""
    arms = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        as_cents(F.col("value")).alias("vc"),
    )
    # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
    vcd = F.col("vc").cast("decimal(38,0)")
    m = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        F.sum(vcd * vcd).alias("q"),
    )
    w = m.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("arm") == 0, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == 1, F.col("q"))).alias("q1"),
    )
    diff = (F.col("s1") / (1.0 * F.col("n1"))) - (F.col("s0") / (1.0 * F.col("n0")))
    sp = F.sqrt(
        (
            (F.col("q1") - (F.col("s1").cast("double") * F.col("s1")) / F.col("n1"))
            + (F.col("q0") - (F.col("s0").cast("double") * F.col("s0")) / F.col("n0"))
        )
        / (F.col("n1") + F.col("n0") - 2)
    )
    return w.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        round_det(diff / 100.0, 4).alias("mean_diff"),
        round_det(sp / 100.0, 4).alias("pooled_sd"),
        round_det(diff / sp, 6).alias("cohens_d"),
        round_det(
            (diff / sp) * (1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n0")) - 9.0)), 6
        ).alias("hedges_g"),
    )


@register(
    "levene_variance_test",
    oracle="""
    WITH v AS (
        SELECT event_type, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
    ),
    r AS (
        SELECT event_type, vc,
               row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    med AS (
        SELECT event_type, CAST(vc AS BIGINT) AS med
        FROM r WHERE rk = (n + 1) // 2
    ),
    z AS (
        SELECT v.event_type, abs(v.vc - med.med) AS z
        FROM v JOIN med USING (event_type)
    ),
    g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(z) AS BIGINT) AS s,
               CAST(sum(z * z) AS BIGINT) AS q
        FROM z GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
               CAST(count(*) AS BIGINT) AS k,
               CAST(sum(q) AS BIGINT) AS qq
        FROM g
    ),
    parts AS (
        SELECT tot.nn, tot.k,
               sum((CAST(g.s AS DOUBLE) * g.s) / g.n) - (CAST(tot.ss AS DOUBLE) * tot.ss) / tot.nn AS ssb,
               tot.qq - sum((CAST(g.s AS DOUBLE) * g.s) / g.n) AS ssw
        FROM g CROSS JOIN tot GROUP BY tot.nn, tot.k, tot.qq, tot.ss
    )
    SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS n_groups,
           ROUND((ssb / (k - 1)) / (ssw / (nn - k)) + 1e-8, 6) AS levene_w
    FROM parts
    """,
    tags=("evaluation", "variance-homogeneity", "levene", "brown-forsythe"),
)
def levene_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN-FORSYTHE (median-centered Levene) variance-homogeneity
    statistic across event types — the gate check BEFORE trusting
    `anova_value_by_type`'s equal-variance assumption: one-way ANOVA on
    the absolute deviations from each group's MEDIAN (median-centering
    is the robust variant; mean-centering is classic Levene).  The
    group median is the exact LOWER MEDIAN order statistic (rank
    (n+1)//2 with a unique tie-break) so deviations are exact int64,
    and the F-ratio comes from exact integer moments of those
    deviations — one float division chain at the end.  Plan: one
    type-partitioned rank window for medians (bounded per type), one
    broadcast median join, two map-side aggregates."""
    v = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", as_cents(F.col("value")).alias("vc")
    )
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    wc = Window.partitionBy("event_type")
    r = v.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    med = r.where(F.col("rk") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("vc").alias("med")
    )
    z = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("vc") - F.col("med")).alias("z")
    )
    # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
    zd = F.col("z").cast("decimal(38,0)")
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z").alias("s"),
        F.sum(zd * zd).alias("q"),
    )
    tot = F.broadcast(
        g.agg(
            F.sum("n").alias("nn"),
            F.sum("s").alias("ss"),
            F.count(F.lit(1)).alias("k"),
            F.sum("q").alias("qq"),
        )
    )
    parts = (
        g.crossJoin(tot)
        .groupBy("nn", "k", "qq", "ss")
        .agg(
            (
                F.sum((F.col("s").cast("double") * F.col("s")) / F.col("n"))
                - (F.col("ss").cast("double") * F.col("ss")) / F.col("nn")
            ).alias("ssb"),
            (
                F.col("qq") - F.sum((F.col("s").cast("double") * F.col("s")) / F.col("n"))
            ).alias("ssw"),
        )
    )
    return parts.select(
        F.col("nn").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_groups"),
        round_det(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("nn") - F.col("k"))), 6
        ).alias("levene_w"),
    )


@register(
    "average_precision_doclen_lang",
    oracle="""
    WITH g AS (
        SELECT source, CAST(n_chars AS BIGINT) AS score,
               CAST(count(*) AS BIGINT) AS n_tot,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        FROM documents GROUP BY 1, 2
    ),
    r AS (
        SELECT source, score, n_tot, n_pos,
               CAST(sum(n_tot) OVER w AS BIGINT) AS cum_n,
               CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos
        FROM g
        WINDOW w AS (PARTITION BY source ORDER BY score DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    terms AS (
        SELECT source, n_pos,
               CAST(floor((CAST(cum_pos AS DOUBLE) / cum_n)
                          * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS prec_nano
        FROM r WHERE n_pos > 0
    ),
    a AS (
        SELECT source,
               CAST(sum(n_pos) AS BIGINT) AS n1,
               CAST(sum(n_pos * prec_nano) AS BIGINT) AS s
        FROM terms GROUP BY 1
    ),
    tot AS (SELECT source, CAST(sum(n_tot) AS BIGINT) AS n FROM g GROUP BY 1)
    SELECT a.source, tot.n, a.n1,
           ROUND(a.s / (1000000000.0 * a.n1) + 1e-8, 6) AS average_precision
    FROM a JOIN tot USING (source) WHERE a.n1 > 0
    ORDER BY a.source
    """,
    tags=("evaluation", "average-precision", "pr-curve", "ml-eval"),
)
def average_precision_doclen_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVERAGE PRECISION (PR-curve area) of document length predicting
    lang='en', per source — the imbalanced-data companion to
    `roc_auc_doclen_lang`: ROC-AUC stays optimistic when positives are
    rare; AP weights by precision AT each positive.  Tie handling is
    the group-wise convention: scores collapse to DISTINCT values
    (descending), precision at a tie block counts the whole block, and
    each block contributes n_pos * precision.  Precision per block is
    nano-quantized from exact prefix counts (source-partitioned window
    over the distinct-score table), so per-source AP is an
    order-independent integer sum + one division.  Degenerate sources
    (no positives) are excluded by both engines."""
    g = (
        _t(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").cast("long").alias("score"))
        .agg(
            F.count(F.lit(1)).alias("n_tot"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_pos"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = g.select(
        "source",
        "n_tot",
        "n_pos",
        F.sum("n_tot").over(w).alias("cum_n"),
        F.sum("n_pos").over(w).alias("cum_pos"),
    )
    terms = r.where(F.col("n_pos") > 0).select(
        "source",
        "n_pos",
        F.floor(
            (F.col("cum_pos").cast("double") / F.col("cum_n")) * 1000000000
            + F.lit(0.5 + 1e-8)
        )
        .cast("long")
        .alias("prec_nano"),
    )
    a = terms.groupBy("source").agg(
        F.sum("n_pos").cast("long").alias("n1"),
        # decimal(38,0): nano-quantized rank products are n*1e9-law
        # (round-11 scale audit)
        F.sum(
            F.col("n_pos").cast("decimal(38,0)") * F.col("prec_nano").cast("decimal(38,0)")
        ).alias("s"),
    )
    tot = g.groupBy("source").agg(F.sum("n_tot").cast("long").alias("n"))
    return (
        a.join(tot, "source")
        .where(F.col("n1") > 0)
        .select(
            "source",
            "n",
            "n1",
            round_det(F.col("s") / (1000000000.0 * F.col("n1")), 6).alias(
                "average_precision"
            ),
        )
        .orderBy("source")
    )


@register(
    "fano_factor_burstiness",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
        FROM daily GROUP BY 1
    )
    SELECT event_type, n_days, s AS n_events,
           ROUND(s / (1.0 * n_days) + 1e-8, 4) AS mean_daily,
           ROUND(((q - (CAST(s AS DOUBLE) * s) / n_days) / (n_days - 1))
                 / (s / (1.0 * n_days)) + 1e-8, 6) AS fano_factor
    FROM m ORDER BY event_type
    """,
    tags=("evaluation", "burstiness", "fano-factor", "dispersion"),
)
def fano_factor_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FANO FACTOR (variance-to-mean dispersion index) of daily event
    counts per type — the burstiness screen: a Poisson-like arrival
    process sits near 1, machine retries / thundering herds push far
    above, rate-limited feeds below — the first question an ingest SRE
    asks of `events_per_day` before alerting thresholds mean anything.
    Exact integer daily counts and moments, one identical double
    division chain at the end.  Plan: day-grain agg (calendar-bounded),
    type-level fold."""
    daily = _t(spark, sf_dir, "events").groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / F.lit(86400)).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    # decimal(38,0): per-day counts grow with corpus volume, so c*c is
    # quadratic-in-volume per cell (round-11 scale audit)
    cd = F.col("c").cast("decimal(38,0)")
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(cd * cd).alias("q"),
    )
    return m.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("n_events"),
        round_det(F.col("s") / (1.0 * F.col("n_days")), 4).alias("mean_daily"),
        round_det(
            (
                (F.col("q") - (F.col("s").cast("double") * F.col("s")) / F.col("n_days"))
                / (F.col("n_days") - 1)
            )
            / (F.col("s") / (1.0 * F.col("n_days"))),
            6,
        ).alias("fano_factor"),
    ).orderBy("event_type")


@register(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS a, next_type AS b, CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    rowt AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM trans GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM trans),
    terms AS (
        SELECT CAST(floor(
                   (CAST(rowt.ra AS DOUBLE) / tot.n)
                   * ((CAST(t.c AS DOUBLE) / rowt.ra)
                      * ln(CAST(t.c AS DOUBLE) / rowt.ra))
                   * -1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano
        FROM trans t JOIN rowt USING (a) CROSS JOIN tot
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM trans) AS n_transitions_distinct,
           (SELECT n FROM tot) AS n_transitions,
           ROUND((SELECT sum(nano) FROM terms) / 1000000000.0 + 1e-8, 6)
               AS entropy_rate_nats
    """,
    tags=("evaluation", "markov", "entropy-rate", "sequence"),
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTROPY RATE of the per-user event-type Markov chain —
    H = sum_a pi(a) * H(next | a) with pi taken as the empirical source
    distribution of transitions: the single number that says how
    PREDICTABLE user behavior is (0 = deterministic flows, ln(k) =
    uniform churn), the summary statistic over
    `event_markov_transitions`' full matrix.  Each (a, b) cell's
    -pi(a) p(b|a) ln p(b|a) is computed from exact integer counts in
    one identical double expression and nano-quantized, so the rate is
    an order-independent integer sum over the (types x types)-bounded
    cell table.  Plan: one user-partitioned lead window, one cell agg,
    margins re-aggregate cells."""
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        seq.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("next_type").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rowt = trans.groupBy("a").agg(F.sum("c").alias("ra"))
    tot = F.broadcast(trans.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("nd")))
    terms = (
        trans.join(F.broadcast(rowt), "a")
        .crossJoin(tot)
        .select(
            "n",
            "nd",
            F.floor(
                (F.col("ra").cast("double") / F.col("n"))
                * (
                    (F.col("c").cast("double") / F.col("ra"))
                    * F.log(F.col("c").cast("double") / F.col("ra"))
                )
                * -1000000000
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("nano"),
        )
    )
    return terms.agg(
        F.first("nd").cast("long").alias("n_transitions_distinct"),
        F.first("n").cast("long").alias("n_transitions"),
        round_det(F.sum("nano") / 1000000000.0, 6).alias("entropy_rate_nats"),
    )


@register(
    "median_ci_order_statistic",
    oracle="""
    WITH v AS (
        SELECT event_type, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
    ),
    r AS (
        SELECT event_type, vc,
               row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    bounds AS (
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(floor((n - 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT) AS lo_rank,
               CAST(floor((n + 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2) + 1 AS BIGINT) AS hi_rank,
               (n + 1) // 2 AS med_rank
        FROM (SELECT DISTINCT event_type, n FROM r)
    )
    SELECT b.event_type, b.n,
           ROUND(max(CASE WHEN r.rk = b.med_rank THEN r.vc END) / 100.0 + 1e-8, 2) AS median,
           ROUND(max(CASE WHEN r.rk = b.lo_rank THEN r.vc END) / 100.0 + 1e-8, 2) AS ci_lo,
           ROUND(max(CASE WHEN r.rk = b.hi_rank THEN r.vc END) / 100.0 + 1e-8, 2) AS ci_hi,
           max(b.lo_rank) AS lo_rank, max(b.hi_rank) AS hi_rank
    FROM r JOIN bounds b USING (event_type)
    GROUP BY b.event_type, b.n
    ORDER BY b.event_type
    """,
    tags=("evaluation", "median-ci", "order-statistic", "distribution-free"),
)
def median_ci_order_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION-FREE 95% confidence interval for the per-type
    MEDIAN via ORDER STATISTICS — no resampling at all: the binomial
    argument (each observation falls below the true median with
    p = 1/2) gives CI bounds at ranks (n -+ z*sqrt(n))/2, so the
    interval is just two more rank lookups in the same sort that finds
    the median (the z=1.959964 literal is shared by both engines; the
    normal approximation to Binomial(n, 1/2) is the standard form at
    these n).  Contrast with `poisson_bootstrap_ci`: that family pays
    a 32x resample fan-out for arbitrary statistics; the median needs
    none.  Values are exact cents; ranks are exact integers with a
    unique tie-break, so all three lookups are integer decisions.
    Plan: one type-partitioned rank window + a bounds join — the
    windows are per-type, never global."""
    v = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", as_cents(F.col("value")).alias("vc")
    )
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    wc = Window.partitionBy("event_type")
    r = v.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    bounds = (
        r.select("event_type", "n")
        .distinct()
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor((F.col("n") - 1.959964 * F.sqrt(F.col("n").cast("double"))) / 2)
            .cast("long")
            .alias("lo_rank"),
            (F.floor((F.col("n") + 1.959964 * F.sqrt(F.col("n").cast("double"))) / 2) + 1)
            .cast("long")
            .alias("hi_rank"),
            F.expr("(n + 1) div 2").alias("med_rank"),
        )
    )
    j = r.join(F.broadcast(bounds.withColumnRenamed("n", "nb")), "event_type")
    return (
        j.groupBy("event_type", "nb")
        .agg(
            round_det(
                F.max(F.when(F.col("rk") == F.col("med_rank"), F.col("vc"))) / 100.0, 2
            ).alias("median"),
            round_det(
                F.max(F.when(F.col("rk") == F.col("lo_rank"), F.col("vc"))) / 100.0, 2
            ).alias("ci_lo"),
            round_det(
                F.max(F.when(F.col("rk") == F.col("hi_rank"), F.col("vc"))) / 100.0, 2
            ).alias("ci_hi"),
            F.max("lo_rank").alias("lo_rank"),
            F.max("hi_rank").alias("hi_rank"),
        )
        .select(
            "event_type",
            F.col("nb").alias("n"),
            "median",
            "ci_lo",
            "ci_hi",
            "lo_rank",
            "hi_rank",
        )
        .orderBy("event_type")
    )
