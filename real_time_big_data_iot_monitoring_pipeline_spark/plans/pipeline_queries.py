"""Round-2 pipeline catalog: time-series repair (resample/gap-fill,
sessionization), corpus analytics (TF-IDF, duplicate components,
k-means cluster stats), and the pivot surface.

These extend the reference inventory the same way the north-star set
does: the reference's dashboard assumes dense IoT feeds and a curated
corpus; these are the operators that MAKE the feed dense and the corpus
curated at 100 TB.  Every query keeps the determinism contract:
epoch-integer timestamps, cents-exact / quantized-integer aggregation,
unique-key tie-breaks, round-before-rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det
from real_time_big_data_iot_monitoring_pipeline_spark.operators import dedup, text, timeseries
from real_time_big_data_iot_monitoring_pipeline_spark.plans.northstar_queries import _ivf_kmeans_prefix
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# Time-series repair
# --------------------------------------------------------------------------
_AVG_FIXED_SQL = "ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value))) + 1e-8, 4)"


@register(
    "resample_gap_fill",
    oracle=f"""
    WITH agg AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
               count(*) AS n_events,
               {_AVG_FIXED_SQL} AS avg_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1 FROM agg GROUP BY 1),
    grid AS (SELECT event_type, unnest(generate_series(b0, b1)) AS bucket FROM bounds)
    SELECT g.event_type, g.bucket, g.bucket * 3600 AS bucket_start,
           COALESCE(a.n_events, 0) AS n_events, a.avg_value,
           last_value(a.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket ROWS UNBOUNDED PRECEDING) AS avg_value_ff,
           CASE WHEN a.n_events IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM grid g LEFT JOIN agg a USING (event_type, bucket)
    """,
    tags=("pipeline", "timeseries", "resample"),
)
def resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type resample with forward fill — the repair a sparse
    IoT feed needs before the reference's charting surface
    (streamlit_dashboard.py:676-696 assumes dense series).  One hash agg
    on (type, bucket), a per-type dense grid (O(types*hours), never the
    raw rows again), one window carry."""
    return timeseries.resample_gap_fill(_events(spark, sf_dir), "event_type", "ts", "value")


@register(
    "resample_interpolate",
    oracle=f"""
    WITH agg AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
               count(*) AS n_events,
               {_AVG_FIXED_SQL} AS avg_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1 FROM agg GROUP BY 1),
    grid AS (SELECT event_type, unnest(generate_series(b0, b1)) AS bucket FROM bounds),
    j AS (
        SELECT g.event_type, g.bucket,
               COALESCE(a.n_events, 0) AS n_events, a.avg_value,
               last_value(a.avg_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.bucket ROWS UNBOUNDED PRECEDING) AS pv,
               last_value(CASE WHEN a.avg_value IS NOT NULL THEN g.bucket END IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.bucket ROWS UNBOUNDED PRECEDING) AS pb,
               first_value(a.avg_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN a.avg_value IS NOT NULL THEN g.bucket END IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        FROM grid g LEFT JOIN agg a USING (event_type, bucket)
    )
    SELECT event_type, bucket, n_events, avg_value,
           CASE WHEN avg_value IS NOT NULL THEN avg_value
                ELSE ROUND(pv + (nv - pv) * ((bucket - pb) / CAST(nb - pb AS DOUBLE)) + 1e-8, 4)
           END AS avg_value_interp,
           CASE WHEN avg_value IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM j
    """,
    tags=("pipeline", "timeseries", "resample"),
)
def resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type resample with LINEAR interpolation across gaps —
    the `interpolate(method='linear')` counterpart of
    `resample_gap_fill`'s forward fill; anchors come from IGNORE-NULLS
    windows on both sides of the gap."""
    return timeseries.resample_interpolate(_events(spark, sf_dir), "event_type", "ts", "value")


_SUM_FIXED_SQL = "ROUND((sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0) + 1e-8, 2)"


@register(
    "sessionize_events",
    oracle=f"""
    WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus, value,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
    ),
    y AS (
        SELECT user_id, event_id, tus, value,
               CASE WHEN prev IS NULL OR tus - prev > 3600000000 THEN 1 ELSE 0 END AS ns
        FROM x
    ),
    z AS (
        SELECT user_id, tus, value,
               CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM y
    )
    SELECT user_id, session_id,
           min(tus) AS session_start_us, max(tus) AS session_end_us,
           count(*) AS n_events,
           {_SUM_FIXED_SQL} AS sum_value,
           max(tus) - min(tus) AS duration_us
    FROM z GROUP BY 1, 2
    """,
    tags=("pipeline", "timeseries", "sessionize"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (1-hour inactivity breaks a session) —
    the batch twin of `session_window_agg` with explicit per-user session
    ordinals (lag -> flag -> running sum, one key shuffle)."""
    return timeseries.sessionize(
        _events(spark, sf_dir), "user_id", "ts", "event_id", "value", gap_seconds=3600
    )


# --------------------------------------------------------------------------
# Corpus analytics
# --------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks WHERE length(term) > 0 GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    idf AS (
        SELECT term, df,
               CAST(floor((ln(CAST(n_docs AS DOUBLE) / df) + 1.0) * 1000000.0 + 0.5 + 1e-8) AS BIGINT) AS idf_micro
        FROM dfreq, nd
    ),
    s AS (
        SELECT tf.doc_id, tf.term, tf.tf, idf.df, tf.tf * idf.idf_micro AS score_micro
        FROM tf JOIN idf USING (term)
    )
    SELECT doc_id, term, tf, df, score_micro, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, term) AS rank
        FROM s
    ) WHERE rank <= 5
    """,
    tags=("pipeline", "text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document.  idf quantized to integer
    micro-units per term, so the ranking score tf*idf_micro is an exact
    integer — rank order and values bit-identical across engines."""
    return text.tfidf_top_terms(_docs(spark, sf_dir), top_k=5)


@register(
    "dedup_components",
    oracle="""
    WITH RECURSIVE w AS (
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
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(inter / (sa.sz + sb.sz - inter) + 1e-8, 6) >= 0.1
    ),
    edges(s, d) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(s, d) AS (
        SELECT DISTINCT s, s FROM edges
        UNION
        SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS doc_id, min(d) AS component_id FROM reach GROUP BY s),
    csize AS (SELECT component_id, count(*) AS component_size FROM comp GROUP BY 1)
    SELECT comp.doc_id, comp.component_id, csize.component_size
    FROM comp JOIN csize USING (component_id)
    """,
    tags=("pipeline", "dedup", "components"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: exact-Jaccard pairs (threshold 0.1, the
    `dedup_ngram_jaccard` graph) closed into connected components by
    min-label propagation; DuckDB closes the same graph with a recursive
    transitive-closure CTE, value-hash-checking the iterative algorithm's
    fixpoint."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.1)
    return dedup.duplicate_components(pairs)


@register(
    "embedding_kmeans_clusters",
    oracle=_ivf_kmeans_prefix()
    + """,
    st AS (
        SELECT af.cid,
               CAST(list_dot_product(e.v, e.v)
                    - 2 * list_dot_product(e.v, cf.cv)
                    + list_dot_product(cf.cv, cf.cv) AS BIGINT) AS d2
        FROM af JOIN e USING (vec_id) JOIN c2 cf ON af.cid = cf.cid
    )
    SELECT cid, count(*) AS n_vectors,
           ROUND(CAST(sum(d2) AS DOUBLE) / count(*) / 1000000000000.0 + 1e-8, 6) AS avg_d2,
           min(d2) AS min_d2, max(d2) AS max_d2
    FROM st GROUP BY cid
    """,
    tags=("pipeline", "similarity", "kmeans"),
)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering report over the k-means-refined centroids (the
    `embedding_ivf_kmeans_topk` quantizer): cluster sizes and squared-L2
    spread.  The per-vector distance is an exact integer from the
    assignment matmul itself (no second pass); sums aggregate as longs,
    so the averages are summation-order-independent.  avg_d2 is rescaled
    to ORIGINAL vector units (/ 1e12 = the 1e6 quantization grid squared)
    before rounding: at the raw quantized magnitude (~1e12) a 4-decimal
    double round sits below one ULP, where Java and C rounding
    legitimately diverge — the scalars.py boundary hazard."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.similarity import (
        as_double_vec,
        assign_nearest_centroid,
        kmeans_refine,
        seed_rows,
    )

    e = as_double_vec(_emb(spark, sf_dir)).select("vec_id", "embedding")
    init = seed_rows(e, 8)
    cent = kmeans_refine(e, init, iters=2)
    assign = assign_nearest_centroid(e, cent, quantized=True, dist_col="d2")
    return assign.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        round_det(F.sum("d2").cast("double") / F.count(F.lit(1)) / F.lit(1e12), 6).alias("avg_d2"),
        F.min("d2").alias("min_d2"),
        F.max("d2").alias("max_d2"),
    )


# --------------------------------------------------------------------------
# Pivot surface
# --------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_type_by_day",
    oracle="""
    SELECT epoch_us(ts) // 86400000000 AS day,
           (epoch_us(ts) // 86400000000) * 86400 AS day_start,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           count(*) FILTER (WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')) AS n_total
    FROM events GROUP BY 1, 2
    """,
    tags=("pipeline", "pivot"),
)
def pivot_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day x event-type count matrix via `RelationalGroupedDataset.pivot`
    with an EXPLICIT value list — no extra distinct-scan job to discover
    the pivot domain, which is the difference between one pass and two at
    100 TB.  Missing cells coalesce to 0."""
    e = _events(spark, sf_dir).withColumn("day", F.expr("unix_micros(ts) DIV 86400000000"))
    piv = e.groupBy("day").pivot("event_type", list(_EVENT_TYPES)).agg(F.count(F.lit(1)))
    counts = [F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES]
    total = sum(F.coalesce(F.col(t), F.lit(0)) for t in _EVENT_TYPES).alias("n_total")
    return piv.select(
        "day", (F.col("day") * 86400).alias("day_start"), *counts, total
    )


@register(
    "cube_type_day_stats",
    oracle=f"""
    WITH e AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day, value FROM events
    )
    SELECT event_type, day, GROUPING(event_type, day) AS gid,
           count(*) AS cnt,
           {_AVG_FIXED_SQL} AS avg_value
    FROM e GROUP BY CUBE(event_type, day)
    """,
    tags=("pipeline", "grouping-sets", "cube"),
)
def cube_type_day_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all four grouping sets — cells, both
    marginals, grand total — in ONE shuffle (Spark expands the sets
    map-side).  `gid` is the grouping_id bitmask, which distinguishes an
    aggregated-away NULL from a data NULL; DuckDB's GROUPING(a, b) uses
    the identical bit order."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators import aggregates

    e = _events(spark, sf_dir).withColumn("day", F.expr("unix_micros(ts) DIV 86400000000"))
    return aggregates.grouping_cube(e, ["event_type", "day"], "value")


@register(
    "decontamination_overlap",
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
    h AS (SELECT doc_id AS heldout_id, shingle FROM sh WHERE doc_id < 20),
    hs AS (SELECT heldout_id, count(*) AS heldout_sz FROM h GROUP BY 1),
    shared AS (
        SELECT c.doc_id AS corpus_id, h.heldout_id, count(*) AS shared_shingles
        FROM sh c JOIN h ON c.shingle = h.shingle AND c.doc_id <> h.heldout_id
        GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT corpus_id, heldout_id, shared_shingles, hs.heldout_sz,
           ROUND(shared_shingles / hs.heldout_sz + 1e-8, 6) AS containment
    FROM shared JOIN hs USING (heldout_id)
    """,
    tags=("pipeline", "text", "decontamination"),
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= 2 distinct
    3-word shingles with the held-out slice (doc_id < 20 as the stand-in
    eval set).  The held-out shingle set broadcasts, so the corpus
    streams through one map-side join — no corpus shuffle."""
    docs = _docs(spark, sf_dir)
    heldout = docs.filter(F.col("doc_id") < 20)
    return text.ngram_overlap_contamination(docs, heldout, min_shared=2)


@register(
    "unigram_logprob_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
    ),
    t2 AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
    counts AS (SELECT term, count(*) AS cnt FROM t2 GROUP BY 1),
    total AS (SELECT count(*) AS total FROM t2),
    lp AS (
        SELECT term,
               CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0 + 0.5 + 1e-8) AS BIGINT) AS lp_micro
        FROM counts, total
    )
    SELECT doc_id, count(*) AS n_tokens,
           ROUND(CAST(sum(lp_micro) AS DOUBLE) / count(*) / 1000000.0 + 1e-8, 4) AS mean_logprob
    FROM t2 JOIN lp USING (term) GROUP BY doc_id
    """,
    tags=("pipeline", "text", "quality"),
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram distribution — the cheap fluency/quality signal.  Per-token
    log-probs quantize to integer micro-nats per distinct term, so the
    per-doc sums are exact integers and the mean is one exact division."""
    return text.unigram_logprob_score(_docs(spark, sf_dir))


@register(
    "bigram_logprob_score",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS ws
        FROM documents
    ),
    idx AS (SELECT doc_id, ws, unnest(generate_series(2, len(ws))) AS i
            FROM w WHERE len(ws) >= 2),
    bg AS (SELECT doc_id, ws[i - 1] AS w1, ws[i] AS w2 FROM idx),
    counts AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, count(*) AS ctx FROM bg GROUP BY 1),
    lp AS (
        SELECT w1, w2,
               CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(ctx AS DOUBLE)) * 1000000.0 + 0.5 + 1e-8) AS BIGINT) AS lp_micro
        FROM counts JOIN ctx USING (w1)
    )
    SELECT doc_id, count(*) AS n_bigrams,
           ROUND(CAST(sum(lp_micro) AS DOUBLE) / count(*) / 1000000.0 + 1e-8, 4) AS mean_logprob
    FROM bg JOIN lp USING (w1, w2) GROUP BY doc_id
    """,
    tags=("pipeline", "text", "quality", "lm"),
)
def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean conditional bigram log-probability ln P(w2|w1) per document
    under the corpus's own bigram counts (`text.bigram_logprob_score`) —
    the order-aware fluency signal.  Bigram extraction is a pure map
    over the token array (no window shuffle); the model join is keyed,
    not broadcast, because bigram vocabulary outgrows broadcast budgets
    at corpus scale."""
    return text.bigram_logprob_score(_docs(spark, sf_dir))


@register(
    "embedding_dedup_components",
    oracle="""
    WITH RECURSIVE e AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                             x -> floor(x * 1000000.0 + (0.5 + 1e-8))) AS v
               FROM embeddings),
    s AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) + 1e-8, 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
    ),
    pairs AS (SELECT id_a, id_b FROM s WHERE cosine >= 0.35),
    edges(s2, d) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(s2, d) AS (
        SELECT DISTINCT s2, s2 FROM edges
        UNION
        SELECT r.s2, ed.d FROM reach r JOIN edges ed ON r.d = ed.s2
    ),
    comp AS (SELECT s2 AS doc_id, min(d) AS component_id FROM reach GROUP BY s2),
    csize AS (SELECT component_id, count(*) AS component_size FROM comp GROUP BY 1)
    SELECT comp.doc_id, comp.component_id, csize.component_size
    FROM comp JOIN csize USING (component_id)
    """,
    tags=("pipeline", "dedup", "similarity", "components"),
)
def embedding_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup clusters: embedding-cosine near-dup pairs (the
    `embedding_cosine_neardups` kernel, threshold 0.35) closed into
    connected components — the cluster labeling a semantic-dedup pass
    keeps one representative per group with.  Composition of the
    quantized Arrow matmul kernel and the pointer-jumping components
    operator; the oracle replays both (all-pairs scoring CTE + recursive
    transitive closure)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.similarity import (
        as_double_vec,
        collect_corpus_rows,
        score_against_matrix,
    )

    e = as_double_vec(_emb(spark, sf_dir)).select("vec_id", "embedding")
    corpus_rows = collect_corpus_rows(e)  # all-pairs oracle baseline, size-guarded
    pairs = (
        score_against_matrix(e, corpus_rows, min_cosine=0.35 - 1e-6, upper_only=True)
        .select(
            F.col("cand_id").alias("id_a"),
            F.col("query_id").alias("id_b"),
            round_det(F.col("cosine"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b")
    )
    return dedup.duplicate_components(pairs)


@register(
    "rolling_median_smooth",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
           ROUND(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id ROWS 4 PRECEDING) + 1e-8, 4) AS rolling_median
    FROM events
    """,
    tags=("pipeline", "window", "smoothing"),
)
def rolling_median_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row trailing rolling median per sensor — the outlier-robust twin
    of `rolling_avg_20` (a single spike shifts the mean for 20 rows but
    never moves the median of 5).  One window shuffle on the series key."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators import windows as win_ops

    e = _events(spark, sf_dir)
    return win_ops.rolling_median(
        e.select("event_id", "user_id", "ts", "value"), "user_id", ["ts", "event_id"], "value"
    ).select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value", "rolling_median")


def _equidepth_oracle(nbins: int = 10) -> str:
    qs = [(i + 1) / nbins for i in range(nbins - 1)]
    cut_cols = ", ".join(
        f"quantile_cont(value, {q}) AS c{i}" for i, q in enumerate(qs)
    )
    bin_expr = " + ".join(
        f"CASE WHEN value > c{i} THEN 1 ELSE 0 END" for i in range(nbins - 1)
    )
    return f"""
    WITH cuts AS (SELECT {cut_cols} FROM events)
    SELECT CAST({bin_expr} AS BIGINT) AS bin,
           count(*) AS cnt, min(value) AS lo_v, max(value) AS hi_v
    FROM events, cuts GROUP BY 1
    """


@register(
    "histogram_equidepth",
    oracle=_equidepth_oracle(),
    tags=("pipeline", "histogram", "A13"),
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of event values — the skew-robust
    companion to the fixed-width `histogram_value`; edges from one exact
    percentile pass, broadcast into the binning scan."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators import aggregates

    return aggregates.histogram_equidepth(_events(spark, sf_dir), "value", 10)


@register(
    "tfidf_similar_pairs",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS ws
        FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS term
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
              FROM w WHERE len(ws) >= 3)
    ),
    df AS (SELECT term, count(*) AS df FROM g GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM g),
    wt AS (
        SELECT g.doc_id, g.term, df.df,
               CAST(floor(ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1000000.0 + 0.5 + 1e-8) AS BIGINT) AS w
        FROM g JOIN df USING (term) CROSS JOIN n
    ),
    norm2 AS (SELECT doc_id, sum(w * w) AS nn FROM wt GROUP BY 1),
    rare AS (SELECT doc_id, term FROM wt WHERE df BETWEEN 2 AND 10),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM rare a JOIN rare b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    dot AS (
        SELECT c.id_a, c.id_b, sum(wa.w * wb.w) AS d
        FROM cand c
        JOIN wt wa ON wa.doc_id = c.id_a
        JOIN wt wb ON wb.doc_id = c.id_b AND wb.term = wa.term
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(d AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) + 1e-8, 6) AS cosine
    FROM dot
    JOIN norm2 na ON id_a = na.doc_id
    JOIN norm2 nb ON id_b = nb.doc_id
    WHERE CAST(d AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= 0.2
    """,
    tags=("pipeline", "text", "similarity", "sparse", "tfidf"),
)
def tfidf_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector similarity JOIN over idf-weighted 3-word shingles:
    document pairs with cosine >= 0.2, candidates blocked on SHARED RARE
    SHINGLES (2 <= df <= 10) — the lexical near-dup/search shape that
    complements the embedding (dense) and MinHash (set-sketch) families
    with EXACT idf-weighted scoring.  Features are shingle SETS (the
    word-level vocab of the fixture is a closed ~31-token set, so
    word-unigram tf-idf has no rare terms to block on — measured;
    shingles restore the sparse tail every real corpus has).  The
    standard sparse trick: ubiquitous features can't lift cosine over
    the threshold alone but would explode the blocking join, so
    candidate generation keys on rare features only WITH COUNT
    FILTERING (a candidate must share >= 2 rare features — the classic
    similarity-join prefilter; measured at sf0.1: 436k -> 17k candidates
    with zero change to the >= 0.2 result set), and the exact integer
    dot product + norms then score candidates over ALL shared
    features.  Exactness: weights are micro-quantized idf integers, so
    dots and norms are exact int64 sums under any partitioning.  Scale:
    shuffles key on shingle (df/blocking) and candidate pair — never an
    all-pairs product; the df cap bounds blocking fan-out per feature
    at (df_max choose 2)."""
    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: F.length(t) > 0)
    shingle_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.array_join(F.slice(F.col("toks"), i, 3), " "),
        )
    )
    g = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(shingle_arr).alias("term"))
    )
    df = g.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = F.broadcast(g.agg(F.count_distinct("doc_id").alias("n_docs")))
    wt = (
        g.join(df, "term")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "term",
            "df",
            F.floor(
                F.log(F.col("n_docs").cast("double") / F.col("df")) * 1000000.0
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("w"),
        )
    )
    # decimal(38,0): micro-nat idf weights square to ~4e14 per term — a
    # long document overflows int64 (round-11 scale audit)
    norm2 = wt.groupBy("doc_id").agg(
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("w").cast("decimal(38,0)")).alias("nn")
    )
    rare = wt.filter(F.col("df").between(2, 10)).select("doc_id", "term")
    cand = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_shared"))
        .filter(F.col("_shared") >= 2)
        .drop("_shared")
    )
    wa = wt.select(F.col("doc_id").alias("id_a"), F.col("term").alias("tok_a"), F.col("w").alias("w_a"))
    wb = wt.select(F.col("doc_id").alias("wb_id"), F.col("term").alias("tok_b"), F.col("w").alias("w_b"))
    dot = (
        cand.join(wa, "id_a")
        .join(wb, (F.col("id_b") == F.col("wb_id")) & (F.col("tok_a") == F.col("tok_b")))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.col("w_a").cast("decimal(38,0)") * F.col("w_b").cast("decimal(38,0)")
            ).alias("d")
        )
    )
    na = norm2.select(F.col("doc_id").alias("id_a"), F.col("nn").alias("nn_a"))
    nb = norm2.select(F.col("doc_id").alias("id_b"), F.col("nn").alias("nn_b"))
    cosine = F.col("d").cast("double") / (
        F.sqrt(F.col("nn_a").cast("double")) * F.sqrt(F.col("nn_b").cast("double"))
    )
    return (
        dot.join(na, "id_a")
        .join(nb, "id_b")
        .filter(cosine >= 0.2)
        .select("id_a", "id_b", round_det(cosine, 6).alias("cosine"))
    )


# Incremental-components label store: built once per (session, sf_dir,
# delta modulus) from the OLD corpus slice (doc_id % mod != 0), then
# every call solves only the delta subgraph.
_COMPONENT_STORES: dict[tuple[str, int], str] = {}


def _component_store_dir(spark: SparkSession, sf_dir: str, mod: int = 5) -> str:
    import tempfile

    key = (sf_dir, mod)
    if key not in _COMPONENT_STORES:
        path = tempfile.mkdtemp(prefix="rtbd_comp_store_") + "/labels"
        old_docs = _docs(spark, sf_dir).filter(F.col("doc_id") % mod != 0)
        old_pairs = dedup.ngram_jaccard_pairs(old_docs, k=3, threshold=0.1)
        dedup.duplicate_components(old_pairs).select("doc_id", "component_id").write.mode(
            "overwrite"
        ).parquet(path)
        _COMPONENT_STORES[key] = path
    return _COMPONENT_STORES[key]


_COMPONENTS_INC_ORACLE = """
    WITH RECURSIVE w AS (
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
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(inter / (sa.sz + sb.sz - inter) + 1e-8, 6) >= 0.1
    ),
    edges(s, d) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(s, d) AS (
        SELECT DISTINCT s, s FROM edges
        UNION
        SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS doc_id, min(d) AS component_id FROM reach GROUP BY s),
    csize AS (SELECT component_id, count(*) AS component_size FROM comp GROUP BY 1)
    SELECT comp.doc_id, comp.component_id, csize.component_size
    FROM comp JOIN csize USING (component_id)
    """


@register(
    "dedup_components_incremental",
    oracle=_COMPONENTS_INC_ORACLE,
    tags=("pipeline", "dedup", "components", "incremental"),
)
def dedup_components_incremental(
    spark: SparkSession, sf_dir: str, _mod: int = 5
) -> DataFrame:
    """INCREMENTAL near-duplicate clustering: the old corpus slice's
    component labels are PERSISTED once; when the new slice (doc_id % 5
    == 0) arrives, only the DELTA subgraph is solved — new-vs-corpus
    candidate pairs (the new docs' shingles joined against the corpus
    shingle set: work proportional to the BATCH, not the corpus), with
    old endpoints CONTRACTED to their stored component label before the
    closure runs.  Min-labels make contraction sound: the merged
    component's label is the min over (stored labels U new ids), so
    solving the contracted delta graph and relabeling the affected old
    components reproduces the full-graph answer exactly — which is what
    the oracle checks (full recursive-CTE closure over ALL documents).
    Unaffected old components keep their stored rows untouched.  This is
    the graph twin of `dedup_minhash_incremental` / `embedding_ivf_
    append_search`: the corpus-sized work is paid once, each ingest pays
    for its delta."""
    docs = _docs(spark, sf_dir)
    store = spark.read.parquet(_component_store_dir(spark, sf_dir, _mod))

    # --- delta candidate pairs: new docs vs the whole corpus ------------
    sh_all = dedup.word_shingles(docs, k=3)
    sh_new = sh_all.filter(F.col("doc_id") % _mod == 0)
    sizes = sh_all.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    joined = (
        sh_new.alias("n")
        .join(sh_all.alias("o"), F.col("n.shingle") == F.col("o.shingle"))
        .filter(F.col("n.doc_id") != F.col("o.doc_id"))
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_b"),
            F.col("n.shingle").alias("shingle"),
        )
    )
    inter = joined.groupBy("id_a", "id_b").agg(F.count_distinct("shingle").alias("inter"))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    delta_pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            round_det(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            )
            >= 0.1
        )
        .select("id_a", "id_b")
    )

    # --- contract old endpoints to their stored labels ------------------
    lbl = store.select(F.col("doc_id").alias("_d"), F.col("component_id").alias("_l"))
    mapped = (
        delta_pairs.join(lbl.withColumnRenamed("_d", "id_a").withColumnRenamed("_l", "la"), "id_a", "left")
        .join(lbl.withColumnRenamed("_d", "id_b").withColumnRenamed("_l", "lb"), "id_b", "left")
        .select(
            F.coalesce(F.col("la"), F.col("id_a")).alias("id_a"),
            F.coalesce(F.col("lb"), F.col("id_b")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    solve = dedup.duplicate_components(mapped).select(
        F.col("doc_id").alias("node"), F.col("component_id").alias("new_label")
    )

    # --- final labeling --------------------------------------------------
    # old docs: relabel the affected components, keep the rest
    docs_old = (
        store.join(solve, store.component_id == solve.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("new_label"), F.col("component_id")).alias("component_id"),
        )
    )
    # endpoints of the delta graph that have no store row (new docs and
    # previously-isolated old docs) carry their own id as supernode
    direct_nodes = (
        delta_pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(delta_pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .join(store.select("doc_id"), "doc_id", "left_anti")
    )
    docs_direct = direct_nodes.join(solve, direct_nodes.doc_id == solve.node).select(
        "doc_id", F.col("new_label").alias("component_id")
    )
    comp = docs_old.unionByName(docs_direct)
    csize = comp.groupBy("component_id").agg(F.count(F.lit(1)).alias("component_size"))
    return comp.join(csize, "component_id").select("doc_id", "component_id", "component_size")


@register(
    "dedup_components_incremental_smalldelta",
    oracle=_COMPONENTS_INC_ORACLE,
    tags=("pipeline", "dedup", "components", "incremental", "small-delta"),
)
def dedup_components_incremental_smalldelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_components_incremental` at its PRODUCTION regime: a 2%
    ingest batch (doc_id % 50 == 0) against a 98% persisted corpus —
    the fraction where the round-5 crossover probe measured the
    incremental path's 1.8x payoff over one-shot re-clustering (PERF.md
    round-5 crossover table; the 20% fixture above demonstrates the
    operator far from that regime and was the round-5 verdict's
    remaining objection).  Identical contraction algebra, identical
    full-closure oracle — only the delta split changes, so a green row
    here driver-hashes the regime the operator actually ships in:
    candidate generation touches 2% of the shingle rows on the probe
    side, and the closure runs on the contracted delta graph only."""
    return dedup_components_incremental(spark, sf_dir, _mod=50)


@register(
    "dedup_survivorship",
    oracle="""
    WITH RECURSIVE w AS (
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
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(inter / (sa.sz + sb.sz - inter) + 1e-8, 6) >= 0.1
    ),
    edges(s, d) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(s, d) AS (
        SELECT DISTINCT s, s FROM edges
        UNION
        SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS doc_id, min(d) AS component_id FROM reach GROUP BY s),
    m AS (
        SELECT c.component_id, c.doc_id, d.n_chars,
               row_number() OVER (PARTITION BY c.component_id
                                  ORDER BY d.n_chars DESC, c.doc_id) AS rk
        FROM comp c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT component_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS survivor_doc_id,
           CAST(min(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT) AS survivor_n_chars
    FROM m GROUP BY component_id
    """,
    tags=("pipeline", "dedup", "survivorship", "entity-resolution"),
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship selection — the last step of the match -> cluster ->
    SURVIVE entity-resolution pipeline: per near-duplicate component,
    keep the canonical record by an explicit rule (longest text, then
    lowest id — the deterministic tie-break matters: 'keep any' is
    partitioning-dependent) and report the cluster profile.  One window
    pass over the (cluster-sized) membership table after the closure;
    the rule is a plain composite ordering, so swapping in richer
    survivorship criteria (most-recent, most-complete, source-priority)
    is an ORDER BY change, not a plan change."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.1)
    comp = dedup.duplicate_components(pairs).select("doc_id", "component_id")
    m = comp.join(_docs(spark, sf_dir).select("doc_id", "n_chars"), "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("component_id").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    ranked = m.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).cast("long").alias("survivor_doc_id"),
        F.min(F.when(F.col("rk") == 1, F.col("n_chars"))).cast("long").alias("survivor_n_chars"),
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS ws
        FROM documents
    ),
    g AS (
        SELECT array_to_string(ws[i:i+2], ' ') AS term, count(*) AS freq
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
              FROM w WHERE len(ws) >= 3)
        GROUP BY 1
    ),
    r AS (
        SELECT freq, row_number() OVER (ORDER BY freq DESC, term) AS rank FROM g
    ),
    q AS (
        SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000 + 0.5 + 1e-8) AS BIGINT) AS x,
               CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000 + 0.5 + 1e-8) AS BIGINT) AS y
        FROM r
    ),
    s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy
          FROM q)
    SELECT CAST(n AS BIGINT) AS n_terms,
           ROUND((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE) + 1e-8, 4)
               AS zipf_slope,
           ROUND((CAST(sy AS DOUBLE)
                  - ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)) * sx)
                 / n / 1000.0 + 1e-8, 4) AS zipf_intercept_ln
    FROM s
    """,
    tags=("pipeline", "text", "statistics", "zipf", "regression"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus's shingle frequency distribution:
    OLS slope/intercept of ln(freq) ~ ln(rank) — the corpus-statistics
    health check (natural text fits slope ~ -1; heavy machine spam or
    template boilerplate bends it).  Same exact-moment trick as the
    closed-form regressions: ln values quantize to milli-nat integers
    and the five OLS moments ride a DECIMAL(38,0) lattice — exact to
    ~1e38 under any partitioning (the int64 formulation sat within
    1.3x of 2^63 at sf0.1's ~3e5 shingle types; a 100 TB vocabulary is
    far past it) — and the two float divisions are fixed-order.  Ranks
    come from `operators/windows.global_row_number` (range repartition +
    per-partition rank + 1-row broadcast offsets), so even a
    million-term vocabulary never funnels through a single-task
    window."""
    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: F.length(t) > 0)
    shingle_arr = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.array_join(F.slice(F.col("toks"), i, 3), " "),
    )
    g = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(F.explode(shingle_arr).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_row_number

    r = global_row_number(g, [F.col("freq").desc(), F.col("term")], out="rank").select(
        "freq", "rank"
    )
    mq = lambda c: F.floor(F.log(c.cast("double")) * 1000 + F.lit(0.5 + 1e-8)).cast("long")  # noqa: E731
    q = r.select(mq(F.col("rank")).alias("x"), mq(F.col("freq")).alias("y"))
    # OLS moments on the DECIMAL(38,0) lattice: at sf0.1's ~3e5 shingle
    # types n*sxx already sits at ~7e18 — within 1.3x of the int64 cliff
    # the round-11 sweep caught in the CUPED family — and a 100 TB
    # vocabulary (1e9+ types) is far past it; exact decimals move the
    # ceiling to ~1e38 and match the oracle's int128 sums exactly
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("sxy"),
    )
    nd, sxd, syd = dec(F.col("n")), dec(F.col("sx")), dec(F.col("sy"))
    slope = (nd * F.col("sxy") - sxd * syd).cast("double") / (
        nd * F.col("sxx") - sxd * sxd
    ).cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        round_det(slope, 4).alias("zipf_slope"),
        round_det(
            (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n") / F.lit(1000.0), 4
        ).alias("zipf_intercept_ln"),
    )


@register(
    "corpus_kl_drift",
    oracle="""
    WITH toks AS (
        SELECT CAST(substr(source, 4) AS INT) >= 10 AS half_b,
               unnest(list_filter(string_split(lower(text), ' '), x -> length(x) > 0)) AS term
        FROM documents
    ),
    counts AS (
        SELECT term,
               CAST(count(*) FILTER (WHERE NOT half_b) AS BIGINT) AS c_p,
               CAST(count(*) FILTER (WHERE half_b) AS BIGINT) AS c_q
        FROM toks GROUP BY term
    ),
    tot AS (
        SELECT CAST(sum(c_p) AS BIGINT) AS n_p, CAST(sum(c_q) AS BIGINT) AS n_q,
               CAST(count(*) AS BIGINT) AS v
        FROM counts
    ),
    terms AS (
        SELECT CAST(floor(
                   ((c_p + 1) / CAST(n_p + v AS DOUBLE))
                   * ln(((c_p + 1) / CAST(n_p + v AS DOUBLE))
                        / ((c_q + 1) / CAST(n_q + v AS DOUBLE)))
                   * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano
        FROM counts, tot
    )
    SELECT any_value(tot.v) AS vocab_size,
           any_value(tot.n_p) AS n_tokens_a,
           any_value(tot.n_q) AS n_tokens_b,
           ROUND(sum(terms.nano) / 1000000000.0 + 1e-8, 6) AS kl_divergence
    FROM terms, tot
    """,
    tags=("pipeline", "corpus-drift", "kl-divergence", "data-quality"),
)
def corpus_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus DRIFT detection: add-one-smoothed KL divergence between
    the term distributions of two corpus halves (sources 0-9 vs 10-19) —
    the statistic a data-curation pipeline watches to catch a source mix
    silently changing between training snapshots (Zipf fit
    `text_zipf_fit` checks shape; KL checks the mix).  Numerics: counts
    and totals are exact int64, each term's p*ln(p/q) contribution is
    computed from identically-derived doubles in both engines and
    nano-quantized before the sum, so the divergence is an
    order-independent integer sum over the vocabulary.  Plan: one token
    scan with a conditional count per half (no second scan), vocabulary-
    keyed; the totals row broadcasts."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        (F.expr("CAST(substr(source, 4) AS INT)") >= 10).alias("half_b"),
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: F.length(x) > 0)
        ).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(~F.col("half_b"), 1).otherwise(0)).alias("c_p"),
        F.sum(F.when(F.col("half_b"), 1).otherwise(0)).alias("c_q"),
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("c_p").alias("n_p"), F.sum("c_q").alias("n_q"), F.count(F.lit(1)).alias("v")
        )
    )
    p = (F.col("c_p") + 1) / (F.col("n_p") + F.col("v")).cast("double")
    q = (F.col("c_q") + 1) / (F.col("n_q") + F.col("v")).cast("double")
    nano = F.floor(p * F.log(p / q) * 1000000000 + F.lit(0.5 + 1e-8)).cast("long")
    return (
        counts.crossJoin(tot)
        .select("n_p", "n_q", "v", nano.alias("nano"))
        .groupBy()
        .agg(
            F.first("v").cast("long").alias("vocab_size"),
            F.first("n_p").cast("long").alias("n_tokens_a"),
            F.first("n_q").cast("long").alias("n_tokens_b"),
            round_det(F.sum("nano") / 1000000000.0, 6).alias("kl_divergence"),
        )
    )


@register(
    "source_language_entropy",
    oracle="""
    WITH counts AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs FROM counts GROUP BY 1),
    terms AS (
        SELECT c.source, t.n_docs,
               CAST(floor((n / CAST(t.n_docs AS DOUBLE))
                          * ln(n / CAST(t.n_docs AS DOUBLE))
                          * -1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano
        FROM counts c JOIN tot t USING (source)
    )
    SELECT source,
           any_value(n_docs) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_langs,
           ROUND(sum(nano) / 1000000000.0 + 1e-8, 6) AS lang_entropy_nats
    FROM terms GROUP BY source
    """,
    tags=("pipeline", "corpus-diversity", "entropy"),
)
def source_language_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source SHANNON ENTROPY of the language mix — the diversity
    dial a corpus-mixture recipe monitors next to `corpus_kl_drift`'s
    between-snapshot divergence: entropy near 0 means a source went
    monolingual, entropy near ln(n_langs) means uniform coverage.
    Same exactness discipline: per-(source, lang) probabilities derive
    from exact integer counts, each -p*ln(p) term is nano-quantized, so
    the per-source entropy is an order-independent integer sum over the
    (bounded, sources x langs) cell table."""
    d = _docs(spark, sf_dir).select("source", "lang")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("source").agg(F.sum("n").alias("n_docs"))
    p = F.col("n") / F.col("n_docs").cast("double")
    nano = F.floor(p * F.log(p) * -1000000000 + F.lit(0.5 + 1e-8)).cast("long")
    return (
        counts.join(tot, "source")
        .select("source", "n_docs", nano.alias("nano"))
        .groupBy("source")
        .agg(
            F.first("n_docs").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            round_det(F.sum("nano") / 1000000000.0, 6).alias("lang_entropy_nats"),
        )
    )


@register(
    "sample_allocation_hamilton",
    oracle="""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM counts),
    shares AS (
        SELECT source, n_docs,
               CAST((n_docs * 10000) // total AS BIGINT) AS floor_share,
               CAST((n_docs * 10000) % total AS BIGINT) AS remainder
        FROM counts CROSS JOIN tot
    ),
    leftover AS (
        SELECT CAST(10000 - sum(floor_share) AS BIGINT) AS n_extra FROM shares
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY remainder DESC, source) AS rk
        FROM shares
    )
    SELECT source, n_docs, floor_share,
           CAST(floor_share + CASE WHEN rk <= n_extra THEN 1 ELSE 0 END AS BIGINT)
               AS allocated
    FROM ranked CROSS JOIN leftover
    """,
    tags=("pipeline", "sampling", "allocation", "apportionment"),
)
def sample_allocation_hamilton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMILTON (largest-remainder) apportionment of a 10,000-row sample
    budget across corpus sources — the integer-allocation step between
    "mixture weights" and "actually draw k_g rows per group" that
    `corpus_sample_mixture`-style pipelines need: floor the proportional
    shares IN EXACT INTEGER ARITHMETIC (n_g * B div N — no float shares,
    so no 0.1+0.2 drift), then hand the leftover seats to the largest
    remainders (ties broken by source name).  Allocations provably sum
    to the budget and are within 1 of exact proportionality per group —
    the property float-rounding allocators silently violate.  Plan: one
    map-side-combinable count, a 1-row total broadcast, and a window
    over #groups rows — everything after the count is
    group-cardinality-sized, nothing is data-sized.  Public precedent:
    Hamilton/Vinton method (US House apportionment, 1850)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = F.broadcast(counts.agg(F.sum("n_docs").alias("total")))
    shares = counts.crossJoin(tot).select(
        "source",
        "n_docs",
        F.expr("(n_docs * 10000) div total").alias("floor_share"),
        ((F.col("n_docs") * 10000) % F.col("total")).alias("remainder"),
    )
    leftover = F.broadcast(
        shares.agg((F.lit(10000) - F.sum("floor_share")).cast("long").alias("n_extra"))
    )
    w = Window.orderBy(F.col("remainder").desc(), "source")
    return (
        shares.withColumn("rk", F.row_number().over(w))
        .crossJoin(leftover)
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("floor_share").cast("long").alias("floor_share"),
            (
                F.col("floor_share")
                + F.when(F.col("rk") <= F.col("n_extra"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("allocated"),
        )
    )


@register(
    "boilerplate_ngram_census",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               concat('begin ', source, ' standard header terms apply ', text) AS t
        FROM documents
    ),
    w AS (SELECT doc_id, source, string_split(t, ' ') AS ws FROM d),
    g AS (
        SELECT DISTINCT doc_id, source, array_to_string(ws[i : i + 4], ' ') AS gram
        FROM (
            SELECT doc_id, source, ws, unnest(generate_series(1, len(ws) - 4)) AS i
            FROM w WHERE len(ws) >= 5
        )
    ),
    pg AS (
        SELECT source, gram, CAST(count(*) AS BIGINT) AS n_docs_with
        FROM g GROUP BY 1, 2
    ),
    st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY 1)
    SELECT pg.source, st.n_docs,
           CAST(count(*) AS BIGINT) AS n_boiler_grams,
           CAST(sum(n_docs_with) AS BIGINT) AS total_presences,
           ROUND(max(n_docs_with) / (1.0 * st.n_docs) + 1e-8, 4) AS max_share
    FROM pg JOIN st ON pg.source = st.source
    WHERE n_docs_with * 10 >= st.n_docs * 6
    GROUP BY pg.source, st.n_docs
    """,
    tags=("pipeline", "text", "boilerplate", "curation"),
)
def boilerplate_ngram_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOILERPLATE detection by shared-n-gram frequency WITHIN SOURCE —
    the CCNet/RefinedWeb curation step that strips site-wide headers,
    cookie banners and footers before training: a 5-gram PRESENT (not
    merely frequent) in >= 60% of a source's documents is boilerplate,
    and the census reports how many such grams each source carries and
    the worst share.  A deterministic per-source header is prepended in
    BOTH engines so the fixture actually contains cross-document
    boilerplate with known structure (the synthesized-corruption
    precedent of the ER queries) — header-internal grams must census at
    share 1.0; header/body boundary grams are per-doc unique and must
    NOT.  Plan: rolling grams are the same map-side
    `transform(sequence(...))` + explode as ExactSubstr
    (`operators/dedup.py`), `array_distinct` BEFORE exploding turns
    occurrence counting into presence counting map-side, and the only
    shuffle is the (source, gram) agg — one row per distinct gram per
    doc.  The share threshold compares INTEGERS (n*10 >= docs*6), no
    float ratio.  Lee et al. 2022 / Penedo et al. 2023 (public)."""
    docs = load_table(spark, sf_dir, "documents")
    text2 = F.concat(
        F.lit("begin "), F.col("source"), F.lit(" standard header terms apply "), F.col("text")
    )
    toks = F.split(text2, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 4),
        lambda i: F.array_join(F.slice(F.col("toks"), i, 5), " "),
    )
    present = (
        docs.select("doc_id", "source", toks.alias("toks"))
        .filter(F.size("toks") >= 5)
        .select("doc_id", "source", F.explode(F.array_distinct(grams)).alias("gram"))
    )
    per_gram = present.groupBy("source", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_with")
    )
    src_tot = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    boiler = per_gram.join(F.broadcast(src_tot), "source").filter(
        F.col("n_docs_with") * 10 >= F.col("n_docs") * 6
    )
    return boiler.groupBy("source", "n_docs").agg(
        F.count(F.lit(1)).cast("long").alias("n_boiler_grams"),
        F.sum("n_docs_with").cast("long").alias("total_presences"),
        round_det(F.max("n_docs_with") / (1.0 * F.col("n_docs")), 4).alias("max_share"),
    )


def _pad_waste_for_k(docs: DataFrame, k: int) -> DataFrame:
    """Padding-waste census for one bucketing strategy: NTILE(k) buckets
    over the (n_tokens, doc_id) total order via the scale-safe
    `global_ntile` kernel, every sequence in a bucket padded to the
    bucket max."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_ntile

    banded = global_ntile(docs, [F.col("n_tokens"), F.col("doc_id")], k, out="bucket")
    per_bucket = banded.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tok"),
        F.max("n_tokens").alias("mx"),
    )
    return per_bucket.agg(
        F.lit(k).cast("int").alias("n_buckets"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.sum(F.col("mx") * F.col("n_docs")).cast("long").alias("padded_tokens"),
        (F.sum(F.col("mx") * F.col("n_docs")) - F.sum("tok")).cast("long").alias("waste_tokens"),
        round_det(
            (F.sum(F.col("mx") * F.col("n_docs")) - F.sum("tok"))
            / (1.0 * F.sum(F.col("mx") * F.col("n_docs"))),
            4,
        ).alias("waste_share"),
    )


@register(
    "pad_waste_bucketing",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 0))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    ks(k) AS (VALUES (1), (4), (16)),
    banded AS (
        SELECT k, n_tokens,
               ntile(k) OVER (PARTITION BY k ORDER BY n_tokens, doc_id) AS bucket
        FROM toks CROSS JOIN ks
    ),
    per_bucket AS (
        SELECT k, bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tok,
               CAST(max(n_tokens) AS BIGINT) AS mx
        FROM banded GROUP BY 1, 2
    )
    SELECT CAST(k AS INT) AS n_buckets,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           CAST(sum(mx * n_docs) AS BIGINT) AS padded_tokens,
           CAST(sum(mx * n_docs) - sum(tok) AS BIGINT) AS waste_tokens,
           ROUND((sum(mx * n_docs) - sum(tok)) / (1.0 * sum(mx * n_docs)) + 1e-8, 4)
               AS waste_share
    FROM per_bucket GROUP BY k
    """,
    tags=("pipeline", "training-efficiency", "bucketing", "global-ntile"),
)
def pad_waste_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PADDING-WASTE census for length-bucketed training batches — the
    throughput question every fixed-shape training job asks: padding
    all sequences to the global max (1 bucket) vs 4 vs 16
    length-sorted buckets, how many pad tokens does each strategy
    burn?  Waste per bucket = (bucket_max - len) summed; more buckets
    monotonically reduce waste (each split can only lower a bucket's
    max), and the hashed shares quantify the knee of that curve on
    this corpus.  The Spark side assigns buckets with the
    `global_ntile` RANGE-PARTITION kernel — exact NTILE semantics with
    no data-sized single-task window (the r5 kernel family, here
    consumed by a training-efficiency query); the oracle uses DuckDB's
    native ntile over the same (n_tokens, doc_id) total order, so the
    hash also re-pins kernel-vs-native NTILE equivalence on a fresh
    shape.  Everything after banding is per-bucket aggregation —
    bucket-cardinality-sized.  Sequence-packing (`corpus_pack_
    sequences`) is the alternative this census motivates."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0))
        .cast("long")
        .alias("n_tokens"),
    )
    out = None
    for k in (1, 4, 16):
        part = _pad_waste_for_k(docs, k)
        out = part if out is None else out.unionByName(part)
    return out


@register(
    "text_readability_scores",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, source,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(greatest(len(list_filter(ws, w -> w = 'the')), 1) AS BIGINT)
                   AS n_sentences,
               CAST(list_sum(list_transform(ws,
                    w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
                    AS BIGINT) AS n_syllables
        FROM d WHERE len(ws) > 0
    ),
    scored AS (
        SELECT source,
               CAST(floor((206.835
                           - 1.015 * (n_words / (1.0 * n_sentences))
                           - 84.6 * (n_syllables / (1.0 * n_words))) * 1000
                          + 0.5 + 1e-8) AS BIGINT) AS flesch_milli
        FROM per_doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(flesch_milli) AS BIGINT) AS flesch_milli_total,
           ROUND(sum(flesch_milli) / (1000.0 * count(*)) + 1e-8, 4) AS avg_flesch,
           CAST(min(flesch_milli) AS BIGINT) AS min_flesch_milli,
           CAST(max(flesch_milli) AS BIGINT) AS max_flesch_milli
    FROM scored GROUP BY source
    """,
    tags=("pipeline", "text", "readability", "quality"),
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH READING EASE per source — the grade-level heuristic quality
    pipelines bolt next to the Gopher rules (`text_gopher_census`) when
    triaging scraped text: 206.835 - 1.015(words/sentences) -
    84.6(syllables/word), with syllables approximated by VOWEL-GROUP
    COUNT (min 1/word, the standard regex heuristic) and sentences by a
    delimiter count (this corpus has no punctuation, so the stand-in
    delimiter is the stopword 'the', min 1/doc — the plumbing is the
    point; on punctuated text swap one regex).  Per-doc scores quantize
    to milli-points from identically-derived doubles BEFORE the
    per-source aggregation, so totals and extrema hash exactly.  Pure
    map over the token array (one regexp per word, JVM-side
    higher-order functions — no Python) + one hash agg: scan-speed at
    any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    d = docs.select("doc_id", "source", ws.alias("ws")).filter(F.size("ws") > 0)
    n_words = F.size("ws").cast("long")
    n_sentences = F.greatest(
        F.size(F.filter(F.col("ws"), lambda w: w == "the")), F.lit(1)
    ).cast("long")
    n_syllables = F.aggregate(
        F.transform(
            F.col("ws"),
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))), F.lit(1)
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    per_doc = d.select(
        "source",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    flesch_milli = F.floor(
        (
            F.lit(206.835)
            - 1.015 * (F.col("n_words") / (1.0 * F.col("n_sentences")))
            - 84.6 * (F.col("n_syllables") / (1.0 * F.col("n_words")))
        )
        * 1000
        + F.lit(0.5 + 1e-8)
    ).cast("long")
    return (
        per_doc.select("source", flesch_milli.alias("flesch_milli"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("flesch_milli").cast("long").alias("flesch_milli_total"),
            round_det(F.sum("flesch_milli") / (1000.0 * F.count(F.lit(1))), 4).alias(
                "avg_flesch"
            ),
            F.min("flesch_milli").cast("long").alias("min_flesch_milli"),
            F.max("flesch_milli").cast("long").alias("max_flesch_milli"),
        )
    )


@register(
    "heaps_law_vocab_growth",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '), x -> length(x) > 0)) AS term
        FROM documents
    ),
    doc_tok AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM toks GROUP BY 1),
    first_seen AS (SELECT term, CAST(min(doc_id) AS BIGINT) AS first_doc FROM toks GROUP BY 1),
    cps AS (
        SELECT ((max(doc_id) + 1) * i) // 4 AS cp
        FROM documents CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS i)
        GROUP BY i
    ),
    pts AS (
        SELECT c.cp AS checkpoint_docs,
               (SELECT CAST(sum(n_tok) AS BIGINT) FROM doc_tok WHERE doc_id < c.cp) AS n_tokens,
               (SELECT CAST(count(*) AS BIGINT) FROM first_seen WHERE first_doc < c.cp) AS vocab
        FROM cps c
    ),
    q AS (
        SELECT checkpoint_docs, n_tokens, vocab,
               CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5 + 1e-8) AS BIGINT) AS x6,
               CAST(floor(ln(CAST(vocab AS DOUBLE)) * 1000000 + 0.5 + 1e-8) AS BIGINT) AS y6
        FROM pts
    ),
    fit AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
               CAST(sum(x6 * y6) AS BIGINT) AS sxy, CAST(sum(x6 * x6) AS BIGINT) AS sxx
        FROM q
    )
    SELECT q.checkpoint_docs, q.n_tokens, q.vocab,
           ROUND(CAST(fit.n * fit.sxy - fit.sx * fit.sy AS DOUBLE)
                 / CAST(fit.n * fit.sxx - fit.sx * fit.sx AS DOUBLE) + 1e-8, 6) AS heaps_beta
    FROM q CROSS JOIN fit
    ORDER BY q.checkpoint_docs
    """,
    tags=("pipeline", "heaps-law", "vocab-growth", "scaling-law"),
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS'-LAW vocabulary growth census — V(n) ~ K * T(n)^beta, the
    scaling law that predicts how a tokenizer's open-vocabulary burden
    grows with corpus size (the planning twin of `text_zipf_fit`'s
    frequency law; both must hold for a corpus to look organic).  The
    corpus is consumed in doc_id order; at each quarter checkpoint the
    cumulative token count and DISTINCT vocabulary are measured, and
    beta is the log-log OLS slope over the four points.  Computing
    vocabulary-at-checkpoint via each term's FIRST-OCCURRENCE doc
    (min doc_id per term) turns the prefix-distinct problem into one
    vocabulary-sized aggregation — never a per-checkpoint rescan.
    Exactness: counts are exact int64; ln values are micro-quantized
    per point so the OLS moments are exact integer sums (products stay
    far under 2^63), one final division.  Plan: one token scan feeding
    both the per-doc counts and the first-seen table; checkpoints are
    a broadcast 4-row frame."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: F.length(x) > 0)
        ).alias("term"),
    )
    doc_tok = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    first_seen = toks.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    cps = F.broadcast(
        docs.agg(F.max("doc_id").alias("mx")).selectExpr(
            "explode(array(1, 2, 3, 4)) AS i", "mx"
        ).selectExpr("((mx + 1) * i) div 4 AS cp")
    )
    tok_at = (
        doc_tok.crossJoin(cps)
        .where(F.col("doc_id") < F.col("cp"))
        .groupBy("cp")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    voc_at = (
        first_seen.crossJoin(cps)
        .where(F.col("first_doc") < F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    pts = tok_at.join(voc_at, "cp").select(
        F.col("cp").cast("long").alias("checkpoint_docs"),
        "n_tokens",
        "vocab",
        F.floor(F.log(F.col("n_tokens").cast("double")) * 1000000 + F.lit(0.5 + 1e-8))
        .cast("long")
        .alias("x6"),
        F.floor(F.log(F.col("vocab").cast("double")) * 1000000 + F.lit(0.5 + 1e-8))
        .cast("long")
        .alias("y6"),
    )
    fit = F.broadcast(
        pts.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x6").alias("sx"),
            F.sum("y6").alias("sy"),
            F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
            F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
        )
    )
    return (
        pts.crossJoin(fit)
        .select(
            "checkpoint_docs",
            "n_tokens",
            "vocab",
            round_det(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
                6,
            ).alias("heaps_beta"),
        )
        .orderBy("checkpoint_docs")
    )


@register(
    "filter_yield_sweep",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a|in|is|it)\\b')) AS n_stop
        FROM documents
    ),
    q AS (
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               ROUND(0.4 * (CASE WHEN n_words >= 5 AND n_chars >= 20 THEN 1.0 ELSE 0.0 END)
                     + 0.3 * least(ROUND(n_stop / n_words + 1e-8, 6) * 4, 1.0)
                     + 0.3 * (1.0 - least(ROUND(n_punct / n_chars + 1e-8, 6) * 10, 1.0)) + 1e-8, 6) AS quality
        FROM s
    ),
    b AS (
        SELECT CAST(floor(quality * 10 + 1e-9) AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS n_tokens
        FROM q GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td, CAST(sum(n_tokens) AS BIGINT) AS tt FROM b),
    grid AS (SELECT unnest(generate_series(0, 9)) AS t)
    SELECT grid.t AS threshold_decile,
           CAST(coalesce(sum(b.n_docs), 0) AS BIGINT) AS n_docs_kept,
           (CAST(coalesce(sum(b.n_docs), 0) AS BIGINT) * 1000000) // tot.td AS doc_share_micro,
           CAST(coalesce(sum(b.n_tokens), 0) AS BIGINT) AS n_tokens_kept,
           (CAST(coalesce(sum(b.n_tokens), 0) AS BIGINT) * 1000000) // tot.tt AS token_share_micro
    FROM grid LEFT JOIN b ON b.band >= grid.t CROSS JOIN tot
    GROUP BY grid.t, tot.td, tot.tt
    ORDER BY threshold_decile
    """,
    tags=("pipeline", "quality-filter", "yield-curve", "threshold-sweep"),
)
def filter_yield_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-FILTER YIELD CURVE — how many documents and tokens
    survive each candidate quality threshold (deciles 0.0..0.9), the
    table a curation team reads BEFORE committing to a cutoff
    (`text_quality_score` scores; this answers "what does a 0.6 bar
    cost us?").  One banding pass collapses the corpus to <= 10
    (band, docs, tokens) cells; the sweep is a 10x10 inequality join
    over those cells — per-threshold rescans would cost 10 corpus
    passes for the same numbers.  Banding multiplies the SAME rounded
    quality double by 10 in both engines (identical IEEE op + epsilon),
    and every share is an integer floor-division, so the whole curve
    hashes."""
    q = text.quality_score(_docs(spark, sf_dir)).select("doc_id", "n_words", "quality")
    b = (
        q.select(
            F.floor(F.col("quality") * 10 + F.lit(1e-9)).cast("long").alias("band"),
            "n_words",
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_words").alias("n_tokens"))
    )
    tot = F.broadcast(b.agg(F.sum("n_docs").alias("td"), F.sum("n_tokens").alias("tt")))
    grid = F.broadcast(q.sparkSession.range(0, 10).select(F.col("id").alias("t")))
    return (
        grid.join(b, b.band >= grid.t, "left")
        .crossJoin(tot)
        .groupBy("t", "td", "tt")
        .agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("n_docs_kept"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens_kept"),
        )
        .select(
            F.col("t").cast("long").alias("threshold_decile"),
            "n_docs_kept",
            F.expr("(n_docs_kept * 1000000L) div td").alias("doc_share_micro"),
            "n_tokens_kept",
            F.expr("(n_tokens_kept * 1000000L) div tt").alias("token_share_micro"),
        )
        .orderBy("threshold_decile")
    )


@register(
    "bigram_perplexity_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS ws
        FROM documents
    ),
    uni AS (
        SELECT w AS term, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(ws) AS w FROM toks WHERE doc_id % 2 = 0) GROUP BY 1
    ),
    unitot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
    bi AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT ws[i] AS w1, ws[i + 1] AS w2
            FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
            WHERE doc_id % 2 = 0
        ) GROUP BY 1, 2
    ),
    ev AS (
        SELECT doc_id, source, ws[i] AS w1, ws[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE doc_id % 2 = 1
    ),
    scored AS (
        SELECT ev.doc_id, ev.source,
               CAST(floor(-ln(
                   0.7 * ((coalesce(bi.c, 0) + 1)
                          / CAST(coalesce(u1.c, 0) + unitot.v AS DOUBLE))
                   + 0.3 * ((coalesce(u2.c, 0) + 1)
                            / CAST(unitot.n + unitot.v AS DOUBLE))
               ) * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano
        FROM ev
        LEFT JOIN bi ON bi.w1 = ev.w1 AND bi.w2 = ev.w2
        LEFT JOIN uni u1 ON u1.term = ev.w1
        LEFT JOIN uni u2 ON u2.term = ev.w2
        CROSS JOIN unitot
    ),
    perdoc AS (
        SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(nano) AS BIGINT) AS nano_xent
        FROM scored GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
           ROUND(sum(nano_xent) / (1000000000.0 * sum(n_bigrams)) + 1e-8, 6)
               AS mean_xent_nats
    FROM perdoc GROUP BY source ORDER BY source
    """,
    tags=("pipeline", "lm-perplexity", "quality-filter", "bigram"),
)
def bigram_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-PERPLEXITY quality scoring — the CCNet-style curation signal:
    train an interpolated add-one bigram model on HALF the corpus (even
    doc_ids) and score the OTHER half's cross-entropy per source
    (0.7 * P_bigram + 0.3 * P_unigram, both Laplace-smoothed) — the
    train/eval split by id parity mirrors real usage, where the scorer
    never sees the documents it filters.  Exactness: all counts exact
    int64; each bigram's -ln(interpolated p) is one identical double
    expression nano-quantized per EVENT position, so per-doc and
    per-source cross-entropies are order-independent integer sums.
    Plan: model tables are vocabulary-/bigram-keyed aggregates; scoring
    is two LEFT equi-joins on those tables (broadcast at fixture scale,
    key-shuffled at corpus scale) — never a per-row Python LM."""
    docs = _docs(spark, sf_dir)
    # cache the tokenized corpus: four independent subtrees read it (the
    # unigram model, the bigram model, the eval bigrams, and the corpus
    # totals) and each otherwise re-runs the split+filter tokenize over
    # every document (measured 0.91 -> 0.82 s at sf0.1; the tokenize is
    # the query's only full-corpus map — round-12 optimization)
    toks = docs.select(
        "doc_id",
        "source",
        F.filter(F.split(F.lower(F.col("text")), " "), lambda x: F.length(x) > 0).alias("ws"),
    ).cache()
    train = toks.where(F.col("doc_id") % 2 == 0)
    ev = toks.where(F.col("doc_id") % 2 == 1)
    uni = (
        train.select(F.explode("ws").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    unitot = F.broadcast(uni.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")))

    def bigrams(df):
        return df.select(
            "doc_id",
            "source",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        ).select("doc_id", "source", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    bi = bigrams(train).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    evb = bigrams(ev)
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    bic = bi.select("w1", "w2", F.col("c").alias("cb"))
    scored = (
        evb.join(bic, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(unitot)
        .select(
            "doc_id",
            "source",
            F.floor(
                -F.log(
                    0.7
                    * (
                        (F.coalesce(F.col("cb"), F.lit(0)) + 1)
                        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
                    )
                    + 0.3
                    * (
                        (F.coalesce(F.col("c2"), F.lit(0)) + 1)
                        / (F.col("n") + F.col("v")).cast("double")
                    )
                )
                * 1000000000
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("nano"),
        )
    )
    perdoc = scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("nano").alias("nano_xent")
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            round_det(
                F.sum("nano_xent") / (1000000000.0 * F.sum("n_bigrams")), 6
            ).alias("mean_xent_nats"),
        )
        .orderBy("source")
    )


@register(
    "capture_recapture_estimate",
    oracle="""
    WITH days AS (
        SELECT user_id,
               CAST(floor(EXTRACT(epoch FROM ts) / 86400) AS BIGINT) AS day
        FROM events
    ),
    bounds AS (SELECT min(day) AS d0 FROM days),
    s1 AS (SELECT DISTINCT user_id FROM days, bounds WHERE day = d0),
    s2 AS (SELECT DISTINCT user_id FROM days, bounds WHERE day = d0 + 1),
    counts AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
               (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
               (SELECT CAST(count(*) AS BIGINT) FROM s1 JOIN s2 USING (user_id)) AS m,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM days) AS true_users
    )
    SELECT n1, n2, m, true_users,
           ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS chapman_estimate
    FROM counts
    """,
    tags=("pipeline", "capture-recapture", "population-estimate", "chapman"),
)
def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE-RECAPTURE population estimate (Chapman's bias-corrected
    Lincoln-Petersen): treat day-1 and day-2 active user sets as two
    captures and estimate the total population from the overlap —
    N-hat = (n1+1)(n2+1)/(m+1) - 1 — the classic trick for sizing a
    population you can only sample (total users, total distinct
    crawlable docs) next to the sketch family's approx-distinct over
    what you HAVE scanned.  The estimate is pure integer arithmetic
    (floor division, no float at all); the true distinct count rides
    along so the estimate's bias is itself part of the hashed output.
    Plan: two day-filtered distincts + one semi-join-sized overlap —
    the day filter pushes into the scan."""
    days = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_seconds(F.col("ts")) / F.lit(86400)).cast("long").alias("day"),
    )
    d0 = F.broadcast(days.agg(F.min("day").alias("d0")))
    wd = days.crossJoin(d0)
    s1 = wd.where(F.col("day") == F.col("d0")).select("user_id").distinct()
    s2 = wd.where(F.col("day") == F.col("d0") + 1).select("user_id").distinct()
    n1 = s1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n2"))
    m = s1.join(s2, "user_id").agg(F.count(F.lit(1)).alias("m"))
    true_users = days.agg(F.count_distinct("user_id").alias("true_users"))
    return (
        n1.crossJoin(n2)
        .crossJoin(m)
        .crossJoin(true_users)
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("m").cast("long").alias("m"),
            F.col("true_users").cast("long").alias("true_users"),
            (
                F.expr("((n1 + 1) * (n2 + 1)) div (m + 1)") - 1
            ).cast("long").alias("chapman_estimate"),
        )
    )


@register(
    "pmi_collocations",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS ws
        FROM documents
    ),
    uni AS (
        SELECT w AS term, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1
    ),
    bi AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT ws[i] AS w1, ws[i + 1] AS w2
            FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        ) GROUP BY 1, 2
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS nb FROM bi),
    scored AS (
        SELECT bi.w1, bi.w2, bi.c AS support,
               CAST(floor(ln((CAST(bi.c AS DOUBLE) * n.nb)
                             / (CAST(u1.c AS DOUBLE) * u2.c))
                          * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS pmi_nano
        FROM bi JOIN uni u1 ON u1.term = bi.w1
                JOIN uni u2 ON u2.term = bi.w2
                CROSS JOIN n
        WHERE bi.c >= 5
    )
    SELECT w1, w2, support, pmi_nano FROM scored
    ORDER BY pmi_nano DESC, w1, w2 LIMIT 20
    """,
    tags=("pipeline", "collocations", "pmi", "text-statistics"),
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI COLLOCATION extraction — the classical "words that belong
    together" statistic (Church & Hanks 1990, public): pointwise mutual
    information ln(c(w1,w2)*N / (c(w1)*c(w2))) over adjacent-pair
    counts, support floor 5 (raw PMI is notoriously dominated by
    hapax pairs), top-20 with total tie-breaks — the phrase-detection
    step tokenizer and n-gram pipelines run before merging multiword
    units.  Exactness: all counts exact int64, one identical ln per
    surviving pair nano-quantized BEFORE ranking, so the ranking and
    cut are integer decisions.  Plan: one token scan feeds unigram and
    bigram aggregates; scoring joins the (bounded) surviving-pair table
    to the unigram table twice."""
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.filter(F.split(F.lower(F.col("text")), " "), lambda x: F.length(x) > 0).alias("ws"),
    )
    uni = (
        toks.select(F.explode("ws").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 5)
    )
    nb = F.broadcast(
        toks.select((F.size("ws") - 1).alias("k")).agg(F.sum("k").alias("nb"))
    )
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(nb)
        .select(
            "w1",
            "w2",
            F.col("c").alias("support"),
            F.floor(
                F.log(
                    (F.col("c").cast("double") * F.col("nb"))
                    / (F.col("c1").cast("double") * F.col("c2"))
                )
                * 1000000000
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("pmi_nano"),
        )
    )
    return scored.orderBy(F.col("pmi_nano").desc(), "w1", "w2").limit(20)
