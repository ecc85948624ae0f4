"""ML-preparation operators (round-4 widening): vocabulary building and
embedding dimensionality reduction — two steps every training-data
pipeline runs between raw corpus and model input.

* `vocab_build_topk` — the tokenizer-prep step: frequency-ranked
  vocabulary with stable integer ids.
* `embedding_random_projection` — Johnson-Lindenstrauss reduction
  64 -> 16 dims via a hash-derived Rademacher (+-1) matrix
  (`operators/similarity.rademacher_project`).  The +-1 signs make the
  projection of q6-quantized values exact integer arithmetic, so the
  DuckDB oracle reproduces it bit-for-bit — a rare case where a
  "random" ML transform is fully value-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators import similarity
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import register
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

_DIM_IN, _DIM_OUT = 64, 16


@register(
    "vocab_build_topk",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), vocab AS (
        SELECT token, CAST(count(*) AS BIGINT) AS freq FROM words
        WHERE length(token) > 0
        GROUP BY token HAVING count(*) >= 2
    )
    SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS vocab_id,
           token, freq
    FROM vocab
    ORDER BY vocab_id LIMIT 50
    """,
    tags=("mlprep", "text", "vocabulary"),
)
def vocab_build_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary (top 50, min count 2) with stable ids:
    the step that turns a corpus into a tokenizer table.  The heavy work
    is the token count (explode + partial agg — scan-speed).  The top-50
    slice is taken FIRST via sort+limit — which Spark compiles to
    TakeOrderedAndProject (per-partition top-k + k-row merge, never a
    global sort of the vocabulary) — and the row_number id assignment
    then runs over just those 50 rows; ranking before limiting would
    drag the entire vocab through a single-partition window.  (freq
    desc, token) ordering carries the unique token as a tie-break so ids
    are deterministic across engines."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 2)
    )
    top = vocab.orderBy(F.col("freq").desc(), F.col("token")).limit(50)
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return top.select(F.row_number().over(w).cast("long").alias("vocab_id"), "token", "freq")


@register(
    "embedding_random_projection",
    oracle=f"""
    SELECT vec_id, {", ".join(similarity.rademacher_project_sql(_DIM_IN, _DIM_OUT))}
    FROM embeddings
    """,
    tags=("mlprep", "embedding", "dimensionality-reduction"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection of the 64-dim embeddings onto 16 Rademacher
    directions: the standard cheap pre-step before clustering / ANN when
    the native dimension is wasteful.  Map-only plan — no shuffle, no
    Python, the 16 dot products are codegen'd adds/subtracts over the
    quantized vector — so it runs at scan speed on any corpus.  The sign
    matrix is hash-derived (Achlioptas-style +-1 entries, Knuth index
    hash), making the whole transform deterministic and value-hashable
    against the DuckDB oracle."""
    e = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    return similarity.rademacher_project(e, _DIM_IN, _DIM_OUT).drop("embedding")


# Deterministic linear-probe weights: w_i = knuth(i)/2^32 - 0.5, an exact
# binary fraction both engines represent identically.
_PROBE_W = [((i * 2654435761) % (2**32)) / (2**32) - 0.5 for i in range(_DIM_IN)]


@register(
    "embedding_linear_probe",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> floor(x * 1000000.0 + (0.5 + 1e-8))) AS v
        FROM embeddings
    )
    SELECT vec_id, CAST(label AS INT) AS label,
           ROUND(list_dot_product(v, [{", ".join(repr(w) for w in _PROBE_W)}])
                 / 1000000.0 + 1e-8, 6) AS score,
           list_dot_product(v, [{", ".join(repr(w) for w in _PROBE_W)}]) > 0 AS predicted
    FROM e
    """,
    tags=("mlprep", "embedding", "batch-inference"),
)
def embedding_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched linear-model scoring over the embedding column — the
    plan shape of large-scale batch inference (classifier readout /
    reward-model gating over a training corpus): broadcast weight
    vector, one fused map computing a dot product per row, no shuffle
    anywhere.  The weights are hash-derived exact binary fractions, and
    each product of a q6 integer with one fits in 53 bits, so the
    left-fold sum is bit-identical across engines and the query stays
    value-hash-checkable — a stand-in for real model weights with the
    exact plumbing a real probe needs.  At 100 TB this runs at scan
    speed; swapping in a real model turns the expression into a
    batch-vectorized Pandas UDF with the same shape
    (`operators/multimodal.py` shows that plumbing)."""
    e = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", "embedding"
    )
    q = similarity._qvec(F.col("embedding"))
    w = F.array(*[F.lit(v) for v in _PROBE_W])
    dot = similarity._dot(q, w)
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

    return e.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        round_det(dot / 1000000.0, 6).alias("score"),
        (dot > 0).alias("predicted"),
    )


_PQ_M, _PQ_DSUB, _PQ_K = 8, 8, 16


@register(
    "embedding_pq_topk",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> floor(x * 1000000.0 + (0.5 + 1e-8))) AS v
        FROM embeddings
    ),
    seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
        FROM (SELECT * FROM e ORDER BY vec_id LIMIT {_PQ_K})
    ),
    cent AS (
        SELECT seeds.j, t.s,
               v[t.s * {_PQ_DSUB} + 1 : t.s * {_PQ_DSUB} + {_PQ_DSUB}] AS c
        FROM seeds CROSS JOIN range(0, {_PQ_M}) t(s)
    ),
    dists AS (
        SELECT e.vec_id, c.s, c.j,
               list_dot_product(e.v[c.s * {_PQ_DSUB} + 1 : c.s * {_PQ_DSUB} + {_PQ_DSUB}],
                                e.v[c.s * {_PQ_DSUB} + 1 : c.s * {_PQ_DSUB} + {_PQ_DSUB}])
               - 2 * list_dot_product(e.v[c.s * {_PQ_DSUB} + 1 : c.s * {_PQ_DSUB} + {_PQ_DSUB}], c.c)
               + list_dot_product(c.c, c.c) AS dist
        FROM e CROSS JOIN cent c
    ),
    codes AS (
        SELECT vec_id, s, j AS code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
            FROM dists
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v FROM e ORDER BY vec_id LIMIT 5),
    lut AS (
        SELECT q.query_id, c.s, c.j,
               list_dot_product(q.v[c.s * {_PQ_DSUB} + 1 : c.s * {_PQ_DSUB} + {_PQ_DSUB}],
                                q.v[c.s * {_PQ_DSUB} + 1 : c.s * {_PQ_DSUB} + {_PQ_DSUB}])
               - 2 * list_dot_product(q.v[c.s * {_PQ_DSUB} + 1 : c.s * {_PQ_DSUB} + {_PQ_DSUB}], c.c)
               + list_dot_product(c.c, c.c) AS dist
        FROM q CROSS JOIN cent c
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS cand_id, CAST(sum(l.dist) AS BIGINT) AS adc_dist
        FROM codes cd JOIN lut l ON l.s = cd.s AND l.j = cd.code
        WHERE cd.vec_id <> l.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, cand_id, adc_dist, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, cand_id) AS rank
        FROM adc
    ) WHERE rank <= 10
    """,
    tags=("mlprep", "embedding", "ann", "product-quantization"),
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (8 subspaces x 16 codes, asymmetric
    distance): encode the corpus once into 8 one-byte codes per vector
    (map-only, scan speed), then answer 5 queries by summing 8 LUT
    lookups per candidate instead of a 64-dim dot product.  This is the
    memory-bound serving shape IVF lacks — at 100 TB the codes are 32x
    smaller than the float32 vectors, the LUT frame broadcast is
    m*k*n_queries floats, and the only shuffle is the per-query top-k.
    Exact q6 integer arithmetic end-to-end makes codes, LUTs and ADC
    sums bit-identical to the full-SQL DuckDB replay."""
    e = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    books = similarity.pq_codebooks(e, _PQ_M, _PQ_DSUB, _PQ_K)
    return similarity.pq_adc_topk(e, books, n_queries=5, k_out=10)


@register(
    "bpe_pair_counts",
    oracle="""
    WITH words AS (
        SELECT word, CAST(count(*) AS BIGINT) AS word_freq FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
        ) WHERE length(word) > 0 GROUP BY word
    ),
    p AS (
        SELECT substr(word, i, 2) AS pair, word_freq
        FROM (SELECT word, word_freq, unnest(generate_series(1, length(word) - 1)) AS i
              FROM words WHERE length(word) >= 2)
    )
    SELECT pair, CAST(sum(word_freq) AS BIGINT) AS pair_count
    FROM p GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 40
    """,
    tags=("mlprep", "text", "tokenizer", "bpe"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge round's pair statistic: adjacent-character pair
    frequencies weighted by word frequency, top 40.  The corpus is read
    once for the word table; pair counting runs over distinct words only
    — the property that makes BPE training tractable at corpus scale.
    See `operators/text.bpe_pair_counts`."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators import text

    return text.bpe_pair_counts(load_table(spark, sf_dir, "documents"), top_k=40)


@register(
    "vocab_oov_rate",
    oracle="""
    WITH t AS (
        SELECT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ) WHERE length(token) > 0
    ),
    vocab AS (
        SELECT token FROM (
            SELECT token, count(*) AS freq FROM t
            GROUP BY token HAVING count(*) >= 2
            ORDER BY freq DESC, token LIMIT 50
        )
    )
    SELECT t.doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           ROUND(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) / count(*) + 1e-8, 6) AS oov_rate
    FROM t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.doc_id
    """,
    tags=("mlprep", "text", "vocabulary", "coverage"),
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage check: per-document OOV rate against the
    `vocab_build_topk` vocabulary (same spec: whitespace tokens, min
    count 2, top 50 by (freq desc, token)).  The vocab side broadcasts —
    tokenizer tables are bounded by construction — so the corpus streams
    through a map-side join; no shuffle on the token key.  See
    `operators/text.oov_rate`."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators import text

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 2)
    )
    vocab = toks.orderBy(F.col("freq").desc(), F.col("token")).limit(50).select("token")
    return text.oov_rate(docs, vocab)


@register(
    "embedding_label_centroids",
    oracle="""
    WITH q AS (
        SELECT label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> floor(x * 1000000.0 + (0.5 + 1e-8))) AS v
        FROM embeddings
    ),
    e AS (
        SELECT label, g.i AS dim, CAST(v[g.i + 1] AS BIGINT) AS qv
        FROM q, (SELECT unnest(generate_series(0, 63)) AS i) g
    )
    SELECT label, CAST(dim AS INT) AS dim, count(*) AS n_vecs,
           ROUND(CAST(sum(qv) AS DOUBLE) / count(*) / 1000000.0 + 1e-8, 6) AS centroid
    FROM e GROUP BY 1, 2
    """,
    tags=("mlprep", "embedding", "centroid", "array-agg"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise centroid of the embedding column per label — the
    vertical (per-dimension) array aggregation shape: class prototypes
    for nearest-centroid classification / semantic-dedup seeding.
    Exactness: vectors quantize to q6 integers first, so the per-(label,
    dim) sums are exact integers under any partitioning and the mean is
    one exact division.  Scale shape: posexplode is a map-side fan-out
    of exactly dim rows per vector; the only shuffle keys on (label,
    dim) — at 100 TB this is the canonical 'transpose then reduce'
    plan, and the output (labels x dims) is tiny regardless of corpus
    size."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

    e = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings"))
    q = e.select(
        "label",
        F.expr(
            "transform(embedding, x -> cast(floor(x * 1000000.0 + (0.5 + 1e-8)) as bigint))"
        ).alias("v"),
    )
    return (
        q.select("label", F.posexplode("v").alias("dim", "qv"))
        .groupBy("label", "dim")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum("qv").alias("_s"))
        .select(
            "label",
            F.col("dim").cast("int").alias("dim"),
            "n_vecs",
            round_det(F.col("_s").cast("double") / F.col("n_vecs") / F.lit(1000000.0), 6).alias(
                "centroid"
            ),
        )
    )


_BPE_ROUND = """
    p{i} AS (
        SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT arr[i] AS a, arr[i + 1] AS b, freq FROM (
                SELECT list_filter(string_split(enc, ','), x -> x <> '') AS arr, freq
                FROM w{p}
            ), unnest(generate_series(1, len(arr) - 1)) AS g(i)
        ) GROUP BY a, b
    ),
    t{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
    w{i} AS (
        SELECT replace(enc, ',' || t{i}.a || ',' || t{i}.b || ',',
                            ',' || t{i}.a || t{i}.b || ',') AS enc, freq
        FROM w{p}, t{i}
    )"""

_BPE_ORACLE = (
    """
    WITH words AS (
        SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents
        ) GROUP BY 1
    ),
    w0 AS (
        SELECT ',' || array_to_string(string_split(word, ''), ',') || ',' AS enc, freq
        FROM words
    ),"""
    + ",".join(_BPE_ROUND.format(i=i, p=i - 1) for i in (1, 2, 3, 4, 5))
    + """
    SELECT * FROM (
        SELECT CAST(1 AS INT) AS round, a AS sym_a, b AS sym_b, cnt AS pair_count FROM t1
        UNION ALL SELECT CAST(2 AS INT), a, b, cnt FROM t2
        UNION ALL SELECT CAST(3 AS INT), a, b, cnt FROM t3
        UNION ALL SELECT CAST(4 AS INT), a, b, cnt FROM t4
        UNION ALL SELECT CAST(5 AS INT), a, b, cnt FROM t5
    )
    """
)


@register(
    "bpe_train_merges",
    oracle=_BPE_ORACLE,
    tags=("mlprep", "text", "tokenizer", "bpe", "iterative"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real (5-round) distributed BPE TRAINER: the full
    count-pairs -> pick-merge -> apply-merge loop (Sennrich et al.
    2016), not just one round's statistic (`bpe_pair_counts`).  Words
    are encoded as comma-delimited symbol strings (symbols are
    comma-free, and the pattern `,a,b,` carries both delimiters, so a
    merge can never match across a symbol boundary); each round counts
    adjacent symbol pairs over the DISTINCT-WORD table (never the
    corpus), pulls ONE argmax row to the driver (bounded, the same
    contract as the k-means centroid collect), and applies the merge as
    a single `replace` — whose left-to-right non-overlapping semantics
    are byte-identical in Spark and DuckDB (verified; canonical BPE
    differs only for immediately-repeated pairs like 'a a a', a
    documented deviation).  The word table is checkpointed per round so
    round r never re-derives rounds 1..r-1.  The oracle unrolls the
    identical five rounds as chained CTEs.  Returns the merge table
    (round, sym_a, sym_b, pair_count) — the artifact a tokenizer ships."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    enc = F.concat(F.lit(","), F.array_join(F.split("word", ""), ","), F.lit(","))
    w = words.select(enc.alias("enc"), "freq").localCheckpoint(eager=True)
    merges = []
    for rnd in range(1, 6):
        arr = F.filter(F.split("enc", ","), lambda x: x != F.lit(""))
        pairs = (
            w.select(arr.alias("arr"), "freq")
            .filter(F.size("arr") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("arr") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("arr"), i).alias("a"),
                            F.element_at(F.col("arr"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()[0]
        merges.append((rnd, top.a, top.b, int(top.cnt)))
        w = w.select(
            F.replace(
                F.col("enc"),
                F.lit(f",{top.a},{top.b},"),
                F.lit(f",{top.a}{top.b},"),
            ).alias("enc"),
            "freq",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "round int, sym_a string, sym_b string, pair_count long"
    )


_BPE_APPLY_ROUND = """
    e{i} AS (
        SELECT doc_id,
               replace(enc, ',' || t{i}.a || ',' || t{i}.b || ',',
                            ',' || t{i}.a || t{i}.b || ',') AS enc
        FROM e{p}, t{i}
    )"""

_BPE_APPLY_ORACLE = (
    _BPE_ORACLE[: _BPE_ORACLE.index("\n    SELECT * FROM (")]
    + ","
    + """
    dw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
    ),
    e0 AS (
        SELECT doc_id, ',' || array_to_string(string_split(word, ''), ',') || ',' AS enc
        FROM dw
    ),"""
    + ",".join(_BPE_APPLY_ROUND.format(i=i, p=i - 1) for i in (1, 2, 3, 4, 5))
    + """
    SELECT doc_id, count(*) AS n_words,
           CAST(sum(len(list_filter(string_split(enc, ','), x -> x <> ''))) AS BIGINT)
               AS n_tokens
    FROM e5 GROUP BY doc_id
    """
)


@register(
    "bpe_apply_tokenize",
    oracle=_BPE_APPLY_ORACLE,
    tags=("mlprep", "text", "tokenizer", "bpe"),
)
def bpe_apply_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode every document with the 5 merges
    `bpe_train_merges` learned — train on the corpus once (bounded
    driver traffic: the 5-row merge table), then tokenization is a pure
    per-word map (5 chained `replace`s over the symbol encoding) that
    scales at scan speed, embarrassingly parallel, exactly how a
    trained tokenizer deploys.  Output (doc_id, n_words, n_tokens)
    shows the per-document compression the merges bought; the oracle
    re-derives the merges AND the application end-to-end."""
    merges = REGISTRY_LOOKUP("bpe_train_merges").build(spark, sf_dir).orderBy("round").collect()
    docs = load_table(spark, sf_dir, "documents")
    dw = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)).alias("word"),
    )
    enc = F.concat(F.lit(","), F.array_join(F.split("word", ""), ","), F.lit(","))
    for m in merges:
        enc = F.replace(enc, F.lit(f",{m.sym_a},{m.sym_b},"), F.lit(f",{m.sym_a}{m.sym_b},"))
    toks = F.size(F.filter(F.split(enc, ","), lambda x: x != F.lit("")))
    return dw.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )


def REGISTRY_LOOKUP(name: str):
    from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import REGISTRY

    return REGISTRY[name]


@register(
    "embedding_covariance_matrix",
    oracle="""
    WITH q AS (
        SELECT list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000000.0 + (0.5 + 1e-8)) AS BIGINT)) AS v
        FROM embeddings
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
    sx AS (
        SELECT g.i AS i, CAST(sum(v[g.i + 1]) AS BIGINT) AS s
        FROM q, (SELECT unnest(generate_series(0, 63)) AS i) g
        GROUP BY 1
    ),
    gram AS (
        SELECT gi.i AS i, gj.j AS j, CAST(sum(v[gi.i + 1] * v[gj.j + 1]) AS BIGINT) AS g
        FROM q,
             (SELECT unnest(generate_series(0, 63)) AS i) gi,
             (SELECT unnest(generate_series(0, 63)) AS j) gj
        GROUP BY 1, 2
    )
    SELECT gram.i, gram.j,
           ROUND((CAST(gram.g AS DOUBLE) - CAST(a.s AS DOUBLE) * b.s / n.n)
                 / (n.n - 1) / 1000000000000.0 + 1e-8, 8) AS cov
    FROM gram
    JOIN sx a ON gram.i = a.i
    JOIN sx b ON gram.j = b.i
    CROSS JOIN n
    """,
    tags=("mlprep", "embedding", "covariance", "pca-prep"),
)
def embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 64x64 sample covariance matrix of the embedding corpus —
    PCA preparation: the eigen-decomposition of this (dim^2-sized,
    corpus-independent) output is a driver-side numpy call, so the
    distributed job is exactly the Gram accumulation
    (`similarity.gram_matrix_partial`: one vectorized int64 `M^T M` per
    Arrow batch, dim^2-keyed merge; the JVM-side per-dimension sums ride
    a posexplode agg).  All moments are exact integers, the one float
    expression is identical on both engines, and the oracle replays the
    whole thing in SQL."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.similarity import (
        gram_matrix_partial,
    )

    e = load_table(spark, sf_dir, "embeddings")
    gram = gram_matrix_partial(e, dim=64)
    q = e.select(
        F.expr(
            "transform(cast(embedding as array<double>), x -> cast(floor(x * 1000000.0 + (0.5 + 1e-8)) as bigint))"
        ).alias("v")
    )
    sx = q.select(F.posexplode("v").alias("i", "x")).groupBy("i").agg(F.sum("x").alias("s"))
    n = F.broadcast(q.agg(F.count(F.lit(1)).cast("long").alias("n")))
    a = sx.select(F.col("i"), F.col("s").alias("s_i"))
    b = sx.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    return (
        gram.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .crossJoin(n)
        .select(
            "i",
            "j",
            round_det(
                (F.col("g").cast("double") - F.col("s_i").cast("double") * F.col("s_j") / F.col("n"))
                / (F.col("n") - 1)
                / F.lit(1e12),
                8,
            ).alias("cov"),
        )
    )


# BM25 retrieval: fixed query set (terms drawn from the synthetic
# vocabulary), Lucene-style idf, k1=1.2 b=0.75.  Per-term scores are
# quantized to 1e-4 units BEFORE the per-(query, doc) sum so the
# cross-engine result is an exact integer sum regardless of the order
# the engines add term contributions in (same precedent as the
# micro-nat log-prob queries).
_BM25_QUERIES = ((1, "spark"), (1, "join"), (2, "window"), (2, "agg"),
                 (3, "data"), (3, "table"), (3, "scan"), (4, "fast"), (4, "value"))
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 5

_BM25_SQL = f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens
        FROM dl
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    q(query_id, term) AS (VALUES {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)}),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               CAST(floor(
                   ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1))
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                        + {_BM25_B} * dl.dl * stats.n_docs / stats.total_tokens))
                   * 10000 + 0.5 + 1e-8) AS BIGINT) AS s4
        FROM q
        JOIN tf ON tf.term = q.term
        JOIN df ON df.term = q.term
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
    ),
    agg AS (
        SELECT query_id, doc_id, sum(s4) AS s4 FROM scored GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY s4 DESC, doc_id) AS rnk,
               s4
        FROM agg
    )
    SELECT CAST(query_id AS INT) AS query_id, doc_id,
           CAST(rnk AS INT) AS rnk,
           ROUND(s4 / 10000.0 + 1e-8, 4) AS bm25
    FROM ranked WHERE rnk <= {_BM25_TOPK}
    """


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, s4): per-(query, doc) BM25 score in exact 1e-4
    units for the fixed `_BM25_QUERIES` set — the shared scoring core of
    `bm25_search_topk` and the lexical leg of `hybrid_search_rrf`."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: F.length(x) > 0)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
        )
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q = F.broadcast(
        docs.sparkSession.createDataFrame(list(_BM25_QUERIES), "query_id int, term string")
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (_BM25_K1 + 1)) / (
        F.col("tf")
        + _BM25_K1
        * (1 - _BM25_B + _BM25_B * F.col("dl") * F.col("n_docs") / F.col("total_tokens"))
    )
    s4 = F.floor(idf * tf_norm * 10000 + F.lit(0.5 + 1e-8)).cast("long")
    return (
        tf.join(q, "term")
        .join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(stats)
        .select("query_id", "doc_id", s4.alias("s4"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s4").alias("s4"))
    )


@register(
    "bm25_search_topk",
    oracle=_BM25_SQL,
    tags=("mlprep", "retrieval", "bm25", "inverted-index"),
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval — top-5 documents per query for a fixed
    query set, the retrieval half of a RAG pipeline (`corpus_chunk_
    overlap` is the chunking half).  Plan = the distributed inverted
    index: the term-frequency table IS the posting list, the query set
    broadcasts onto it (term-keyed, touching only matching postings —
    at 100 TB with the tf table laid out term-partitioned this reads
    only the queried terms' partitions), document length and the two
    corpus scalars (N, total tokens) attach via doc-keyed join + 1-row
    broadcast, and the final top-k is a per-query window over ONLY the
    scored candidates (bounded by postings hit, never corpus-sized).
    Scoring: Lucene BM25 (k1=1.2, b=0.75); each term's contribution is
    quantized to exact 1e-4 units before summation so the per-document
    score is an order-independent integer sum — float ln/division
    happen on identically-derived doubles in both engines."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(F.col("s4").desc(), "doc_id")
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BM25_TOPK)
        .select(
            "query_id",
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            round_det(F.col("s4") / 10000.0, 4).alias("bm25"),
        )
    )


@register(
    "embedding_distance_histogram",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, {similarity.qvec_sql('embedding')} AS qv,
               (SELECT count(*) FROM embeddings) AS n
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id,
               {similarity.cosine_q6_sql('a.qv', 'b.qv')} AS cos
        FROM q a JOIN q b
          ON b.vec_id = (a.vec_id * 2654435761) % a.n
         AND b.vec_id <> a.vec_id
    )
    SELECT CAST(floor((cos + 1.0) * 10) AS INT) AS cos_band,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
    """,
    tags=("mlprep", "embedding", "geometry-diagnostic"),
)
def embedding_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space GEOMETRY diagnostic: the distribution of cosine
    similarities between hash-paired vectors (each vector paired with
    one deterministic pseudo-random partner — n pairs total, never
    n^2), banded into 0.1-wide bins.  A healthy high-dimensional
    embedding shows mass concentrated near 0 (random directions are
    near-orthogonal); collapse toward +1 is the classic "embedding
    degeneration" failure that silently ruins ANN recall — this is the
    one-scan health check that catches it.  Pairing is a plain equi-join
    on the Knuth-derived partner id (no sampling randomness to disagree
    on), and the cosines run on the shared q6 integer quantization, so
    both engines band identically."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

    emb = load_table(spark, sf_dir, "embeddings")
    n = F.broadcast(emb.agg(F.count(F.lit(1)).alias("n")))
    q = emb.crossJoin(n).select("vec_id", "n", "embedding")
    a = q.alias("a")
    b = emb.select("vec_id", "embedding").alias("b")
    pairs = a.join(
        b,
        (F.col("b.vec_id") == (F.col("a.vec_id") * 2654435761) % F.col("a.n"))
        & (F.col("b.vec_id") != F.col("a.vec_id")),
    ).select(
        similarity.cosine_q6_jvm(F.col("a.embedding"), F.col("b.embedding")).alias("cos")
    )
    # band counts only, at a coarse 0.1 grain: per-band min/max of the
    # raw cosine was dropped after a measured last-ulp sqrt divergence
    # between the engines landed one pair exactly on a 6-decimal
    # rounding boundary — counts at 0.1-band boundaries carry no such
    # knife edge
    return pairs.groupBy(
        F.floor((F.col("cos") + 1.0) * 10).cast("int").alias("cos_band")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))


# --- batched BPE trainer (round-6: the probe-validated scale path as a
# --- correctness-checked catalog query) -----------------------------------

_BPEB_USED = "({s}.a, {s}.b, {s}.a || {s}.b)"


def _bpeb_slot(i: int, k: int) -> str:
    """Slot-k greedy selection CTE for batch round i: the minimum-rank
    candidate whose symbols are disjoint from every earlier slot's
    {a, b, a||b}; a chr(1) sentinel row (rank 10^6) guarantees exactly
    one row even when no disjoint candidate remains, and sentinel
    replaces are no-ops downstream."""
    prior = [f"s{i}_{j}" for j in range(1, k)]
    from_clause = f"c{i} c" + "".join(f", s{i}_{j} s{i}_{j}" for j in range(1, k))
    conds = " AND ".join(
        f"c.a NOT IN {_BPEB_USED.format(s=s)} AND c.b NOT IN {_BPEB_USED.format(s=s)}"
        for s in prior
    )
    where = f"WHERE {conds}" if conds else ""
    return f"""
    s{i}_{k} AS (
        SELECT a, b, cnt FROM (
            SELECT c.a, c.b, c.cnt, c.rnk FROM {from_clause} {where}
            UNION ALL SELECT chr(1), chr(1), CAST(0 AS BIGINT), 1000000
            ORDER BY rnk LIMIT 1
        )
    )"""


def _bpeb_round(i: int) -> str:
    p = i - 1
    rep = "enc"
    for k in range(1, 5):
        s = f"s{i}_{k}"
        rep = (
            f"replace({rep}, ',' || {s}.a || ',' || {s}.b || ',',"
            f" ',' || {s}.a || {s}.b || ',')"
        )
    slots = ",".join(_bpeb_slot(i, k) for k in range(1, 5))
    return f"""
    p{i} AS (
        SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT arr[i] AS a, arr[i + 1] AS b, freq FROM (
                SELECT list_filter(string_split(enc, ','), x -> x <> '') AS arr, freq
                FROM w{p}
            ), unnest(generate_series(1, len(arr) - 1)) AS g(i)
        ) GROUP BY a, b
    ),
    c{i} AS (
        SELECT * FROM (
            SELECT a, b, cnt, row_number() OVER (ORDER BY cnt DESC, a, b) AS rnk
            FROM p{i}
        ) WHERE rnk <= 16
    ),{slots},
    w{i} AS (
        SELECT {rep} AS enc, freq
        FROM w{p}, s{i}_1, s{i}_2, s{i}_3, s{i}_4
    )"""


_BPEB_ORACLE = (
    """
    WITH words AS (
        SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents
        ) GROUP BY 1
    ),
    w0 AS (
        SELECT ',' || array_to_string(string_split(word, ''), ',') || ',' AS enc, freq
        FROM words
    ),"""
    + ",".join(_bpeb_round(i) for i in (1, 2))
    + """
    SELECT * FROM ("""
    + " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS round, CAST({k} AS INT) AS slot, "
        f"a AS sym_a, b AS sym_b, cnt AS pair_count FROM s{i}_{k} WHERE a <> chr(1)"
        for i in (1, 2)
        for k in range(1, 5)
    )
    + """
    )
    """
)


@register(
    "bpe_train_merges_batched",
    oracle=_BPEB_ORACLE,
    tags=("mlprep", "text", "tokenizer", "bpe", "iterative", "batched"),
)
def bpe_train_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BATCHED BPE trainer — the measured scale path (PERF.md round-5
    probe: K=4 keeps 21/24 canonical merges at 4x fewer Spark rounds)
    promoted from `tools/` to a correctness-checked catalog query.  A
    production 32k vocabulary means 32k merge rounds, and
    `bpe_train_merges` is deliberately one job per merge; the known
    mitigation is batching: per round take the top-16 pairs, greedily
    keep (in rank order) up to K=4 whose symbols are pairwise DISJOINT
    — if two merges share no symbol in {a, b, ab}, their `,a,b,`
    windows can never overlap, so applying the batch as chained
    replaces in ONE job is order-independent and byte-identical to
    applying them one at a time — and re-count only between batches.
    Candidate pull is bounded (16 rows/round to the driver, the k-means
    centroid contract).  The oracle replays the identical greedy
    selection as rank-cascaded CTEs (slot k = min-rank candidate
    disjoint from slots < k, with a chr(1) sentinel for exhausted
    rounds) and the identical chained-replace pass, so the batch
    semantics themselves are value-hash-pinned, not probe-only.
    2 rounds x K=4 here; rounds scale as vocab/K."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    enc0 = F.concat(F.lit(","), F.array_join(F.split("word", ""), ","), F.lit(","))
    w = words.select(enc0.alias("enc"), "freq").localCheckpoint(eager=True)
    out = []
    for rnd in (1, 2):
        arr = F.filter(F.split("enc", ","), lambda x: x != F.lit(""))
        pairs = (
            w.select(arr.alias("arr"), "freq")
            .filter(F.size("arr") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("arr") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("arr"), i).alias("a"),
                            F.element_at(F.col("arr"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        cand = pairs.orderBy(F.col("cnt").desc(), "a", "b").limit(16).collect()
        used: set = set()
        batch = []
        for row in cand:
            if len(batch) >= 4:
                break
            if row.a in used or row.b in used:
                continue
            used.update((row.a, row.b, row.a + row.b))
            batch.append(row)
        enc_col = F.col("enc")
        for slot, row in enumerate(batch, 1):
            out.append((rnd, slot, row.a, row.b, int(row.cnt)))
            enc_col = F.replace(
                enc_col, F.lit(f",{row.a},{row.b},"), F.lit(f",{row.a}{row.b},")
            )
        w = w.select(enc_col.alias("enc"), "freq").localCheckpoint(eager=True)
    return spark.createDataFrame(
        out, "round int, slot int, sym_a string, sym_b string, pair_count long"
    )


# --- MMR diverse selection ---------------------------------------------------

_MMR_K, _MMR_POOL = 8, 32


def _mmr_oracle() -> str:
    """Generate the greedy-MMR oracle: selection step i is a one-row CTE
    whose argmax conditions on the union of steps 1..i-1 — the iterative
    greedy unrolled into standard SQL (same device as the batched-BPE
    oracle above: a Python loop EMITTING static SQL, not executing)."""
    cos = (
        "list_dot_product({a}.v, {b}.v) / (sqrt(list_dot_product({a}.v, {a}.v))"
        " * sqrt(list_dot_product({b}.v, {b}.v)))"
    )
    head = f"""
    WITH e AS MATERIALIZED (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                             x -> floor(x * 1000000.0 + (0.5 + 1e-8))) AS v
               FROM embeddings),
    q AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
    pool AS MATERIALIZED (
        SELECT c.vec_id AS cand_id,
               ROUND({cos.format(a='q', b='c')} + 1e-8, 6) AS rel
        FROM q, e c WHERE c.vec_id <> q.vec_id
        ORDER BY rel DESC, cand_id LIMIT {_MMR_POOL}
    ),
    pv AS MATERIALIZED (SELECT p.cand_id, e.v FROM pool p JOIN e ON e.vec_id = p.cand_id),
    pair AS MATERIALIZED (
        SELECT a.cand_id AS ia, b.cand_id AS ib,
               ROUND({cos.format(a='a', b='b')} + 1e-8, 6) AS sim
        FROM pv a, pv b WHERE a.cand_id <> b.cand_id
    ),
    sel1 AS (SELECT cand_id, rel,
                    CAST(floor(rel * 1000000 + 0.5 + 1e-8) AS BIGINT) AS score_e6,
                    CAST(1 AS BIGINT) AS rank
             FROM pool ORDER BY rel DESC, cand_id LIMIT 1),
    selall1 AS MATERIALIZED (SELECT cand_id FROM sel1)"""
    steps = [head]
    for i in range(2, _MMR_K + 1):
        mmr = (
            f"0.7 * p.rel - 0.3 * (SELECT max(sim) FROM pair WHERE ia = p.cand_id"
            f" AND ib IN (SELECT cand_id FROM selall{i - 1}))"
        )
        steps.append(f"""
    sel{i} AS MATERIALIZED (
        SELECT p.cand_id, p.rel,
               CAST(floor(({mmr}) * 1000000 + 0.5 + 1e-8) AS BIGINT) AS score_e6,
               CAST({i} AS BIGINT) AS rank
        FROM pool p WHERE p.cand_id NOT IN (SELECT cand_id FROM selall{i - 1})
        ORDER BY ({mmr}) DESC, p.cand_id LIMIT 1
    ),
    selall{i} AS MATERIALIZED (SELECT cand_id FROM selall{i - 1}
                  UNION ALL SELECT cand_id FROM sel{i})""")
    union = "\n    UNION ALL ".join(
        f"SELECT rank, cand_id, rel, score_e6 FROM sel{i}" for i in range(1, _MMR_K + 1)
    )
    return ",".join(steps) + "\n    " + union


@register(
    "embedding_mmr_select",
    oracle=_mmr_oracle(),
    tags=("mlprep", "similarity", "mmr", "diversity", "rerank"),
)
def embedding_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE selection — the diversity-aware rerank
    every retrieval/curation pipeline puts between "top-k by similarity"
    and "what we actually keep" (near-identical top hits add nothing;
    MMR trades relevance against redundancy: next pick = argmax
    0.7*rel - 0.3*max_sim_to_already_picked).  Two-stage shape, each
    stage honest about where it runs: CANDIDATE GENERATION is the
    distributed exact kernel (one corpus scan, top-32 pool by cosine to
    the query via `similarity.brute_force_topk`); the GREEDY REFINEMENT
    is inherently sequential over a k-BOUNDED pool (32 rel scores + 992
    pairwise sims, both computed by the same distributed kernel and
    rounded engine-side, collected under the bounded-by-construction
    contract) — the standard rerank-stage split: at 100 TB the pool is
    still 32 rows; only stage 1 scales with the corpus.  All arithmetic
    the greedy compares is IEEE doubles over engine-rounded sims,
    identical in Python and SQL; emitted scores are integer-floored e6
    so no output rounding mode is in play.  The oracle unrolls the
    greedy into 8 chained argmax CTEs over the same quantized-integer
    cosine algebra — a wrong pool member, tie-break, or max-sim lookup
    diverges immediately."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    q1 = emb.orderBy("vec_id").limit(1)
    pool = similarity.brute_force_topk(emb, q1, k=_MMR_POOL).select(
        "cand_id", F.col("cosine").alias("rel")
    )
    pool_vecs = emb.join(pool.select("cand_id"), emb["vec_id"] == F.col("cand_id")).select(
        "vec_id", "embedding"
    )
    pairs = similarity.brute_force_topk(pool_vecs, pool_vecs, k=_MMR_POOL - 1)
    rel = {r["cand_id"]: r["rel"] for r in pool.collect()}  # bounded: pool rows
    sim = {
        (r["query_id"], r["cand_id"]): r["cosine"] for r in pairs.collect()
    }  # bounded: pool^2
    selected: list[tuple[int, int, float, int]] = []
    chosen: list[int] = []
    while len(chosen) < _MMR_K:
        best = None
        for c, r in rel.items():
            if c in chosen:
                continue
            if chosen:
                ms = max(sim[(c, s)] for s in chosen)
                score = 0.7 * r - 0.3 * ms
            else:
                score = r
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, r, score)
        _, c, r, score = best
        chosen.append(c)
        selected.append(
            (len(chosen), c, r, int(math.floor(score * 1000000 + 0.5 + 1e-8)))
        )
    return spark.createDataFrame(
        selected, "rank long, cand_id long, rel double, score_e6 long"
    )


# Reciprocal-rank fusion: each leg contributes 1/(K + rank) for its
# top-L candidates.  Contributions are EXACT integers (1e9 nano-units
# via integer division), so the fused score is an order-independent
# integer sum — same cross-engine precedent as the BM25 1e-4 units.
_RRF_K, _RRF_LEG_K, _RRF_TOPK, _RRF_N_QUERIES = 60, 20, 5, 4

_RRF_CTES = f"""toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens
        FROM dl
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    q(query_id, term) AS (VALUES {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)}),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               CAST(floor(
                   ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1))
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                        + {_BM25_B} * dl.dl * stats.n_docs / stats.total_tokens))
                   * 10000 + 0.5 + 1e-8) AS BIGINT) AS s4
        FROM q
        JOIN tf ON tf.term = q.term
        JOIN df ON df.term = q.term
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
    ),
    lex AS (
        SELECT query_id, doc_id, CAST(lex_rank AS INT) AS lex_rank FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY s4 DESC, doc_id) AS lex_rank
            FROM (SELECT query_id, doc_id, sum(s4) AS s4 FROM scored GROUP BY 1, 2)
        ) WHERE lex_rank <= {_RRF_LEG_K}
    ),
    e AS (SELECT vec_id, {similarity.qvec_sql('CAST(embedding AS DOUBLE[])')} AS v
          FROM embeddings),
    qv AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS query_id, v AS qvec
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_RRF_N_QUERIES})
    ),
    sem AS (
        SELECT query_id, doc_id, CAST(sem_rank AS INT) AS sem_rank FROM (
            SELECT q.query_id, c.vec_id AS doc_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY ROUND({similarity.cosine_q6_sql('q.qvec', 'c.v')} + 1e-8, 6) DESC,
                                c.vec_id) AS sem_rank
            FROM qv q, e c
        ) WHERE sem_rank <= {_RRF_LEG_K}
    ),
    fused AS (
        SELECT COALESCE(l.query_id, s.query_id) AS query_id,
               COALESCE(l.doc_id, s.doc_id) AS doc_id,
               l.lex_rank, s.sem_rank,
               COALESCE(1000000000 // ({_RRF_K} + l.lex_rank), 0)
                 + COALESCE(1000000000 // ({_RRF_K} + s.sem_rank), 0) AS rrf_nano
        FROM lex l FULL OUTER JOIN sem s
          ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    )
    """

_RRF_SQL = f"""
    WITH {_RRF_CTES}
    SELECT CAST(query_id AS INT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id,
           lex_rank, sem_rank, CAST(rrf_nano AS BIGINT) AS rrf_nano, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_nano DESC, doc_id) AS rnk
        FROM fused
    ) WHERE rnk <= {_RRF_TOPK}
    """


@register(
    "hybrid_search_rrf",
    oracle=_RRF_SQL,
    tags=("mlprep", "retrieval", "rrf", "hybrid"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval with reciprocal-rank fusion — the standard RAG
    pattern of fusing a lexical (BM25) ranking with a semantic
    (embedding-cosine) ranking per query: score(d) = sum over legs of
    1/(K + rank_leg(d)), K=60, each leg contributing its top-20.  The
    lexical leg reuses `_bm25_scored` (posting-list joins — term-keyed,
    touching only the queried terms' postings at scale); the semantic
    leg scans the corpus ONCE against a 4-query broadcast matrix via the
    Arrow kernel (`similarity.score_against_matrix` — the IVF index
    family is the at-scale drop-in).  Fusion itself is a FULL OUTER join
    of two (queries x 20)-row lists — bounded by construction, never
    corpus-sized, so the expensive halves stay independent and the merge
    is free.  Query sets are positionally aligned: BM25 query_ids 1..4
    map to the first 4 embedding vectors BY ID ORDER (any id domain —
    round-2 verdict).  Contributions are exact 1e9 nano-units via
    INTEGER division, so the fused score is an order-independent
    integer sum and rank flips cannot come from float ulps.  Reference
    anchor: retrieval surface per BASELINE.json north-star; RRF per
    Cormack/Clarke/Buettcher SIGIR'09 (public)."""
    return (
        _rrf_ranked(spark, sf_dir)
        .filter(F.col("rnk") <= _RRF_TOPK)
        .select("query_id", "doc_id", "lex_rank", "sem_rank", "rrf_nano", "rnk")
    )


def _rrf_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused RRF candidate list with a per-query rank (unfiltered) —
    shared by `hybrid_search_rrf` (top-5 report) and
    `rag_context_packing` (top-20 packing pool)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

    lex = _bm25_scored(spark, sf_dir)
    wl = Window.partitionBy("query_id").orderBy(F.col("s4").desc(), "doc_id")
    lex_r = (
        lex.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= _RRF_LEG_K)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("lex_rank").cast("int").alias("lex_rank"),
        )
    )
    emb = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings"))
    seeds = similarity.seed_rows(emb, _RRF_N_QUERIES)
    q_rows = [(i + 1, vec) for i, (_vid, vec) in enumerate(seeds)]
    sem = similarity.score_against_matrix(emb, q_rows)
    ws = Window.partitionBy("query_id").orderBy(
        round_det(F.col("cosine"), 6).desc(), F.col("cand_id")
    )
    sem_r = (
        sem.withColumn("sem_rank", F.row_number().over(ws))
        .filter(F.col("sem_rank") <= _RRF_LEG_K)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("cand_id").cast("long").alias("doc_id"),
            F.col("sem_rank").cast("int").alias("sem_rank"),
        )
    )
    contrib_l = F.coalesce(
        F.expr(f"1000000000 div ({_RRF_K} + lex_rank)"), F.lit(0).cast("long")
    )
    contrib_s = F.coalesce(
        F.expr(f"1000000000 div ({_RRF_K} + sem_rank)"), F.lit(0).cast("long")
    )
    fused = lex_r.join(sem_r, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_nano", (contrib_l + contrib_s).cast("long")
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf_nano").desc(), "doc_id")
    return fused.withColumn("rnk", F.row_number().over(wf).cast("int"))


@register(
    "probe_calibration_ece",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> floor(x * 1000000.0 + (0.5 + 1e-8))) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT vec_id,
               ROUND(list_dot_product(v, [{", ".join(repr(w) for w in _PROBE_W)}])
                     / 1000000.0 + 1e-8, 6) AS score,
               (list_dot_product(v, [{", ".join(repr(w) for w in _PROBE_W)}]) > 0)
                   = (label >= 5) AS correct
        FROM e
    ),
    conf AS (
        SELECT vec_id, score, correct,
               CAST(floor(
                   (CASE WHEN 1.0 / (1.0 + exp(-score)) >= 0.5
                         THEN 1.0 / (1.0 + exp(-score))
                         ELSE 1.0 - 1.0 / (1.0 + exp(-score)) END) * 1000000
                   + 0.5 + 1e-8) AS BIGINT) AS conf6,
               ntile(10) OVER (ORDER BY score, vec_id) AS bin
        FROM scored
    ),
    b AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(sum(conf6) AS BIGINT) AS sum_conf6
        FROM conf GROUP BY bin
    )
    SELECT CAST(bin AS INT) AS bin, n, n_correct,
           ROUND(n_correct / (1.0 * n) + 1e-8, 4) AS avg_acc,
           ROUND(sum_conf6 / (1000000.0 * n) + 1e-8, 4) AS avg_conf,
           CAST(abs((n_correct * 1000000) // n - sum_conf6 // n) AS BIGINT) AS gap6
    FROM b
    """,
    tags=("mlprep", "ml-eval", "calibration", "global-ntile"),
)
def probe_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION AUDIT of the linear probe (reliability-diagram bins,
    the per-bin view under Expected Calibration Error): score every
    embedding with the `embedding_linear_probe` weights against the
    binary target label >= 5, convert scores to confidences via
    sigmoid (conf = max(p, 1-p)), decile-bin by score, and report each
    bin's accuracy-vs-confidence gap — the artifact that decides
    whether a quality-filter model's scores can be thresholded as
    probabilities (Guo et al. 2017, public).  Exactness: per-row
    confidence quantized to 1e-6 BEFORE summation; per-bin gap compares
    integer-divided micro-units, so the hash pins the whole diagram.
    Binning: the Spark side rides `global_ntile` over (score, vec_id)
    (no data-sized window) vs the oracle's native ntile — a third
    kernel-equivalence consumer after `pad_waste_bucketing` /
    `customer_rfm_segments`.  Plan: one scan, one codegen'd dot
    product, the kernel's range shuffle, one hash agg."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_ntile

    e = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", "embedding"
    )
    q = similarity._qvec(F.col("embedding"))
    w = F.array(*[F.lit(v) for v in _PROBE_W])
    dot = similarity._dot(q, w)
    scored = e.select(
        "vec_id",
        round_det(dot / 1000000.0, 6).alias("score"),
        ((dot > 0) == (F.col("label") >= 5)).alias("correct"),
    )
    p = 1.0 / (1.0 + F.exp(-F.col("score")))
    conf6 = F.floor(
        F.when(p >= 0.5, p).otherwise(1.0 - p) * 1000000 + F.lit(0.5 + 1e-8)
    ).cast("long")
    conf = global_ntile(
        scored.withColumn("conf6", conf6), [F.col("score"), F.col("vec_id")], 10, out="bin"
    )
    b = conf.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("correct").cast("long")).cast("long").alias("n_correct"),
        F.sum("conf6").cast("long").alias("sum_conf6"),
    )
    return b.select(
        F.col("bin").cast("int").alias("bin"),
        "n",
        "n_correct",
        round_det(F.col("n_correct") / (1.0 * F.col("n")), 4).alias("avg_acc"),
        round_det(F.col("sum_conf6") / (1000000.0 * F.col("n")), 4).alias("avg_conf"),
        F.abs(
            F.expr("(n_correct * 1000000) div n") - F.expr("sum_conf6 div n")
        ).cast("long").alias("gap6"),
    )


import math as _math

# NDCG position discounts 1/log2(i+1), i = 1..10, precomputed once as
# exact 1e6-unit integer literals shared by both engines — DCG becomes
# an order-independent integer sum.
_NDCG_K = 10
_NDCG_T6 = tuple(round(1_000_000 / _math.log2(i + 1)) for i in range(1, _NDCG_K + 1))


@register(
    "retrieval_ndcg_at_k",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, {similarity.qvec_sql('CAST(embedding AS DOUBLE[])')} AS v
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
          FROM e ORDER BY vec_id LIMIT 5),
    ranked AS (
        SELECT query_id, qlabel, cand_label, rank FROM (
            SELECT q.query_id, q.qlabel, c.label AS cand_label,
                   row_number() OVER (PARTITION BY q.query_id ORDER BY
                       ROUND({similarity.cosine_q6_sql('q.qv', 'c.v')} + 1e-8, 6) DESC,
                       c.vec_id) AS rank
            FROM q, e c WHERE c.vec_id <> q.query_id
        ) WHERE rank <= {_NDCG_K}
    ),
    t(i, t6) AS (VALUES {", ".join(f"({i + 1}, {t})" for i, t in enumerate(_NDCG_T6))}),
    dcg AS (
        SELECT query_id,
               CAST(sum(CASE WHEN cand_label = qlabel THEN t.t6 ELSE 0 END) AS BIGINT)
                   AS dcg6
        FROM ranked JOIN t ON t.i = ranked.rank
        GROUP BY query_id
    ),
    rel AS (
        SELECT q.query_id, CAST(count(*) AS BIGINT) AS n_rel
        FROM q JOIN e c ON c.label = q.qlabel AND c.vec_id <> q.query_id
        GROUP BY q.query_id
    ),
    idcg AS (
        SELECT rel.query_id, rel.n_rel,
               CAST(sum(t.t6) AS BIGINT) AS idcg6
        FROM rel JOIN t ON t.i <= least({_NDCG_K}, rel.n_rel)
        GROUP BY rel.query_id, rel.n_rel
    )
    SELECT idcg.query_id, idcg.n_rel, dcg.dcg6, idcg.idcg6,
           ROUND(dcg.dcg6 / (1.0 * idcg.idcg6) + 1e-8, 6) AS ndcg
    FROM idcg JOIN dcg ON dcg.query_id = idcg.query_id
    """,
    tags=("mlprep", "retrieval", "ml-eval", "ndcg"),
)
def retrieval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the exact-cosine retriever against label-match
    relevance — the ranking-quality metric that, next to
    `embedding_ann_recall`'s set-overlap, weighs WHERE in the list the
    relevant items landed (Jarvelin & Kekalainen 2002): rel_i = (cand
    label == query label), DCG = sum rel_i / log2(i+1), normalized by
    the ideal list of min(k, R) relevants where R counts all label
    matches in the corpus.  The position discounts are precomputed
    1e6-unit INTEGER literals shared by both engines, so DCG and IDCG
    are order-independent integer sums and the only float is the final
    ratio — the metric hashes, not an approximation of it.  Plan: one
    corpus scan against the 5-query broadcast matrix (Arrow kernel),
    a bounded top-k window, and label-count joins; the discount table
    is k rows."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

    emb = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings"))
    labels = emb.select("vec_id", "label")
    qmeta = labels.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    topk = similarity.brute_force_topk(emb, emb.orderBy("vec_id").limit(5), k=_NDCG_K)
    ranked = (
        topk.join(F.broadcast(qmeta), "query_id")
        .join(labels.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label")), "cand_id")
        .select("query_id", "qlabel", "cand_label", F.col("rank").alias("rank"))
    )
    t = F.broadcast(
        emb.sparkSession.createDataFrame(
            [(i + 1, t) for i, t in enumerate(_NDCG_T6)], "i int, t6 long"
        )
    )
    dcg = (
        ranked.join(t, F.col("i") == F.col("rank"))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("cand_label") == F.col("qlabel"), F.col("t6")).otherwise(0)
            )
            .cast("long")
            .alias("dcg6")
        )
    )
    rel = (
        qmeta.join(
            labels.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label")),
            F.col("cand_label") == F.col("qlabel"),
        )
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    )
    idcg = (
        rel.join(t, F.col("i") <= F.least(F.lit(_NDCG_K), F.col("n_rel")))
        .groupBy("query_id", "n_rel")
        .agg(F.sum("t6").cast("long").alias("idcg6"))
    )
    return idcg.join(dcg, "query_id").select(
        "query_id",
        "n_rel",
        "dcg6",
        "idcg6",
        round_det(F.col("dcg6") / (1.0 * F.col("idcg6")), 6).alias("ndcg"),
    )


_FH_SLOTS = 1024
_FH_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "feature_hashing_collisions",
    oracle=f"""
    WITH feats AS (
        SELECT DISTINCT
               (CASE event_type {" ".join(f"WHEN '{t}' THEN {i}" for i, t in enumerate(_FH_TYPES))}
                     ELSE 9 END) * 1000
               + CAST(json_extract(props, '$.k') AS BIGINT) AS feature_id
        FROM events WHERE props IS NOT NULL
    ),
    slotted AS (
        SELECT feature_id,
               (feature_id * 2654435761) % 4294967296 % {_FH_SLOTS} AS slot
        FROM feats
    ),
    load AS (
        SELECT slot, CAST(count(*) AS BIGINT) AS n_in_slot
        FROM slotted GROUP BY slot
    )
    SELECT CAST((SELECT count(*) FROM feats) AS BIGINT) AS n_features,
           CAST(count(*) AS BIGINT) AS n_slots_used,
           CAST(sum(CASE WHEN n_in_slot > 1 THEN n_in_slot ELSE 0 END) AS BIGINT)
               AS n_colliding_features,
           CAST(max(n_in_slot) AS BIGINT) AS max_slot_load,
           ROUND(sum(CASE WHEN n_in_slot > 1 THEN n_in_slot ELSE 0 END)
                 / (1.0 * (SELECT count(*) FROM feats)) + 1e-8, 6) AS collision_rate
    FROM load
    """,
    tags=("mlprep", "feature-hashing", "hashing-trick"),
)
def feature_hashing_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE HASHING TRICK's collision census — before a pipeline commits
    to hashing categorical features into a fixed 2^10-slot vector
    (Weinberger et al. 2009, the sparse-feature workhorse of CTR
    models and Vowpal Wabbit), it owes this measurement: how many
    distinct (event_type, props.k) features collide, and how hot the
    worst slot gets.  The hash is the engine-neutral Knuth
    multiplicative on a deterministic integer feature id (JSON-shredded
    k + a CASE-mapped type index — both engines compute the identical
    slot, unlike a string hash whose implementation differs per
    engine).  distinct-FIRST: features collapse before slotting, so
    collision counting is feature-cardinality-sized regardless of
    event volume.  Output pins the occupancy profile (used slots,
    colliding features, max load, rate) that decides whether 2^10 is
    enough dimensions."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    type_idx = F.when(F.col("event_type") == _FH_TYPES[0], 0)
    for i, t in enumerate(_FH_TYPES[1:], start=1):
        type_idx = type_idx.when(F.col("event_type") == t, i)
    type_idx = type_idx.otherwise(9)
    feature_id = (
        type_idx * 1000 + F.get_json_object("props", "$.k").cast("long")
    ).alias("feature_id")
    feats = ev.select(feature_id).distinct()
    slotted = feats.select(
        "feature_id",
        ((F.col("feature_id") * 2654435761) % 4294967296 % _FH_SLOTS).alias("slot"),
    )
    load = slotted.groupBy("slot").agg(F.count(F.lit(1)).cast("long").alias("n_in_slot"))
    tot = F.broadcast(feats.agg(F.count(F.lit(1)).cast("long").alias("n_features")))
    return load.crossJoin(tot).groupBy("n_features").agg(
        F.count(F.lit(1)).cast("long").alias("n_slots_used"),
        F.sum(F.when(F.col("n_in_slot") > 1, F.col("n_in_slot")).otherwise(0))
        .cast("long")
        .alias("n_colliding_features"),
        F.max("n_in_slot").cast("long").alias("max_slot_load"),
        round_det(
            F.sum(F.when(F.col("n_in_slot") > 1, F.col("n_in_slot")).otherwise(0))
            / (1.0 * F.first("n_features")),
            6,
        ).alias("collision_rate"),
    ).select(
        "n_features", "n_slots_used", "n_colliding_features", "max_slot_load", "collision_rate"
    )


@register(
    "quantile_normalize_feature",
    oracle="""
    WITH g AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS grank,
               count(*) OVER () AS n_total
        FROM documents
    ),
    s AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS srank,
               count(*) OVER (PARTITION BY source) AS n_src
        FROM documents
    ),
    target AS (
        SELECT doc_id, source, n_chars,
               CASE WHEN n_src > 1
                    THEN 1 + ((srank - 1) * ((SELECT max(n_total) FROM g) - 1)) // (n_src - 1)
                    ELSE 1 + ((SELECT max(n_total) FROM g) - 1) // 2
               END AS gidx
        FROM s
    )
    SELECT t.doc_id, t.source, CAST(t.n_chars AS BIGINT) AS n_chars,
           CAST(g.n_chars AS BIGINT) AS qnorm_chars
    FROM target t JOIN g ON g.grank = t.gidx
    """,
    tags=("mlprep", "feature-prep", "quantile-normalization", "global-ntile"),
)
def quantile_normalize_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION of a per-source feature onto the pooled
    distribution — the cross-batch feature alignment trick (Bolstad et
    al. 2003, microarrays; today: making quality scores comparable
    across scraped sources whose raw scales drift): each document's
    n_chars maps to its WITHIN-SOURCE rank percentile, then reads off
    the GLOBAL value at that percentile, so every source's normalized
    distribution is the same pooled one.  All rank arithmetic is
    INTEGER (target index = 1 + (r-1)(N-1) div (n-1), singleton
    sources hit the pooled median) — no float percentiles, so the
    per-document mapping hashes exactly.  Scale: within-source ranks
    are group-parallel windows; the POOLED ranking rides
    `global_row_number` (range-partition kernel, no single-task sort);
    the percentile lookup is an equi-join on the global rank —
    data-sized but shuffle-keyed, never broadcast-sized."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import (
        global_row_number,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    g = global_row_number(docs, [F.col("n_chars"), F.col("doc_id")], out="grank")
    tot = F.broadcast(g.agg(F.max("grank").alias("n_total")))
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    s = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("srank"),
        F.count(F.lit(1)).over(wc).alias("n_src"),
    )
    target = s.crossJoin(tot).select(
        "doc_id",
        "source",
        "n_chars",
        F.when(
            F.col("n_src") > 1,
            1 + F.expr("((srank - 1) * (n_total - 1)) div (n_src - 1)"),
        )
        .otherwise(1 + F.expr("(n_total - 1) div 2"))
        .alias("gidx"),
    )
    lookup = g.select(F.col("grank").alias("gidx"), F.col("n_chars").alias("qnorm_chars"))
    return target.join(lookup, "gidx").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("qnorm_chars").cast("long").alias("qnorm_chars"),
    )


_RAG_POOL_K, _RAG_TOKEN_BUDGET = 20, 256


@register(
    "rag_context_packing",
    oracle=f"""
    WITH {_RRF_CTES},
    ranked AS (
        SELECT query_id, doc_id, rnk FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY rrf_nano DESC, doc_id) AS rnk
            FROM fused
        ) WHERE rnk <= {_RAG_POOL_K}
    ),
    dtoks AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 0))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    walk AS (
        SELECT r.query_id, r.rnk, d.n_tokens,
               sum(d.n_tokens) OVER (PARTITION BY r.query_id ORDER BY r.rnk
                                     ROWS UNBOUNDED PRECEDING) AS cum
        FROM ranked r JOIN dtoks d ON d.doc_id = r.doc_id
    )
    SELECT query_id,
           CAST(count(*) FILTER (WHERE cum <= {_RAG_TOKEN_BUDGET}) AS BIGINT)
               AS n_selected,
           CAST(COALESCE(max(cum) FILTER (WHERE cum <= {_RAG_TOKEN_BUDGET}), 0)
                AS BIGINT) AS tokens_used,
           CAST(min(rnk) FILTER (WHERE cum > {_RAG_TOKEN_BUDGET}) AS INT)
               AS first_dropped_rnk,
           CAST(count(*) AS BIGINT) AS n_candidates
    FROM walk GROUP BY query_id
    """,
    tags=("mlprep", "retrieval", "rag", "context-packing"),
)
def rag_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTEXT-WINDOW PACKING of retrieved chunks — the step between
    `hybrid_search_rrf` and the prompt: walk each query's fused top-20
    in rank order and keep the PREFIX whose cumulative token count fits
    the {_RAG_TOKEN_BUDGET}-token context budget (greedy
    best-ranked-first, the standard RAG packer; `corpus_pack_sequences`
    is the training-side cousin).  The greedy prefix is a running-sum
    window over a (queries x 20)-row frame — bounded by construction —
    joined to per-doc token counts, everything integer; the hashed
    report pins per query how many chunks fit, the tokens used, and
    the first rank the budget evicted.  At scale the candidate list is
    already bounded per query, so packing cost never depends on corpus
    size."""
    ranked = (
        _rrf_ranked(spark, sf_dir)
        .filter(F.col("rnk") <= _RAG_POOL_K)
        .select("query_id", "doc_id", "rnk")
    )
    dtoks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0))
        .cast("long")
        .alias("n_tokens"),
    )
    ww = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = ranked.join(dtoks, "doc_id").withColumn("cum", F.sum("n_tokens").over(ww))
    fits = F.col("cum") <= _RAG_TOKEN_BUDGET
    return walk.groupBy("query_id").agg(
        F.count(F.when(fits, 1)).cast("long").alias("n_selected"),
        F.coalesce(F.max(F.when(fits, F.col("cum"))), F.lit(0))
        .cast("long")
        .alias("tokens_used"),
        F.min(F.when(~fits, F.col("rnk"))).cast("int").alias("first_dropped_rnk"),
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
    )


@register(
    "source_ablation_probe",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> floor(x * 1000000.0 + (0.5 + 1e-8))) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT e.vec_id, d.source,
               CASE WHEN (list_dot_product(v, [{", ".join(repr(w) for w in _PROBE_W)}]) > 0)
                         = (label >= 5) THEN 1 ELSE 0 END AS correct
        FROM e JOIN documents d ON d.doc_id = e.vec_id
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(correct) AS BIGINT) AS c_all
        FROM scored
    ),
    per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_src,
               CAST(sum(correct) AS BIGINT) AS c_src
        FROM scored GROUP BY source
    )
    SELECT source, n_src,
           CAST((c_src * 1000000) // n_src AS BIGINT) AS acc_within_micro,
           CAST(((c_all - c_src) * 1000000) // (n_all - n_src) AS BIGINT)
               AS acc_without_micro,
           CAST((c_all * 1000000) // n_all
                - ((c_all - c_src) * 1000000) // (n_all - n_src) AS BIGINT)
               AS delta_micro
    FROM per CROSS JOIN tot
    """,
    tags=("mlprep", "ml-eval", "data-valuation", "ablation"),
)
def source_ablation_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE ABLATION census — the leave-one-source-out view that data
    valuation starts from: with the fixed linear probe as the scorer
    (retraining-free ablation, the honest cheap variant of
    Data-Shapley-style valuation), each source reports its in-source
    accuracy, the corpus accuracy WITHOUT it, and the delta the source
    contributes to the headline number — the evidence a curation
    pipeline needs before up/down-weighting a source in the mixture
    (`corpus_sample_mixture` consumes exactly such verdicts).  The
    embeddings join their documents by the id bridge (vec_id = doc_id).
    All accuracies are integer-division micro-units from exact correct
    counts — leave-one-out needs NO second pass because the probe is
    fixed: ablated accuracy is just (C - c_s)/(N - n_s) on integers.
    One scan, one agg, a 1-row broadcast."""
    e = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings"))
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    q = similarity._qvec(F.col("embedding"))
    w = F.array(*[F.lit(v) for v in _PROBE_W])
    dot = similarity._dot(q, w)
    scored = e.join(docs, "vec_id").select(
        "source",
        ((dot > 0) == (F.col("label") >= 5)).cast("long").alias("correct"),
    )
    tot = F.broadcast(
        scored.agg(
            F.count(F.lit(1)).cast("long").alias("n_all"),
            F.sum("correct").cast("long").alias("c_all"),
        )
    )
    per = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_src"),
        F.sum("correct").cast("long").alias("c_src"),
    )
    return per.crossJoin(tot).select(
        "source",
        "n_src",
        F.expr("(c_src * 1000000) div n_src").cast("long").alias("acc_within_micro"),
        F.expr("((c_all - c_src) * 1000000) div (n_all - n_src)")
        .cast("long")
        .alias("acc_without_micro"),
        F.expr(
            "(c_all * 1000000) div n_all"
            " - ((c_all - c_src) * 1000000) div (n_all - n_src)"
        )
        .cast("long")
        .alias("delta_micro"),
    )


_FERTILITY_ORACLE = (
    _BPE_ORACLE[: _BPE_ORACLE.index("\n    SELECT * FROM (")]
    + ","
    + """
    dw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
    ),
    e0 AS (
        SELECT doc_id, ',' || array_to_string(string_split(word, ''), ',') || ',' AS enc
        FROM dw
    ),"""
    + ",".join(_BPE_APPLY_ROUND.format(i=i, p=i - 1) for i in (1, 2, 3, 4, 5))
    + """,
    per_doc AS (
        SELECT doc_id, count(*) AS n_words,
               CAST(sum(len(list_filter(string_split(enc, ','), x -> x <> '')))
                    AS BIGINT) AS n_tokens,
               CAST(sum(length(replace(enc, ',', ''))) AS BIGINT) AS n_chars_detok
        FROM e5 GROUP BY doc_id
    ),
    orig AS (
        SELECT doc_id, CAST(sum(length(word)) AS BIGINT) AS n_chars
        FROM dw GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p.n_words) AS BIGINT) AS n_words,
           CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
           CAST((sum(p.n_tokens) * 1000000) // sum(p.n_words) AS BIGINT)
               AS fertility_micro,
           CAST((sum(o.n_chars) * 1000000) // sum(p.n_tokens) AS BIGINT)
               AS chars_per_token_micro,
           CAST(sum(CASE WHEN p.n_chars_detok <> o.n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_roundtrip_fail
    FROM per_doc p
    JOIN orig o ON o.doc_id = p.doc_id
    JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.lang
    """
)


@register(
    "tokenizer_fertility_by_lang",
    oracle=_FERTILITY_ORACLE,
    tags=("mlprep", "text", "tokenizer", "ml-eval"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY per language — the standard tokenizer-equity
    metric (tokens per word; its inverse, chars per token, is the
    compression view): a tokenizer trained mostly on one language
    fragments the others into more tokens, inflating their effective
    cost per word — the measurement multilingual-model reports lead
    with (XLM-R / NLLB evals, public).  Encodes every document with the
    `bpe_train_merges` tokenizer (same chained-replace application as
    `bpe_apply_tokenize`), aggregates per document language, and
    carries a ROUNDTRIP AUDIT column: detokenized character mass must
    equal the original word character mass per document (BPE merges
    only ever concatenate, so any difference means the encode path
    corrupted text — n_roundtrip_fail must hash as 0).  Fertility
    ratios are integer-division micro-units.  Plan: per-word map +
    per-doc agg + broadcast lang join — scan-speed."""
    merges = REGISTRY_LOOKUP("bpe_train_merges").build(spark, sf_dir).orderBy("round").collect()
    docs = load_table(spark, sf_dir, "documents")
    dw = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    enc = F.concat(F.lit(","), F.array_join(F.split("word", ""), ","), F.lit(","))
    for m in merges:
        enc = F.replace(enc, F.lit(f",{m.sym_a},{m.sym_b},"), F.lit(f",{m.sym_a}{m.sym_b},"))
    toks = F.size(F.filter(F.split(enc, ","), lambda x: x != F.lit("")))
    per_doc = dw.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(toks).cast("long").alias("n_tokens"),
        F.sum(F.length(F.replace(enc, F.lit(","), F.lit("")))).cast("long").alias(
            "n_chars_detok"
        ),
        F.sum(F.length("word")).cast("long").alias("n_chars"),
    )
    lang = docs.select("doc_id", "lang")
    return (
        per_doc.join(F.broadcast(lang), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.expr("(sum(n_tokens) * 1000000) div sum(n_words)")
            .cast("long")
            .alias("fertility_micro"),
            F.expr("(sum(n_chars) * 1000000) div sum(n_tokens)")
            .cast("long")
            .alias("chars_per_token_micro"),
            F.sum(F.when(F.col("n_chars_detok") != F.col("n_chars"), 1).otherwise(0))
            .cast("long")
            .alias("n_roundtrip_fail"),
        )
    )


_SEMDECON_N_BENCH, _SEMDECON_THRESH = 10, 0.999


@register(
    "decontamination_semantic",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, {similarity.qvec_sql('CAST(embedding AS DOUBLE[])')} AS v
        FROM embeddings
    ),
    bench AS (SELECT vec_id AS bench_id, v AS bv FROM e ORDER BY vec_id
              LIMIT {_SEMDECON_N_BENCH}),
    hits AS (
        SELECT c.vec_id,
               CAST(count(*) AS BIGINT) AS n_bench_hits,
               CAST(max(CAST(round(
                   {similarity.cosine_q6_sql('b.bv', 'c.v')} * 1000000 + 1e-8
               , 0) AS BIGINT)) AS BIGINT) AS best_cos_micro
        FROM e c JOIN bench b
          ON c.vec_id <> b.bench_id
         AND ROUND({similarity.cosine_q6_sql('b.bv', 'c.v')} + 1e-8, 6)
             >= {_SEMDECON_THRESH}
        GROUP BY c.vec_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(h.vec_id) AS BIGINT) AS n_contaminated,
           CAST(COALESCE(sum(h.n_bench_hits), 0) AS BIGINT) AS total_bench_hits,
           CAST(max(h.best_cos_micro) AS BIGINT) AS worst_cos_micro
    FROM documents d LEFT JOIN hits h ON h.vec_id = d.doc_id
    GROUP BY d.source
    """,
    tags=("mlprep", "decontamination", "semantic", "similarity"),
)
def decontamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination census — the embedding-space complement
    of `decontamination_overlap`'s n-gram matching: paraphrased or
    reformatted benchmark leakage shares no 13-gram but sits at
    near-unit cosine, so modern decontamination runs BOTH filters
    (e.g. the GPT-3/Llama eval-contamination appendices, public).  A
    held-out 'benchmark' set (first {_SEMDECON_N_BENCH} vectors by id)
    broadcasts against one corpus scan via the Arrow kernel with the
    threshold applied INSIDE the kernel (`min_cosine` prefilter — only
    qualifying pairs ever materialize, the same guard the near-dup
    families use); the per-source census reports how many documents
    would be quarantined and the worst similarity seen.  Cosines
    quantize to micro-units; the threshold comparison happens on the
    same rounded value in both engines.  At corpus scale the benchmark
    side stays broadcast-sized and the scan is one pass — or the
    IVF/LSH candidate paths drop in unchanged."""
    emb = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings"))
    bench_rows = similarity.seed_rows(emb, _SEMDECON_N_BENCH)
    scored = similarity.score_against_matrix(
        emb, bench_rows, min_cosine=_SEMDECON_THRESH - 1e-4
    )
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

    hits = (
        scored.filter(F.col("cand_id") != F.col("query_id"))
        .filter(round_det(F.col("cosine"), 6) >= _SEMDECON_THRESH)
        .groupBy("cand_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bench_hits"),
            F.max(F.round(F.col("cosine") * 1000000 + 1e-8, 0).cast("long")).alias(
                "best_cos_micro"
            ),
        )
        .withColumnRenamed("cand_id", "vec_id")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    return (
        docs.join(hits, "vec_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("n_bench_hits").cast("long").alias("n_contaminated"),
            F.coalesce(F.sum("n_bench_hits"), F.lit(0)).cast("long").alias(
                "total_bench_hits"
            ),
            F.max("best_cos_micro").cast("long").alias("worst_cos_micro"),
        )
    )


@register(
    "brier_score_decomposition",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> floor(x * 1000000.0 + (0.5 + 1e-8))) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT vec_id,
               ROUND(list_dot_product(v, [{", ".join(repr(w) for w in _PROBE_W)}])
                     / 1000000.0 + 1e-8, 6) AS score,
               (list_dot_product(v, [{", ".join(repr(w) for w in _PROBE_W)}]) > 0)
                   = (label >= 5) AS correct
        FROM e
    ),
    conf AS (
        SELECT vec_id, correct,
               CAST(floor(
                   (CASE WHEN 1.0 / (1.0 + exp(-score)) >= 0.5
                         THEN 1.0 / (1.0 + exp(-score))
                         ELSE 1.0 - 1.0 / (1.0 + exp(-score)) END) * 1000000
                   + 0.5 + 1e-8) AS BIGINT) AS conf6,
               ntile(10) OVER (ORDER BY score, vec_id) AS bin
        FROM scored
    ),
    rowl AS (
        SELECT bin, conf6,
               CASE WHEN correct THEN 1000000 ELSE 0 END AS o6,
               CASE WHEN correct THEN 1 ELSE 0 END AS o
        FROM conf
    ),
    b AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS nb,
               CAST(sum(conf6) AS BIGINT) AS s_conf,
               CAST(sum(o) AS BIGINT) AS s_o,
               CAST(sum((conf6 - o6) * (conf6 - o6)) AS BIGINT) AS s_sq
        FROM rowl GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(s_o) AS BIGINT) AS so,
                   CAST(sum(s_sq) AS BIGINT) AS ssq
            FROM b),
    terms AS (
        SELECT CAST(floor(
                   nb * ((s_conf / (1000000.0 * nb)) - (s_o / (1.0 * nb)))
                      * ((s_conf / (1000000.0 * nb)) - (s_o / (1.0 * nb)))
                   * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS rel_nano,
               CAST(floor(
                   nb * ((s_o / (1.0 * nb)) - (tot.so / (1.0 * tot.n)))
                      * ((s_o / (1.0 * nb)) - (tot.so / (1.0 * tot.n)))
                   * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS res_nano
        FROM b CROSS JOIN tot
    ),
    s AS (SELECT CAST(sum(rel_nano) AS BIGINT) AS srel,
                 CAST(sum(res_nano) AS BIGINT) AS sres
          FROM terms)
    SELECT tot.n AS n,
           ROUND(tot.ssq / (1000000000000.0 * tot.n) + 1e-8, 6) AS brier,
           ROUND(s.srel / (1000000000.0 * tot.n) + 1e-8, 6) AS reliability,
           ROUND(s.sres / (1000000000.0 * tot.n) + 1e-8, 6) AS resolution,
           ROUND((tot.so / (1.0 * tot.n)) * (1.0 - tot.so / (1.0 * tot.n)) + 1e-8, 6) AS uncertainty,
           ROUND(tot.ssq / (1000000000000.0 * tot.n)
                 - (s.srel / (1000000000.0 * tot.n)
                    - s.sres / (1000000000.0 * tot.n)
                    + (tot.so / (1.0 * tot.n)) * (1.0 - tot.so / (1.0 * tot.n)))
                 + 1e-8, 6) AS decomp_residual
    FROM tot CROSS JOIN s
    """,
    tags=("mlprep", "ml-eval", "brier", "murphy-decomposition", "global-ntile"),
)
def brier_score_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MURPHY DECOMPOSITION of the linear probe's Brier score —
    reliability (calibration error mass, what ECE summarizes), minus
    resolution (how much the bins separate outcomes), plus uncertainty
    (outcome base rate variance) — the one-row verdict on WHERE a
    quality-filter model's probability mass goes wrong, next to
    `probe_calibration_ece`'s per-bin diagram (Murphy 1973, public).
    Same probe/confidence construction as ECE (shared `_PROBE_W`
    literals, identical sigmoid-confidence micro-quantization, the
    SAME `global_ntile` score-decile binning).  Exactness: the Brier
    numerator sum((conf6-o6)^2) is an exact int64 sum; per-bin
    reliability/resolution terms are computed from exact integer bin
    sums in identical double expressions and nano-quantized per bin
    (10 bins); `decomp_residual` (the within-bin variance the binned
    identity leaves over) derives from the same quantized integers, so
    every column is hash-stable.  Plan: one scan, one codegen'd dot
    product, the global_ntile range shuffle, one 10-row agg + 1-row
    reduce."""
    from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import global_ntile

    e = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", "embedding"
    )
    q = similarity._qvec(F.col("embedding"))
    w = F.array(*[F.lit(v) for v in _PROBE_W])
    dot = similarity._dot(q, w)
    scored = e.select(
        "vec_id",
        round_det(dot / 1000000.0, 6).alias("score"),
        ((dot > 0) == (F.col("label") >= 5)).alias("correct"),
    )
    p = 1.0 / (1.0 + F.exp(-F.col("score")))
    conf6 = F.floor(
        F.when(p >= 0.5, p).otherwise(1.0 - p) * 1000000 + F.lit(0.5 + 1e-8)
    ).cast("long")
    binned = global_ntile(
        scored.withColumn("conf6", conf6), [F.col("score"), F.col("vec_id")], 10, out="bin"
    )
    rowl = binned.select(
        "bin",
        "conf6",
        F.when(F.col("correct"), F.lit(1000000)).otherwise(F.lit(0)).cast("long").alias("o6"),
        F.when(F.col("correct"), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("o"),
    )
    b = rowl.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("conf6").cast("long").alias("s_conf"),
        F.sum("o").cast("long").alias("s_o"),
        # decimal(38,0): exact past the int64 cliff (round-11 scale audit)
        F.sum(
            (F.col("conf6") - F.col("o6")).cast("decimal(38,0)")
            * (F.col("conf6") - F.col("o6")).cast("decimal(38,0)")
        ).alias("s_sq"),
    )
    tot = F.broadcast(
        b.agg(
            F.sum("nb").cast("long").alias("n"),
            F.sum("s_o").cast("long").alias("so"),
            F.sum("s_sq").alias("ssq"),
        )
    )
    cbar = F.col("s_conf") / (1000000.0 * F.col("nb"))
    obin = F.col("s_o") / (1.0 * F.col("nb"))
    obar = F.col("so") / (1.0 * F.col("n"))
    terms = b.crossJoin(tot).select(
        "n",
        "so",
        "ssq",
        F.floor(F.col("nb") * (cbar - obin) * (cbar - obin) * 1000000000 + F.lit(0.5 + 1e-8))
        .cast("long")
        .alias("rel_nano"),
        F.floor(F.col("nb") * (obin - obar) * (obin - obar) * 1000000000 + F.lit(0.5 + 1e-8))
        .cast("long")
        .alias("res_nano"),
    )
    agg = terms.agg(
        F.first("n").alias("n"),
        F.first("so").alias("so"),
        F.first("ssq").alias("ssq"),
        F.sum("rel_nano").alias("srel"),
        F.sum("res_nano").alias("sres"),
    )
    brier = F.col("ssq") / (1000000000000.0 * F.col("n"))
    rel = F.col("srel") / (1000000000.0 * F.col("n"))
    res = F.col("sres") / (1000000000.0 * F.col("n"))
    unc = (F.col("so") / (1.0 * F.col("n"))) * (1.0 - F.col("so") / (1.0 * F.col("n")))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        round_det(brier, 6).alias("brier"),
        round_det(rel, 6).alias("reliability"),
        round_det(res, 6).alias("resolution"),
        round_det(unc, 6).alias("uncertainty"),
        round_det(brier - (rel - res + unc), 6).alias("decomp_residual"),
    )


@register(
    "mixture_temperature_weights",
    oracle="""
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ),
    q AS (
        SELECT source, n,
               CAST(floor(exp(0.7 * ln(CAST(n AS DOUBLE))) * 1000000 + 0.5 + 1e-8) AS BIGINT) AS qs
        FROM c
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(qs) AS BIGINT) AS qt FROM q)
    SELECT source, n AS n_docs,
           (n * 1000000) // tot.nt AS raw_share_micro,
           (qs * 1000000) // tot.qt AS temp_share_micro,
           (((qs * 1000000) // tot.qt) * 1000) // ((n * 1000000) // tot.nt) AS boost_milli
    FROM q CROSS JOIN tot
    ORDER BY source
    """,
    tags=("mlprep", "corpus-mixture", "temperature-sampling"),
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-BASED mixture re-weighting (tau = 0.7) — the
    multilingual/multi-source sampling formula w_s ~ n_s^tau that
    up-weights small sources and damps head sources (the standard
    recipe behind multilingual LM data mixing; tau=1 is proportional,
    tau=0 uniform).  `corpus_sample_mixture` executes a hand-set
    mixture; this computes the PRINCIPLED one and the per-source boost
    factor a sampler must apply.  Exactness: n^0.7 = exp(0.7*ln(n)) is
    one identical IEEE expression per source, micro-quantized before
    normalization, so shares and boosts are integer floor-divisions of
    exact int64s.  Plan: one source census; everything after is
    sources-sized."""
    c = load_table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    )
    q = c.select(
        "source",
        "n",
        F.floor(F.exp(0.7 * F.log(F.col("n").cast("double"))) * 1000000 + F.lit(0.5 + 1e-8))
        .cast("long")
        .alias("qs"),
    )
    tot = F.broadcast(q.agg(F.sum("n").alias("nt"), F.sum("qs").alias("qt")))
    return (
        q.crossJoin(tot)
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.expr("(n * 1000000L) div nt").alias("raw_share_micro"),
            F.expr("(qs * 1000000L) div qt").alias("temp_share_micro"),
            F.expr("(((qs * 1000000L) div qt) * 1000L) div ((n * 1000000L) div nt)").alias(
                "boost_milli"
            ),
        )
        .orderBy("source")
    )


@register(
    "contrastive_negative_sampling",
    oracle="""
    WITH d AS (SELECT doc_id, source FROM documents),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
    pos AS (
        SELECT doc_id AS anchor_id, source,
               coalesce(lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id),
                        min(doc_id) OVER (PARTITION BY source)) AS positive_id
        FROM d
    ),
    negs AS (
        SELECT p.anchor_id, p.source, p.positive_id, j.j,
               ((p.anchor_id * 2654435761) % 4294967296 + j.j * 97) % n.nd AS negative_id
        FROM pos p CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS j) j CROSS JOIN n
    )
    SELECT g.anchor_id, g.positive_id, CAST(g.j AS INT) AS neg_rank, g.negative_id,
           nd.source <> g.source AS is_cross_source
    FROM negs g JOIN d nd ON nd.doc_id = g.negative_id
    WHERE g.negative_id <> g.anchor_id AND g.negative_id <> g.positive_id
    ORDER BY g.anchor_id, neg_rank
    """,
    tags=("mlprep", "contrastive", "negative-sampling", "training-pairs"),
)
def contrastive_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTRASTIVE TRAINING-PAIR construction — (anchor, positive,
    k=4 negatives) for embedding/retrieval training: the positive is
    the anchor's source-neighbor (next doc_id in the same source,
    cyclic — a cheap same-distribution positive), negatives are
    DETERMINISTIC hash draws over the whole corpus (Knuth
    multiplicative + per-slot offset, mod-first so products stay under
    2^63), with accidental anchor/positive collisions DROPPED rather
    than re-probed (the standard in-batch-negative discipline: a
    deterministic skip keeps the plan join-shaped; re-probing would
    serialize).  `is_cross_source` audits the easy/hard negative mix a
    curriculum cares about.  Plan: one source-partitioned lead window
    for positives, a 4-row literal fan-out, one equi-join to resolve
    negatives' sources — fully distributed, no per-row Python."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    nd = F.broadcast(d.agg(F.count(F.lit(1)).alias("nd")))
    w = Window.partitionBy("source").orderBy("doc_id")
    pos = d.select(
        F.col("doc_id").alias("anchor_id"),
        "source",
        F.coalesce(
            F.lead("doc_id").over(w), F.min("doc_id").over(Window.partitionBy("source"))
        ).alias("positive_id"),
    )
    js = F.broadcast(spark.range(1, 5).select(F.col("id").cast("long").alias("j")))
    negs = (
        pos.crossJoin(js)
        .crossJoin(nd)
        .select(
            "anchor_id",
            "source",
            "positive_id",
            "j",
            (((F.col("anchor_id") * 2654435761) % 4294967296 + F.col("j") * 97) % F.col("nd")).alias(
                "negative_id"
            ),
        )
    )
    neg_src = d.select(F.col("doc_id").alias("negative_id"), F.col("source").alias("neg_source"))
    return (
        negs.join(neg_src, "negative_id")
        .where(
            (F.col("negative_id") != F.col("anchor_id"))
            & (F.col("negative_id") != F.col("positive_id"))
        )
        .select(
            "anchor_id",
            "positive_id",
            F.col("j").cast("int").alias("neg_rank"),
            "negative_id",
            (F.col("neg_source") != F.col("source")).alias("is_cross_source"),
        )
        .orderBy("anchor_id", "neg_rank")
    )


@register(
    "decision_stump_exact_split",
    oracle="""
    WITH g AS (
        SELECT CAST(n_chars AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS n_tot,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        FROM documents GROUP BY 1
    ),
    r AS (
        SELECT x,
               sum(n_tot) OVER w AS nl, sum(n_pos) OVER w AS pl,
               (SELECT sum(n_tot) FROM g) AS n, (SELECT sum(n_pos) FROM g) AS p
        FROM g
        WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cand AS (
        SELECT x, nl, pl, n - nl AS nr, p - pl AS pr, n, p,
               CAST(floor((
                   (nl / (1.0 * n)) * (1.0 - (pl / (1.0 * nl)) * (pl / (1.0 * nl))
                                            - ((nl - pl) / (1.0 * nl)) * ((nl - pl) / (1.0 * nl)))
                 + ((n - nl) / (1.0 * n)) * (1.0 - ((p - pl) / (1.0 * (n - nl))) * ((p - pl) / (1.0 * (n - nl)))
                                                  - (((n - nl) - (p - pl)) / (1.0 * (n - nl))) * (((n - nl) - (p - pl)) / (1.0 * (n - nl))))
               ) * 1000000 + 0.5 + 1e-8) AS BIGINT) AS gini_micro
        FROM r WHERE n - nl > 0
    ),
    best AS (SELECT * FROM cand ORDER BY gini_micro, x LIMIT 1)
    SELECT x AS split_threshold,
           CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
           CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
           gini_micro,
           CAST((greatest(pl, nl - pl) + greatest(pr, nr - pr)) * 1000000 // n
               AS BIGINT) AS acc_micro
    FROM best
    """,
    tags=("mlprep", "decision-stump", "exact-split-search", "global-running-sum"),
)
def decision_stump_exact_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT DECISION-STUMP split search — the inner loop of every
    tree/GBDT trainer, run as a query: find the threshold on document
    length that best separates English from non-English by weighted
    Gini impurity, searching EVERY candidate split exactly (per
    distinct feature value) instead of sampling quantiles.  The trick
    that makes it one pass: collapse to the distinct-value table, then
    LEFT-side class counts at every threshold are inclusive PREFIX
    SUMS — the Spark side rides the `global_running_sum` kernel twice
    (total weight, then positive weight; no data-sized window), the
    oracle uses native window sums.  Gini is micro-quantized per
    candidate from exact integer counts, argmin tie-breaks on the
    smaller threshold, and the stump's training accuracy is an integer
    floor-division.  At scale: candidate count = distinct feature
    values, independent of row count — exactly how XGBoost's exact
    tree method frames it."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators.windows import (
        global_running_sum,
    )

    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.col("n_chars").cast("long").alias("x"))
        .agg(
            F.count(F.lit(1)).alias("n_tot"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_pos"),
        )
    )
    r1 = global_running_sum(g, [F.col("x")], "n_tot", out="nl").withColumnRenamed(
        "_grs_total", "n"
    )
    r2 = global_running_sum(r1, [F.col("x")], "n_pos", out="pl").withColumnRenamed(
        "_grs_total", "p"
    )
    nl, pl, n, p = F.col("nl"), F.col("pl"), F.col("n"), F.col("p")
    nr, pr = n - nl, p - pl
    gini = (nl / (1.0 * n)) * (
        1.0 - (pl / (1.0 * nl)) * (pl / (1.0 * nl)) - ((nl - pl) / (1.0 * nl)) * ((nl - pl) / (1.0 * nl))
    ) + (nr / (1.0 * n)) * (
        1.0 - (pr / (1.0 * nr)) * (pr / (1.0 * nr)) - ((nr - pr) / (1.0 * nr)) * ((nr - pr) / (1.0 * nr))
    )
    cand = r2.where(nr > 0).select(
        "x",
        nl.alias("nl"),
        pl.alias("pl"),
        nr.alias("nr"),
        pr.alias("pr"),
        "n",
        F.floor(gini * 1000000 + F.lit(0.5 + 1e-8)).cast("long").alias("gini_micro"),
    )
    best = cand.orderBy("gini_micro", "x").limit(1)
    return best.select(
        F.col("x").alias("split_threshold"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("pl").cast("long").alias("pos_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.col("pr").cast("long").alias("pos_right"),
        "gini_micro",
        F.expr(
            "((greatest(pl, nl - pl) + greatest(pr, nr - pr)) * 1000000L) div n"
        ).alias("acc_micro"),
    )


@register(
    "naive_bayes_lang_classifier",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split(lower(text), ' '), x -> length(x) > 0)) AS term
        FROM documents
    ),
    langs AS (SELECT unnest(['de', 'en', 'es', 'fr']) AS lang),
    prior AS (
        SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents d WHERE d.doc_id % 2 = 0 GROUP BY 1
    ),
    tc AS (
        SELECT term, lang, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE doc_id % 2 = 0 GROUP BY 1, 2
    ),
    lt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nl FROM tc GROUP BY 1),
    vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tc),
    ev AS (SELECT doc_id, lang AS true_lang, term FROM toks WHERE doc_id % 2 = 1),
    contrib AS (
        SELECT ev.doc_id, ev.true_lang, l.lang,
               CAST(floor(ln((coalesce(tc.c, 0) + 1)
                             / CAST(lt.nl + vocab.v AS DOUBLE))
                          * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS nano
        FROM ev CROSS JOIN langs l
        LEFT JOIN tc ON tc.term = ev.term AND tc.lang = l.lang
        JOIN lt ON lt.lang = l.lang
        CROSS JOIN vocab
    ),
    perdoc AS (
        SELECT c.doc_id, c.true_lang, c.lang,
               CAST(sum(c.nano) AS BIGINT)
               + CAST(floor(ln(p.n_docs / CAST((SELECT sum(n_docs) FROM prior) AS DOUBLE))
                            * 1000000000 + 0.5 + 1e-8) AS BIGINT) AS score
        FROM contrib c JOIN prior p ON p.lang = c.lang
        GROUP BY 1, 2, 3, p.n_docs
    ),
    pred AS (
        SELECT doc_id, true_lang, lang AS pred_lang,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
        FROM perdoc
    )
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
    FROM pred WHERE rk = 1
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("mlprep", "naive-bayes", "in-engine-training", "ml-eval"),
)
def naive_bayes_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTINOMIAL NAIVE BAYES language classifier, trained AND
    evaluated inside the engine: add-one-smoothed per-language term
    likelihoods + document priors fit on even doc_ids, argmax scoring
    on odd doc_ids, confusion matrix out — the classical-ML-in-SQL
    member next to the OLS family, k-means IVF, the linear probe and
    `decision_stump_exact_split` (and a LEARNED contrast to
    `lang_id_confusion_matrix`'s fixed marker-word heuristic).
    Exactness: every count exact int64; each token-x-language
    log-likelihood and each prior is ONE identical double ln,
    nano-quantized, so per-document scores are order-independent
    integer sums and the argmax (tie-break on language code) is an
    integer decision.  Plan: model = two token-keyed aggregates;
    scoring = one LEFT equi-join of eval tokens against the
    (term x lang) table + a doc-partitioned 4-row argmax — never
    per-row Python."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: F.length(x) > 0)
        ).alias("term"),
    )
    langs = F.broadcast(
        spark.createDataFrame([("de",), ("en",), ("es",), ("fr",)], "lang string")
    )
    train_docs = docs.where(F.col("doc_id") % 2 == 0)
    prior = train_docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tc = (
        toks.where(F.col("doc_id") % 2 == 0)
        .groupBy("term", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lt = tc.groupBy("lang").agg(F.sum("c").alias("nl"))
    vocab = F.broadcast(tc.select("term").distinct().agg(F.count(F.lit(1)).alias("v")))
    prior_tot = F.broadcast(prior.agg(F.sum("n_docs").alias("npt")))
    ev = toks.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.col("lang").alias("true_lang"), "term"
    )
    tcl = tc.select(F.col("term").alias("t2"), F.col("lang").alias("l2"), "c")
    contrib = (
        ev.crossJoin(langs)
        .join(
            tcl,
            (F.col("t2") == F.col("term")) & (F.col("l2") == F.col("lang")),
            "left",
        )
        .join(F.broadcast(lt), "lang")
        .crossJoin(vocab)
        .select(
            "doc_id",
            "true_lang",
            "lang",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("nl") + F.col("v")).cast("double")
                )
                * 1000000000
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("nano"),
        )
    )
    prior_nano = (
        prior.crossJoin(prior_tot)
        .select(
            "lang",
            F.floor(
                F.log(F.col("n_docs") / F.col("npt").cast("double")) * 1000000000
                + F.lit(0.5 + 1e-8)
            )
            .cast("long")
            .alias("pn"),
        )
    )
    perdoc = (
        contrib.groupBy("doc_id", "true_lang", "lang")
        .agg(F.sum("nano").alias("s"))
        .join(F.broadcast(prior_nano), "lang")
        .select("doc_id", "true_lang", "lang", (F.col("s") + F.col("pn")).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    pred = perdoc.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    return (
        pred.groupBy(F.col("true_lang"), F.col("lang").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )
