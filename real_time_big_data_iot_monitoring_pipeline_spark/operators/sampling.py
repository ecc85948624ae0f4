"""Deterministic sampling / splitting / budgeting for training corpora.

`df.sample()` is partition-dependent (seeded per-partition RNG), so its
output changes with the file layout — useless for reproducible corpus
curation and impossible to oracle-check.  Everything here derives
pseudo-randomness from a Knuth multiplicative hash of the row's own id:

    h(id) = (id * 2654435761) mod 2^32        (golden-ratio constant)

which is a pure column expression (exact in int64: id * 2.6e9 stays
below 2^63 for ids < 2^31), identical on every engine, and independent
of partitioning — the same property the fixture generator and the
portable MinHash family rely on.

At 100 TB these are all one scan + (for stratified variants) one shuffle
on the stratum key; nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det

KNUTH = 2654435761  # 2^32 * (golden ratio - 1), the classic multiplicative hash
MOD = 2**32


def det_hash(id_col) -> F.Column:
    """Deterministic uniform-ish hash of an integer id to [0, 2^32)."""
    return (F.col(id_col) if isinstance(id_col, str) else id_col) * F.lit(KNUTH) % F.lit(MOD)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    fraction: float = 0.2,
) -> DataFrame:
    """EXACT per-stratum fraction: rank rows inside each stratum by the
    deterministic hash (unique tie-break on id) and keep the first
    ceil(fraction * n).  One shuffle on the stratum key; the hash order
    makes the kept set a uniform draw that never changes across runs,
    partitionings, or engines."""
    w = Window.partitionBy(stratum_col).orderBy(det_hash(id_col), F.col(id_col))
    n = Window.partitionBy(stratum_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        .filter(F.col("_rk") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rk", "_n")
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Reproducible train/val/test assignment: bucket = h(id) mod 100.
    A pure map — no shuffle, no state; every engine and every re-run
    assigns each id to the same split (the property `randomSplit`
    lacks)."""
    bucket = det_hash(id_col) % F.lit(100)
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    cap: int = 10,
) -> DataFrame:
    """Frequency capping: keep at most `cap` rows per group, chosen as a
    deterministic uniform draw (hash rank, unique id tie-break) — the
    domain-capping step every web-scale corpus applies so one mega-domain
    cannot dominate the training mix.  One shuffle on the group key; the
    per-group state is a bounded top-`cap` heap (row_number + filter
    lowers to a rank-limited sort within each group), so a 100 TB corpus
    with a million domains streams through without any group ever
    materializing beyond its partition."""
    w = Window.partitionBy(group_col).orderBy(det_hash(id_col), F.col(id_col))
    return (
        df.withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= F.lit(cap))
    )


def token_budget(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Corpus token budget per group with each group's share of the total
    and the cumulative share in descending-token order — the report that
    drives mixture weighting when assembling a training corpus.  One hash
    agg + one single-partition window over the (small) group rows."""
    toks = F.size(F.split(F.col(text_col), " "))
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(toks).alias("n_tokens")
    )
    # grand total via the 1-row-aggregate broadcast pattern (same shape as
    # the IQR bounds — no driver collect); the cumulative window runs over
    # AGGREGATED group rows only (cardinality = #groups, bounded), declared
    # as one explicit partition rather than an implicit global window.
    tot = agg.agg(F.sum("n_tokens").alias("_tot"))
    cum = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.col("n_tokens").desc(), *[F.col(c) for c in group_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        *group_cols,
        "n_docs",
        "n_tokens",
        round_det(F.try_divide(F.col("n_tokens"), F.col("_tot")), 6).alias("share"),
        round_det(F.try_divide(F.sum("n_tokens").over(cum), F.col("_tot")), 6).alias(
            "cum_share"
        ),
    )


def shard_assign(
    df: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_tokens: int = 2000,
) -> DataFrame:
    """Assign documents to ~shard_tokens-sized training shards: inside
    each stratum, order by the deterministic hash (a reproducible
    pseudo-random interleave) and cut a new shard every time the running
    token total crosses the budget — shard = floor(tokens_before / budget)
    over the exclusive prefix sum.  One partitioned window per stratum;
    shard boundaries are identical on every engine and partitioning."""
    toks = F.size(F.split(F.col(text_col), " "))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(det_hash(id_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.select(
        F.col(id_col),
        F.col(stratum_col),
        toks.alias("n_tokens"),
        F.floor(
            F.coalesce(F.sum(toks).over(w), F.lit(0)) / F.lit(shard_tokens)
        ).alias("shard"),
    )


def pack_sequences(
    df: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_tokens: int = 512,
    tokens_col: str | None = None,
) -> DataFrame:
    """Sequence packing: lay the corpus out into fixed-`seq_tokens`
    training sequences and emit one row per (document, sequence) SPAN —
    the packing manifest an LLM training loader consumes.  Unlike
    `shard_assign` (whole documents per shard), a document whose token
    range crosses a sequence boundary is SPLIT: it contributes a span
    `(span_offset, span_tokens)` to every sequence its range overlaps,
    so concatenating spans in (seq, then offset) order reproduces the
    token stream exactly with zero padding between documents.

    Plan shape: one exclusive-prefix-sum window per stratum gives each
    document its absolute token interval [start, start+n); the spans are
    a `sequence(first_seq, last_seq)` explode — fan-out 1 + the number
    of boundary crossings, i.e. output rows = docs + total_tokens/budget,
    never quadratic.  Deterministic hash order makes the layout
    reproducible on any engine or partitioning; at 100 TB this is one
    shuffle on the stratum key and a near-1x explode.

    Pass `tokens_col` to pack on a precomputed token count (the shape a
    real pipeline has after its tokenizer stage) instead of counting
    whitespace tokens from `text_col`."""
    toks = (
        F.col(tokens_col) if tokens_col else F.size(F.split(F.col(text_col), " "))
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(det_hash(id_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = F.lit(seq_tokens)
    laid = df.select(
        F.col(stratum_col),
        F.col(id_col),
        toks.alias("n_tokens"),
        F.coalesce(F.sum(toks).over(w), F.lit(0)).cast("long").alias("start"),
    )
    # Zero-token documents span no sequence: without this filter the
    # explode's `sequence(floor(start/b), floor((start-1)/b))` generates a
    # DESCENDING 2-element sequence whenever `start` lands exactly on a
    # budget boundary (Spark's sequence(1, 0) -> [1, 0]), emitting spurious
    # zero-token span rows the oracle's generate_series never produces
    # (round-3 advice).  They contribute 0 to every prefix sum either way.
    laid = laid.filter(F.col("n_tokens") > 0)
    end = F.col("start") + F.col("n_tokens")  # exclusive
    spans = laid.select(
        stratum_col,
        id_col,
        "n_tokens",
        "start",
        F.explode(
            F.sequence(F.floor(F.col("start") / b), F.floor((end - 1) / b))
        ).alias("seq"),
    )
    span_start = F.greatest(F.col("seq") * b, F.col("start"))
    span_end = F.least((F.col("seq") + 1) * b, F.col("start") + F.col("n_tokens"))
    return spans.select(
        stratum_col,
        F.col("seq"),
        id_col,
        (span_start - F.col("start")).cast("long").alias("span_offset"),
        (span_end - span_start).cast("long").alias("span_tokens"),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 128,
    stride: int = 96,
    tokens_col: str | None = None,
) -> DataFrame:
    """Overlapping-chunk manifest (the RAG / context-window chunker):
    emit one row per (document, chunk) with `tok_start` / `tok_len`,
    where chunks start every `stride` tokens and span `chunk` tokens —
    consecutive chunks overlap by `chunk - stride` so no boundary
    context is lost.  The last chunk starts at
    `ceil(max(n - chunk, 0) / stride) * stride`, which always covers the
    document tail; a document shorter than one chunk yields exactly one
    row of its full length; zero-token documents yield nothing.

    Unlike `pack_sequences` (which concatenates documents into fixed
    training sequences), chunking is per-document and needs NO prefix
    sum: it is a pure map + bounded explode (fan-out ~ n/stride), no
    shuffle at all — at 100 TB this runs at scan speed.  Pass
    `tokens_col` to chunk on a precomputed token count."""
    assert 0 < stride <= chunk, "stride must be in (0, chunk] for gapless coverage"
    toks = (
        F.col(tokens_col) if tokens_col else F.size(F.split(F.col(text_col), " "))
    ).cast("long")
    last = F.ceil(
        F.greatest(F.col("n_tokens") - F.lit(chunk), F.lit(0)) / F.lit(stride)
    ).cast("long")
    spans = (
        df.select(F.col(id_col), toks.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .select(
            id_col,
            "n_tokens",
            F.explode(F.sequence(F.lit(0).cast("long"), last)).alias("chunk_idx"),
        )
    )
    start = F.col("chunk_idx") * F.lit(stride)
    return spans.select(
        id_col,
        "chunk_idx",
        start.alias("tok_start"),
        F.least(F.lit(chunk).cast("long"), F.col("n_tokens") - start).alias("tok_len"),
    )


def stratified_sample_fractions(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default: float = 0.0,
) -> DataFrame:
    """Mixture re-weighting: an EXACT, per-stratum sampling fraction —
    the corpus-assembly step that DOWN-samples each (language,
    source, ...) group to its target share of the training mix.  Same
    deterministic machinery as `stratified_sample` (hash-rank inside
    each stratum, keep the first ceil(n*frac)), but the fraction comes
    from a per-stratum map; strata absent from the map get `default`.
    One shuffle on the stratum key; reproducible on any engine or
    partitioning.

    Fractions must be in [0, 1]: the rank filter can only KEEP existing
    rows, so an up-sampling fraction > 1 cannot be honored and raises
    loudly instead of silently capping at 100% (round-3 advice).
    Up-sampling a stratum is a row-duplication explode
    (`explode(sequence(1, ceil(frac)))` + a fractional keep on the last
    copy) — a deliberate, separate operation, not a silent fallback."""
    bad = {k: v for k, v in fractions.items() if not 0.0 <= float(v) <= 1.0}
    if bad or not 0.0 <= float(default) <= 1.0:
        raise ValueError(
            f"stratified_sample_fractions is down-sampling only; fractions must be in "
            f"[0, 1], got {bad or {'default': default}}"
        )
    w = Window.partitionBy(stratum_col).orderBy(det_hash(id_col), F.col(id_col))
    n = Window.partitionBy(stratum_col)
    mapping = F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])
    frac = F.coalesce(mapping.getItem(F.col(stratum_col)), F.lit(float(default)))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        .filter(F.col("_rk") <= F.ceil(F.col("_n") * frac))
        .drop("_rk", "_n")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    each row draws a deterministic uniform u = h(id)/2^32 and scores
    key = ln(u)/w — the top-k keys are a weighted-without-replacement
    draw (heavier rows get keys nearer zero).  The exponential key turns
    weighted sampling into a plain top-k, which Spark executes as a
    per-partition heap + k-row merge per stratum: one shuffle on the
    stratum key, state bounded by k — the only distributed-safe way to
    draw a weighted sample from a 100 TB corpus in one pass.

    Keys are micro-quantized (floor(key * 1e6), unique id tie-break)
    before ranking so the ordering is integer-exact across engines: raw
    float keys would let a last-ulp `ln`/division difference flip a rank
    at the boundary.  The distortion is confined to keys within 1e-6 of
    each other — probability ~0 for continuous weights, and when it does
    happen the (deterministic) id tie-break picks the same row on every
    engine.  Weights must be strictly positive.
    """
    u = (det_hash(id_col) + 1).cast("double") / F.lit(float(MOD + 1))  # (0, 1]
    key_micro = F.floor(
        F.log(u) / F.col(weight_col).cast("double") * 1000000.0 + F.lit(0.5 + 1e-8)
    ).cast("long")
    part = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*part).orderBy(F.col("_key").desc(), F.col(id_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_key", key_micro)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumnRenamed("_rk", "sample_rank")
        .drop("_key")
    )
