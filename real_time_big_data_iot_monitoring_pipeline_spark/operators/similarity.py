"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline: a broadcast of the (small)
query set against the corpus, dot products computed JVM-side with
higher-order array functions (`zip_with` + `aggregate`), then a per-query
top-k via `row_number` — one shuffle on query_id.  The LSH variant buckets
vectors by random-hyperplane signs so each query probes only its bucket —
the 100 TB path (candidates per query ~ corpus / 2^planes).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.functions.scalars import round_det


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a_col: str, b_col: str, out: str = "cosine") -> DataFrame:
    """Cosine similarity of two double-array columns, computed in one
    codegen'd expression (sequential left-to-right summation — matches
    DuckDB `list_cosine_similarity` bit-for-bit on the same doubles)."""
    a, b = F.col(a_col), F.col(b_col)
    return df.withColumn(out, F.try_divide(_dot(a, b), _norm(a) * _norm(b)))


def as_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Cast array<float> to array<double> so all engines do the arithmetic
    in the same precision."""
    return df.withColumn(col, F.transform(F.col(col), lambda x: x.cast("double")))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k most similar corpus
    vectors (self-matches excluded).  `queries` is expected to be small —
    it is broadcast, so the corpus is scanned exactly once with no shuffle
    until the final per-query top-k."""
    c = as_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    )
    q = as_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", round_det(F.try_divide(_dot(F.col("qvec"), F.col("cvec")), _norm(F.col("qvec")) * _norm(F.col("cvec"))), 6))
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (plain literals — no data
    dependence, no driver collect)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, seed: int = 42) -> DataFrame:
    """Attach a random-hyperplane LSH bucket id: bit p of the bucket is the
    sign of <vec, plane_p>.  Near vectors (high cosine) collide with high
    probability; bucketing is a pure map — no shuffle."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        d = _dot(F.col(vec_col), F.array(*[F.lit(w) for w in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket.
    Join is an equi-join on bucket — at 100 TB this replaces the full-corpus
    scan per query with ~corpus/2^n_planes candidates."""
    c = lsh_bucket(as_double_vec(corpus, vec_col), vec_col, dim, n_planes, seed).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "bucket"
    )
    q = lsh_bucket(as_double_vec(queries, vec_col), vec_col, dim, n_planes, seed).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", round_det(F.try_divide(_dot(F.col("qvec"), F.col("cvec")), _norm(F.col("qvec")) * _norm(F.col("cvec"))), 6))
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
