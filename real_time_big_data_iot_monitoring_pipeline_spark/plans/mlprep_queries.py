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
