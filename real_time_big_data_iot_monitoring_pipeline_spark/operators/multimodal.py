"""Multimodal column plumbing: opaque `binary` payloads + typed metadata,
processed with Arrow-batched `mapInPandas`.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic byte-level features standing in for pixel/sample decode —
clearly marked below).  Everything around them is real and tested: the
schema contract, the Arrow batch path, partition-preserving execution, and
the metadata model.  Swapping `_decode_stub` for PIL/ffmpeg is a kernel
change only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the decode/feature-extract stage.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.DoubleType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model a multimodal table: binary payload column + typed metadata
    struct.  (Fixture payloads are the UTF-8 document bytes; in production
    this column holds image/audio/video bytes read from object storage.)"""
    return df.select(
        id_col,
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB decode kernel.  Real image/audio decode is unavailable in this
    container; this computes deterministic byte-level stand-ins:
    (n_bytes, additive checksum mod 1e9+7, mean byte value).  Replace with
    PIL.Image.open / soundfile.read when codecs exist."""
    n = len(payload)
    checksum = 0
    total = 0
    for b in payload:
        checksum = (checksum * 31 + b) % 1000000007
        total += b
    return n, checksum, (total / n if n else 0.0)


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode/feature-extract over the binary column via `mapInPandas`:
    Arrow-batched, partition-preserving (no shuffle), constant memory per
    batch — the shape a 100 TB image pipeline needs.  The per-batch
    function is pure, so speculative re-execution is safe."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[[id_col]].copy()
            decoded = pdf["payload"].map(_decode_stub)
            out["n_bytes"] = decoded.map(lambda t: t[0]).astype("int64")
            out["checksum"] = decoded.map(lambda t: t[1]).astype("int64")
            out["feature"] = decoded.map(lambda t: round(t[2] + 1e-8, 6))  # ROUND_EPS: ties break up, matching round_det
            yield out

    return df.mapInPandas(run, DECODE_SCHEMA)


def frame_sample(df: DataFrame, id_col: str = "doc_id", every: int = 100) -> DataFrame:
    """STUB video frame-sampler: slices the payload into fixed-size
    "frames" (every `every` bytes) and emits one row per sampled frame —
    the explode-shaped plumbing (1 row in, N rows out with an index) that
    real frame extraction needs."""
    n_frames = F.floor(F.octet_length("payload") / every).cast("int")
    return df.select(
        id_col,
        F.posexplode(F.expr(f"split(repeat('x', greatest(cast(octet_length(payload)/{every} as int), 0)), '')")).alias(
            "frame_idx", "_x"
        ),
    ).filter(F.col("_x") == "x").select(
        id_col, F.col("frame_idx").cast("long").alias("frame_idx")
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("target_w", T.IntegerType()),
                    T.StructField("target_h", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def _resize_stub(payload: bytes, w: int, h: int, real: bool = False) -> bytes:
    """STUB resize kernel: no image codec ships in this container.  The
    deterministic fake emits exactly w*h bytes by tiling/truncating the
    source payload, so downstream schema/partitioning/batch-shape logic is
    fully exercised; set real=True once PIL exists."""
    if real:  # pragma: no cover - codec path for real deployments
        raise NotImplementedError("image codecs unavailable in this container")
    n = w * h
    if not payload:
        return b"\x00" * n
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_images(
    df: DataFrame, id_col: str = "doc_id", width: int = 32, height: int = 16
) -> DataFrame:
    """Resize stage over the binary column: Arrow-batched `mapInPandas`,
    partition-preserving, emitting the resized payload plus typed metadata
    carrying the target dimensions — the exact plumbing a real thumbnail/
    normalization pass needs (swap `_resize_stub` for a PIL kernel; the
    plan, schema, and batch shape do not change)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda p: _resize_stub(bytes(p), width, height))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": resized,
                    "meta": [
                        {
                            "mime": "application/octet-stream",
                            "n_bytes": len(r),
                            "target_w": width,
                            "target_h": height,
                        }
                        for r in resized
                    ],
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)
