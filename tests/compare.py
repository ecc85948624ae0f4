"""Spark-vs-DuckDB result comparison mirroring the driver's correctness
gate: row count + schema (column names) + order-insensitive value match.
Stricter than a hash: exact cell equality after canonical normalization."""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_bool_dtype(dt):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _kind(dtype) -> str:
    k = dtype.kind
    return "i" if k in "iu" else k


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    # dtype-KIND equality before normalization: DuckDB quietly widens
    # (e.g. sum(BIGINT) -> HUGEINT -> pandas float64) and a dtype-aware
    # value hash would then mismatch even with equal values.
    for c in spark_pdf.columns:
        if c in oracle_pdf.columns:
            ka, kb = _kind(spark_pdf[c].dtype), _kind(oracle_pdf[c].dtype)
            assert ka == kb, (
                f"{name}: column '{c}' dtype kind spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}"
            )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} oracle={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av.dtype):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
        if not bool(eq.all()):
            bad = (~eq).to_numpy().nonzero()[0][:5]
            detail = "\n".join(
                f"  row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}" for i in bad
            )
            raise AssertionError(f"{name}: column '{c}' differs at {int((~eq).sum())} rows:\n{detail}")
