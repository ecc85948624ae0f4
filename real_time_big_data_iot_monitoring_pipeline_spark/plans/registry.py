"""Query catalog registry.

Every engine capability lands here as a named `Query`: a Spark builder
`(spark, sf_dir) -> DataFrame` plus, when SQL-expressible, the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet tables (driver
contract, `__spark_entry__.py`).  Builders must be deterministic:
epoch-integer timestamps, rounded float outputs, unique-id tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None  # ANSI SQL for DuckDB, or None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return wrap
