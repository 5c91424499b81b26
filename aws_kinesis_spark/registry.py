"""Query registry: the single source of truth wiring SURVEY.md §2 operator
IDs to (a) a PySpark DataFrame implementation and (b) its DuckDB oracle SQL.

``__spark_entry__.py`` exposes this registry to the driver; tests iterate it
to run the same spark-vs-duckdb differential check locally.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Entry:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI/DuckDB SQL twin; None => rows-only check
    doc: str


REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under a SURVEY.md §2 operator id."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Entry(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: e.fn for name, e in REGISTRY.items()}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imports are for their registration side effects
    from aws_kinesis_spark.plans import relational  # noqa: F401
    from aws_kinesis_spark.plans import pipeline_queries  # noqa: F401
    from aws_kinesis_spark.plans import ext_queries  # noqa: F401
    from aws_kinesis_spark.plans import streaming_queries  # noqa: F401
    from aws_kinesis_spark.plans import udf_queries  # noqa: F401

    _LOADED = True
