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


# The driver's correctness harness checks the FIRST 50 queries() entries only.
# This window is curated so every SURVEY.md §2 operator family (A/B/C/D/E/F/G)
# gets hard driver-verified rows each round.  Queries listed after the window
# are variants whose operator is already witnessed by a window query
# (e.g. D4-limit by d11 sort+topN, D12-latest-per-key by o04 CDC LWW,
# C8-hashing by g01's md5 groupBy, B3-sequence by d13's row_number); all 85
# still run in the local differential suite (tests/test_differential.py).
DRIVER_WINDOW: list[str] = [
    # D — relational core (17; d04→d11, d09→e01, d10→g01/d07, d12→o04)
    "d01_projection",
    "d02_filter_predicate",
    "d03_time_pruned_filter",
    "d05_join_star",
    "d06_join_semi_anti",
    "d07_set_ops",
    "d08_agg_pricing_summary",
    "d11_sort_topn",
    "d13_window_functions",
    "d14_rollup",
    "d15_asof_join",
    "d16_string_functions",
    "d17_datetime_functions",
    "d18_math_functions",
    "d19_array_functions",
    "d20_json_functions",
    "d21_conditional_null",
    # C — record transforms (3; c06→d17, c08→g01)
    "c01_envelope_roundtrip",
    "c07_composite_key",
    "c09_orc_roundtrip",
    # B — streaming-core batch analogues (4; b03→d13, b05→d05)
    "b01_keyed_partition_order",
    "b02_salted_aggregation",
    "b04_dedup_by_sequence",
    "b07_replay_from_offset",
    # A — sources/sinks (4)
    "a07_staging_upsert",
    "a10_catalog_partition_discovery",
    "a12_lake_roundtrip",
    "o04_cdc_apply",
    # G — LLM-data-pipeline operators (9)
    "g01_dedup_exact",
    "g02_dedup_minhash_lsh",
    "g03_knn_bruteforce",
    "g04_text_stats",
    "g05_embedding_neardup",
    "g06_quality_filter",
    "g07_multimodal_meta",
    "g09_train_split",
    "g10_dedup_clusters",
    # E — streaming semantics, batch-equivalent oracle form (9)
    "e01_stream_tumbling_hourly",
    "e02_stream_sliding_window",
    "e03_stream_session_window",
    "e04_stream_late_data",
    "e05_stream_dedup",
    "e06_stream_stateful_buffer",
    "e07_stream_static_join",
    "e08_stream_lake_path",
    "e09_continuous_rollup",
    # F — UDF/UDAF/UDTF surface (4)
    "f01_scalar_pandas_udf",
    "f02_grouped_map",
    "f03_grouped_agg_udaf",
    "f04_python_udtf",
]


def _ordered_names() -> list[str]:
    """All registered names: the driver window first, then the rest in
    registration order.  Raises if the window names a missing query."""
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_WINDOW references unregistered queries: {missing}")
    window = set(DRIVER_WINDOW)
    return [*DRIVER_WINDOW, *(n for n in REGISTRY if n not in window)]


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


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
