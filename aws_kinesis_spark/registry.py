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
# gets hard driver-verified rows each round — and it ROTATES per round so the
# hard-checked set converges on all 92 registered queries across rounds.
#
# Rotation policy: each round, slots whose operator is already witnessed by
# another in-window query are swapped for queries that have never had a
# driver row.  A slot may rotate out only if a named in-window witness covers
# its operator.  Round-4 rotation (12 swapped; witness in parens):
#   out: d01 (any projection, e.g. d03/g06), d02 (d03 pruned filter + g06
#        pushdown), d13 (d26/d27 window functions), d14 (d14d pivot = D14
#        family), d16 (c07 concat keys + g04 string exprs), d17 (d03 time
#        pruning + d27 rolling time window), d18 (g14 floor/abs/division),
#        d19 (g14 transform/array_max + g02b shingle arrays), d20 (c01
#        from_json/to_json roundtrip), b01 (b02/b04 keyed shuffles + b05
#        bucketed co-location), g03 (g03e = same exact cosine top-k over
#        EVERY vector), g09 (g12 = same md5-hex-threshold split mechanism)
#   in:  d14d, d26, d27, b05, c10, a13, g02b, g03e, g11, g12, g13, g14
# Round-5 swap-in candidates (oracle-backed, still no driver row after r4):
#   d04, d08b, d09, d10, d10c, d12, d14b, d14c, d15b, d22, d23, d24, d28,
#   b02b, b03, c06, c08, g03d, g04b, g04c, g04d, g08, g15, g16, g17, g18,
#   g19, g20, a01, c12, c13, e10 — swap against r4 window slots whose
#   operator they witness.
# Queries outside the window still run in the local differential suite
# (tests/test_differential.py) every CI pass; prior-round driver rows for
# rotated-out queries remain in CORRECTNESS_r{1..3}.json.
DRIVER_WINDOW: list[str] = [
    # D — relational core (11)
    "d03_time_pruned_filter",
    "d05_join_star",
    "d06_join_semi_anti",
    "d07_set_ops",
    "d08_agg_pricing_summary",
    "d11_sort_topn",
    "d14d_pivot",
    "d15_asof_join",
    "d21_conditional_null",
    "d26_sessionization",
    "d27_rolling_time_window",
    # C — record transforms (4; c06→d17-family witnesses, c08→g01)
    "c01_envelope_roundtrip",
    "c07_composite_key",
    "c09_orc_roundtrip",
    "c10_cost_accounting",
    # B — streaming-core batch analogues (4; b03→d26/d27 row_number)
    "b02_salted_aggregation",
    "b04_dedup_by_sequence",
    "b05_bucketed_join",
    "b07_replay_from_offset",
    # A — sources/sinks (5)
    "a07_staging_upsert",
    "a10_catalog_partition_discovery",
    "a12_lake_roundtrip",
    "a13_dynamic_table_partitioning",
    "o04_cdc_apply",
    # G — LLM-data-pipeline operators (13)
    "g01_dedup_exact",
    "g02_dedup_minhash_lsh",
    "g02b_dedup_ngram_jaccard",
    "g03e_knn_join",
    "g04_text_stats",
    "g05_embedding_neardup",
    "g06_quality_filter",
    "g07_multimodal_meta",
    "g10_dedup_clusters",
    "g11_sequence_packing",
    "g12_stratified_sample",
    "g13_decontaminate",
    "g14_quantize_embeddings",
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
