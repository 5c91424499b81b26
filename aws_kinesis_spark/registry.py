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
# hard-checked set converges on all registered queries across rounds (size
# pinned by tests/test_entry.py::test_registry_counts_pinned).
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
# Round-5 rotation (19 swapped — every oracle-backed query that had never
# had a driver row goes in; witness for each rotated-out slot in parens):
#   out: d03 (a10 partition pruning + g06 pushdown-locked filter), d05 (b05
#        bucketed equi-join + e07 stream-static join), d11 (g18 exact global
#        top-k = agg+sort+limit), d21 (g06/g16 conditional + null handling),
#        c07 (g04b concat+hash composite fingerprint + b04 sequence keys),
#        c09 (c12/c13 = same C9 format-roundtrip family), b07 (a01
#        kinesis_sim replay-from-offset IS the mechanism b07 models), a07
#        (o04 keyed upsert/LWW), a12 (a13 dynamic lake write + e08 stream
#        lake path), e01 (e09 tumbling rollup + e04 late-data windowed agg),
#        e02 (d27 rolling window semantics + e09), e05 (b04 exactly-once
#        dedup + e06 stateful streaming), g02b (g02 + g20 banded-index
#        joins), g03e (g03d = same blocked-BLAS cosine top-k kernel), g04
#        (g04b/c/d text-analysis family), g05 (g03d cosine + g20 near-dup),
#        g07 (g07c/g07d same multimodal UDF plumbing), g10 (g19 keepers =
#        clusters + quality + window), g14 (g14b re-reads the same codes)
#   in:  a01, c12, c13, e10, e11, g03d, g04b, g04c, g04d, g07c, g07d, g08,
#        g14b, g15, g16, g17, g18, g19, g20
# Round-6 rotation (19 swapped — every oracle-backed query that had never
# had a driver row goes in; witness for each rotated-out slot in parens):
#   out: d08 (g22 partial-agg corpus stats + e09 continuous rollup), d15
#        (d29 = same custom temporal-join family, union/bin not cross-join),
#        d26 (e03 stream session window = identical session semantics), d27
#        (g19/g04d row_number windows + e09 time-windowed rollup), c01
#        (c12 = same envelope codec roundtrip family), c13 (c12 C9 format
#        roundtrip), b04 (b04b Bloom-pruned EXACT first-seen = same B4
#        exactly-once mechanism with an exact verify join), b05 (e07
#        stream-static equi-join + d29 equi-join core), a01 (a01b = same
#        kinesis_sim source PLUS shard split/merge lineage; a03 EFO variant),
#        a10 (a13 dynamic partition write + a16 partition-level retention),
#        o04 (o05 SCD2 + o06 net-changes = same CDC decode/collapse family),
#        g01 (g19 keepers includes exact-dup keeper selection; g25 span
#        dedup), g02 (g20 incremental dedup = same banded MinHash index),
#        g04b (g04c = same token-hash fingerprint family), g06 (g15/g16
#        quality-filter family, pushdown-locked), g07d (g07c same Arrow
#        multimodal plumbing; g21 covers the 1->N mapInPandas shape), g11
#        (g21 chunking + g17 training order = training-prep family), g12
#        (g24 temperature mixture = same hash-threshold sampling mechanism),
#        e10 (e12 stream-stream join over the sim source; e11 outer stays)
#   in:  a01b, a03, a05, a14, a15, a16, b04b, d29, d30, e12, e13, o05, o06,
#        g21, g22, g23, g24, g25, g26
# After r6's rotation the never-driver-checked set is: the rows-only
# queries (g02c, g03b, g03c, g07b, g18b — d10b has r1-r2 driver rows) and
# the oracle-backed queries ADDED during round 6 itself — a17, a18, c14,
# d31, d32, g27, g28, g29, o07, o08, a19, a20, a21, d33, d34, g30, g31, g32, g33, g34, g35, g36, a22.
# Round-7 rotation: swap those twenty-three in
# (witnesses exist in-window for every slot family) plus rows-only slots
# for the sketch/ANN queries. Queries outside the window still run in the
# local differential suite (tests/test_differential.py) every CI pass;
# prior-round driver rows for rotated-out queries remain in
# CORRECTNESS_r{1..5}.json.
DRIVER_WINDOW: list[str] = [
    # D — relational core (5)
    "d06_join_semi_anti",
    "d07_set_ops",
    "d14d_pivot",
    "d29_interval_overlap_join",
    "d30_recursive_hierarchy",
    # C — record transforms (2)
    "c10_cost_accounting",
    "c12_jsonl_roundtrip",
    # B — streaming-core batch analogues (2)
    "b02_salted_aggregation",
    "b04b_bloom_first_seen",
    # A — sources/sinks/lake maintenance (7)
    "a01b_kinesis_reshard",
    "a03_efo_push_consumer",
    "a05_manifest_time_travel",
    "a13_dynamic_table_partitioning",
    "a14_lake_compaction",
    "a15_schema_evolution",
    "a16_retention_expiry",
    # O — CDC family (2)
    "o05_scd2_history",
    "o06_cdc_net_changes",
    # G — LLM-data-pipeline operators (19)
    "g03d_knn_classify",
    "g04c_rolling_fingerprint",
    "g04d_tfidf_top_terms",
    "g07c_multimodal_resize",
    "g08_label_centroids",
    "g13_decontaminate",
    "g14b_quantization_error",
    "g15_repetition_filter",
    "g16_pii_scrub",
    "g17_training_order",
    "g18_token_topk",
    "g19_dedup_keepers",
    "g20_incremental_dedup",
    "g21_doc_chunking",
    "g22_corpus_stats",
    "g23_leakage_safe_split",
    "g24_temperature_mixture",
    "g25_span_dedup",
    "g26_unigram_logprob",
    # E — streaming semantics, batch-equivalent oracle form (9)
    "e03_stream_session_window",
    "e04_stream_late_data",
    "e06_stream_stateful_buffer",
    "e07_stream_static_join",
    "e08_stream_lake_path",
    "e09_continuous_rollup",
    "e11_stream_stream_outer_join",
    "e12_stream_stream_join_kinesis_source",
    "e13_stream_reshard_drain",
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
