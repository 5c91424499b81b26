"""Smoke test mirroring the driver's entry() check."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"hour_start", "n_errors", "sum_value", "avg_k"}


def test_queries_and_oracles_aligned():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


def test_driver_window_covers_every_family():
    """The driver's correctness harness reads the first 50 queries() entries;
    lock that window to one covering every SURVEY.md §2 family with oracles."""
    from aws_kinesis_spark import registry

    q = registry.queries()
    o = registry.oracles()
    window = list(q)[:50]
    assert window == registry.DRIVER_WINDOW
    assert len(registry.DRIVER_WINDOW) == 50
    # every window query must carry a full DuckDB oracle (hash-match check)
    assert all(n in o for n in window), [n for n in window if n not in o]
    # every operator family lands inside the hard-signal window (floors
    # track the round-11 FRESHNESS rotation: the complete 39-query r2–r4
    # backlog rotates in (d 11->21, c 2->3, b/e hold at 3/4, a 9->4 with
    # the lake-maintenance family retired on its r10 rows + a12/a21
    # witnesses, g 16->11, f 4->3 with f01 witnessed by the in-window
    # nearest-cell scalar pandas_udf) plus g03c, re-certifying the round
    # its knn_ivf kernel was rewritten to delegate to the standing store
    # — see the registry.py rotation log for every named witness)
    for prefix, minimum in [
        ("d", 21), ("c", 3), ("b", 3), ("a", 4), ("o", 1),
        ("g", 11), ("e", 4), ("f", 3),
    ]:
        got = sum(1 for n in window if n.startswith(prefix))
        assert got >= minimum, f"family {prefix}: {got} < {minimum}"
    # window curation must not drop any registered query entirely
    assert set(q) == set(registry.REGISTRY)
    # round-11 rotation: the freshness round — every query whose last
    # hard driver row predated round 5 gets a fresh one, and the round's
    # churned code paths (a19/a21/e08/o08/g35/g41/g48, plus g03c's
    # rewritten kernel) stay/come in for re-certification
    rotated_in = {
        # the complete r2–r4 freshness backlog (VERDICT r10 #1)
        "d03_time_pruned_filter", "d04_limit", "d05_join_star",
        "d08b_stats_aggregates", "d10_distinct", "d10c_percentiles",
        "d11_sort_topn", "d12_latest_per_key", "d13_window_functions",
        "d14_rollup", "d14b_cube", "d14c_grouping_sets",
        "d15b_range_join_binned", "d18_math_functions",
        "d19_array_functions", "d20_json_functions",
        "d21_conditional_null", "d22_golden_point_lookup",
        "d23_correlated_scalar_subquery", "d24_exists_subquery",
        "d28_relational_division", "b01_keyed_partition_order",
        "b02b_salted_join", "b07_replay_from_offset",
        "c07_composite_key", "c08_hashing", "c09_orc_roundtrip",
        "a07_staging_upsert", "a12_lake_roundtrip",
        "e01_stream_tumbling_hourly", "e02_stream_sliding_window",
        "e05_stream_dedup", "g03_knn_bruteforce", "g03e_knn_join",
        "g04_text_stats", "g05_embedding_neardup", "g07_multimodal_meta",
        "g09_train_split", "g14_quantize_embeddings",
        # rewritten this round: knn_ivf now delegates to the IVF store
        "g03c_knn_ivf_ann",
    }
    assert rotated_in <= set(window)
    rotated_out = {
        "d01_projection", "d02_filter_predicate",
        "d09_tumbling_hourly_agg", "d16_string_functions",
        "d17_datetime_functions", "d30_recursive_hierarchy",
        "d31_unpivot", "d32_gap_fill", "d34_asof_tolerance",
        "d36_approx_percentile_check", "d39_cohort_retention",
        "c06_time_partition_cols", "c14_gzip_jsonl_roundtrip",
        "b03_sequence_numbering", "b04b_bloom_first_seen",
        "b12_stream_progress", "a05_manifest_time_travel",
        "a09_dlq_split", "a11_raw_backup", "a15_schema_evolution",
        "a18_orphan_vacuum", "a20_zone_map_pruning",
        "a22_manifest_integrity", "g02_dedup_minhash_lsh",
        "g02b_dedup_ngram_jaccard", "g07b_multimodal_features",
        "g10_dedup_clusters", "g16_pii_scrub", "g20_incremental_dedup",
        "g27_embedding_decontaminate", "g37_containment_dedup",
        "g38_semdedup", "g40_stratified_sample", "g45_vocab_coverage",
        "g46_bpe_pair_stats", "g49_leakage_safe_split",
        "e04_stream_late_data", "e06_stream_stateful_buffer",
        "e12_stream_stream_join_kinesis_source", "f01_scalar_pandas_udf",
    }
    assert rotated_out & set(window) == set()
    # with this window, every registered query has had a driver slot
    ever_windowed = rotated_in | set(window)  # plus rounds 1-9 history
    assert rotated_out <= set(registry.REGISTRY)
    assert ever_windowed <= set(registry.REGISTRY)


def test_registry_counts_pinned():
    """Pin the registry and window sizes so a stale comment / silent drop
    of a registered query becomes a hard test failure (VERDICT r4 #3)."""
    from aws_kinesis_spark import registry

    registry._ensure_loaded()
    assert len(registry.DRIVER_WINDOW) == 50
    assert len(registry.REGISTRY) == 164, len(registry.REGISTRY)
    assert len(set(registry.DRIVER_WINDOW)) == 50  # no duplicate slots
    # round 7 closed the rows-only dead end: every registered query now
    # carries a DuckDB twin (the sketch/ANN paths via deterministic
    # self-check oracle forms — exact anchors hash-matched, accuracy
    # claims asserted in-plan)
    rows_only = {n for n, e in registry.REGISTRY.items() if e.oracle is None}
    assert rows_only == set(), rows_only


def test_sql_cli_runs_and_prints_json(capsys):
    """§3.3 interactive surface: the CLI registers views, runs SQL, prints
    one JSON line per row."""
    import json

    from aws_kinesis_spark.__main__ import main

    rc = main(
        [
            "SELECT r_regionkey AS k, r_name AS name FROM region ORDER BY 1",
            "--sf",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    assert lines[0]["k"] == 0 and "name" in lines[0]
