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
    # track the round-12 FRESHNESS rotation: the complete 18-query r5
    # backlog rotates in plus the three paths whose code churned this
    # round (e09 rollup pointer-swap, a16 expire_partitions pre-delete
    # resolution, g03b NULL-safe geometry probe): d 21->15, c holds at 3,
    # b holds at 3, a 4->5, o holds at 1, e holds at 4, f holds at 3,
    # g 11->16 — see the registry.py rotation log for every named witness.
    # The round-12 NEW registrations (g50/g51, windowed the round they
    # registered) take the d10/d11 slots: d 15->13, g 16->18; the CDC/SCD2
    # determinism hardening re-enters o08 in g03e's slot (g03/g41 stay as
    # the kNN-kernel witnesses): g 18->17, o 1->2.
    for prefix, minimum in [
        ("d", 13), ("c", 3), ("b", 3), ("a", 5), ("o", 2),
        ("g", 17), ("e", 4), ("f", 3),
    ]:
        got = sum(1 for n in window if n.startswith(prefix))
        assert got >= minimum, f"family {prefix}: {got} < {minimum}"
    # window curation must not drop any registered query entirely
    assert set(q) == set(registry.REGISTRY)
    # round-12 rotation: the complete r5 freshness backlog + this round's
    # churned paths come in; the two standing perf targets (a19, g35) and
    # the ivf_index.py churn consumers (g41/g48/g03c) stay in-window
    rotated_in = {
        # the complete r5 freshness backlog (VERDICT r11 #3)
        "a01_kinesis_sim_source", "a10_catalog_partition_discovery",
        "b04_dedup_by_sequence", "b05_bucketed_join",
        "c01_envelope_roundtrip", "c13_csv_roundtrip",
        "d08_agg_pricing_summary", "d15_asof_join", "d26_sessionization",
        "d27_rolling_time_window", "e10_stream_stream_join",
        "g01_dedup_exact", "g04b_fingerprint", "g06_quality_filter",
        "g07d_multimodal_frame_sample", "g11_sequence_packing",
        "g12_stratified_sample", "o04_cdc_apply",
        # churned this round: rollup replay protocol, expire_partitions
        # entry resolution, knn_lsh geometry probe, and the two
        # relational-review queries whose values/construction changed
        # (d16 columns, d36 bound)
        "e09_continuous_rollup", "a16_retention_expiry",
        "g03b_knn_lsh_ann", "d16_string_functions",
        "d36_approx_percentile_check",
        # NEW this round, windowed the round they registered
        "g50_source_cap", "g51_per_source_quality_gate",
        # churn re-entry: the SCD2/net-changes determinism hardening
        "o08_stream_scd2",
    }
    assert rotated_in <= set(window)
    rotated_out = {
        "d03_time_pruned_filter", "d04_limit", "d08b_stats_aggregates",
        "d13_window_functions", "d14b_cube", "d14c_grouping_sets",
        "d15b_range_join_binned", "d18_math_functions",
        "d19_array_functions", "d20_json_functions",
        "d21_conditional_null", "d28_relational_division",
        "c08_hashing", "c09_orc_roundtrip",
        "b01_keyed_partition_order", "b07_replay_from_offset",
        "a07_staging_upsert", "a21_write_audit_publish",
        "e05_stream_dedup", "e08_stream_lake_path",
        "g04_text_stats", "g09_train_split",
        # round-12 late swap for the two NEW registrations (witnesses:
        # g01 in-window = distinct-by-content-hash; d12 in-window +
        # incoming g50 = ordered rank + limit per key)
        "d10_distinct", "d11_sort_topn",
        # round-12 churn re-entry: o08 returned to the window (its SCD2
        # kernels changed), displacing g03e (g03/g41 stay as witnesses)
        "g03e_knn_join",
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
    assert len(registry.REGISTRY) == 166, len(registry.REGISTRY)
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
