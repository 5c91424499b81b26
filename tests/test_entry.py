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
    # every operator family lands inside the hard-signal window (o and c
    # dropped to 1 in round 9: o07 retired on the o08 witness, c10 on the
    # c14 witness — see the registry.py rotation log)
    for prefix, minimum in [
        ("d", 10), ("c", 1), ("b", 3), ("a", 10), ("o", 1),
        ("g", 18), ("e", 3), ("f", 4),
    ]:
        got = sum(1 for n in window if n.startswith(prefix))
        assert got >= minimum, f"family {prefix}: {got} < {minimum}"
    # window curation must not drop any registered query entirely
    assert set(q) == set(registry.REGISTRY)
    # round-9 rotation: the five round-7 additions that had never had a
    # driver row get their first driver-hash rows, and the three round-9
    # additions are windowed the round they are registered; after this
    # window every one of the 162 registered queries has been in a
    # driver window
    rotated_in = {
        "a23_zorder_clustering", "d35_percentile_profile",
        "g37_containment_dedup", "g38_semdedup", "g40_stratified_sample",
        # registered AND windowed in round 9 (driver rows the same round)
        "d36_approx_percentile_check", "g41_filtered_knn",
        "g45_vocab_coverage", "d38_funnel_steps", "d39_cohort_retention",
        "g46_bpe_pair_stats", "g47_length_bucketing",
        "a24_symlink_manifest_export",
        "a09_dlq_split", "b12_stream_progress", "a11_raw_backup",
    }
    assert rotated_in <= set(window)
    rotated_out = {
        "d06_join_semi_anti", "a13_dynamic_table_partitioning",
        "o07_log_compaction", "c10_cost_accounting",
        "g14b_quantization_error", "d10b_approx_distinct",
        "g17_training_order", "g29_importance_sample",
        "g21_doc_chunking", "g34_source_datacard",
        "g31_bigram_logprob", "g33_hard_negatives",
        "a21_write_audit_publish",
        "g28_source_overlap", "g03b_knn_lsh_ann",
        "a18_orphan_vacuum",
    }
    assert rotated_out & set(window) == set()
    # with this window, every registered query has had a driver slot
    ever_windowed = rotated_in | set(window)  # plus rounds 1-8 history
    assert rotated_out <= set(registry.REGISTRY)
    assert ever_windowed <= set(registry.REGISTRY)


def test_registry_counts_pinned():
    """Pin the registry and window sizes so a stale comment / silent drop
    of a registered query becomes a hard test failure (VERDICT r4 #3)."""
    from aws_kinesis_spark import registry

    registry._ensure_loaded()
    assert len(registry.DRIVER_WINDOW) == 50
    assert len(registry.REGISTRY) == 162, len(registry.REGISTRY)
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
