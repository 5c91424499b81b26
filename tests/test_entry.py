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
    # track the round-10 re-certification rotation: a 10->9 with a17/a23/
    # a24 retired on the a05/a20/a22 witnesses, g 18->16 with seven G
    # slots retired on in-window family witnesses while five churned G
    # queries rotate back in, f covers all four F operators — see the
    # registry.py rotation log for every named witness)
    for prefix, minimum in [
        ("d", 10), ("c", 2), ("b", 3), ("a", 9), ("o", 1),
        ("g", 16), ("e", 4), ("f", 4),
    ]:
        got = sum(1 for n in window if n.startswith(prefix))
        assert got >= minimum, f"family {prefix}: {got} < {minimum}"
    # window curation must not drop any registered query entirely
    assert set(q) == set(registry.REGISTRY)
    # round-10 rotation: the RE-certification round — fresh driver rows
    # for queries whose code paths churned since their last row, the
    # longest-stale r2/r3 rows, and the new persistent-IVF query
    rotated_in = {
        # churned code paths (r9 flush salt / dedup kernels / pipeline)
        "a05_manifest_time_travel", "a18_orphan_vacuum",
        "e08_stream_lake_path", "g02_dedup_minhash_lsh",
        "g02b_dedup_ngram_jaccard", "g10_dedup_clusters",
        "g20_incremental_dedup",
        # longest-stale r2/r3 driver rows
        "d01_projection", "d02_filter_predicate",
        "d09_tumbling_hourly_agg", "d16_string_functions",
        "d17_datetime_functions", "b03_sequence_numbering",
        "c06_time_partition_cols",
        # registered AND windowed in round 10
        "g48_persistent_ivf", "g49_leakage_safe_split",
        # re-certified the round its commit protocol gained the fencing
        "a21_write_audit_publish",
    }
    assert rotated_in <= set(window)
    rotated_out = {
        "d07_set_ops", "d33_histogram", "d35_percentile_profile",
        "d38_funnel_steps", "b02_salted_aggregation",
        "a17_snapshot_diff", "a23_zorder_clustering",
        "a24_symlink_manifest_export", "g03c_knn_ivf_ann",
        "g18b_token_topk_sketch", "g19_dedup_keepers", "g30_bm25_score",
        "g32_setsim_prefix_join", "g36_token_budget_sample",
        "g47_length_bucketing", "g02c_dedup_simhash",
        "a01b_kinesis_reshard",
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
