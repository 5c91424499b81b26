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
    # every operator family lands inside the hard-signal window
    for prefix, minimum in [
        ("d", 8), ("c", 2), ("b", 2), ("a", 9), ("o", 2),
        ("g", 20), ("e", 3), ("f", 4),
    ]:
        got = sum(1 for n in window if n.startswith(prefix))
        assert got >= minimum, f"family {prefix}: {got} < {minimum}"
    # window curation must not drop any registered query entirely
    assert set(q) == set(registry.REGISTRY)
    # round-7 rotation: the 23 oracle-backed round-6 additions plus the
    # 6 former rows-only sketch/ANN queries (now with deterministic
    # self-check oracles) get their first driver-hash rows; after this
    # window every registered query has been in a driver window
    rotated_in = {
        "a17_snapshot_diff", "a18_orphan_vacuum", "a19_deletion_vectors",
        "a20_zone_map_pruning", "a21_write_audit_publish",
        "a22_manifest_integrity", "c14_gzip_jsonl_roundtrip",
        "d31_unpivot", "d32_gap_fill", "d33_histogram",
        "d34_asof_tolerance", "d10b_approx_distinct",
        "g02c_dedup_simhash", "g03b_knn_lsh_ann", "g03c_knn_ivf_ann",
        "g07b_multimodal_features", "g18b_token_topk_sketch",
        "g27_embedding_decontaminate", "g28_source_overlap",
        "g29_importance_sample", "g30_bm25_score", "g31_bigram_logprob",
        "g32_setsim_prefix_join", "g33_hard_negatives",
        "g34_source_datacard", "g35_stream_dedup_ingest",
        "g36_token_budget_sample", "o07_log_compaction", "o08_stream_scd2",
    }
    assert rotated_in <= set(window)
    assert len(rotated_in) == 29


def test_registry_counts_pinned():
    """Pin the registry and window sizes so a stale comment / silent drop
    of a registered query becomes a hard test failure (VERDICT r4 #3)."""
    from aws_kinesis_spark import registry

    registry._ensure_loaded()
    assert len(registry.DRIVER_WINDOW) == 50
    assert len(registry.REGISTRY) == 151, len(registry.REGISTRY)
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
