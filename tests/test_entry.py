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
        ("d", 5), ("c", 2), ("b", 2), ("a", 7), ("o", 2),
        ("g", 19), ("e", 9), ("f", 4),
    ]:
        got = sum(1 for n in window if n.startswith(prefix))
        assert got >= minimum, f"family {prefix}: {got} < {minimum}"
    # window curation must not drop any registered query entirely
    assert set(q) == set(registry.REGISTRY)
    # round-6 rotation: the 19 oracle-backed round-5 additions get their
    # first driver rows; after this window every oracle-backed query has
    # had a hard driver-hash row, and only the rows-only sketch/ANN
    # queries remain never-in-window (round-7 rows-only slot candidates)
    rotated_in = {
        "a01b_kinesis_reshard", "a03_efo_push_consumer",
        "a05_manifest_time_travel", "a14_lake_compaction",
        "a15_schema_evolution", "a16_retention_expiry",
        "b04b_bloom_first_seen", "d29_interval_overlap_join",
        "d30_recursive_hierarchy", "e12_stream_stream_join_kinesis_source",
        "e13_stream_reshard_drain", "o05_scd2_history",
        "o06_cdc_net_changes", "g21_doc_chunking", "g22_corpus_stats",
        "g23_leakage_safe_split", "g24_temperature_mixture",
        "g25_span_dedup", "g26_unigram_logprob",
    }
    assert rotated_in <= set(window)
    assert len(rotated_in) == 19


def test_registry_counts_pinned():
    """Pin the registry and window sizes so a stale comment / silent drop
    of a registered query becomes a hard test failure (VERDICT r4 #3)."""
    from aws_kinesis_spark import registry

    registry._ensure_loaded()
    assert len(registry.DRIVER_WINDOW) == 50
    assert len(registry.REGISTRY) == 146, len(registry.REGISTRY)
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
