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
    # track the round-13 FRESHNESS rotation: the complete 24-query r6
    # backlog rotates in — the r6 block is G/E-heavy, so the family mix
    # shifts with it: d 13->9, c 3->2, b 3->2, a 5->4, o holds at 2,
    # e 4->6, f holds at 3, g 17->24 (22 from the rotation + the two
    # late registrations g53/g54 displacing d08/d12) — see the
    # registry.py rotation log for every named witness.
    for prefix, minimum in [
        ("d", 6), ("c", 2), ("b", 2), ("a", 4), ("o", 2),
        ("g", 25), ("e", 6), ("f", 3),
    ]:
        got = sum(1 for n in window if n.startswith(prefix))
        assert got >= minimum, f"family {prefix}: {got} < {minimum}"
    # window curation must not drop any registered query entirely
    assert set(q) == set(registry.REGISTRY)
    # round-13 rotation: the COMPLETE r6 freshness backlog comes in, with
    # o05/o06 (the r12-changed CDC/SCD2 kernels that deferred their hard
    # row) in regardless of slot pressure — VERDICT r12 #1
    rotated_in = {
        "a03_efo_push_consumer", "a14_lake_compaction",
        "c12_jsonl_roundtrip", "d14d_pivot", "d29_interval_overlap_join",
        "e03_stream_session_window", "e07_stream_static_join",
        "e11_stream_stream_outer_join", "e13_stream_reshard_drain",
        "g03d_knn_classify", "g04c_rolling_fingerprint",
        "g04d_tfidf_top_terms", "g07c_multimodal_resize",
        "g08_label_centroids", "g13_decontaminate",
        "g15_repetition_filter", "g18_token_topk", "g22_corpus_stats",
        "g23_leakage_safe_split", "g24_temperature_mixture",
        "g25_span_dedup", "g26_unigram_logprob",
        "o05_scd2_history", "o06_cdc_net_changes",
        # NEW this round, windowed the round they registered (IVF
        # deletes; classifier inference; fractional-epoch oversampling;
        # composed corpus build; truncation recall)
        "g52_ivf_delete",
        "g53_quality_classifier",
        "g54_mixture_oversample",
        "g55_pipeline_end_to_end",
        "g56_truncation_recall",
        "g57_hybrid_rrf",
        "g58_source_drift",
        "d40_ordered_sequence_agg",
        "d41_linear_interpolate",
        "c15_xml_roundtrip",
    }
    assert rotated_in <= set(window)
    # every rotated-out slot holds a green CORRECTNESS_r12 row (the
    # freshest possible) and keeps running in the differential suite;
    # named witnesses in the registry.py round-13 rotation log
    rotated_out = {
        "d05_join_star", "d14_rollup", "d15_asof_join",
        "d16_string_functions", "d26_sessionization",
        "d27_rolling_time_window",
        "c01_envelope_roundtrip", "c13_csv_roundtrip",
        "b02b_salted_join",
        "a01_kinesis_sim_source", "a16_retention_expiry",
        "a19_deletion_vectors",
        "o04_cdc_apply", "o08_stream_scd2",
        "e09_continuous_rollup", "e10_stream_stream_join",
        "g01_dedup_exact", "g03_knn_bruteforce", "g03b_knn_lsh_ann",
        "g03c_knn_ivf_ann", "g04b_fingerprint", "g05_embedding_neardup",
        "g07_multimodal_meta", "g12_stratified_sample",
        # round-13 new registration g52 takes g41's slot (g48 stays =
        # the same standing-store probed-cell path; filter_ids exactness
        # pinned in tests/test_ivf_index.py)
        "g41_filtered_knn",
        # round-13 late registrations g53/g54 take the d08/d12 slots
        # (both r12-green, the freshest possible; agg family witnessed
        # by e01/g22/d36, top-per-key family by g50 — registry.py log)
        "d08_agg_pricing_summary",
        "d12_latest_per_key",
        # g55 takes the d10c slot (r12-green; the percentile family stays
        # witnessed by d36, the sketch-inside-exact-band certification)
        "d10c_percentiles",
        # g56 takes the g14 slot (r12-green, the freshest possible; g56 IS
        # the embedding-compression gate family twin over the same in-row
        # HOF surface, g03d stays = the cosine ranking kernel — registry log)
        "g14_quantize_embeddings",
        # g57 takes the g06 slot (r12-green; g51 stays = the per-source
        # calibrated quality gate, g53 stays = the model-based gate, and
        # g06's pushdown plan-lock keeps running in tests/test_plans.py)
        "g06_quality_filter",
        # g58 takes the g07d slot (r12-green; incoming g07c stays = the
        # same G5 Arrow mapInPandas plumbing family; g07d's 1->N batch
        # shape stays pinned in tests/test_ext.py)
        "g07d_multimodal_frame_sample",
        # d40 takes the d23 slot (r12-green; d24 stays = the same
        # correlated-subquery machinery — the r12 d28 precedent reversed
        # onto the scalar twin)
        "d23_correlated_scalar_subquery",
        # d41 takes the d22 slot (r12-green; a10 stays = discovery +
        # pruning over the same hive layout — the r12 d03-out witness
        # pair reversed; the pruning plan locks run in tests/test_plans.py)
        "d22_golden_point_lookup",
        # c15 takes the c07 slot (r12-green; b04 stays = keyed sequence
        # construction — the r5 precedent — and c12 stays = the
        # composite-key concat surface inside its envelope roundtrip)
        "c07_composite_key",
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
    assert len(registry.REGISTRY) == 176, len(registry.REGISTRY)
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
