"""Regenerate PLANS.md: the physical-plan evidence for the scale posture.

Each entry prints `explain("formatted")` for one representative query at
sf0.01 with a note on the plan property that matters at 100 TB (the same
properties tests/test_plans.py asserts). Run from the repo root:

    python scripts/dump_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

# (query, what the plan must show)
SHOWCASE = [
    (
        "d02_filter_predicate",
        "Full predicate stack in `PushedFilters`, 5-column `ReadSchema` — the "
        "scan reads a column slice, not the table.",
    ),
    (
        "d05_join_star",
        "Three `BroadcastHashJoin`s; the fact table never shuffles — only "
        "MB-scale dimensions move.",
    ),
    (
        "d08_agg_pricing_summary",
        "`HashAggregate` below AND above the exchange: map-side partial "
        "combine, shuffle traffic is O(groups) not O(rows).",
    ),
    (
        "d12_latest_per_key",
        "One exchange on the key, then sort+window — latest-per-key costs a "
        "single shuffle.",
    ),
    (
        "d23_correlated_scalar_subquery",
        "No per-row subquery: Catalyst decorrelates into an aggregate joined "
        "back onto the outer table.",
    ),
    (
        "g03_knn_bruteforce",
        "The 5-row query side broadcasts; the corpus is scanned once, never "
        "cross-joined at shuffle cost.",
    ),
    (
        "g06_quality_filter",
        "The whole quality predicate stack reaches `PushedFilters` on the "
        "documents scan.",
    ),
    (
        "g13_decontaminate",
        "The benchmark gram set is the `BroadcastExchange` side; the train "
        "corpus streams through a map-side hash probe and partial-aggregates "
        "before its per-doc exchange — a 100 TB train table never shuffles "
        "for the eval join. (The round-robin exchange below the scan is the "
        "small-input parallelism guard; it disappears when the input scans "
        "as many splits.)",
    ),
    (
        "g17_training_order",
        "Per-epoch training order with NO global sort: one exchange on the "
        "256-value md5 bucket, then bounded in-bucket sorts for the "
        "row_number window.",
    ),
    (
        "g11_sequence_packing",
        "One exchange on the shard key, then an in-shard sort + running-sum "
        "window — pretraining sequence packing is a single-shuffle plan with "
        "no global sort.",
    ),
    (
        "g21_doc_chunking",
        "Zero `Exchange`, zero Python: token-window chunking is "
        "split/sequence/explode/slice inside the scan stage — a map-only "
        "pass whose output partitioning follows the input.",
    ),
    (
        "b04b_bloom_first_seen",
        "The bloom probe (`ArrowEvalPython` over the broadcast bitmap) "
        "filters the batch BEFORE the `LeftAnti` verify join — "
        "definitely-new keys never reach the join, so the history-sized "
        "shuffle shrinks to the might-contain fraction.",
    ),
    (
        "g25_span_dedup",
        "Span fingerprints come from one Arrow-batched numpy kernel "
        "(`MapInPandas`) in the scan stage — windows deduplicated in the "
        "kernel — so the span groupBy and the join back exchange only "
        "(span_hash, doc_id) pairs; document text never crosses an "
        "`Exchange`.",
    ),
    (
        "d29_interval_overlap_join",
        "The no-equi-key overlap theta-join runs as a hash equi-join on "
        "the hour-grid bin (`BroadcastHashJoin`/SMJ, never "
        "`CartesianProduct`/`BroadcastNestedLoopJoin`) with the exact "
        "overlap predicate as the join residual.",
    ),
    (
        "d30_recursive_hierarchy",
        "Spark 4 native recursive CTE: a `UnionLoop` node owns the "
        "iteration; the recursive step is map-only (filter + project on "
        "the previous iteration), no shuffle per round.",
    ),
    (
        "g27_embedding_decontaminate",
        "Zero `Exchange`, zero joins: the bounded eval matrix rides in the "
        "`MapInPandas` kernel closure and the corpus STREAMS through one "
        "Arrow BLAS pass — the orientation that survives a 100 TB corpus.",
    ),
    (
        "d31_unpivot",
        "Wide-to-long via the native `Expand` node directly above the "
        "aggregate — map-only reshaping, the only exchange is the "
        "aggregation's own partial/final pair.",
    ),
    (
        "d32_gap_fill",
        "Gap fill with NO extra shuffle for the LOCF window: the dense "
        "spine's `Generate` preserves the bounds aggregate's hash "
        "partitioning on the key, so the final Sort+Window run "
        "partition-local. Two column-pruned scans (bounds + hourly agg), "
        "no calendar cross join.",
    ),
    (
        "a19_deletion_vectors",
        "Merge-on-read is ONE `LeftAnti` join whose strategy AQE picks from "
        "the delete vector's runtime size — no nested loop, no forced "
        "driver broadcast; data files never rewritten at read time.",
    ),
    (
        "a20_zone_map_pruning",
        "The range scan's `Location` lists only the files whose zone "
        "overlaps the predicate (file skipping on a range-clustered "
        "layout); the exact BETWEEN survives as the residual filter.",
    ),
    (
        "g30_bm25_score",
        "Corpus stats and the |Q|-row df table are the only broadcast "
        "sides; the token stream is filtered to the query terms IN THE "
        "SCAN STAGE — only the inverted-index slice for three terms ever "
        "shuffles.",
    ),
    (
        "g31_bigram_logprob",
        "Bigrams form in-row (`slice` + `transform` zip, no self-join on "
        "position); the c2/c1 model aggregates carry map-side partials and "
        "the scoring joins stay with AQE — a web corpus's bigram table "
        "out-sizes any driver.",
    ),
    (
        "g32_setsim_prefix_join",
        "The candidate self-join keys on PREFIX shingle hashes (row_number "
        "window under the global frequency order feeds the join) — exact "
        "recall with the shuffle bounded to ~(1-t) of the shingle stream, "
        "rarest tokens first.",
    ),
    (
        "g33_hard_negatives",
        "Blocked-matmul masked top-1: the O(n*B) candidate rows from the "
        "`FlatMapGroupsInPandas` kernel feed one window + one semi join — "
        "no n^2 shuffle, no similarity matrix outside a block pair.",
    ),
    (
        "g37_containment_dedup",
        "Asymmetric prefix + PPJoin positional bound: only each probe's "
        "rarest |S|-ceil(t|S|)+1 shingles (row_number under the global df "
        "order) join the full index, and rows whose positional upper bound "
        "cannot reach ceil(t*|S_a|) drop before the distinct — the hot "
        "shingle never drives a quadratic bucket. Verify is two-pass: an "
        "8-byte-hash array_intersect prefilter (exact-complete under the "
        "collision-free flag) feeds string-exact scoring its survivors.",
    ),
    (
        "g38_semdedup",
        "Cluster-bounded pair search: map-only literal-centroid assignment "
        "(zero Exchange before the pair stage), then ONE applyInPandas "
        "over groupBy(cluster_id) — each cluster a blocked numpy gram "
        "matrix, vectors cross Arrow once per cluster, work sum(c_i^2) "
        "not n^2.",
    ),
    (
        "g41_filtered_knn",
        "Hybrid retrieval pre-filter: `EqualTo(lang,en)` pushed into the "
        "documents scan, corpus pruned by a LeftSemi join BELOW the "
        "distance stage — top-k exact over the qualifying set, no "
        "post-filter recall loss.",
    ),
    (
        "g45_vocab_coverage",
        "Top-V cut is a `TakeOrderedAndProject` (per-partition heaps, "
        "never a global sort) and the V-row vocabulary broadcasts back "
        "(`BroadcastHashJoin`) — the corpus token stream shuffles once, "
        "for the per-doc aggregate only.",
    ),
    (
        "g46_bpe_pair_stats",
        "Fast-BPE factoring: the pair `Generate` sits ABOVE the "
        "word-frequency aggregate (vocab-sized input, never the token "
        "stream) and the top-50 cut is a `TakeOrderedAndProject` — the "
        "corpus shuffles once, for word counts.",
    ),
    (
        "g47_length_bucketing",
        "Exact quartile bounds in ONE single-group aggregate, broadcast "
        "back as a 1-row BroadcastNestedLoopJoin — bucket assignment is "
        "map-only arithmetic, the stats agg carries map-side partials "
        "into a 4-group shuffle; the corpus scans once.",
    ),
    (
        "f02_grouped_map",
        "The repartition before the grouped-map is EXPLICIT and pinned: "
        "per-group Python dispatch is the cost here, which AQE's "
        "byte-based coalescing cannot see — left to AQE this "
        "small-byte/high-group-count shuffle folds to one partition and "
        "serializes every group on one core.",
    ),
    (
        "a09_dlq_split",
        "The DLQ split is a map-only boolean filter PAIR over the decode "
        "expressions (no exception path, no shuffle before the certifying "
        "aggregates) — one poison record costs one false bit, never a "
        "batch.",
    ),
    (
        "a24_symlink_manifest_export",
        "External-engine interop: the read-back scans EXACTLY the "
        "objects the symlink manifests list (derived from the commit "
        "protocol, never a folder listing) — the same split-planning "
        "metadata Presto/Trino/Athena hold; the aggregate carries "
        "map-side partials.",
    ),
    (
        "a23_zorder_clustering",
        "Pure-JVM Morton interleave: the curve key is bit arithmetic in "
        "whole-stage codegen, map-only before one partial aggregate — the "
        "clustered-rewrite path reuses compact_lake's crash-safe swap.",
    ),
    (
        "d36_approx_percentile_check",
        "The sketch path of the percentile profile: approx_percentile "
        "carries map-side-mergeable O(accuracy) state per group. This "
        "CHECK query also computes the exact band in the same aggregate "
        "(the certification harness — that part does buffer values); the "
        "production profile runs the sketch alone.",
    ),
    (
        "g50_source_cap",
        "Skew-safe per-key cap: partial counts per (key, md5-prefix "
        "bucket), the cutoff table broadcasts (`BroadcastHashJoin`) so "
        "dropped buckets die map-side, and the `row_number` window "
        "partitions by (key, bucket) — a hot key never pays one serial "
        "full sort; the ranking exchange moves ~keys*K rows, not the "
        "table.",
    ),
    (
        "g53_quality_classifier",
        "Model inference as a scan-stage expression: tokenize, hash, "
        "weight-lookup and accumulate all sit inside one "
        "WholeStageCodegen span — zero Exchange, zero Python eval; the "
        "corpus never shuffles for scoring.",
    ),
    (
        "g55_pipeline_end_to_end",
        "The composed corpus build (gate -> dedup -> cap) in one plan: "
        "the classifier gate is a scan-stage filter (fused into the "
        "parquet scans), dedup is one content-hash Exchange, and the "
        "cap contributes its counts pass + the broadcast cutoff join + "
        "the (key, bucket) ranking slice — no stage rematerializes the "
        "corpus.",
    ),
    (
        "g54_mixture_oversample",
        "Fractional-epoch replication as a scan-stage `Generate "
        "explode` over an in-row sequence — zero Exchange, zero Python; "
        "output size is sum(w_i) and the cost is one pass whatever the "
        "mixture weights.",
    ),
    (
        "g56_truncation_recall",
        "Both rankings from ONE corpus scan: the 5-row query frame (with "
        "its sliced twin) is the `BroadcastExchange` side, each candidate "
        "row scores the full-dim and prefix cosines in-row, and the two "
        "`row_number` windows share a single (query_id) Exchange — no "
        "second corpus pass for the truncated arm.",
    ),
    (
        "g57_hybrid_rrf",
        "Each retrieval arm ends in `TakeOrderedAndProject` (distributed "
        "global top-50 — the corpus is never globally sorted); rank "
        "assignment and the full-outer fusion run on the <=50-row "
        "survivor frames, and the final top-10 is a third TakeOrdered.",
    ),
    (
        "g58_source_drift",
        "The token stream shuffles once: the (source, token) "
        "`HashAggregate` pair (partial below, final above the Exchange); "
        "vocab counts and per-source totals re-aggregate that counts "
        "frame; corpus scalars and the sources-sized totals broadcast — "
        "the sources x vocab cross product never materializes (the "
        "absent-token mass is a closed-form expression).",
    ),
    (
        "g59_url_dedup",
        "All four canonicalization regexps run inside the scan-stage "
        "Project (whole-stage codegen); the only Exchange is the "
        "canonical_url `HashAggregate` pair with two scalars of state — "
        "a hot refetched URL collapses map-side.",
    ),
    (
        "g60_line_dedup",
        "Line segmentation is ONE regexp pass evaluated inside the "
        "Generate (once per doc row) — no `split(` recompute in the "
        "Project above it (the slice-per-line form is quadratic per "
        "document); then one line_text Exchange for the first-occurrence "
        "window and one doc_id Exchange reassembling kept lines.",
    ),
    (
        "g61_dsir_selection",
        "Exactly TWO documents scans: one combined bucket-counts "
        "aggregate (target count as a conditional count in the same "
        "256-key shuffle, totals from a window over the counts frame "
        "itself) and one scoring pass with the 256-row weight table on "
        "the `BroadcastHashJoin` build side — the naive "
        "separate-frames dataflow scans the corpus five times.",
    ),
    (
        "d42_mad_outliers",
        "Three scans total for the exact three-pass algorithm: the two "
        "per-group scalar frames are eagerly localCheckpointed (read "
        "back as `ExistingRDD`, no lineage re-derivation) and broadcast "
        "into the fence pass.",
    ),
    (
        "d43_markov_transitions",
        "One user-hashed Exchange for the lag window (one-row lookback "
        "state, group-local sort), then the (prev, next) partial-agg "
        "pair; the row-normalizing window runs over the "
        "|event_types|^2 frame, never the events.",
    ),
]


def main() -> None:
    from aws_kinesis_spark import registry
    from aws_kinesis_spark.operators.dedup import minhash_signatures
    from aws_kinesis_spark.session import get_spark
    from aws_kinesis_spark.tables import load

    spark = get_spark("plan-dump", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()

    print("# PLANS.md — physical-plan evidence (auto-generated)")
    print()
    print("Regenerate with `python scripts/dump_plans.py > PLANS.md`.")
    print("Each plan is `explain(\"formatted\")` at sf0.01; the note states the")
    print("property that makes the operator viable at 100 TB, and")
    print("`tests/test_plans.py` asserts it in CI.")

    def emit(title: str, note: str, df) -> None:
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(jmode)
        # literal control bytes in plan text (e.g. the \x00 NULL-id
        # sentinel in g54's md5 draw) would make PLANS.md a binary file
        # for git/grep — escape them visibly
        plan = "".join(
            ch if ch == "\n" or ch == "\t" or ord(ch) >= 0x20 else f"\\x{ord(ch):02x}"
            for ch in plan
        )
        print(f"\n## {title}\n\n{note}\n\n```\n{plan.rstrip()}\n```")

    for name, note in SHOWCASE:
        emit(name, note, qmap[name](spark, SF))

    emit(
        "minhash_signatures (g02 stage 1)",
        "Zero `Exchange`, zero `Generate`: shingle hashes are a JVM "
        "projection and the 64 minima are one `ArrowEvalPython` (vectorized "
        "numpy) projection — still a map-only pass at any scale.",
        minhash_signatures(load(spark, SF, "documents")),
    )

    from aws_kinesis_spark.operators.dedup import simhash_signatures

    emit(
        "simhash_signatures (g02c stage 1)",
        "Zero `Exchange`, zero `Generate`: the 64-bit signature folds a "
        "bit-count vector over the in-row shingle-hash array "
        "(`aggregate`/`zip_with`) — same map-only discipline as minhash, "
        "replacing the former explode + 64-column hash aggregate.",
        simhash_signatures(load(spark, SF, "documents")),
    )

    import tempfile

    from pyspark.sql import functions as F

    from aws_kinesis_spark.operators.ivf_index import build_ivf_index, knn_ivf_indexed

    em = load(spark, SF, "embeddings")
    ivf_dir = tempfile.mkdtemp(prefix="plans_ivf_")
    build_ivf_index(em, ivf_dir, nlist=16)
    emit(
        "knn_ivf_indexed (g48 probe stage)",
        "The standing-index probe: `PartitionFilters: [cell IN (...)]` on "
        "the cells scan — only the nprobe probed cell partitions open — and "
        "ZERO Python evaluations (the serving default runs the probe matmul "
        "driver-side against the in-hand centroids under the `max_queries` "
        "dial; `queries_are_small=False` keeps a large query set distributed "
        "via one Arrow probe UDF): the corpus is never re-assigned, so "
        "repeated kNN pays O(probed cells), not O(corpus).",
        knn_ivf_indexed(
            spark,
            ivf_dir,
            em.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            k=10,
            nprobe=4,
        ),
    )

    from aws_kinesis_spark.operators.ivf_index import delete_from_ivf_index

    delete_from_ivf_index(em.filter(F.col("vec_id") % 7 == 3), ivf_dir)
    emit(
        "knn_ivf_indexed with tombstones (g52 probe stage)",
        "The probe after a delete: the cells scan keeps its "
        "`PartitionFilters: [cell IN (...)]` pruning and zero Python "
        "evaluations; the only addition is one `BroadcastHashJoin ... "
        "LeftAnti` against the tombstone scan — sized O(deletes since "
        "last compaction) — applied to probed-cell rows only, with the "
        "horizon bound (`__src <= __horizon`) as the join's extra "
        "condition so re-appends after the delete stay served. A store "
        "with no tombstones never builds this join (one driver listdir).",
        knn_ivf_indexed(
            spark,
            ivf_dir,
            em.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            k=10,
            nprobe=4,
        ),
    )


if __name__ == "__main__":
    main()
