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
# Round-7 rotation (29 swapped — every query that had never had a driver
# row goes in: the 23 oracle-backed round-6 additions PLUS the 6 former
# rows-only sketch/ANN queries, which gained deterministic self-check
# oracles this round. Witness for each rotated-out slot in parens):
#   out: d14d (d31 unpivot = same D14 reshape family), d29 (d34 asof
#        tolerance = same D15 temporal-join family), c12 (c14 = same C9
#        JSONL roundtrip, gzip superset), a03 (a01b = same kinesis_sim
#        source surface incl. shard lineage), a05 (a17 snapshot diff
#        reads the same manifest/time-travel protocol), a14 (a18 vacuum +
#        a19 DV-materialize exercise the same leaf-rewrite/remap
#        machinery; a14's invariants stay pinned in tests/test_lake.py),
#        a16 (a18 = same deletion-sweep + manifest-rewrite family),
#        o05 (o08 stream SCD2 builds on the same scd2_history chain),
#        o06 (o07 compaction collapses via the same net-change window),
#        g03d (g03b/g03c share the kNN kernels and run the brute-force
#        twin inside their recall checks), g04c/g04d (g30 BM25 + g31
#        bigram logprob = G4 token/term-statistics family), g07c (g07b =
#        same Arrow multimodal 1->1 plumbing, byte-exact oracle), g08
#        (g33 = same blocked-matmul embedding-aggregation kernel), g13
#        (g27 embedding + g28 n-gram-overlap decontamination family),
#        g15 (g16 quality-filter family stays in), g18 (g18b runs the
#        exact top-k as its oracle twin), g20 (g35 = the streaming form
#        of the same standing banded index), g22 (g34 data card = same
#        corpus-stats partial-agg), g23/g24 (g29 importance + g36 token
#        budget = same hash-threshold sampling mechanism), g25 (g32
#        exact set-similarity verify over the same shingle machinery),
#        g26 (g31 bigram extends the unigram mechanism), e03/e09 (e04
#        event-time windowed agg family), e07/e11/e13 (e12 stream-stream
#        join over the kinesis source; a01b covers reshard lineage),
#        e08 (o08 + g35 ARE foreachBatch multi-sink pipelines)
#   in:  a17, a18, a19, a20, a21, a22, c14, d31, d32, d33, d34, d10b,
#        g02c, g03b, g03c, g07b, g18b, g27, g28, g29, g30, g31, g32,
#        g33, g34, g35, g36, o07, o08
# Round-9 rotation (5 swapped — the five round-7 additions that have never
# had a driver row go in; witness for each rotated-out slot in parens):
#   out: d06 (semi/anti joins run INSIDE five in-window queries: g19's
#        singleton anti-join (operators/dedup.py:677), b04b's exact
#        first-seen anti-join (operators/bloom.py:186), a19's deletion-
#        vector anti-join (sources/lake.py:737), g35's verdict anti-join
#        (streaming/pipeline.py:621), g33's anchor semi-join
#        (operators/similarity.py:493)), a13 (a17/a18/a19/a20/a21/a22 all
#        write/read the same dynamic-partition manifest lake; the new a23
#        IS a clustered-layout rewrite over it), o07 (o08 stream SCD2
#        builds on the same CDC decode + net-change collapse chain — the
#        r7 precedent that retired o05/o06), c10 (c14's gzip JSONL
#        roundtrip measures the same compressed-byte accounting surface;
#        a22 certifies manifest byte sums), g14b (g03c's IVF coarse
#        quantizer exercises the same quantize-then-measure kernel and
#        runs a recall check against the unquantized brute-force twin;
#        g07b is byte-exact vectorized numeric Arrow plumbing)
#   in:  a23, d35, g37, g38, g40
# Round-9 additions (3 new queries registered AND windowed the same round,
# so they get driver rows immediately; witness for each rotated-out slot
# in parens):
#   out: d10b (g18b = the same sketch-with-deterministic-self-check
#        family, and the NEW d36 is itself a sketch-vs-exact-bounds
#        check; exact distinct/dup detection stays witnessed by g19
#        keepers and b04b exact first-seen), g17 (g40's md5-rank-within-
#        stratum IS the deterministic-hash ordering mechanism and g11's
#        packing consumes the same ordered layout; epoch variation is
#        the same seed-in-hash trick as g36/g24's variates), g29
#        (g36 token-budget + g40 exact-N = the same hash-threshold /
#        deterministic-rank sampling family, both in-window)
#   in:  d36_approx_percentile_check, g41_filtered_knn,
#        g45_vocab_coverage
# Round-9 late additions (2 more new queries windowed the same round;
# witness for each rotated-out slot in parens), then 1 more (g46):
#   out: g31 (green r8; g30 BM25 term statistics + g45 vocab coverage are
#        the same in-window G4 token/term-statistics family, and the NEW
#        g46 is itself that family's pair-statistics form), g33 (green
#        r8; its blocked-matmul embedding kernel shape is in-window via
#        g38's per-cluster gram-matrix applyInPandas and the g03b/g03c
#        kNN recall checks run the same cosine kernels), a21 (green r8;
#        a22's manifest certification + a17's snapshot protocol are the
#        same in-window commit-protocol family, the NEW a24 consumes the
#        identical manifest chain, and a21's stage/audit/publish
#        invariants stay pinned in tests/test_lake.py — the a14
#        precedent)
#   in:  g46_bpe_pair_stats, g47_length_bucketing,
#        a24_symlink_manifest_export
# Round-9 final wave: two operators that had only local evidence (A9 DLQ
# zero-records-lost, B12 stream metrics) gain deterministic oracles and
# hard driver rows; witness for each rotated-out slot in parens:
#   out: g28 (green r8; g27 embedding decontamination is the same
#        in-window decontamination family over the same eval fixture),
#        g03b (green r8; g03c IVF runs the same ANN-recall self-check
#        against the same brute-force twin — the r7 precedent that
#        retired g03d citing exactly this pair)
#   in:  a09_dlq_split, b12_stream_progress
#   ...and a11 (raw-backup completeness, the third local-only operator
#   to gain a hard oracle this round):
#   out: a18 (green r8; a19's deletion-vector materialize + a24's
#        manifest-protocol consumption are the in-window witnesses for
#        the lake-maintenance commit chain, and a18's orphan-sweep
#        mtime-guard invariants stay pinned in tests/test_lake.py — the
#        r7 precedent that retired a14/a16 of the same family)
#   in:  a11_raw_backup
# Earlier late additions:
#   out: g21 (f04's UDTF LATERAL is the same 1->N Python surface and
#        g07b pins the Arrow batch plumbing; g21's chunk-boundary and
#        chunking-invisibility invariants stay pinned locally in
#        tests/test_ext.py::test_chunking_invariants and
#        test_signature_kernels_chunking_is_invisible, and g17/g11's
#        consumers were retired on the same local-invariant basis),
#        g34 (d35/d36 are the same grouped single-pass profile shape and
#        g45's corpus-frequency aggregate covers the distinct-state
#        posture; g34's md5-not-bodies invariant stays pinned locally)
#   in:  d38_funnel_steps, d39_cohort_retention
# After the round-9 window EVERY registered query (now 163) is
# oracle-backed and has had a hard driver-hash row. Queries outside the
# window still run in the local differential suite
# (tests/test_differential.py) every CI pass; prior-round driver rows for
# rotated-out queries remain in CORRECTNESS_r{1..9}.json.
# Round-10 rotation (15 swapped — the RE-certification round, VERDICT r9
# #2: fresh driver rows for queries whose code paths churned since their
# last row — a05/a18 flush-salt + orphan-sweep churn (r9), g02/g02b/g10/
# g20 dedup.py kernel churn (r9 simhash/spread + r10 selectExpr quoting),
# e08 streaming/pipeline.py churn (r9 threading + r10 broadcast gate) —
# plus the longest-stale r2/r3 rows (d01, d02, d09, d16, d17, b03, c06)
# and the NEW g48 persistent-IVF query, registered and windowed the same
# round. d04/d20 stay stale-but-witnessed: d04's limit runs inside every
# in-window top-k (g40/g45 TakeOrdered, d39's bounded grids), d20's JSON
# exprs inside c14's JSONL roundtrip. Witness for each rotated-out slot
# in parens:
#   out: d07 (UNION core inside d30's recursive UNION-ALL loop;
#        INTERSECT/EXCEPT = the semi/anti forms witnessed by b04b's
#        first-seen anti-join + g41's qualifying semi-join — the r9 d06
#        precedent), d33 (bucket-then-aggregate = in-coming d09's time
#        buckets; the grouped profile shape stays via d36 — the r9 g34
#        precedent), d35 (d36 runs the approx path INSIDE d35's exact
#        bounds — same family, certified together r9), d38 (d39 cohort =
#        the same stage-predicate + monotone-join mechanism over the same
#        tables, both r9), b02 (the salt-spread-then-merge mechanism is
#        in-window on the write path via a05/a18/a22's flush salt; the
#        agg-skew dial stays pinned in tests/test_plans.py), a17
#        (in-coming a05_manifest_time_travel reads the SAME snapshot/
#        manifest protocol — the r7 retirement reversed to re-certify a05
#        after churn), a23 (a20's zone-pruned range scan consumes the
#        same clustered layout; a19 exercises the same leaf-rewrite
#        machinery), a24 (a22 certifies the same committed-manifest chain
#        a24 exports), g03c (in-coming g48 runs the SAME IVF kernels —
#        train/assign/probe — against the same brute-force recall floor,
#        plus the standing store), g18b (d36 = the same sketch-with-
#        deterministic-self-check family — the r9 d10b precedent), g19
#        (in-coming g10 certifies the connected-components core g19
#        consumes; g02's verify-backed LSH dedup + g35's streaming keeper
#        verdicts cover keeper selection), g30 (g45 + g46 = same token/
#        term-statistics family — the r9 g31 precedent), g32 (g37 runs
#        the same PPJoin prefix+positional machinery, extending g32's
#        bound), g36 (g40 = the same deterministic-hash sampling family —
#        the r9 g29/g17 precedent), g47 (d36 certifies the same
#        approx-quantile kernel inside exact bounds; g40 covers
#        deterministic bucket assignment)
#   in:  d01, d02, d09, d16, d17, b03, c06, a05, a18, e08, g02, g02b,
#        g10, g20, g48_persistent_ivf
# Round-10 late addition (1 more new query windowed the same round;
# witness for the rotated-out slot in parens):
#   out: g02c (green r9, certified AFTER the r9 simhash kernel churn and
#        its code path is untouched since — this round's dedup.py edits
#        quote identifiers in the MINHASH band/signature selectExpr only;
#        the G2 near-dup family is witnessed in-window by g02 + g02b +
#        g20 + g35, and the simhash chunk-join completeness invariant
#        stays pinned in tests/test_ext.py::
#        test_simhash_chunk_join_is_complete)
#   in:  g49_leakage_safe_split (held-out-split decontamination composing
#        the exact g32 prefix join with the g09/g12 hash-split mechanism)
# Round-10 re-certification swap (the fencing change must get a fresh
# driver row; witness for the rotated-out slot in parens):
#   out: a01b (green r9; e12_stream_stream_join_kinesis_source consumes
#        the SAME kinesis_sim streaming source — per-shard offsets,
#        envelope decode — in-window, and the reshard-lineage invariants
#        stay pinned in tests/test_streaming.py's three dedicated reshard
#        tests: full-lineage batch read, parent-drains-before-children,
#        crash recovery near the split boundary)
#   in:  a21_write_audit_publish (stage/publish gained the writer fencing
#        token this round — the WAP path re-certifies under a hard oracle
#        the same round its commit protocol changed)
# Round-11 rotation (40 swapped — the FRESHNESS round, VERDICT r10 #1:
# every query whose last hard driver row predates round 5 rotates in —
# that is the complete 39-query r2–r4 backlog (d03/d04/d05/d08b/d10/d10c/
# d11/d12/d13/d14/d14b/d14c/d15b/d18/d19/d20/d21/d22/d23/d24/d28, b01/
# b02b/b07, c07/c08/c09, a07/a12, e01/e02/e05, g03/g03e/g04/g05/g07/g09/
# g14) plus g03c, whose knn_ivf path was REWRITTEN this round to delegate
# to the standing IVF store (similarity.py:knn_ivf) and must re-certify
# under a hard row the round its kernel changed. Kept in-window: exactly
# the round-11 churned code paths — a19 (perf work, pipeline_queries),
# a21 (publish existence fence, lake.py), e08 + g35 + o08 (streaming/
# pipeline.py: sourceless trickle gate + per-trigger listing work), g41 +
# g48 (ivf_index.py: crash-safe rebuild, driver-side probe, temp-store
# reclamation) — and f02/f03/f04, the sole hard certificates of the F2/
# F3/F4 surfaces. Every rotated-out slot is green in CORRECTNESS_r10 (the
# freshest possible row — the g02c precedent) and re-runs in the local
# differential suite every CI pass; named witnesses:
#   out: d01 (projection inside d03's pruned scan + every incoming
#        select), d02 (d03 pruned filter + d22 point lookup), d09 (e01
#        tumbling hourly = the same time-bucketed agg; d14 rollup), d16
#        (g04 text stats + c07 concat keys), d17 (d03's date predicate +
#        e01/e02 event-time windows + c07's time components), d30 (green
#        r10; native-UnionLoop plan lock runs every CI pass,
#        tests/test_plans.py:test_recursive_hierarchy_uses_union_loop),
#        d31 (d14/d14b/d14c = the same D14 reshape family), d32 (d13
#        window functions + d15b's bin/sequence machinery), d34 (d15b =
#        same D15 temporal-join family — the r7 precedent reversed), d36
#        (d10c runs the EXACT percentile twin the sketch is certified
#        against), d39 (d13 windows + d05 hash joins; green r10), c06
#        (c07 = same C6/C7 time/key derivation family; d03 consumes the
#        partition cols), c14 (c09 = same C9 format-roundtrip family —
#        the r5 precedent), b03 (b01 keyed partition order = same
#        ordered-keyed shuffle family), b04b (d10 exact distinct + e05
#        stateful stream dedup = the B4 exactly-once mechanism's two
#        halves), b12 (green r10; per-trigger numInputRows oracle pinned
#        in tests/test_streaming.py), a05 (a12 reads the same manifest
#        protocol; a21 commits it), a09 (e08 keeps the lake fan-out path;
#        DLQ zero-records-lost invariants pinned in tests/test_lake.py),
#        a11 (a12 = same run_lake_batch surface incl. raw branch), a15
#        (a12 lake roundtrip reads evolved manifests; green r10), a18
#        (a19 = same leaf-rewrite/remap machinery — the r9 precedent),
#        a20 (d03 partition-pruned scan + a12; zone-map invariants pinned
#        in tests/test_lake.py), a22 (a21's publish now RUNS the
#        manifest-entry existence validation in-line — this round's
#        fence), g02/g02b (g05 embedding near-dup + g35's standing
#        band index = the G2 family; kernels untouched since their r10
#        rows), g07b (g07 = same Arrow multimodal plumbing — the r7
#        precedent reversed), g10 (g05 near-dup clustering consumer +
#        g35 keeper verdicts; CC invariants pinned in tests/test_ext.py),
#        g16 (g04 = same G4 text-analysis family), g20 (g35 = streaming
#        form of the same standing banded index — the r7 precedent),
#        g27 (g05 runs the same cosine kernels; zero-shuffle plan lock
#        runs every CI pass, test_embedding_decontaminate_streams),
#        g37 (green r10; PPJoin prefix machinery pinned in
#        tests/test_ext.py; g35's candidate bounds in-window), g38 (g05 =
#        same within-cluster cosine task; f02 = the applyInPandas
#        surface), g40 (g09 = same deterministic-hash split family — the
#        r9 precedent reversed), g45/g46 (g04 = same G4 token-statistics
#        family), g49 (g09 hash split + g05 embedding decontamination =
#        both halves, in-window), e04 (e01/e02 = watermarked windowed
#        aggs over the same source), e06 (e05 = stateful streaming
#        family; buffer joint-bound test pinned in
#        tests/test_streaming.py), e12 (e01/e02/b07 consume the same
#        kinesis_sim source + offsets; reshard tests pinned), f01 (g48/
#        g03c's nearest-cell assignment IS a scalar pandas_udf in-window;
#        g14's quantize kernel likewise)
#   in:  d03, d04, d05, d08b, d10, d10c, d11, d12, d13, d14, d14b, d14c,
#        d15b, d18, d19, d20, d21, d22, d23, d24, d28, b01, b02b, b07,
#        c07, c08, c09, a07, a12, e01, e02, e05, g03, g03c, g03e, g04,
#        g05, g07, g09, g14
# Post-r11 freshness ledger: latest-hard-row distribution was r11:50
# r10:40 r9:16 r8:14 r6:26 r5:18 — nothing older than r5 remained. The r5
# block (18) was the round-12 rotation's incoming set.
# Round-12 rotation (21 swapped — the complete r5 freshness backlog (18:
# a01, a10, b04, b05, c01, c13, d08, d15, d26, d27, e10, g01, g04b, g06,
# g07d, g11, g12, o04) PLUS the three paths whose code churned this round
# and must re-certify the round they changed: e09 (the rollup replay
# protocol was rewritten to a pointer swap, streaming/rollup.py), a16
# (expire_partitions gained pre-delete entry-url resolution, lake.py),
# g03b (knn_lsh's geometry probe was rewritten NULL-safe, similarity.py).
# Kept in-window: b02b (salted_join's default salt changed this round),
# a19 + g35 (the two standing perf targets — their BENCH_r12 rows must
# pair with fresh hard correctness rows), g41/g48/g03c (ivf_index.py
# churned this round: distributed-probe query caching). Every rotated-out
# slot is green in CORRECTNESS_r11 — the freshest possible row — and
# re-runs in the local differential suite every CI pass; named witnesses:
#   out: d03 (d22 partition-pruned point lookup stays in-window + incoming
#        g06's pushdown-locked filter; incoming a10 discovers/prunes the
#        same hive layout), d04 (d11 sort_topn = TakeOrdered IS sort+limit),
#        d08b (incoming d08 = same D8 aggregation family), d13 (incoming
#        d26 sessionization + d27 rolling window = the D13 window-function
#        family — the round-4 witness pair reversed), d14b/d14c (d14
#        rollup stays = same D14 grouping family), d15b (incoming d15
#        asof join = same D15 temporal-join family — the r7 d29/d34
#        precedent), d18 (g14 quantize = floor/abs/divide in-row math —
#        the round-4 precedent), d20 (incoming c01 = from_json/to_json
#        roundtrip — the round-4 precedent), d21 (incoming g06 =
#        conditional + null handling — the r5 precedent), c08 (incoming
#        g04b concat+md5 fingerprint + incoming g12's md5-hex-threshold =
#        the same C8 hashing surface), c09 (incoming c13 = same C9
#        format-roundtrip family — the r5 precedent), b01 (incoming b04's
#        keyed sequence dedup + b02b's keyed salted shuffle = the B1
#        keyed-shuffle family — the round-4 precedent), b07 (incoming a01:
#        kinesis_sim replay-from-offset IS the b07 mechanism — the r5
#        precedent), a07 (incoming o04 = keyed LWW upsert — the r5
#        precedent), a21 (a12 reads the same committed-manifest protocol +
#        incoming a16 rewrites manifests atomically; the WAP
#        stage/audit/publish + fence invariants stay pinned in
#        tests/test_lake.py — the r9 a14/a18 precedent), o08 (incoming
#        o04 = same CDC decode/collapse family — the r6 precedent
#        reversed; SCD2 kill/resume invariants pinned in
#        tests/test_streaming.py), e05 (g35 stays = the same E5 dedup
#        mechanism in its standing-index streaming form + incoming b04
#        exactly-once core), e08 (incoming e09 is a foreachBatch lake
#        pipeline — re-certifying the exact protocol that changed this
#        round — + g35 stays = foreachBatch multi-sink — the r7
#        precedent), g04 (incoming g04b/g06 = same G4/G6 text
#        stats/quality family), g09 (incoming g12 = same
#        md5-hex-threshold split mechanism — the round-4 precedent)
#   in:  a01, a10, a16, b04, b05, c01, c13, d08, d15, d26, d27, e09,
#        e10, g01, g03b, g04b, g06, g07d, g11, g12, o04
# Round-12 late swap (2 more churned paths re-certify the round they
# changed — the relational-review fixes altered d16's column set (the
# vacuous regexp/LIKE/trim columns now run over varying p_name/p_brand)
# and d36's within_bounds construction (small-group membership bound);
# witness for each rotated-out slot in parens):
#   out: d19 (g14 quantize = the same transform/array in-row surface —
#        the round-4 witness reversed; g03's F.aggregate dot products and
#        g11's packing arrays are further in-window array consumers),
#        d28 (d23 correlated-scalar + d24 EXISTS = the same subquery
#        machinery relational division compiles to — division IS the
#        double-NOT-EXISTS form; both stay in-window)
#   in:  d16 (columns changed this round), d36 (bound construction
#        changed this round)
# Round-12 new registrations (2 new queries registered AND windowed the
# same round, the r9/r10 precedent; witness for each rotated-out slot in
# parens — both rotated-out slots carry green r11 rows, the freshest
# possible, and keep running in the local differential suite):
#   out: d10 (g01 stays in-window = distinct by collision-resistant
#        content hash, the same D10 dedup mechanism; d10c's percentile
#        distinct-value machinery also stays), d11 (d12 stays in-window =
#        the windowed rank/top-per-key family, and incoming g50 IS
#        ordered-rank + limit per key — sort+limit re-certified through
#        the skew-safe form)
#   in:  g50 (NEW: per-source frequency cap via the two-phase hash-bucket
#        cutoff, operators/training.py:cap_per_key), g51 (NEW: per-source
#        relative quality gate — per-group median threshold broadcast
#        back over the scan)
# Round-12 churn re-entry (1 swap — the CDC/SCD2 determinism hardening
# added collapse_cdc's payload-hash total-order term to net_changes,
# scd2_history, and the scd2_merge_increment event dedup; provably
# output-neutral on the fixture surface (every synthesized sequence
# number is unique, so the new final order term never fires — the
# differential suite re-verified o04-o08 locally), but the kernels
# changed, so their streaming consumer re-certifies under a hard row the
# round they changed; o05/o06 re-certify in the already-planned r13
# rotation (they sit in the r6 incoming block)):
#   out: g03e (g03 stays in-window = the same blocked brute-force kNN
#        kernel, and g41 stays = the same kNN-join shape against a query
#        table; g03e's latest hard row is r11, the freshest possible)
#   in:  o08 (stream SCD2 maintenance = scd2_merge_increment +
#        scd2_history + _dedup_events, all three changed paths)
# Post-r12 freshness ledger (for the round-13 rotation): the r6 block
# (26: a03, a14, c12, d14d, d29, e03, e07, e11, e13, g03d, g04c, g04d,
# g07c, g08, g13, g15, g18, g22, g23, g24, g25, g26, o05, o06 + the two
# r6 rows a16/e09 just re-certified here) is the next incoming set, then
# the r8 block.
# Round-13 rotation (24 swapped — the COMPLETE r6 freshness backlog
# rotates in, with o05/o06 — the only queries whose kernels changed in
# r12 without a same-round hard row (the CDC/SCD2 determinism hardening)
# — in regardless of slot pressure, per VERDICT r12 #1. Every rotated-out
# slot carries a green CORRECTNESS_r12 row — the freshest possible — and
# keeps re-running in the local 166-query differential suite every CI
# pass; named witnesses in parens):
#   out: d05 (b05 stays = co-located equi-join; incoming d29 = the join
#        machinery in its interval form), d14 (incoming d14d pivot = the
#        same D14 grouping family — the r12 witness pair reversed), d15
#        (incoming d29 = the same D15 temporal/range-join family — the r7
#        precedent), d16 (incoming g04d TF-IDF tokenization + g15
#        repetition ratios = the regexp/split/lower string surface over
#        documents), d26 (incoming e03 = session-window semantics in
#        streaming form — the r12 witness pair reversed), d27 (e02 stays
#        = sliding-window family; d12 stays = window-rank family), c01
#        (incoming c12 = the same from_json/to_json codec roundtrip), c13
#        (incoming c12 = the same C9 format-roundtrip family — the r5
#        precedent), b02b (g50 stays = the skew-safe keyed-cutoff shuffle
#        machinery; b04 stays = keyed shuffle core), a01 (incoming a03
#        EFO consumer + incoming e13 reshard drain = both consume the
#        same kinesis_sim source and reshard lineage), a16 (incoming a14
#        lake compaction = the same atomic manifest-rewrite maintenance
#        protocol), a19 (incoming a14 = the same atomic-commit lake
#        protocol; a12 stays = committed read/write roundtrip; BOTH r11
#        perf targets landed with fresh r12 hard rows so the standing
#        hold lapses), o04 (incoming o05/o06 = the same CDC
#        decode/collapse kernels — the r12 precedent reversed), o08
#        (incoming o05 scd2_history IS the kernel o08 maintains;
#        kill/resume invariants pinned in tests/test_streaming.py), e09
#        (g35 stays = foreachBatch multi-sink lake pipeline — the r7/r12
#        precedent), e10 (incoming e11 = stream-stream OUTER join, the
#        strictly-stronger same-family form), g01 (incoming g25 span
#        dedup = content-hash dedup over rolling k-grams; b04 stays =
#        exactly-once keyed dedup core), g03 (incoming g03d = the same
#        brute-force cosine top-k kernel plus vote), g03b (g35 stays =
#        the banded-LSH standing-index mechanism; g41/g48 stay = bucketed
#        ANN probes), g03c (g48 stays = g03c delegates to the same
#        persistent IVF store code path), g04b (incoming g04c rolling
#        fingerprint = the same G4 fingerprint family), g05 (f02 stays =
#        the applyInPandas grouped surface g05's blocked matmul runs on;
#        incoming g03d = the cosine kernel), g07 (incoming g07c resize +
#        g07d stays = the same G5 Arrow plumbing including the meta
#        columns), g12 (incoming g24 temperature mixture + g23
#        leakage-safe split = the same md5-threshold keep-rate mechanism)
#   in:  a03, a14, c12, d14d, d29, e03, e07, e11, e13, g03d, g04c, g04d,
#        g07c, g08, g13, g15, g18, g22, g23, g24, g25, g26, o05, o06
# Round-13 new registration (1 new query registered AND windowed the
# same round, the r9/r10/r12 precedent):
#   out: g41 (g48 stays in-window = the same standing-store probed-cell
#        serving path; incoming g52 exercises the identical probe read
#        path with the complementary tombstone anti-filter — g41's own
#        filter_ids semi-join exactness stays pinned in
#        tests/test_ivf_index.py::test_filtered_probe_is_exact_over_qualifying_subset;
#        g41's latest hard row is r12, the freshest possible)
#   in:  g52 (NEW: merge-on-read deletes against the persistent IVF
#        store — horizon-scoped tombstones, applied+cleared at
#        compaction; operators/ivf_index.py:delete_from_ivf_index)
# Round-13 late registrations (2 more new queries registered AND
# windowed the same round — new queries always window the round they
# register, taking the freshest-possible r12-green slots):
#   out: d08 (latest hard row r12, the freshest possible; the partial-
#        agg + broadcast-dim machinery stays witnessed in-window by
#        e01/g22/d36 — same groupBy partial-agg shuffle family), d12
#        (latest hard row r12; the windowed rank/top-per-key family
#        stays witnessed by g50, whose cutoff is result-identical to
#        d12's row_number window and property-tested against it)
#   in:  g53 (NEW: model-based quality classifier — hashed bag-of-tokens
#        linear inference, map-only, the fastText/CCNet filter stage;
#        plans/ext_queries.py:g53_quality_classifier), g54 (NEW:
#        fractional-epoch mixture oversampling — the up-sampling
#        direction g24/g29/g36 cannot express;
#        operators/training.py:oversample_mixture)
#   out: d10c (latest hard row r12, the freshest possible; the exact-
#        percentile family stays witnessed in-window by d36, which
#        certifies the approx sketch INSIDE the exact band computed in
#        the same aggregate)
#   in:  g55 (NEW: the composed corpus build — g53 gate -> sha-256
#        exact-dedup keep-min -> g50 cap in ONE plan, oracle recomputes
#        all three stages in window SQL;
#        plans/ext_queries.py:g55_pipeline_end_to_end)
# Round-13 late kernel changes (streaming review batch — changed kernels
# must hold an in-window witness the round they change):
#   purge_batch now retracts the batch's published manifest before the
#     data purge (replay-window reader safety) — witnessed in-window by
#     a12_lake_roundtrip, a14_lake_compaction, g35_stream_dedup_ingest
#     (every lake flush runs through it);
#   the streaming starters' trigger dial + the shared _file_stream reader
#     — witnessed in-window by e01/e02/e03/e07/e13 (all consume the
#     refactored readers under availableNow, the default the driver runs);
#   start_warehouse_upsert's replay-stable projection and
#     read_warehouse_table's empty-store schema are out-of-window kernels
#     (o04/o08 rotated out this round with named witnesses above) — both
#     pinned by dedicated tests the same session they changed
#     (tests/test_streaming.py::test_warehouse_replay_attempts_commit_
#     identical_content, ::test_read_warehouse_table_empty_store_schemas)
#     and re-run in the 166-query differential every CI pass.
# Round-13 closing review sweep (whole-module passes over dedup,
# similarity, upsert, envelope, training, rollup/stateful/retry,
# kinesis sources, bloom/embedding/multimodal/cost, and the two big
# plans files): every changed kernel re-verified by vanilla-session
# hash-match the same session; the streaming queries' sink naming
# changed from per-invocation uuid views to deterministic drop-first
# names (results hash-verified on DOUBLE invocation — harness-side
# only, no kernel semantics changed).
# Round-13 late registration (session 3 — new queries always window the
# round they register, the r9/r10/r12 precedent):
#   out: g14 (latest hard row r12, the freshest possible; incoming g56 is
#        the same embedding-compression acceptance-gate family measured
#        over the identical in-row slice/dot/norm HOF surface — truncation
#        recall next to g14's int8 codes, with g14b's error report staying
#        in the differential suite — and g03d stays in-window = the exact
#        cosine ranking kernel g56's recall is defined over)
#   in:  g56 (NEW: Matryoshka dimension-truncation recall@k vs the exact
#        full-dim ranking, both rankings from ONE corpus scan;
#        operators/embedding.py:truncation_recall)
# Round-13 late registration #2 (same session — windowed the round it
# registers; the g30 BM25 kernel was extracted verbatim into the shared
# _bm25_scores helper this session so g57's keyword arm scores with the
# SAME certified machinery: that changed path holds an in-window hard row
# through incoming g57 itself, and g30 re-runs in the differential suite
# every CI pass):
#   out: g06 (latest hard row r12, the freshest possible; g51 stays
#        in-window = the same G6 quality-gate family in its per-source
#        calibrated form, g53 stays = the model-based gate, and g06's
#        pushdown plan-lock keeps running in tests/test_plans.py)
#   in:  g57 (NEW: hybrid retrieval — reciprocal-rank fusion of the g30
#        BM25 arm and a g03-style cosine arm, each arm a distributed
#        TakeOrdered top-50, fusion on metadata-scale frames;
#        plans/ext_queries.py:g57_hybrid_rrf)
# Round-13 late registration #3 (same session — windowed the round it
# registers):
#   out: g07d (latest hard row r12, the freshest possible; incoming g07c
#        = the same G5 Arrow mapInPandas multimodal plumbing family
#        including the meta columns — the r12 witness pair g07-out/
#        g07c-in reversed onto the frame-sample twin; g07d's 1->N batch
#        shape stays pinned in tests/test_ext.py)
#   in:  g58 (NEW: per-source unigram KL drift vs the corpus — add-0.5
#        smoothed, absent-token mass in closed form so sources x vocab
#        never materializes, token stream shuffles once;
#        operators/sketch.py:source_kl_drift)
# Round-13 late registration #4 (same session — windowed the round it
# registers):
#   out: d23 (latest hard row r12, the freshest possible; d24 stays
#        in-window = the same correlated-subquery machinery Catalyst
#        decorrelates — the r12 d28-out precedent named d23/d24 as one
#        subquery family, reversed here onto the scalar twin)
#   in:  d40 (NEW: order-sensitive aggregation — string_agg ORDER BY /
#        listagg WITHIN GROUP as sort_array(collect_list(struct)), the
#        deterministic ordered collect Spark lacks natively;
#        plans/relational.py:d40_ordered_sequence_agg)
# Round-13 late registration #5 (same session — windowed the round it
# registers):
#   out: d22 (latest hard row r12, the freshest possible; a10 stays
#        in-window = discovery + pruning over the same hive layout — the
#        r12 d03-out witness pair, reversed onto the point-lookup twin —
#        and the PushedFilters/partition-pruning plan locks keep running
#        in tests/test_plans.py)
#   in:  d41 (NEW: linear-interpolation gap fill, d32-LOCF's gauge twin
#        — TimescaleDB interpolate() next to locf(); four ignorenulls
#        window expressions over one (key, hour) sort, floor-quantized
#        output so decimal half-way interpolants round identically on
#        every engine; plans/relational.py:d41_linear_interpolate)
# Round-13 late registration #6 (same session — windowed the round it
# registers):
#   out: c07 (latest hard row r12, the freshest possible; b04 stays
#        in-window = keyed sequence construction, the r5 c07-out witness
#        precedent, and incoming c12 stays = the composite-key concat
#        surface inside its envelope roundtrip)
#   in:  c15 (NEW: XML format roundtrip — Spark 4's built-in XML source,
#        explicit read schema, the third text interchange format next to
#        c12 JSONL / c13 CSV; plans/pipeline_queries.py:c15_xml_roundtrip)
# Post-r13 freshness ledger (for the round-14 rotation): the r8 block
# (13: a13, c10, d06, d10b, g14b, g17, g21, g28, g29, g31, g33, g34,
# o07) is the next incoming set, then the r9 block — g14, g06, g07d and
# d23 (rotated out by the session-3 registrations below, each on its
# fresh r12 row) join the r12 cohort for later rotation.
# Round-14 rotation (32 swapped — the COMPLETE r8 backlog (13) AND the
# COMPLETE r9 backlog (16) rotate in together with the three round-14
# registrations (g59/g60/d42, which window the round they register, the
# r9/r10/r12/r13 precedent). Every rotated-out slot carries a green
# CORRECTNESS_r13 row — the freshest possible — and keeps re-running in
# the local 179-query differential suite every CI pass; named witnesses
# in parens. The 18 stayers include every kernel changed this round:
# d40 (ordered_sequence_agg factored out), g50/g55 (cap_per_key gained
# the checkpoint dial), g56 (truncation_recall max_queries guard) —
# changed kernels hold an in-window hard row the round they change.
#   out: d24 (incoming d06 = EXISTS compiles to the same left-semi/anti
#        exchange machinery — the r12 d28-out precedent), d36 (incoming
#        d35 = the exact/approx percentile twin pair reversed; incoming
#        d10b = the same sketch-inside-exact-bounds certification form),
#        c15 (c12 stays = the C9 format-roundtrip family, the r5/r13
#        precedent), b04 (incoming g59 = dedup-on-canonical-key ingest,
#        the same keyed first-wins collapse; incoming g19 = dedup-keeper
#        selection), b05 (incoming d06 = the equi-join exchange
#        machinery; incoming b02 = keyed/salted shuffle core), a03
#        (incoming a01b = the same kinesis_sim source + reshard
#        lineage), a10 (incoming a13 = the same hive-layout partition
#        discovery family), a12 (incoming a17 = snapshot diff reads the
#        same committed-manifest atomic protocol), a14 (incoming a23 =
#        the same atomic lake rewrite/maintenance protocol; incoming o07
#        = the compaction family), o05/o06 (incoming o07 = the same
#        CDC/upsert log-maintenance kernels; collapse_cdc unchanged this
#        round), e02 (e01 stays = the streaming window-agg family —
#        sliding is the tumbling machinery with overlap), e07 (e11
#        stays = the stream-join family in its strictly-stronger outer
#        form), e13 (incoming a01b = the same reshard lineage-ordered
#        drain over kinesis_sim), g03d (incoming g33 = the masked
#        cosine top-k kernel family), g04d (incoming g30 = BM25 shares
#        the same tf/df statistics machinery TF-IDF runs on — the
#        extracted _bm25_scores kernel), g08 (incoming g14b = the
#        per-vector array-math aggregate surface), g11 (incoming g47 =
#        the token-length budget family; incoming g36 = token-budget
#        packing twin), g13 (incoming g28 = the n-gram overlap
#        contamination family; incoming g32 = exact set-sim machinery),
#        g15 (incoming g31 = the in-row n-gram text-quality family),
#        g18 (incoming g18b = the exact/SpaceSaving top-k precedent
#        pair), g22 (incoming g34 = the corpus-stats/datacard family),
#        g23 (incoming g17 = the deterministic md5-bucketing split
#        family), g24 (incoming g29 = the same md5-threshold keep-rate
#        mechanism — the r13 g12-out precedent), g25 (incoming g60 =
#        segment-hash first-occurrence dedup, the fixed-window form of
#        the span machinery), g26 (incoming g31 = the unigram-to-bigram
#        LM family), g51 (incoming d42 = the same per-group
#        median-threshold broadcast mechanism in robust-fence form; g55
#        stays = composed pipeline with a quality-gate stage), g52 (g48
#        stays = the same standing-store probe/tombstone read path —
#        the r13 precedent reversed), g53 (g55 stays = the composed
#        pipeline's FIRST stage is the g53 hashed-linear gate itself),
#        g54 (incoming g29 = the keep-rate sampling family g54
#        generalizes), g57 (incoming g30 = g57's keyword arm scores
#        with the extracted _bm25_scores kernel itself), g58 (incoming
#        g34 = per-source corpus distribution stats; incoming g31 =
#        unigram LM mass machinery)
#   in:  a13, c10, d06, d10b, g14b, g17, g21, g28, g29, g31, g33, g34,
#        o07 (the r8 block), a01b, a17, a23, a24, b02, d07, d33, d35,
#        d38, g02c, g18b, g19, g30, g32, g36, g47 (the r9 block), g59,
#        g60, d42 (NEW this round)
# Round-14 late registrations (2 more new queries registered AND
# windowed the same round — the standing precedent; witnesses for the
# two evicted r13-fresh slots in parens):
#   out: d14d (incoming d33 = the same groupBy partial-agg shuffle
#        family — the r12 d08-out argument; pivot's expand semantics
#        stay pinned by the local differential suite every CI pass),
#        g04c (incoming g28 = the shingle-fingerprint machinery the
#        minhash path hashes with; incoming g60 = segment-hash
#        first-occurrence dedup, the fixed-window form of the rolling
#        fingerprint surface)
#   in:  g61 (NEW: DSIR-style importance selection — hashed-unigram
#        target/raw LM log-ratio quantized to integer micro-nats,
#        broadcast weight table into the token stream;
#        plans/ext_queries.py:g61_dsir_selection), d43 (NEW: first-order
#        Markov transition matrix — lag window + row-normalized
#        transition probabilities over the metadata-scale pair frame;
#        plans/relational.py:d43_markov_transitions)
# Round-14 late registration #2 (same session — windowed the round it
# registers):
#   out: e03 (latest hard row r13, the freshest possible; e01 stays =
#        the streaming window-agg family — the same pairing that
#        witnessed e02's rotation this round; e03's session-merge
#        semantics and kill/resume invariants stay pinned in
#        tests/test_streaming.py and the differential suite)
#   in:  g62 (NEW: product-quantized ANN — deterministic per-subspace
#        codebooks, Arrow encode scan, ADC top-k from codes only,
#        certified in-plan against the brute-force twin;
#        operators/embedding.py:train_pq_codebooks/pq_encode/pq_adc_topk)
# Post-r14 freshness ledger (for the round-15 rotation): the r10 block
# is the next incoming set (f01, c06, c09, c14, d01, d02, d09, d17,
# d30, d34, e04, e05, e06, e08, b03, b12, a09, a11, g02, g02b, g04,
# g07b, g10, g16, g20, g27, g37, g40, g45 — 29 queries with r10 latest
# hard rows), then the r11 cohort; the 34 rotated out this round (the
# 32 from the main rotation block PLUS d14d/g04c, evicted by the
# g61/d43 late registrations below) join the r13 cohort on their fresh
# r13 rows.
DRIVER_WINDOW: list[str] = [
    # D — relational core (11)
    "d06_join_semi_anti",
    "d07_set_ops",
    "d10b_approx_distinct",
    "d29_interval_overlap_join",
    "d33_histogram",
    "d35_percentile_profile",
    "d38_funnel_steps",
    "d40_ordered_sequence_agg",
    "d41_linear_interpolate",
    "d42_mad_outliers",
    "d43_markov_transitions",
    # C — record transforms (2)
    "c10_cost_accounting",
    "c12_jsonl_roundtrip",
    # B — streaming-core batch analogues (1)
    "b02_salted_aggregation",
    # A — sources/sinks/lake maintenance (5)
    "a01b_kinesis_reshard",
    "a13_dynamic_table_partitioning",
    "a17_snapshot_diff",
    "a23_zorder_clustering",
    "a24_symlink_manifest_export",
    # O — CDC family (1)
    "o07_log_compaction",
    # E — streaming semantics, batch-equivalent oracle form (3)
    "e01_stream_tumbling_hourly",
    "e11_stream_stream_outer_join",
    # F — UDF/UDAF/UDTF surface (3)
    "f02_grouped_map",
    "f03_grouped_agg_udaf",
    "f04_python_udtf",
    # G — LLM-data-pipeline operators (24)
    "g02c_dedup_simhash",
    "g07c_multimodal_resize",
    "g14b_quantization_error",
    "g17_training_order",
    "g18b_token_topk_sketch",
    "g19_dedup_keepers",
    "g21_doc_chunking",
    "g28_source_overlap",
    "g29_importance_sample",
    "g30_bm25_score",
    "g31_bigram_logprob",
    "g32_setsim_prefix_join",
    "g33_hard_negatives",
    "g34_source_datacard",
    "g35_stream_dedup_ingest",
    "g36_token_budget_sample",
    "g47_length_bucketing",
    "g48_persistent_ivf",
    "g50_source_cap",
    "g55_pipeline_end_to_end",
    "g56_truncation_recall",
    "g59_url_dedup",
    "g60_line_dedup",
    "g61_dsir_selection",
    "g62_pq_ann",
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
