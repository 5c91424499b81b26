"""Frequency-sketch operators (SURVEY.md §2.G extension): corpus-level
heavy hitters (most frequent tokens) — the vocabulary/stopword-discovery
pass of a training-data pipeline.

Two shapes:

- ``token_topk_exact``: explode + hash aggregate + top-k. One shuffle with
  map-side partial aggregation; shuffle volume is O(distinct tokens per
  partition), and the final top-k is a TakeOrderedAndProject (no global
  sort). This is exact and is the DuckDB-oracle query.
- ``token_topk_spacesaving``: the bounded-memory scale path. Each input
  partition streams its rows through a SpaceSaving summary of ``capacity``
  counters (Metwally et al., "Efficient Computation of Frequent and Top-k
  Elements in Data Streams", ICDT 2005); only O(partitions x capacity)
  (token, count, overestimate) triples are shuffled for the merge, no
  matter how large the vocabulary is. Any token with true frequency
  > partition_rows/capacity is guaranteed present in its partition summary;
  merged counts carry per-counter overestimation bounds so the caller can
  see which ranks are certain.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SpaceSaving:
    """Single-partition SpaceSaving summary (Metwally et al., ICDT 2005)
    with a lazy-deletion min-heap and bounded memory.

    ``counts`` maps token -> (count, overestimate); the heap holds
    (count-at-push, token) entries that go stale when a counter grows.
    Counts only increase, so a stale entry always pops before the live one
    and is discarded. To keep memory O(capacity) on arbitrarily long
    partitions, the heap is rebuilt from the live counters whenever it
    exceeds 4x capacity — amortized O(1) per update since at least
    3*capacity pushes must happen between rebuilds."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.counts: dict[str, tuple[int, int]] = {}
        self._heap: list[tuple[int, str]] = []

    def _push(self, count: int, tok: str) -> None:

        heapq.heappush(self._heap, (count, tok))
        if len(self._heap) > 4 * self.capacity:
            self._heap = [(c, t) for t, (c, _) in self.counts.items()]
            heapq.heapify(self._heap)

    def update(self, tok: str, c: int = 1) -> None:

        if tok in self.counts:
            cur, err = self.counts[tok]
            self.counts[tok] = (cur + c, err)
            self._push(cur + c, tok)
        elif len(self.counts) < self.capacity:
            self.counts[tok] = (c, 0)
            self._push(c, tok)
        else:
            # SpaceSaving eviction: replace the minimum live counter; the
            # newcomer inherits its count as overestimation
            self._evicted = True
            while True:
                vcount, victim = heapq.heappop(self._heap)
                if self.counts.get(victim, (None,))[0] == vcount:
                    break  # live entry; stale ones discard silently
            self.counts.pop(victim)
            self.counts[tok] = (vcount + c, vcount)
            self._push(vcount + c, tok)

    def floor(self) -> int:
        """Minimum counter value — the per-partition bound on how often a
        token ABSENT from this summary may still have occurred. Zero while
        NO eviction has happened: the summary is then lossless, so an
        absent token truly occurred zero times. The old len(counts) <
        capacity proxy broke at EXACTLY capacity distinct tokens — a
        lossless summary reported a nonzero floor, inflating n_est/err for
        every token absent from it and violating the documented
        exact-when-distinct<=capacity contract (round-13 review)."""
        if not getattr(self, "_evicted", False):
            return 0
        return min(c for c, _ in self.counts.values())

    def heap_size(self) -> int:
        return len(self._heap)


def token_topk_exact(
    docs: DataFrame, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Exact global top-k tokens by frequency, ties broken by token order
    (deterministic on any engine)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def token_topk_spacesaving(
    docs: DataFrame,
    k: int = 100,
    capacity: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Approximate top-k tokens via per-partition SpaceSaving summaries.

    Returns (token, n_est, err) — n_est upper-bounds the true GLOBAL
    count, err the summed overestimation; n_est - err lower-bounds it.
    The distributed merge is bound-preserving: a token ABSENT from a
    partition's summary may still have occurred up to that partition's
    minimum-counter value ("floor") there, so the merge adds every absent
    partition's floor to both n_est and err (floor is 0 for partitions
    that never filled). Exact whenever each partition's distinct-token
    count stays within ``capacity`` (asserted against the exact top-k in
    tests).

    Eviction is a lazy-deletion heap (counts only grow, so a stale heap
    entry always surfaces before the live one) — O(log capacity) amortized
    instead of an O(capacity) min-scan per evicted newcomer. The heap is
    compacted (rebuilt from the live counters) whenever stale entries
    outnumber live ones 3:1, so per-partition memory stays O(capacity)
    regardless of how many updates a long partition streams through."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ss = SpaceSaving(capacity)
        for pdf in batches:
            for tok, c in (
                pdf[text_col].str.split(" ").explode().value_counts().items()
            ):
                ss.update(tok, int(c))
        pid = TaskContext.get().partitionId()
        floor = ss.floor()
        yield pd.DataFrame(
            [(pid, t, c, e, floor) for t, (c, e) in ss.counts.items()],
            columns=["part_id", "token", "n_est", "err", "floor"],
        )

    summaries = docs.select(text_col).mapInPandas(
        summarize,
        schema="part_id INT, token STRING, n_est LONG, err LONG, floor LONG",
    ).localCheckpoint(eager=True)
    # the checkpoint materializes the corpus scan + Python SpaceSaving
    # pass ONCE for its two consumers below (total_floor and per_token) —
    # unmaterialized, each ran the full scan independently, doubling the
    # most expensive stage AND letting nondeterministic intra-partition
    # row order hand the two consumers DIFFERENT summaries, breaking the
    # bound-preserving merge math (round-12 review). The summary table is
    # O(partitions x capacity) rows — safe to pin.
    total_floor = summaries.select("part_id", "floor").distinct().agg(
        F.coalesce(F.sum("floor"), F.lit(0)).alias("total_floor")
    )
    per_token = summaries.groupBy("token").agg(
        F.sum("n_est").alias("s_est"),
        F.sum("err").alias("s_err"),
        F.sum("floor").alias("s_floor_present"),
    )
    absent = F.col("total_floor") - F.col("s_floor_present")
    return (
        per_token.crossJoin(F.broadcast(total_floor))
        .select(
            "token",
            (F.col("s_est") + absent).alias("n_est"),
            (F.col("s_err") + absent).alias("err"),
        )
        .orderBy(F.desc("n_est"), F.asc("token"))
        .limit(k)
    )


def source_kl_drift(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-source distribution drift: KL(P_source || Q_corpus) between each
    source's additively-smoothed unigram distribution and the corpus-wide
    unigram distribution — the data-card metric that flags a crawl slice or
    vendor feed whose token distribution has drifted from the corpus it is
    about to join (CCNet/Dolma-style source auditing; Kullback-Leibler
    divergence with add-0.5 Jeffreys smoothing over the corpus vocabulary).

    Returns (source, n_tokens, n_distinct, kl_vs_corpus) where
    P_s(t) = (c_st + 0.5) / (n_s + 0.5*V) over the corpus vocab V and
    Q(t) = c_t / N (every corpus token has c_t >= 1, so Q needs no
    smoothing). The sum over tokens ABSENT from a source is computed in
    closed form — P0 * ((V - k_s)*ln(P0) - (S_lnQ - S_lnQ_present)) with
    P0 the constant smoothed mass of an absent token — so the plan never
    materializes the sources x vocab cross product.

    Scale shape: the token stream shuffles ONCE (the (source, token)
    partial-agg); the global vocab counts and per-source totals are exact
    integer re-aggregations of that counts frame, corpus-stats scalars ride
    along as one broadcast row, and the per-source totals frame (sources
    rows) broadcasts. ``source`` here is a curation-granularity label
    (dozens-to-thousands of values); for per-domain grain at 100 TB the
    same algebra holds but drop the ns broadcast hint and let AQE decide.
    Doubles: every log runs on the identical expression (ln(c_t/N)) in the
    present-token sum and the global sum, so engine-side summation-order
    noise stays ~1e-12 and the ``round_to`` rounding absorbs it.
    """
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("source"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    )
    sc = toks.groupBy("source", "t").agg(F.count("*").alias("c_st"))
    gc = sc.groupBy("t").agg(F.sum("c_st").alias("c_t"))
    stats = gc.agg(
        F.count("*").alias("v"), F.sum("c_t").alias("n")
    )
    totals = (
        gc.crossJoin(F.broadcast(stats))  # 1-row corpus-stats scalar join
        .groupBy("v", "n")
        .agg(F.sum(F.log(F.col("c_t").cast("double") / F.col("n"))).alias("s_lnq"))
    )
    ns = sc.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    pst = (F.col("c_st") + F.lit(0.5)) / (F.col("n_s") + F.lit(0.5) * F.col("v"))
    q_t = F.col("c_t").cast("double") / F.col("n")
    per = (
        sc.join(gc, "t")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(totals))  # 1-row corpus-stats scalar join
        .select(
            "source",
            (pst * F.log(pst / q_t)).alias("__contrib"),
            F.log(q_t).alias("__lnq"),
        )
    )
    agg = per.groupBy("source").agg(
        F.sum("__contrib").alias("__c_present"),
        F.count("*").alias("__kp"),
        F.sum("__lnq").alias("__s_present"),
    )
    p0 = F.lit(0.5) / (F.col("n_s") + F.lit(0.5) * F.col("v"))
    absent = p0 * (
        (F.col("v") - F.col("__kp")) * F.log(p0)
        - (F.col("s_lnq") - F.col("__s_present"))
    )
    return (
        agg.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(totals))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.col("__kp").alias("n_distinct"),
            F.round(F.col("__c_present") + absent, round_to).alias("kl_vs_corpus"),
        )
    )
